"""Query registry: the judgeable operator inventory (SURVEY.md §2).

Each entry pairs a Spark-first DataFrame implementation with an
ANSI-SQL oracle that DuckDB runs over the same parquet tables. Column
names are aliased identically on both sides (the driver hash-compares
by sorted column name).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def sql_quote(s: str) -> str:
    """SQL single-quoted string literal ('' = escaped quote) — the one
    shared quoting helper for generated oracle/driver SQL."""
    return "'" + s.replace("'", "''") + "'"


def spark_sql_quote(s: str) -> str:
    """SPARK-dialect single-quoted literal: Spark's parser (default
    ``spark.sql.parser.escapedStringLiterals=false``) treats backslash
    as an escape character inside string literals where DuckDB treats
    it literally — so text interpolated into ``F.expr``/Spark SQL must
    escape backslashes too, or a corpus token containing ``\\``
    mis-parses (and silently diverges from the DuckDB oracle)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return {name: spec.spark for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


_LOADED = False


def _load() -> None:
    """Import query modules (each registers into REGISTRY on import)."""
    global _LOADED
    if _LOADED:
        return
    # Registration order matters: the correctness driver walks queries in
    # registration order under a run budget (CORRECTNESS_r01 covered exactly
    # the first 50 registered queries). The beyond-reference LLM-pipeline
    # operators (dedup / ANN / text) register FIRST so they are always
    # within the checked prefix.
    from ella_spark.queries import (  # noqa: F401
        dedup,
        similarity,
        textops,
        curation,
        graphalgo,
        relational,
        tpch_full,
        window,
        timeseries,
        arrays,
    )

    _reorder()
    _LOADED = True



# The driver cuts CORRECTNESS at exactly the first 50 registered
# queries. Rotation policy (unchanged since r6, SELF-UPDATING since
# round 11): oracle-paired names with no driver hash-green yet rank
# first (a brand-new registration gets its first driver row
# immediately), then oracle-paired names ascending by their NEWEST
# hash-green round (the most-stale greens must re-green first, so no
# name's latest hard record ages past MAX_STALE rounds outside the
# prefix), stable by registration order within a tier. NO-ORACLE
# names are excluded from the prefix entirely — they can never
# produce a hash verdict; their rows-only sanity lives in pytest.
#
# The ranking is DERIVED at import time from the CORRECTNESS_r*.json
# files the driver drops at the repo root — the per-round manual
# tier-set recompute (tools/rotation_audit.py, the recurring "only
# red gate" of rounds 9-11) no longer exists as a ritual: when this
# round's file lands, the next import re-derives the ranking for the
# next round automatically. The invariants stay EXECUTABLE either
# way: tests/test_fixtures.py::test_checked_prefix_staleness_bound
# and ::test_next_round_rotation_budget_feasible recompute staleness
# and capacity from the same files on every run and would catch a
# parser bug or an over-budget registry immediately, and
# ::test_rotation_derivation_matches_r11_audit pins this derivation
# against the hand-audited round-11 tier sets as ground truth.
# Capacity: oracle-paired names <= (MAX_STALE + 1) x 50 = 200, with
# MAX_STALE = 3 hardcoded INDEPENDENTLY by the trip-wire tests and
# tools/rotation_audit.py — deliberately not shared from here, so a
# derivation bug cannot also bend the guards that check it.


_WARNED_NO_RANKING = False  # glob-path degradation warned this process


def _newest_greens(files=None) -> dict[str, int]:
    """name -> newest round with a driver hash-green, parsed from the
    CORRECTNESS_r*.json files at the repo root. ``files`` overrides
    the glob (tests pin a fixed round range so a future round's file
    landing on disk cannot drift a ground-truth comparison)."""
    import json
    import re
    from pathlib import Path

    repo = Path(__file__).resolve().parents[2]
    newest: dict[str, int] = {}
    candidates = [
        Path(p)
        for p in (
            sorted(files)
            if files is not None
            else sorted(repo.glob("CORRECTNESS_r*.json"))
        )
    ]
    for p in candidates:
        # anchored: exactly CORRECTNESS_r<digits>, so a stray
        # CORRECTNESS_r11.backup.json is never counted as round 11
        m = re.fullmatch(r"CORRECTNESS_r0*(\d+)", p.stem)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(p.read_text())
        except (OSError, ValueError):
            continue  # unreadable/malformed must never break the import
        if not isinstance(data, dict):
            continue  # valid JSON but not the per-name record shape
        for name, rec in data.items():
            if isinstance(rec, dict) and rec.get("hash_match"):
                newest[name] = max(newest.get(name, 0), rnd)
    if not newest:
        # zero RANKING entries — whether the files are missing (repo
        # moved / run from outside the checkout), unreadable, or
        # parse fine but carry no hash-green records — means the
        # rotation degrades to registration order: make that VISIBLE.
        # The trip-wire tests assert on the parsed ranking; this
        # warning covers ad-hoc imports they don't see. On the glob
        # path (files=None) warn ONCE per process: installs outside
        # the development checkout hit this state on every _reorder()
        # call, and that's normal there, not news worth repeating
        # (r12 advice). Explicit-files callers (tests, tools) get the
        # warning every call — they're asserting on the degradation.
        global _WARNED_NO_RANKING
        if files is not None or not _WARNED_NO_RANKING:
            if files is None:
                _WARNED_NO_RANKING = True
            import warnings

            warnings.warn(
                "no usable CORRECTNESS_r<N>.json ranking data"
                + (f" under {repo}" if files is None else "")
                + " (files missing, unreadable, or containing no "
                "hash-green records); query rotation falls back to "
                "registration order",
                RuntimeWarning,
                stacklevel=2,
            )
    return newest


_NO_ORACLE_RANK = 10**9

#: derived in _reorder(): tier 0 = oracle-paired names with no driver
#: green yet (possibly empty), then one tier per distinct newest-green
#: round ascending (tier 1 = the due tier). Tests iterate this.
_TIERS: tuple[set[str], ...] = ()


def _rank(name: str, newest: dict[str, int]) -> int:
    """0 = never driver-green (first chance at a row); else the newest
    hash-green round (oldest = most stale = checked first); no-oracle
    names sort far last (never in the prefix)."""
    if REGISTRY[name].oracle is None:
        return _NO_ORACLE_RANK
    return newest.get(name, 0)


def _reorder() -> None:
    """Stable-sort REGISTRY into rotation order (see the policy
    comment above) and derive _TIERS for the invariant tests."""
    global _TIERS
    newest = _newest_greens()
    items = sorted(REGISTRY.items(), key=lambda kv: _rank(kv[0], newest))
    ordered = dict(items)
    REGISTRY.clear()
    REGISTRY.update(ordered)
    greens = sorted(
        {
            r
            for n in REGISTRY
            if 0 < (r := _rank(n, newest)) < _NO_ORACLE_RANK
        }
    )
    _TIERS = ({n for n in REGISTRY if _rank(n, newest) == 0},) + tuple(
        {n for n in REGISTRY if _rank(n, newest) == g} for g in greens
    )
