"""Ella: the embedded datastore facade.

Reference: `ella::open/create/connect` (ella/src/lib.rs:86-105) +
EllaState DDL dispatch (ella-engine/src/engine/state.rs:48-279).
One `Ella` instance = one datastore root + one SparkSession. Tables
in the default `ella.public` namespace register as Spark temp views,
so the full Spark SQL surface (the DataFusion-27 superset, SURVEY.md
§2.B) works over topics and views transparently.
"""

from __future__ import annotations

import collections
import itertools
import os
import re
import shutil
import uuid
import weakref
from pathlib import Path

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession

from ella_spark.catalog import (
    DEFAULT_CATALOG,
    DEFAULT_SCHEMA,
    CatalogStore,
    TableEntry,
)
from ella_spark.lazy import Lazy
from ella_spark.topic import Publisher, Topic
from ella_spark.types import TIME_COLUMN, Column, topic_schema

#: `INSERT INTO <table> <source query>` — the only DML the reference
#: supports (everything else is DDL or SELECT).
_INSERT_RE = re.compile(r"^\s*insert\s+into\s+([A-Za-z0-9_.]+)\s+(.+)$", re.I | re.S)

#: DDL statements dispatched imperatively against the catalog, exactly
#: the set the reference's LocalBackend handles (lazy/backend.rs:66-161).
_CREATE_VIEW_RE = re.compile(
    r"^\s*create\s+(or\s+replace\s+)?view\s+([A-Za-z0-9_.]+)\s+as\s+(.+)$",
    re.I | re.S,
)
_CREATE_MATVIEW_RE = re.compile(
    r"^\s*create\s+(or\s+replace\s+)?materialized\s+view\s+([A-Za-z0-9_.]+)"
    r"(?:\s+keep\s+versions\s+(\d+))?"
    r"\s+as\s+(.+)$",
    re.I | re.S,
)
_REFRESH_MATVIEW_RE = re.compile(
    r"^\s*refresh\s+materialized\s+view\s+([A-Za-z0-9_.]+)\s*$", re.I
)
#: `CREATE TOPIC <t> AS SELECT ...` — CTAS into a topic: schema derives
#: from the SELECT (which must produce the epoch-ns `time` column) and
#: the rows flow through the distributed INSERT sink in the same
#: statement. Beyond-reference SQL-surface convenience.
_CTAS_RE = re.compile(
    r"^\s*create\s+topic\s+(if\s+not\s+exists\s+)?([A-Za-z0-9_.]+)"
    r"\s+as\s+(select\b.+)$",
    re.I | re.S,
)
#: `COPY (<query>) TO '<path>' [(FORMAT PARQUET|CSV)]` — query-result
#: export through Spark's distributed writers (the DuckDB/Postgres
#: COPY idiom; default parquet).
_COPY_RE = re.compile(
    r"^\s*copy\s*\((?P<q>.+)\)\s*to\s*'(?P<path>[^']+)'\s*"
    r"(?:\(\s*format\s+(?P<fmt>parquet|csv)\s*\))?\s*;?\s*$",
    re.I | re.S,
)
#: `ALTER TABLE <t> ADD COLUMN <name> <type>` — topic schema evolution
#: (beyond-reference: the reference has no ALTER; at 100 TB adding a
#: column must not rewrite history, which explicit-schema reads give
#: for free).
_ALTER_ADD_RE = re.compile(
    r"^\s*alter\s+table\s+([A-Za-z0-9_.]+)\s+add\s+column\s+"
    r"([A-Za-z0-9_]+)\s+([A-Za-z0-9_]+)\s*$",
    re.I,
)
_ALTER_DROP_RE = re.compile(
    r"^\s*alter\s+table\s+([A-Za-z0-9_.]+)\s+drop\s+column\s+"
    r"([A-Za-z0-9_]+)\s*$",
    re.I,
)
#: SQL type name -> ella dtype (ella dtype names pass through)
_SQL_DTYPES = {
    "bigint": "int64", "long": "int64", "double": "float64",
    "float": "float32", "real": "float32", "int": "int32",
    "integer": "int32", "smallint": "int16", "tinyint": "int8",
    "varchar": "string", "text": "string", "boolean": "bool",
}
_DROP_RE = re.compile(
    r"^\s*drop\s+(table|materialized\s+view|view)\s+(if\s+exists\s+)?"
    r"([A-Za-z0-9_.]+)\s*$",
    re.I,
)
_CREATE_SCHEMA_RE = re.compile(
    r"^\s*create\s+(schema|database)\s+(if\s+not\s+exists\s+)?([A-Za-z0-9_.]+)\s*$",
    re.I,
)
_CREATE_CATALOG_RE = re.compile(
    r"^\s*create\s+catalog\s+(if\s+not\s+exists\s+)?([A-Za-z0-9_.]+)\s*$", re.I
)
#: `now()` in query text — evaluated ONCE per statement as epoch-ns
#: (the reference's streaming query-time cut, README.md:96-105; Time
#: is ns, ella-common/src/time.rs:28-45). Spark's own now() returns a
#: µs timestamp which would not compare against our ns long columns.
_NOW_RE = re.compile(r"\bnow\s*\(\s*\)", re.I)
_DROP_SCHEMA_RE = re.compile(
    r"^\s*drop\s+(?:schema|database)\s+(if\s+exists\s+)?([A-Za-z0-9_.]+)"
    r"\s*(cascade)?\s*$",
    re.I,
)
_SHOW_TABLES_RE = re.compile(r"^\s*show\s+tables\s*$", re.I)
_SHOW_SCHEMAS_RE = re.compile(r"^\s*show\s+(?:schemas|databases)\s*$", re.I)
_SHOW_CATALOGS_RE = re.compile(r"^\s*show\s+catalogs\s*$", re.I)
_DROP_CATALOG_RE = re.compile(
    r"^\s*drop\s+catalog\s+(if\s+exists\s+)?([A-Za-z0-9_]+)\s*(cascade)?\s*$",
    re.I,
)
_DESCRIBE_RE = re.compile(
    r"^\s*(?:describe|desc)\s+(?:table\s+)?([A-Za-z0-9_.]+)\s*$", re.I
)
#: `VACUUM [<topic>]` — one maintenance pass (compact + manifest +
#: orphan cleanup; all topics without a name). `ANALYZE <topic>
#: [(col, ...)]` — (re)build the shard-stats manifest, with optional
#: Bloom columns. The Postgres/DuckDB housekeeping verbs mapped onto
#: ella_spark.maintenance.
_VACUUM_RE = re.compile(r"^\s*vacuum(?:\s+([A-Za-z0-9_.]+))?\s*;?\s*$", re.I)
_ANALYZE_RE = re.compile(
    r"^\s*analyze\s+([A-Za-z0-9_.]+)"
    r"(?:\s*\(\s*([A-Za-z0-9_,\s]+)\))?\s*;?\s*$",
    re.I,
)
_SHOW_CREATE_RE = re.compile(
    r"^\s*show\s+create\s+table\s+([A-Za-z0-9_.]+)\s*;?\s*$", re.I
)
_EXPLAIN_RE = re.compile(r"^\s*explain\s+(analyze\s+)?(select\b.+)$", re.I | re.S)
#: `SET <key> = <value>` / `SET <key> TO <value>` — DataFusion's
#: Statement plan (the reference `unimplemented!()`s it); routed to
#: the Spark session conf.
_SET_RE = re.compile(
    r"^\s*set\s+([A-Za-z0-9_.]+)\s*(?:=|\s+to\s+)\s*(.+?)\s*;?\s*$", re.I
)
#: DataFusion-dialect `CREATE EXTERNAL TABLE t STORED AS fmt
#: [WITH HEADER ROW] LOCATION 'path'` — the reference declares this
#: verb but `todo!()`s it (lazy/backend.rs:81-83); implemented here
#: like materialized views: catalog-registered, schema inferred at
#: registration, data stays in place and is never deleted on DROP.
_CREATE_EXTERNAL_RE = re.compile(
    r"^\s*create\s+external\s+table\s+(if\s+not\s+exists\s+)?([\w.]+)\s+"
    r"stored\s+as\s+(parquet|csv|json)\s+(with\s+header\s+row\s+)?"
    r"location\s+'([^']+)'\s*;?\s*$",
    re.I,
)
_INFO_SCHEMA_RE = re.compile(r"\binformation_schema\s*\.\s*(tables|columns)\b", re.I)

#: monotonic suffix for TVF-rewrite temp views. The Spark session is
#: shared (two Ella instances, or concurrent Lazy reads, may rewrite
#: at once), so fixed per-statement names like ``__psi_drift_0`` can
#: be clobbered between createOrReplaceTempView and analysis; a
#: process-unique counter makes every rewrite's view name fresh.
_TVF_VIEW_SEQ = itertools.count()

#: bounded GC for TVF-rewrite views: unique names fix the clobbering
#: race but would otherwise LEAK one temp view per rewrite in
#: long-lived sessions (a drift dashboard polled each minute = 1440+
#: catalog entries/day, ann_search views additionally pinning
#: driver-collected query batches). Dropping is safe once the
#: surrounding statement has been ANALYZED — spark.sql() resolves the
#: view into the plan eagerly, and execution never re-consults the
#: catalog. Design (r9 ADVICE + round-10 self-review):
#:   - pending views live on the OWNING Ella instance until that
#:     instance starts its next TOP-LEVEL rewrite batch (a depth
#:     guard in _apply_tvf_rewrites keeps nested rewrites — a view
#:     entry resolved via _frame_for mid-batch — from flushing the
#:     outer statement's pending views early), so a statement with
#:     more TVF matches than the cap can never evict a view it has
#:     not yet analyzed;
#:   - ANALYZED views move to ONE process-wide live window of
#:     (session, name) pairs, so the total catalog footprint stays
#:     bounded at the cap regardless of how many Ella instances churn
#:     on the session, and each entry is dropped via ITS OWN session
#:     handle (the r9 bug was a global deque of bare names dropping
#:     through whichever session triggered eviction).
_TVF_VIEW_CAP = 64
#: (weakref.ref(session), view_name) pairs — weak so an entry never
#: keeps a stopped session's JVM handles alive while it waits for
#: eviction (ADVICE r10)
_TVF_VIEW_LIVE: "collections.deque[tuple[object, str]]" = collections.deque()


def _positive_buckets(arg: "str | None", default: int = 10) -> int:
    """Validate an optional TVF bucket-count argument: the regexes
    match any digit run, so `psi_drift('t','v','k', 0)` would reach
    the operator and divide the bucket width by zero (NULL buckets
    under non-ANSI Spark — a silent degenerate histogram). Fail at
    rewrite time with guidance instead."""
    if arg is None:
        return default
    n = int(arg)
    if n < 1:
        raise ValueError(f"bucket count must be >= 1, got {n}")
    return n


def _relax_nullability(dt):
    """The same value type with every containsNull / valueContainsNull /
    struct-field nullable flag forced TRUE. Spark refuses a cast from a
    nullable-element array to a non-nullable-element one (true->false),
    so casting merged MV state back to a snapshot schema that recorded
    collect_set's containsNull=false fails exactly when the merge
    union/flatten produced the relaxed form. The relaxed target is
    always castable-to and parquet stores it identically."""
    from pyspark.sql.types import ArrayType, MapType, StructField, StructType

    if isinstance(dt, ArrayType):
        return ArrayType(_relax_nullability(dt.elementType), True)
    if isinstance(dt, MapType):
        return MapType(
            _relax_nullability(dt.keyType),
            _relax_nullability(dt.valueType),
            True,
        )
    if isinstance(dt, StructType):
        return StructType(
            [
                StructField(f.name, _relax_nullability(f.dataType), True)
                for f in dt.fields
            ]
        )
    return dt


def _splice_spans(sql: str, repls: list[tuple[int, int, str]]) -> str:
    """Replace [start, end) spans of ``sql`` with view names, left to
    right. Span-based (not str.replace) so identical text inside
    string literals or repeated calls is never rewritten by accident."""
    out: list[str] = []
    last = 0
    for start, end, text in repls:
        out.append(sql[last:start])
        out.append(text)
        last = end
    out.append(sql[last:])
    return "".join(out)
#: table-valued `ann_search('<table>', '<column>', '<queries>', [k],
#: [n_probe])` — index-backed similarity search from plain SQL.
_ANN_SEARCH_RE = re.compile(
    r"\bann_search\(\s*'([^']+)'\s*,\s*'([^']+)'\s*,\s*'([^']+)'"
    r"(?:\s*,\s*(\d+))?(?:\s*,\s*(\d+))?\s*\)",
    re.I,
)
#: table-valued `point_lookup('<topic>', '<col>', <literal>)` —
#: manifest/bloom-backed point lookup from plain SQL (the shards the
#: Bloom filters prove value-free never enter the scan's file list).
_POINT_LOOKUP_RE = re.compile(
    r"\bpoint_lookup\(\s*'([^']+)'\s*,\s*'([^']+)'\s*,\s*"
    r"('[^']*'|-?\d+(?:\.\d+)?)\s*\)",
    re.I,
)
#: table-valued `psi_drift('<table>', '<value_col>', '<slice_col>'
#: [, buckets])` — Population Stability Index of a numeric column per
#: slice vs the pooled distribution (operators/drift.py), the drift
#: dashboard primitive from plain SQL.
_PSI_DRIFT_RE = re.compile(
    r"\bpsi_drift\(\s*'([^']+)'\s*,\s*'([^']+)'\s*,\s*'([^']+)'"
    r"(?:\s*,\s*(\d+))?\s*\)",
    re.I,
)
#: table-valued `chi2_drift('<table>', '<slice_col>', '<category_col>')`
#: — per-slice chi-squared independence vs the pooled category
#: marginals (operators/drift.py chi2_by_slice).
_CHI2_DRIFT_RE = re.compile(
    r"\bchi2_drift\(\s*'([^']+)'\s*,\s*'([^']+)'\s*,\s*'([^']+)'\s*\)",
    re.I,
)
#: table-valued `ks_drift('<table>', '<value_col>', '<slice_col>')` —
#: two-sample Kolmogorov–Smirnov drift of a numeric column per slice
#: vs the pooled distribution (operators/drift.py ks_by_slice).
_KS_DRIFT_RE = re.compile(
    r"\bks_drift\(\s*'([^']+)'\s*,\s*'([^']+)'\s*,\s*'([^']+)'\s*\)",
    re.I,
)
#: table-valued `cusum_drift('<table>', '<value_col>', '<slice_col>'
#: [, '<time_col>'])` — CUSUM changepoint localization per slice over
#: day buckets of the time column (operators/drift.py cusum_by_slice).
_CUSUM_DRIFT_RE = re.compile(
    r"\bcusum_drift\(\s*'([^']+)'\s*,\s*'([^']+)'\s*,\s*'([^']+)'"
    r"(?:\s*,\s*'([^']+)')?\s*\)",
    re.I,
)
#: table-valued `js_divergence('<table>', '<value_col>', '<slice_col>'
#: [, buckets])` — bounded symmetric divergence per slice vs pooled
#: (operators/drift.py js_by_slice).
_JS_DIVERGENCE_RE = re.compile(
    r"\bjs_divergence\(\s*'([^']+)'\s*,\s*'([^']+)'\s*,\s*'([^']+)'"
    r"(?:\s*,\s*(\d+))?\s*\)",
    re.I,
)
#: table-valued `earth_movers('<table>', '<value_col>', '<slice_col>')`
#: — 1-D Wasserstein distance per slice vs pooled (emd_by_slice).
_EARTH_MOVERS_RE = re.compile(
    r"\bearth_movers\(\s*'([^']+)'\s*,\s*'([^']+)'\s*,\s*'([^']+)'\s*\)",
    re.I,
)
#: table-valued `page_hinkley('<table>', '<value_col>', '<slice_col>'
#: [, '<time_col>'] [, lambda])` — batch Page-Hinkley mean-shift per
#: slice (page_hinkley_by_slice).
_PAGE_HINKLEY_RE = re.compile(
    r"\bpage_hinkley\(\s*'([^']+)'\s*,\s*'([^']+)'\s*,\s*'([^']+)'"
    r"(?:\s*,\s*'([^']+)')?(?:\s*,\s*(\d+(?:\.\d+)?))?\s*\)",
    re.I,
)
#: table-valued statistical-QA TVFs (round 10): rank/dispersion/
#: extreme/randomness screens per slice over any catalog object
#: (operators/statqa.py). `\b` cannot match after `_`, so the
#: registry names (q_mann_whitney, …) never trigger a rewrite.
_MANN_WHITNEY_RE = re.compile(
    r"\bmann_whitney\(\s*'([^']+)'\s*,\s*'([^']+)'\s*,\s*'([^']+)'\s*\)",
    re.I,
)
_GRUBBS_RE = re.compile(
    r"\bgrubbs\(\s*'([^']+)'\s*,\s*'([^']+)'\s*,\s*'([^']+)'\s*\)",
    re.I,
)
_LEVENE_RE = re.compile(
    r"\blevene\(\s*'([^']+)'\s*,\s*'([^']+)'\s*,\s*'([^']+)'\s*\)",
    re.I,
)
_RUNS_TEST_RE = re.compile(
    r"\bruns_test\(\s*'([^']+)'\s*,\s*'([^']+)'\s*,\s*'([^']+)'"
    r"(?:\s*,\s*'([^']+)')?\s*\)",
    re.I,
)
#: table-valued `trend_robust('<table>', '<value_col>', '<slice_col>'
#: [, '<time_col>'] [, bucket_days])` — Mann-Kendall S + Theil-Sen
#: slope per slice over bucketed time (operators/drift.py
#: trend_robust); bucket_days defaults to 1, pass 7 for weeks on
#: multi-year spans (pairs are O(buckets²)).
_TREND_ROBUST_RE = re.compile(
    r"\btrend_robust\(\s*'([^']+)'\s*,\s*'([^']+)'\s*,\s*'([^']+)'"
    r"(?:\s*,\s*'([^']+)')?(?:\s*,\s*(\d+))?\s*\)",
    re.I,
)
#: table-valued dedup/profiling TVFs (round 11) — the curation family
#: joins the drift + statqa TVF matrices so a SQL-only user can run
#: the dedup pipeline without touching the Python operator API.
#: `near_dup_pairs('<table>', '<text_col>', '<id_col>'[, min_jaccard])`
#: — MinHash + banded-LSH near-duplicate candidate pairs, exact-
#: Jaccard verified (operators/dedup.py minhash_lsh_pairs).
_NEAR_DUP_PAIRS_RE = re.compile(
    r"\bnear_dup_pairs\(\s*'([^']+)'\s*,\s*'([^']+)'\s*,\s*'([^']+)'"
    r"(?:\s*,\s*(\d+(?:\.\d+)?))?\s*\)",
    re.I,
)
#: `exact_dup_groups('<table>', '<text_col>', '<id_col>')` — exact
#: content-hash duplicate groups (operators/dedup.py exact_dedup).
_EXACT_DUP_GROUPS_RE = re.compile(
    r"\bexact_dup_groups\(\s*'([^']+)'\s*,\s*'([^']+)'\s*,\s*'([^']+)'\s*\)",
    re.I,
)
#: `distinct_overlap('<table>', '<group_col>', '<value_col>'[, k])` —
#: pairwise distinct-value overlap between groups via merged KMV
#: bottom-k sketches (operators/sketch.py kmv_overlap).
_DISTINCT_OVERLAP_RE = re.compile(
    r"\bdistinct_overlap\(\s*'([^']+)'\s*,\s*'([^']+)'\s*,\s*'([^']+)'"
    r"(?:\s*,\s*(\d+))?\s*\)",
    re.I,
)

#: table-valued `set_churn('<table>', '<group_col>', '<value_col>'
#: [, '<time_col>'][, bucket_days])` — bucket-over-bucket distinct-set
#: novelty per group (the batch twin of the streaming set-churn
#: monitor); bucket_days defaults to 1
_SET_CHURN_RE = re.compile(
    r"\bset_churn\(\s*'([^']+)'\s*,\s*'([^']+)'\s*,\s*'([^']+)'"
    r"(?:\s*,\s*'([^']+)')?(?:\s*,\s*(\d+))?\s*\)",
    re.I,
)
#: table-valued `minhash_drift('<table>', '<group_col>', '<text_col>'
#: [, '<time_col>'][, bucket_days])` — bucket-over-accumulated-history
#: MinHash similarity drift per group (the batch twin of the streaming
#: minhash_drift_per_group monitor); bucket_days defaults to 1
_MINHASH_DRIFT_RE = re.compile(
    r"\bminhash_drift\(\s*'([^']+)'\s*,\s*'([^']+)'\s*,\s*'([^']+)'"
    r"(?:\s*,\s*'([^']+)')?(?:\s*,\s*(\d+))?\s*\)",
    re.I,
)
#: `embedding_neardup('<table>', '<vec_col>', '<id_col>'
#: [, '<bucket_col>'] [, cosine])` — embedding-cosine near-dup pairs
#: (operators/dedup.py embedding_neardup_pairs); the bucket bounds
#: the pair space (omit only on small data).
_EMBEDDING_NEARDUP_RE = re.compile(
    r"\bembedding_neardup\(\s*'([^']+)'\s*,\s*'([^']+)'\s*,\s*'([^']+)'"
    r"(?:\s*,\s*'([^']+)')?(?:\s*,\s*(\d*\.\d+|\d+))?\s*\)",
    re.I,
)


#: Iceberg-style time travel: `<ident> FOR VERSION AS OF <n>`. The FOR
#: is mandatory: without it, `mv VERSION AS OF 1` is valid vanilla SQL
#: (VERSION parses as a table alias), so a textual rewrite could
#: silently change the meaning of unrelated queries; `FOR VERSION`
#: never is, which makes every match intentional.
_VERSION_ASOF_RE = re.compile(
    r"([A-Za-z0-9_.]+)\s+FOR\s+VERSION\s+AS\s+OF\s+(\d+)", re.I
)
#: single-quoted SQL string literal ('' = escaped quote) — spans the
#: version-asof rewrite must never touch
_SQL_STRING_RE = re.compile(r"'(?:[^']|'')*'")
#: `<mv> FOR TIMESTAMP AS OF '<iso>'|<epoch_ns>` — resolved to the
#: newest version committed at-or-before the bound via version_log
_TIMESTAMP_ASOF_RE = re.compile(
    r"([A-Za-z0-9_.]+)\s+FOR\s+TIMESTAMP\s+AS\s+OF\s+('[^']+'|\d+)", re.I
)


#: Test hook simulating a Spark Connect session, where DataFrames
#: carry no ``_jdf`` and query plans are not driver-inspectable. When
#: True, ``_jdf_qe`` raises exactly as Connect would, so the degraded-
#: mode fallbacks (fail-closed full MV recompute; captured-explain
#: EXPLAIN output) execute for real on a classic session — the only
#: way to run them here, since grpcio is absent and the full Connect
#: matrix (test_connect.py) skips.
FORCE_PLAN_OPAQUE = False


def _jdf_qe(df):
    """``df._jdf.queryExecution()``, raising where the plan is not
    inspectable (Spark Connect has no ``_jdf``; see FORCE_PLAN_OPAQUE).
    Callers keep their own except-arms: each site's fallback policy
    (fail closed vs. degrade output) is part of its contract."""
    if FORCE_PLAN_OPAQUE:
        raise AttributeError("simulated Spark Connect session: no _jdf")
    return df._jdf.queryExecution()


def _plan_with_metrics(executed_plan) -> str:
    """Render the executed physical plan as one line per operator with
    its populated SQLMetric values — the Spark analog of DataFusion's
    EXPLAIN ANALYZE "Plan with Metrics" annotation. Walks the JVM plan
    tree via py4j (AQE-final after execution); adaptive/reused
    subtrees are expanded through their child plans."""
    lines: list[str] = []

    def walk(node, depth: int) -> None:
        name = node.nodeName()
        mets = []
        it = node.metrics().iterator()
        while it.hasNext():
            e = it.next()
            mets.append(f"{e._1()}={e._2().value()}")
        lines.append("  " * depth + name + (": " + ", ".join(sorted(mets)) if mets else ""))
        # AdaptiveSparkPlan/QueryStage hide the real tree behind
        # accessor methods rather than children(). Resolve the child
        # BEFORE recursing: recursing inside the probe's try would
        # swallow a failure from deep in the subtree and re-walk it
        # through the next accessor / children(), duplicating lines.
        child = None
        for accessor in ("executedPlan", "plan"):
            try:
                child = getattr(node, accessor)()
                break
            except Exception:
                child = None
        if child is not None:
            walk(child, depth + 1)
            return
        cit = node.children().iterator()
        while cit.hasNext():
            walk(cit.next(), depth + 1)

    walk(executed_plan, 0)
    return "\n".join(lines)


def _state_key(prefix: str, i: int) -> str:
    """refresh_state key for the i-th FROM table ("topic"/"shards" for
    the first, "topic2"/"shards2" for the second, … — the numbered
    scheme round-3 states already use, extended past two)."""
    return prefix if i == 0 else f"{prefix}{i + 1}"


def _trim_log(entry: TableEntry, new_version: int) -> list:
    """Append (new_version, now_ns) to the MV's commit log, trimmed to
    the retention window — the map `FOR TIMESTAMP AS OF` resolves
    against."""
    import time as _t

    cutoff = new_version - max(entry.keep_versions, 1) + 1
    log = [t for t in entry.version_log if cutoff <= t[0] < new_version]
    log.append((new_version, _t.time_ns()))
    return log


class Ella:
    #: DataFusion-dialect scalar functions the reference's SQL surface
    #: has but Spark SQL lacks, registered as SQL UDFs (pure
    #: expressions — they inline into the plan, no Python round-trip).
    #: A pyella user's `SELECT date_bin(...)` works unchanged.
    _SQL_COMPAT_FNS = (
        # date_bin over epoch-ns longs (the TSDB workhorse,
        # SURVEY §2.B date/time row); origin-anchored floor
        "CREATE OR REPLACE TEMPORARY FUNCTION date_bin("
        "stride BIGINT, t BIGINT, origin BIGINT) RETURNS BIGINT "
        "RETURN t - pmod(t - origin, stride)",
        "CREATE OR REPLACE TEMPORARY FUNCTION strpos(s STRING, sub STRING) "
        "RETURNS INT RETURN instr(s, sub)",
        "CREATE OR REPLACE TEMPORARY FUNCTION to_timestamp_seconds(x BIGINT) "
        "RETURNS TIMESTAMP RETURN timestamp_seconds(x)",
        "CREATE OR REPLACE TEMPORARY FUNCTION to_timestamp_millis(x BIGINT) "
        "RETURNS TIMESTAMP RETURN timestamp_millis(x)",
        "CREATE OR REPLACE TEMPORARY FUNCTION to_timestamp_micros(x BIGINT) "
        "RETURNS TIMESTAMP RETURN timestamp_micros(x)",
    )

    def __init__(self, store: CatalogStore, spark: SparkSession):
        self.store = store
        self.spark = spark
        # TVF-rewrite view GC (see _TVF_VIEW_CAP comment): views made
        # by THIS instance's rewrites, pending until their statement
        # is analyzed, then promoted to the process-wide live window.
        self._tvf_views_pending: list[str] = []
        self._tvf_rewrite_depth = 0
        for ddl in self._SQL_COMPAT_FNS:
            spark.sql(ddl)
        self._register_all()

    def _register_tvf_view(self, name: str) -> None:
        """Track a TVF-rewrite temp view as pending: it must survive
        until the statement that references it has been analyzed."""
        self._tvf_views_pending.append(name)

    def _tvf_gc_flush(self) -> None:
        """Promote this instance's pending TVF views to the process-
        wide live window and evict past the cap. Called at the START
        of each TOP-LEVEL rewrite batch — any previously-pending
        view's statement has been analyzed by then (spark.sql
        resolves views into the plan eagerly), so dropping the oldest
        live names can never break an in-flight statement, and a
        single statement with >cap TVF matches keeps all of its own
        views pending until the next batch. Live entries carry their
        owning session, so eviction triggered by one instance drops
        another instance's (analyzed) view via the RIGHT session."""
        # weakref so a live-window entry never keeps a STOPPED
        # session (and its JVM handles) alive until 64 newer views
        # evict it (ADVICE r10) — a dead ref just skips the drop
        _TVF_VIEW_LIVE.extend(
            (weakref.ref(self.spark), n) for n in self._tvf_views_pending
        )
        self._tvf_views_pending.clear()
        while len(_TVF_VIEW_LIVE) > _TVF_VIEW_CAP:
            session_ref, old = _TVF_VIEW_LIVE.popleft()
            session = session_ref()
            if session is None:
                continue  # session garbage-collected — view died with it
            try:
                session.catalog.dropTempView(old)
            except Exception:
                pass  # session stopped / already dropped

    def _apply_tvf_rewrites(self, sql: str) -> str:
        """Run every table-valued-function rewrite that matches. One
        dispatch point so the GC flush precedes each TOP-LEVEL batch
        exactly once. The depth guard matters: rewrites resolve their
        table argument via _frame_for, which for a stored-VIEW entry
        re-enters this method — a nested flush would promote (and
        possibly evict) the OUTER statement's still-unanalyzed views."""
        if self._tvf_rewrite_depth == 0:
            self._tvf_gc_flush()
        self._tvf_rewrite_depth += 1
        try:
            return self._apply_tvf_rewrites_inner(sql)
        finally:
            self._tvf_rewrite_depth -= 1

    def _apply_tvf_rewrites_inner(self, sql: str) -> str:
        if _ANN_SEARCH_RE.search(sql):
            sql = self._rewrite_ann_search(sql)
        if _POINT_LOOKUP_RE.search(sql):
            sql = self._rewrite_point_lookup(sql)
        if _PSI_DRIFT_RE.search(sql):
            sql = self._rewrite_psi_drift(sql)
        if _CHI2_DRIFT_RE.search(sql):
            sql = self._rewrite_chi2_drift(sql)
        if _KS_DRIFT_RE.search(sql):
            sql = self._rewrite_ks_drift(sql)
        if _CUSUM_DRIFT_RE.search(sql):
            sql = self._rewrite_cusum_drift(sql)
        if _JS_DIVERGENCE_RE.search(sql):
            sql = self._rewrite_js_divergence(sql)
        if _EARTH_MOVERS_RE.search(sql):
            sql = self._rewrite_earth_movers(sql)
        if _PAGE_HINKLEY_RE.search(sql):
            sql = self._rewrite_page_hinkley(sql)
        if _MANN_WHITNEY_RE.search(sql):
            sql = self._rewrite_statqa(sql, _MANN_WHITNEY_RE, "mann_whitney")
        if _GRUBBS_RE.search(sql):
            sql = self._rewrite_statqa(sql, _GRUBBS_RE, "grubbs")
        if _LEVENE_RE.search(sql):
            sql = self._rewrite_statqa(sql, _LEVENE_RE, "levene")
        if _RUNS_TEST_RE.search(sql):
            sql = self._rewrite_statqa(sql, _RUNS_TEST_RE, "runs_test")
        if _TREND_ROBUST_RE.search(sql):
            sql = self._rewrite_trend_robust(sql)
        if _NEAR_DUP_PAIRS_RE.search(sql):
            sql = self._rewrite_near_dup_pairs(sql)
        if _EXACT_DUP_GROUPS_RE.search(sql):
            sql = self._rewrite_exact_dup_groups(sql)
        if _DISTINCT_OVERLAP_RE.search(sql):
            sql = self._rewrite_distinct_overlap(sql)
        if _SET_CHURN_RE.search(sql):
            sql = self._rewrite_set_churn(sql)
        if _MINHASH_DRIFT_RE.search(sql):
            sql = self._rewrite_minhash_drift(sql)
        if _EMBEDDING_NEARDUP_RE.search(sql):
            sql = self._rewrite_embedding_neardup(sql)
        return sql

    # -- open/create (ella/src/lib.rs:86-105) --------------------------------

    @classmethod
    def create(cls, root: str, spark: SparkSession | None = None) -> "Ella":
        spark = spark or _default_session()
        return cls(CatalogStore.create(root), spark)

    @classmethod
    def open(cls, root: str, spark: SparkSession | None = None) -> "Ella":
        spark = spark or _default_session()
        return cls(CatalogStore.open(root), spark)

    @classmethod
    def open_or_create(cls, root: str, spark: SparkSession | None = None) -> "Ella":
        try:
            return cls.open(root, spark)
        except FileNotFoundError:
            return cls.create(root, spark)

    @classmethod
    def connect(cls, root: str, remote_url: str) -> "Ella":
        """Remote mode — the Spark Connect analog of the reference's
        client/server transport (ella-server/src/client.rs:120-146:
        Flight SQL for queries + gRPC for DDL). SURVEY §0 scopes the
        reference's custom wire protocol out and names Spark Connect
        as the platform answer: a thin client opens a SparkSession
        against a remote Connect endpoint (``sc://host:port``, or a
        ``local[n]`` master to spawn an in-process server) and reads
        the shared catalog root. Every Ella surface — DDL dispatch,
        queries, Lazy, topics — then travels the Connect protocol
        unchanged; no Ella-specific wire format exists, which is the
        point.

        Requires the Spark Connect client stack (``grpcio`` etc. —
        ``pip install 'pyspark[connect]'``); raises a RuntimeError
        naming the missing dependency when absent so callers can
        fall back to embedded mode.
        """
        from pyspark.errors.exceptions.base import PySparkImportError

        try:
            spark = SparkSession.builder.remote(remote_url).getOrCreate()
        except (ImportError, PySparkImportError) as e:
            raise RuntimeError(
                "Spark Connect client dependencies missing "
                "(pip install 'pyspark[connect]'): " + str(e)
            ) from e
        return cls.open_or_create(root, spark)

    @staticmethod
    def connect_available() -> bool:
        """True when the Spark Connect client stack is importable."""
        try:
            from pyspark.sql.connect.utils import check_dependencies

            check_dependencies("ella_spark.connect")
            return True
        except Exception:
            return False

    def shutdown(self) -> None:
        """Snapshot the catalog (Engine::shutdown, engine.rs:36-39)."""
        self.store.snapshot()

    # -- registration ----------------------------------------------------------

    def _register_all(self) -> None:
        for entry in list(self.store.tables.values()):
            self._register(entry)

    def _register(self, entry: TableEntry) -> None:
        """Expose a catalog table to spark.sql.

        Default-namespace tables register under their bare name
        (matching the reference's default catalog/schema resolution,
        config.rs:16-25). Non-default namespaces register as
        ``<schema>__<name>`` (Spark temp views are single-part).
        """
        self._frame_for(entry).createOrReplaceTempView(self._view_name(entry))

    def _frame_for(self, entry: TableEntry, include_hidden: bool = False) -> DataFrame:
        if entry.kind == "topic":
            return Topic(self.store, entry).read(self.spark)
        if entry.kind == "external":
            return self._external_frame(entry)
        if entry.kind == "materialized_view" and entry.version > 0:
            import json as _json

            from pyspark.sql.types import StructType

            snap = self.store.table_path(entry) / f"v={entry.version}"
            df = self.spark.read.schema(
                StructType.fromJson(_json.loads(entry.result_schema))
            ).parquet(str(snap))
            if not include_hidden:
                # avg MVs carry mergeable __mv_* state columns in the
                # snapshot files; every read projects them away
                df = df.drop(*[c for c in df.columns if c.startswith("__mv_")])
            return df
        # view, or a materialized view before its first refresh; the
        # stored SQL keeps durable ann_search(...) / VERSION AS OF
        # text — rewrite here, at every read
        sql = entry.sql
        sql = self._apply_tvf_rewrites(sql)
        if _VERSION_ASOF_RE.search(sql) or _TIMESTAMP_ASOF_RE.search(sql):
            sql = self._rewrite_version_asof(sql)
        return self.spark.sql(sql)

    def _unregister(self, entry: TableEntry) -> None:
        self.spark.catalog.dropTempView(self._view_name(entry))

    @staticmethod
    def _view_name(entry: TableEntry) -> str:
        if entry.catalog == DEFAULT_CATALOG and entry.schema == DEFAULT_SCHEMA:
            return entry.name
        return f"{entry.schema}__{entry.name}"

    # -- DDL (state.rs:156-279 parity) -----------------------------------------

    def create_topic(
        self,
        name: str,
        columns: list[Column],
        *,
        temporary: bool = False,
        indexes: list[tuple[str, bool]] | None = None,
        if_not_exists: bool = False,
        replace: bool = False,
    ) -> Topic:
        """Create a topic; the time column is auto-prepended as the
        required primary index (info.rs:397-424)."""
        catalog, schema, base = self._split(name)
        existing = self.store.tables.get((catalog, schema, base))
        if existing is not None and if_not_exists and not replace:
            return Topic(self.store, existing)
        struct = topic_schema(columns)
        cols = [Column.from_struct_field(f) for f in struct.fields]
        entry = TableEntry(
            catalog=catalog,
            schema=schema,
            name=base,
            kind="topic",
            columns=cols,
            temporary=temporary,
            indexes=[("time", True)] + list(indexes or []),
        )
        if replace and existing is not None:
            self._drop_data(existing)
        self.store.put_table(entry, replace=replace)
        path = self.store.table_path(entry)
        path.mkdir(parents=True, exist_ok=True)
        self._register(entry)
        return Topic(self.store, entry)

    def create_view(self, name: str, query: "Lazy | str", replace: bool = True) -> None:
        """Store a named plan re-resolved at scan time (view.rs:23-28):
        persisted as SQL text, registered as a Spark temp view (Catalyst
        inlines it per query exactly like the reference re-plans)."""
        catalog, schema, base = self._split(name)
        sql = query if isinstance(query, str) else query._sql
        if sql is None:
            # Lazy built from a DataFrame without SQL text: persist via
            # temp-view indirection is impossible across sessions, so
            # require SQL (the reference serializes LogicalPlans; our
            # durable plan format is SQL text).
            raise ValueError(
                "create_view needs SQL text; build the Lazy via Ella.query(sql)"
            )
        entry = TableEntry(
            catalog=catalog, schema=schema, name=base, kind="view", columns=[], sql=sql
        )
        self.store.put_table(entry, replace=replace)
        self._register(entry)

    def create_external_table(
        self,
        name: str,
        fmt: str,
        path: str,
        *,
        header: bool = True,
        if_not_exists: bool = False,
    ) -> TableEntry:
        """External table over files already on storage (DataFusion's
        CREATE EXTERNAL TABLE, which the reference parses but
        `todo!()`s — lazy/backend.rs:81-83). The catalog records
        (format, path, header) plus the schema INFERRED ONCE at
        registration — DataFusion's fixed-at-creation contract, and
        the only scale-sane choice: csv/json inference is a full data
        scan, so re-inferring per query would read the whole location
        twice every time. Data is read in place through the ordinary
        Spark source (predicate pushdown / partition pruning apply as
        for any scan) and is NEVER deleted by DROP TABLE. New files
        appearing under the location are picked up on the next query
        (the listing-table behavior); they must match the registered
        schema."""
        fmt = fmt.lower()
        if fmt not in ("parquet", "csv", "json"):
            raise ValueError(f"external table format {fmt!r} not supported")
        catalog, schema, base = self._split(name)
        existing = self.store.resolve(name)
        if existing is not None:
            if if_not_exists and existing.kind == "external":
                return existing
            raise ValueError(f"table {name!r} already exists")
        entry = TableEntry(
            catalog=catalog,
            schema=schema,
            name=base,
            kind="external",
            refresh_state={"format": fmt, "path": path, "header": header},
        )
        # fail fast on an unreadable location, and pin the inferred
        # schema (one inference at registration, never per query)
        entry.refresh_state["schema_json"] = self._external_frame(
            entry
        ).schema.json()
        self.store.put_table(entry)
        self._register(entry)
        return entry

    def _external_frame(self, entry: TableEntry) -> DataFrame:
        from pyspark.sql import types as T

        spec = entry.refresh_state or {}
        reader = self.spark.read.format(spec.get("format", "parquet"))
        if spec.get("format") == "csv":
            reader = reader.option(
                "header", "true" if spec.get("header", True) else "false"
            )
        if spec.get("schema_json"):
            import json as _json

            reader = reader.schema(
                T.StructType.fromJson(_json.loads(spec["schema_json"]))
            )
        elif spec.get("format") in ("csv", "json"):
            # registration-time path (and pre-pin catalog entries):
            # infer from the files — a full scan for these formats,
            # which is exactly why the result is pinned above
            reader = reader.option("inferSchema", "true")
        return reader.load(spec.get("path", ""))

    def create_materialized_view(
        self,
        name: str,
        query: "Lazy | str",
        replace: bool = True,
        indexes: list[tuple[str, bool]] | None = None,
        keep_versions: int = 1,
    ) -> int:
        """Materialized view: stored SQL + a versioned parquet snapshot,
        refreshed on demand (beyond-reference: the reference declares
        this API but `todo!()`s it, view.rs:36-39 — here it works).

        ``indexes``: declared secondary sort indexes — (column,
        ascending) pairs, the reference's MV index declaration
        (ella-engine/src/table/info.rs:200-213, which its engine can
        never apply). Here they are REAL: every snapshot write sorts
        rows by the index columns, so parquet row-group min/max stats
        prune index-keyed scans of the materialized result.

        Snapshots live under ``<table>/v=<n>``; refresh writes the next
        version distributed, then flips the catalog pointer in one
        transaction — readers see the old or the new snapshot, never a
        half-written one. Returns the snapshot row count.

        ``keep_versions`` > 1 retains that many snapshot versions for
        TIME TRAVEL: read an old one with ``read_mv_version`` or SQL
        ``SELECT … FROM mv FOR VERSION AS OF n`` (Iceberg-style).
        Retention is by version count, pruned at commit — the Delta/
        Iceberg snapshot-retention idiom; each retained version costs
        only its delta for SPF views (hardlinked files are shared).
        """
        catalog, schema, base = self._split(name)
        sql = query if isinstance(query, str) else query._sql
        if sql is None:
            raise ValueError(
                "materialized view needs SQL text; build via Ella.query(sql)"
            )
        if keep_versions < 1:
            raise ValueError("keep_versions must be >= 1")
        prev = self.store.tables.get((catalog, schema, base))
        if prev is not None and prev.kind != "materialized_view":
            # refuse to replace a non-MV entry: put_table(replace=True)
            # would silently overwrite a topic / plain view, and the
            # failure-cleanup branch would then DROP it entirely (the
            # stash/restore protection only guards MV → MV replaces)
            raise ValueError(
                f"cannot create materialized view {name!r}: an entry "
                f"of kind {prev.kind!r} already exists under that name "
                "— drop it first (REPLACE only replaces materialized "
                "views)"
            )
        replacing = (
            replace and prev is not None and prev.kind == "materialized_view"
        )
        entry = TableEntry(
            catalog=catalog,
            schema=schema,
            name=base,
            kind="materialized_view",
            columns=[],
            sql=sql,
            indexes=list(indexes or []),
            keep_versions=keep_versions,
        )
        # CREATE OR REPLACE: stash the previous definition's whole
        # snapshot tree aside FIRST — the new definition's first
        # commit writes v=1 with mode(overwrite), which would destroy
        # the old v=1 dir before the new snapshot ever commits (a
        # runtime-failing refresh, e.g. raise_error or disk-full,
        # must leave the old MV fully readable). The rename sits
        # INSIDE the guarded region so even a put_table failure
        # restores it; a process crash mid-replace is recovered by
        # the stash-restore sweep below on the next replace attempt.
        stash = None
        if replacing:
            path = self.store.table_path(prev)
            if not path.exists():
                # crash recovery: a previous replace died between the
                # stash rename and its restore — put the newest
                # stashed tree back so the catalog entry's data exists
                cands = list(
                    path.parent.glob(f".{path.name}.replaced-*")
                )
                if cands:
                    newest = max(cands, key=lambda c: c.stat().st_mtime)
                    os.rename(newest, path)
        try:
            if replacing and path.exists():
                stash = path.with_name(
                    f".{path.name}.replaced-{uuid.uuid4().hex[:8]}"
                )
                os.rename(path, stash)
            self.store.put_table(entry, replace=replace)
            n = self.refresh_materialized(name)
        except Exception:
            # the new definition never committed a snapshot: put the
            # old definition (entry AND stashed data) back, or drop
            # the never-materialized entry — a failed CREATE OR
            # REPLACE must not destroy the previous MV
            if replacing:
                if stash is not None:
                    shutil.rmtree(path, ignore_errors=True)
                    os.rename(stash, path)
                self.store.put_table(prev, replace=True)
                self._register(prev)
            elif self.store.tables.get((catalog, schema, base)) is not None:
                self.store.drop_table(catalog, schema, base)
            raise
        if stash is not None:
            # the new definition committed: the old snapshots go now
            shutil.rmtree(stash, ignore_errors=True)
        return n

    def refresh_materialized(self, name: str, incremental: bool = True) -> int:
        """Refresh a materialized view and return its snapshot row count.

        Incremental when possible: for single-topic SPF / mergeable-
        aggregate SQL (ella_spark/incremental.py) the refresh reads ONLY
        the shards published since the last snapshot — the immutable
        shard basenames are the cursor — and appends (SPF) or
        partial-aggregates-and-merges (sum/count/min/max) into the next
        snapshot. O(new data), not O(history): at 100 TB a rollup
        refresh touches a day of shards, never the full fact table.
        Compaction renames shards, which invalidates the cursor and
        safely falls back to a full recompute, as does any SQL shape
        the analyzer does not fully understand.
        """
        from ella_spark.incremental import analyze_mv_sql

        entry = self._require(name, "materialized_view")
        self._register_all()  # the SQL may reference topics/views
        analysis = analyze_mv_sql(entry.sql)
        topics: list = []
        if analysis is not None:
            topics = [self._topic_for_view_name(t) for t in analysis.tables]
            if any(t is None for t in topics):
                # a FROM identifier that is not a topic: plain MV
                analysis, topics = None, []
        state = entry.refresh_state
        if (
            incremental
            and topics
            and entry.version > 0
            and state is not None
            and all(
                state.get(_state_key("topic", i)) == t
                for i, t in enumerate(analysis.tables)
            )
        ):
            if analysis.mode in ("spf_join", "agg_join"):
                n = self._refresh_delta_join(entry, analysis, topics)
            else:
                n = self._refresh_delta(entry, analysis, topics[0])
            if n is not None:
                return n
        return self._refresh_full(entry, analysis, topics)

    def _topic_for_view_name(self, ident: str) -> "Topic | None":
        """Resolve a registered view name back to its topic, if any."""
        if "__" in ident:
            schema, base = ident.split("__", 1)
            key = (DEFAULT_CATALOG, schema, base)
        else:
            key = (DEFAULT_CATALOG, DEFAULT_SCHEMA, ident)
        entry = self.store.tables.get(key)
        if entry is not None and entry.kind == "topic":
            return Topic(self.store, entry)
        return None

    def _commit_snapshot(self, entry: TableEntry, df: DataFrame, state) -> int:
        """Write df as the next snapshot version, flip the catalog
        pointer atomically, prune old versions. Returns row count."""
        import dataclasses

        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        new_version = entry.version + 1
        snap = self.store.table_path(entry) / f"v={new_version}"
        df = self._apply_mv_indexes(entry, df)
        obs = Observation()
        (
            df.observe(obs, F.count(F.lit(1)).alias("n"))
            .write.mode("overwrite")
            .parquet(str(snap))
        )
        n = int(obs.get["n"])
        if state is not None:
            state = dict(state, rows=n)
        updated = dataclasses.replace(
            entry,
            version=new_version,
            result_schema=df.schema.json(),
            refresh_state=state,
            version_log=_trim_log(entry, new_version),
        )
        self.store.put_table(updated, replace=True)
        self._register(updated)
        self._prune_versions(entry, new_version)
        return n

    def read_mv_version(self, name: str, version: int) -> DataFrame:
        """Time-travel read of a retained materialized-view snapshot
        (``keep_versions`` > 1). The current version reads through the
        stored-schema fast path; older versions read their own files
        (schemas may differ across versions after a definition
        change). Hidden ``__mv_*`` avg state never surfaces."""
        entry = self._require(name, "materialized_view")
        if version == entry.version:
            return self._frame_for(entry)
        snap = self.store.table_path(entry) / f"v={version}"
        # the committed-version bound also refuses a v=N+1 dir a
        # crashed refresh left behind before its catalog flip — only
        # versions the catalog ever committed are readable
        if version < 1 or version > entry.version or not snap.is_dir():
            have = sorted(
                v
                for p in self.store.table_path(entry).glob("v=*")
                if p.is_dir() and (v := int(p.name.split("=")[1])) <= entry.version
            )
            raise ValueError(
                f"{name} has no committed snapshot v={version}; retained: "
                f"{have} (keep_versions={entry.keep_versions})"
            )
        df = self.spark.read.parquet(str(snap))
        return df.drop(*[c for c in df.columns if c.startswith("__mv_")])

    def resolve_mv_version_asof(self, name: str, ts_ns: int) -> int:
        """Newest committed version at-or-before ``ts_ns`` (from the
        MV's retained commit log); clear error when the bound predates
        every retained commit."""
        entry = self._require(name, "materialized_view")
        eligible = [v for v, t in entry.version_log if t <= ts_ns]
        if not eligible:
            have = [
                (v, t) for v, t in entry.version_log
            ]
            raise ValueError(
                f"{name} has no snapshot committed at or before "
                f"epoch-ns {ts_ns}; retained commits: {have}"
            )
        return max(eligible)

    def read_mv_asof(self, name: str, ts_ns: int) -> DataFrame:
        """Time-travel read by commit timestamp (epoch ns)."""
        return self.read_mv_version(
            name, self.resolve_mv_version_asof(name, ts_ns)
        )

    def _rewrite_version_asof(self, sql: str) -> str:
        """Substitute every `<mv> FOR VERSION AS OF <n>` with a temp
        view over that retained snapshot (re-applied at every read, so
        stored view SQL keeps the durable time-travel text).
        Single-quoted string literals are masked first — `'mv FOR
        VERSION AS OF 1'` is data, not time travel."""

        def _sub(m: re.Match) -> str:
            ident, version = m.group(1), int(m.group(2))
            key = self._split(ident)
            entry = self.store.tables.get(key)
            if entry is None or entry.kind != "materialized_view":
                # not an MV (e.g. the token sequence inside a string
                # literal): leave the text for Spark to parse
                return m.group(0)
            view = f"__mv_asof_{ident.replace('.', '_')}_{version}"
            self.read_mv_version(ident, version).createOrReplaceTempView(view)
            return view

        def _tsub(m: re.Match) -> str:
            ident, bound = m.group(1), m.group(2)
            key = self._split(ident)
            entry = self.store.tables.get(key)
            if entry is None or entry.kind != "materialized_view":
                return m.group(0)
            if bound.startswith("'"):
                from datetime import datetime, timezone

                dt = datetime.fromisoformat(bound.strip("'"))
                if dt.tzinfo is None:
                    dt = dt.replace(tzinfo=timezone.utc)
                # integer epoch-ns: float timestamp()*1e9 rounds above
                # 2^53 and could land a few hundred ns off the bound
                delta = dt - datetime(1970, 1, 1, tzinfo=timezone.utc)
                ts_ns = (
                    (delta.days * 86_400 + delta.seconds) * 10**9
                    + delta.microseconds * 1_000
                )
            else:
                ts_ns = int(bound)
            version = self.resolve_mv_version_asof(ident, ts_ns)
            view = f"__mv_asof_{ident.replace('.', '_')}_{version}"
            self.read_mv_version(ident, version).createOrReplaceTempView(view)
            return view

        # One left-to-right scan over string literals and both
        # time-travel patterns: the EARLIEST match at each position
        # wins. A literal containing the token sequence (`SELECT 'mv
        # FOR TIMESTAMP AS OF 123'`) starts at its opening quote —
        # before the ident — so it is skipped whole; a real `mv FOR
        # TIMESTAMP AS OF '<iso>'` starts at the ident — before its
        # quoted bound — so the bound is consumed as part of the
        # match instead of masking the rewrite away.
        out: list[str] = []
        pos = 0
        while pos < len(sql):
            cands = []
            for rx, fn in (
                (_SQL_STRING_RE, None),
                (_TIMESTAMP_ASOF_RE, _tsub),
                (_VERSION_ASOF_RE, _sub),
            ):
                m = rx.search(sql, pos)
                if m is not None:
                    cands.append((m.start(), len(cands), m, fn))
            if not cands:
                break
            _, _, m, fn = min(cands)
            out.append(sql[pos : m.start()])
            out.append(m.group(0) if fn is None else fn(m))
            pos = m.end()
        out.append(sql[pos:])
        return "".join(out)

    def _prune_versions(self, entry: TableEntry, new_version: int) -> None:
        """Drop snapshot dirs older than the retention window
        (``keep_versions`` newest survive — time-travel reads)."""
        cutoff = new_version - max(entry.keep_versions, 1) + 1
        for old in self.store.table_path(entry).glob("v=*"):
            if old.is_dir() and int(old.name.split("=")[1]) < cutoff:
                shutil.rmtree(old, ignore_errors=True)

    @staticmethod
    def _apply_mv_indexes(entry: TableEntry, df: DataFrame) -> DataFrame:
        """Sort snapshot rows by the declared MV indexes (info.rs
        sorting_cols semantics) so row-group stats prune reads."""
        if not entry.indexes:
            return df
        from pyspark.sql import functions as F

        cols = [
            F.col(c).asc() if asc else F.col(c).desc()
            for c, asc in entry.indexes
        ]
        return df.sortWithinPartitions(*cols)

    def _refresh_full(
        self, entry: TableEntry, analysis, topics: list, _retries: int = 2
    ) -> int:
        """Full recompute. For an analyzable n-topic view the topics
        are bound to EXPLICIT shard listings so the recorded cursors
        equal the snapshot's exact inputs (rows published between
        listing and compute are picked up next refresh, never
        double-counted). If a concurrent compactor unlinked listed
        shards MID-JOB, ignoreMissingFiles would have silently dropped
        their rows — detected by re-listing after the commit and
        repaired by re-running against the post-compaction listing."""
        state = None
        if analysis is not None and topics:
            state = {"rows": 0}
            for i, (t, name) in enumerate(zip(topics, analysis.tables)):
                shard_paths = t.shards()
                state[_state_key("topic", i)] = name
                state[_state_key("shards", i)] = [p.name for p in shard_paths]
                t.read_files(self.spark, shard_paths).createOrReplaceTempView(
                    name
                )
        try:
            sql = entry.sql
            sql = self._apply_tvf_rewrites(sql)
            if _VERSION_ASOF_RE.search(sql) or _TIMESTAMP_ASOF_RE.search(sql):
                sql = self._rewrite_version_asof(sql)
            if analysis is not None and topics and analysis.hidden_sql:
                try:
                    df = self._with_visible_avgs(entry.sql, analysis)
                except AnalysisException:
                    # the hidden rewrite can be unsupported for the
                    # actual argument types (e.g. hll_sketch_agg
                    # rejects double where approx_count_distinct
                    # accepts it) — an ANALYSIS-time error, so fall
                    # back to the PLAIN query as a full-recompute-only
                    # MV instead of failing CREATE. Runtime errors
                    # (transient executor/IO failures) propagate: a
                    # retry must keep the incremental state.
                    df = self.spark.sql(sql)
                    state = None
                    analysis = None
            else:
                df = self.spark.sql(sql)
            self._check_reserved_aliases(df, analysis)
            n = self._commit_snapshot(entry, df, state)
        finally:
            for t in topics:
                self._register(t.entry)  # undo the delta/full binding
        if state is not None and _retries > 0:
            stale = any(
                not set(state[_state_key("shards", i)]).issubset(
                    p.name for p in t.shards()
                )
                for i, t in enumerate(topics)
            )
            if stale:
                fresh = self.store.tables[entry.ident]
                return self._refresh_full(fresh, analysis, topics, _retries - 1)
        return n

    @staticmethod
    def _check_reserved_aliases(df: DataFrame, analysis) -> None:
        """Refuse USER output columns in the hidden __mv_* namespace —
        they would be silently projected away by every read. Checked
        against the actual output schema (catches `AS __mv_x` and the
        no-AS alias form alike; a regex over the SQL text would also
        false-positive on string literals)."""
        legit: set[str] = set()
        if analysis is not None:
            legit = (
                {c for pair in analysis.avgs.values() for c in pair}
                | {c for tup in analysis.stats.values() for c in tup[1:]}
                | {c for tup in analysis.corrs.values() for c in tup[1:]}
                | {c for tup in analysis.moments.values() for c in tup[1:]}
                | set(analysis.approxs.values())
                | {h for _, h in analysis.argmaxs.values()}
                | {h for _, _, h in analysis.klls.values()}
                | set(analysis.dists.values())
                | {h for _, h in analysis.dsums.values()}
                | {h for _, h in analysis.modes.values()}
                | {h for _, _, h in analysis.topks.values()}
            )
        bad = [
            c
            for c in df.columns
            if c.startswith("__mv_") and c not in legit
        ]
        if bad:
            raise ValueError(
                f"materialized-view output columns {bad} use the "
                "reserved '__mv_' namespace (hidden refresh state) — "
                "rename them"
            )

    #: KLL capacity for approx_percentile MV state: groups up to this
    #: many rows keep an uncompacted sketch (estimates exactly the
    #: discrete quantile); larger groups stay within the KLL rank
    #: error. ~16 KB of doubles per group at the cap.
    _KLL_MV_K = 2048

    @staticmethod
    def _kll_merge_udf():
        from ella_spark.operators.sketch import kll_merge_states_udf

        return kll_merge_states_udf(Ella._KLL_MV_K)

    def _attach_kll_state(self, df: DataFrame, analysis) -> DataFrame:
        """Join the approx_percentile hidden state (per-group KLL
        sketches) onto the hidden-partials frame. The state is built
        by an applyInPandas side-query over the SAME FROM/WHERE
        binding the hidden SQL used — sketches are not expressible in
        SQL. One bucket-keyed shuffle per percentile column; the
        sketch rows are O(groups), never O(rows)."""
        import functools

        import pandas as _pd

        from pyspark.sql import functions as F

        from ella_spark.operators.sketch import kll_build

        if not analysis.klls:
            return df
        k = self._KLL_MV_K
        # ONE side-query + ONE applyInPandas pass builds every
        # percentile column's state (several percentiles over the same
        # argument would otherwise scan the source once each)
        val_cols = {
            h: f"__v_{i}"
            for i, (_, _, h) in enumerate(analysis.klls.values())
        }
        sel = ", ".join(
            analysis.key_items
            + [
                f"CAST(({arg}) AS DOUBLE) AS {val_cols[h]}"
                for (arg, _prob, h) in analysis.klls.values()
            ]
        )
        q = f"SELECT {sel} FROM {analysis.from_text}"
        if analysis.where:
            q += f" WHERE {analysis.where}"
        src = self.spark.sql(q)
        state_fields = ", ".join(
            f"{h} array<array<double>>" for h in val_cols
        )
        if analysis.keys:
            grouped = src.groupBy(*analysis.keys)
            key_fields = ", ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in src.schema.fields
                if f.name in analysis.keys
            )
            out_schema = f"{key_fields}, {state_fields}"
        else:
            src = src.withColumn("__g", F.lit(1))
            grouped = src.groupBy("__g")
            out_schema = f"__g int, {state_fields}"

        def build(pdf: _pd.DataFrame) -> _pd.DataFrame:
            row = {
                c: [pdf[c].iloc[0]]
                for c in pdf.columns
                if not c.startswith("__v_")
            }
            for h, vc in val_cols.items():
                levels = kll_build(pdf[vc].to_numpy(dtype=float), k)
                row[h] = [[list(map(float, l)) for l in levels]]
            return _pd.DataFrame(row)

        state = grouped.applyInPandas(build, schema=out_schema)
        if analysis.keys:
            # NULL-SAFE key join: a NULL group key is a real group in
            # the hidden partials and must match its sketch row (a
            # plain equality join would leave its percentile NULL)
            right = state
            cond = functools.reduce(
                lambda a, b: a & b,
                [df[kk].eqNullSafe(right[kk]) for kk in analysis.keys],
            )
            df = df.join(right, cond, "left").drop(
                *[right[kk] for kk in analysis.keys]
            )
        else:
            # LEFT join on true, not crossJoin: an empty source (or a
            # WHERE that filters everything) leaves the state frame
            # empty, and a crossJoin would wipe the global aggregate's
            # single row — the left join keeps it with NULL state
            df = df.join(
                F.broadcast(state.drop("__g")), F.lit(True), "left"
            )
        return df

    def _attach_mode_state(self, df: DataFrame, analysis) -> DataFrame:
        """Join the mode() hidden state (per-group value -> count
        maps) onto the hidden-partials frame. A count-per-value needs
        a second grouping level, inexpressible in the one-pass hidden
        SQL, so — the KLL-state pattern — a side-query over the SAME
        FROM/WHERE binding builds it; unlike KLL it is pure SQL (no
        pandas). Two shuffles per mode column ((keys, value) counts,
        then (keys) map assembly); the state rows are O(groups), each
        O(distinct values in the group) — the count-map any exact mode
        computation holds."""
        import functools

        from pyspark.sql import functions as F

        if not analysis.modes:
            return df
        for _alias, (arg, h) in analysis.modes.items():
            sel = ", ".join(analysis.key_items + [f"({arg}) AS __mv_x"])
            q = f"SELECT {sel} FROM {analysis.from_text}"
            q += f" WHERE {analysis.where}" if analysis.where else ""
            src = self.spark.sql(q).where(F.col("__mv_x").isNotNull())
            if analysis.keys:
                cnt = src.groupBy(*analysis.keys, "__mv_x").agg(
                    F.count(F.lit(1)).alias("__mv_n")
                )
                state = cnt.groupBy(*analysis.keys).agg(
                    F.map_from_entries(
                        F.collect_list(F.struct("__mv_x", "__mv_n"))
                    ).alias(h)
                )
                # RENAME the state keys before joining: df and state
                # both descend from the same base relation here (both
                # are spark.sql over the topic view), so df[k] and
                # state[k] can resolve to the SAME attribute and the
                # equality folds to trivially-true (observed: Spark's
                # 'trivially true equals predicate' warning + a cross-
                # join-shaped result). The applyInPandas KLL state
                # never hits this (its plan breaks the lineage).
                ren = {kk: f"__mv_modek_{kk}" for kk in analysis.keys}
                state = state.select(
                    *[F.col(kk).alias(rn) for kk, rn in ren.items()],
                    F.col(h),
                )
                # NULL-SAFE key join (the KLL rationale: NULL keys are
                # real groups); groups whose arg is all-NULL are
                # absent from the state frame -> NULL state -> NULL
                # mode, matching plain mode() over zero non-null rows
                cond = functools.reduce(
                    lambda a, b: a & b,
                    [
                        df[kk].eqNullSafe(F.col(rn))
                        for kk, rn in ren.items()
                    ],
                )
                df = df.join(state, cond, "left").drop(*ren.values())
            else:
                state = src.groupBy(F.col("__mv_x")).agg(
                    F.count(F.lit(1)).alias("__mv_n")
                ).agg(
                    F.map_from_entries(
                        F.collect_list(F.struct("__mv_x", "__mv_n"))
                    ).alias(h)
                )
                # LEFT join on true (not crossJoin): an all-NULL/empty
                # source leaves the state frame empty and must not
                # wipe the global aggregate's single row
                df = df.join(F.broadcast(state), F.lit(True), "left")
        return df

    @staticmethod
    def _mode_visible_expr(h: str):
        """Visible mode from the count-map state: the entry with the
        highest count, ties to the SMALLEST value (deterministic in
        both refresh paths — a documented deviation from plain
        Spark's implementation-chosen tied pick). NULL/empty state ->
        NULL, matching mode() over zero non-null rows."""
        from pyspark.sql import functions as F

        return F.expr(
            f"try_element_at(array_sort(map_entries({h}), "
            "(a, b) -> CASE WHEN a.value > b.value THEN -1 "
            "WHEN a.value < b.value THEN 1 "
            "WHEN a.key < b.key THEN -1 "
            "WHEN a.key > b.key THEN 1 ELSE 0 END), 1).key"
        )

    @staticmethod
    def _kll_quantile_expr(h, prob: float, dtype):
        """Visible percentile column from serialized KLL levels
        (sketch.kll_quantile_udf; None for empty state — Spark's own
        approx_percentile over zero non-null rows is NULL too)."""
        from pyspark.sql import functions as F

        from ella_spark.operators.sketch import kll_quantile_udf

        return kll_quantile_udf(prob)(F.col(h)).cast(dtype)

    def _with_visible_avgs(self, orig_sql: str, analysis) -> DataFrame:
        """Run the hidden-partials SQL and append the visible avg /
        variance-family columns (recomputed from the mergeable hidden
        state), each cast to the dtype the ORIGINAL SQL would
        produce — the snapshot then carries visible cols in select
        order followed by the mergeable hidden state."""
        orig_fields = {f.name: f.dataType for f in self.spark.sql(orig_sql).schema}
        df = self.spark.sql(analysis.hidden_sql)
        df = self._attach_kll_state(df, analysis)
        df = self._attach_mode_state(df, analysis)
        return self._derive_visible(df, analysis, orig_fields)

    @staticmethod
    def _derive_visible(df: DataFrame, analysis, dtypes) -> DataFrame:
        """Visible avg / variance columns from hidden state, selected
        in out_cols order followed by the hidden columns."""
        from pyspark.sql import functions as F

        for alias, (hsum, hcnt) in analysis.avgs.items():
            df = df.withColumn(
                alias,
                F.when(F.col(hcnt) > 0, F.col(hsum) / F.col(hcnt)).cast(
                    dtypes[alias]
                ),
            )
        for alias, (fn, hcnt, hmean, hm2) in analysis.stats.items():
            n = F.col(hcnt).cast("double")
            # Welford state: M2 is already the centered second moment;
            # clamp tiny negative rounding from the merge
            m2 = F.greatest(F.col(hm2), F.lit(0.0))
            if fn in ("var_pop", "stddev_pop"):
                var, floor = m2 / n, 1
            else:
                var, floor = m2 / (n - 1), 2  # sample stats: NULL at n<2
            val = F.sqrt(var) if fn.startswith("stddev") else var
            df = df.withColumn(
                alias,
                F.when(F.col(hcnt) >= floor, val).cast(dtypes[alias]),
            )
        for alias, (fn, hn, hm1, hm2a, hq1, hq2, hc) in analysis.corrs.items():
            # positional state: 1 = FIRST argument (y for regr_*(y, x)),
            # 2 = second; q's are the centered moments, c the co-moment
            n = F.col(hn).cast("double")
            m12 = F.col(hc)
            m11 = F.greatest(F.col(hq1), F.lit(0.0))
            m22 = F.greatest(F.col(hq2), F.lit(0.0))
            one = F.col(hn) >= 1
            if fn == "covar_pop":
                val, guard = m12 / n, one
            elif fn == "covar_samp":
                val, guard = m12 / (n - 1), F.col(hn) >= 2
            elif fn == "corr":
                # zero-variance sides -> NULL (PostgreSQL convention —
                # Spark's native ANSI corr raises here)
                val = m12 / F.sqrt(m11 * m22)
                guard = one & (m11 > 0) & (m22 > 0)
            elif fn == "regr_count":
                val, guard = F.col(hn), F.lit(True)
            elif fn == "regr_avgx":
                val, guard = F.col(hm2a), one
            elif fn == "regr_avgy":
                val, guard = F.col(hm1), one
            elif fn == "regr_slope":
                val, guard = m12 / m22, one & (m22 > 0)
            elif fn == "regr_intercept":
                val = F.col(hm1) - (m12 / m22) * F.col(hm2a)
                guard = one & (m22 > 0)
            elif fn == "regr_r2":
                # Spark/PostgreSQL: NULL when var(x)=0; 1.0 when
                # var(y)=0 (x varying); else corr²
                val = F.when(m11 > 0, m12 * m12 / (m22 * m11)).otherwise(1.0)
                guard = one & (m22 > 0)
            elif fn == "regr_sxx":
                val, guard = m22, one
            elif fn == "regr_syy":
                val, guard = m11, one
            else:  # regr_sxy
                val, guard = m12, one
            df = df.withColumn(
                alias, F.when(guard, val).cast(dtypes[alias])
            )
        for alias, (fn, hn, hm1, hq2, hq3, hq4) in analysis.moments.items():
            # population central-moment forms (probed against Spark:
            # NULL when M2 = 0 — constant or single-value groups)
            n = F.col(hn).cast("double")
            m2 = F.greatest(F.col(hq2), F.lit(0.0))
            guard = (F.col(hn) >= 1) & (m2 > 0)
            if fn == "skewness":
                val = (F.col(hq3) / n) / F.pow(m2 / n, 1.5)
            else:  # kurtosis (excess)
                val = (F.col(hq4) / n) / F.pow(m2 / n, 2.0) - 3.0
            df = df.withColumn(
                alias, F.when(guard, val).cast(dtypes[alias])
            )
        for alias, h in analysis.approxs.items():
            # DataSketches HLL estimate from the mergeable sketch
            # state (deliberate deviation from HyperLogLog++ — both
            # refresh paths use this estimator, so the MV is
            # self-consistent; the delta merge is the same union
            # Spark runs across partitions, see incremental.py).
            # All-NULL group -> NULL sketch -> coalesce to 0: plain
            # approx_count_distinct is count-like and never NULL.
            df = df.withColumn(
                alias,
                F.coalesce(
                    F.hll_sketch_estimate(F.col(h)), F.lit(0)
                ).cast(dtypes[alias]),
            )
        for alias, (_arg, prob, h) in analysis.klls.items():
            df = df.withColumn(
                alias,
                Ella._kll_quantile_expr(h, prob, dtypes[alias]),
            )
        for alias, (_fn, h) in analysis.argmaxs.items():
            # visible argument from the lexicographic (ord, arg)
            # struct state; all-NULL-ord group -> NULL state -> NULL,
            # matching plain max_by over zero qualifying rows
            df = df.withColumn(
                alias, F.col(h).getField("a").cast(dtypes[alias])
            )
        for alias, h in analysis.dists.items():
            # count(DISTINCT x) = size of the hidden distinct set;
            # NULL state (left-join-introduced empty group) -> 0,
            # exactly count distinct over zero rows
            df = df.withColumn(
                alias,
                F.when(F.col(h).isNull(), F.lit(0))
                .otherwise(F.size(F.col(h)))
                .cast(dtypes[alias]),
            )
        for alias, (fn, h) in analysis.dsums.items():
            # sum/avg(DISTINCT): fold the SORTED distinct set so float
            # folds are order-deterministic (delta merge == full
            # recompute bit-for-bit); empty/NULL set -> NULL, matching
            # sum/avg over zero non-null rows
            t = dtypes[alias].simpleString()
            if fn == "sum":
                val = F.expr(
                    f"aggregate(array_sort({h}), CAST(0 AS {t}), "
                    f"(acc, x) -> acc + CAST(x AS {t}))"
                )
            else:  # avg: fold in double, divide by the set size
                val = F.expr(
                    f"aggregate(array_sort({h}), CAST(0 AS DOUBLE), "
                    f"(acc, x) -> acc + CAST(x AS DOUBLE))"
                ) / F.size(F.col(h))
            df = df.withColumn(
                alias,
                F.when(
                    F.col(h).isNotNull() & (F.size(F.col(h)) > 0), val
                ).cast(dtypes[alias]),
            )
        for alias, (_arg, h) in analysis.modes.items():
            df = df.withColumn(
                alias, Ella._mode_visible_expr(h).cast(dtypes[alias])
            )
        for alias, (kk, _mm, h) in analysis.topks.items():
            # DataSketches frequent-items estimate from the mergeable
            # sketch state (exact while distinct items fit
            # maxItemsTracked; the HLL drift-band caveat applies
            # beyond it — both refresh paths use the same estimator)
            df = df.withColumn(
                alias,
                F.expr(f"approx_top_k_estimate({h}, {kk})").cast(
                    dtypes[alias]
                ),
            )
        hidden = (
            [c for pair in analysis.avgs.values() for c in pair]
            + [c for tup in analysis.stats.values() for c in tup[1:]]
            + [c for tup in analysis.corrs.values() for c in tup[1:]]
            + [c for tup in analysis.moments.values() for c in tup[1:]]
            + list(analysis.approxs.values())
            + [h for _, h in analysis.argmaxs.values()]
            + [h for _, _, h in analysis.klls.values()]
            + list(analysis.dists.values())
            + [h for _, h in analysis.dsums.values()]
            + [h for _, h in analysis.modes.values()]
            + [h for _, _, h in analysis.topks.values()]
        )
        return df.select(*analysis.out_cols, *hidden)

    def _refresh_delta(self, entry: TableEntry, analysis, topic) -> int | None:
        """Delta refresh; None → caller falls back to full recompute."""
        import dataclasses
        import json as _json

        from pyspark.sql import Observation
        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        state = entry.refresh_state
        current = topic.shards()
        names = [p.name for p in current]
        consumed = set(state["shards"])
        if not consumed.issubset(names):
            return None  # compaction rewrote consumed shards
        delta = [p for p in current if p.name not in consumed]
        if not delta:
            return int(state["rows"])

        new_state = {"topic": analysis.table, "shards": names, "rows": 0}
        try:
            topic.read_files(self.spark, delta).createOrReplaceTempView(
                analysis.table
            )
            delta_df = self.spark.sql(analysis.hidden_sql or entry.sql)
            if analysis.mode == "agg":
                delta_df = self._attach_kll_state(delta_df, analysis)
                delta_df = self._attach_mode_state(delta_df, analysis)
            if analysis.mode == "spf":
                # structural guard behind the regex analyzer: an
                # aggregate the blacklist does not know must NEVER be
                # treated as append-only — a partial per-delta result
                # would silently corrupt the snapshot. The analyzed
                # plan is ground truth; when it is not inspectable
                # (Spark Connect has no _jdf), fail CLOSED to a full
                # recompute rather than trust the regex alone.
                try:
                    plan = _jdf_qe(delta_df).analyzed().toString()
                except Exception:
                    return None
                if "Aggregate" in plan:
                    return None
                return self._append_snapshot_version(
                    entry, delta_df, new_state, int(state["rows"])
                )
            # mergeable aggregate: snapshot ∪ delta partials,
            # re-aggregated. A snapshot written by an OLDER hidden-
            # state layout (e.g. pre-Welford raw sums) fails the
            # unionByName at analysis time — fall back to a full
            # recompute, which rewrites the state in the new layout.
            from pyspark.errors import AnalysisException

            try:
                return self._merge_agg_snapshot(
                    entry, analysis, delta_df, new_state
                )
            except AnalysisException:
                return None
        finally:
            self._register(topic.entry)

    def _merge_agg_snapshot(
        self, entry: TableEntry, analysis, delta_df: DataFrame, new_state: dict
    ) -> int:
        """Re-aggregate snapshot ∪ delta partials into the next
        snapshot version (sum/count merge via SUM, min via MIN, max
        via MAX; avg by SUMming its hidden sum+count state and
        recomputing the visible column; distinct-keys via
        dropDuplicates)."""
        import json as _json

        from pyspark.sql import functions as F
        from pyspark.sql.types import StructType

        old = self._frame_for(entry, include_hidden=True)
        derived = (
            set(analysis.avgs)
            | set(analysis.stats)
            | set(analysis.corrs)
            | set(analysis.moments)
            | set(analysis.approxs)
            | set(analysis.klls)
            | set(analysis.argmaxs)
            | set(analysis.dists)
            | set(analysis.dsums)
            | set(analysis.modes)
            | set(analysis.topks)
        )
        if derived:
            # the snapshot's visible avg/variance columns are derived,
            # not mergeable state — drop them before unioning with the
            # delta partials (which carry only the hidden state)
            old = old.drop(*derived)
        union = old.unionByName(delta_df)
        schema = StructType.fromJson(_json.loads(entry.result_schema))
        dtypes = {f.name: f.dataType for f in schema.fields}
        if analysis.aggs:
            # self-mergeable aggregates: re-aggregating partials with
            # the listed fn gives the total (sum/count via SUM; min/
            # max, bool and bit families are associative+idempotent —
            # bit_xor is associative and each input row lands in
            # exactly one partial, so partial-xor folds exactly)
            merge_fns = {
                "sum": F.sum, "count": F.sum, "min": F.min, "max": F.max,
                "count_if": F.sum,
                "bool_and": F.bool_and, "every": F.bool_and,
                "bool_or": F.bool_or,
                "bit_and": F.bit_and, "bit_or": F.bit_or,
                "bit_xor": F.bit_xor,
            }
            aggs = [
                merge_fns[fn](c).alias(c)
                for c, fn in analysis.aggs.items()
                if c not in derived and c not in analysis.argmaxs
            ]
            # max_by/min_by: the hidden (ord, arg) struct merges via
            # lexicographic max/min — deterministic on ordering-value
            # ties, so delta merge ≡ full recompute; the visible
            # argument is re-derived from the struct afterwards
            for c, (fn, h) in analysis.argmaxs.items():
                ext = F.max if fn == "max_by" else F.min
                aggs.append(ext(F.col(h)).alias(h))
            aggs += [
                F.sum(h).alias(h)
                for pair in analysis.avgs.values()
                for h in pair
            ]
            aggs += [
                F.hll_union_agg(h).alias(h)
                for h in analysis.approxs.values()
            ]
            # approx_top_k frequent-items state: combine snapshot ∪
            # delta sketches (same maxItemsTracked by construction)
            aggs += [
                F.expr(f"approx_top_k_combine({h}, {mm})").alias(h)
                for _kk, mm, h in analysis.topks.values()
            ]
            # count(DISTINCT) set state: distinct-flatten of the
            # per-partial sets (snapshot + delta(s) — one array per
            # partial, never per input row)
            aggs += [
                F.array_distinct(F.flatten(F.collect_list(F.col(h)))).alias(h)
                for h in analysis.dists.values()
            ]
            # sum/avg(DISTINCT) share the distinct-set merge
            aggs += [
                F.array_distinct(F.flatten(F.collect_list(F.col(h)))).alias(h)
                for _, h in analysis.dsums.values()
            ]
            # approx_percentile KLL state: fold snapshot ∪ delta
            # sketches per group (bounded: one struct per partial)
            kll_tmps: list[str] = []
            for alias, (_arg, _prob, h) in analysis.klls.items():
                tmp = f"__mv_klltmp__{alias}"
                kll_tmps.append(tmp)
                aggs.append(F.collect_list(F.col(h)).alias(tmp))
            # mode() count-map state: collect the per-partial maps
            # (bounded: one map per partial), then fold them with
            # map_zip_with summing counts — exact and order-free, so
            # delta merge ≡ full recompute; the state never grows
            # beyond O(distinct values per group)
            mode_tmps: list[str] = []
            for alias, (_arg, h) in analysis.modes.items():
                tmp = f"__mv_modetmp__{alias}"
                mode_tmps.append(tmp)
                aggs.append(F.collect_list(F.col(h)).alias(tmp))
            # Welford state (variance/corr families): counts merge
            # exactly via SUM; means and centered moments merge via
            # the grand-mean identity over the per-partial structs —
            #   mean = Σ nᵢ·meanᵢ / N
            #   M2   = Σ M2ᵢ + Σ nᵢ·(meanᵢ − mean)²
            #   C    = Σ Cᵢ  + Σ nᵢ·(mxᵢ − mx)(myᵢ − my)
            # Subtracting NEARBY means is stable where re-deriving
            # from raw Σx² is not (values ~1e9, variance ~1 cancels
            # catastrophically). collect_list is bounded: one struct
            # per partial — the snapshot plus one delta term (or one
            # per leapfrog join term), never per input row.
            tmps: list[str] = []
            for alias, (fn, hcnt, hmean, hm2) in analysis.stats.items():
                tmp = f"__mv_tmp__{alias}"
                tmps.append(tmp)
                aggs.append(F.sum(hcnt).alias(hcnt))
                aggs.append(
                    F.collect_list(
                        F.struct(
                            F.col(hcnt).cast("double").alias("n"),
                            F.coalesce(F.col(hmean), F.lit(0.0)).alias("m"),
                            F.coalesce(F.col(hm2), F.lit(0.0)).alias("q"),
                        )
                    ).alias(tmp)
                )
            for alias, (fn, hn, hm1, hq2, hq3, hq4) in analysis.moments.items():
                tmp = f"__mv_tmp__{alias}"
                tmps.append(tmp)
                aggs.append(F.sum(hn).alias(hn))
                aggs.append(
                    F.collect_list(
                        F.struct(
                            F.col(hn).cast("double").alias("n"),
                            F.coalesce(F.col(hm1), F.lit(0.0)).alias("m"),
                            F.coalesce(F.col(hq2), F.lit(0.0)).alias("q2"),
                            F.coalesce(F.col(hq3), F.lit(0.0)).alias("q3"),
                            F.coalesce(F.col(hq4), F.lit(0.0)).alias("q4"),
                        )
                    ).alias(tmp)
                )
            for alias, (fn, hn, hm1, hm2a, hq1, hq2, hc) in analysis.corrs.items():
                tmp = f"__mv_tmp__{alias}"
                tmps.append(tmp)
                aggs.append(F.sum(hn).alias(hn))
                aggs.append(
                    F.collect_list(
                        F.struct(
                            F.col(hn).cast("double").alias("n"),
                            F.coalesce(F.col(hm1), F.lit(0.0)).alias("m1"),
                            F.coalesce(F.col(hm2a), F.lit(0.0)).alias("m2"),
                            F.coalesce(F.col(hq1), F.lit(0.0)).alias("q1"),
                            F.coalesce(F.col(hq2), F.lit(0.0)).alias("q2"),
                            F.coalesce(F.col(hc), F.lit(0.0)).alias("c"),
                        )
                    ).alias(tmp)
                )
            merged = (
                union.groupBy(*analysis.keys).agg(*aggs)
                if analysis.keys
                else union.agg(*aggs)
            )
            zero = F.lit(0.0)
            for alias, (fn, hcnt, hmean, hm2) in analysis.stats.items():
                arr = F.col(f"__mv_tmp__{alias}")
                n = F.col(hcnt).cast("double")
                wsum = F.aggregate(arr, zero, lambda a, s: a + s["n"] * s["m"])
                merged = merged.withColumn(
                    hmean, F.when(F.col(hcnt) > 0, wsum / n)
                )
                mean = F.coalesce(F.col(hmean), zero)
                merged = merged.withColumn(
                    hm2,
                    F.aggregate(
                        arr,
                        zero,
                        lambda a, s: a
                        + s["q"]
                        + s["n"] * (s["m"] - mean) * (s["m"] - mean),
                    ),
                )
            for alias, (fn, hn, hm1, hm2a, hq1, hq2, hc) in analysis.corrs.items():
                arr = F.col(f"__mv_tmp__{alias}")
                n = F.col(hn).cast("double")
                pos = F.col(hn) > 0
                s1 = F.aggregate(arr, zero, lambda a, s: a + s["n"] * s["m1"])
                s2 = F.aggregate(arr, zero, lambda a, s: a + s["n"] * s["m2"])
                merged = merged.withColumn(hm1, F.when(pos, s1 / n))
                merged = merged.withColumn(hm2a, F.when(pos, s2 / n))
                mx = F.coalesce(F.col(hm1), zero)
                my = F.coalesce(F.col(hm2a), zero)
                merged = merged.withColumn(
                    hq1,
                    F.aggregate(
                        arr,
                        zero,
                        lambda a, s: a
                        + s["q1"]
                        + s["n"] * (s["m1"] - mx) * (s["m1"] - mx),
                    ),
                ).withColumn(
                    hq2,
                    F.aggregate(
                        arr,
                        zero,
                        lambda a, s: a
                        + s["q2"]
                        + s["n"] * (s["m2"] - my) * (s["m2"] - my),
                    ),
                ).withColumn(
                    hc,
                    F.aggregate(
                        arr,
                        zero,
                        lambda a, s: a
                        + s["c"]
                        + s["n"] * (s["m1"] - mx) * (s["m2"] - my),
                    ),
                )
            for alias, (fn, hn, hm1, hq2, hq3, hq4) in analysis.moments.items():
                arr = F.col(f"__mv_tmp__{alias}")
                n = F.col(hn).cast("double")
                wsum = F.aggregate(arr, zero, lambda a, s: a + s["n"] * s["m"])
                merged = merged.withColumn(
                    hm1, F.when(F.col(hn) > 0, wsum / n)
                )
                mean = F.coalesce(F.col(hm1), zero)
                # grand-mean identities for higher central moments
                # (d = partial mean - grand mean; sum of (x-m_i) is 0
                # inside each partial, so the binomial expansions
                # collapse to these closed forms):
                #   M2 += q2 + n d^2
                #   M3 += q3 + 3 d q2 + n d^3
                #   M4 += q4 + 4 d q3 + 6 d^2 q2 + n d^4
                merged = (
                    merged.withColumn(
                        hq2,
                        F.aggregate(
                            arr,
                            zero,
                            lambda a, s: a
                            + s["q2"]
                            + s["n"] * (s["m"] - mean) * (s["m"] - mean),
                        ),
                    )
                    .withColumn(
                        hq3,
                        F.aggregate(
                            arr,
                            zero,
                            lambda a, s: a
                            + s["q3"]
                            + F.lit(3.0) * (s["m"] - mean) * s["q2"]
                            + s["n"]
                            * (s["m"] - mean)
                            * (s["m"] - mean)
                            * (s["m"] - mean),
                        ),
                    )
                    .withColumn(
                        hq4,
                        F.aggregate(
                            arr,
                            zero,
                            lambda a, s: a
                            + s["q4"]
                            + F.lit(4.0) * (s["m"] - mean) * s["q3"]
                            + F.lit(6.0)
                            * (s["m"] - mean)
                            * (s["m"] - mean)
                            * s["q2"]
                            + s["n"]
                            * (s["m"] - mean)
                            * (s["m"] - mean)
                            * (s["m"] - mean)
                            * (s["m"] - mean),
                        ),
                    )
                )
            for alias, (_arg, _prob, h) in analysis.klls.items():
                merged = merged.withColumn(
                    h, self._kll_merge_udf()(F.col(f"__mv_klltmp__{alias}"))
                )
            for alias, (_arg, h) in analysis.modes.items():
                tmp = f"__mv_modetmp__{alias}"
                # collect_list skips NULL maps; guard the empty list
                # (a group whose every partial had NULL state) to a
                # NULL map rather than ANSI-error on element_at
                merged = merged.withColumn(
                    h,
                    F.expr(
                        f"CASE WHEN size({tmp}) = 0 THEN NULL ELSE "
                        f"aggregate(slice({tmp}, 2, size({tmp})), "
                        f"element_at({tmp}, 1), "
                        "(acc, m) -> map_zip_with(acc, m, "
                        "(k, a, b) -> coalesce(a, 0L) + coalesce(b, 0L))) "
                        "END"
                    ),
                )
            if tmps or kll_tmps or mode_tmps:
                merged = merged.drop(*tmps, *kll_tmps, *mode_tmps)
            if derived:
                merged = self._derive_visible(merged, analysis, dtypes)
        else:
            merged = union.dropDuplicates(analysis.keys)
        # restore select order and snapshot dtypes (SUM over decimal
        # widens precision; the snapshot schema is the contract).
        # Nullability is RELAXED before casting: the recorded schema
        # captures collect_set's containsNull=false, but a merged set
        # column comes back containsNull=true after the union/flatten
        # round-trip, and Spark refuses the true->false array cast —
        # which silently downgraded every refresh of such an MV to a
        # full recompute (caught by a r11 mv_stress run: trial st13,
        # seed 54703125). Value types stay exact; parquet stores the
        # relaxed form identically.
        merged = merged.select(
            [
                F.col(f.name).cast(_relax_nullability(f.dataType)).alias(f.name)
                for f in schema.fields
            ]
        )
        return self._commit_snapshot(entry, merged, new_state)

    def _append_snapshot_version(
        self, entry: TableEntry, delta_df: DataFrame, new_state: dict, prev_rows: int
    ) -> int:
        """O(delta) SPF refresh WITH the old-or-new snapshot contract:
        hardlink the current version's files into v=N+1 (metadata-only
        on one filesystem; an object store would server-side-copy),
        append the delta there, then flip the catalog pointer. A crash
        before the flip leaves an orphan dir that the next refresh
        clears — never a half-visible snapshot and never a
        double-applied delta."""
        import dataclasses
        import os as _os
        import shutil as _shutil

        from pyspark.sql import Observation
        from pyspark.sql import functions as F

        old_snap = self.store.table_path(entry) / f"v={entry.version}"
        new_version = entry.version + 1
        snap = self.store.table_path(entry) / f"v={new_version}"
        if snap.exists():  # uncommitted orphan from a crash
            _shutil.rmtree(snap)
        snap.mkdir(parents=True)
        for f in old_snap.glob("*.parquet"):
            try:
                _os.link(f, snap / f.name)
            except OSError:
                _shutil.copy2(f, snap / f.name)
        obs = Observation()
        (
            self._apply_mv_indexes(entry, delta_df)
            .observe(obs, F.count(F.lit(1)).alias("n"))
            .write.mode("append")
            .parquet(str(snap))
        )
        total = prev_rows + int(obs.get["n"])
        updated = dataclasses.replace(
            entry,
            version=new_version,
            refresh_state=dict(new_state, rows=total),
            version_log=_trim_log(entry, new_version),
        )
        self.store.put_table(updated, replace=True)
        self._register(updated)
        self._prune_versions(entry, new_version)
        return total

    def _refresh_delta_join(
        self, entry: TableEntry, analysis, topics: list
    ) -> int | None:
        """Insert-only delta maintenance of an inner-join chain via the
        leapfrog identity: Δ(T1 ⋈ … ⋈ Tn) = ⋃ᵢ old₁ ⋈ … ⋈ oldᵢ₋₁ ⋈ Δᵢ ⋈
        curᵢ₊₁ ⋈ … ⋈ curₙ — an exact partition of the new result rows
        (each new row is claimed by the FIRST position holding one of
        its delta inputs), so the refresh never joins history against
        history on all sides at once. None → full recompute."""
        state = entry.refresh_state
        n_tables = len(topics)
        cur, consumed, deltas, olds = [], [], [], []
        for i, t in enumerate(topics):
            shards = t.shards()
            names = {p.name for p in shards}
            cons = set(state.get(_state_key("shards", i), []))
            if not cons.issubset(names):
                return None  # compaction/retention rewrote consumed shards
            cur.append(shards)
            consumed.append(cons)
            deltas.append([p for p in shards if p.name not in cons])
            olds.append([p for p in shards if p.name in cons])
        if not any(deltas):
            return int(state["rows"])

        new_state = {"rows": 0}
        for i, name in enumerate(analysis.tables):
            new_state[_state_key("topic", i)] = name
            new_state[_state_key("shards", i)] = [p.name for p in cur[i]]
        sql = analysis.hidden_sql or entry.sql
        sql = self._apply_tvf_rewrites(sql)
        try:
            terms = []
            for i in range(n_tables):
                if not deltas[i]:
                    continue
                # positions before i: OLD only; i: its delta; after i:
                # the full current listing (old + delta)
                for j, t in enumerate(topics):
                    files = olds[j] if j < i else deltas[i] if j == i else cur[j]
                    t.read_files(self.spark, files).createOrReplaceTempView(
                        analysis.tables[j]
                    )
                terms.append(self.spark.sql(sql))
            delta_df = terms[0]
            for t_df in terms[1:]:
                delta_df = delta_df.unionByName(t_df)
            if analysis.mode == "agg_join":
                # the delta terms arrive ALREADY partially aggregated
                # by the SQL; merge with the snapshot like the
                # single-topic agg mode (layout-mismatch fallback as
                # in _refresh_delta)
                from pyspark.errors import AnalysisException

                try:
                    return self._merge_agg_snapshot(
                        entry, analysis, delta_df, new_state
                    )
                except AnalysisException:
                    return None
            # structural guard, same as the single-topic SPF path
            # (fail closed when the plan is not inspectable — Connect)
            try:
                plan = _jdf_qe(delta_df).analyzed().toString()
            except Exception:
                return None
            if "Aggregate" in plan:
                return None
            return self._append_snapshot_version(
                entry, delta_df, new_state, int(state["rows"])
            )
        finally:
            for t in topics:
                self._register(t.entry)

    def drop_table(self, name: str) -> None:
        catalog, schema, base = self._split(name)
        entry = self.store.tables.get((catalog, schema, base))
        if entry is None:
            raise ValueError(f"table {name!r} does not exist")
        self.store.drop_table(catalog, schema, base)
        self._unregister(entry)
        self._drop_data(entry)

    def _drop_data(self, entry: TableEntry) -> None:
        if entry.kind in ("topic", "materialized_view"):
            path = self.store.table_path(entry)
            if path.exists():
                shutil.rmtree(path)

    def create_schema(self, name: str, if_not_exists: bool = False) -> None:
        self.store.create_schema(name, if_not_exists=if_not_exists)

    def drop_schema(
        self, name: str, *, cascade: bool = False, if_exists: bool = False
    ) -> None:
        """Drop a schema (LocalBackend DropSchema parity,
        lazy/backend.rs:104-128). Without CASCADE a non-empty schema is
        an error; with CASCADE its tables are unregistered and their
        data removed first."""
        parts = name.split(".")
        if len(parts) == 2:
            catalog, schema = parts
        elif len(parts) == 1:
            catalog, schema = DEFAULT_CATALOG, parts[0]
        else:
            raise ValueError(f"invalid schema name {name!r}")
        if (catalog, schema) not in self.store.schemas:
            if if_exists:
                return
            raise ValueError(f"schema {catalog}.{schema} does not exist")
        members = [
            e
            for e in self.store.tables.values()
            if (e.catalog, e.schema) == (catalog, schema)
        ]
        if members and not cascade:
            raise ValueError(
                f"schema {catalog}.{schema} is not empty "
                f"({len(members)} tables); use DROP SCHEMA ... CASCADE"
            )
        for e in members:
            self._unregister(e)
            self._drop_data(e)
        self.store.drop_schema(schema, catalog)

    def create_catalog(self, name: str, if_not_exists: bool = False) -> None:
        self.store.create_catalog(name, if_not_exists=if_not_exists)

    def drop_catalog(
        self, name: str, *, cascade: bool = False, if_exists: bool = False
    ) -> None:
        """Drop a catalog; CASCADE removes its schemas and tables
        (incl. data). Mirrors the schema-drop contract one level up."""
        if name not in self.store.catalogs:
            if if_exists:
                return
            raise ValueError(f"catalog {name!r} does not exist")
        members = [e for e in self.store.tables.values() if e.catalog == name]
        schemas = [s for s in self.store.schemas if s[0] == name]
        if (members or schemas) and not cascade:
            raise ValueError(
                f"catalog {name!r} is not empty ({len(schemas)} schemas, "
                f"{len(members)} tables); use DROP CATALOG ... CASCADE"
            )
        for e in members:
            self._unregister(e)
            self._drop_data(e)
        self.store.drop_catalog(name)

    # -- access ------------------------------------------------------------------

    def topic(self, name: str) -> Topic:
        entry = self._require(name, "topic")
        return Topic(self.store, entry)

    def publish(self, name: str, capacity: int = 1024) -> Publisher:
        return self.topic(name).publish(capacity)

    def tables(self) -> list[str]:
        return sorted(".".join(e.ident) for e in self.store.tables.values())

    # -- query (state.rs:151-154) ---------------------------------------------

    def query(self, sql: str, params: dict | list | None = None) -> Lazy:
        """Parse + plan, deferred: `ella.query(sql)` → Lazy.

        ``params`` binds named (``:name`` with a dict) or positional
        (``?`` with a list) markers via Spark's parameterized SQL —
        the Flight SQL prepared-statement analog, with literals kept
        out of the query text (no injection, stable plan cache keys).
        Parameters apply to relational statements (and the source
        query of INSERT INTO); DDL verbs take none and raise.

        Topic views are re-registered first: Spark's parquet file index
        is frozen per DataFrame, so shards published since registration
        would otherwise be invisible (the reference's TopicExec re-lists
        shards per scan, topic.rs:165-203 — same semantics).

        ``INSERT INTO <topic> SELECT ...|VALUES ...`` routes to the
        topic's distributed sink (the reference's DataSink path,
        topic.rs:205-213 via InsertExec) and yields a single-row
        ``count`` frame, matching the reference's returned row count.

        ``now()`` is substituted once per statement with the current
        epoch-ns, so ``WHERE time < now()`` is the reference's bounded
        history cut (README.md:96-105). SQL queries always read the
        history tier; the live tail is ``scan(mode="live"/"auto")`` or
        ``subscribe()`` (Spark separates batch and streaming plans —
        SURVEY §1.4.3).
        """
        import time as _time_mod

        sql = _NOW_RE.sub(str(_time_mod.time_ns()), sql)
        self._register_all()
        if _INFO_SCHEMA_RE.search(sql):
            sql = self._register_information_schema(sql)
        # DDL dispatch runs BEFORE the ann_search rewrite so a stored
        # view/MV keeps the durable `ann_search(...)` text, never a
        # session-scoped __ann_search_N temp-view name that would be
        # dangling after reopen; _frame_for re-applies the rewrite at
        # every read/refresh instead.
        ddl = self._dispatch_ddl(sql)
        if ddl is not None:
            if params is not None:
                raise ValueError(
                    "params apply to relational statements, not DDL"
                )
            return ddl
        # Lazy keeps the PRE-rewrite text: creating a view/MV from a
        # Lazy must persist durable ann_search(...) / VERSION AS OF
        # SQL, never the session-scoped temp-view names the rewrites
        # substitute (those dangle after reopen; _frame_for and the
        # refresh paths re-apply the rewrites at every read instead).
        durable_sql = sql
        sql = self._apply_tvf_rewrites(sql)
        if _VERSION_ASOF_RE.search(sql) or _TIMESTAMP_ASOF_RE.search(sql):
            sql = self._rewrite_version_asof(sql)
        m = _INSERT_RE.match(sql)
        if m:
            topic = self.topic(m.group(1))
            src = (
                self.spark.sql(m.group(2), args=params)
                if params is not None
                else self.spark.sql(m.group(2))
            )
            names = [c.name for c in topic.entry.columns]
            if len(src.columns) == len(names) - 1:
                # time omitted: auto-fill now() like the publisher
                # (pyella publisher.rs:119-123 behavior)
                import time as _time

                import pyspark.sql.functions as F

                src = src.select(
                    F.lit(_time.time_ns()).cast("long").alias(TIME_COLUMN), "*"
                )
            if src.columns != names and len(src.columns) == len(names):
                src = src.toDF(*names)
            n = topic.insert(src)
            self._register(topic.entry)
            return Lazy(
                self.spark.createDataFrame([(n,)], "count long"),
                engine=self,
                sql=durable_sql,
            )
        df = (
            self.spark.sql(sql, args=params)
            if params is not None
            else self.spark.sql(sql)
        )
        return Lazy(df, engine=self, sql=durable_sql)

    def _rewrite_ann_search(self, sql: str) -> str:
        """Table-valued ANN search in plain SQL:

            SELECT * FROM ann_search('vecs', 'embedding', 'qv', 5, 6)

        args: indexed table, vector column, a registered table/view of
        query rows (same id/vector schema), then optional k and
        n_probe. The call resolves against the table's PERSISTED IVF
        index (`create_vector_index` artifact — errors if absent), runs
        the distributed index-backed search, and is substituted with a
        temp view so the surrounding statement (joins, filters, ORDER
        BY) stays ordinary Spark SQL. The query batch is collected
        driver-side at rewrite time — query sets are small by
        definition (they broadcast everywhere downstream anyway)."""
        repls = []
        for m in _ANN_SEARCH_RE.finditer(sql):
            table, column, qsrc, k, n_probe = m.groups()
            res = self.vector_search(
                table,
                self.spark.table(qsrc),
                column=column,
                k=int(k) if k else 5,
                n_probe=int(n_probe) if n_probe else 4,
            )
            view = f"__ann_search_{next(_TVF_VIEW_SEQ)}"
            res.createOrReplaceTempView(view)
            self._register_tvf_view(view)
            repls.append((m.start(), m.end(), view))
        return _splice_spans(sql, repls)

    def _rewrite_point_lookup(self, sql: str) -> str:
        """Table-valued bloom-backed point lookup in plain SQL:

            SELECT * FROM point_lookup('events_t', 'user_id', 42)

        args: a topic, a column, an equality literal (number or
        'string'). Substituted with a temp view over
        ``Topic.read(col_eq=...)`` so the scan's FILE LIST already
        excludes every shard whose manifest Bloom filter proves the
        value absent (build_manifest(bloom_cols=...)) — the high-
        cardinality-key fetch where min/max pruning never skips. The
        residual equality filter rides along, so the result is correct
        with or without filters (un-bloomed shards are just read). The
        surrounding statement stays ordinary Spark SQL, and stored
        views keep the durable point_lookup(...) text (the ann_search
        re-rewrite-per-read contract)."""
        repls = []
        for m in _POINT_LOOKUP_RE.finditer(sql):
            table, column, lit = m.groups()
            if lit.startswith("'"):
                value: object = lit[1:-1]
            elif "." in lit:
                value = float(lit)
            else:
                value = int(lit)
            entry = self.store.resolve(table)
            if entry is None or entry.kind != "topic":
                raise ValueError(
                    f"point_lookup: {table!r} is not a topic"
                )
            res = Topic(self.store, entry).read(
                self.spark, col_eq={column: value}
            )
            view = f"__point_lookup_{next(_TVF_VIEW_SEQ)}"
            res.createOrReplaceTempView(view)
            self._register_tvf_view(view)
            repls.append((m.start(), m.end(), view))
        return _splice_spans(sql, repls)

    def _rewrite_psi_drift(self, sql: str) -> str:
        """Table-valued drift monitor in plain SQL:

            SELECT * FROM psi_drift('events_t', 'value', 'kind')
            SELECT * FROM psi_drift('events_t', 'value', 'kind', 20)

        args: any catalog object (topic/view/MV/external), a numeric
        value column, a slice column, optional bucket count (default
        10). Substituted with a temp view over
        ``operators.drift.psi_by_slice`` on the object's resolved
        frame; stored views keep the durable psi_drift(...) text and
        re-rewrite per read (the ann_search/point_lookup contract), so
        a saved drift dashboard always scores CURRENT data."""
        from ella_spark.operators.drift import psi_by_slice

        repls = []
        for m in _PSI_DRIFT_RE.finditer(sql):
            table, value_col, slice_col, buckets = m.groups()
            entry = self.store.resolve(table)
            if entry is None:
                raise ValueError(f"psi_drift: unknown table {table!r}")
            res = psi_by_slice(
                self._frame_for(entry),
                value_col,
                slice_col,
                buckets=_positive_buckets(buckets),
            )
            view = f"__psi_drift_{next(_TVF_VIEW_SEQ)}"
            res.createOrReplaceTempView(view)
            self._register_tvf_view(view)
            repls.append((m.start(), m.end(), view))
        return _splice_spans(sql, repls)

    def _rewrite_chi2_drift(self, sql: str) -> str:
        """Table-valued chi-squared drift in plain SQL:

            SELECT * FROM chi2_drift('docs_t', 'lang', 'source')

        args: any catalog object, a slice column, a categorical
        column. Same durable-text re-rewrite contract as psi_drift."""
        from ella_spark.operators.drift import chi2_by_slice

        repls = []
        for m in _CHI2_DRIFT_RE.finditer(sql):
            table, slice_col, cat_col = m.groups()
            entry = self.store.resolve(table)
            if entry is None:
                raise ValueError(f"chi2_drift: unknown table {table!r}")
            res = chi2_by_slice(self._frame_for(entry), slice_col, cat_col)
            view = f"__chi2_drift_{next(_TVF_VIEW_SEQ)}"
            res.createOrReplaceTempView(view)
            self._register_tvf_view(view)
            repls.append((m.start(), m.end(), view))
        return _splice_spans(sql, repls)

    def _rewrite_ks_drift(self, sql: str) -> str:
        """Table-valued KS drift in plain SQL:

            SELECT * FROM ks_drift('events_t', 'value', 'kind')

        args: any catalog object, a numeric value column, a slice
        column. Two-sample Kolmogorov–Smirnov D per slice vs the
        pooled distribution (operators/drift.py ks_by_slice); same
        durable-text re-rewrite contract as psi_drift/chi2_drift, so
        a saved drift view always scores CURRENT data."""
        from ella_spark.operators.drift import ks_by_slice

        repls = []
        for m in _KS_DRIFT_RE.finditer(sql):
            table, value_col, slice_col = m.groups()
            entry = self.store.resolve(table)
            if entry is None:
                raise ValueError(f"ks_drift: unknown table {table!r}")
            res = ks_by_slice(self._frame_for(entry), value_col, slice_col)
            view = f"__ks_drift_{next(_TVF_VIEW_SEQ)}"
            res.createOrReplaceTempView(view)
            self._register_tvf_view(view)
            repls.append((m.start(), m.end(), view))
        return _splice_spans(sql, repls)

    def _rewrite_cusum_drift(self, sql: str) -> str:
        """Table-valued CUSUM changepoint in plain SQL:

            SELECT * FROM cusum_drift('events_t', 'value', 'kind')
            SELECT * FROM cusum_drift('t', 'v', 'k', 'time')

        args: any catalog object, a numeric value column, a slice
        column, optional epoch-ns time column (default: the topic's
        mandatory `time`). Localizes WHEN each slice's level shifted
        (operators/drift.py cusum_by_slice, day buckets); same
        durable-text re-rewrite contract as the other drift TVFs."""
        from ella_spark.operators.drift import cusum_by_slice

        repls = []
        for m in _CUSUM_DRIFT_RE.finditer(sql):
            table, value_col, slice_col, time_col = m.groups()
            entry = self.store.resolve(table)
            if entry is None:
                raise ValueError(f"cusum_drift: unknown table {table!r}")
            res = cusum_by_slice(
                self._frame_for(entry),
                value_col,
                slice_col,
                time_col or TIME_COLUMN,
            )
            view = f"__cusum_drift_{next(_TVF_VIEW_SEQ)}"
            res.createOrReplaceTempView(view)
            self._register_tvf_view(view)
            repls.append((m.start(), m.end(), view))
        return _splice_spans(sql, repls)

    def _rewrite_js_divergence(self, sql: str) -> str:
        """Table-valued Jensen–Shannon divergence in plain SQL:

            SELECT * FROM js_divergence('events_t', 'value', 'kind')
            SELECT * FROM js_divergence('t', 'v', 'k', 20)

        args: any catalog object, a numeric value column, a slice
        column, optional bucket count (default 10). The bounded
        symmetric divergence (operators/drift.py js_by_slice); same
        durable-text re-rewrite contract as the other drift TVFs, so
        a saved drift view always scores CURRENT data. Completes the
        drift TVF matrix (r9 VERDICT #4): a dashboard user previously
        got PSI/chi²/KS/CUSUM from SQL but had to drop to Python for
        JS/EMD/PH."""
        from ella_spark.operators.drift import js_by_slice

        repls = []
        for m in _JS_DIVERGENCE_RE.finditer(sql):
            table, value_col, slice_col, buckets = m.groups()
            entry = self.store.resolve(table)
            if entry is None:
                raise ValueError(f"js_divergence: unknown table {table!r}")
            res = js_by_slice(
                self._frame_for(entry),
                value_col,
                slice_col,
                buckets=_positive_buckets(buckets),
            )
            view = f"__js_divergence_{next(_TVF_VIEW_SEQ)}"
            res.createOrReplaceTempView(view)
            self._register_tvf_view(view)
            repls.append((m.start(), m.end(), view))
        return _splice_spans(sql, repls)

    def _rewrite_earth_movers(self, sql: str) -> str:
        """Table-valued earth mover's distance in plain SQL:

            SELECT * FROM earth_movers('events_t', 'value', 'kind')

        args: any catalog object, a numeric value column, a slice
        column. 1-D Wasserstein-1 per slice vs pooled in the value's
        own units (operators/drift.py emd_by_slice); same durable-text
        re-rewrite contract as the other drift TVFs."""
        from ella_spark.operators.drift import emd_by_slice

        repls = []
        for m in _EARTH_MOVERS_RE.finditer(sql):
            table, value_col, slice_col = m.groups()
            entry = self.store.resolve(table)
            if entry is None:
                raise ValueError(f"earth_movers: unknown table {table!r}")
            res = emd_by_slice(self._frame_for(entry), value_col, slice_col)
            view = f"__earth_movers_{next(_TVF_VIEW_SEQ)}"
            res.createOrReplaceTempView(view)
            self._register_tvf_view(view)
            repls.append((m.start(), m.end(), view))
        return _splice_spans(sql, repls)

    def _rewrite_page_hinkley(self, sql: str) -> str:
        """Table-valued batch Page-Hinkley in plain SQL:

            SELECT * FROM page_hinkley('events_t', 'value', 'kind')
            SELECT * FROM page_hinkley('t', 'v', 'k', 'time', 25.0)

        args: any catalog object, a numeric value column, a slice
        column, optional epoch-ns time column (default: the topic's
        mandatory `time`), optional alarm threshold lambda (default
        50). Batch replay of the streaming detector's δ=0 recurrence
        (operators/drift.py page_hinkley_by_slice); same durable-text
        re-rewrite contract as the other drift TVFs."""
        from ella_spark.operators.drift import page_hinkley_by_slice

        repls = []
        for m in _PAGE_HINKLEY_RE.finditer(sql):
            table, value_col, slice_col, time_col, lam = m.groups()
            entry = self.store.resolve(table)
            if entry is None:
                raise ValueError(f"page_hinkley: unknown table {table!r}")
            res = page_hinkley_by_slice(
                self._frame_for(entry),
                value_col,
                slice_col,
                time_col or TIME_COLUMN,
                lam=float(lam) if lam else 50.0,
            )
            view = f"__page_hinkley_{next(_TVF_VIEW_SEQ)}"
            res.createOrReplaceTempView(view)
            self._register_tvf_view(view)
            repls.append((m.start(), m.end(), view))
        return _splice_spans(sql, repls)

    def _rewrite_statqa(self, sql: str, regex, kind: str) -> str:
        """Table-valued statistical-QA screens in plain SQL (round 10
        — the statqa analog of the drift TVF matrix):

            SELECT * FROM mann_whitney('events_t', 'value', 'kind')
            SELECT * FROM grubbs('events_t', 'value', 'kind')
            SELECT * FROM levene('events_t', 'value', 'kind')
            SELECT * FROM runs_test('t', 'v', 'k' [, 'time'])

        args: any catalog object, a numeric value column, a slice
        column (runs_test: optional epoch-ns time column, default the
        topic's mandatory `time`). Rank-shift (Mann–Whitney U/AUC),
        extreme-deviation (Grubbs G), dispersion-homogeneity (Levene
        W) and randomness (Wald–Wolfowitz runs z) per slice —
        operators/statqa.py; same durable-text re-rewrite +
        unique-view + bounded-GC contracts as the drift TVFs, so a
        saved QA dashboard always scores CURRENT data. The registry
        queries (q_mann_whitney, q_grubbs_outlier, q_levene_variance,
        q_runs_test) pin the cross-engine-exact forms."""
        from ella_spark.operators import statqa

        ops = {
            "mann_whitney": statqa.mann_whitney_by_slice,
            "grubbs": statqa.grubbs_by_slice,
            "levene": statqa.levene_by_slice,
            "runs_test": statqa.runs_test_by_slice,
        }
        repls = []
        for m in regex.finditer(sql):
            groups = m.groups()
            table, value_col, slice_col = groups[:3]
            entry = self.store.resolve(table)
            if entry is None:
                raise ValueError(f"{kind}: unknown table {table!r}")
            frame = self._frame_for(entry)
            if kind == "runs_test":
                time_col = (groups[3] if len(groups) > 3 else None) or TIME_COLUMN
                res = ops[kind](frame, value_col, slice_col, time_col)
            else:
                res = ops[kind](frame, value_col, slice_col)
            view = f"__{kind}_{next(_TVF_VIEW_SEQ)}"
            res.createOrReplaceTempView(view)
            self._register_tvf_view(view)
            repls.append((m.start(), m.end(), view))
        return _splice_spans(sql, repls)

    def _rewrite_daybucket_tvf(self, sql: str, regex, name: str, op) -> str:
        """Shared dispatcher for the day-bucketed TVFs (trend_robust /
        set_churn — the statqa `_rewrite_statqa` pattern): matches
        `name('<table>', '<a>', '<b>'[, '<time_col>'][, days])`,
        applies the quoted-digit rebind (a QUOTED number in the 4th
        slot is a bucket width the user quoted by habit, not a time
        column named '7' — an all-digit time column would be
        unresolvable anyway, just with a worse error), validates, and
        calls ``op(frame, a, b, time_col, bucket_ns)``."""
        repls = []
        for m in regex.finditer(sql):
            table, a, b, time_col, days = m.groups()
            if time_col and time_col.isdigit() and days is None:
                time_col, days = None, time_col
            entry = self.store.resolve(table)
            if entry is None:
                raise ValueError(f"{name}: unknown table {table!r}")
            n_days = int(days) if days else 1
            if n_days < 1:
                raise ValueError(f"bucket_days must be >= 1, got {n_days}")
            res = op(
                self._frame_for(entry),
                a,
                b,
                time_col or TIME_COLUMN,
                n_days * 86_400_000_000_000,
            )
            view = f"__{name}_{next(_TVF_VIEW_SEQ)}"
            res.createOrReplaceTempView(view)
            self._register_tvf_view(view)
            repls.append((m.start(), m.end(), view))
        return _splice_spans(sql, repls)

    def _rewrite_trend_robust(self, sql: str) -> str:
        """Table-valued robust trend in plain SQL:

            SELECT * FROM trend_robust('metrics', 'v', 'sensor')
            SELECT * FROM trend_robust('t', 'v', 'k', 'time', 7)

        args: any catalog object, a numeric value column, a slice
        column, optional epoch-ns time column (default the topic's
        mandatory `time`), optional bucket width in DAYS (default 1 —
        pass 7 for weeks on multi-year spans: Mann-Kendall/Theil-Sen
        pairs grow as buckets², so the bucket argument is the scale
        knob the r9 verdict asked to make callable). Same durable-text
        re-rewrite contract as the drift/statqa TVFs."""
        from ella_spark.operators.drift import trend_robust

        return self._rewrite_daybucket_tvf(
            sql,
            _TREND_ROBUST_RE,
            "trend_robust",
            lambda frame, v, s, t, ns: trend_robust(
                frame, v, s, t, bucket_ns=ns
            ),
        )

    def _rewrite_near_dup_pairs(self, sql: str) -> str:
        """Table-valued near-duplicate candidate pairs in plain SQL
        (round 11 — dedup joins the drift/statqa TVF matrices, so the
        curation pipeline is runnable by a SQL-only user):

            SELECT * FROM near_dup_pairs('docs', 'text', 'doc_id')
            SELECT * FROM near_dup_pairs('docs', 'text', 'doc_id', 0.8)

        args: any catalog object, a text column, an id column, and an
        optional exact-Jaccard verification threshold in (0, 1]
        (default 0.5). Returns (id_a, id_b, jaccard) with id_a < id_b
        — MinHash signatures + banded LSH generate candidates (the
        shuffle carries (id, band_hash), never the O(n²) pair space),
        exact Jaccard over hashed shingle sets verifies them
        (operators/dedup.py minhash_lsh_pairs). Same durable-text
        re-rewrite + unique-view + bounded-GC contracts as every
        other TVF, so a saved dedup dashboard always scores CURRENT
        data."""
        from ella_spark.operators.dedup import minhash_lsh_pairs

        repls = []
        for m in _NEAR_DUP_PAIRS_RE.finditer(sql):
            table, text_col, id_col, thr = m.groups()
            entry = self.store.resolve(table)
            if entry is None:
                raise ValueError(f"near_dup_pairs: unknown table {table!r}")
            threshold = float(thr) if thr else 0.5
            if not 0.0 < threshold <= 1.0:
                raise ValueError(
                    f"min_jaccard must be in (0, 1], got {threshold}"
                )
            res = minhash_lsh_pairs(
                self._frame_for(entry),
                text_col=text_col,
                id_col=id_col,
                jaccard_threshold=threshold,
            )
            view = f"__near_dup_pairs_{next(_TVF_VIEW_SEQ)}"
            res.createOrReplaceTempView(view)
            self._register_tvf_view(view)
            repls.append((m.start(), m.end(), view))
        return _splice_spans(sql, repls)

    def _rewrite_exact_dup_groups(self, sql: str) -> str:
        """Table-valued exact-duplicate groups in plain SQL:

            SELECT * FROM exact_dup_groups('docs', 'text', 'doc_id')

        Returns (content_hash, keep_id, n_copies) — one row per
        distinct normalized content, keep_id = min id of the group
        (operators/dedup.py exact_dedup: ONE hash-aggregate shuffle
        on the 16-byte digest; document bodies never shuffle).
        `WHERE n_copies > 1` filters to actual duplicate groups."""
        from ella_spark.operators.dedup import exact_dedup

        repls = []
        for m in _EXACT_DUP_GROUPS_RE.finditer(sql):
            table, text_col, id_col = m.groups()
            entry = self.store.resolve(table)
            if entry is None:
                raise ValueError(
                    f"exact_dup_groups: unknown table {table!r}"
                )
            res = exact_dedup(
                self._frame_for(entry), text_col=text_col, id_col=id_col
            )
            view = f"__exact_dup_groups_{next(_TVF_VIEW_SEQ)}"
            res.createOrReplaceTempView(view)
            self._register_tvf_view(view)
            repls.append((m.start(), m.end(), view))
        return _splice_spans(sql, repls)

    def _rewrite_distinct_overlap(self, sql: str) -> str:
        """Table-valued pairwise distinct-overlap profiling in SQL:

            SELECT * FROM distinct_overlap('events_t', 'kind', 'user_id')
            SELECT * FROM distinct_overlap('docs', 'lang', 'text', 8192)

        args: any catalog object, a group column (dozens-to-hundreds
        of groups — sources, languages, event types; never a
        high-cardinality id), a value column, optional sketch size k
        (default 4096, >= 2). Returns (grp_a, grp_b, est_a, est_b,
        union_est, jaccard, inter_est) per group pair — merged KMV
        bottom-k sketches (operators/sketch.py kmv_overlap), exact
        whenever a pair's distinct union fits in k. The audience
        question: "how much does crawl source A's user/url population
        overlap source B's?" before paying for a full dedup pass."""
        from ella_spark.operators.sketch import kmv_overlap

        repls = []
        for m in _DISTINCT_OVERLAP_RE.finditer(sql):
            table, group_col, value_col, karg = m.groups()
            entry = self.store.resolve(table)
            if entry is None:
                raise ValueError(
                    f"distinct_overlap: unknown table {table!r}"
                )
            k = int(karg) if karg else 4096
            if k < 2:
                raise ValueError(f"k must be >= 2, got {k}")
            res = kmv_overlap(self._frame_for(entry), group_col, value_col, k)
            view = f"__distinct_overlap_{next(_TVF_VIEW_SEQ)}"
            res.createOrReplaceTempView(view)
            self._register_tvf_view(view)
            repls.append((m.start(), m.end(), view))
        return _splice_spans(sql, repls)

    def _rewrite_set_churn(self, sql: str) -> str:
        """Table-valued bucket-over-bucket set churn in plain SQL —
        the batch twin of the streaming set-churn monitor:

            SELECT * FROM set_churn('pages', 'source', 'url')
            SELECT * FROM set_churn('t', 'src', 'v', 'ts', 7)

        args: any catalog object, a group column, a value column,
        optional epoch-ns time column (default the topic's mandatory
        `time`), optional bucket width in DAYS (default 1 — the
        trend_robust conventions, including the quoted-digit rebind).
        Returns (group, bucket_start, cur_distinct, prev_distinct,
        inter, uni, jaccard, novelty) per (group, bucket) — exact set
        arithmetic over xxhash64 digests, four keyed exchanges of
        which only the O(distinct)-row ones spread by sub-keys
        (operators/sketch.py set_churn_buckets). The audience
        question: "is this source re-serving yesterday's content
        (novelty → 0) or did it rotate its corpus (novelty → 1)?"."""
        from ella_spark.operators.sketch import set_churn_buckets

        return self._rewrite_daybucket_tvf(
            sql,
            _SET_CHURN_RE,
            "set_churn",
            lambda frame, g, v, t, ns: set_churn_buckets(
                frame, g, v, t, bucket_ns=ns
            ),
        )

    def _rewrite_minhash_drift(self, sql: str) -> str:
        """Table-valued bucket-over-history MinHash drift in plain SQL
        — the batch twin of the streaming similarity monitor
        (``minhash_drift_per_group``), completing the monitor family's
        TVF column (trend_robust / set_churn / minhash_drift):

            SELECT * FROM minhash_drift('pages', 'source', 'body')
            SELECT * FROM minhash_drift('t', 'src', 'txt', 'ts', 7)

        args: any catalog object, a group column, a TEXT column,
        optional epoch-ns time column (default the topic's mandatory
        `time`), optional bucket width in DAYS (default 1 — the
        trend_robust conventions, including the quoted-digit rebind).
        Returns (group, bucket_start, n_docs, est_jaccard,
        est_containment, novelty) per (group, bucket) — each bucket's
        MinHash signature scored against the slotwise-min fold of ALL
        earlier buckets (the streaming monitor's accumulated-history
        semantics, not set_churn's previous-bucket-only), production
        _kgram_hashes/_mix64 chain, unsigned order JVM-side via the
        sign-bit flip (operators/dedup.py minhash_drift_buckets). The
        audience question: "is this source re-serving or lightly
        rewording its own history (novelty → 0) or did its CONTENT
        rotate (novelty → 1)?" — shingle-level, so a one-character
        edit that set_churn calls brand-new stays near 0 here."""
        from ella_spark.operators.dedup import minhash_drift_buckets

        return self._rewrite_daybucket_tvf(
            sql,
            _MINHASH_DRIFT_RE,
            "minhash_drift",
            lambda frame, g, t, tc, ns: minhash_drift_buckets(
                frame, g, t, tc, bucket_ns=ns
            ),
        )

    def _rewrite_embedding_neardup(self, sql: str) -> str:
        """Table-valued embedding-cosine near-dup pairs in plain SQL —
        the semantic member of the dedup TVF family:

            SELECT * FROM embedding_neardup('vecs', 'embedding', 'vec_id')
            SELECT * FROM embedding_neardup('vecs', 'embedding', 'vec_id',
                                            'label', 0.9)

        args: any catalog object, an array<float/double> vector
        column, an id column, an optional bucket column that bounds
        the pair space (cluster/label/shard — REQUIRED in spirit at
        scale: without it the pair space is O(n²), small data only),
        and an optional cosine threshold in (0, 1] (default 0.95).
        Returns (id_a, id_b, cosine) with id_a < id_b — the dot
        product runs JVM-side (zip_with + aggregate) behind the
        operator's CollectMetrics barrier
        (operators/dedup.py embedding_neardup_pairs)."""
        from ella_spark.operators.dedup import embedding_neardup_pairs

        repls = []
        for m in _EMBEDDING_NEARDUP_RE.finditer(sql):
            table, vec_col, id_col, bucket_col, thr = m.groups()
            # a QUOTED number in the bucket slot is a threshold the
            # user quoted by habit, not a bucket column named '0.9'
            # (the trend_robust arg-binding rule). Only the SAME
            # numeric shape the unquoted slot accepts rebinds —
            # float() forms like '1e-1'/'inf'/'nan'/'  .5' stay bucket
            # columns so a numeric-parseable column name is never
            # silently turned into a cosine threshold.
            if bucket_col and thr is None and re.fullmatch(
                r"\d*\.\d+|\d+", bucket_col
            ):
                thr, bucket_col = bucket_col, None
            entry = self.store.resolve(table)
            if entry is None:
                raise ValueError(
                    f"embedding_neardup: unknown table {table!r}"
                )
            threshold = float(thr) if thr else 0.95
            if not 0.0 < threshold <= 1.0:
                raise ValueError(
                    f"cosine threshold must be in (0, 1], got {threshold}"
                )
            res = embedding_neardup_pairs(
                self._frame_for(entry),
                vec_col=vec_col,
                id_col=id_col,
                cosine_threshold=threshold,
                bucket_col=bucket_col,
            )
            view = f"__embedding_neardup_{next(_TVF_VIEW_SEQ)}"
            res.createOrReplaceTempView(view)
            self._register_tvf_view(view)
            repls.append((m.start(), m.end(), view))
        return _splice_spans(sql, repls)

    def _register_information_schema(self, sql: str) -> str:
        """information_schema.tables / .columns over the catalog store.

        The reference builds its SessionState with
        ``with_information_schema(true)`` (ella-engine/src/engine/
        state.rs:115-133), so ``SELECT * FROM information_schema.tables``
        works out of the box there. Spark has no information_schema;
        the ANSI-shaped views are materialized from the catalog store
        at query time (tiny — catalog metadata, never data) and the
        statement is rewritten to reference them.
        """
        entries = sorted(self.store.tables.values(), key=lambda e: e.ident)
        kind_to_type = {"topic": "BASE TABLE", "external": "BASE TABLE",
                        "view": "VIEW",
                        "materialized_view": "VIEW"}
        tables = [
            (e.catalog, e.schema, e.name, kind_to_type.get(e.kind, e.kind.upper()))
            for e in entries
        ]
        self.spark.createDataFrame(
            tables or [(None,) * 4],
            "table_catalog string, table_schema string, "
            "table_name string, table_type string",
        ).where("table_name is not null").createOrReplaceTempView(
            "__information_schema_tables"
        )
        columns = [
            (e.catalog, e.schema, e.name, c.name, i + 1,
             "NO" if c.required else "YES", c.dtype)
            for e in entries
            for i, c in enumerate(e.columns)
        ]
        self.spark.createDataFrame(
            columns or [(None,) * 7],
            "table_catalog string, table_schema string, table_name string, "
            "column_name string, ordinal_position int, "
            "is_nullable string, data_type string",
        ).where("table_name is not null").createOrReplaceTempView(
            "__information_schema_columns"
        )
        return _INFO_SCHEMA_RE.sub(
            lambda m: f"__information_schema_{m.group(1).lower()}", sql
        )

    def _dispatch_ddl(self, sql: str) -> Lazy | None:
        """Imperative DDL dispatch (LocalBackend::stream parity,
        lazy/backend.rs:66-161): CREATE VIEW / DROP TABLE|VIEW /
        CREATE SCHEMA|DATABASE / CREATE CATALOG route to the catalog;
        anything else returns None and flows to spark.sql."""
        empty = lambda: Lazy(  # noqa: E731 — DDL yields an empty frame
            self.spark.createDataFrame([], "ok boolean"), engine=self, sql=sql
        )
        if m := _SET_RE.match(sql):
            # DataFusion `SET <key> = <value>` (a Statement plan, which
            # the reference `unimplemented!()`s — backend.rs:163).
            # Routed to the Spark session conf: runtime-settable SQL
            # confs apply immediately; static/core confs raise Spark's
            # own CANNOT_MODIFY_CONFIG error, surfaced as-is.
            # Unwrap exactly ONE matching pair of quotes: .strip("'\"")
            # would eat any RUN of quote chars from both ends, mangling
            # values that legitimately start/end with a quote.
            value = m.group(2).strip()
            if len(value) >= 2 and value[0] == value[-1] and value[0] in "'\"":
                value = value[1:-1]
            self.spark.conf.set(m.group(1), value)
            return empty()
        if m := _CREATE_MATVIEW_RE.match(sql):
            n = self.create_materialized_view(
                m.group(2),
                m.group(4).strip(),
                replace=bool(m.group(1)),
                keep_versions=int(m.group(3)) if m.group(3) else 1,
            )
            return Lazy(
                self.spark.createDataFrame([(n,)], "count long"), engine=self, sql=sql
            )
        if m := _REFRESH_MATVIEW_RE.match(sql):
            n = self.refresh_materialized(m.group(1))
            return Lazy(
                self.spark.createDataFrame([(n,)], "count long"), engine=self, sql=sql
            )
        if m := _CTAS_RE.match(sql):
            from pyspark.sql import functions as F
            from pyspark.sql import types as T

            if m.group(1) and (existing := self.store.resolve(m.group(2))) is not None:
                # IF NOT EXISTS on a pre-existing TOPIC is a no-op
                # (Spark/Postgres CTAS semantics): re-running the
                # statement must not append a second copy of the data.
                # A same-named view/MV/external is a KIND conflict and
                # raises, exactly as plain create_topic would — the
                # no-op must not silently mask it.
                if existing.kind != "topic":
                    raise ValueError(
                        f"cannot CREATE TOPIC {m.group(2)!r}: a "
                        f"{existing.kind} with that name already exists"
                    )
                return Lazy(
                    self.spark.createDataFrame([(0,)], "count long"),
                    engine=self,
                    sql=sql,
                )
            df = self.spark.sql(m.group(3).strip())
            if TIME_COLUMN not in df.columns:
                raise ValueError(
                    "CREATE TOPIC ... AS SELECT requires the SELECT to "
                    f"produce an epoch-ns '{TIME_COLUMN}' column "
                    "(topics are time-indexed; add e.g. "
                    "`unix_micros(now()) * 1000 AS time`)"
                )
            time_type = df.schema[TIME_COLUMN].dataType
            if isinstance(time_type, (T.TimestampType, T.TimestampNTZType)):
                # cast(timestamp AS long) yields epoch SECONDS; topics
                # index epoch NANOSECONDS — convert explicitly so rows
                # land in the right day buckets. TIMESTAMP_NTZ (what a
                # raw-parquet external table surfaces) first casts to
                # TIMESTAMP: the session tz is pinned UTC by
                # configure(), so the wall time IS the instant.
                df = df.withColumn(
                    TIME_COLUMN,
                    F.unix_micros(F.col(TIME_COLUMN).cast("timestamp"))
                    * F.lit(1000),
                )
            elif isinstance(
                time_type, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
            ):
                df = df.withColumn(TIME_COLUMN, F.col(TIME_COLUMN).cast("long"))
            else:
                raise ValueError(
                    f"CTAS '{TIME_COLUMN}' column must be integral epoch-ns "
                    f"or TIMESTAMP, got {time_type.simpleString()}"
                )
            cols = [
                Column.from_struct_field(f)
                for f in df.schema.fields
                if f.name != TIME_COLUMN
            ]
            t = self.create_topic(
                m.group(2), cols, if_not_exists=bool(m.group(1))
            )
            n = t.insert(df)
            self._register(t.entry)
            return Lazy(
                self.spark.createDataFrame([(n,)], "count long"),
                engine=self,
                sql=sql,
            )
        if m := _COPY_RE.match(sql):
            from pyspark.sql import Observation
            from pyspark.sql import functions as F

            # Count rows with an Observation attached to the write job
            # itself (the Topic.insert pattern): one job total, and no
            # re-read miscounts (CSV re-reads without schema/multiLine
            # can split on quoted newlines).
            obs = Observation("copy_to_count")
            out = self.query(m.group("q").strip()).df.observe(
                obs, F.count(F.lit(1)).alias("n")
            )
            fmt = (m.group("fmt") or "parquet").lower()
            writer = out.write.mode("errorifexists")
            if fmt == "csv":
                writer.option("header", "true").csv(m.group("path"))
            else:
                writer.parquet(m.group("path"))
            n = obs.get["n"]
            return Lazy(
                self.spark.createDataFrame([(n,)], "count long"),
                engine=self,
                sql=sql,
            )
        if m := _CREATE_EXTERNAL_RE.match(sql):
            self.create_external_table(
                m.group(2),
                m.group(3),
                m.group(5),
                header=bool(m.group(4)),
                if_not_exists=bool(m.group(1)),
            )
            return empty()
        if m := _ALTER_ADD_RE.match(sql):
            name, col, typ = m.group(1), m.group(2), m.group(3).lower()
            topic = self.topic(name)
            topic.add_column(Column(col, _SQL_DTYPES.get(typ, typ)))
            self._register(topic.entry)
            return empty()
        if m := _ALTER_DROP_RE.match(sql):
            topic = self.topic(m.group(1))
            topic.drop_column(m.group(2))
            self._register(topic.entry)
            return empty()
        if m := _CREATE_VIEW_RE.match(sql):
            self.create_view(m.group(2), m.group(3).strip(), replace=bool(m.group(1)))
            return empty()
        if m := _DROP_RE.match(sql):
            try:
                self.drop_table(m.group(3))
            except ValueError:
                if not m.group(2):  # no IF EXISTS → propagate
                    raise
            return empty()
        if m := _CREATE_SCHEMA_RE.match(sql):
            self.create_schema(m.group(3), if_not_exists=bool(m.group(2)))
            return empty()
        if m := _CREATE_CATALOG_RE.match(sql):
            self.create_catalog(m.group(2), if_not_exists=bool(m.group(1)))
            return empty()
        if m := _DROP_SCHEMA_RE.match(sql):
            self.drop_schema(
                m.group(2), cascade=bool(m.group(3)), if_exists=bool(m.group(1))
            )
            return empty()
        if m := _DROP_CATALOG_RE.match(sql):
            self.drop_catalog(
                m.group(2), cascade=bool(m.group(3)), if_exists=bool(m.group(1))
            )
            return empty()
        if _SHOW_SCHEMAS_RE.match(sql):
            return Lazy(
                self.spark.createDataFrame(
                    sorted(self.store.schemas), "catalog string, schema string"
                ),
                engine=self,
                sql=sql,
            )
        if _SHOW_CATALOGS_RE.match(sql):
            return Lazy(
                self.spark.createDataFrame(
                    [(c,) for c in sorted(self.store.catalogs)], "catalog string"
                ),
                engine=self,
                sql=sql,
            )
        if _SHOW_TABLES_RE.match(sql):
            rows = [
                (e.catalog, e.schema, e.name, e.kind)
                for e in sorted(self.store.tables.values(), key=lambda e: e.ident)
            ]
            return Lazy(
                self.spark.createDataFrame(
                    rows, "catalog string, schema string, name string, kind string"
                ),
                engine=self,
                sql=sql,
            )
        if m := _VACUUM_RE.match(sql):
            from ella_spark.maintenance import (
                Maintainer,
                build_manifest,
                compact_topic,
            )

            if m.group(1):
                t = self.topic(m.group(1))
                out = compact_topic(t)
                n = build_manifest(t)
                report = {
                    "compacted": [str(out)] if out is not None else [],
                    "manifest_entries": n,
                }
            else:
                report = Maintainer(self).run_once(refresh_views=False)
                report.pop("refreshed", None)
            import json as _json

            return Lazy(
                self.spark.createDataFrame(
                    [(_json.dumps(report),)], "report string"
                ),
                engine=self,
                sql=sql,
            )
        if m := _ANALYZE_RE.match(sql):
            from ella_spark.maintenance import build_manifest

            t = self.topic(m.group(1))
            if m.group(2):
                cols = [c.strip() for c in m.group(2).split(",") if c.strip()]
            else:
                # no explicit columns: declared secondary indexes opt
                # in, matching the Maintainer's auto-bloom rule
                cols = [
                    c for c, _asc in t.entry.indexes if c != TIME_COLUMN
                ] or None
            n = build_manifest(t, bloom_cols=cols)
            return Lazy(
                self.spark.createDataFrame([(n,)], "count long"),
                engine=self,
                sql=sql,
            )
        if m := _SHOW_CREATE_RE.match(sql):
            entry = self.store.resolve(m.group(1))
            if entry is None:
                raise ValueError(f"unknown table {m.group(1)!r}")
            if entry.kind == "topic":
                cols = ", ".join(
                    f"{c.name} {c.dtype}"
                    + (" NOT NULL" if c.required else "")
                    for c in entry.columns
                )
                ddl = f"CREATE TOPIC {entry.name} ({cols})"
            elif entry.kind == "materialized_view":
                ddl = (
                    f"CREATE MATERIALIZED VIEW {entry.name} AS {entry.sql}"
                )
            elif entry.kind == "external":
                spec = entry.refresh_state or {}
                hdr = (
                    " WITH HEADER ROW"
                    if spec.get("format") == "csv" and spec.get("header", True)
                    else ""
                )
                ddl = (
                    f"CREATE EXTERNAL TABLE {entry.name} STORED AS "
                    f"{spec.get('format', 'parquet').upper()}{hdr} "
                    f"LOCATION '{spec.get('path', '')}'"
                )
            else:
                ddl = f"CREATE VIEW {entry.name} AS {entry.sql}"
            return Lazy(
                self.spark.createDataFrame([(ddl,)], "ddl string"),
                engine=self,
                sql=sql,
            )
        if m := _EXPLAIN_RE.match(sql):
            # DataFusion-shaped EXPLAIN output: (plan_type, plan) rows
            # (the reference inherits `EXPLAIN [ANALYZE] <query>` from
            # DataFusion's SessionState). ANALYZE executes the query
            # first so the reported physical plan is the AQE-final one.
            df = self.spark.sql(m.group(2))
            try:
                qe = _jdf_qe(df)
                logical = qe.optimizedPlan().toString()
                physical = qe.executedPlan().toString()
            except Exception:
                # Connect sessions have no _jdf: capture explain text
                import contextlib as _ctx
                import io as _io

                buf = _io.StringIO()
                with _ctx.redirect_stdout(buf):
                    df.explain("extended")
                logical = physical = buf.getvalue()
            rows = [("logical_plan", logical)]
            if m.group(1):
                # DataFusion's ANALYZE annotates the executed plan with
                # runtime metrics ("Plan with Metrics"); surface Spark's
                # per-operator SQLMetrics the same way. The plan must be
                # executed through THIS QueryExecution instance —
                # df.count() builds a different plan whose run leaves
                # these metrics zero — so drive qe.toRdd().count(): a
                # distributed row count, nothing collected to the
                # driver beyond the scalar.
                try:
                    qe = _jdf_qe(df)
                    n = qe.toRdd().count()
                    rows.append(("row_count", str(n)))
                    rows.append(
                        ("plan_with_metrics", _plan_with_metrics(qe.executedPlan()))
                    )
                    # Re-capture AFTER execution: under AQE the
                    # pre-run executedPlan stringifies with
                    # isFinalPlan=false; only the post-run walk shows
                    # the plan that actually executed.
                    physical = qe.executedPlan().toString()
                except Exception:
                    # Connect: metrics not driver-inspectable
                    rows.append(("row_count", str(df.count())))
            rows.append(("physical_plan", physical))
            return Lazy(
                self.spark.createDataFrame(rows, "plan_type string, plan string"),
                engine=self,
                sql=sql,
            )
        if m := _DESCRIBE_RE.match(sql):
            entry = self._require(m.group(1), None)
            if entry.kind == "topic":
                rows = [
                    (
                        c.name,
                        c.dtype
                        + (str(list(c.row_shape)) if c.row_shape is not None else ""),
                        not c.required,
                    )
                    for c in entry.columns
                ]
            elif entry.kind == "external":
                rows = [
                    (f.name, f.dataType.simpleString(), f.nullable)
                    for f in self._external_frame(entry).schema.fields
                ]
            else:  # view: describe the resolved plan's schema
                rows = [
                    (f.name, f.dataType.simpleString(), f.nullable)
                    for f in self.spark.sql(entry.sql).schema.fields
                ]
            return Lazy(
                self.spark.createDataFrame(
                    rows, "col_name string, data_type string, nullable boolean"
                ),
                engine=self,
                sql=sql,
            )
        return None

    def read(self, name: str) -> DataFrame:
        return self._frame_for(self._require(name, None))

    def subscribe(self, name: str) -> DataFrame:
        """Streaming scan of a topic (Subscriber parity,
        channel.rs:250-331): returns an unbounded streaming DataFrame."""
        return self.topic(name).read_stream(self.spark)

    def scan(self, name: str, mode: str = "auto", **kw):
        """Unified history+live topic scan (Topic.scan; the reference's
        default `SELECT * FROM topic` behavior, topic.rs:165-203)."""
        return self.topic(name).scan(self.spark, mode=mode, **kw)

    # -- helpers --------------------------------------------------------------

    def _split(self, name: str) -> tuple[str, str, str]:
        parts = name.split(".")
        if len(parts) == 1:
            return (DEFAULT_CATALOG, DEFAULT_SCHEMA, parts[0])
        if len(parts) == 2:
            return (DEFAULT_CATALOG, parts[0], parts[1])
        if len(parts) == 3:
            return tuple(parts)  # type: ignore[return-value]
        raise ValueError(f"invalid table name {name!r}")

    def _require(self, name: str, kind: str | None) -> TableEntry:
        entry = self.store.resolve(name)
        if entry is None:
            raise ValueError(f"table {name!r} does not exist")
        if kind is not None and entry.kind != kind:
            raise ValueError(f"{name!r} is a {entry.kind}, expected {kind}")
        return entry


def _default_session() -> SparkSession:
    from ella_spark.session import get_session

    return get_session("ella")


# Module-level convenience mirroring `ella::open/create`
open = Ella.open  # noqa: A001
create = Ella.create
open_or_create = Ella.open_or_create


class TableRef:
    """Handle for table CRUD, the reference's ``Ella::table`` accessor
    (ella/src/table.rs:75-226): ``get`` / ``exists`` / ``or_create`` /
    ``replace`` / ``drop`` against a (possibly absent) named table."""

    def __init__(self, db: Ella, name: str) -> None:
        self._db, self._name = db, name

    def exists(self) -> bool:
        return self._db.store.tables.get(self._db._split(self._name)) is not None

    def get(self) -> Topic:
        return self._db.topic(self._name)

    def or_create(self, info) -> Topic:
        """Open the topic, creating it from ``info`` if absent
        (table.rs GetOrCreate semantics)."""
        return self._db.create_topic(
            self._name,
            info.columns,
            temporary=info.temporary,
            indexes=info.index,
            if_not_exists=True,
        )

    def replace(self, info) -> Topic:
        """Drop-if-exists then create (table.rs Replace semantics)."""
        return self._db.create_topic(
            self._name,
            info.columns,
            temporary=info.temporary,
            indexes=info.index,
            replace=True,
        )

    def drop(self, if_exists: bool = False) -> None:
        try:
            self._db.drop_table(self._name)
        except ValueError:
            if not if_exists:
                raise


def _table(self: Ella, name: str) -> TableRef:
    """``db.table(name)`` accessor (ella/src/table.rs:75-226)."""
    return TableRef(self, name)


Ella.table = _table


def _create_vector_index(
    self: Ella,
    table: str,
    column: str = "embedding",
    id_col: str = "vec_id",
    n_centroids: int = 16,
    train_sample: int = 4096,
    kind: str = "ivf",
    m_subvectors: int | None = None,
    n_codes: int = 16,
) -> dict:
    """Train and persist a vector index for an embedding column of a
    catalog table.

    ``kind="ivf"``: the artifact is the unit-normalized centroid
    matrix — the production shape where centroids are trained ONCE per
    corpus (bounded driver-side sample, operators/similarity.py) and
    reused by every search.

    ``kind="ivfpq"``: additionally trains per-subspace PQ codebooks
    over the IVF residuals and writes the ENCODED corpus —
    (id, cell, m codes, norm), a few bytes per vector instead of
    dim·4 — as parquet next to the JSON. Searches then scan the
    compact encoded table for ADC candidate scoring and only touch
    full embeddings for the exact re-rank of the refined set. This is
    what keeps the candidate scan in memory at 100 TB corpus scale.

    Persisted as JSON (+ parquet for ivfpq) under the table's data dir
    (``_vector_index/<column>.json`` / ``<column>.pq/``), versioned
    alongside the data it indexes; rebuilding after major corpus drift
    is one call.
    """
    import json

    from ella_spark.operators.similarity import (
        pq_encode,
        train_ivf_centroids,
        train_pq_codebooks,
    )

    if kind not in ("ivf", "ivfpq"):
        raise ValueError(f"unknown vector index kind {kind!r}")
    entry = self.store.tables[self._split(table)]
    df = self._frame_for(entry)
    row = df.select(column).first()
    if row is None or row[0] is None:
        raise ValueError(
            f"cannot build vector index: {table}.{column} is empty or "
            "its first embedding is NULL"
        )
    dim = len(row[0])
    cent = train_ivf_centroids(
        df, dim, vec_col=column, id_col=id_col,
        n_centroids=n_centroids, train_sample=train_sample,
    )
    meta = {
        "column": column,
        "id_col": id_col,
        "dim": dim,
        "n_centroids": int(cent.shape[0]),
        "kind": kind,
        "centroids": [[float(x) for x in row] for row in cent],
    }
    idx_dir = self.store.table_path(entry) / "_vector_index"
    idx_dir.mkdir(parents=True, exist_ok=True)
    if kind == "ivfpq":
        if m_subvectors is None:
            m_subvectors = max(4, dim // 4)
        books = train_pq_codebooks(
            df, dim, cent, vec_col=column, id_col=id_col,
            m_subvectors=m_subvectors, n_codes=n_codes,
            train_sample=train_sample,
        )
        meta["m_subvectors"] = m_subvectors
        meta["n_codes"] = n_codes
        meta["codebooks"] = [
            [[float(x) for x in code] for code in book] for book in books
        ]
        # distributed map-only encode; overwrite = rebuild
        pq_encode(df, cent, books, vec_col=column, id_col=id_col).write.mode(
            "overwrite"
        ).parquet(str(idx_dir / f"{column}.pq"))
    tmp = idx_dir / f".{column}.json.tmp"
    tmp.write_text(json.dumps(meta))
    tmp.replace(idx_dir / f"{column}.json")
    _vix_cache(self).pop((entry.ident, column), None)
    return meta


def _load_vector_index(self: Ella, table: str, column: str) -> dict:
    import json

    entry = self.store.tables[self._split(table)]
    key = (entry.ident, column)
    cache = _vix_cache(self)
    cached = cache.get(key)
    if cached is None:
        path = self.store.table_path(entry) / "_vector_index" / f"{column}.json"
        if not path.exists():
            raise ValueError(
                f"no vector index on {table}.{column}; "
                "call create_vector_index first"
            )
        cached = cache[key] = json.loads(path.read_text())
    return cached


def _vector_search(
    self: Ella,
    table: str,
    queries: DataFrame,
    column: str | None = None,
    k: int = 5,
    n_probe: int = 4,
    refine: int | None = None,
) -> DataFrame:
    """ANN top-k against a table's persisted vector index.

    ``queries``: small DataFrame with the same (id_col, column)
    schema. Loads the artifact (cached per session) and runs the
    distributed search — at scale the corpus side touches
    ~n_probe/n_centroids of its cells. For an ``ivfpq`` index the
    candidate scan reads the persisted ENCODED table (a few bytes per
    vector) and only the exact re-rank of the refined set touches full
    embeddings.
    """
    import numpy as np

    from ella_spark.operators.similarity import ivf_topk, ivfpq_topk

    column = column or "embedding"
    idx = self._load_vector_index(table, column)
    entry = self.store.tables[self._split(table)]
    df = self._frame_for(entry)
    if idx.get("kind") == "ivfpq":
        enc_path = self.store.table_path(entry) / "_vector_index" / f"{column}.pq"
        encoded = self.spark.read.schema(
            "neighbor_id bigint, cell int, codes array<smallint>, norm double"
        ).parquet(str(enc_path))
        return ivfpq_topk(
            df,
            queries,
            dim=idx["dim"],
            vec_col=idx["column"],
            id_col=idx["id_col"],
            k=k,
            n_probe=n_probe,
            m_subvectors=idx["m_subvectors"],
            n_codes=idx["n_codes"],
            # the ADC cut must leave comfortable headroom over k for
            # the exact re-rank to recover quantization misorderings
            refine=refine if refine is not None else max(48, 24 * k),
            centroids=np.asarray(idx["centroids"]),
            codebooks=np.asarray(idx["codebooks"]),
            encoded=encoded,
        )
    return ivf_topk(
        df,
        queries,
        dim=idx["dim"],
        vec_col=idx["column"],
        id_col=idx["id_col"],
        k=k,
        n_probe=n_probe,
        centroids=np.asarray(idx["centroids"]),
    )


def _vix_cache(db: Ella) -> dict:
    """Per-instance index cache (instances may point at different
    roots whose tables share names — never share across dbs)."""
    return db.__dict__.setdefault("_vector_index_cache", {})


def _extend_vector_index(self: Ella, table: str, column: str = "embedding") -> int:
    """Fold vectors added since the last (re)build into an ``ivfpq``
    index's encoded table WITHOUT retraining: rows whose id is absent
    from the encoded parquet are encoded with the existing
    centroids/codebooks and appended (immutable files — readers see
    old-or-new, never partial). Standard online-IVF practice: the
    coarse/fine quantizers stay fixed between full rebuilds; rebuild
    (`create_vector_index`) after major corpus drift. Returns the
    number of vectors appended. No-op (0) for a plain ``ivf`` index,
    whose search encodes nothing."""
    import numpy as np

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    from ella_spark.operators.similarity import pq_encode

    idx = self._load_vector_index(table, column)
    if idx.get("kind") != "ivfpq":
        return 0
    entry = self.store.tables[self._split(table)]
    df = self._frame_for(entry)
    enc_path = self.store.table_path(entry) / "_vector_index" / f"{column}.pq"
    seen = self.spark.read.schema(
        "neighbor_id bigint, cell int, codes array<smallint>, norm double"
    ).parquet(str(enc_path)).select(
        F.col("neighbor_id").alias(idx["id_col"])
    )
    new = df.join(seen, idx["id_col"], "left_anti")
    fresh = pq_encode(
        new,
        np.asarray(idx["centroids"]),
        np.asarray(idx["codebooks"]),
        vec_col=idx["column"],
        id_col=idx["id_col"],
    )
    obs = Observation()
    (
        fresh.observe(obs, F.count(F.lit(1)).alias("n"))
        .write.mode("append")
        .parquet(str(enc_path))
    )
    return int(obs.get["n"])


Ella.create_vector_index = _create_vector_index
Ella._load_vector_index = _load_vector_index
Ella.vector_search = _vector_search
Ella.extend_vector_index = _extend_vector_index
