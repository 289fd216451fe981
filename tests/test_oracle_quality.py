"""Standing oracle-quality guards (VERDICT r7 #3).

Two defect classes the local parity gate structurally cannot catch
(it compares with ``check_dtype=False`` and normalizes ints to Int64):

1. **Oracle type drift** — DuckDB promotes un-cast integer ``sum()``
   to HUGEINT (int128); the driver's *typed* hash then diverges even
   when every value is identical (the round-7 q_pareto_cut failure).
   Guard: ``DESCRIBE`` every oracle (plan-only, no execution) and
   assert no HUGEINT / DECIMAL output column — Spark emits neither
   from these queries, so any occurrence is a missing
   ``CAST(... AS BIGINT)``.

2. **Vacuous parity** — a query that returns 0 rows at the driver's
   gate SF "passes" as ``0 == 0`` without a single value ever being
   hash-exercised (the round-7 q_rolling_zscore failure). Guard: run
   every oracle against the DRIVER gate corpus (sf0.01 — DuckDB-only,
   seconds) and assert >= 1 row. Parity (spark_rows == duck_rows)
   then transfers non-vacuousness to the Spark side.
"""

from __future__ import annotations

import os

import duckdb
import pytest

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# The driver's correctness gate runs at sf0.01 — the non-vacuous
# guard must use that corpus regardless of the suite's SF_ORACLE.
GATE_SF = os.environ.get("SPARK_GRAFT_GATE_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="module")
def gate_duck():
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{GATE_SF}/{t}.parquet')"
        )
    yield con
    con.close()


def _oracles():
    from ella_spark.queries import all_oracles

    return sorted(all_oracles().items())


@pytest.mark.parametrize("name,sql", _oracles(), ids=[n for n, _ in _oracles()])
def test_oracle_types_hashable(name, sql, gate_duck):
    """No HUGEINT/DECIMAL output column: the driver hash is typed, and
    Spark never emits int128 — an un-cast DuckDB integer sum fails the
    hash even when values match bit-for-bit."""
    desc = gate_duck.execute(f"DESCRIBE ({sql})").fetchall()
    bad = {row[0]: row[1] for row in desc if "HUGEINT" in row[1] or "DECIMAL" in row[1]}
    assert not bad, (
        f"{name}: oracle declares driver-hash-hostile column types {bad} — "
        f"wrap integer sums in CAST(... AS BIGINT) (registry convention)"
    )


@pytest.mark.parametrize("name,sql", _oracles(), ids=[n for n, _ in _oracles()])
def test_oracle_nonvacuous_at_gate_sf(name, sql, gate_duck):
    """>= 1 row at the driver gate SF: a 0-row result makes the hash
    check pass vacuously (0 == 0) without exercising any value."""
    n = gate_duck.execute(f"SELECT count(*) FROM ({sql})").fetchone()[0]
    assert n >= 1, (
        f"{name}: oracle returns 0 rows at the driver gate SF ({GATE_SF}) — "
        f"its CORRECTNESS pass would be vacuous; loosen the query's "
        f"selectivity until it produces real rows"
    )
