"""Remote mode: Ella.connect over Spark Connect (SURVEY §2.D remote
transport row — the platform analog of the reference's Flight SQL +
gRPC client, ella-server/src/client.rs:120-146).

The engine matrix below runs only where the Connect client stack
(grpcio, pyspark[connect]) is installed; elsewhere it skips and the
dependency-error contract is what's verified.
"""

from __future__ import annotations

import pytest

from ella_spark.engine import Ella
from ella_spark.types import Column

needs_connect = pytest.mark.skipif(
    not Ella.connect_available(),
    reason="Spark Connect client stack (grpcio / pyspark[connect]) not installed",
)


def test_connect_missing_deps_is_clear_error(tmp_path):
    """Without the Connect client stack, Ella.connect must fail with
    an actionable error naming the extra to install — never a bare
    ImportError from deep inside pyspark."""
    if Ella.connect_available():
        pytest.skip("connect stack installed; error path not reachable")
    with pytest.raises(RuntimeError, match=r"pyspark\[connect\]"):
        Ella.connect(str(tmp_path / "cdb"), "local[2]")


def test_degraded_mode_spf_fails_closed_to_full(tmp_path, spark, monkeypatch):
    """Simulated Connect session (FORCE_PLAN_OPAQUE): the SPF
    incremental-refresh structural guard cannot inspect the analyzed
    plan, so it must fail CLOSED — a full recompute, never a blind
    append — and the MV stays exact. This executes the degraded-mode
    branch for real; the grpc matrix above only runs where the
    Connect stack is installed."""
    from ella_spark import engine as engmod

    db = Ella.create(str(tmp_path / "db"), spark)
    t = db.create_topic("deg_src", [Column("v", "float64")])
    t.insert(
        spark.range(5).selectExpr("id * 1000 AS time", "CAST(id AS double) AS v")
    )
    db.create_materialized_view(
        "deg_mv", "SELECT time, v * 2 AS dv FROM deg_src WHERE v >= 1"
    )
    t.insert(
        spark.range(5, 9).selectExpr("id * 1000 AS time", "CAST(id AS double) AS v")
    )

    full_calls = []
    real_full = engmod.Ella._refresh_full

    def spy_full(self, *a, **k):
        full_calls.append(1)
        return real_full(self, *a, **k)

    monkeypatch.setattr(engmod.Ella, "_refresh_full", spy_full)
    monkeypatch.setattr(engmod, "FORCE_PLAN_OPAQUE", True)
    db.refresh_materialized("deg_mv")
    assert full_calls, "opaque plan must route to full recompute"
    got = sorted(r.dv for r in db.query("SELECT dv FROM deg_mv").df.collect())
    assert got == [2.0 * i for i in range(1, 9)]


def test_degraded_mode_explain_captures_text(tmp_path, spark, monkeypatch):
    """Simulated Connect session: EXPLAIN falls back to capturing
    df.explain('extended') output instead of walking queryExecution,
    and still returns the DataFusion-shaped (plan_type, plan) rows."""
    from ella_spark import engine as engmod

    db = Ella.create(str(tmp_path / "db"), spark)
    t = db.create_topic("deg_ex", [Column("v", "float64")])
    t.insert(
        spark.range(4).selectExpr("id * 1000 AS time", "CAST(id AS double) AS v")
    )
    monkeypatch.setattr(engmod, "FORCE_PLAN_OPAQUE", True)
    rows = db.query("EXPLAIN SELECT v FROM deg_ex WHERE v > 1").df.collect()
    kinds = [r.plan_type for r in rows]
    assert kinds == ["logical_plan", "physical_plan"]
    assert all("Physical Plan" in r.plan for r in rows)  # captured text
    # ANALYZE still executes the query and reports the row count
    rows2 = db.query(
        "EXPLAIN ANALYZE SELECT v FROM deg_ex WHERE v > 1"
    ).df.collect()
    counts = {r.plan_type: r.plan for r in rows2}
    assert counts["row_count"] == "2"


@needs_connect
def test_connect_engine_matrix(tmp_path):
    """The embedded engine matrix over a Connect session: DDL, insert,
    query, materialized view + incremental refresh (which must fall
    back to full recompute where the plan is not inspectable), and
    time travel all travel the Connect protocol unchanged."""
    db = Ella.connect(str(tmp_path / "cdb"), "local[2]")
    try:
        t = db.create_topic("ct", [Column("k", "int64"), Column("v", "float64")])
        t.insert(
            db.spark.range(10).selectExpr(
                "id * 1000 AS time", "id % 2 AS k", "CAST(id AS double) AS v"
            )
        )
        got = db.query("SELECT k, sum(v) AS s FROM ct GROUP BY k ORDER BY k")
        rows = got.df.collect()
        assert [(r.k, r.s) for r in rows] == [(0, 20.0), (1, 25.0)]

        db.create_materialized_view(
            "cmv", "SELECT k, count(*) AS n FROM ct GROUP BY k"
        )
        t.insert(
            db.spark.range(10, 14).selectExpr(
                "id * 1000 AS time", "id % 2 AS k", "CAST(id AS double) AS v"
            )
        )
        db.refresh_materialized("cmv")
        got2 = {r.k: r.n for r in db.query("SELECT * FROM cmv").df.collect()}
        assert got2 == {0: 7, 1: 7}

        out = db.query("SHOW TABLES").df.collect()
        assert {r.name for r in out} >= {"ct", "cmv"}
    finally:
        db.spark.stop()
