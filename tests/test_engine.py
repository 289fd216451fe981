"""Engine-layer tests: topic lifecycle, publisher semantics, views,
catalog durability, compaction — modeled on the reference's examples
(ella-engine/examples/pubsub.rs, pyella/examples/publisher.py) and
FIXTURES.md behaviors."""

from __future__ import annotations

import numpy as np
import pytest

from ella_spark import Column, Ella, Maintainer, compact_topic


@pytest.fixture()
def db(spark, tmp_path):
    return Ella.create(str(tmp_path / "db"), spark)


def test_pubsub_roundtrip(db):
    """pubsub.rs:43-82 analog: publish typed rows, query ordered."""
    topic = db.create_topic(
        "point", [Column("x", "float32", required=True), Column("y", "int64")]
    )
    with topic.publish() as pub:
        pub.write(3_000, 1.5, 10)
        pub.write(1_000, 0.5, 20)
        pub.write(2_000, -0.5, None)
    out = db.query("SELECT time, x, y FROM point ORDER BY time").execute()
    assert list(out["time"]) == [1_000, 2_000, 3_000]
    assert list(out["x"]) == [0.5, -0.5, 1.5]
    assert out["y"].iloc[1] is None or np.isnan(out["y"].iloc[1])


def test_auto_time_now(db):
    """publisher.rs:119-123: omitted time auto-filled with now() ns."""
    import time

    topic = db.create_topic("t_auto", [Column("v", "float64")])
    before = time.time_ns()
    with topic.publish() as pub:
        pub.write(1.0)
    after = time.time_ns()
    out = db.query("SELECT time FROM t_auto").execute()
    assert before <= out["time"].iloc[0] <= after


def test_capacity_flush(db):
    """RowSink flushes at capacity (sink.rs:60-71): shards appear
    without explicit flush."""
    topic = db.create_topic("t_cap", [Column("v", "int32")])
    pub = topic.publish(capacity=10)
    for i in range(25):
        pub.write(i * 1000, i)
    assert len(topic.shards()) == 2  # two full buffers flushed
    pub.close()
    assert len(topic.shards()) == 3
    assert db.query("SELECT count(*) AS n FROM t_cap").execute()["n"].iloc[0] == 25


def test_tensor_column_roundtrip(db):
    """pyella publisher example: fixed-shape tensor rows round-trip
    (column.rs:137-155 encode / 157-178 decode parity)."""
    topic = db.create_topic(
        "tensors", [Column("m", "float32", row_shape=(2, 2)), Column("tag", "string")]
    )
    mat = np.array([[1.0, 2.0], [3.0, 4.0]], dtype=np.float32)
    with topic.publish() as pub:
        pub.write(1_000, mat, "a")
        pub.write(2_000, mat * 2, "b")
    lazy = db.query("SELECT m FROM tensors ORDER BY time")
    col = lazy.col("m")
    assert col.shape == (2, 4)  # flattened row-major
    np.testing.assert_allclose(col[0], [1, 2, 3, 4])
    np.testing.assert_allclose(col[1], [2, 4, 6, 8])
    # shape metadata survives in the catalog
    entry = db.store.resolve("tensors")
    assert next(c for c in entry.columns if c.name == "m").row_shape == (2, 2)


def test_tensor_shape_validation(db):
    topic = db.create_topic("t_shape", [Column("m", "float32", row_shape=(3,))])
    pub = topic.publish()
    with pytest.raises(ValueError, match="shape"):
        pub.write(1_000, np.zeros((2, 2), dtype=np.float32))


def test_required_column_enforced(db):
    topic = db.create_topic("t_req", [Column("v", "int64", required=True)])
    pub = topic.publish()
    with pytest.raises(ValueError, match="required"):
        pub.write(1_000, None)


def test_view_inlining(db):
    """Views re-plan at scan (view.rs:131-166): new data published
    after CREATE VIEW is visible through the view."""
    topic = db.create_topic("ev", [Column("v", "float64")])
    with topic.publish() as pub:
        pub.write(1_000, 1.0)
    db.query("SELECT time, v * 2 AS v2 FROM ev").create_view("ev2")
    assert db.query("SELECT v2 FROM ev2").execute()["v2"].iloc[0] == 2.0
    with topic.publish() as pub:
        pub.write(2_000, 5.0)
    out = db.query("SELECT v2 FROM ev2 ORDER BY v2").execute()
    assert list(out["v2"]) == [2.0, 10.0]


def test_materialized_view_lifecycle(db):
    """Materialized views — declared but todo!()'d in the reference
    (view.rs:36-39); implemented here: versioned parquet snapshot,
    stale until refreshed, atomic version flip, SQL dispatch."""
    topic = db.create_topic("mv_src", [Column("v", "float64")])
    with topic.publish() as pub:
        pub.write(1_000, 2.0)
        pub.write(2_000, 4.0)
    out = db.query(
        "CREATE MATERIALIZED VIEW mv AS SELECT sum(v) AS s FROM mv_src"
    ).execute()
    assert out["count"].iloc[0] == 1
    assert db.query("SELECT s FROM mv").execute()["s"].iloc[0] == 6.0

    # snapshot semantics: new source rows are invisible until refresh
    with topic.publish() as pub:
        pub.write(3_000, 10.0)
    assert db.query("SELECT s FROM mv").execute()["s"].iloc[0] == 6.0
    db.query("REFRESH MATERIALIZED VIEW mv").execute()
    assert db.query("SELECT s FROM mv").execute()["s"].iloc[0] == 16.0
    # only the current snapshot version remains on disk
    entry = db.store.resolve("mv")
    assert entry.version == 2
    vdirs = sorted(p.name for p in db.store.table_path(entry).glob("v=*"))
    assert vdirs == ["v=2"]

    db.query("DROP MATERIALIZED VIEW mv").execute()
    assert not any(t.endswith(".mv") for t in db.tables())
    assert not db.store.table_path(entry).exists()


def test_materialized_view_via_lazy_and_durability(spark, tmp_path):
    """Lazy.create_view(materialize=True) + reopen sees the snapshot."""
    root = str(tmp_path / "mvdb")
    db = Ella.create(root, spark)
    t = db.create_topic("msrc", [Column("v", "int64")])
    with t.publish() as pub:
        pub.write(1_000, 5)
    db.query("SELECT v * 2 AS v2 FROM msrc").create_view("m2", materialize=True)
    assert db.query("SELECT v2 FROM m2").execute()["v2"].iloc[0] == 10
    db.shutdown()
    db2 = Ella.open(root, spark)
    assert db2.query("SELECT v2 FROM m2").execute()["v2"].iloc[0] == 10


def test_ddl_matrix(db):
    """create/drop × if_not_exists/replace (state.rs:156-279)."""
    db.create_topic("d1", [Column("v", "int64")])
    with pytest.raises(ValueError, match="exists"):
        db.create_topic("d1", [Column("v", "int64")])
    db.create_topic("d1", [Column("v", "int64")], if_not_exists=True)  # no-op
    db.create_topic("d1", [Column("w", "float64")], replace=True)
    assert [c.name for c in db.store.resolve("d1").columns] == ["time", "w"]
    db.drop_table("d1")
    with pytest.raises(ValueError, match="does not exist"):
        db.drop_table("d1")
    db.create_schema("aux")
    db.create_topic("aux.t2", [Column("v", "int64")])
    assert "ella.aux.t2" in db.tables()


def test_unsigned_widening(db):
    """SURVEY §1.2: unsigned types widen; original recorded in metadata."""
    topic = db.create_topic(
        "u", [Column("a", "uint8"), Column("b", "uint32"), Column("c", "uint64")]
    )
    with topic.publish() as pub:
        pub.write(1_000, 255, 2**31, 2**63)
    out = db.query("SELECT a, b, c FROM u").execute()
    assert out["a"].iloc[0] == 255
    assert out["b"].iloc[0] == 2**31
    assert int(out["c"].iloc[0]) == 2**63
    entry = db.store.resolve("u")
    assert {c.name: c.dtype for c in entry.columns} == {
        "time": "timestamp", "a": "uint8", "b": "uint32", "c": "uint64"
    }


def test_catalog_durability(spark, tmp_path):
    """Transaction log + snapshot replay (transaction_log.rs:41-70,
    snapshot.rs:28-66): reopen sees tables and data; snapshot squashes."""
    root = str(tmp_path / "db")
    db = Ella.create(root, spark)
    t = db.create_topic("persist", [Column("v", "int64")])
    with t.publish() as pub:
        pub.write(1_000, 42)
    db.query("SELECT v + 1 AS v1 FROM persist").create_view("pv")
    # reopen WITHOUT snapshot: replay from log
    db2 = Ella.open(root, spark)
    assert sorted(db2.tables()) == ["ella.public.persist", "ella.public.pv"]
    assert db2.query("SELECT v1 FROM pv").execute()["v1"].iloc[0] == 43
    db2.shutdown()  # snapshot + truncate log
    assert not list(db2.store.log_dir.glob("*.json"))
    db3 = Ella.open(root, spark)
    assert db3.query("SELECT v FROM persist").execute()["v"].iloc[0] == 42


def test_compaction(db):
    """compact_shards parity: many small shards merge into one,
    preserving rows and time order."""
    topic = db.create_topic("comp", [Column("v", "int64")])
    for i in range(5):
        with topic.publish() as pub:
            pub.write((5 - i) * 1_000, i)  # descending times across shards
    assert len(topic.shards()) == 5
    out = compact_topic(topic, target_rows=1 << 20)
    assert out is not None and len(topic.shards()) == 1
    res = db.query("SELECT time, v FROM comp ORDER BY time").execute()
    assert list(res["v"]) == [4, 3, 2, 1, 0]


def test_maintainer_cleanup(db, tmp_path):
    topic = db.create_topic("m1", [Column("v", "int64")])
    with topic.publish() as pub:
        pub.write(1_000, 1)
    # orphan dir not in catalog
    orphan = db.store.root / "ella" / "public" / "ghost"
    orphan.mkdir(parents=True)
    (orphan / "part-x.parquet").write_bytes(b"junk")
    report = Maintainer(db).run_once()
    assert any("ghost" in p for p in report["cleaned"])
    assert not orphan.exists()


def test_compact_while_publishing(db):
    """A live publisher flushing new shards while compact_topic runs
    must lose no rows and leave no lock file behind."""
    import threading

    topic = db.create_topic("c_live", [Column("v", "int64")])
    n_rows = 2_000
    stop = threading.Event()
    errors: list[BaseException] = []

    def publish():
        try:
            pub = topic.publish(capacity=50)  # flush every 50 rows
            for i in range(n_rows):
                pub.write(i * 1_000, i)
            pub.close()
        except BaseException as e:  # surfaced in the main thread
            errors.append(e)
        finally:
            stop.set()

    t = threading.Thread(target=publish)
    t.start()
    while not stop.is_set():
        compact_topic(topic, target_rows=1 << 20)
    t.join()
    compact_topic(topic, target_rows=1 << 20)  # final pass
    assert not errors, errors
    res = db.query("SELECT count(*) AS n, count(DISTINCT v) AS d FROM c_live").execute()
    assert int(res["n"].iloc[0]) == n_rows
    assert int(res["d"].iloc[0]) == n_rows
    assert not list(topic.path.glob("*/.compact.lock"))


def test_concurrent_compactors_no_duplication(db):
    """Two compactors racing on the same buckets: the per-bucket lock
    makes one win per bucket; rows are never duplicated or lost."""
    import threading

    topic = db.create_topic("c_race", [Column("v", "int64")])
    for i in range(12):
        with topic.publish() as pub:
            pub.write(i * 1_000, i)
    assert len(topic.shards()) == 12

    barrier = threading.Barrier(2)
    errors: list[BaseException] = []

    def compact():
        try:
            barrier.wait()
            for _ in range(3):
                compact_topic(topic, target_rows=1 << 20)
        except BaseException as e:
            errors.append(e)

    threads = [threading.Thread(target=compact) for _ in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors
    res = db.query("SELECT count(*) AS n, count(DISTINCT v) AS d FROM c_race").execute()
    assert int(res["n"].iloc[0]) == 12
    assert int(res["d"].iloc[0]) == 12


def test_bucket_lock_stale_break(db, tmp_path):
    """A lock left by a crashed compactor is broken after stale_sec."""
    import os
    import time as _time

    from ella_spark.maintenance import BucketLock

    bucket = tmp_path / "bucket"
    bucket.mkdir()
    stale = bucket / ".compact.lock"
    stale.write_text("999999")
    old = _time.time() - 3600
    os.utime(stale, (old, old))
    with BucketLock(bucket, stale_sec=300.0) as held:
        assert held
    assert not stale.exists()


def test_insert_distributed(db, spark):
    """INSERT INTO path (topic.rs:205-213): Spark-side write."""
    topic = db.create_topic("ins", [Column("v", "double" if False else "float64")])
    src = spark.range(100).selectExpr("id * 1000 AS time", "CAST(id AS double) AS v")
    n = topic.insert(src)
    assert n == 100
    out = db.query("SELECT count(*) AS n, sum(v) AS s FROM ins").execute()
    assert out["n"].iloc[0] == 100 and out["s"].iloc[0] == sum(range(100))


def test_insert_sql_routing(db):
    """`ella.query('INSERT INTO t ...')` routes to the topic sink and
    returns the row count (state-dispatch parity: the reference wires
    INSERT through the topic's DataSink, topic.rs:205-213)."""
    from ella_spark.types import Column

    db.create_topic("ins_sql", [Column("v", "float64")])
    out = db.query(
        "INSERT INTO ins_sql SELECT id * 1000 AS time, CAST(id AS double) AS v "
        "FROM range(50)"
    ).execute()
    assert out["count"].iloc[0] == 50
    got = db.query("SELECT count(*) AS n FROM ins_sql").execute()
    assert got["n"].iloc[0] == 50
    # VALUES form + omitted time column (auto-filled with now())
    out2 = db.query("INSERT INTO ins_sql VALUES (CAST(7.5 AS DOUBLE))").execute()
    assert out2["count"].iloc[0] == 1
    got2 = db.query(
        "SELECT count(*) AS n, count_if(v = 7.5) AS hits FROM ins_sql"
    ).execute()
    assert got2["n"].iloc[0] == 51 and got2["hits"].iloc[0] == 1


def test_ddl_sql_routing(db):
    """SQL-string DDL dispatches to the catalog (LocalBackend::stream
    parity, lazy/backend.rs:66-161), not to Spark temp state."""
    from ella_spark.types import Column

    db.create_topic("src_t", [Column("v", "float64")])
    db.query("INSERT INTO src_t VALUES (1000, CAST(2.0 AS DOUBLE))").execute()

    db.query("CREATE VIEW doubled AS SELECT time, v * 2 AS v2 FROM src_t").execute()
    assert any(t.endswith("doubled") for t in db.tables())
    out = db.query("SELECT v2 FROM doubled").execute()
    assert list(out["v2"]) == [4.0]

    db.query("CREATE OR REPLACE VIEW doubled AS SELECT v * 3 AS v2 FROM src_t").execute()
    assert list(db.query("SELECT v2 FROM doubled").execute()["v2"]) == [6.0]

    db.query("CREATE SCHEMA IF NOT EXISTS aux").execute()
    db.query("CREATE CATALOG IF NOT EXISTS side").execute()

    db.query("DROP VIEW doubled").execute()
    assert not any(t.endswith("doubled") for t in db.tables())
    db.query("DROP TABLE IF EXISTS nonexistent_t").execute()  # no raise
    import pytest as _pytest

    with _pytest.raises(ValueError):
        db.query("DROP TABLE nonexistent_t").execute()


def test_rollup_refresh_incremental(db):
    """Continuous-aggregate rollup: refresh, append late+new rows,
    refresh again — open bucket re-aggregates, closed buckets stay."""
    from ella_spark.maintenance import refresh_rollup
    from ella_spark.types import Column

    sec = 1_000_000_000
    db.create_topic("metrics", [Column("v", "float64")])
    with db.publish("metrics") as pub:
        for t, v in [(1, 1.0), (2, 3.0), (61, 10.0)]:
            pub.write(t * sec, v)
    n = refresh_rollup(db, "metrics", "metrics_1m", 60 * sec)
    assert n == 2  # buckets [0,60) and [60,120)

    with db.publish("metrics") as pub:
        pub.write(62 * sec, 20.0)   # late row in the open bucket
        pub.write(130 * sec, 5.0)   # new bucket
    n2 = refresh_rollup(db, "metrics", "metrics_1m", 60 * sec)
    assert n2 == 2  # re-aggregated open bucket + the new one

    out = db.query(
        "SELECT time, n, v_sum, v_avg FROM metrics_1m ORDER BY time"
    ).execute()
    assert list(out["time"]) == [0, 60 * sec, 120 * sec]
    assert list(out["n"]) == [2, 2, 1]
    assert list(out["v_sum"]) == [4.0, 30.0, 5.0]


def test_drop_schema_show_describe_sql(db):
    """DROP SCHEMA / SHOW TABLES / DESCRIBE dispatch (LocalBackend
    DropSchema parity, lazy/backend.rs:104-128)."""
    from ella_spark.types import Column

    db.query("CREATE SCHEMA staging").execute()
    db.create_topic("staging.s1", [Column("v", "float64")])

    shown = db.query("SHOW TABLES").execute()
    assert ("ella", "staging", "s1", "topic") in {
        tuple(r) for r in shown.itertuples(index=False)
    }

    desc = db.query("DESCRIBE staging.s1").execute()
    assert list(desc["col_name"]) == ["time", "v"]
    assert list(desc["nullable"]) == [False, True]

    # non-empty without CASCADE → error; with CASCADE → gone incl. data
    with pytest.raises(ValueError, match="CASCADE"):
        db.query("DROP SCHEMA staging").execute()
    data_dir = db.store.table_path(db.store.resolve("staging.s1"))
    db.query("DROP SCHEMA staging CASCADE").execute()
    assert "ella.staging.s1" not in db.tables()
    assert not data_dir.exists()
    db.query("DROP SCHEMA IF EXISTS staging").execute()  # no raise
    with pytest.raises(ValueError, match="does not exist"):
        db.query("DROP SCHEMA staging").execute()


def test_describe_view(db):
    from ella_spark.types import Column

    db.create_topic("dv_src", [Column("v", "float64")])
    db.query("CREATE VIEW dv AS SELECT time, v * 2 AS v2 FROM dv_src").execute()
    desc = db.query("DESCRIBE dv").execute()
    assert list(desc["col_name"]) == ["time", "v2"]
    assert list(desc["data_type"]) == ["bigint", "double"]


def test_coerce_ns_floats_and_numpy_ints():
    """ADVICE r1: floats are epoch SECONDS; numpy ints pass through as ns."""
    import numpy as np

    from ella_spark.topic import _coerce_ns

    assert _coerce_ns(1.5) == 1_500_000_000
    assert _coerce_ns(np.int64(123)) == 123
    assert _coerce_ns(np.uint32(7)) == 7
    with pytest.raises(TypeError):
        _coerce_ns("2024-01-01")


def test_rollup_backfill_distributed(db, spark):
    """Backfill from empty uses the distributed topic sink, never a
    driver collect of all buckets (VERDICT r1 'what's wrong' #3)."""
    from ella_spark.maintenance import refresh_rollup

    sec = 1_000_000_000
    topic = db.create_topic("bf", [Column("v", "float64")])
    src = spark.range(600).selectExpr(
        f"id * {sec} AS time", "CAST(id AS double) AS v"
    )
    topic.insert(src)
    n = refresh_rollup(db, "bf", "bf_1m", 60 * sec)
    assert n == 10  # 600 s of data -> 10 one-minute buckets
    out = db.query("SELECT count(*) AS c, sum(n) AS rows FROM bf_1m").execute()
    assert out["c"].iloc[0] == 10 and out["rows"].iloc[0] == 600


def test_time_bucket_partition_pruning(db, spark):
    """SURVEY §7 Phase 3: shards land in __bucket=<day> dirs and a
    time-range read prunes to one bucket dir via PartitionFilters —
    at 100 TB this skips whole directories, not just parquet footers."""
    from ella_spark.topic import DAY_NS

    topic = db.create_topic("buck", [Column("v", "float64")])
    with topic.publish() as pub:
        for day in range(3):
            pub.write(day * DAY_NS + 1_000, float(day))
            pub.flush()  # one shard per day
    dirs = topic.bucket_dirs()
    assert [d.name for d in dirs] == ["__bucket=0", "__bucket=1", "__bucket=2"]

    pruned = topic.read(spark, start_ns=DAY_NS, end_ns=2 * DAY_NS)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "__bucket" in plan and "PartitionFilters" in plan
    rows = pruned.collect()
    assert [r.v for r in rows] == [1.0]
    # the pruned scan must list exactly one of the three bucket dirs
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and m.group(1).strip()  # non-empty partition filters

    # full scan still sees everything, ordered
    assert [r.v for r in topic.read(spark).orderBy("time").collect()] == [
        0.0, 1.0, 2.0,
    ]


def test_insert_writes_bucket_dirs(db, spark):
    """Distributed INSERT also lands in __bucket dirs (same layout as
    the publisher) and negative times bucket left like Python //."""
    from ella_spark.topic import DAY_NS

    topic = db.create_topic("buck2", [Column("v", "float64")])
    src = spark.createDataFrame(
        [(-1, -1.0), (5, 0.0), (DAY_NS + 5, 1.0)], "time long, v double"
    )
    topic.insert(src)
    names = {d.name for d in topic.bucket_dirs()}
    assert names == {"__bucket=-1", "__bucket=0", "__bucket=1"}
    out = db.query("SELECT time, v FROM buck2 ORDER BY time").execute()
    assert list(out["v"]) == [-1.0, 0.0, 1.0]


def test_insert_empty_source_returns_zero(db, spark):
    """Observation-based count must not hang on a zero-row write."""
    topic = db.create_topic("empty_ins", [Column("v", "float64")])
    src = spark.range(0).selectExpr("id AS time", "CAST(id AS double) AS v")
    assert topic.insert(src) == 0


def test_topic_scan_filter_pushdown(db, spark):
    """Time filters reach the parquet scan (PushedFilters) — row-group
    stats prune within a bucket because shards are time-sorted."""
    topic = db.create_topic("pushd", [Column("v", "float64")])
    with topic.publish() as pub:
        for i in range(10):
            pub.write(i * 1_000, float(i))
    import pyspark.sql.functions as F

    df = topic.read(spark).where(F.col("time") > 5_000).select("v")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(time), GreaterThan(time,5000)]" in plan
    # column pruning: the scan reads only what the projection needs
    assert "ReadSchema: struct<time:bigint,v:double>" in plan


def test_insert_shards_time_sorted(db, spark):
    """Distributed-INSERT shards stay time-sorted within each bucket
    (row-group pruning + cheap merge reads depend on it)."""
    import pyarrow.parquet as pq

    from ella_spark.topic import DAY_NS

    topic = db.create_topic("sorted_ins", [Column("v", "double" if False else "float64")])
    # adversarial order: descending times across two day buckets
    src = spark.createDataFrame(
        [((2 * DAY_NS - i * 1_000_000), float(i)) for i in range(1000)],
        "time long, v double",
    ).repartition(4)
    topic.insert(src)
    assert topic.shards(), "no shards written"
    for shard in topic.shards():
        t = pq.read_table(shard, columns=["time"])["time"].to_pylist()
        assert t == sorted(t), f"unsorted shard {shard}"


def test_drop_catalog_and_show_dispatch(db):
    """DROP CATALOG [CASCADE] + SHOW SCHEMAS/CATALOGS SQL dispatch."""
    db.query("CREATE CATALOG side").execute()
    cats = db.query("SHOW CATALOGS").execute()
    assert set(cats["catalog"]) == {"ella", "side"}
    schemas = db.query("SHOW SCHEMAS").execute()
    assert ("ella", "public") in set(
        zip(schemas["catalog"], schemas["schema"])
    )
    db.query("DROP CATALOG side").execute()  # empty → no CASCADE needed
    assert set(db.query("SHOW CATALOGS").execute()["catalog"]) == {"ella"}

    # non-empty requires CASCADE and removes table data
    db.query("CREATE CATALOG full_c").execute()
    db.store.create_schema("s1", catalog="full_c")
    db.create_topic("full_c.s1.t1", [Column("v", "int64")])
    with pytest.raises(ValueError, match="CASCADE"):
        db.query("DROP CATALOG full_c").execute()
    data = db.store.table_path(db.store.resolve("full_c.s1.t1"))
    db.query("DROP CATALOG full_c CASCADE").execute()
    assert not data.exists()
    db.query("DROP CATALOG IF EXISTS full_c").execute()  # no raise


def test_datafusion_sql_compat_functions(db):
    """DataFusion-dialect fns a pyella user's SQL would call: date_bin
    / strpos / to_timestamp_* (SQL UDFs — inline expressions, no
    Python round-trip)."""
    topic = db.create_topic("dfc", [Column("v", "float64")])
    with topic.publish() as pub:
        for t in (100, 350, 620):
            pub.write(t * 1_000_000_000, 1.0)
    out = db.query(
        "SELECT date_bin(300000000000, time, 0) AS b, count(*) AS n "
        "FROM dfc GROUP BY 1 ORDER BY 1"
    ).execute()
    assert list(out["b"]) == [0, 300_000_000_000, 600_000_000_000]
    misc = db.query(
        "SELECT strpos('hello', 'll') AS p, "
        "to_timestamp_seconds(86400) AS ts1, "
        "to_timestamp_millis(86400000) AS ts2, "
        "to_timestamp_micros(86400000000) AS ts3"
    ).execute()
    assert misc["p"].iloc[0] == 3
    assert str(misc["ts1"].iloc[0])[:10] == "1970-01-02"
    assert misc["ts1"].iloc[0] == misc["ts2"].iloc[0] == misc["ts3"].iloc[0]


def test_explain_sql(db):
    """EXPLAIN [ANALYZE] parity: DataFusion-shaped (plan_type, plan)
    rows (the reference inherits EXPLAIN from its SessionState)."""
    db.create_topic("expl_t", [Column("v", "float64")])
    db.query("INSERT INTO expl_t VALUES (1000, CAST(2.0 AS DOUBLE))").execute()

    out = db.query("EXPLAIN SELECT v FROM expl_t WHERE v > 1.0").execute()
    kinds = list(out["plan_type"])
    assert kinds == ["logical_plan", "physical_plan"]
    assert "expl_t" in out["plan"][0] or "Relation" in out["plan"][0]

    out = db.query("EXPLAIN ANALYZE SELECT v FROM expl_t").execute()
    kinds = list(out["plan_type"])
    assert kinds == [
        "logical_plan",
        "row_count",
        "plan_with_metrics",
        "physical_plan",
    ]
    assert out["plan"][kinds.index("row_count")] == "1"
    # DataFusion "Plan with Metrics" analog: per-operator SQLMetrics
    # populated from executing THIS QueryExecution (a numOutputRows of
    # the scan must reflect the actual run, not sit at zero)
    metrics = out["plan"][kinds.index("plan_with_metrics")]
    assert "numOutputRows=1" in metrics, metrics
    # ADVICE r7: ANALYZE must report the AQE-FINAL physical plan
    # (re-captured after execution, not the isFinalPlan=false preview)
    phys = out["plan"][kinds.index("physical_plan")]
    if "AdaptiveSparkPlan" in phys:
        assert "isFinalPlan=true" in phys, phys


def test_information_schema(db):
    """state.rs:115-133 parity: with_information_schema(true) exposes
    ANSI information_schema.tables / .columns over the catalog."""
    db.create_topic(
        "t_info", [Column("x", "float64", required=True), Column("s", "string")]
    )
    db.create_view("v_info", "SELECT x FROM t_info")
    t = db.query(
        "SELECT table_name, table_type FROM information_schema.tables "
        "ORDER BY table_name"
    ).df.collect()
    names = {(r.table_name, r.table_type) for r in t}
    assert ("t_info", "BASE TABLE") in names
    assert ("v_info", "VIEW") in names
    c = db.query(
        "SELECT column_name, ordinal_position, is_nullable, data_type "
        "FROM information_schema.columns WHERE table_name = 't_info' "
        "ORDER BY ordinal_position"
    ).df.collect()
    assert [r.column_name for r in c] == ["time", "x", "s"]
    assert c[0].data_type == "timestamp"  # auto-prepended ns time column
    assert c[1].is_nullable == "NO" and c[2].is_nullable == "YES"


def test_table_accessor_pyella_parity(db):
    """ella/src/table.rs:75-226 + pyella lib.rs module fns: declare a
    schema with topic()/column(), drive CRUD through db.table(name)."""
    import ella_spark as ella

    info = ella.topic(
        [ella.column("x", "float64", required=True), ella.column("tag", "string")],
        index=[("x", True)],
    )
    ref = db.table("acc")
    assert not ref.exists()
    t = ref.or_create(info)
    assert ref.exists()
    assert [c.name for c in t.entry.columns] == ["time", "x", "tag"]
    # or_create on an existing table returns it unchanged
    again = ref.or_create(info)
    assert [c.name for c in again.entry.columns] == ["time", "x", "tag"]
    # replace drops and recreates with the new schema
    t2 = ref.replace(ella.topic([ella.column("y", "int64")]))
    assert [c.name for c in t2.entry.columns] == ["time", "y"]
    # write a row stamped with ella.now() ns and read it back
    ts = ella.now()
    with t2.publish() as pub:
        pub.write(ts, 7)
    assert db.query("SELECT y FROM acc").df.collect()[0].y == 7
    ref.drop()
    assert not ref.exists()
    ref.drop(if_exists=True)  # idempotent with the flag


def test_topic_add_column_schema_evolution(db, spark):
    """Adding a nullable column never rewrites history: old shards
    read as NULL for it, new shards carry values; SQL ALTER works."""
    import pytest as _pt

    t = db.create_topic("evo", [Column("v", "float64")])
    with t.publish() as pub:
        pub.write(1_000, 1.0)
    db.query("ALTER TABLE evo ADD COLUMN tag VARCHAR").execute()
    t = db.topic("evo")
    assert [c.name for c in t.entry.columns] == ["time", "v", "tag"]
    with t.publish() as pub:
        pub.write(2_000, 2.0, "new")
    rows = {r.time: (r.v, r.tag) for r in db.read("evo").collect()}
    assert rows[1_000] == (1.0, None)  # history: NULL, not rewritten
    assert rows[2_000] == (2.0, "new")
    # catalog-logged: survives reopen
    db.shutdown()
    from ella_spark.engine import Ella

    db2 = Ella.open(str(db.store.root), spark)
    assert [c.name for c in db2.store.resolve("evo").columns] == [
        "time", "v", "tag",
    ]
    # guards
    with _pt.raises(ValueError, match="already exists"):
        db2.topic("evo").add_column(Column("tag", "string"))
    with _pt.raises(ValueError, match="nullable"):
        db2.topic("evo").add_column(Column("req", "int64", required=True))


def test_topic_drop_column(db, spark):
    """Dropping a column is a catalog-only change: old shards' bytes
    stay but reads stop selecting them; the time column is protected."""
    import pytest as _pt

    t = db.create_topic(
        "evo2", [Column("v", "float64"), Column("tag", "string")]
    )
    with t.publish() as pub:
        pub.write(1_000, 1.0, "a")
    db.query("ALTER TABLE evo2 DROP COLUMN tag").execute()
    t = db.topic("evo2")
    assert [c.name for c in t.entry.columns] == ["time", "v"]
    rows = db.read("evo2").collect()
    assert not hasattr(rows[0], "tag") and rows[0].v == 1.0
    with t.publish() as pub:
        pub.write(2_000, 2.0)  # new schema: two args
    assert db.read("evo2").count() == 2
    with _pt.raises(ValueError, match="time"):
        t.drop_column("time")
    with _pt.raises(ValueError, match="does not exist"):
        t.drop_column("ghost")


def test_compaction_across_schema_evolution(db, spark):
    """Compaction merges shard generations written before and after
    ADD/DROP COLUMN: the merged shard carries the CURRENT schema
    (null-fill for added, dropped bytes reclaimed)."""
    from ella_spark.maintenance import compact_topic

    t = db.create_topic("evc", [Column("v", "float64"), Column("old", "string")])
    with t.publish() as pub:
        pub.write(1_000, 1.0, "x")
    t.drop_column("old")
    t.add_column(Column("tag", "string"))
    with t.publish() as pub:
        pub.write(2_000, 2.0, "y")
    assert len(t.shards()) == 2
    out = compact_topic(t, min_shards=2)
    assert out is not None and len(t.shards()) == 1
    import pyarrow.parquet as pq_

    merged = pq_.read_table(out)
    assert merged.schema.names == ["time", "v", "tag"]
    db._register(t.entry)
    rows = {r.time: (r.v, r.tag) for r in db.read("evc").collect()}
    assert rows == {1_000: (1.0, None), 2_000: (2.0, "y")}


def test_create_mv_refuses_replacing_non_mv_entry(db):
    """CREATE [OR REPLACE] MATERIALIZED VIEW over an existing TOPIC
    (or plain view) must refuse loudly: put_table(replace=True) would
    silently overwrite the entry and the failure-cleanup branch would
    then drop it entirely — the stash/restore protection only guards
    MV -> MV replaces."""
    topic = db.create_topic("prot", [Column("v", "float64")])
    with topic.publish() as pub:
        pub.write(1_000, 1.0)
        pub.write(2_000, 2.0)
    with pytest.raises(ValueError, match="kind 'topic'"):
        db.create_materialized_view("prot", "SELECT count(*) AS n FROM prot")
    # the topic survives untouched, entry and data both
    assert db.store.resolve("prot").kind == "topic"
    assert db.query("SELECT count(*) AS n FROM prot").execute()["n"].iloc[0] == 2

    db.query("SELECT time, v FROM prot").create_view("protv")
    with pytest.raises(ValueError, match="kind 'view'"):
        db.create_materialized_view("protv", "SELECT count(*) AS n FROM prot")
    assert db.store.resolve("protv").kind == "view"


def test_create_topic_as_select(db, spark):
    """CTAS: schema derives from the SELECT (must carry the epoch-ns
    time column), rows flow through the distributed sink, and the new
    topic is immediately queryable."""
    import pytest as _pytest

    src = db.create_topic("ctas_src", [Column("v", "float64")])
    src.insert(spark.range(10).selectExpr("id * 1000 AS time", "CAST(id AS double) AS v"))
    out = db.query(
        "CREATE TOPIC ctas_dst AS "
        "SELECT time, v * 2 AS dv FROM ctas_src WHERE v >= 5"
    ).df.collect()
    assert out[0]["count"] == 5
    got = db.query("SELECT dv FROM ctas_dst ORDER BY dv").df.collect()
    assert [r.dv for r in got] == [10.0, 12.0, 14.0, 16.0, 18.0]
    # missing time column -> clear error
    with _pytest.raises(ValueError, match="time"):
        db.query("CREATE TOPIC bad_ctas AS SELECT v FROM ctas_src")


def test_copy_to_parquet_and_csv(db, spark, tmp_path):
    t = db.create_topic("cp", [Column("v", "int64")])
    t.insert(spark.range(7).selectExpr("id * 1000 AS time", "id AS v"))
    p1 = str(tmp_path / "out_parquet")
    n = db.query(
        f"COPY (SELECT v FROM cp WHERE v < 5) TO '{p1}'"
    ).df.collect()[0]["count"]
    assert n == 5
    assert spark.read.parquet(p1).count() == 5
    p2 = str(tmp_path / "out_csv")
    n2 = db.query(
        f"COPY (SELECT v FROM cp) TO '{p2}' (FORMAT CSV)"
    ).df.collect()[0]["count"]
    assert n2 == 7


def test_ctas_if_not_exists_noop_on_existing(db, spark):
    """Re-running CREATE TOPIC IF NOT EXISTS ... AS SELECT must be a
    no-op when the topic already exists (Spark/Postgres CTAS
    semantics) — not a silent second append."""
    src = db.create_topic("ctas_ine_src", [Column("v", "float64")])
    src.insert(
        spark.range(4).selectExpr("id * 1000 AS time", "CAST(id AS double) AS v")
    )
    stmt = (
        "CREATE TOPIC IF NOT EXISTS ctas_ine_dst AS "
        "SELECT time, v FROM ctas_ine_src"
    )
    assert db.query(stmt).df.collect()[0]["count"] == 4
    assert db.query(stmt).df.collect()[0]["count"] == 0
    n = db.query("SELECT count(*) AS n FROM ctas_ine_dst").df.collect()[0]["n"]
    assert n == 4
    # ADVICE r7: the no-op only applies to an existing TOPIC — a
    # same-named view is a KIND conflict and must raise, exactly as
    # plain create_topic would
    import pytest as _pytest

    db.query("CREATE VIEW ctas_ine_view AS SELECT 1 AS x")
    with _pytest.raises(ValueError, match="view"):
        db.query(
            "CREATE TOPIC IF NOT EXISTS ctas_ine_view AS "
            "SELECT time, v FROM ctas_ine_src"
        )


def test_ctas_timestamp_time_converts_to_epoch_ns(db, spark):
    """A TIMESTAMP time column in the CTAS SELECT lands as epoch-NS
    longs (not cast-to-seconds, which would bucket rows in 1970)."""
    import pytest as _pytest

    src = db.create_topic("ctas_ts_src", [Column("v", "float64")])
    src.insert(
        spark.range(3).selectExpr("id * 1000 AS time", "CAST(id AS double) AS v")
    )
    db.query(
        "CREATE TOPIC ctas_ts AS SELECT "
        "timestamp'2024-05-01 00:00:00' + make_interval(0,0,0,0,0,0,v) AS time, "
        "v FROM ctas_ts_src"
    )
    times = sorted(
        r.time for r in db.query("SELECT time FROM ctas_ts").df.collect()
    )
    # epoch-ns magnitude (year >= 2020), not epoch-seconds
    assert all(t > 1_600_000_000 * 10**9 for t in times)
    # 1-second source steps survive as exactly 1e9 ns
    assert times[1] - times[0] == 10**9 and times[2] - times[1] == 10**9
    # non-integral, non-timestamp time -> clear error, no topic created
    with _pytest.raises(ValueError, match="epoch-ns or TIMESTAMP"):
        db.query(
            "CREATE TOPIC ctas_bad_time AS "
            "SELECT CAST(time AS double) AS time, v FROM ctas_ts_src"
        )


def test_copy_to_csv_quoted_newline_count(db, spark, tmp_path):
    """COPY TO counts via an Observation on the write job itself; a
    naive CSV re-read would split exported quoted-newline values into
    two records each and miscount."""
    t = db.create_topic("cp_nl", [Column("s", "string")])
    t.insert(
        spark.createDataFrame(
            [(i * 1000, f"first\nsecond-{i}") for i in range(5)],
            "time long, s string",
        )
    )
    p = str(tmp_path / "out_nl_csv")
    n = db.query(
        f"COPY (SELECT s FROM cp_nl) TO '{p}' (FORMAT CSV)"
    ).df.collect()[0]["count"]
    assert n == 5


def test_vacuum_analyze_show_create_sql(db, spark):
    """Housekeeping verbs: VACUUM <topic> compacts + rebuilds the
    manifest; ANALYZE <topic> (cols) builds blooms; SHOW CREATE TABLE
    prints reconstructable DDL for topics and views."""
    import json

    from ella_spark.topic import Topic

    t = db.create_topic("hk", [Column("k", "int64"), Column("v", "float64")])
    for b in range(3):
        t.insert(
            spark.range(10)
            .coalesce(1)
            .selectExpr(f"(id + {b*10}) * 1000 AS time", "id AS k", "CAST(id AS double) AS v")
        )
    rep = json.loads(
        db.query("VACUUM hk").df.collect()[0]["report"]
    )
    assert "manifest_entries" in rep
    n = db.query("ANALYZE hk (k)").df.collect()[0]["count"]
    assert n >= 0
    m = Topic(db.store, db.store.resolve("hk")).manifest()
    assert m and all("k" in e.get("b", {}) for e in m.values())

    [r] = db.query("SHOW CREATE TABLE hk").df.collect()
    assert r.ddl.startswith("CREATE TOPIC hk (time timestamp NOT NULL")
    assert "k int64" in r.ddl
    db.query("CREATE VIEW hk_v AS SELECT k FROM hk")
    [rv] = db.query("SHOW CREATE TABLE hk_v").df.collect()
    assert rv.ddl == "CREATE VIEW hk_v AS SELECT k FROM hk"
    # global VACUUM runs a full maintenance pass
    rep2 = json.loads(db.query("VACUUM").df.collect()[0]["report"])
    assert "errors" in rep2


def test_create_external_table_sql(db, spark, tmp_path):
    """CREATE EXTERNAL TABLE (the reference parses this DataFusion
    verb but todo!()s it — lazy/backend.rs:81-83): files queried in
    place, schema inferred, new files visible on the next query, DROP
    never deletes the external data, and the entry survives reopen."""
    ext = str(tmp_path / "ext_parquet")
    spark.range(10).selectExpr("id", "id * 2 AS y").write.parquet(ext)

    db.query(
        f"CREATE EXTERNAL TABLE extp STORED AS PARQUET LOCATION '{ext}'"
    )
    got = db.query("SELECT sum(y) AS s, count(*) AS n FROM extp").df.collect()[0]
    assert (got.s, got.n) == (90, 10)

    # joins against engine-native topics work like any view
    t = db.create_topic("ext_join_t", [Column("k", "int64")])
    t.insert(spark.range(5).selectExpr("id * 1000 AS time", "id AS k"))
    j = db.query(
        "SELECT count(*) AS n FROM extp JOIN ext_join_t ON extp.id = ext_join_t.k"
    ).df.collect()[0]
    assert j.n == 5

    # listing-table behavior: files added later are picked up
    spark.range(10, 15).selectExpr("id", "id * 2 AS y").write.mode(
        "append"
    ).parquet(ext)
    assert db.query("SELECT count(*) AS n FROM extp").df.collect()[0].n == 15

    # DESCRIBE + SHOW CREATE TABLE round-trip
    desc = {r.col_name: r.data_type for r in db.query("DESCRIBE extp").df.collect()}
    assert desc == {"id": "bigint", "y": "bigint"}
    ddl = db.query("SHOW CREATE TABLE extp").df.collect()[0].ddl
    assert ddl == f"CREATE EXTERNAL TABLE extp STORED AS PARQUET LOCATION '{ext}'"

    # IF NOT EXISTS is a no-op; plain re-create errors
    db.query(f"CREATE EXTERNAL TABLE IF NOT EXISTS extp STORED AS PARQUET LOCATION '{ext}'")
    import pytest as _pytest

    with _pytest.raises(ValueError, match="already exists"):
        db.create_external_table("extp", "parquet", ext)

    # durability: a reopened engine resolves and queries the entry
    from ella_spark.engine import Ella

    db2 = Ella.open(str(db.store.root), spark)
    assert db2.query("SELECT count(*) AS n FROM extp").df.collect()[0].n == 15

    # DROP removes the catalog entry but NEVER the external files
    db.query("DROP TABLE extp")
    assert db.store.resolve("extp") is None
    assert spark.read.parquet(ext).count() == 15


def test_create_external_table_csv_header(db, spark, tmp_path):
    import csv

    d = tmp_path / "ext_csv"
    d.mkdir()
    with open(d / "part.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["name", "score"])
        w.writerows([["a", 1], ["b", 2], ["c", 3]])
    db.query(
        f"CREATE EXTERNAL TABLE extc STORED AS CSV WITH HEADER ROW LOCATION '{d}'"
    )
    rows = db.query(
        "SELECT name, score FROM extc ORDER BY score"
    ).df.collect()
    assert [(r.name, r.score) for r in rows] == [("a", 1), ("b", 2), ("c", 3)]


def test_ctas_from_external_table(db, spark, tmp_path):
    """External-source ingest: CREATE TOPIC ... AS SELECT over an
    external table pulls files into the engine's native shard layout
    in one statement (timestamp time converts to epoch-ns)."""
    ext = str(tmp_path / "ingest_src")
    spark.range(6).selectExpr(
        "timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,0,0,id) AS t",
        "id AS k",
        "CAST(id AS double) * 1.5 AS v",
    ).write.parquet(ext)
    db.query(f"CREATE EXTERNAL TABLE ing_ext STORED AS PARQUET LOCATION '{ext}'")
    n = db.query(
        "CREATE TOPIC ing_topic AS SELECT t AS time, k, v FROM ing_ext"
    ).df.collect()[0]["count"]
    assert n == 6
    got = db.query(
        "SELECT k, v FROM ing_topic ORDER BY k"
    ).df.collect()
    assert [(r.k, r.v) for r in got] == [(i, i * 1.5) for i in range(6)]
    # time landed as epoch-ns (2024 magnitude, 1-second steps)
    ts = sorted(r.time for r in db.query("SELECT time FROM ing_topic").df.collect())
    assert ts[0] > 1_600_000_000 * 10**9 and ts[1] - ts[0] == 10**9


def test_external_table_schema_pinned_at_creation(db, spark, tmp_path):
    """External-table schema is inferred ONCE at registration and
    pinned (DataFusion's fixed-at-creation contract — and csv/json
    inference is a full scan, so per-query re-inference would read
    the location twice every query). A later file that contradicts
    the pinned column type reads as NULL under the pinned schema; it
    must NOT flip the whole column to string via re-inference."""
    import csv

    d = tmp_path / "ext_pin"
    d.mkdir()
    with open(d / "a.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["name", "score"])
        w.writerows([["a", 1], ["b", 2]])
    db.query(
        f"CREATE EXTERNAL TABLE extpin STORED AS CSV WITH HEADER ROW LOCATION '{d}'"
    )
    entry = db.store.resolve("extpin")
    assert entry.refresh_state.get("schema_json"), "schema not pinned"
    with open(d / "b.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["name", "score"])
        w.writerow(["c", "xyz"])
    rows = db.query(
        "SELECT name, score FROM extpin ORDER BY name"
    ).df.collect()
    assert dict(db.query("SELECT * FROM extpin").df.dtypes)["score"] == "int"
    assert [(r.name, r.score) for r in rows] == [
        ("a", 1), ("b", 2), ("c", None)]


def test_ctas_from_ntz_timestamp(db, spark, tmp_path):
    """Raw parquet surfaces TIMESTAMP_NTZ; CTAS must convert it to
    epoch-ns like TIMESTAMP (session tz is pinned UTC) instead of
    rejecting it."""
    ext = str(tmp_path / "ntz_src")
    spark.range(3).selectExpr(
        "CAST(timestamp'2024-03-01 00:00:00' + make_interval(0,0,0,0,0,0,id)"
        " AS timestamp_ntz) AS t",
        "id AS k",
    ).write.parquet(ext)
    db.query(f"CREATE EXTERNAL TABLE ntz_ext STORED AS PARQUET LOCATION '{ext}'")
    assert dict(db.query("SELECT t FROM ntz_ext").df.dtypes)["t"] == "timestamp_ntz"
    n = db.query(
        "CREATE TOPIC ntz_topic AS SELECT t AS time, k FROM ntz_ext"
    ).df.collect()[0]["count"]
    assert n == 3
    ts = sorted(r.time for r in db.query("SELECT time FROM ntz_topic").df.collect())
    assert ts[0] == 1709251200 * 10**9 and ts[1] - ts[0] == 10**9


def test_set_statement(db, spark):
    """DataFusion `SET k = v` / `SET k TO v` (a Statement plan the
    reference unimplemented!()s, backend.rs:163) routes to the Spark
    session conf; static confs surface Spark's own error."""
    import pytest as _pytest

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        db.query("SET spark.sql.shuffle.partitions = 7")
        assert spark.conf.get("spark.sql.shuffle.partitions") == "7"
        db.query("SET spark.sql.shuffle.partitions TO '9'")
        assert spark.conf.get("spark.sql.shuffle.partitions") == "9"
        # ADVICE r7: unwrap exactly ONE matching quote pair — a value
        # that legitimately starts/ends with a quote survives
        db.query("SET spark.ella.test.quoted = '''inner'''")
        assert spark.conf.get("spark.ella.test.quoted") == "''inner''"
        db.query("SET spark.ella.test.mixed = \"don't\"")
        assert spark.conf.get("spark.ella.test.mixed") == "don't"
        with _pytest.raises(Exception, match="(?i)cannot|static"):
            db.query("SET spark.executor.cores = 4")
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_parameterized_query(db, spark):
    """Named (:name) and positional (?) parameter binding through
    engine.query — the Flight SQL prepared-statement analog; DDL
    takes no params and fails loud."""
    import pytest as _pytest

    t = db.create_topic(
        "pq_t", [Column("k", "int64", required=True), Column("v", "float64")]
    )
    with t.publish() as pub:
        for i in range(5):
            pub.write(i + 1, i, float(i) * 2)
    rows = db.query(
        "SELECT k, v FROM pq_t WHERE k >= :lo AND k < :hi ORDER BY k",
        params={"lo": 1, "hi": 4},
    ).df.collect()
    assert [(r.k, r.v) for r in rows] == [(1, 2.0), (2, 4.0), (3, 6.0)]
    rows = db.query(
        "SELECT k FROM pq_t WHERE k = ? OR k = ? ORDER BY k", params=[0, 4]
    ).df.collect()
    assert [r.k for r in rows] == [0, 4]
    n = db.query(
        "INSERT INTO pq_t SELECT 100 AS time, :k AS k, :v AS v",
        params={"k": 99, "v": 1.5},
    ).df.collect()[0]["count"]
    assert n == 1
    assert db.query("SELECT v FROM pq_t WHERE k = 99").df.collect()[0].v == 1.5
    with _pytest.raises(ValueError, match="params"):
        db.query("DROP TABLE pq_t", params={"x": 1})
