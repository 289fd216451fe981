"""Manifest Bloom filters: point-lookup shard skipping that min/max
ranges cannot provide (high-cardinality UNCLUSTERED keys), plus the
soundness contract — no false negatives, missing/malformed filters
degrade to reading the shard, results never depend on bloom coverage.
"""

from __future__ import annotations

import pytest

from ella_spark.bloom import bloom_build, bloom_might_contain, coerce_for
from ella_spark.engine import Ella
from ella_spark.types import Column


@pytest.fixture()
def db(spark, tmp_path):
    yield Ella.create(str(tmp_path / "bloomdb"), spark)


# ── pure filter properties ───────────────────────────────────────────


def test_bloom_no_false_negatives_and_fp_band():
    b = bloom_build(range(2000))
    assert all(bloom_might_contain(b, i) for i in range(2000))
    fp = sum(bloom_might_contain(b, i) for i in range(10**7, 10**7 + 5000))
    assert fp / 5000 < 0.05  # target 0.01, generous CI band


def test_bloom_type_tagging_and_coercion():
    # tagged encodings: int 1, float 1.0, "1", True are distinct keys
    b = bloom_build([1])
    assert bloom_might_contain(b, 1)
    # but column-dtype coercion funnels probes to one canonical type
    assert coerce_for("float64", 5) == 5.0 and isinstance(
        coerce_for("float64", 5), float
    )
    assert coerce_for("int64", 5.0) == 5 and isinstance(
        coerce_for("int64", 5.0), int
    )
    assert coerce_for("string", 5) == "5"
    bf = bloom_build([coerce_for("float64", v) for v in [1, 2, 3]])
    assert bloom_might_contain(bf, coerce_for("float64", 2))


def test_bloom_malformed_never_skips():
    assert bloom_might_contain({}, 5)
    assert bloom_might_contain({"m": 64, "k": 1, "h": "zz"}, 5)
    assert bloom_might_contain({"m": 0, "k": 1, "h": ""}, 5)
    assert bloom_might_contain({"m": 128, "k": 2, "h": "00"}, 5)  # short


def test_bloom_nulls_ignored():
    b = bloom_build([None, None, 7])
    assert bloom_might_contain(b, 7)


# ── manifest integration ─────────────────────────────────────────────


def _mk(db, spark, name="pt", n_batches=4, rows=50):
    """n_batches shards in ONE day bucket; k is a high-cardinality id
    INTERLEAVED across shards (k % n_batches == batch), so every
    shard's [min, max] k-range straddles any probe — ranges skip
    nothing, blooms must."""
    t = db.create_topic(name, [Column("k", "int64"), Column("v", "float64")])
    for b in range(n_batches):
        t.insert(
            spark.range(rows)
            .coalesce(1)  # one shard per batch
            .selectExpr(
                f"(id * {n_batches} + {b}) * 1000 AS time",
                f"id * {n_batches} + {b} AS k",
                "CAST(id AS double) AS v",
            )
        )
    return t


def test_bloom_point_lookup_skips_files(db, spark):
    from ella_spark.maintenance import build_manifest

    t = _mk(db, spark)
    assert len(t.shards()) == 4
    build_manifest(t, bloom_cols=["k"])

    # ranges alone: k=42 is inside every shard's [min, max] span
    df_r = t.read(spark, col_ranges={"k": (42, 42)})
    assert len(df_r.inputFiles()) == 4

    # blooms: k=42 lives in exactly one shard (42 % 4 == 2)
    df = t.read(spark, col_eq={"k": 42})
    assert [r.k for r in df.collect()] == [42]
    assert len(df.inputFiles()) <= 2  # 1 true + fp slack (p≈0.01 each)

    # absent key: provably nowhere — still a correct empty result
    df0 = t.read(spark, col_eq={"k": 10**9})
    assert df0.count() == 0


def test_bloom_missing_filter_never_loses_rows(db, spark):
    """Shards published after the bloom build have no filter and must
    always be read; results equal the full-scan filter."""
    from ella_spark.maintenance import build_manifest

    t = _mk(db, spark)
    build_manifest(t, bloom_cols=["k"])
    # fresh shard containing a brand-new key, NOT in any bloom
    t.insert(spark.range(1).selectExpr("999999000 AS time", "777777 AS k", "CAST(1 AS double) AS v"))
    df = t.read(spark, col_eq={"k": 777777})
    assert [r.k for r in df.collect()] == [777777]
    # and an old key still resolves with the fresh shard present
    assert t.read(spark, col_eq={"k": 42}).count() == 1


def test_bloom_upgrade_pass_adds_filters_without_restats(db, spark):
    """A manifest built WITHOUT blooms gains them on the next pass
    (entries keep their stats; only the bloom column read runs)."""
    from ella_spark.maintenance import build_manifest

    t = _mk(db, spark)
    assert build_manifest(t) == 4  # stats only
    assert all(not e.get("b") for e in t.manifest().values())
    assert build_manifest(t, bloom_cols=["k"]) == 0  # no new ENTRIES
    m = t.manifest()
    assert all("k" in e["b"] for e in m.values())
    assert len(t.read(spark, col_eq={"k": 42}).inputFiles()) <= 2


def test_bloom_combines_with_time_bounds(db, spark):
    from ella_spark.maintenance import build_manifest

    t = _mk(db, spark)
    build_manifest(t, bloom_cols=["k"])
    df = t.read(spark, start_ns=0, end_ns=10**9, col_eq={"k": 42})
    assert [r.k for r in df.collect()] == [42]


def test_bloom_float_column_int_probe(db, spark):
    """SQL equality 5 = 5.0: probing a float column with an int must
    hit (coerce_for funnels both to float)."""
    from ella_spark.maintenance import build_manifest

    t = db.create_topic("ft", [Column("x", "float64")])
    t.insert(
        spark.range(20)
        .coalesce(1)
        .selectExpr("id * 1000 AS time", "CAST(id AS double) AS x")
    )
    t.insert(
        spark.range(20)
        .coalesce(1)
        .selectExpr("(id + 100) * 1000 AS time", "CAST(id + 100 AS double) AS x")
    )
    build_manifest(t, bloom_cols=["x"])
    df = t.read(spark, col_eq={"x": 5})
    assert [r.x for r in df.collect()] == [5.0]
    assert len(df.inputFiles()) == 1


def test_bloom_survives_parquet_manifest_format(db, spark, monkeypatch):
    """Past the parquet threshold the manifest round-trips blooms
    through the columnar format too."""
    import ella_spark.maintenance as M

    t = _mk(db, spark)
    monkeypatch.setattr(M, "MANIFEST_PARQUET_THRESHOLD", 1)
    M.build_manifest(t, bloom_cols=["k"])
    assert (t.path / "_manifest" / "stats.parquet").exists()
    m = t.manifest()
    assert all("k" in e["b"] for e in m.values())
    df = t.read(spark, col_eq={"k": 42})
    assert [r.k for r in df.collect()] == [42]
    assert len(df.inputFiles()) <= 2


def test_maintainer_plumbs_bloom_cols(db, spark):
    from ella_spark.maintenance import Maintainer

    t = _mk(db, spark, name="mt")
    Maintainer(db, bloom_cols={"mt": ["k"]}).run_once(refresh_views=False)
    m = t.manifest()
    assert m and all("k" in e.get("b", {}) for e in m.values())


# ── SQL surface: point_lookup TVF ────────────────────────────────────


def test_point_lookup_sql_tvf(db, spark):
    """SELECT * FROM point_lookup('t', 'k', v) routes through
    Topic.read(col_eq=...): the file list excludes bloom-proven-absent
    shards, the residual filter keeps results exact, and the
    surrounding statement stays ordinary SQL."""
    from ella_spark.maintenance import build_manifest

    t = _mk(db, spark, name="pl")
    build_manifest(t, bloom_cols=["k"])
    lz = db.query(
        "SELECT k, v FROM point_lookup('pl', 'k', 42) ORDER BY k"
    )
    rows = lz.df.collect()
    assert [(r.k, float(r.v)) for r in rows] == [(42, 10.0)]
    assert len(lz.df.inputFiles()) <= 2  # 1 true shard + fp slack

    # joins around the TVF work
    n = db.query(
        "SELECT count(*) AS n FROM point_lookup('pl', 'k', 42) a "
        "JOIN point_lookup('pl', 'k', 46) b ON a.v = b.v"
    ).df.collect()[0].n
    assert n == 0  # 42 -> v=10, 46 -> v=11


def test_point_lookup_string_and_errors(db, spark):
    import pytest as _pytest

    from ella_spark.maintenance import build_manifest

    t = db.create_topic("ps", [Column("s", "string")])
    t.insert(
        spark.range(10)
        .coalesce(1)
        .selectExpr("id * 1000 AS time", "concat('u', id) AS s")
    )
    t.insert(
        spark.range(10)
        .coalesce(1)
        .selectExpr("(id+50) * 1000 AS time", "concat('v', id) AS s")
    )
    build_manifest(t, bloom_cols=["s"])
    df = db.query("SELECT s FROM point_lookup('ps', 's', 'v3')").df
    assert [r.s for r in df.collect()] == ["v3"]
    assert len(df.inputFiles()) == 1

    with _pytest.raises(ValueError, match="not a topic"):
        db.query("SELECT * FROM point_lookup('nosuch', 'k', 1)")


def test_bloom_survives_stats_rebuild(db, spark):
    """Shards are immutable, so a stats rebuild (v1-era entry gaining
    column ranges) must carry existing blooms over instead of
    dropping them until the next bloom-enabled pass."""
    import json

    from ella_spark.maintenance import build_manifest

    t = _mk(db, spark, name="sr", n_batches=2)
    build_manifest(t, bloom_cols=["k"])
    m = t.manifest()
    assert all("k" in e["b"] for e in m.values())
    # age one entry back to v1 shape (bare time list, no c/b) — the
    # rebuild path must restore stats AND keep the other entries'
    # blooms; the aged entry re-reads its footer and, because this
    # pass passes no bloom_cols, keeps NO bloom (none existed in v1)
    mpath = t.path / "_manifest" / "stats.json"
    raw = json.loads(mpath.read_text())
    aged = next(k for k in raw if not k.startswith("_"))
    saved_bloom = raw[aged]["b"]
    raw[aged] = {"t": raw[aged]["t"], "b": saved_bloom}  # no "c": v1-ish
    mpath.write_text(json.dumps(raw))
    build_manifest(t)  # stats-only pass
    m2 = t.manifest()
    assert m2[aged]["c"]  # ranges restored
    assert m2[aged]["b"] == saved_bloom  # blooms carried over


def test_point_lookup_view_durable_across_reopen(db, spark, tmp_path):
    """A stored view keeps the durable point_lookup(...) text (never a
    session temp-view name) and re-applies the rewrite at every read —
    including after engine reopen (the ann_search contract)."""
    from ella_spark.engine import Ella
    from ella_spark.maintenance import build_manifest

    t = _mk(db, spark, name="pv")
    build_manifest(t, bloom_cols=["k"])
    db.query(
        "CREATE VIEW pv_view AS "
        "SELECT k, v FROM point_lookup('pv', 'k', 42)"
    )
    assert "point_lookup" in db.store.resolve("pv_view").sql
    assert [r.k for r in db.query("SELECT * FROM pv_view").df.collect()] == [42]

    db.shutdown()
    db2 = Ella.open(db.store.root, spark)
    try:
        rows = db2.query("SELECT * FROM pv_view").df.collect()
        assert [r.k for r in rows] == [42]
    finally:
        db2.shutdown()


def test_declared_index_auto_blooms(db, spark):
    """A topic's DECLARED secondary index columns opt into manifest
    blooms automatically (declaring the index IS the point-lookup
    signal); explicit Maintainer bloom_cols still overrides, and the
    time index never blooms."""
    from ella_spark.maintenance import Maintainer
    from ella_spark.topic import Topic

    t = db.create_topic(
        "ix",
        [Column("k", "int64"), Column("v", "float64")],
        indexes=[("k", False)],
    )
    t.insert(
        spark.range(30).coalesce(1).selectExpr(
            "id*1000 AS time", "id AS k", "CAST(id AS double) AS v"
        )
    )
    Maintainer(db).run_once(refresh_views=False)
    m = Topic(db.store, db.store.resolve("ix")).manifest()
    assert m and all(set(e.get("b", {})) == {"k"} for e in m.values())
    # explicit config overrides the declaration
    t2 = db.create_topic(
        "ix2", [Column("k", "int64")], indexes=[("k", False)]
    )
    t2.insert(spark.range(5).coalesce(1).selectExpr("id*1000 AS time", "id AS k"))
    Maintainer(db, bloom_cols={"ix2": []}).run_once(refresh_views=False)
    m2 = Topic(db.store, db.store.resolve("ix2")).manifest()
    assert m2 and all(not e.get("b") for e in m2.values())


def test_analyze_defaults_to_declared_index_blooms(db, spark):
    from ella_spark.topic import Topic

    t = db.create_topic(
        "ax", [Column("k", "int64")], indexes=[("k", False)]
    )
    t.insert(spark.range(8).coalesce(1).selectExpr("id*1000 AS time", "id AS k"))
    db.query("ANALYZE ax")
    m = Topic(db.store, db.store.resolve("ax")).manifest()
    assert m and all("k" in e.get("b", {}) for e in m.values())


def test_bloom_survives_compaction_soundly(db, spark):
    """Compaction renames shards, so old bloom entries dangle and the
    merged shard has no filter yet: lookups must stay CORRECT (read
    the unbloomed shard), and a re-ANALYZE restores skipping."""
    from ella_spark.maintenance import build_manifest, compact_topic

    t = _mk(db, spark)
    build_manifest(t, bloom_cols=["k"])
    assert t.read(spark, col_eq={"k": 42}).count() == 1

    compact_topic(t)
    # post-compaction: no filter for the merged shard -> read, correct
    df = t.read(spark, col_eq={"k": 42})
    assert [r.k for r in df.collect()] == [42]

    build_manifest(t, bloom_cols=["k"])
    df2 = t.read(spark, col_eq={"k": 42})
    assert [r.k for r in df2.collect()] == [42]
    # absent key proves skippable again after the rebuild
    assert t.read(spark, col_eq={"k": 10**9}).count() == 0
