"""k-means assignment + SemDeDup semantic dedup on planted clusters."""

from __future__ import annotations

import numpy as np
import pytest

from ella_spark.operators.clustering import (
    kmeans_assign,
    kmeans_cluster_stats,
    semantic_dedup,
)

DIM = 16


def _blob_df(spark, n_blobs=4, per_blob=30, noise=0.01, dups=None, seed=11):
    """Well-separated unit-vector blobs; optional planted near-dup sets.

    ``dups``: list of (blob_idx, count) — ``count`` extra vectors almost
    identical (cosine > 0.999) to the blob's first member.
    """
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_blobs, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows, blob_of = [], {}
    vid = 0
    firsts = {}
    for bi in range(n_blobs):
        for j in range(per_blob):
            v = centers[bi] + rng.normal(scale=noise, size=DIM)
            v = v / np.linalg.norm(v)
            if j == 0:
                firsts[bi] = v
            rows.append((vid, [float(x) for x in v]))
            blob_of[vid] = bi
            vid += 1
    dup_ids = []
    for bi, count in dups or []:
        base = firsts[bi]
        for _ in range(count):
            v = base + rng.normal(scale=1e-4, size=DIM)
            v = v / np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v]))
            blob_of[vid] = bi
            dup_ids.append(vid)
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    return df, blob_of, dup_ids


def test_kmeans_blobs_coherent(spark):
    df, blob_of, _ = _blob_df(spark)
    out = kmeans_assign(df, DIM, n_clusters=4, train_sample=200).collect()
    cluster_of = {r["id"]: r["cluster"] for r in out}
    # every planted blob lands in exactly one k-means cluster...
    blob_clusters = {}
    for vid, bi in blob_of.items():
        blob_clusters.setdefault(bi, set()).add(cluster_of[vid])
    assert all(len(cs) == 1 for cs in blob_clusters.values())
    # ...and distinct blobs land in distinct clusters
    distinct = {next(iter(cs)) for cs in blob_clusters.values()}
    assert len(distinct) == len(blob_clusters)
    # cosine to own centroid is high for tight blobs
    assert all(r["sim"] > 0.9 for r in out)


def test_kmeans_stats_shape(spark):
    df, _, _ = _blob_df(spark)
    stats = kmeans_cluster_stats(
        kmeans_assign(df, DIM, n_clusters=4, train_sample=200)
    ).collect()
    assert sum(r["n"] for r in stats) == 120
    assert all(0.0 <= r["min_sim"] <= r["mean_sim"] <= 1.0 for r in stats)


def test_kmeans_deterministic(spark):
    df, _, _ = _blob_df(spark)
    a = sorted(kmeans_assign(df, DIM, n_clusters=4).collect())
    b = sorted(kmeans_assign(df, DIM, n_clusters=4).collect())
    assert a == b


def test_semantic_dedup_planted(spark):
    df, blob_of, dup_ids = _blob_df(spark, noise=0.05, dups=[(0, 3), (2, 2)])
    out = semantic_dedup(
        df, DIM, cosine_threshold=0.999, n_clusters=4, train_sample=300
    ).collect()
    by_id = {r["id"]: r for r in out}
    assert len(by_id) == 125  # every vector labelled exactly once
    # planted dups join the group of their blob's first member (id = min)
    first_of_blob0 = min(v for v, b in blob_of.items() if b == 0)
    first_of_blob2 = min(v for v, b in blob_of.items() if b == 2)
    for vid in dup_ids:
        expect_root = first_of_blob0 if blob_of[vid] == 0 else first_of_blob2
        assert by_id[vid]["group_id"] == expect_root
        assert not by_id[vid]["is_canonical"]
    # the group roots are canonical; at noise=0.05 non-dup members stay
    # below the 0.999 threshold, so every other vector is its own group
    n_canonical = sum(1 for r in out if r["is_canonical"])
    assert n_canonical == 120


def test_semantic_dedup_skewed_cluster_bounded(spark):
    """One mega-cluster with >50% of all rows: the skew cap must (a)
    bound every pair-stage task and (b) still group exact duplicates
    (identical vectors always share every hyperplane sign bit)."""
    import pyspark.sql.functions as F

    from ella_spark.operators.clustering import (
        _bucketed_big,
        kmeans_assign,
    )
    from ella_spark.operators.similarity import as_double

    rng = np.random.default_rng(7)
    base = rng.normal(size=DIM)
    base /= np.linalg.norm(base)
    rows = []
    vid = 0
    # mega-blob: 240 exact duplicates of 40 distinct prototypes
    protos = []
    for _ in range(40):
        v = base + rng.normal(scale=0.02, size=DIM)
        v /= np.linalg.norm(v)
        protos.append([float(x) for x in v])
    for rep in range(6):
        for p in protos:
            rows.append((vid, p))
            vid += 1
    # background: 160 spread vectors (4 loose blobs)
    for bi in range(4):
        c = rng.normal(size=DIM)
        c /= np.linalg.norm(c)
        for _ in range(40):
            v = c + rng.normal(scale=0.3, size=DIM)
            v /= np.linalg.norm(v)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cap = 32
    out = semantic_dedup(
        df, DIM, cosine_threshold=0.9999, n_clusters=5,
        train_sample=400, max_cluster_size=cap,
    ).collect()
    assert len(out) == 400
    # every replica group collapses to its prototype's min id
    by_id = {r["id"]: r for r in out}
    for i in range(40):
        members = [i + 40 * rep for rep in range(6)]
        roots = {by_id[m]["group_id"] for m in members}
        assert roots == {i}, f"prototype {i}: roots {roots}"
        assert by_id[i]["is_canonical"]

    # per-task boundedness: no (cluster, sub-bucket) group exceeds the
    # cap by more than the hash-split variance allows. The mega cluster
    # (240 rows, cap 32 -> 3 bits -> 8 sub-buckets) must actually split.
    assigned = kmeans_assign(df, DIM, n_clusters=5, train_sample=400)
    vecs = df.select(
        F.col("vec_id").alias("id"), as_double(F.col("embedding")).alias("_v")
    )
    nrm = F.sqrt(F.aggregate("_v", F.lit(0.0), lambda a, x: a + x * x))
    unit = assigned.join(vecs, "id").select(
        "id", "cluster", F.transform("_v", lambda x: x / nrm).alias("_u")
    )
    overlap = max(8, min(64, cap // 4))
    buckets = (
        _bucketed_big(unit, DIM, cap, overlap)
        .groupBy("cluster", "_sb")
        .count()
        .collect()
    )
    mega = max(r["count"] for r in buckets)
    n_buckets = len({(r["cluster"], r["_sb"]) for r in buckets})
    assert n_buckets > 5, "mega cluster did not sub-bucket"
    # rank banding gives a HARD per-task bound of cap + overlap rows
    assert mega <= cap + overlap, f"unbounded task: {mega} rows in one bucket"
