"""Embedding-space clustering + semantic dedup for corpus curation.

Beyond-reference LLM-data-pipeline operators (the reference engine has
no vector operators at all; cf. its client-side-only tensor math,
/root/reference/ella-tensor/src/ops/binary_arith.rs):

- ``kmeans_assign``: spherical k-means cluster assignment over an
  embedding column. Centroids are trained driver-side on a bounded
  deterministic sample (the standard IVF recipe, shared with
  operators/similarity.train_ivf_centroids); assignment is a map-only
  Arrow-batched matmul with the centroid matrix shipped in the UDF
  closure. Nothing unbounded ever reaches the driver, and the
  assignment stage is embarrassingly parallel at any corpus size.

- ``semantic_dedup``: SemDeDup-style semantic deduplication (Abbas et
  al., "SemDeDup: Data-efficient learning at web-scale through
  semantic deduplication", 2023): cluster the embedding space, then
  find near-duplicate pairs ONLY within each cluster (cosine >=
  threshold), and keep one canonical document per duplicate group via
  connected components. The cluster bucketing is what makes this
  scale: candidate generation is an equi-join on (cluster), never the
  O(n²) corpus pair space — the same bounded-candidates discipline as
  the MinHash/LSH text path (operators/dedup.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ella_spark.operators.similarity import as_double, train_ivf_centroids


def _assign_udf(centroids):
    """Arrow-batched UDF: embedding -> struct<cluster:int, sim:double>
    (nearest unit centroid by dot == cosine, and that cosine).

    One (B, dim) @ (dim, C) matmul per Arrow batch; ties break toward
    the smaller cluster id (stable argsort), so assignment is
    deterministic for any input order.
    """
    cent = np.asarray(centroids, dtype=np.float64)

    @F.pandas_udf("struct<cluster: int, sim: double>")
    def _assign(emb: pd.Series) -> pd.DataFrame:
        if not len(emb):
            return pd.DataFrame({"cluster": [], "sim": []})
        X = np.stack([np.asarray(v, dtype=np.float64) for v in emb])
        X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
        D = X @ cent.T
        idx = np.argmax(D, axis=1)  # np.argmax returns the FIRST max: min id
        return pd.DataFrame(
            {"cluster": idx.astype("int32"), "sim": D[np.arange(len(idx)), idx]}
        )

    return _assign


def kmeans_assign(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 16,
    train_sample: int = 4096,
    iters: int = 8,
    centroids=None,
) -> DataFrame:
    """(id, cluster, sim): nearest spherical-k-means centroid per vector.

    ``centroids`` (an (n_clusters x dim) array) may be passed to skip
    training — e.g. reusing centroids across incremental batches.
    """
    if centroids is None:
        centroids = train_ivf_centroids(
            df,
            dim,
            vec_col=vec_col,
            id_col=id_col,
            n_centroids=n_clusters,
            train_sample=train_sample,
            iters=iters,
        )
    assign = _assign_udf(centroids)
    return df.select(
        F.col(id_col).alias("id"), assign(as_double(F.col(vec_col))).alias("_a")
    ).select("id", F.col("_a.cluster").alias("cluster"), F.col("_a.sim").alias("sim"))


def kmeans_cluster_stats(assigned: DataFrame) -> DataFrame:
    """Per-cluster profile of a ``kmeans_assign`` result:
    (cluster, n, mean_sim, min_sim) — the curation dashboard view
    (tight clusters -> high mean cosine to centroid)."""
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("sim"), 6).alias("mean_sim"),
            F.round(F.min("sim"), 6).alias("min_sim"),
        )
        .orderBy("cluster")
    )


def _proj_col(vec_col: str, dim: int) -> F.Column:
    """Deterministic 1-D projection of a unit vector (dot with a
    hash-derived hyperplane — no RNG state, executors and driver
    always agree). The key property for skew splitting: for unit
    vectors, |p_i - p_j| <= ||x_i - x_j||, so near-duplicates have
    near-equal projections and sort adjacently; exact duplicates have
    EQUAL projections and sort consecutively."""
    from ella_spark.operators.similarity import _hyperplane

    plane = F.array(*[F.lit(v) for v in _hyperplane(dim, 1_000_000)])
    return F.aggregate(
        F.zip_with(F.col(vec_col), plane, lambda x, y: x * y),
        F.lit(0.0),
        lambda a, x: a + x,
    )


def _bucketed_big(
    big: DataFrame, dim: int, max_cluster_size: int, overlap: int
) -> DataFrame:
    """Split over-cap clusters into rank-banded sub-buckets of HARD
    size <= max_cluster_size + overlap: rows sort by their 1-D
    projection within the cluster, ranks band into cap-sized buckets,
    and the first ``overlap`` rows of each bucket are ALSO copied into
    the previous bucket, so a contiguous run of near-duplicates that
    straddles a boundary stays linked transitively through the shared
    rows (connected components merges the halves downstream).

    Scale notes: the rank window sorts SLIM (id, cluster, p) rows —
    Spark's sort-based window spills to disk, so a 10^8-row skew
    cluster costs a disk sort of ~24 B/row, never vectors in memory;
    the unit vectors re-attach by an id equi-join afterwards and land
    directly in bounded (cluster, _sb) tasks. Returns
    (id, cluster, _u, _sb) with overlap rows duplicated."""
    from pyspark.sql import Window

    slim = big.select("id", "cluster", _proj_col("_u", dim).alias("_p"))
    rk = (
        F.row_number().over(
            Window.partitionBy("cluster").orderBy("_p", "id")
        )
        - 1
    )
    slim = slim.select("id", "cluster", rk.alias("_rk"))
    base = slim.select(
        "id", (F.col("_rk") / max_cluster_size).cast("long").alias("_sb")
    )
    spill = slim.where(
        ((F.col("_rk") % max_cluster_size) < overlap) & (F.col("_rk") >= max_cluster_size)
    ).select("id", ((F.col("_rk") / max_cluster_size).cast("long") - 1).alias("_sb"))
    buckets = base.unionByName(spill)
    return big.select("id", "cluster", "_u").join(buckets, "id")


def semantic_dedup(
    df: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    cosine_threshold: float = 0.95,
    n_clusters: int = 16,
    train_sample: int = 4096,
    centroids=None,
    max_cluster_size: int | None = 4096,
) -> DataFrame:
    """SemDeDup: (id, cluster, group_id, is_canonical) per vector.

    Pipeline: kmeans_assign -> within-cluster pairwise cosine (equi-
    join on cluster; per-cluster candidate sets, never cross-corpus)
    -> pairs >= ``cosine_threshold`` -> connected components -> keep
    the minimum id of each duplicate group as canonical.

    Scale: the pairwise step is O(sum over clusters of m_c²) where m_c
    is the cluster size — ``n_clusters`` is the first knob (SemDeDup
    uses tens of thousands of clusters at web scale so each m_c is
    thousands). ``max_cluster_size`` is the skew backstop: a cluster
    that still exceeds it (a near-dup-heavy crawl shard collapsing
    into one cell) is rank-banded by a deterministic 1-D projection
    (`_bucketed_big`) into sub-buckets of HARD size <= cap + overlap
    before the pair matmul, so per-task work is bounded at ANY skew.
    Banding is an approximation — only projection-adjacent pairs are
    compared — but near-duplicates have near-equal projections (for
    unit vectors |p_i-p_j| <= ||x_i-x_j||), exact duplicates have
    EQUAL projections and are ALWAYS compared (consecutive ranks,
    boundary runs linked through overlap rows), and connected
    components restores whole groups transitively. Clusters under the
    cap are exact; at oracle test scales the cap never engages, so the
    DuckDB oracle remains bit-faithful. Pass ``max_cluster_size=None``
    to disable. Pair rows carry ids only; vectors move once into the
    join, partitioned by cluster.
    """
    from ella_spark.operators.graph import connected_components

    assigned = kmeans_assign(
        df,
        dim,
        vec_col=vec_col,
        id_col=id_col,
        n_clusters=n_clusters,
        train_sample=train_sample,
        centroids=centroids,
    ).localCheckpoint(eager=False)

    vecs = df.select(
        F.col(id_col).alias("id"), as_double(F.col(vec_col)).alias("_v")
    )
    nrm = F.sqrt(F.aggregate("_v", F.lit(0.0), lambda a, x: a + x * x))
    # NULL components on a zero norm (Spark ANSI would throw on the
    # division; DuckDB yields NULL): the vector then scores NaN/NULL
    # against every candidate and drops out of the >= threshold pairs
    # on both engines identically (r14 fuzz)
    unit = assigned.join(vecs, "id").select(
        "id",
        "cluster",
        F.transform(
            "_v", lambda x: F.when(nrm != F.lit(0.0), x / nrm)
        ).alias("_u"),
    )

    # Per-cluster pairwise cosines as ONE Arrow matmul per cluster
    # (applyInPandas): each cluster's unit matrix U gives all pair
    # sims as U @ U.T. This is both the local speedup (the JVM
    # zip_with/aggregate expression form is interpreted per pair —
    # measured ~3x slower at 125k pairs x 64 dims) and the scale
    # shape: SemDeDup bounds cluster sizes via n_clusters, so a
    # cluster always fits one worker's memory, and only (id, id, sim)
    # survivors leave the task.
    import numpy as np
    import pandas as pd

    thr = float(cosine_threshold)

    _empty = pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})

    def _cluster_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return _empty
        ids = pdf["id"].to_numpy()
        U = np.stack(pdf["_u"].to_numpy())
        S = U @ U.T
        iu, ju = np.triu_indices(m, k=1)
        keep = S[iu, ju] >= thr
        if not keep.any():
            return _empty
        ia, ib = ids[iu[keep]], ids[ju[keep]]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        return pd.DataFrame(
            {"id_a": lo, "id_b": hi, "cosine": S[iu, ju][keep]}
        )

    schema = "id_a long, id_b long, cosine double"
    # Decide skew handling DRIVER-side from the per-cluster counts: the
    # size table is <= n_clusters rows (a bounded parameter, same class
    # as the centroid artifact), read off the already-checkpointed
    # assignment — one tiny agg job, no broadcast join in the pair
    # plan. The unskewed common case then keeps the exact single-branch
    # plan; the earlier always-on two-branch union re-executed the
    # whole unit subplan for a provably-empty big branch (~0.4 s of
    # pure plan overhead at sf0.1, and a wasted corpus pass at scale).
    over_cap: list[int] = []
    if max_cluster_size is not None:
        counts = assigned.groupBy("cluster").agg(
            F.count(F.lit(1)).alias("_m")
        ).collect()
        over_cap = [r["cluster"] for r in counts if r["_m"] > max_cluster_size]
    if not over_cap:
        pairs = unit.groupBy("cluster").applyInPandas(_cluster_pairs, schema)
    else:
        # over-cap clusters (a literal id list) are rank-banded into
        # bounded sub-buckets first (approximate under extreme skew —
        # see docstring); everything else runs the exact path.
        small = unit.where(~F.col("cluster").isin(over_cap))
        big = unit.where(F.col("cluster").isin(over_cap))
        overlap = max(8, min(64, max_cluster_size // 4))
        pairs = (
            small.groupBy("cluster").applyInPandas(_cluster_pairs, schema)
            .unionByName(
                _bucketed_big(big, dim, max_cluster_size, overlap)
                .groupBy("cluster", "_sb")
                .applyInPandas(_cluster_pairs, schema)
                # overlap rows can emit the same pair from two buckets
                .dropDuplicates(["id_a", "id_b"])
            )
        )

    comp = connected_components(
        assigned.select("id"), pairs, id_col="id", src="id_a", dst="id_b"
    )
    return (
        assigned.select("id", "cluster")
        .join(comp, "id")
        .select(
            "id",
            "cluster",
            F.col("component").alias("group_id"),
            (F.col("id") == F.col("component")).alias("is_canonical"),
        )
    )
