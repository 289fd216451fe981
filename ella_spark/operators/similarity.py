"""Approximate-nearest-neighbor similarity search over embedding columns.

Beyond the reference's surface: brute-force cosine top-k as the exact
baseline, plus a random-hyperplane LSH-bucketed variant as the scale
path (candidate generation becomes an equi-join on bucket signatures
instead of a full cross join — the only shape that works at 100 TB).
Vector math is JVM-side (zip_with/aggregate in double precision).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def l2_norm(vec: Column) -> Column:
    return F.sqrt(F.aggregate(vec, F.lit(0.0), lambda acc, x: acc + x * x))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, rank per query. The corpus side streams — one pass, no
    shuffle of vectors; only (query_id, id, score) rows shuffle for
    the per-query top-k window.

    Returns (query_id, neighbor_id, rank, cosine).
    """
    corpus = df.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("_cv"),
    ).withColumn("_cn", l2_norm(F.col("_cv")))
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double(F.col(vec_col)).alias("_qv"),
        ).withColumn("_qn", l2_norm(F.col("_qv")))
    )
    scored = corpus.crossJoin(q).where(
        F.col("neighbor_id") != F.col("query_id")
    ).select(
        "query_id",
        "neighbor_id",
        (dot(F.col("_qv"), F.col("_cv")) / (F.col("_qn") * F.col("_cn"))).alias(
            "_cos"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round("_cos", 6).alias("cosine"),
        )
    )


def _hyperplane(dim: int, plane_idx: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane (no RNG state —
    derived from a hash so executors and driver agree)."""
    vals = []
    for j in range(dim):
        # xorshift-style integer scramble → uniform in [-1, 1)
        h = (plane_idx * 2654435761 + j * 40503 + 12345) & 0xFFFFFFFF
        h ^= h >> 13
        h = (h * 1274126177) & 0xFFFFFFFF
        h ^= h >> 16
        vals.append((h / 2**31) - 1.0)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def lsh_bucket_signature(vec: Column, dim: int, num_planes: int = 8) -> Column:
    """Random-hyperplane LSH signature: one bit per plane (sign of the
    projection), packed to a long. Vectors with small angular distance
    collide with high probability."""
    sig = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = _hyperplane(dim, p)
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(v) for v in plane]),
                lambda x, y: x * y,
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig.bitwiseOR(
            F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig


def lsh_topk(
    df: DataFrame,
    queries: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 5,
    num_planes: int = 4,
    num_tables: int = 8,
) -> DataFrame:
    """ANN top-k via multi-table hyperplane LSH.

    Each of ``num_tables`` tables uses a disjoint slice of hyperplanes;
    corpus and queries are bucketed per table and candidates come from
    an equi-join on (table, signature) — at scale this shuffles only
    bucketed ids, never the O(|corpus|·|queries|) pair space. Exact
    cosine re-ranks the candidates.
    """
    def bucketed(src: DataFrame, idc: str) -> DataFrame:
        v = as_double(F.col(vec_col))
        out = src.select(
            F.col(id_col).alias(idc),
            v.alias(f"_{idc}_v"),
        )
        tables = F.array(
            *[
                F.struct(
                    F.lit(t).alias("tbl"),
                    _sig_for_table(F.col(f"_{idc}_v"), dim, t, num_planes).alias(
                        "sig"
                    ),
                )
                for t in range(num_tables)
            ]
        )
        return out.select(
            idc, f"_{idc}_v", F.explode(tables).alias("_b")
        ).select(idc, f"_{idc}_v", "_b.tbl", "_b.sig")

    corpus = bucketed(df, "neighbor_id")
    q = bucketed(queries, "query_id")
    cand = (
        corpus.join(q, ["tbl", "sig"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "_query_id_v", "_neighbor_id_v")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("_query_id_v"), F.col("_neighbor_id_v")).alias("_cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("_cos", 6).alias("cosine"))
    )


def _sig_for_table(vec: Column, dim: int, table_idx: int, num_planes: int) -> Column:
    sig = F.lit(0).cast("long")
    for p in range(num_planes):
        plane = _hyperplane(dim, table_idx * num_planes + p)
        proj = F.aggregate(
            F.zip_with(vec, F.array(*[F.lit(v) for v in plane]), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig.bitwiseOR(
            F.when(proj >= 0, F.shiftleft(F.lit(1).cast("long"), p)).otherwise(
                F.lit(0).cast("long")
            )
        )
    return sig
