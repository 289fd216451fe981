"""Array / tensor-column operators.

The reference stores fixed-shape tensors as Arrow FixedSizeList
columns (ella-tensor/src/column.rs:137-155) and ships an ndarray-style
math library (SURVEY.md §2.C). In Spark the same data is an
ArrayType column; elementwise math stays JVM-side via higher-order
functions (transform / aggregate / zip_with) — no Python UDF in the
hot path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ella_spark.queries import register
from ella_spark.sources import load_table


@register(
    "q_array_basics",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER)               AS dim,
           round(CAST(embedding[1] AS DOUBLE), 6)        AS first_elem,
           round(CAST(embedding[len(embedding)] AS DOUBLE), 6) AS last_elem,
           label
    FROM embeddings
    """,
    doc="Array length / element access (tensor column basics: column.rs:103-135).",
)
def q_array_basics(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 6).alias("first_elem"),
        F.round(
            F.element_at("embedding", F.size("embedding")).cast("double"), 6
        ).alias("last_elem"),
        "label",
    )


@register(
    "q_vector_norms",
    oracle="""
    SELECT vec_id, label,
           round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sq_norm,
           round(list_sum(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))), 4)               AS l1_norm,
           round(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6)                    AS max_elem,
           round(list_min(list_transform(embedding, x -> CAST(x AS DOUBLE))), 6)                    AS min_elem
    FROM embeddings
    """,
    doc="Elementwise map + reduce over tensor columns (unary math ops, "
    "SURVEY.md §2.C) — JVM-side via transform/aggregate.",
)
def q_vector_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform("embedding", lambda x: x.cast("double"))
    return e.select(
        "vec_id",
        "label",
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x), 4
        ).alias("sq_norm"),
        F.round(
            F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + F.abs(x)), 4
        ).alias("l1_norm"),
        F.round(F.array_max(dbl), 6).alias("max_elem"),
        F.round(F.array_min(dbl), 6).alias("min_elem"),
    )


@register(
    "q_vector_arith",
    oracle="""
    SELECT vec_id,
           round(CAST(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * 2.0 + 1.0)) AS DOUBLE), 4) AS scaled_sum,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive
    FROM embeddings
    """,
    doc="Tensor scalar broadcast arithmetic + filter (binary arith ops §2.C).",
)
def q_vector_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.round(
            F.aggregate(
                F.transform("embedding", lambda x: x.cast("double") * 2.0 + 1.0),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
            4,
        ).alias("scaled_sum"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
    )


@register(
    "q_label_centroid_dist",
    oracle="""
    SELECT label, CAST(i AS INTEGER) AS dim_idx,
           round(avg(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE)), 6) AS centroid_val
    FROM embeddings, range(1, 5) t(i)
    GROUP BY label, i
    """,
    doc="Per-label centroid of first dims via posexplode (tensor reduce across rows).",
)
def q_label_centroid_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode(F.transform("embedding", lambda x: x.cast("double")))
    ).toDF("label", "pos", "x")
    return (
        ex.where(F.col("pos") < 4)
        .groupBy("label", (F.col("pos") + 1).cast("int").alias("dim_idx"))
        .agg(F.round(F.avg("x"), 6).alias("centroid_val"))
    )


@register(
    "q_embed_quantize",
    oracle="""
    WITH q AS (
      SELECT vec_id,
             list_transform(embedding,
               x -> CAST(floor(CAST(x AS DOUBLE) * 127 + 0.5) AS INTEGER)) AS qv,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
      FROM embeddings)
    SELECT vec_id,
           qv[1] AS q_first,
           CAST(list_max(qv) AS INTEGER) AS q_max,
           round(list_sum(list_transform(list_zip(ve, qv),
                 p -> abs(p[1] - p[2] / 127.0))), 6) AS recon_l1_err
    FROM q
    """,
    doc="int8-style embedding quantization (scale 127, floor(x+0.5) — "
    "identical rounding on both engines) + L1 reconstruction error: "
    "the 4x storage cut that makes a 100 TB embedding corpus scannable.",
)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    ve = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    qv = F.transform(ve, lambda x: F.floor(x * 127 + 0.5).cast("int"))
    err = F.aggregate(
        F.zip_with(ve, qv, lambda v, q: F.abs(v - q / 127.0)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        F.element_at(qv, 1).alias("q_first"),
        F.array_max(qv).cast("int").alias("q_max"),
        F.round(err, 6).alias("recon_l1_err"),
    )
