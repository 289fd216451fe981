"""Similarity-search query-registry entries.

Brute-force cosine top-k has an exact DuckDB oracle; so do the IVF /
k-means / SemDeDup queries as of round 4: their centroids are a
train-once corpus ARTIFACT (the same shape `Ella.create_vector_index`
persists on disk), computed deterministically from the corpus sample
at registration time and pinned into the oracle SQL as literals — so
DuckDB can replay assignment (argmax dot), within-cluster pairs, and
connected components exactly. LSH is oracle-checked too (its
hyperplanes are deterministic hash-derived literals). Only MinHash /
SimHash (xxhash64 has no DuckDB equivalent) and IVF-PQ (ADC cut is
float-order-sensitive across engines) stay rows-only; tests verify
their recall against brute force.
"""

from __future__ import annotations

import os

import numpy as np
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ella_spark.operators import similarity as S
from ella_spark.queries import register
from ella_spark.sources import load_table

_N_QUERIES = 5
_DIM = 64

# ── train-once centroid artifact ─────────────────────────────────────
# The registry computes corpus centroids straight from the parquet via
# pyarrow (not through a Spark job): the sample recipe is identical to
# operators.similarity.train_ivf_centroids (first `train_sample` rows
# by vec_id, shared numpy Lloyd core), so the result is bit-identical
# to the Spark-sampled path — but it is also available at REGISTRATION
# time, which lets the DuckDB oracle pin the exact same centroids as
# SQL literals. This mirrors production IVF, where centroids are a
# persisted per-corpus artifact reused by every query, never retrained
# per search.

_CENTROIDS: dict = {}


def corpus_centroids(sf_dir: str, n_centroids: int = 16, train_sample: int = 4096):
    key = (os.path.abspath(sf_dir), n_centroids)
    cent = _CENTROIDS.get(key)
    if cent is None:
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        pdf = tbl.to_pandas().sort_values("vec_id").head(train_sample)
        X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
        cent = _CENTROIDS[key] = S.lloyd_spherical(X, n_centroids)
    return cent


#: sf dir whose parquet the DuckDB oracle views read. The driver
#: compares at sf0.01 (the default); tests/conftest.py exports its own
#: choice (sf0.001 locally) before the registry loads, so the pinned
#: centroid literals always match the corpus the oracle runs against.
_ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def _oracle_centroids(n_centroids: int = 16):
    """Centroids for the oracle literals, or None when the oracle
    corpus is absent (oracle falls back to rows-only registration)."""
    try:
        return corpus_centroids(_ORACLE_SF_DIR, n_centroids)
    except (OSError, FileNotFoundError):
        return None


def _cent_cte(cent) -> str:
    """Centroid matrix as a DuckDB VALUES literal: (cluster, cv)."""
    rows = ", ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in row)}])"
        for i, row in enumerate(cent)
    )
    return f"SELECT * FROM (VALUES {rows}) AS t(cluster, cv)"


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, {_DIM + 1}), "
        f"i -> {a}[CAST(i AS INTEGER)] * {b}[CAST(i AS INTEGER)]))"
    )


# Shared oracle fragments: raw doubles, guarded unit vectors, per-
# vector argmax-dot cluster assignment (ties to the smaller cluster
# id — same contract as the numpy stable argmax in _assign_udf).
def _assign_ctes(cent) -> str:
    return f"""
    cent AS ({_cent_cte(cent)}),
    v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
      FROM embeddings),
    u AS (
      SELECT vec_id, list_transform(ve,
               x -> x / greatest(sqrt({_dot_sql('ve', 've')}), 1e-12)) AS ue
      FROM v),
    scored AS (
      SELECT u.vec_id, c.cluster, {_dot_sql('u.ue', 'c.cv')} AS sim
      FROM u CROSS JOIN cent c),
    assigned AS (
      SELECT vec_id, cluster, sim FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY sim DESC, cluster) AS rn
        FROM scored) s
      WHERE rn = 1)"""


@register(
    "q_ann_brute_force",
    oracle=f"""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve,
             sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings),
    q AS (SELECT * FROM v WHERE vec_id < {_N_QUERIES}),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, {_DIM + 1}),
               i -> q.ve[CAST(i AS INTEGER)] * c.ve[CAST(i AS INTEGER)]))
               / (q.nrm * c.nrm) AS cos
      FROM q JOIN v c ON c.vec_id != q.vec_id)
    SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, round(cos, 6) AS cosine
    FROM (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored)
    WHERE rank <= 5
    """,
    doc="Exact cosine top-5 for the first 5 vectors (broadcast queries, "
    "one corpus pass, per-query top-k window).",
)
def q_ann_brute_force(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES)
    return S.brute_force_topk(emb, queries, k=5)


_LSH_PLANES = 4
_LSH_TABLES = 8


def _lsh_oracle() -> str:
    """DuckDB replay of lsh_topk: the hyperplanes are deterministic
    (hash-derived, no RNG state — operators/similarity._hyperplane), so
    the oracle pins all num_tables*num_planes planes as literals,
    recomputes each vector's per-table packed sign signature, joins
    corpus to query buckets on (table, signature), and re-ranks the
    distinct candidate pairs by exact cosine — the same pipeline the
    Spark side runs. Sign bits agree across engines because both
    compute the projection in float64 (a flip needs |dot| within ~1e-13
    of 0; measured corpus dots are O(1))."""
    total = _LSH_TABLES * _LSH_PLANES
    plane_rows = ", ".join(
        f"({p}, [{', '.join(repr(float(x)) for x in S._hyperplane(_DIM, p))}])"
        for p in range(total)
    )
    return f"""
    WITH planes AS (SELECT * FROM (VALUES {plane_rows}) AS t(p, pv)),
    v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve,
             sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings),
    bits AS (
      SELECT v.vec_id, p.p // {_LSH_PLANES} AS tbl,
             p.p % {_LSH_PLANES} AS off,
             CASE WHEN {_dot_sql('v.ve', 'p.pv')} >= 0 THEN 1 ELSE 0 END AS bit
      FROM v CROSS JOIN planes p),
    sigs AS (
      SELECT vec_id, tbl,
             SUM(bit * (1 << ({_LSH_PLANES - 1} - off))) AS sig
      FROM bits GROUP BY vec_id, tbl),
    cand AS (
      SELECT DISTINCT q.vec_id AS query_id, s.vec_id AS neighbor_id
      FROM sigs q
      JOIN sigs s ON s.tbl = q.tbl AND s.sig = q.sig
      WHERE q.vec_id < {_N_QUERIES} AND s.vec_id != q.vec_id),
    rescored AS (
      SELECT cand.query_id, cand.neighbor_id,
             {_dot_sql('qv.ve', 'cv.ve')} / (qv.nrm * cv.nrm) AS cos
      FROM cand
      JOIN v qv ON qv.vec_id = cand.query_id
      JOIN v cv ON cv.vec_id = cand.neighbor_id)
    SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
           round(cos, 6) AS cosine
    FROM (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (
               PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM rescored)
    WHERE rank <= 5
    """


@register(
    "q_ann_lsh",
    oracle=_lsh_oracle(),
    doc="ANN top-k via multi-table random-hyperplane LSH bucket join. "
    "The planes are deterministic hash-derived unit vectors, so the "
    "DuckDB oracle pins them as literals and replays signature packing "
    "+ bucket join + exact re-rank (upgraded from rows-only in r4).",
)
def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES)
    return S.lsh_topk(
        emb, queries, dim=_DIM, k=5,
        num_planes=_LSH_PLANES, num_tables=_LSH_TABLES,
    ).orderBy("query_id", "rank")


def _ivf_oracle() -> str | None:
    cent = _oracle_centroids(16)
    if cent is None:
        return None
    # Cell assignment uses RAW dot (argmax is norm-invariant — the
    # Spark side's _cells_udf also skips normalization); the re-rank
    # is exact cosine, same shape as the brute-force oracle.
    return f"""
    WITH cent AS ({_cent_cte(cent)}),
    v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve,
             sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings),
    cscore AS (
      SELECT v.vec_id, c.cluster, {_dot_sql('v.ve', 'c.cv')} AS d
      FROM v CROSS JOIN cent c),
    corpus_cell AS (
      SELECT vec_id, cluster AS cell FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY d DESC, cluster) AS rn
        FROM cscore) s
      WHERE rn = 1),
    query_cells AS (
      SELECT vec_id AS query_id, cluster AS cell FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY d DESC, cluster) AS rn
        FROM cscore WHERE vec_id < {_N_QUERIES}) s
      WHERE rn <= 6),
    cand AS (
      SELECT q.query_id, cc.vec_id AS neighbor_id
      FROM query_cells q JOIN corpus_cell cc ON cc.cell = q.cell
      WHERE cc.vec_id != q.query_id),
    rescored AS (
      SELECT cand.query_id, cand.neighbor_id,
             {_dot_sql('qv.ve', 'cv.ve')} / (qv.nrm * cv.nrm) AS cos
      FROM cand
      JOIN v qv ON qv.vec_id = cand.query_id
      JOIN v cv ON cv.vec_id = cand.neighbor_id)
    SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
           round(cos, 6) AS cosine
    FROM (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (
               PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM rescored)
    WHERE rank <= 5
    """


@register(
    "q_ann_ivf",
    oracle=_ivf_oracle(),
    doc="ANN top-k via IVF coarse quantization: spherical k-means cells "
    "(train-once corpus artifact, pinned into the DuckDB oracle as "
    "literals), corpus assigned to nearest cell, queries probe n_probe "
    "cells, exact cosine re-rank. At scale the search touches "
    "~n_probe/n_centroids of the corpus.",
)
def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES)
    return S.ivf_topk(
        emb, queries, dim=_DIM, k=5, n_probe=6,
        centroids=corpus_centroids(sf_dir, 16),
    ).orderBy("query_id", "rank")


_CODEBOOKS: dict = {}


def corpus_codebooks(sf_dir: str, n_centroids: int = 16, m: int = 16, n_codes: int = 16):
    """Train-once PQ codebook artifact over the same pyarrow-read
    corpus sample as ``corpus_centroids`` (shared numpy core, so the
    Spark-sampled path would produce bit-identical books)."""
    key = (os.path.abspath(sf_dir), n_centroids, m, n_codes)
    books = _CODEBOOKS.get(key)
    if books is None:
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        pdf = tbl.to_pandas().sort_values("vec_id").head(4096)
        X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
        books = _CODEBOOKS[key] = S.pq_codebooks_from_matrix(
            X, corpus_centroids(sf_dir, n_centroids), m, n_codes
        )
    return books


@register(
    "q_ann_ivfpq",
    oracle=None,  # ADC candidate cut is float-order-sensitive across
    # engines; accuracy + recall are pinned in tests/test_similarity.py
    doc="ANN top-k via IVF-PQ (Jegou et al. 2011): corpus residuals "
    "product-quantized to m=8 codes (train-once codebook artifact), "
    "candidates scored by ADC lookup tables (no embedding ever moves "
    "for scoring), top `refine` per query re-ranked with exact cosine. "
    "~48x smaller candidate scan than raw float32 embeddings — the "
    "memory shape that survives 100 TB corpora.",
)
def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES)
    return S.ivfpq_topk(
        emb, queries, dim=_DIM, k=5, n_probe=6,
        centroids=corpus_centroids(sf_dir, 16),
        codebooks=corpus_codebooks(sf_dir, 16),
        m_subvectors=16, refine=48,
    ).orderBy("query_id", "rank")


# ── portable IVF-PQ: one generated SQL text per engine ───────────────
# q_ann_ivfpq's numpy fast path stays rows-only (the ADC candidate cut
# is float-order-sensitive against an engine that sums in a different
# association order). The portable variant removes the order
# sensitivity at the ROOT: both engines execute STRUCTURALLY IDENTICAL
# SQL — every dot product and ADC sum is an unrolled left-associated
# chain over the same pinned literals, so each intermediate double is
# bit-identical and the refine cut lands on the same candidates. Only
# the dialect shims differ (array() vs [...], 0- vs 1-based indexing,
# collect_list+array_sort vs list(... ORDER BY)).

_PQ_M, _PQ_SUB, _PQ_CODES, _PQ_PROBE, _PQ_REFINE = 16, 4, 16, 6, 48


def _ivfpq_portable_sql(dialect: str, table: str, cent, books) -> str:
    """Generate the IVF-PQ pipeline (cell assign → residual PQ encode →
    probe → LUT ADC score → refine cut → exact re-rank) for ``spark``
    or ``duck``, arithmetic-identical across the two."""
    spark = dialect == "spark"

    def el(arr: str, i) -> str:  # array element, 0-based semantics
        if isinstance(i, int):
            return f"{arr}[{i}]" if spark else f"{arr}[{i + 1}]"
        return f"{arr}[{i}]" if spark else f"{arr}[({i}) + 1]"

    def arrlit(vals) -> str:
        body = ", ".join(repr(float(x)) for x in vals)
        return f"array({body})" if spark else f"[{body}]"

    def values(rows: str, alias: str) -> str:
        return (
            f"SELECT * FROM VALUES {rows} AS {alias}"
            if spark
            else f"SELECT * FROM (VALUES {rows}) AS {alias}"
        )

    xform = "transform" if spark else "list_transform"
    dot = lambda a, b: " + ".join(
        f"{el(a, i)} * {el(b, i)}" for i in range(_DIM)
    )
    cent_rows = ", ".join(f"({c}, {arrlit(row)})" for c, row in enumerate(cent))
    book_rows = ", ".join(
        f"({j}, {c}, "
        + ", ".join(repr(float(x)) for x in books[j][c])
        + ")"
        for j in range(_PQ_M)
        for c in range(_PQ_CODES)
    )
    # residual-to-codeword squared distance and query-LUT value for
    # subspace j (4 unrolled terms each, left-associated)
    dist4 = " + ".join(
        f"({el('s.e', f'b.j*{_PQ_SUB}+{t}')} - "
        f"{el('ct.cv', f'b.j*{_PQ_SUB}+{t}')} - b.b{t}) * "
        f"({el('s.e', f'b.j*{_PQ_SUB}+{t}')} - "
        f"{el('ct.cv', f'b.j*{_PQ_SUB}+{t}')} - b.b{t})"
        for t in range(_PQ_SUB)
    )
    lut4 = " + ".join(
        f"{el('q.e', f'b.j*{_PQ_SUB}+{t}')} * b.b{t}" for t in range(_PQ_SUB)
    )
    adc_sum = "a.cdot + " + " + ".join(
        el("ls", j) for j in range(_PQ_M)
    )
    ocollect = (
        "transform(array_sort(collect_list(struct(cd.j, l.lv))), s -> s.lv)"
        if spark
        else "list(l.lv ORDER BY cd.j)"
    )
    sq_norm = " + ".join(f"{el('e', i)} * {el('e', i)}" for i in range(_DIM))
    bcols = ", ".join(f"b{t}" for t in range(_PQ_SUB))
    return f"""
    WITH cent AS ({values(cent_rows, 't(c, cv)')}),
    books AS ({values(book_rows, f't(j, c, {bcols})')}),
    v AS (
      SELECT vec_id, {xform}(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM {table}),
    vn AS (SELECT vec_id, e, sqrt({sq_norm}) AS nrm FROM v),
    cs AS (
      SELECT vn.vec_id, c.c AS cl, ({dot('vn.e', 'c.cv')}) AS d
      FROM vn CROSS JOIN cent c),
    cellof AS (
      SELECT vec_id, cl AS cell, d AS cdot FROM (
        SELECT cs.*, row_number() OVER (
          PARTITION BY vec_id ORDER BY d DESC, cl) AS rn
        FROM cs) t WHERE rn = 1),
    codes AS (
      SELECT vec_id, j, code FROM (
        SELECT s.vec_id, b.j, b.c AS code,
               row_number() OVER (
                 PARTITION BY s.vec_id, b.j
                 ORDER BY ({dist4}) ASC, b.c) AS rn
        FROM vn s
        JOIN cellof co ON co.vec_id = s.vec_id
        JOIN cent ct ON ct.c = co.cell
        CROSS JOIN books b) t WHERE rn = 1),
    probes AS (
      SELECT vec_id AS query_id, cl AS cell, d AS cdot FROM (
        SELECT cs.*, row_number() OVER (
          PARTITION BY vec_id ORDER BY d DESC, cl) AS rn
        FROM cs WHERE vec_id < {_N_QUERIES}) t WHERE rn <= {_PQ_PROBE}),
    lut AS (
      SELECT q.vec_id AS query_id, b.j, b.c, ({lut4}) AS lv
      FROM vn q CROSS JOIN books b WHERE q.vec_id < {_N_QUERIES}),
    cand AS (
      SELECT p.query_id, co.vec_id AS neighbor_id, p.cdot
      FROM probes p JOIN cellof co ON co.cell = p.cell
      WHERE co.vec_id != p.query_id),
    adcl AS (
      SELECT ca.query_id, ca.neighbor_id, ca.cdot, {ocollect} AS ls
      FROM cand ca
      JOIN codes cd ON cd.vec_id = ca.neighbor_id
      JOIN lut l ON l.query_id = ca.query_id
                AND l.j = cd.j AND l.c = cd.code
      GROUP BY ca.query_id, ca.neighbor_id, ca.cdot),
    ref AS (
      SELECT query_id, neighbor_id FROM (
        SELECT a.query_id, a.neighbor_id,
               row_number() OVER (
                 PARTITION BY a.query_id
                 ORDER BY (({adc_sum}) / nullif(qv.nrm * cn.nrm, 0)) DESC,
                          a.neighbor_id) AS rr
        FROM adcl a
        JOIN vn qv ON qv.vec_id = a.query_id
        JOIN vn cn ON cn.vec_id = a.neighbor_id) t
      WHERE rr <= {_PQ_REFINE}),
    resc AS (
      SELECT r.query_id, r.neighbor_id,
             ({dot('qv.e', 'cv.e')}) / nullif(qv.nrm * cv.nrm, 0) AS cos
      FROM ref r
      JOIN vn qv ON qv.vec_id = r.query_id
      JOIN vn cv ON cv.vec_id = r.neighbor_id)
    SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
           round(cos, 6) AS cosine
    FROM (
      SELECT query_id, neighbor_id, cos,
             row_number() OVER (
               PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM resc) t
    WHERE rank <= 5
    """


def _ivfpq_portable_oracle() -> str | None:
    cent = _oracle_centroids(16)
    if cent is None:
        return None
    books = corpus_codebooks(_ORACLE_SF_DIR, 16)
    return _ivfpq_portable_sql("duck", "embeddings", cent, books)


@register(
    "q_ann_ivfpq_portable",
    oracle=_ivfpq_portable_oracle(),
    doc="IVF-PQ with an EXACT cross-engine oracle: Spark and DuckDB "
    "execute structurally identical generated SQL (unrolled "
    "left-associated dots over pinned centroid + codebook literals), "
    "so every ADC score is bit-identical and the refine cut is "
    "deterministic. The numpy fast path (q_ann_ivfpq) keeps the "
    "Arrow-batched scale shape; this variant is its hard correctness "
    "signal.",
)
def q_ann_ivfpq_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    emb.createOrReplaceTempView("__pq_emb")
    sql = _ivfpq_portable_sql(
        "spark",
        "__pq_emb",
        corpus_centroids(sf_dir, 16),
        corpus_codebooks(sf_dir, 16),
    )
    return spark.sql(sql).orderBy("query_id", "rank")


def _ann_recall_oracle() -> str | None:
    ivf = _ivf_oracle()
    if ivf is None:
        return None
    brute = """
    WITH v AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve,
             sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings),
    q AS (SELECT * FROM v WHERE vec_id < {nq}),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             {dot} / (q.nrm * c.nrm) AS cos
      FROM q JOIN v c ON c.vec_id != q.vec_id)
    SELECT query_id, neighbor_id FROM (
      SELECT query_id, neighbor_id,
             row_number() OVER (
               PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rank
      FROM scored) WHERE rank <= 5
    """.format(nq=_N_QUERIES, dot=_dot_sql("q.ve", "c.ve"))
    return f"""
    WITH approx AS ({ivf}),
    exact AS ({brute})
    SELECT e.query_id,
           CAST(count(*) AS BIGINT) AS n_exact,
           CAST(count(a.neighbor_id) AS BIGINT) AS n_hit,
           round(CAST(count(a.neighbor_id) AS DOUBLE) / count(*), 4)
             AS recall_at_5
    FROM exact e
    LEFT JOIN approx a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """


@register(
    "q_ann_recall",
    oracle=_ann_recall_oracle(),
    doc="ANN index-quality monitoring: recall@5 of the IVF index "
    "against the exact brute-force top-5, per query — the metric an "
    "operator watches to decide when a drifting corpus needs an index "
    "rebuild. Both constituent pipelines are deterministic "
    "(pinned-centroid IVF, exact cosine), so the recall itself is "
    "exact cross-engine; at 100 TB the exact side runs on a "
    "SAMPLED query set, which is precisely this shape.",
)
def q_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < _N_QUERIES)
    approx = S.ivf_topk(
        emb, queries, dim=_DIM, k=5, n_probe=6,
        centroids=corpus_centroids(sf_dir, 16),
    ).select("query_id", "neighbor_id")
    exact = S.brute_force_topk(emb, queries, k=5).select(
        "query_id", F.col("neighbor_id").alias("e_neighbor")
    )
    joined = exact.join(
        approx,
        (exact.query_id == approx.query_id)
        & (exact.e_neighbor == approx.neighbor_id),
        "left",
    ).select(exact.query_id, "e_neighbor", approx.neighbor_id)
    return joined.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_exact"),
        F.count("neighbor_id").cast("bigint").alias("n_hit"),
        F.round(
            F.count("neighbor_id").cast("double") / F.count(F.lit(1)), 4
        ).alias("recall_at_5"),
    )


def _kmeans_oracle() -> str | None:
    cent = _oracle_centroids(16)
    if cent is None:
        return None
    return f"""
    WITH {_assign_ctes(cent)}
    SELECT cluster, COUNT(*) AS n, round(avg(sim), 6) AS mean_sim,
           round(min(sim), 6) AS min_sim
    FROM assigned GROUP BY cluster ORDER BY cluster
    """


@register(
    "q_kmeans_embeddings",
    oracle=_kmeans_oracle(),
    doc="Embedding-space k-means cluster profile: sample-trained "
    "spherical centroids (train-once corpus artifact, pinned into the "
    "DuckDB oracle), map-only distributed assignment (Arrow matmul "
    "UDF), per-cluster size + cohesion stats. The curation primitive "
    "behind topic balancing / SemDeDup bucketing.",
)
def q_kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ella_spark.operators import clustering as C

    emb = load_table(spark, sf_dir, "embeddings")
    assigned = C.kmeans_assign(
        emb, _DIM, n_clusters=16, centroids=corpus_centroids(sf_dir, 16)
    )
    return C.kmeans_cluster_stats(assigned)


def _semantic_dedup_oracle() -> str | None:
    cent = _oracle_centroids(16)
    if cent is None:
        return None
    # Within-cluster pairs on unit vectors, then connected components
    # via the same recursive-CTE pattern as the q_dedup_cluster oracle.
    return f"""
    WITH RECURSIVE {_assign_ctes(cent)},
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM assigned a
      JOIN assigned b ON a.cluster = b.cluster AND b.vec_id > a.vec_id
      JOIN u ua ON ua.vec_id = a.vec_id
      JOIN u ub ON ub.vec_id = b.vec_id
      WHERE {_dot_sql('ua.ue', 'ub.ue')} >= 0.97),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs),
    reach AS (
      SELECT vec_id AS id, vec_id AS known FROM embeddings
      UNION
      SELECT e.dst AS id, r.known FROM reach r JOIN edges e ON e.src = r.id),
    comp AS (SELECT id, min(known) AS group_id FROM reach GROUP BY id)
    SELECT a.vec_id AS id, a.cluster, c.group_id,
           CAST(a.vec_id = c.group_id AS BOOLEAN) AS is_canonical
    FROM assigned a JOIN comp c ON c.id = a.vec_id
    ORDER BY id
    """


@register(
    "q_semantic_dedup",
    oracle=_semantic_dedup_oracle(),
    doc="SemDeDup semantic deduplication (Abbas et al. 2023): k-means "
    "bucketing (train-once centroid artifact, pinned into the DuckDB "
    "oracle) -> within-cluster cosine pairs -> connected components "
    "-> one canonical vector per duplicate group. Candidate pairs are "
    "bounded per cluster, never the O(n^2) corpus pair space.",
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ella_spark.operators import clustering as C

    emb = load_table(spark, sf_dir, "embeddings")
    return C.semantic_dedup(
        emb,
        _DIM,
        cosine_threshold=0.97,
        n_clusters=16,
        centroids=corpus_centroids(sf_dir, 16),
    ).orderBy("id")


# ── PCA projection artifact ──────────────────────────────────────────
# Dimension reduction before clustering/ANN is a standard embedding-
# pipeline stage. Components are a train-once corpus artifact (same
# bounded pyarrow sample as the centroids); numpy SVD is deterministic
# up to sign, which is fixed by forcing each component's largest-
# magnitude coordinate positive — so the oracle can pin mean +
# components as literals and replay the projection exactly.

_PCA: dict = {}
_PCA_K = 8


def corpus_pca(sf_dir: str, k: int = _PCA_K, train_sample: int = 4096):
    """(mean, components[k x dim]) trained once per corpus."""
    key = (os.path.abspath(sf_dir), k)
    got = _PCA.get(key)
    if got is None:
        import pyarrow.parquet as pq

        tbl = pq.read_table(
            os.path.join(sf_dir, "embeddings.parquet"),
            columns=["vec_id", "embedding"],
        )
        pdf = tbl.to_pandas().sort_values("vec_id").head(train_sample)
        X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
        mean = X.mean(axis=0)
        _, _, Vt = np.linalg.svd(X - mean, full_matrices=False)
        W = Vt[:k]
        # deterministic sign: largest-|coord| of each component positive
        for i in range(W.shape[0]):
            j = int(np.argmax(np.abs(W[i])))
            if W[i, j] < 0:
                W[i] = -W[i]
        got = _PCA[key] = (mean, W)
    return got


def _pca_oracle() -> str | None:
    try:
        mean, W = corpus_pca(_ORACLE_SF_DIR)
    except (OSError, FileNotFoundError):
        return None
    mean_lit = "[" + ", ".join(repr(float(x)) for x in mean) + "]"
    comp_rows = ", ".join(
        f"({i}, [{', '.join(repr(float(x)) for x in row)}])"
        for i, row in enumerate(W)
    )
    projs = ",\n           ".join(
        f"round({_dot_sql('c.ve', f'w{i}.cv')}, 6) AS p{i}" for i in range(_PCA_K)
    )
    joins = "\n    ".join(
        f"CROSS JOIN (SELECT cv FROM comp WHERE i = {i}) w{i}"
        for i in range(_PCA_K)
    )
    return f"""
    WITH comp AS (SELECT * FROM (VALUES {comp_rows}) AS t(i, cv)),
    c AS (
      SELECT vec_id,
             list_transform(range(1, {_DIM + 1}),
               j -> CAST(embedding[CAST(j AS INTEGER)] AS DOUBLE)
                    - ({mean_lit})[CAST(j AS INTEGER)]) AS ve
      FROM embeddings)
    SELECT c.vec_id,
           {projs}
    FROM c
    {joins}
    """


@register(
    "q_embed_pca",
    oracle=_pca_oracle(),
    doc="PCA projection of the embedding column to 8 dims (train-once "
    "mean+component artifact from the bounded corpus sample, "
    "deterministic sign convention, pinned into the DuckDB oracle as "
    "literals). Map-only JVM expression projection — the standard "
    "dimension-reduction stage before clustering/ANN; at 100 TB the "
    "projection is a narrow pass, never a shuffle.",
)
def q_embed_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    mean, W = corpus_pca(sf_dir)
    emb = load_table(spark, sf_dir, "embeddings")
    mean_col = F.array(*[F.lit(float(x)) for x in mean])
    centered = F.zip_with(
        S.as_double(F.col("embedding")), mean_col, lambda x, m: x - m
    )
    out = emb.select("vec_id", centered.alias("_c"))
    for i, row in enumerate(W):
        comp = F.array(*[F.lit(float(x)) for x in row])
        out = out.withColumn(
            f"p{i}",
            F.round(
                F.aggregate(
                    F.zip_with("_c", comp, lambda x, w: x * w),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
                6,
            ),
        )
    return out.drop("_c")


# ── corpus-wide kNN join ─────────────────────────────────────────────


def _knn_join_oracle(negatives: bool = False) -> str | None:
    cent = _oracle_centroids(16)
    if cent is None:
        return None
    # Assignment ties -> smaller cluster id (stable argsort contract),
    # exactly like the IVF oracle; then a within-cell self-join and a
    # per-vector top-3 window. Same cosine form as the other oracles.
    # negatives=True adds the label-inequality filter and label output
    # columns (the hard-negative mining variant).
    neg_cond = " AND bv.label <> av.label" if negatives else ""
    neg_cols = ", av.label AS label, bv.label AS neighbor_label" if negatives else ""
    neg_out = ", label, neighbor_label" if negatives else ""
    return f"""
    WITH cent AS ({_cent_cte(cent)}),
    v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve,
             sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings),
    cscore AS (
      SELECT v.vec_id, c.cluster, {_dot_sql('v.ve', 'c.cv')} AS d
      FROM v CROSS JOIN cent c),
    assigned AS (
      SELECT vec_id, cluster AS cell FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id ORDER BY d DESC, cluster) AS rn
        FROM cscore) s
      WHERE rn = 1),
    scored AS (
      SELECT a.vec_id, b.vec_id AS neighbor_id,
             {_dot_sql('av.ve', 'bv.ve')} / (av.nrm * bv.nrm) AS cos{neg_cols}
      FROM assigned a
      JOIN assigned b ON b.cell = a.cell AND b.vec_id != a.vec_id
      JOIN v av ON av.vec_id = a.vec_id
      JOIN v bv ON bv.vec_id = b.vec_id{neg_cond})
    SELECT vec_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
           round(cos, 6) AS cosine{neg_out}
    FROM (
      SELECT vec_id, neighbor_id, cos,
             row_number() OVER (
               PARTITION BY vec_id ORDER BY cos DESC, neighbor_id) AS rank{neg_out}
      FROM scored)
    WHERE rank <= 3
    """


@register(
    "q_knn_join",
    oracle=_knn_join_oracle(),
    doc="Corpus-wide approximate kNN JOIN: every vector's top-3 cosine "
    "neighbors from within its IVF cell (pinned train-once centroids, "
    "so the DuckDB oracle replays assignment + within-cell self-join "
    "exactly). The SemDeDup/kNN-graph candidate generator: one Arrow "
    "matmul assignment pass, ONE cell-keyed shuffle reused for both "
    "self-join sides, quadratic work confined to each cell "
    "(operators/similarity.py knn_join).",
)
def q_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.knn_join(
        emb, dim=_DIM, k=3, centroids=corpus_centroids(sf_dir, 16)
    ).orderBy("vec_id", "rank")


@register(
    "q_hard_negatives",
    oracle=_knn_join_oracle(negatives=True),
    doc="Hard-negative mining for contrastive embedding training: per "
    "anchor, the top-3 most-similar vectors of a DIFFERENT label "
    "(knn_join exclude_match_col) — the negatives that actually move "
    "an InfoNCE/triplet loss. Same IVF-cell blocking and single "
    "cell-keyed shuffle as q_knn_join; the label filter rides the "
    "within-cell pair join, so no extra shuffle. Pinned centroids "
    "make the DuckDB oracle replay assignment + filtered self-join "
    "exactly.",
)
def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.knn_join(
        emb,
        dim=_DIM,
        k=3,
        centroids=corpus_centroids(sf_dir, 16),
        exclude_match_col="label",
    ).orderBy("vec_id", "rank")
