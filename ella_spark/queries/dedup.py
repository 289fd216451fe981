"""Dedup query-registry entries (oracle-paired where SQL-expressible).

Exact dedup, windowed n-gram Jaccard, the PORTABLE minhash variant
(md5-derived integer hashing), and — since r13 — the PRODUCTION
xxhash64/splitmix64 MinHash-LSH path all have exact DuckDB oracles
(the production one replays the rolling hash + splitmix64 + seeded
signature in HUGEINT arithmetic; see _minhash_xxhash_oracle). SimHash
remains the one variant without an oracle (its 64-bit xxhash64
fingerprint has no cross-engine replay, and its portable sibling
q_dedup_simhash_portable is hash-checked instead); the driver records
the weaker rows-only check and tests/test_dedup.py verifies it
against planted duplicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ella_spark.operators import dedup as D
from ella_spark.queries import register
from ella_spark.sources import load_table


@register(
    "q_dedup_exact",
    oracle="""
    SELECT md5(lower(trim(text))) AS content_hash,
           min(doc_id)            AS keep_id,
           count(*)               AS n_copies
    FROM documents
    GROUP BY 1
    """,
    doc="Exact dedup: one survivor per normalized-content hash.",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "q_dedup_ngram_jaccard",
    oracle="""
    WITH sh AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
             list_distinct(list_transform(
               range(1, greatest(length(lower(trim(text))) - 2, 0) + 1),
               i -> substr(lower(trim(text)), CAST(i AS INTEGER), 3))) AS grams
      FROM documents
      WHERE length(lower(trim(text))) >= 3
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) > 0
                THEN round(
                  CAST(len(list_filter(a.grams, g -> list_contains(b.grams, g))) AS DOUBLE)
                  / len(list_distinct(list_concat(a.grams, b.grams))), 6)
                ELSE 0.0 END AS jaccard
    FROM sh a JOIN sh b
      ON a.lang IS NOT DISTINCT FROM b.lang AND b.rn > a.rn AND b.rn <= a.rn + 3
    """,
    doc="Exact 3-gram Jaccard over a windowed candidate set (per-lang).",
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    import pyspark.sql.functions as F

    docs = docs.where(F.length(F.lower(F.trim("text"))) >= 3)
    return D.ngram_jaccard_pairs(docs, shingle_k=3, window=3, partition_col="lang")


@register(
    "q_dedup_edit_distance",
    oracle="""
    WITH r AS (
      SELECT doc_id, lang,
             substr(lower(trim(text)), 1, 256) AS t,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(a.t, b.t) AS BIGINT) AS edit_dist,
           CASE WHEN greatest(length(a.t), length(b.t)) > 0
                THEN round(CAST(levenshtein(a.t, b.t) AS DOUBLE)
                           / greatest(length(a.t), length(b.t)), 6)
                ELSE 0.0 END AS rel_dist
    FROM r a JOIN r b
      ON a.lang IS NOT DISTINCT FROM b.lang AND b.rn > a.rn AND b.rn <= a.rn + 3
    """,
    doc="Exact Levenshtein verification over the id-adjacency "
    "candidate window (per-lang, fanout 3): the ground-truth edit "
    "metric LSH/SimHash candidates are usually verified against. "
    "Scale shape: the O(L²) DP is bounded per pair by the 256-char "
    "normalized-prefix cap, candidates by the windowed equi-join — "
    "O(n·window) pairs, each O(cap²), never all-pairs; levenshtein "
    "is a JVM built-in with identical semantics in DuckDB.",
)
def q_dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.edit_distance_pairs(docs, window=3, partition_col="lang")


@register(
    "q_containment_dedup",
    oracle="""
    WITH sh AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
             list_distinct(list_transform(
               range(1, greatest(length(lower(trim(text))) - 3, 0) + 1),
               i -> substr(lower(trim(text)), CAST(i AS INTEGER), 4))) AS grams
      FROM documents
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CASE WHEN len(a.grams) > 0
                THEN round(CAST(len(list_filter(a.grams,
                       g -> list_contains(b.grams, g))) AS DOUBLE)
                     / len(a.grams), 6)
                ELSE 0.0 END AS containment_a,
           CASE WHEN len(b.grams) > 0
                THEN round(CAST(len(list_filter(a.grams,
                       g -> list_contains(b.grams, g))) AS DOUBLE)
                     / len(b.grams), 6)
                ELSE 0.0 END AS containment_b
    FROM sh a JOIN sh b
      ON a.lang IS NOT DISTINCT FROM b.lang AND b.rn > a.rn AND b.rn <= a.rn + 3
    """,
    doc="Asymmetric 4-gram CONTAINMENT |A∩B|/|A| (Broder): catches a "
    "document embedded in a larger one, where symmetric Jaccard is "
    "diluted by the larger set. Same id-adjacency candidate contract "
    "and hashed-shingle representation as q_dedup_ngram_jaccard "
    "(bounded-fanout equi-join; only hashed-gram arrays shuffle).",
)
def q_containment_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.containment_pairs(docs, shingle_k=4, window=3, partition_col="lang")


def _minhash_xxhash_oracle() -> str:
    """DuckDB replay of the PRODUCTION minhash_lsh_pairs pipeline.

    Every hash in the production path except the band key is plain
    integer math DuckDB can reproduce bit-exactly in HUGEINT:

    - gram hash: the Horner rolling hash over UTF-32 code points
      (``_kgram_hashes``) — same FNV-prime base as the winnow-fast
      oracle, with ``unicode(substr(t,i,1))`` supplying code points
      instead of bytes; each 8-term sum < 2^88 fits int128.
    - splitmix64 finalizer (``_mix64``): staged CTE columns, one
      stage per xor-shift/multiply; the two 64x64→64 multiplies are
      split hi/lo (32-bit halves) so no intermediate exceeds 2^97.
    - signature: min over the distinct gram-hash set of
      mix64(h XOR seed_i), seeds inlined from the operator's own
      ``_mix64(arange(1..16))`` so SQL cannot drift from the source.
    - band key: the production path hashes each 4-tuple of signature
      values with xxhash64 PURELY as a fixed-width join key; key
      equality is implied by tuple equality, so the oracle joins on
      the tuple itself. The two diverge only if an xxhash64 COLLISION
      admits an extra candidate pair that also passes the Jaccard
      verify — P ≈ n_bands²/2⁶⁵ per corpus, the same negligible-
      collision class as the 64-bit shingle hashes.

    Verified three-way at sf0.01 (Spark == pure-numpy reference ==
    this SQL, 25/25 pairs value-identical) before registration.
    """
    import numpy as np

    from ella_spark.operators.dedup import _ROLL_P, _mix64

    k, nh, bands, thr = 8, 16, 4, 0.4
    r = nh // bands
    t64, t32 = 1 << 64, 1 << 32
    gamma = 0x9E3779B97F4A7C15  # splitmix64 increment (_SPLITMIX_GAMMA)
    c1, c2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB  # _mix64 multipliers
    seeds = _mix64(np.arange(1, nh + 1, dtype=np.uint64))
    seed_values = ", ".join(
        f"({i}, {int(s)}::HUGEINT)" for i, s in enumerate(seeds)
    )
    pow_mod = [pow(int(_ROLL_P), j, t64) for j in range(k)]
    roll = " + ".join(
        f"cp[i + {j}] * {pow_mod[k - 1 - j]}::HUGEINT" for j in range(k)
    )

    def mul64(z: str, c: int) -> str:
        # (z * c) mod 2^64 without exceeding int128: split z into
        # 32-bit halves, reduce the high product mod 2^32 pre-shift.
        return (
            f"(((({z}) // {t32}) * {c}::HUGEINT) % {t32} * {t32}"
            f" + (({z}) % {t32}) * {c}::HUGEINT) % {t64}::HUGEINT"
        )

    return f"""
    WITH n AS (
      SELECT doc_id, lower(trim(text)) AS t
      FROM documents
      WHERE length(lower(trim(text))) >= {k}
    ),
    cps AS (
      SELECT doc_id,
             list_transform(range(1, length(t) + 1),
               i -> unicode(substr(t, CAST(i AS INTEGER), 1))::HUGEINT) AS cp
      FROM n
    ),
    g0 AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(cp) - {k} + 2),
               i -> ({roll}) % {t64}::HUGEINT)) AS z
      FROM cps
    ),
    g1 AS (SELECT doc_id, (z + {gamma}::HUGEINT) % {t64}::HUGEINT AS z FROM g0),
    g2 AS (SELECT doc_id, xor(z, z >> 30) AS z FROM g1),
    g3 AS (SELECT doc_id, {mul64('z', c1)} AS z FROM g2),
    g4 AS (SELECT doc_id, xor(z, z >> 27) AS z FROM g3),
    g5 AS (SELECT doc_id, {mul64('z', c2)} AS z FROM g4),
    sh AS (SELECT DISTINCT doc_id, xor(z, z >> 31) AS z FROM g5),
    seeds(i, seed) AS (VALUES {seed_values}),
    s1 AS (SELECT doc_id, i, (xor(z, seed) + {gamma}::HUGEINT) % {t64}::HUGEINT AS z
           FROM sh CROSS JOIN seeds),
    s2 AS (SELECT doc_id, i, xor(z, z >> 30) AS z FROM s1),
    s3 AS (SELECT doc_id, i, {mul64('z', c1)} AS z FROM s2),
    s4 AS (SELECT doc_id, i, xor(z, z >> 27) AS z FROM s3),
    s5 AS (SELECT doc_id, i, {mul64('z', c2)} AS z FROM s4),
    sig AS (SELECT doc_id, i, min(xor(z, z >> 31)) AS s
            FROM s5 GROUP BY doc_id, i),
    bands AS (
      SELECT doc_id, i // {r} AS band_idx, list(s ORDER BY i) AS bkey
      FROM sig GROUP BY doc_id, i // {r}
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b
        ON a.band_idx = b.band_idx AND a.bkey = b.bkey
       AND a.doc_id < b.doc_id
    ),
    nsh AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.id_a, c.id_b, count(*) AS ni
      FROM cand c
      JOIN sh x ON x.doc_id = c.id_a
      JOIN sh y ON y.doc_id = c.id_b AND y.z = x.z
      GROUP BY c.id_a, c.id_b
    )
    SELECT c.id_a AS id_a, c.id_b AS id_b,
           round(CAST(coalesce(i.ni, 0) AS DOUBLE)
                 / (na.n + nb.n - coalesce(i.ni, 0)), 6) AS jaccard
    FROM cand c
    LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
    JOIN nsh na ON na.doc_id = c.id_a
    JOIN nsh nb ON nb.doc_id = c.id_b
    WHERE round(CAST(coalesce(i.ni, 0) AS DOUBLE)
                / (na.n + nb.n - coalesce(i.ni, 0)), 6) >= {thr}
    """


@register(
    "q_dedup_minhash_lsh",
    oracle=_minhash_xxhash_oracle(),
    doc="MinHash+LSH near-dup pairs (shingle→minhash→band→bucket-join"
    "→verify) — the PRODUCTION xxhash64/splitmix64 fast path. Oracle-"
    "paired since r13: the rolling gram hash, splitmix64 finalizer, "
    "and seeded signature mins are replayed bit-exactly in DuckDB "
    "HUGEINT arithmetic (see _minhash_xxhash_oracle; band keys join "
    "on the signature 4-tuple, whose equality the xxhash64 band hash "
    "merely encodes), closing the last never-hash-checked hot dedup "
    "path.",
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_lsh_pairs(docs, jaccard_threshold=0.4).orderBy("id_a", "id_b")


def _minhash_portable_oracle() -> str:
    from ella_spark.operators.dedup import MINHASH_A, MINHASH_B, MINHASH_P

    k, num_hashes, bands = 3, 16, 4
    r = num_hashes // bands
    sig_items = ", ".join(
        f"list_min(list_transform(hs, h -> ({MINHASH_A[i]} * (h % {MINHASH_P}) "
        f"+ {MINHASH_B[i]}) % {MINHASH_P}))"
        for i in range(num_hashes)
    )
    band_ids = ", ".join(str(b) for b in range(bands))
    return f"""
    WITH docs AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS w
      FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(w) - {k} + 2),
               i -> ('0x' || substr(md5(array_to_string(w[i:i+{k - 1}], ' ')), 1, 8))::BIGINT)) AS hs
      FROM docs WHERE len(w) >= {k}),
    sig AS (SELECT doc_id, hs, [{sig_items}] AS sg FROM sh),
    banded AS (
      SELECT doc_id, t.b AS band_idx,
             array_to_string(sg[t.b*{r}+1 : t.b*{r}+{r}], ',') AS band_key
      FROM sig, UNNEST([{band_ids}]) AS t(b)),
    cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a
      JOIN banded b ON a.band_idx = b.band_idx
                   AND a.band_key = b.band_key
                   AND a.doc_id < b.doc_id)
    SELECT cand.id_a, cand.id_b,
           round(CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
                 / len(list_distinct(list_concat(sa.hs, sb.hs))), 6) AS jaccard
    FROM cand
    JOIN sig sa ON sa.doc_id = cand.id_a
    JOIN sig sb ON sb.doc_id = cand.id_b
    WHERE round(CAST(len(list_intersect(sa.hs, sb.hs)) AS DOUBLE)
          / len(list_distinct(list_concat(sa.hs, sb.hs))), 6) >= 0.4
    """


@register(
    "q_dedup_minhash_portable",
    oracle=_minhash_portable_oracle(),
    doc="MinHash+LSH near-dup pairs with engine-portable hashing (md5 "
    "hex-prefix shingle hash + Carter–Wegman permutations, integer "
    "math only) — the hash-checked counterpart to the xxhash64 fast "
    "path: the DuckDB oracle replays the EXACT pair set.",
)
def q_dedup_minhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.minhash_portable_pairs(docs, jaccard_threshold=0.4).orderBy(
        "id_a", "id_b"
    )


@register(
    "q_dedup_simhash",
    oracle=None,  # xxhash64-based; verified against planted dups in tests
    doc="SimHash near-dup pairs (64-bit fingerprint, 16-bit chunk LSH, Hamming<=3).",
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_dedup(docs, hamming_threshold=3).orderBy("id_a", "id_b")


def _simhash_portable_oracle() -> str:
    n_bits, chunk_bits, ham = 60, 15, 3
    n_chunks = n_bits // chunk_bits
    fp_terms = " + ".join(
        f"(CASE WHEN 2 * CAST(list_sum(list_transform(hs, h -> (h >> {j}) & 1)) AS BIGINT)"
        f" > len(hs) THEN {1 << j} ELSE 0 END)"
        for j in range(n_bits)
    )
    chunk_ids = ", ".join(str(c) for c in range(n_chunks))
    return f"""
    WITH docs AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                         t -> t != '') AS w
      FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(w)),
               i -> ('0x' || substr(md5(array_to_string(w[i:i+1], ' ')), 1, 15))::BIGINT)) AS hs
      FROM docs WHERE len(w) >= 2),
    fp AS (
      SELECT doc_id, CAST({fp_terms} AS BIGINT) AS f
      FROM sh WHERE len(hs) > 0),
    chunked AS (
      SELECT doc_id, f, t.c AS chunk_idx,
             (f >> (t.c * {chunk_bits})) & {(1 << chunk_bits) - 1} AS chunk_key
      FROM fp, UNNEST([{chunk_ids}]) AS t(c)),
    pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(bit_count(xor(a.f, b.f)) AS INTEGER) AS hamming
      FROM chunked a
      JOIN chunked b ON a.chunk_idx = b.chunk_idx
                    AND a.chunk_key = b.chunk_key
                    AND a.doc_id < b.doc_id)
    SELECT id_a, id_b, hamming FROM pairs WHERE hamming <= {ham}
    """


@register(
    "q_dedup_simhash_portable",
    oracle=_simhash_portable_oracle(),
    doc="SimHash near-dup pairs with engine-portable hashing: 60-bit "
    "majority-vote fingerprint over md5-derived distinct token hashes, "
    "4x15-bit chunk buckets (pigeonhole recall at Hamming<=3), "
    "bit_count verify — the DuckDB oracle replays the exact pair set.",
)
def q_dedup_simhash_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return D.simhash_portable_pairs(docs, hamming_threshold=3).orderBy(
        "id_a", "id_b"
    )


@register(
    "q_dedup_embedding",
    oracle="""
    WITH v AS (
      SELECT vec_id, label,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve,
             sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_sum(list_transform(range(1, 65),
                 i -> a.ve[CAST(i AS INTEGER)] * b.ve[CAST(i AS INTEGER)]))
                 / (a.nrm * b.nrm), 6) AS cosine
    FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_sum(list_transform(range(1, 65),
            i -> a.ve[CAST(i AS INTEGER)] * b.ve[CAST(i AS INTEGER)]))
          / (a.nrm * b.nrm), 6) >= 0.3
    """,
    doc="Embedding-cosine near-dup within label buckets (JVM zip_with/aggregate).",
)
def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return D.embedding_neardup_pairs(emb, cosine_threshold=0.3, bucket_col="label")


@register(
    "q_stratified_sample",
    oracle="""
    WITH tagged AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % 100 AS bucket
      FROM documents)
    SELECT lang,
           count(*)                       AS n_sampled,
           CAST(min(doc_id) AS BIGINT)    AS min_id,
           CAST(max(doc_id) AS BIGINT)    AS max_id
    FROM tagged
    WHERE bucket < 20
    GROUP BY lang
    """,
    doc="Deterministic stratified sampling (hash-mod buckets on the "
    "stable id — reproducible across engines/runs/cluster sizes, "
    "unlike rand()): keep ~20% per language stratum. The standard "
    "downsampling primitive for 100 TB corpus curation.",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
    return (
        d.where(bucket < 20)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").cast("bigint").alias("min_id"),
            F.max("doc_id").cast("bigint").alias("max_id"),
        )
    )


@register(
    "q_decontaminate",
    oracle="""
    WITH bench AS (
      SELECT DISTINCT md5(lower(trim(text))) AS h FROM documents WHERE doc_id < 50
    )
    SELECT d.doc_id, d.lang
    FROM documents d
    WHERE md5(lower(trim(d.text))) NOT IN (SELECT h FROM bench)
      AND d.doc_id >= 50
    """,
    doc="Benchmark decontamination: drop training documents whose "
    "normalized content hash appears in the held-out set (docs 0-49 "
    "stand in for the benchmark). Plan shape: broadcast anti-join on "
    "16-byte digests — bodies never shuffle, benchmark set is small "
    "by definition, so this scales to any corpus size.",
)
def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.lower(F.trim(F.col("text"))).cast("binary"))
    bench = (
        d.where(F.col("doc_id") < 50).select(h.alias("h")).distinct()
    )
    return (
        d.where(F.col("doc_id") >= 50)
        .withColumn("h", h)
        .join(F.broadcast(bench), "h", "left_anti")
        .select("doc_id", "lang")
    )


#: per-process cache of the corpus fingerprint index (built once per
#: sf_dir, like a production index living next to its corpus)
_DEDUP_IDX_CACHE: dict = {}


@register(
    "q_dedup_incremental",
    oracle="""
    WITH corpus AS (
      SELECT md5(lower(trim(text))) AS h, min(doc_id) AS exact_dup_of
      FROM documents WHERE doc_id % 5 <> 0 GROUP BY 1
    ), batch AS (
      SELECT doc_id, md5(lower(trim(text))) AS h
      FROM documents WHERE doc_id % 5 = 0
    )
    SELECT b.doc_id AS doc_id,
           c.exact_dup_of AS exact_dup_of,
           CAST(c.exact_dup_of IS NULL AS INT) AS is_unique
    FROM batch b LEFT JOIN corpus c ON b.h = c.h
    """,
    doc="Incremental cross-corpus dedup: a persisted fingerprint index "
    "(operators/incremental_dedup.py DedupIndex — digests + MinHash "
    "band buckets + signatures, ids only) is built ONCE over the "
    "corpus slice; each new batch joins the index, never corpus text. "
    "The oracle replays the exact-digest path; the MinHash near-dup "
    "path (signature-estimated Jaccard) is xxhash-free but "
    "numpy-hash-based, verified against planted dups in "
    "tests/test_incremental_dedup.py.",
)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import tempfile

    import pyspark.sql.functions as F

    from ella_spark.operators.incremental_dedup import DedupIndex

    docs = load_table(spark, sf_dir, "documents")
    key = os.path.abspath(sf_dir)
    idx = _DEDUP_IDX_CACHE.get(key)
    if idx is None:
        idx = _DEDUP_IDX_CACHE[key] = DedupIndex.build(
            docs.where("doc_id % 5 <> 0"),
            tempfile.mkdtemp(prefix="ella_dedup_idx_"),
        )
    out = idx.dedup_against(docs.where("doc_id % 5 = 0"), near=False)
    return out.select(
        "doc_id", "exact_dup_of", F.col("is_unique").cast("int").alias("is_unique")
    )


@register(
    "q_dedup_cluster",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
             list_distinct(list_transform(
               range(1, greatest(length(lower(trim(text))) - 2, 0) + 1),
               i -> substr(lower(trim(text)), CAST(i AS INTEGER), 3))) AS grams
      FROM documents
      WHERE length(lower(trim(text))) >= 3
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b
        ON a.lang IS NOT DISTINCT FROM b.lang AND b.rn > a.rn AND b.rn <= a.rn + 3
      WHERE CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) > 0
                 THEN round(
                   CAST(len(list_filter(a.grams, g -> list_contains(b.grams, g))) AS DOUBLE)
                   / len(list_distinct(list_concat(a.grams, b.grams))), 6)
                 ELSE 0.0 END >= 0.6
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ), reach AS (
      SELECT doc_id AS id, doc_id AS known FROM documents
      UNION
      SELECT e.dst AS id, r.known
      FROM reach r JOIN edges e ON e.src = r.id
    )
    SELECT id AS doc_id, min(known) AS cluster_id,
           CAST(id = min(known) AS BOOLEAN) AS is_canonical
    FROM reach GROUP BY id
    """,
    doc="Near-dup CLUSTERING: candidate pairs (windowed 3-gram Jaccard "
    ">= 0.6) -> connected components (alternating large-star/small-star, "
    "operators/graph.py) -> one canonical doc per duplicate group. The "
    "step LSH pair-generation alone leaves missing: transitive closure "
    "of near-dup pairs. Oracle: recursive-CTE flood fill in DuckDB.",
)
def q_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from ella_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    eligible = docs.where(F.length(F.lower(F.trim("text"))) >= 3)
    pairs = D.ngram_jaccard_pairs(
        eligible, shingle_k=3, window=3, partition_col="lang", min_jaccard=0.6
    )
    comp = connected_components(
        docs, pairs, id_col="doc_id", src="id_a", dst="id_b"
    )
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("component").alias("cluster_id"),
        (F.col("id") == F.col("component")).alias("is_canonical"),
    )


@register(
    "q_ngram_decontaminate",
    oracle="""
    WITH bench_grams AS (
      SELECT DISTINCT md5(array_to_string(list_slice(words, s, s + 12), ' ')) AS g
      FROM (
        SELECT regexp_split_to_array(lower(trim(text)), '\\s+') AS words
        FROM documents WHERE doc_id < 50
      ), unnest(range(1, greatest(len(words) - 12, 0) + 1)) AS t(s)
    ),
    train AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
      FROM documents WHERE doc_id >= 50
    ),
    hits AS (
      SELECT DISTINCT tr.doc_id
      FROM train tr,
           unnest(range(1, greatest(len(tr.words) - 12, 0) + 1)) AS t(s)
      WHERE md5(array_to_string(list_slice(tr.words, s, s + 12), ' '))
            IN (SELECT g FROM bench_grams)
    )
    SELECT tr.doc_id,
           CAST(len(tr.words) AS BIGINT) AS n_words,
           CAST(tr.doc_id IN (SELECT doc_id FROM hits) AS INT) AS contaminated
    FROM train tr
    """,
    doc="N-gram-level benchmark decontamination (the GPT-3 recipe: a "
    "training doc is contaminated if ANY of its 13-gram word windows "
    "appears in the held-out set; docs 0-49 stand in for the "
    "benchmark). Plan shape: the benchmark 13-gram digest set is "
    "small by definition and broadcasts; training docs explode to "
    "(doc_id, gram_digest) pairs that semi-join the broadcast — "
    "16-byte digests shuffle, text never does. Digest-level "
    "q_decontaminate catches only verbatim copies; this catches "
    "embedded quotes and partial overlaps.",
)
def q_ngram_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    N = 13
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    # valid 13-gram start positions; empty for sub-N docs (a bare
    # sequence(1, size-12) would generate a DESCENDING range there)
    starts = F.when(
        F.size("words") >= N,
        F.sequence(F.lit(1), F.size("words") - (N - 1)),
    ).otherwise(F.array().cast("array<int>"))
    gram = F.md5(
        F.concat_ws(" ", F.slice("words", F.col("s"), N)).cast("binary")
    )
    bench = (
        d.where(F.col("doc_id") < 50)
        .select(words.alias("words"))
        .select(F.col("words"), F.explode(starts).alias("s"))
        .select(gram.alias("g"))
        .distinct()
    )
    train = d.where(F.col("doc_id") >= 50).select("doc_id", words.alias("words"))
    hits = (
        train.select("doc_id", "words", F.explode(starts).alias("s"))
        .join(F.broadcast(bench), gram == F.col("g"), "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    return train.join(hits, "doc_id", "left").select(
        "doc_id",
        F.size("words").cast("bigint").alias("n_words"),
        F.coalesce(F.col("_hit"), F.lit(0)).cast("int").alias("contaminated"),
    )


def _word_gram_dup_occurrences(d: DataFrame, N: int):
    """Shared front half of the span-level dedup family: word arrays
    per doc, exploded (doc_id, s, gram-digest) occurrences, and the
    cross-document duplicate-gram set (digest seen in >= 2 distinct
    docs). Only 16-byte digests shuffle — text never moves. Returns
    (w, occ, dup); occ keeps the window start ``s`` for span logic."""
    import pyspark.sql.functions as F

    words = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    w = d.select("doc_id", words.alias("words"))
    starts = F.when(
        F.size("words") >= N,
        F.sequence(F.lit(1), F.size("words") - (N - 1)),
    ).otherwise(F.array().cast("array<int>"))
    gram = F.md5(
        F.concat_ws(" ", F.slice("words", F.col("s"), N)).cast("binary")
    )
    occ = w.select(
        "doc_id", F.explode(starts).alias("s"), "words"
    ).select("doc_id", "s", gram.alias("g"))
    dup = (
        occ.groupBy("g")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("g")
    )
    return w, occ, dup


@register(
    "q_dup_span_fraction",
    oracle="""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
      FROM documents
    ),
    occ AS (
      SELECT doc_id, s,
             md5(array_to_string(list_slice(words, s, s + 7), ' ')) AS g
      FROM w, unnest(range(1, greatest(len(words) - 7, 0) + 1)) AS t(s)
    ),
    dup AS (
      SELECT g FROM occ GROUP BY g HAVING count(DISTINCT doc_id) >= 2
    )
    SELECT w.doc_id,
           CAST(greatest(len(w.words) - 7, 0) AS BIGINT) AS n_windows,
           CAST(coalesce(h.n_dup, 0) AS BIGINT) AS n_dup_windows,
           round(CASE WHEN len(w.words) > 7
                 THEN CAST(coalesce(h.n_dup, 0) AS DOUBLE)
                      / (len(w.words) - 7) ELSE 0.0 END, 6) AS dup_fraction
    FROM w LEFT JOIN (
      SELECT occ.doc_id, count(*) AS n_dup
      FROM occ WHERE occ.g IN (SELECT g FROM dup)
      GROUP BY occ.doc_id
    ) h ON h.doc_id = w.doc_id
    """,
    doc="Cross-document duplicated-text fraction (Lee et al. 2022, "
    "'Deduplicating Training Data Makes Language Models Better'): the "
    "share of each document's 8-gram windows that also occur in at "
    "least one OTHER document — the span-level signal that survives "
    "when whole-doc dedup misses templated/boilerplate overlap. Plan "
    "shape: docs explode to (doc_id, position, gram_digest); the "
    "duplicate-gram set is found by one digest-keyed aggregate "
    "(16-byte digests shuffle, text never moves), occurrences "
    "re-join on the digest, and the per-doc fraction is a final "
    "O(docs) rollup.",
)
def q_dup_span_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    N = 8
    d = load_table(spark, sf_dir, "documents")
    w, occ, dup = _word_gram_dup_occurrences(d, N)
    per_doc = (
        occ.join(dup, "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_dup"))
    )
    n_windows = F.greatest(F.size("words") - (N - 1), F.lit(0))
    return (
        w.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            n_windows.cast("bigint").alias("n_windows"),
            F.coalesce("n_dup", F.lit(0)).cast("bigint").alias("n_dup_windows"),
            F.round(
                F.when(
                    n_windows > 0,
                    F.coalesce("n_dup", F.lit(0)).cast("double") / n_windows,
                ).otherwise(0.0),
                6,
            ).alias("dup_fraction"),
        )
    )


@register(
    "q_repeated_span_removal",
    oracle="""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
      FROM documents
    ),
    occ AS (
      SELECT doc_id, s,
             md5(array_to_string(list_slice(words, s, s + 7), ' ')) AS g
      FROM w, unnest(range(1, greatest(len(words) - 7, 0) + 1)) AS t(s)
    ),
    dup AS (
      SELECT g FROM occ GROUP BY g HAVING count(DISTINCT doc_id) >= 2
    ),
    hits AS (
      SELECT doc_id, s FROM occ WHERE g IN (SELECT g FROM dup)
    ),
    brk AS (
      SELECT doc_id, s,
             CASE WHEN s - lag(s) OVER (PARTITION BY doc_id ORDER BY s)
                    > 8 OR lag(s) OVER (PARTITION BY doc_id ORDER BY s)
                    IS NULL
                  THEN 1 ELSE 0 END AS b
      FROM hits
    ),
    grp AS (
      SELECT doc_id, s,
             sum(b) OVER (PARTITION BY doc_id ORDER BY s) AS gid
      FROM brk
    )
    SELECT doc_id,
           CAST(min(s) AS BIGINT)            AS span_start,
           CAST(max(s) + 7 AS BIGINT)        AS span_end,
           CAST(max(s) + 8 - min(s) AS BIGINT) AS span_words
    FROM grp GROUP BY doc_id, gid
    """,
    doc="ExactSubstr-style repeated-span REMOVAL plan (Lee et al. "
    "2022): where q_dup_span_fraction measures cross-document "
    "duplication, this emits the MAXIMAL duplicated word spans — one "
    "row per span to cut, [span_start, span_end] in word positions — "
    "by merging overlapping/adjacent duplicate 8-gram windows into "
    "islands (window lag/cumsum per doc: fixed-width windows make "
    "`gap > N` the exact island-break test). Plan shape: the only "
    "O(total words) stages are the digest explode and one digest-"
    "keyed aggregate (16-byte digests shuffle, text never moves); "
    "island detection is a per-doc window over duplicate hits only — "
    "at 100 TB the hit set is the duplicated tail, typically a small "
    "fraction of the corpus.",
)
def q_repeated_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    N = 8
    d = load_table(spark, sf_dir, "documents")
    _, occ, dup = _word_gram_dup_occurrences(d, N)
    return _dup_span_islands(occ, dup, N)


def _dup_span_islands(occ: DataFrame, dup: DataFrame, N: int) -> DataFrame:
    """Maximal duplicated word spans per doc: duplicate-gram hits
    merged into islands (fixed-width windows sorted by start: the
    running covered-end is lag(s)+N-1, so a new island begins exactly
    when the gap to the previous start exceeds N — adjacent coverage
    merges). Returns (doc_id, span_start, span_end, span_words)."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    hits = occ.join(dup, "g", "left_semi").select("doc_id", "s")
    wd = Window.partitionBy("doc_id").orderBy("s")
    brk = hits.withColumn(
        "b",
        F.when(
            F.col("s") - F.lag("s").over(wd) > N, 1
        ).when(F.lag("s").over(wd).isNull(), 1).otherwise(0),
    )
    grp = brk.withColumn(
        "gid", F.sum("b").over(wd.rowsBetween(Window.unboundedPreceding, 0))
    )
    return grp.groupBy("doc_id", "gid").agg(
        F.min("s").cast("bigint").alias("span_start"),
        (F.max("s") + (N - 1)).cast("bigint").alias("span_end"),
        (F.max("s") + N - F.min("s")).cast("bigint").alias("span_words"),
    ).drop("gid")


@register(
    "q_span_cleaned_text",
    oracle="""
    WITH w AS (
      SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS words
      FROM documents
    ),
    occ AS (
      SELECT doc_id, s,
             md5(array_to_string(list_slice(words, s, s + 7), ' ')) AS g
      FROM w, unnest(range(1, greatest(len(words) - 7, 0) + 1)) AS t(s)
    ),
    dup AS (
      SELECT g FROM occ GROUP BY g HAVING count(DISTINCT doc_id) >= 2
    ),
    hits AS (
      SELECT doc_id, s FROM occ WHERE g IN (SELECT g FROM dup)
    ),
    brk AS (
      SELECT doc_id, s,
             CASE WHEN s - lag(s) OVER (PARTITION BY doc_id ORDER BY s)
                    > 8 OR lag(s) OVER (PARTITION BY doc_id ORDER BY s)
                    IS NULL
                  THEN 1 ELSE 0 END AS b
      FROM hits
    ),
    grp AS (
      SELECT doc_id, s,
             sum(b) OVER (PARTITION BY doc_id ORDER BY s) AS gid
      FROM brk
    ),
    spans AS (
      SELECT doc_id, min(s) AS a, max(s) + 7 AS b
      FROM grp GROUP BY doc_id, gid
    ),
    per_doc AS (
      SELECT doc_id, list({'a': a, 'b': b}) AS sp FROM spans GROUP BY doc_id
    )
    SELECT w.doc_id,
           coalesce(array_to_string(
             list_filter(w.words,
               (x, i) -> len(list_filter(coalesce(p.sp, []),
                               s -> i >= s.a AND i <= s.b)) = 0),
             ' '), '') AS clean_text,
           CAST(len(w.words) AS BIGINT) AS n_words,
           CAST(len(w.words)
                - len(list_filter(w.words,
                    (x, i) -> len(list_filter(coalesce(p.sp, []),
                                    s -> i >= s.a AND i <= s.b)) = 0))
             AS BIGINT) AS n_removed
    FROM w LEFT JOIN per_doc p ON p.doc_id = w.doc_id
    """,
    doc="ExactSubstr dedup APPLIED: reconstructs each document's "
    "cleaned text with every cross-document duplicated span cut out — "
    "the measure (q_dup_span_fraction) → plan (q_repeated_span_"
    "removal) → apply chain complete. Word positions covered by a "
    "maximal duplicate island are filtered with an index lambda "
    "against the doc's collected span list (spans per doc are few — "
    "the O(words × spans) filter is bounded); text leaves the "
    "executor only as the final cleaned string.",
)
def q_span_cleaned_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    N = 8
    d = load_table(spark, sf_dir, "documents")
    w, occ, dup = _word_gram_dup_occurrences(d, N)
    spans = _dup_span_islands(occ, dup, N)
    per_doc = spans.groupBy("doc_id").agg(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("a"), F.col("span_end").alias("b")
            )
        ).alias("sp")
    )
    sp = F.coalesce(
        F.col("sp"),
        F.array().cast("array<struct<a:bigint,b:bigint>>"),
    )
    # Spark filter-lambda index is 0-based; word positions are 1-based
    keep = F.filter(
        "words",
        lambda x, i: ~F.exists(
            sp, lambda s: (i + 1 >= s["a"]) & (i + 1 <= s["b"])
        ),
    )
    return (
        w.join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.concat_ws(" ", keep).alias("clean_text"),
            F.size("words").cast("bigint").alias("n_words"),
            (F.size("words") - F.size(keep)).cast("bigint").alias("n_removed"),
        )
    )


@register(
    "q_semantic_decontaminate",
    oracle="""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve,
             sqrt(list_sum(list_transform(embedding,
                  x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
      FROM embeddings),
    q AS (SELECT * FROM v WHERE vec_id < 24),
    c AS (SELECT * FROM v WHERE vec_id >= 24),
    scored AS (
      SELECT c.vec_id,
             max(round(list_sum(list_transform(range(1, 65),
                   i -> c.ve[CAST(i AS INTEGER)] * q.ve[CAST(i AS INTEGER)]))
                 / (c.nrm * q.nrm), 6)) AS max_cosine
      FROM c, q
      GROUP BY c.vec_id)
    SELECT vec_id, max_cosine
    FROM scored
    ORDER BY max_cosine DESC, vec_id
    LIMIT 50
    """,
    doc="SEMANTIC decontamination (the embedding companion to the "
    "n-gram q_decontaminate / q_ngram_decontaminate): rank training "
    "vectors by their max cosine to a FIXED held-out eval set "
    "(vec_id < 24 — bounded by construction, so the cross join is a "
    "24-row broadcast at any corpus size) and surface the top-50 "
    "candidates for removal. Per-pair cosine follows the "
    "q_dedup_embedding idiom (in-order zip_with/aggregate fold = "
    "DuckDB list_transform/list_sum, round 6). At 100 TB with a "
    "LARGE eval set, the same max-cosine reduces over the IVF-cell "
    "blocked kNN join instead of the broadcast.",
)
def q_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("ve"),
        F.sqrt(
            F.aggregate(
                F.transform(
                    "embedding", lambda x: x.cast("double") * x.cast("double")
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        ).alias("nrm"),
    )
    q = v.where(F.col("vec_id") < 24).select(
        F.col("vec_id").alias("qid"),
        F.col("ve").alias("qve"),
        F.col("nrm").alias("qnrm"),
    )
    c = v.where(F.col("vec_id") >= 24)
    dot = F.aggregate(
        F.zip_with("ve", "qve", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # NULL on a zero norm (DuckDB division behavior; Spark ANSI would
    # throw) — max() then ignores the NULL on both engines (r14 fuzz)
    cos = F.round(
        F.when(
            (F.col("nrm") * F.col("qnrm")) != F.lit(0.0),
            dot / (F.col("nrm") * F.col("qnrm")),
        ),
        6,
    )
    return (
        c.crossJoin(F.broadcast(q))
        .groupBy("vec_id")
        .agg(F.max(cos).alias("max_cosine"))
        .orderBy(F.col("max_cosine").desc(), "vec_id")
        .limit(50)
    )


@register(
    "q_dedup_keep_best",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
             list_distinct(list_transform(
               range(1, greatest(length(lower(trim(text))) - 2, 0) + 1),
               i -> substr(lower(trim(text)), CAST(i AS INTEGER), 3))) AS grams
      FROM documents
      WHERE length(lower(trim(text))) >= 3
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b
        ON a.lang IS NOT DISTINCT FROM b.lang AND b.rn > a.rn AND b.rn <= a.rn + 3
      WHERE CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) > 0
                 THEN round(
                   CAST(len(list_filter(a.grams, g -> list_contains(b.grams, g))) AS DOUBLE)
                   / len(list_distinct(list_concat(a.grams, b.grams))), 6)
                 ELSE 0.0 END >= 0.6
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ), reach AS (
      SELECT doc_id AS id, doc_id AS known FROM documents
      UNION
      SELECT e.dst AS id, r.known
      FROM reach r JOIN edges e ON e.src = r.id
    ), comp AS (
      SELECT id AS doc_id, min(known) AS cluster_id FROM reach GROUP BY id
    ), ranked AS (
      SELECT c.doc_id, c.cluster_id, d.n_chars,
             row_number() OVER (PARTITION BY c.cluster_id
                                ORDER BY d.n_chars DESC, c.doc_id) AS rk
      FROM comp c JOIN documents d ON d.doc_id = c.doc_id
    )
    SELECT doc_id, cluster_id, CAST(n_chars AS BIGINT) AS n_chars,
           CAST(rk = 1 AS BOOLEAN) AS keep
    FROM ranked
    """,
    doc="Keep-best dedup: the q_dedup_cluster pipeline (windowed "
    "3-gram Jaccard pairs -> connected components), but the survivor "
    "of each near-dup cluster is chosen by QUALITY (longest n_chars, "
    "ties to smallest doc_id) instead of smallest id — the standard "
    "'dedup but keep the best copy' curation recipe. One extra "
    "cluster-keyed row_number window over the component frame; the "
    "quality signal is swappable for any scoring column.",
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from ella_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    eligible = docs.where(F.length(F.lower(F.trim("text"))) >= 3)
    pairs = D.ngram_jaccard_pairs(
        eligible, shingle_k=3, window=3, partition_col="lang", min_jaccard=0.6
    )
    comp = connected_components(
        docs, pairs, id_col="doc_id", src="id_a", dst="id_b"
    )
    ranked = comp.select(
        F.col("id").alias("doc_id"), F.col("component").alias("cluster_id")
    ).join(docs.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    return ranked.select(
        "doc_id",
        "cluster_id",
        F.col("n_chars").cast("bigint").alias("n_chars"),
        (F.row_number().over(w) == 1).alias("keep"),
    )


@register(
    "q_dedup_soft_weight",
    oracle="""
    WITH RECURSIVE sh AS (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
             list_distinct(list_transform(
               range(1, greatest(length(lower(trim(text))) - 2, 0) + 1),
               i -> substr(lower(trim(text)), CAST(i AS INTEGER), 3))) AS grams
      FROM documents
      WHERE length(lower(trim(text))) >= 3
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b
        ON a.lang IS NOT DISTINCT FROM b.lang AND b.rn > a.rn AND b.rn <= a.rn + 3
      WHERE CASE WHEN len(list_distinct(list_concat(a.grams, b.grams))) > 0
                 THEN round(
                   CAST(len(list_filter(a.grams, g -> list_contains(b.grams, g))) AS DOUBLE)
                   / len(list_distinct(list_concat(a.grams, b.grams))), 6)
                 ELSE 0.0 END >= 0.6
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ), reach AS (
      SELECT doc_id AS id, doc_id AS known FROM documents
      UNION
      SELECT e.dst AS id, r.known
      FROM reach r JOIN edges e ON e.src = r.id
    ), comp AS (
      SELECT id AS doc_id, min(known) AS cluster_id FROM reach GROUP BY id
    ), sized AS (
      SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id
    )
    SELECT c.doc_id, c.cluster_id,
           s.cluster_size,
           CAST(1.0 AS DOUBLE) / s.cluster_size AS weight
    FROM comp c JOIN sized s ON s.cluster_id = c.cluster_id
    """,
    doc="SOFT dedup: instead of dropping near-duplicates, every "
    "member of a near-dup cluster gets sampling weight 1/cluster_size "
    "— total cluster mass stays 1, so repeated content is downweighted "
    "rather than lost (the mixture-weighting alternative to hard "
    "dedup in training-data recipes). Same CC pipeline as "
    "q_dedup_cluster + one cluster-keyed count; the weight is one "
    "deterministic double division of exact integers.",
)
def q_dedup_soft_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    from ella_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    eligible = docs.where(F.length(F.lower(F.trim("text"))) >= 3)
    pairs = D.ngram_jaccard_pairs(
        eligible, shingle_k=3, window=3, partition_col="lang", min_jaccard=0.6
    )
    comp = connected_components(
        docs, pairs, id_col="doc_id", src="id_a", dst="id_b"
    ).select(F.col("id").alias("doc_id"), F.col("component").alias("cluster_id"))
    sized = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return comp.join(sized, "cluster_id").select(
        "doc_id",
        "cluster_id",
        "cluster_size",
        (F.lit(1.0) / F.col("cluster_size")).alias("weight"),
    )


@register(
    "q_ngram_novelty",
    oracle="""
    WITH w AS (
      SELECT source,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS ws
      FROM documents WHERE length(trim(text)) > 0),
    sh AS (
      SELECT DISTINCT source, g FROM (
        SELECT source,
               unnest(list_distinct(list_transform(
                 range(1, len(ws) - 3),
                 i -> array_to_string(list_slice(ws, CAST(i AS INTEGER),
                                                 CAST(i + 4 AS INTEGER)), ' ')))) AS g
        FROM w WHERE len(ws) >= 5)),
    ga AS (
      SELECT g, CAST(count(*) AS BIGINT) AS n_sources,
             min(source) AS only_src
      FROM sh GROUP BY g),
    novel AS (
      SELECT only_src AS source, CAST(count(*) AS BIGINT) AS n_novel
      FROM ga WHERE n_sources = 1 GROUP BY only_src),
    tot AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n_shingles
      FROM sh GROUP BY source)
    SELECT tot.source, tot.n_shingles,
           COALESCE(novel.n_novel, 0) AS n_novel,
           round(CAST(COALESCE(novel.n_novel, 0) AS DOUBLE)
                 / tot.n_shingles, 6) AS novelty
    FROM tot LEFT JOIN novel ON novel.source = tot.source
    ORDER BY tot.source
    """,
    doc="N-gram novelty per source: the fraction of a source's "
    "distinct word 5-gram shingles that appear in NO other "
    "source — 'does this source add new text or re-serve the "
    "corpus?', the acquisition-triage complement of the pairwise "
    "dedup family. Plan: per-doc distinct shingles (map-side), ONE "
    "(source, gram) distinct shuffle, then two aggregations of that "
    "frame — a gram-keyed count whose SINGLETON rows carry their "
    "source via min(source) (so novel counts need no join back to "
    "the gram stream), and a per-source total; the final join is "
    "O(sources) rows. The shuffles carry 8-char grams, never "
    "documents, and nothing is pairwise. At 100 TB swap the raw "
    "gram for its 64-bit hash (identical plan shape).",
)
def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents")
    ws = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    grams = F.array_distinct(
        F.expr(
            "transform(sequence(1, size(ws) - 4), "
            "i -> array_join(slice(ws, i, 5), ' '))"
        )
    )
    sh = (
        docs.where(F.length(F.trim("text")) > 0)
        .select("source", ws.alias("ws"))
        .where(F.size("ws") >= 5)
        .select("source", F.explode(grams).alias("g"))
        .distinct()
    )
    ga = sh.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_sources"),
        F.min("source").alias("only_src"),
    )
    novel = (
        ga.where(F.col("n_sources") == 1)
        .groupBy(F.col("only_src").alias("source"))
        .agg(F.count(F.lit(1)).alias("n_novel"))
    )
    tot = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_shingles"))
    n_novel = F.coalesce(F.col("n_novel"), F.lit(0)).cast("bigint")
    return (
        tot.join(F.broadcast(novel), "source", "left")
        .select(
            "source",
            "n_shingles",
            n_novel.alias("n_novel"),
            F.round(
                n_novel.cast("double") / F.col("n_shingles"), 6
            ).alias("novelty"),
        )
        .orderBy("source")
    )
