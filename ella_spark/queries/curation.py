r"""Training-corpus curation operators: chunking, sequence packing,
repetition-based quality filtering, PII scrubbing, mixture resampling.

Beyond-reference LLM-data-pipeline surface (SURVEY.md §7 Phase 5, next
to dedup/ANN/text-analysis). Everything here is JVM-side built-ins —
split / explode / window prefix-sums / regexp — no Python UDFs, so the
whole stage stays inside whole-stage codegen.

Scale notes (100 TB of documents):
- chunking and packing are map-side except one window per lang-stream;
  the window partitions by ``lang`` — at 100 TB swap in a finer
  partition key (e.g. (lang, shard)) the same way the reference's
  topics shard by time;
- repetition metrics explode words -> groupBy (doc_id, word): the
  shuffle carries (doc_id, word-hash, count) triples, never document
  bodies, and re-aggregates per doc immediately;
- resampling is a stateless deterministic hash gate — map-only, no
  shuffle, reproducible across runs/cluster sizes (the property that
  makes a 1000-executor sampling job re-runnable).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ella_spark.queries import register
from ella_spark.sources import load_table

def _words():
    return F.split(F.lower(F.trim(F.col("text"))), r"\s+")

CHUNK_SIZE = 32
CHUNK_STRIDE = 24
PACK_BUDGET = 512


@register(
    "q_chunk_documents",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS words
      FROM documents WHERE length(trim(text)) > 0
    ), chunks AS (
      SELECT doc_id,
             CAST(unnest(range(1, len(words) + 1, {CHUNK_STRIDE})) AS BIGINT) AS chunk_start,
             words
      FROM d
    )
    SELECT doc_id,
           CAST((chunk_start - 1) / {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           chunk_start,
           CAST(len(list_slice(words, chunk_start,
                               chunk_start + {CHUNK_SIZE} - 1)) AS BIGINT) AS n_chunk_words,
           md5(array_to_string(list_slice(words, chunk_start,
                               chunk_start + {CHUNK_SIZE} - 1), ' ')) AS chunk_md5
    FROM chunks
    """,
    doc=f"Overlapping token-window chunking ({CHUNK_SIZE}-word chunks, "
    f"stride {CHUNK_STRIDE}): split -> sequence of starts -> explode -> "
    "slice. Map-only (no shuffle); the md5 digest stands in for the "
    "chunk body so downstream exchanges never carry text.",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.length(F.trim("text")) > 0)
    d = d.select("doc_id", _words().alias("words"))
    d = d.select(
        "doc_id",
        "words",
        F.explode(
            F.sequence(F.lit(1), F.size("words"), F.lit(CHUNK_STRIDE))
        ).alias("chunk_start0"),
    ).select("doc_id", "words", F.col("chunk_start0").cast("long").alias("chunk_start"))
    chunk = F.slice(F.col("words"), F.col("chunk_start"), F.lit(CHUNK_SIZE))
    return d.select(
        "doc_id",
        ((F.col("chunk_start") - 1) / CHUNK_STRIDE).cast("long").alias("chunk_idx"),
        "chunk_start",
        F.size(chunk).cast("long").alias("n_chunk_words"),
        F.md5(F.array_join(chunk, " ").cast("binary")).alias("chunk_md5"),
    )


@register(
    "q_pack_sequences",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, lang,
             CAST(len(regexp_split_to_array(lower(trim(text)), '\\s+')) AS BIGINT) AS n_tokens
      FROM documents WHERE length(trim(text)) > 0
    )
    SELECT doc_id, lang, n_tokens,
           CAST((sum(n_tokens) OVER w - n_tokens) // {PACK_BUDGET} AS BIGINT) AS seq_id,
           CAST((sum(n_tokens) OVER w - n_tokens) % {PACK_BUDGET} AS BIGINT) AS seq_offset
    FROM d
    WINDOW w AS (PARTITION BY lang ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    doc=f"Concat-and-chop sequence packing (budget {PACK_BUDGET} "
    "tokens): per language stream ordered by doc_id, a prefix-sum "
    "window assigns each doc its training-sequence id and offset — the "
    "GPT-style packing layout as one window aggregate, no iterative "
    "bin-packing loop.",
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(F.length(F.trim("text")) > 0)
    d = d.select("doc_id", "lang", F.size(_words()).cast("long").alias("n_tokens"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offset = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return d.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor(offset / PACK_BUDGET).cast("long").alias("seq_id"),
        (offset % PACK_BUDGET).cast("long").alias("seq_offset"),
    )


@register(
    "q_quality_repetition",
    oracle=r"""
    WITH d AS (
      SELECT doc_id,
             regexp_split_to_array(lower(trim(text)), '\s+') AS words
      FROM documents WHERE length(trim(text)) > 0
    ), w AS (
      SELECT doc_id, unnest(words) AS tok FROM d
    ), wc AS (
      SELECT doc_id, tok, count(*) AS c FROM w GROUP BY doc_id, tok
    ), wstats AS (
      SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
             CAST(count(*) AS BIGINT) AS n_distinct,
             max(c) AS top_word_c
      FROM wc GROUP BY doc_id
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(words) - 1, 0) + 1),
                    i -> words[CAST(i AS INTEGER)] || ' ' ||
                         words[CAST(i + 1 AS INTEGER)])) AS bigram
      FROM d
    ), bc AS (
      SELECT doc_id, bigram, count(*) AS c FROM bg GROUP BY doc_id, bigram
    ), bstats AS (
      SELECT doc_id, max(c) AS top_bigram_c, CAST(sum(c) AS BIGINT) AS n_bigrams
      FROM bc GROUP BY doc_id
    )
    SELECT w.doc_id, w.n_words,
           round(CAST(w.n_distinct AS DOUBLE) / w.n_words, 6)   AS distinct_ratio,
           round(CAST(w.top_word_c AS DOUBLE) / w.n_words, 6)   AS top_word_frac,
           round(CAST(coalesce(b.top_bigram_c, 0) AS DOUBLE)
                 / greatest(coalesce(b.n_bigrams, 0), 1), 6)    AS top_bigram_frac,
           (CAST(w.top_word_c AS DOUBLE) / w.n_words > 0.10
            OR CAST(coalesce(b.top_bigram_c, 0) AS DOUBLE)
               / greatest(coalesce(b.n_bigrams, 0), 1) > 0.08)  AS is_repetitive
    FROM wstats w LEFT JOIN bstats b ON w.doc_id = b.doc_id
    """,
    doc="Gopher-style repetition quality filter: distinct-word ratio, "
    "top-word fraction, top-bigram fraction, and a repetitiveness gate. "
    "Explodes words/bigrams -> per-(doc,token) counts -> per-doc "
    "extremes; the shuffle carries count triples, never bodies.",
)
def q_quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE scan, ONE tokenize: words and bigrams explode as a single
    # kind-tagged token stream, counted in one (doc, kind, token)
    # aggregate and folded to per-doc stats with conditional aggs —
    # the two-pipeline form scanned and tokenized every document
    # twice and joined the halves back on doc_id.
    d = load_table(spark, sf_dir, "documents").where(F.length(F.trim("text")) > 0)
    d = d.select("doc_id", _words().alias("words"))

    bigrams = F.expr(
        "transform(sequence(1, greatest(size(words) - 1, 0)), "
        "i -> concat(element_at(words, i), ' ', element_at(words, i + 1)))"
    )
    tagged = F.concat(
        F.expr("transform(words, w -> struct('w' AS kind, w AS tok))"),
        F.transform(bigrams, lambda b: F.struct(F.lit("b").alias("kind"), b.alias("tok"))),
    )
    counts = (
        d.select("doc_id", F.explode(tagged).alias("t"))
        .groupBy("doc_id", F.col("t.kind").alias("kind"), F.col("t.tok").alias("tok"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    is_w = F.col("kind") == "w"
    stats = counts.groupBy("doc_id").agg(
        F.sum(F.when(is_w, F.col("c"))).cast("long").alias("n_words"),
        F.count(F.when(is_w, 1)).cast("long").alias("n_distinct"),
        F.max(F.when(is_w, F.col("c"))).alias("top_word_c"),
        F.max(F.when(~is_w, F.col("c"))).alias("top_bigram_c"),
        F.sum(F.when(~is_w, F.col("c"))).cast("long").alias("n_bigrams"),
    )

    top_word_frac = F.col("top_word_c").cast("double") / F.col("n_words")
    top_bigram_frac = F.coalesce(F.col("top_bigram_c"), F.lit(0)).cast(
        "double"
    ) / F.greatest(F.coalesce(F.col("n_bigrams"), F.lit(0)), F.lit(1))
    return (
        stats
        .select(
            "doc_id",
            "n_words",
            F.round(F.col("n_distinct").cast("double") / F.col("n_words"), 6).alias(
                "distinct_ratio"
            ),
            F.round(top_word_frac, 6).alias("top_word_frac"),
            F.round(top_bigram_frac, 6).alias("top_bigram_frac"),
            ((top_word_frac > 0.10) | (top_bigram_frac > 0.08)).alias("is_repetitive"),
        )
    )


@register(
    "q_pii_scrub",
    oracle="""
    WITH d AS (
      SELECT doc_id,
             text || ' contact user' || doc_id ||
             '@mail.example or 555-01' || (doc_id % 90 + 10) AS pii_text
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(pii_text,
                '[A-Za-z0-9._]+@[A-Za-z0-9.]+')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(pii_text, '555-[0-9]+')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(pii_text,
                '[A-Za-z0-9._]+@[A-Za-z0-9.]+', '<EMAIL>', 'g'),
                '555-[0-9]+', '<PHONE>', 'g')) AS scrubbed_md5
    FROM d
    """,
    doc="PII scrubbing: regex redaction of emails/phone patterns with "
    "per-doc match counts and a digest of the scrubbed text (the corpus "
    "has no organic PII, so a deterministic synthetic injection makes "
    "the redaction verifiable end-to-end). Map-only regexp_replace — "
    "stays in codegen, no UDF.",
)
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pii_text = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example or 555-01"),
        (F.col("doc_id") % 90 + 10).cast("string"),
    )
    email = r"[A-Za-z0-9._]+@[A-Za-z0-9.]+"
    phone = r"555-[0-9]+"
    d = d.select("doc_id", pii_text.alias("pii_text"))
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("pii_text"), email, "<EMAIL>"), phone, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("pii_text", F.lit(email), 0)).cast("long").alias(
            "n_emails"
        ),
        F.size(F.regexp_extract_all("pii_text", F.lit(phone), 0)).cast("long").alias(
            "n_phones"
        ),
        F.md5(scrubbed.cast("binary")).alias("scrubbed_md5"),
    )


# Per-mille keep rates per language: up-weights the low-resource tail
# the way a training-mixture spec would.
_MIX_PERMILLE = {"en": 400, "de": 800, "fr": 900, "es": 900, "zh": 700}
_MIX_DEFAULT = 500
_KNUTH = 2654435761  # Knuth multiplicative hash constant
_M31 = 2147483648  # doc_id reduced mod 2^31 first: keeps the product in int64
_M32 = 4294967296


def _mix_case_sql() -> str:
    arms = " ".join(
        f"WHEN lang = '{k}' THEN {v}" for k, v in _MIX_PERMILLE.items()
    )
    return f"CASE {arms} ELSE {_MIX_DEFAULT} END"


@register(
    "q_mix_resample",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE (((doc_id % {_M31}) * {_KNUTH}) % {_M32}) % 1000 < {_mix_case_sql()}
    """,
    doc="Deterministic mixture resampling: per-language keep rates "
    "applied through a multiplicative-hash gate on doc_id — stateless, "
    "map-only, identical row set on any cluster size or re-run (unlike "
    "df.sample, whose output depends on partition layout).",
)
def q_mix_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    gate = (F.col("doc_id") % F.lit(_M31)) * F.lit(_KNUTH) % F.lit(_M32) % 1000
    rate = F.lit(_MIX_DEFAULT)
    for k, v in reversed(_MIX_PERMILLE.items()):
        rate = F.when(F.col("lang") == k, F.lit(v)).otherwise(rate)
    return d.where(gate < rate).select("doc_id", "lang", "source")


@register(
    "q_train_test_split",
    oracle="""
    WITH b AS (
      SELECT doc_id, lang, n_chars,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6)) AS BIGINT)
               % 100 AS bucket
      FROM documents
    )
    SELECT CASE WHEN bucket < 5 THEN 'test'
                WHEN bucket < 10 THEN 'val'
                ELSE 'train' END AS split,
           count(*)                    AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
    FROM b
    GROUP BY 1
    """,
    doc="Deterministic hash-based train/val/test split (95/5/5 via an "
    "md5 bucket of the stable doc id) with per-split corpus stats. "
    "Hash-gating beats df.randomSplit for pipelines: the assignment is "
    "a stateless map expression, reproducible on any cluster size, "
    "stable under re-runs and incremental appends — no seed plumbing, "
    "no shuffle; the only exchange is the 3-group aggregate.",
)
def q_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("bigint") % 100
    )
    split = (
        F.when(bucket < 5, "test").when(bucket < 10, "val").otherwise("train")
    )
    return (
        d.select(split.alias("split"), "n_chars", "lang")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
        )
    )


@register(
    "q_curation_pipeline",
    oracle=f"""
    WITH gated AS (
      SELECT doc_id, lang, n_chars, md5(lower(trim(text))) AS h
      FROM documents
      WHERE n_chars BETWEEN 80 AND 20000
    ),
    deduped AS (
      SELECT doc_id, lang, n_chars, h
      FROM (
        SELECT *, row_number() OVER (PARTITION BY h ORDER BY doc_id) AS rn
        FROM gated) s
      WHERE rn = 1
    ),
    bench AS (
      SELECT DISTINCT md5(lower(trim(text))) AS h
      FROM documents WHERE doc_id < 50
    )
    SELECT d.doc_id, d.lang, d.n_chars
    FROM deduped d
    WHERE d.h NOT IN (SELECT h FROM bench)
      AND (((d.doc_id % {_M31}) * {_KNUTH}) % {_M32}) % 1000 < 500
    """,
    doc="End-to-end curation pipeline (pipelines.curate): quality gate "
    "-> exact dedup (first survivor per content digest) -> benchmark "
    "decontamination (docs 0-49 as the held-out set) -> deterministic "
    "50% resample — composed as ONE Catalyst plan: map-only gates, a "
    "single digest-keyed shuffle, a broadcast anti-join; document "
    "bodies never shuffle at any stage.",
)
def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ella_spark.pipelines import curate

    d = load_table(spark, sf_dir, "documents")
    return curate(
        d,
        min_chars=80,
        max_chars=20_000,
        benchmark=d.where(F.col("doc_id") < 50),
        keep_permille=500,
    )
