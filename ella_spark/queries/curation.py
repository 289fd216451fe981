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

    # guard the start range: a bare sequence(1, size-1) DESCENDS to
    # [1, 0] on a one-token doc (Spark sequences run backwards when
    # stop < start) and element_at then throws on index 2/0 — the
    # same pitfall the n-gram starts in q_ngram_decontaminate guard
    # against (r14 fuzz; the oracle's range(1, n) is empty there)
    bigrams = F.expr(
        "CASE WHEN size(words) >= 2 THEN "
        "transform(sequence(1, size(words) - 1), "
        "i -> concat(element_at(words, i), ' ', element_at(words, i + 1))) "
        "ELSE array() END"
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


# ── Gopher-style quality rules ───────────────────────────────────────
# The rule set from the Gopher corpus pipeline (Rae et al. 2021,
# "Scaling Language Models", §A.1.1): word-count bounds, mean word
# length 3-10, symbol-to-word ratio, bullet/ellipsis line ratios, and
# a required minimum of common-stopword hits. All JVM expressions —
# one map-only pass, no shuffle, no UDF.

_GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


@register(
    "q_gopher_quality",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             text,
             regexp_split_to_array(lower(trim(text)), '\\s+') AS words,
             string_split(text, chr(10)) AS lines
      FROM documents WHERE length(trim(text)) > 0
    ), m AS (
      SELECT doc_id,
             CAST(len(words) AS BIGINT) AS n_words,
             round(CAST(list_sum(list_transform(words, w -> length(w))) AS DOUBLE)
                   / len(words), 6) AS mean_word_len,
             round((CAST(length(text) - length(replace(text, '#', '')) AS DOUBLE)
                    + (length(text) - length(replace(text, '...', ''))) / 3)
                   / len(words), 6) AS symbol_ratio,
             round(CAST(len(list_filter(lines,
                     l -> ltrim(l) LIKE '-%' OR ltrim(l) LIKE '*%')) AS DOUBLE)
                   / len(lines), 6) AS bullet_ratio,
             round(CAST(len(list_filter(lines, l -> rtrim(l) LIKE '%...')) AS DOUBLE)
                   / len(lines), 6) AS ellipsis_ratio,
             CAST(len(list_filter({_GOPHER_STOPWORDS!r},
                     s -> list_contains(words, s))) AS BIGINT) AS stopword_hits
      FROM d
    )
    SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
           ellipsis_ratio, stopword_hits,
           CAST(n_words BETWEEN 50 AND 100000 AS INT)            AS word_count_ok,
           CAST(mean_word_len BETWEEN 3 AND 10 AS INT)           AS mean_len_ok,
           CAST(symbol_ratio < 0.1 AS INT)                       AS symbol_ok,
           CAST(bullet_ratio < 0.9 AS INT)                       AS bullet_ok,
           CAST(ellipsis_ratio < 0.3 AS INT)                     AS ellipsis_ok,
           CAST(stopword_hits >= 2 AS INT)                       AS stopword_ok,
           CAST(n_words BETWEEN 50 AND 100000
                AND mean_word_len BETWEEN 3 AND 10
                AND symbol_ratio < 0.1 AND bullet_ratio < 0.9
                AND ellipsis_ratio < 0.3 AND stopword_hits >= 2 AS INT)
                                                                 AS gopher_pass
    FROM m
    """,
    doc="Gopher-rule quality filter (Rae et al. 2021 §A.1.1): word "
    "count 50-100k, mean word length 3-10, symbol-to-word ratio, "
    "bullet/ellipsis line ratios, >=2 common stopwords. Map-only JVM "
    "expressions; each rule is also emitted as a flag so downstream "
    "mixtures can re-weight instead of hard-dropping.",
)
def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim("text")) > 0
    )
    words = _words()
    lines = F.split(F.col("text"), "\n")
    n_words = F.size(words)
    sw = ", ".join(f"'{s}'" for s in _GOPHER_STOPWORDS)
    m = d.select(
        "doc_id",
        n_words.cast("bigint").alias("n_words"),
        F.round(
            F.aggregate(
                words, F.lit(0).cast("double"), lambda a, w: a + F.length(w)
            )
            / n_words,
            6,
        ).alias("mean_word_len"),
        F.round(
            (
                (F.length("text") - F.length(F.replace("text", F.lit("#"))))
                .cast("double")
                + (F.length("text") - F.length(F.replace("text", F.lit("..."))))
                / 3
            )
            / n_words,
            6,
        ).alias("symbol_ratio"),
        F.round(
            F.expr(
                "cast(size(filter(split(text, '\\n'), "
                "l -> ltrim(l) LIKE '-%' OR ltrim(l) LIKE '*%')) as double)"
            )
            / F.size(lines),
            6,
        ).alias("bullet_ratio"),
        F.round(
            F.expr(
                "cast(size(filter(split(text, '\\n'), "
                "l -> rtrim(l) LIKE '%...')) as double)"
            )
            / F.size(lines),
            6,
        ).alias("ellipsis_ratio"),
        F.expr(
            f"cast(size(filter(array({sw}), "
            f"s -> array_contains(split(lower(trim(text)), '\\\\s+'), s))) as bigint)"
        ).alias("stopword_hits"),
    )
    ok = lambda c: c.cast("int")
    word_ok = F.col("n_words").between(50, 100000)
    len_ok = F.col("mean_word_len").between(3, 10)
    sym_ok = F.col("symbol_ratio") < 0.1
    bul_ok = F.col("bullet_ratio") < 0.9
    ell_ok = F.col("ellipsis_ratio") < 0.3
    stop_ok = F.col("stopword_hits") >= 2
    return m.select(
        "*",
        ok(word_ok).alias("word_count_ok"),
        ok(len_ok).alias("mean_len_ok"),
        ok(sym_ok).alias("symbol_ok"),
        ok(bul_ok).alias("bullet_ok"),
        ok(ell_ok).alias("ellipsis_ok"),
        ok(stop_ok).alias("stopword_ok"),
        ok(
            word_ok & len_ok & sym_ok & bul_ok & ell_ok & stop_ok
        ).alias("gopher_pass"),
    )


# ── DSIR-style importance weights ────────────────────────────────────
# Hashed n-gram importance resampling (Xie et al. 2023, "Data Selection
# for Language Models via Importance Resampling"): features are hashed
# word unigrams in B buckets; a document's weight is the sum over its
# tokens of log(p_target / p_raw) with add-1 smoothing. Target here =
# the English slice (stand-in for any curated target domain).

_DSIR_BUCKETS = 64


@register(
    "q_importance_weights",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, lang,
             CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT) % {_DSIR_BUCKETS} AS b
      FROM documents,
           unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t(w)
      WHERE length(trim(text)) > 0 AND length(w) > 0
    ), raw AS (
      SELECT b, count(*) AS cnt_r FROM tok GROUP BY b
    ), tgt AS (
      SELECT b, count(*) AS cnt_t FROM tok WHERE lang = 'en' GROUP BY b
    ), totals AS (
      SELECT (SELECT count(*) FROM tok) AS n_r,
             (SELECT count(*) FROM tok WHERE lang = 'en') AS n_t
    ), ratio AS (
      SELECT r.b,
             ln((coalesce(t.cnt_t, 0) + 1.0) / (totals.n_t + {_DSIR_BUCKETS}))
           - ln((r.cnt_r + 1.0) / (totals.n_r + {_DSIR_BUCKETS})) AS log_ratio
      FROM raw r LEFT JOIN tgt t ON r.b = t.b, totals
    ), db AS (
      SELECT doc_id, b, count(*) AS n FROM tok GROUP BY doc_id, b
    )
    SELECT db.doc_id,
           CAST(sum(db.n) AS BIGINT)              AS n_tokens,
           round(sum(db.n * ratio.log_ratio), 6)  AS log_weight
    FROM db JOIN ratio ON db.b = ratio.b
    GROUP BY db.doc_id
    """,
    doc="DSIR-style importance weights (Xie et al. 2023): hashed word "
    "unigrams in 64 buckets, per-doc sum of token-count x "
    "log(p_target/p_raw) with add-1 smoothing; target = the English "
    "slice. Scale shape: the shuffle carries (doc_id, bucket, count) "
    "triples; the 64-row bucket-ratio table broadcasts; bodies never "
    "move.",
)
def q_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    B = _DSIR_BUCKETS
    d = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim("text")) > 0
    )
    tok = (
        d.select("doc_id", "lang", F.explode(_words()).alias("w"))
        .where(F.length("w") > 0)
        .withColumn(
            "b",
            F.conv(F.substring(F.md5(F.col("w").cast("binary")), 1, 8), 16, 10)
            .cast("long")
            % B,
        )
        .drop("w")
    )
    # ONE pass over the exploded token stream: aggregate straight to
    # (doc_id, lang, b) counts and cut — the bucket marginals, the
    # scalar totals AND the per-doc vector are all re-aggregations of
    # this bounded <= docs x B frame (lang is doc-level, so the
    # grouping refines (doc_id, b) without changing any count). The
    # previous form fanned the raw token stream out to four
    # consumers, and each re-embedded the scan + explode + md5 over
    # the whole corpus — four token-stream passes at any scale (r14).
    db0 = (
        tok.groupBy("doc_id", "lang", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    raw = db0.groupBy("b").agg(F.sum("n").alias("cnt_r"))
    tgt = (
        db0.where(F.col("lang") == "en")
        .groupBy("b")
        .agg(F.sum("n").alias("cnt_t"))
    )
    # scalar totals ride along as 1-row broadcast aggregates (never a
    # separate .count() job against the token stream)
    totals = db0.agg(
        F.sum("n").alias("n_r"),
        # coalesce: an all-non-target corpus must yield 0 (as the
        # previous count() form did), not NULL
        F.coalesce(
            F.sum(F.when(F.col("lang") == "en", F.col("n"))), F.lit(0)
        ).alias("n_t"),
    )
    ratio = (
        raw.join(tgt, "b", "left")
        .na.fill({"cnt_t": 0})
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            (
                F.log((F.col("cnt_t") + 1.0) / (F.col("n_t") + B))
                - F.log((F.col("cnt_r") + 1.0) / (F.col("n_r") + B))
            ).alias("log_ratio"),
        )
    )
    db = db0.select("doc_id", "b", "n")
    return (
        db.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("n").cast("bigint").alias("n_tokens"),
            F.round(F.sum(F.col("n") * F.col("log_ratio")), 6).alias("log_weight"),
        )
    )


# ── per-source document caps (RefinedWeb-style domain caps) ──────────

_SOURCE_CAP = 10


@register(
    "q_source_caps",
    oracle=f"""
    SELECT doc_id, source, qrank
    FROM (
      SELECT doc_id, source,
             row_number() OVER (
               PARTITION BY source
               ORDER BY n_chars DESC, doc_id) AS qrank
      FROM documents)
    WHERE qrank <= {_SOURCE_CAP}
    """,
    doc=f"Per-source document caps (the RefinedWeb/C4 anti-domination "
    f"rule): keep at most {_SOURCE_CAP} docs per source, best quality "
    "first (n_chars as the quality proxy, doc_id tie-break). One "
    "window shuffle keyed by source; Spark's rank-limit pushes the "
    "top-k into partial sorts per partition — no global sort at any "
    "corpus size.",
)
def q_source_caps(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        d.withColumn("qrank", F.row_number().over(w))
        .where(F.col("qrank") <= _SOURCE_CAP)
        .select("doc_id", "source", "qrank")
    )


# ── temperature-based mixture resampling ─────────────────────────────
# Multilingual-LM mixture recipe (e.g. mT5): sampling probability per
# language ∝ p_lang^alpha flattens the head and boosts the tail. The
# per-language keep rate r_l = min(1, (p_l^alpha / Σ p^alpha) /
# (p_l / Σ p) · scale) applies through the same deterministic
# doc_id hash gate as q_mix_resample — stateless, reproducible on any
# cluster size, no RNG state.

_TEMP_ALPHA = 0.5


@register(
    "q_temperature_resample",
    oracle=f"""
    WITH stats AS (
      SELECT lang, count(*) AS n FROM documents GROUP BY lang
    ), tot AS (
      SELECT sum(n) AS total, sum(pow(n, {_TEMP_ALPHA})) AS total_a
      FROM stats
    ), rates AS (
      SELECT s.lang,
             least(1.0,
               (pow(s.n, {_TEMP_ALPHA}) / t.total_a)
               / (CAST(s.n AS DOUBLE) / t.total)) AS keep_rate
      FROM stats s, tot t
    )
    SELECT d.doc_id, d.lang, round(r.keep_rate, 6) AS keep_rate
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE (((d.doc_id % {_M31}) * {_KNUTH}) % {_M32}) % 1000000
          < CAST(round(r.keep_rate * 1000000) AS BIGINT)
    """,
    doc=f"Temperature-based mixture resampling (alpha={_TEMP_ALPHA}, "
    "the multilingual-LM recipe): per-language keep rate derived from "
    "corpus counts so sampling probability tracks p^alpha — flattens "
    "dominant languages, boosts the tail. Rates come from a tiny "
    "per-lang aggregate (broadcast); the gate is the deterministic "
    "multiplicative hash on doc_id — map-only, reproducible across "
    "runs and cluster sizes.",
)
def q_temperature_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # O(langs) frame feeds two consumers (totals + per-lang rates):
    # cut it so neither replays the corpus scan (r14, the
    # q_cramers_v idiom)
    stats = (
        d.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).localCheckpoint(eager=False)
    )
    tot = stats.agg(
        F.sum("n").alias("total"),
        F.sum(F.pow("n", F.lit(_TEMP_ALPHA))).alias("total_a"),
    )
    rates = (
        stats.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.least(
                F.lit(1.0),
                (F.pow("n", F.lit(_TEMP_ALPHA)) / F.col("total_a"))
                / (F.col("n").cast("double") / F.col("total")),
            ).alias("keep_rate"),
        )
    )
    gate = (
        ((F.col("doc_id") % _M31) * _KNUTH) % _M32
    ) % 1_000_000
    return (
        d.join(F.broadcast(rates), "lang")
        .where(
            gate
            < F.round(F.col("keep_rate") * 1_000_000).cast("bigint")
        )
        .select("doc_id", "lang", F.round("keep_rate", 6).alias("keep_rate"))
    )


# ── deterministic training-shard assignment ──────────────────────────

_N_SHARDS = 16


@register(
    "q_shard_assignment",
    oracle=f"""
    WITH placed AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
               % {_N_SHARDS} AS shard,
             CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 9, 8)) AS BIGINT)
               AS pos_key
      FROM documents)
    SELECT doc_id, shard,
           CAST(row_number() OVER (
             PARTITION BY shard ORDER BY pos_key, doc_id) AS BIGINT)
             AS position
    FROM placed
    """,
    doc=f"Deterministic global shuffle into {_N_SHARDS} training "
    "shards: shard = hash-bucket of doc_id, within-shard position = "
    "rank of an independent hash slice — a reproducible full-corpus "
    "permutation (the write-training-shards shape) with no RNG state. "
    "At scale this is one hash-partitioned window; each shard sorts "
    "independently, and the physical write is "
    "df.repartition(shard).sortWithinPartitions(pos).",
)
def q_shard_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string").cast("binary"))
    placed = d.select(
        "doc_id",
        (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % _N_SHARDS).alias(
            "shard"
        ),
        F.conv(F.substring(h, 9, 8), 16, 10).cast("bigint").alias("pos_key"),
    )
    w = Window.partitionBy("shard").orderBy("pos_key", "doc_id")
    return placed.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("bigint").alias("position"),
    )


# ── linear quality classifier (fasttext-style) ───────────────────────
# The standard web-corpus quality filter is a linear classifier over
# hashed token features (fastText recipe: high-quality reference text
# vs raw crawl). Training is a bounded DRIVER-side artifact — here a
# deterministic full-batch logistic regression over the corpus's
# hashed-unigram bucket frequencies (the English slice stands in for
# the high-quality class, as in q_importance_weights) — and the pinned
# weights make distributed scoring a map-only pass that the DuckDB
# oracle replays exactly.

_CLF_BUCKETS = 64
_CLF_CACHE: dict = {}


_CLF_TRAIN_SAMPLE = 4096


def _clf_weights(sf_dir: str):
    """(bias, weights[64]) — deterministic training artifact over a
    BOUNDED sample (first ``_CLF_TRAIN_SAMPLE`` docs by id, the same
    bounded-driver-artifact recipe as the IVF centroids): training
    cost is independent of corpus size."""
    import os

    import numpy as np

    key = os.path.abspath(sf_dir)
    got = _CLF_CACHE.get(key)
    if got is None:
        import duckdb

        con = duckdb.connect()
        # Spark-written tables are DIRECTORIES of part files (e.g. the
        # 10x scale-probe corpus, tools/scale_probe.py); DuckDB's
        # read_parquet needs a glob there, unlike pyarrow's read_table
        # (corpus_unigram_lm). ORDER BY doc_id LIMIT N keeps the
        # training sample deterministic under any file split.
        path = os.path.join(sf_dir, "documents.parquet")
        if os.path.isdir(path):
            path = os.path.join(path, "*.parquet")
        # per-doc bucket frequencies with the SAME md5-bucket transform
        # the scorer uses (training/serving feature parity)
        rows = con.execute(f"""
            WITH tok AS (
              SELECT doc_id, lang,
                     CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT)
                       % {_CLF_BUCKETS} AS b
              FROM (
                SELECT doc_id, lang, text
                FROM read_parquet('{path}')
                ORDER BY doc_id LIMIT {_CLF_TRAIN_SAMPLE}
              ),
                   unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t(w)
              WHERE length(trim(text)) > 0 AND length(w) > 0
            )
            SELECT doc_id,
                   -- a NULL lang is NOT the target class: without the
                   -- coalesce the label comes back NULL -> numpy nan
                   -- -> NaN weights -> 'nan' literals in the pinned
                   -- oracle SQL (r14 fuzz, nullkeys)
                   max(CAST(coalesce(lang = 'en', FALSE) AS INT)) AS y,
                   count(*) AS n,
                   list(b ORDER BY b) AS bs
            FROM tok GROUP BY doc_id ORDER BY doc_id
        """).fetchall()
        X = np.zeros((len(rows), _CLF_BUCKETS))
        y = np.zeros(len(rows))
        for i, (_, yy, n, bs) in enumerate(rows):
            for b in bs:
                X[i, b] += 1.0
            # bucket share x B: O(1)-scale features so full-batch GD
            # converges in a few hundred steps (raw 1/n shares are
            # ~0.015 and underfit to the class prior)
            X[i] *= _CLF_BUCKETS / n
            y[i] = yy
        w = np.zeros(_CLF_BUCKETS)
        bias = 0.0
        # lr/iters chosen for CONVERGENCE (mean p ~ class prior): the
        # synthetic corpus shares one ~31-word vocabulary across all
        # languages, so unigram separability is inherently weak — the
        # op pins the production MECHANISM (train-once weights,
        # map-shaped scoring, oracle parity), not benchmark accuracy.
        lr = 0.02
        for _ in range(5000):  # full-batch GD: deterministic
            z = X @ w + bias
            p = 1.0 / (1.0 + np.exp(-z))
            g = p - y
            w -= lr * (X.T @ g) / len(rows)
            bias -= lr * float(g.mean())
        # fold the feature scale into the pinned weights so the scorer
        # stays sum(n_b * w_b) / n
        got = _CLF_CACHE[key] = (float(bias), w * _CLF_BUCKETS)
    return got


def _clf_oracle() -> str | None:
    import os

    try:
        bias, w = _clf_weights(
            os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
        )
    except Exception:
        return None
    wlit = "[" + ", ".join(repr(float(x)) for x in w) + "]"
    return f"""
    WITH tok AS (
      SELECT doc_id,
             CAST(('0x' || substr(md5(w), 1, 8)) AS BIGINT)
               % {_CLF_BUCKETS} AS b
      FROM documents,
           unnest(regexp_split_to_array(lower(trim(text)), '\\s+')) AS t(w)
      WHERE length(trim(text)) > 0 AND length(w) > 0
    ), db AS (
      SELECT doc_id, b, count(*) AS n FROM tok GROUP BY doc_id, b
    ), z AS (
      SELECT doc_id,
             {bias!r} + sum(n * ({wlit})[CAST(b + 1 AS INTEGER)])
                        / sum(n) AS logit
      FROM db GROUP BY doc_id
    )
    SELECT doc_id,
           round(logit, 6) AS logit,
           round(1.0 / (1.0 + exp(-logit)), 6) AS p_quality,
           CAST(round(logit, 6) > 0 AS INT) AS keep
    FROM z
    """


@register(
    "q_quality_classifier",
    oracle=_clf_oracle(),
    doc="Linear quality classifier over hashed unigram buckets "
    "(fastText-recipe web filter): weights are a deterministic "
    "train-once driver artifact (full-batch logistic regression, "
    "English slice as the quality class), pinned into the DuckDB "
    "oracle as literals. Scoring shuffles (doc_id, bucket, count) "
    "triples and broadcasts the 64-weight table — map-shaped at any "
    "corpus size, like every quality gate in the curation chain.",
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    bias, w = _clf_weights(sf_dir)
    B = _CLF_BUCKETS
    d = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim("text")) > 0
    )
    tok = (
        d.select("doc_id", F.explode(_words()).alias("w"))
        .where(F.length("w") > 0)
        .withColumn(
            "b",
            F.conv(F.substring(F.md5(F.col("w").cast("binary")), 1, 8), 16, 10)
            .cast("long")
            % B,
        )
        .drop("w")
    )
    db = tok.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("n"))
    weights = F.broadcast(
        spark.createDataFrame(
            [(i, float(x)) for i, x in enumerate(w)], "b long, wt double"
        )
    )
    logit = F.lit(bias) + F.sum(F.col("n") * F.col("wt")) / F.sum("n")
    return (
        db.join(weights, "b")
        .groupBy("doc_id")
        .agg(logit.alias("_logit"))
        .select(
            "doc_id",
            F.round("_logit", 6).alias("logit"),
            F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("_logit"))), 6
            ).alias("p_quality"),
            (F.round("_logit", 6) > 0).cast("int").alias("keep"),
        )
    )


def _ccnet_oracle() -> str | None:
    """DuckDB replay of the CCNet tiering: the pinned unigram-LM
    literals (same artifact as q_lm_perplexity) score every doc, then
    per-language perplexity terciles split head/middle/tail."""
    import os

    from ella_spark.queries.textops import corpus_unigram_lm

    try:
        vocab, oov = corpus_unigram_lm(
            os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
        )
    except (OSError, FileNotFoundError):
        return None

    from ella_spark.queries import sql_quote as _sq

    rows = ", ".join(f"({_sq(tok)}, {lp!r})" for tok, lp in vocab)
    return f"""
    WITH vocab AS (SELECT * FROM (VALUES {rows}) AS t(tok, logp)),
    toks AS (
      SELECT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
      FROM documents),
    scored AS (
      SELECT t.doc_id, coalesce(v.logp, {oov!r}) AS lp
      FROM toks t LEFT JOIN vocab v ON v.tok = t.tok
      WHERE t.tok != ''),
    ppl AS (
      SELECT doc_id, round(exp(-avg(lp)), 4) AS perplexity
      FROM scored GROUP BY doc_id),
    tiered AS (
      SELECT d.doc_id, d.lang, p.perplexity,
             ntile(3) OVER (
               PARTITION BY d.lang
               ORDER BY p.perplexity, d.doc_id) AS nt
      FROM documents d JOIN ppl p ON p.doc_id = d.doc_id)
    SELECT doc_id, lang, perplexity,
           CASE nt WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                   ELSE 'tail' END AS tier
    FROM tiered
    """


@register(
    "q_ccnet_buckets",
    oracle=_ccnet_oracle(),
    doc="CCNet head/middle/tail tiering (Wenzek et al. 2020): every "
    "document scored by the pinned unigram-LM perplexity (the "
    "q_lm_perplexity artifact), then split into per-LANGUAGE "
    "perplexity terciles — head = most-fluent third, the slice CCNet "
    "keeps for pretraining. Plan shape: the LM scoring shuffle "
    "carries O(docs) after map-side combine; the tiering is one "
    "window per language partition ordered by the ROUNDED perplexity "
    "(deterministic cross-engine) with doc_id tiebreak.",
)
def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ella_spark.queries.textops import corpus_unigram_lm

    vocab, oov = corpus_unigram_lm(sf_dir)
    vdf = F.broadcast(
        spark.createDataFrame(vocab, "tok string, logp double")
    )
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    ppl = (
        toks.join(vdf, "tok", "left")
        .select("doc_id", F.coalesce("logp", F.lit(oov)).alias("lp"))
        .groupBy("doc_id")
        .agg(F.round(F.exp(-F.avg("lp")), 4).alias("perplexity"))
    )
    w = Window.partitionBy("lang").orderBy("perplexity", "doc_id")
    return (
        d.select("doc_id", "lang")
        .join(ppl, "doc_id")
        .withColumn("nt", F.ntile(3).over(w))
        .select(
            "doc_id",
            "lang",
            "perplexity",
            F.when(F.col("nt") == 1, "head")
            .when(F.col("nt") == 2, "middle")
            .otherwise("tail")
            .alias("tier"),
        )
    )


# ── weighted sampling without replacement (priority sampling) ────────


@register(
    "q_weighted_sample",
    oracle="""
    WITH pri AS (
      SELECT doc_id, source, n_chars,
             CAST((doc_id * 2654435761) % 1000003 AS DOUBLE)
               / n_chars AS priority
      FROM documents
      WHERE n_chars > 0)
    SELECT doc_id, source, n_chars, round(priority, 6) AS priority
    FROM pri
    ORDER BY priority, doc_id
    LIMIT 50
    """,
    doc="Weighted sampling WITHOUT replacement (Duffield-Lund-Thorup "
    "priority sampling): inclusion odds proportional to document "
    "weight (n_chars), via the k smallest hash/weight priorities. The "
    "uniform draw is a deterministic multiplicative hash (Knuth "
    "constant, int64-exact in both engines) so — unlike rand()-keyed "
    "A-ES — the sample is reproducible and the oracle replays it "
    "exactly: one int64 hash + one correctly-rounded double division "
    "per row, then a global top-k. At scale: map-only scoring + "
    "TakeOrderedAndProject (per-partition partial top-k, single "
    "O(k) driver merge — no full sort, no shuffle of the corpus).",
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pri = (
        (F.col("doc_id") * F.lit(2654435761)) % F.lit(1000003)
    ).cast("double") / F.col("n_chars")
    return (
        docs.where(F.col("n_chars") > 0)
        .select(
            "doc_id",
            "source",
            "n_chars",
            pri.alias("_p"),
        )
        .orderBy("_p", "doc_id")
        .limit(50)
        .select(
            "doc_id", "source", "n_chars", F.round("_p", 6).alias("priority")
        )
    )


@register(
    "q_weighted_median",
    oracle="""
    WITH w AS (
      SELECT lang, n_chars,
             CAST(n_chars AS DOUBLE) AS wt
      FROM documents WHERE n_chars > 0),
    c AS (
      SELECT lang, n_chars, wt,
             sum(wt) OVER (PARTITION BY lang
                           ORDER BY n_chars, wt
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS cw,
             sum(wt) OVER (PARTITION BY lang) AS tw
      FROM w)
    SELECT lang, min(n_chars) AS wmedian
    FROM c
    WHERE cw >= tw / 2
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Exact WEIGHTED median per group (weight = n_chars — the "
    "'median document length weighted by mass' curation statistic): "
    "cumulative-weight window over the sorted values, first value "
    "whose running weight reaches half the total. Integer weights "
    "summed in a fixed window order keep the comparison exact and "
    "deterministic cross-engine. One shuffle on the group key; the "
    "window sort is per-group.",
)
def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = docs.where(F.col("n_chars") > 0).select(
        "lang", "n_chars", F.col("n_chars").cast("double").alias("wt")
    )
    win = (
        Window.partitionBy("lang")
        .orderBy("n_chars", "wt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy("lang")
    c = w.select(
        "lang",
        "n_chars",
        F.sum("wt").over(win).alias("cw"),
        F.sum("wt").over(tot).alias("tw"),
    )
    return (
        c.where(F.col("cw") >= F.col("tw") / 2)
        .groupBy("lang")
        .agg(F.min("n_chars").alias("wmedian"))
        .orderBy("lang")
    )


@register(
    "q_gini_concentration",
    oracle="""
    WITH r AS (
      SELECT lang, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_chars, doc_id) AS i
      FROM documents WHERE n_chars > 0),
    a AS (
      SELECT lang, count(*) AS n,
             sum(n_chars) AS tot,
             sum(i * n_chars) AS iw
      FROM r GROUP BY lang)
    SELECT lang, n,
           round(CAST(2 * iw AS DOUBLE) / (CAST(n AS DOUBLE) * tot)
                 - CAST(n + 1 AS DOUBLE) / n, 6) AS gini
    FROM a
    ORDER BY lang
    """,
    doc="Gini coefficient of document mass per language — the "
    "concentration diagnostic ('is this slice dominated by a few "
    "huge documents?') corpus-curation dashboards track per source. "
    "Computed from the sorted-rank identity G = 2*Σ(i*x_i)/(n*Σx) - "
    "(n+1)/n: every sum is EXACT int64 (ranks deterministic via a "
    "(value, doc_id) tie-break), so only the final two double "
    "divisions touch floats — identical IEEE ops cross-engine. One "
    "shuffle on the group key; the rank sort is per-group.",
)
def q_gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars", "doc_id")
    r = (
        docs.where(F.col("n_chars") > 0)
        .select("lang", "n_chars", F.row_number().over(w).alias("i"))
    )
    a = r.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("tot"),
        F.sum(F.col("i") * F.col("n_chars")).alias("iw"),
    )
    return a.select(
        "lang",
        "n",
        F.round(
            (F.lit(2) * F.col("iw")).cast("double")
            / (F.col("n").cast("double") * F.col("tot"))
            - (F.col("n") + 1).cast("double") / F.col("n"),
            6,
        ).alias("gini"),
    ).orderBy("lang")


@register(
    "q_pareto_cut",
    oracle="""
    WITH src AS (
      SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS src_chars
      FROM documents GROUP BY lang, source),
    tot AS (
      SELECT lang, source, src_chars,
             CAST(sum(src_chars) OVER (PARTITION BY lang) AS BIGINT)
               AS total_chars,
             CAST(sum(src_chars) OVER (PARTITION BY lang
               ORDER BY src_chars DESC, source
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum_chars
      FROM src)
    SELECT lang, source, src_chars, cum_chars
    FROM tot
    WHERE (cum_chars - src_chars) * 10 < total_chars * 9
    """,
    doc="Pareto coverage cut per language: the smallest prefix of "
    "sources (largest first) whose cumulative characters reach 90% "
    "of the stratum — 'which sources do we actually need'. The "
    "90% test is pure int64 ((cum-src)*10 < total*9): exact on any "
    "engine, no double division. Both windows and the final filter "
    "share ONE lang partitioning; the windowed frame is "
    "O(sources-per-lang), tiny at any corpus size.",
)
def q_pareto_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    src = d.groupBy("lang", "source").agg(
        F.sum("n_chars").alias("src_chars")
    )
    w_tot = Window.partitionBy("lang")
    w_cum = (
        Window.partitionBy("lang")
        .orderBy(F.col("src_chars").desc(), "source")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = src.withColumns(
        {
            "total_chars": F.sum("src_chars").over(w_tot),
            "cum_chars": F.sum("src_chars").over(w_cum),
        }
    )
    return tot.where(
        (F.col("cum_chars") - F.col("src_chars")) * 10
        < F.col("total_chars") * 9
    ).select("lang", "source", "src_chars", "cum_chars")


@register(
    "q_winsorize",
    oracle="""
    WITH e AS (
      SELECT event_id, event_type, value,
             row_number() OVER (
               PARTITION BY event_type ORDER BY value, event_id) AS rn,
             count(*) OVER (PARTITION BY event_type) AS n
      FROM events
      WHERE value IS NOT NULL),
    b AS (
      SELECT *,
             max(CASE WHEN rn <= CAST(ceil(n * 0.05) AS BIGINT)
                 THEN value END) OVER (PARTITION BY event_type) AS p05,
             min(CASE WHEN rn > n - CAST(ceil(n * 0.05) AS BIGINT)
                 THEN value END) OVER (PARTITION BY event_type) AS p95
      FROM e)
    SELECT event_id, event_type,
           CASE WHEN value < p05 THEN p05
                WHEN value > p95 THEN p95
                ELSE value END AS v_clipped,
           CAST(value < p05 OR value > p95 AS BOOLEAN) AS clipped
    FROM b
    WHERE clipped
    ORDER BY event_type, event_id
    """,
    doc="Winsorization: per-group 5%/95% EXACT order-statistic clip "
    "(the outlier-capping transform run before normalization in a "
    "feature/curation pipeline — the order-stat TRANSFORM counterpart "
    "of q_percentile_exact's aggregate). Deterministic ties via "
    "(value, event_id) ordering; thresholds as windowed max/min over "
    "the rank prefix/suffix so BOTH window layers share the ONE "
    "event_type partitioning — a single shuffle end-to-end. Only "
    "clipped rows are returned (the exception report; at 100 TB the "
    "full clipped output would be written, not compared). Every "
    "returned value is an input value verbatim — no float arithmetic "
    "— so the DuckDB oracle hash-matches exactly.",
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # order statistics are over MEASURED values only: without the
    # mirrored filter, NULLs rank into the 5% prefix on Spark
    # (nulls-first ascending) but into the suffix on DuckDB
    # (nulls-last), shifting both clip thresholds (r14 fuzz)
    ev = load_table(spark, sf_dir, "events").where(
        F.col("value").isNotNull()
    )
    wp = Window.partitionBy("event_type")
    w_rn = wp.orderBy("value", "event_id")
    e = ev.select(
        "event_id",
        "event_type",
        "value",
        F.row_number().over(w_rn).alias("rn"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    lo_cut = F.ceil(F.col("n") * 0.05).cast("long")
    b = e.withColumns(
        {
            "p05": F.max(
                F.when(F.col("rn") <= lo_cut, F.col("value"))
            ).over(wp),
            "p95": F.min(
                F.when(F.col("rn") > F.col("n") - lo_cut, F.col("value"))
            ).over(wp),
        }
    )
    clipped = (F.col("value") < F.col("p05")) | (F.col("value") > F.col("p95"))
    return (
        b.select(
            "event_id",
            "event_type",
            F.when(F.col("value") < F.col("p05"), F.col("p05"))
            .when(F.col("value") > F.col("p95"), F.col("p95"))
            .otherwise(F.col("value"))
            .alias("v_clipped"),
            clipped.alias("clipped"),
        )
        .where(F.col("clipped"))
        .orderBy("event_type", "event_id")
    )


_NEYMAN_BUDGET = 10000


@register(
    "q_neyman_allocation",
    oracle=f"""
    WITH c AS (
      SELECT event_type, CAST(floor(value * 100 + 0.5) AS BIGINT) AS vc
      FROM events),
    g AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_h,
             CAST(sum(vc) AS BIGINT) AS s,
             CAST(sum(vc * vc) AS BIGINT) AS sq
      FROM c GROUP BY event_type),
    sd AS (
      SELECT event_type, n_h,
             sqrt(greatest(CAST(n_h AS DOUBLE) * sq
                           - CAST(s AS DOUBLE) * s, 0.0)
                  / (10000.0 * n_h * (n_h - 1))) AS s_h
      FROM g WHERE n_h >= 2),
    w AS (
      SELECT event_type, n_h, s_h, n_h * s_h AS w_h,
             sum(n_h * s_h) OVER () AS w_tot
      FROM sd)
    SELECT event_type, n_h,
           round(s_h, 6) AS s_h,
           round(w_h / w_tot, 6) AS alloc_share,
           round({_NEYMAN_BUDGET} * w_h / w_tot, 2) AS alloc_n
    FROM w
    ORDER BY event_type
    """,
    doc="Neyman-optimal sample allocation across strata (event types): "
    "n_h proportional to N_h*S_h — how to split a labeling/eval budget "
    "so the stratified estimator's variance is minimal (Neyman 1934; "
    "the budget-allocation step of every eval-set construction). "
    "Per-stratum n/sum/sum-of-squares accumulate as EXACT int64 "
    "centi-units (one groupBy shuffle), then n_h*sq and s*s are "
    "computed in DOUBLE — in int64 those products overflow for "
    "strata past ~2^63 centi-units² (a real 100 TB stratum), and "
    "Spark's non-ANSI bigint would wrap SILENTLY where DuckDB "
    "raises; shares only need ~15 significant digits, and both "
    "engines round the identical int64 inputs through identical "
    "IEEE multiplies, so hash parity is preserved. The share "
    "denominator is a window-sum over the ≤ |strata|-row aggregated "
    "frame. round(6/2) absorbs the final double ulps. 100 TB: one "
    "scan, one keyed shuffle, O(strata) rows after.",
)
def q_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    c = ev.select(
        "event_type",
        F.floor(F.col("value") * 100 + 0.5).cast("bigint").alias("vc"),
    )
    g = c.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_h"),
        F.sum("vc").alias("s"),
        F.sum(F.col("vc") * F.col("vc")).alias("sq"),
    )
    n_h, s, sq = F.col("n_h"), F.col("s"), F.col("sq")
    # products in DOUBLE: int64 n_h*sq wraps silently (non-ANSI) at
    # 100 TB stratum sizes; double loses only sub-1e-15 relative
    # precision, identical rounding on both engines (see oracle doc).
    # greatest(0, ...) clamps the numerator: for near-zero-variance
    # large strata the rounded double difference can dip NEGATIVE
    # (exact value >= 0 always), where Spark's sqrt returns NaN
    # silently but DuckDB raises — the same loud/silent divergence
    # the double cast exists to avoid.
    sd = g.where(n_h >= 2).select(
        "event_type",
        "n_h",
        F.sqrt(
            F.greatest(
                n_h.cast("double") * sq - s.cast("double") * s, F.lit(0.0)
            )
            / (F.lit(10000.0) * n_h * (n_h - 1))
        ).alias("s_h"),
    )
    w_h = F.col("n_h") * F.col("s_h")
    w = sd.withColumns(
        {"w_h": w_h, "w_tot": F.sum(w_h).over(Window.partitionBy())}
    )
    return w.select(
        "event_type",
        "n_h",
        F.round("s_h", 6).alias("s_h"),
        F.round(F.col("w_h") / F.col("w_tot"), 6).alias("alloc_share"),
        F.round(F.lit(_NEYMAN_BUDGET) * F.col("w_h") / F.col("w_tot"), 2).alias(
            "alloc_n"
        ),
    ).orderBy("event_type")


_HILL_K = 50


@register(
    "q_hill_tail_index",
    oracle=f"""
    WITH r AS (
      SELECT lang, n_chars,
             row_number() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id) AS rn
      FROM documents WHERE n_chars > 0),
    x1 AS (SELECT lang, n_chars AS xk1 FROM r WHERE rn = {_HILL_K + 1})
    SELECT r.lang,
           CAST(count(*) AS BIGINT) AS k,
           round(sum(ln(CAST(r.n_chars AS DOUBLE) / x1.xk1))
                 / count(*), 6) AS hill,
           round(count(*) / sum(ln(CAST(r.n_chars AS DOUBLE) / x1.xk1)),
                 6) AS tail_index
    FROM r JOIN x1 ON x1.lang = r.lang
    WHERE r.rn <= {_HILL_K}
    GROUP BY r.lang
    HAVING sum(ln(CAST(r.n_chars AS DOUBLE) / x1.xk1)) > 0
    ORDER BY r.lang
    """,
    doc=f"Hill tail-index estimator per language over document sizes "
    f"(top-{_HILL_K} order statistics vs the {_HILL_K + 1}-th): "
    "alpha = k / sum(ln(x_i/x_k+1)) — 'how heavy is this slice's "
    "big-document tail', the partition-planning diagnostic that "
    "says whether a slice's byte mass is dominated by outliers "
    "(alpha < 2 ⇒ infinite variance: cap or split before sharding). "
    "Deterministic (size DESC, doc_id) ranks feed identical exact "
    "integers to ln on both engines; one lang-keyed shuffle, the "
    "rank filter is WindowGroupLimit-able, and the estimator runs "
    "on k rows per lang. Languages with <= k documents are excluded "
    "by construction (no x_k+1).",
)
def q_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.col("n_chars").desc(), "doc_id")
    r = (
        docs.where(F.col("n_chars") > 0)
        .select("lang", "n_chars", F.row_number().over(w).alias("rn"))
        .where(F.col("rn") <= _HILL_K + 1)
    )
    x1 = r.where(F.col("rn") == _HILL_K + 1).select(
        "lang", F.col("n_chars").alias("xk1")
    )
    top = r.where(F.col("rn") <= _HILL_K)
    lnsum = F.sum(F.log(F.col("n_chars").cast("double") / F.col("xk1")))
    return (
        top.join(x1, "lang")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("k"),
            lnsum.alias("_s"),
        )
        .where(F.col("_s") > 0)  # matches the oracle's HAVING (unrounded)
        .select(
            "lang",
            "k",
            F.round(F.col("_s") / F.col("k"), 6).alias("hill"),
            F.round(F.col("k") / F.col("_s"), 6).alias("tail_index"),
        )
        .orderBy("lang")
    )
