"""Text analysis operators for training-data pipelines.

Beyond the reference (which has no text ops): language-ID heuristics,
quality scoring, token counting, and document fingerprinting over the
``documents`` table — all JVM-side built-ins (regexp / split / hash),
no Python UDFs, so they run at 100 TB inside whole-stage codegen.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ella_spark.queries import register
from ella_spark.sources import load_table

# Tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic. Deliberately small and deterministic.
_LANG_MARKERS = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "und", "das", "ist"),
    "fr": ("le", "la", "et", "les", "est"),
    "es": ("el", "la", "los", "que", "es"),
}


@register(
    "q_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT)                                  AS n_chars,
           CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
             - CAST(len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_repeated
    FROM documents
    WHERE length(trim(text)) > 0
    """,
    doc="Whitespace tokenization: token count, char count, repeated-token count.",
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return d.where(F.length(F.trim("text")) > 0).select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars"),
        (F.size(toks) - F.size(F.array_distinct(toks))).cast("bigint").alias(
            "n_repeated"
        ),
    )


@register(
    "q_quality_score",
    oracle=r"""
    SELECT doc_id,
           round(CAST(length(regexp_replace(text, '[^.!?,;:]', '', 'g')) AS DOUBLE)
                 / greatest(length(text), 1), 6) AS punct_ratio,
           round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                 / greatest(length(text), 1), 6) AS digit_ratio,
           round(CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
                 / greatest(length(text), 1), 6) AS upper_ratio,
           round(CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE)
                 / greatest(length(text), 1), 6) AS word_density,
           (length(text) BETWEEN 50 AND 20000)   AS len_ok
    FROM documents
    WHERE length(trim(text)) > 0
    """,
    doc="Document quality scoring: punctuation/digit/uppercase ratios, "
    "word density, length gate.",
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    n = F.greatest(F.length("text"), F.lit(1)).cast("double")

    def ratio(pattern: str):
        return F.round(
            F.length(F.regexp_replace("text", pattern, "")).cast("double") / n, 6
        )

    return d.where(F.length(F.trim("text")) > 0).select(
        "doc_id",
        ratio("[^.!?,;:]").alias("punct_ratio"),
        ratio("[^0-9]").alias("digit_ratio"),
        ratio("[^A-Z]").alias("upper_ratio"),
        F.round(
            F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("double") / n, 6
        ).alias("word_density"),
        F.length("text").between(50, 20000).alias("len_ok"),
    )


def _lang_score_sql(lang: str) -> str:
    toks = _LANG_MARKERS[lang]
    arr = ", ".join(f"'{t}'" for t in toks)
    return (
        f"CAST(len(list_filter(regexp_split_to_array(lower(text), '[^a-z]+'), "
        f"w -> list_contains([{arr}], w))) AS DOUBLE)"
    )


@register(
    "q_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang,
             {_lang_score_sql('en')} AS s_en,
             {_lang_score_sql('de')} AS s_de,
             {_lang_score_sql('fr')} AS s_fr,
             {_lang_score_sql('es')} AS s_es
      FROM documents)
    SELECT doc_id, lang,
           CASE
             WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es THEN 'en'
             WHEN s_de >= s_fr AND s_de >= s_es THEN 'de'
             WHEN s_fr >= s_es THEN 'fr'
             ELSE 'es' END AS lang_guess
    FROM scored
    """,
    doc="Stopword-marker language ID heuristic; ties broken en>de>fr>es.",
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    words = F.split(F.lower(F.col("text")), "[^a-z]+")
    scores = {
        lang: F.size(
            F.filter(words, lambda w: w.isin(*_LANG_MARKERS[lang]))
        ).cast("double")
        for lang in _LANG_MARKERS
    }
    scored = d.select(
        "doc_id",
        "lang",
        *(scores[lang].alias(f"s_{lang}") for lang in _LANG_MARKERS),
    )
    guess = (
        F.when(
            (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_fr"))
            & (F.col("s_en") >= F.col("s_es")),
            "en",
        )
        .when((F.col("s_de") >= F.col("s_fr")) & (F.col("s_de") >= F.col("s_es")), "de")
        .when(F.col("s_fr") >= F.col("s_es"), "fr")
        .otherwise("es")
    )
    return scored.select("doc_id", "lang", guess.alias("lang_guess"))


@register(
    "q_doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(trim(text)))                 AS content_md5,
           CAST(length(text) AS BIGINT)           AS n_chars,
           substr(lower(trim(text)), 1, 16)       AS head16
    FROM documents
    """,
    doc="Document fingerprinting: normalized-content hash + head sample.",
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.col("text")))
    return d.select(
        "doc_id",
        F.md5(norm.cast("binary")).alias("content_md5"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.substring(norm, 1, 16).alias("head16"),
    )


@register(
    "q_lang_source_stats",
    oracle="""
    SELECT lang, source,
           count(*)                                 AS n_docs,
           CAST(sum(n_chars) AS BIGINT)             AS total_chars,
           round(avg(n_chars), 4)                   AS avg_chars,
           CAST(median(n_chars) AS DOUBLE)          AS median_chars
    FROM documents
    GROUP BY lang, source
    """,
    doc="Corpus composition stats per language/source incl. exact median.",
)
def q_lang_source_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.percentile(F.col("n_chars"), F.lit(0.5)).cast("double").alias("median_chars"),
    )


@register(
    "q_tfidf_top_terms",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, lower(tok) AS term
      FROM documents,
           unnest(string_split_regex(trim(text), '[^A-Za-z0-9]+')) AS t(tok)
      WHERE length(tok) >= 3
    ),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM toks GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, count(DISTINCT doc_id) AS dfreq FROM toks GROUP BY term
    ),
    n AS (SELECT count(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term,
             round(tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.dfreq), 6) AS tfidf
      FROM tf JOIN df USING (term) CROSS JOIN n
    )
    SELECT doc_id, term, tfidf, CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
      FROM scored)
    WHERE rnk <= 3 AND doc_id < 50
    """,
    doc="TF-IDF top-3 terms per document, pure relational form: "
    "tokenize -> explode (one shuffle per agg on (doc,term) / term) "
    "-> idf join (term df fits memory at any corpus size: vocabulary "
    "grows sublinearly) -> per-doc top-k window. The distributed "
    "backbone of quality filtering / keyword extraction at 100 TB.",
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), "[^A-Za-z0-9]+")).alias("tok"),
        )
        .where(F.length("tok") >= 3)
        .select("doc_id", F.lower(F.col("tok")).alias("term"))
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # document frequency from tf (one row per (doc, term) already) —
    # deriving it from toks would tokenize and explode the corpus a
    # second time; from tf it's a small agg over the compact frame.
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("dfreq"))
    # Single plan: the corpus size enters as a broadcast 1-row aggregate
    # instead of a driver-side d.count() (which would run an extra job
    # and execute the scan twice).
    n = d.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("dfreq")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), "term")
    return (
        # rank BEFORE casting: the cast broke InferWindowGroupLimit's
        # pattern match, so every (doc, term) score crossed the doc_id
        # exchange instead of each map task forwarding only its top-3
        # per doc (r14 plan audit pins the WindowGroupLimit)
        scored.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") <= 3) & (F.col("doc_id") < 50))
        .select(
            "doc_id", "term", "tfidf", F.col("_rn").cast("int").alias("rnk")
        )
    )


_BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@register(
    "q_tokenize_bpe",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(regexp_extract_all(text, '{_BPE_PATTERN}'))) AS BIGINT) AS n_distinct,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_number_runs
    FROM documents
    """,
    doc="BPE-ish regex tokenization (letter runs / digit runs / single "
    "punctuation — the pre-tokenizer split of GPT-style BPE): token "
    "and distinct-token counts per document, pure JVM regexp.",
)
def q_tokenize_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), F.lit(0))
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_distinct"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit("[0-9]+"), F.lit(0))
        ).cast("bigint").alias("n_number_runs"),
    )


_F8 = ",\n           ".join(
    f"round(CAST(('0x' || substr(hx, {2 * i + 1}, 2)) AS INTEGER) / 255.0, 6)"
    f" AS f{i}"
    for i in range(8)
)


@register(
    "q_media_features",
    oracle=f"""
    WITH h AS (SELECT doc_id AS media_id, sha256(text) AS hx FROM documents)
    SELECT media_id,
           {_F8}
    FROM h
    """,
    doc="Multimodal feature-extraction pipeline over binary payloads "
    "(documents text-as-bytes stands in for media blobs): mapInPandas "
    "Arrow-batched decode+featurize (operators.multimodal) — the "
    "deterministic fake decoder is sha256-derived, so DuckDB can "
    "verify the full distributed plumbing end to end.",
)
def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ella_spark.operators.multimodal import extract_features

    d = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("payload"),
    )
    feats = extract_features(d)
    return feats.select(
        "media_id",
        *[
            F.round(F.element_at("features", i + 1), 6).alias(f"f{i}")
            for i in range(8)
        ],
    )


_BOILER = r"(https?://\S+)|(\S+@\S+\.\S+)"


@register(
    "q_dedup_winnow_pairs",
    oracle="""
    WITH n AS (
      SELECT doc_id, lower(trim(text)) AS t
      FROM documents
      WHERE length(lower(trim(text))) >= 11
    ),
    g AS (
      SELECT doc_id,
             list_transform(range(1, length(t) - 8 + 2),
               i -> CAST(('0x' || substr(md5(substr(t, CAST(i AS INTEGER), 8)),
                          1, 8)) AS BIGINT)) AS h
      FROM n
    ),
    f AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(h) - 4 + 2),
               i -> list_min(h[CAST(i AS INTEGER):CAST(i + 3 AS INTEGER)]))) AS fp
      FROM g
    ),
    e AS (SELECT doc_id, unnest(fp) AS fp FROM f),
    rare AS (
      SELECT fp FROM e GROUP BY fp HAVING count(*) <= 10
    ),
    ee AS (SELECT e.doc_id, e.fp FROM e WHERE e.fp IN (SELECT fp FROM rare)),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM ee a JOIN ee b ON a.fp = b.fp AND b.doc_id > a.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING count(*) >= 3
    )
    SELECT p.id_a, p.id_b, p.n_shared,
           round(CAST(p.n_shared AS DOUBLE)
                 / least(fa.nf, fb.nf), 6) AS overlap
    FROM pairs p
    JOIN (SELECT doc_id, CAST(len(fp) AS BIGINT) AS nf FROM f) fa
      ON fa.doc_id = p.id_a
    JOIN (SELECT doc_id, CAST(len(fp) AS BIGINT) AS nf FROM f) fb
      ON fb.doc_id = p.id_b
    """,
    doc="Winnowing-based cross-document near-dup pairs (the MOSS "
    "recipe, Schleimer et al. 2003): the fourth candidate-generation "
    "family next to MinHash/SimHash/n-gram-Jaccard. Per-doc winnowing "
    "fingerprints explode to (doc, fp); HIGH-DF fingerprints are "
    "dropped first (MOSS's 'ignore matches in too many documents' "
    "rule — the df cap bounds every fp group, so the pair join is "
    "never all-pairs at any corpus size); surviving fps equi-join "
    "into pairs scored by shared-fp count and overlap vs the smaller "
    "fingerprint set. All integer counts — exact cross-engine. "
    "RECALL CONTRACT (measured, SCALING.md round-6 probe): the df cap "
    "deliberately drops fingerprints shared by >10 docs, so this "
    "family targets LOW-multiplicity near-dups; wholesale N-fold "
    "duplication pushes every fp over the cap and yields zero pairs "
    "by design — exact dedup and q_repeated_span_removal (uncapped "
    "digest aggregates) are the right tools in that regime.",
)
def q_dedup_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # md5-based gram hash: bit-identical in DuckDB (the oracle vehicle)
    return _winnow_pairs(
        spark,
        sf_dir,
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
    )


# The fast vehicle's Horner rolling hash IS exactly reproducible in
# DuckDB: gram_hash(i) = sum_j byte[i+j] * B^(7-j) mod 2^64 with
# B = 1099511628211 (the FNV-1a prime used as the Horner base) and the
# eight power constants inlined. HUGEINT (int128) holds every
# intermediate (byte * B^j < 2^72; the 8-term sum < 2^75), so the
# uint64 wraparound is one `% 2^64`. Bytes come from
# hex(encode(lower(trim(text)))) — byte-level like the numpy pass, so
# the hashes (and therefore the winnowed mins, computed on UNSIGNED
# values exactly as numpy's uint64 sliding min) are bit-identical.
_FNV_POW = [
    1, 1099511628211, 956575116354345, 624165263380053675,
    11527715348014283921, 913917546033277539,
    15895002104753931833, 14218562807570617051,
]
_FNV_TERMS = " + ".join(
    f"bl[i + {j}] * {_FNV_POW[7 - j]}::HUGEINT" for j in range(8)
)


@register(
    "q_dedup_winnow_fast",
    oracle=f"""
    WITH n AS (
      SELECT doc_id, lower(trim(text)) AS t
      FROM documents
      WHERE length(lower(trim(text))) >= 11
    ),
    byts AS (
      SELECT doc_id,
             list_transform(range(1, octet_length(encode(t)) + 1),
               i -> CAST(CAST(('0x' || substr(hex(encode(t)),
                        CAST(2 * i - 1 AS INTEGER), 2)) AS INTEGER)
                    AS HUGEINT)) AS bl
      FROM n
    ),
    g AS (
      SELECT doc_id,
             list_transform(range(1, len(bl) - 8 + 2),
               i -> ({_FNV_TERMS}) % 18446744073709551616::HUGEINT) AS h
      FROM byts
    ),
    f AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(h) - 4 + 2),
               i -> least(h[CAST(i AS INTEGER)], h[CAST(i + 1 AS INTEGER)],
                          h[CAST(i + 2 AS INTEGER)],
                          h[CAST(i + 3 AS INTEGER)]))) AS fp
      FROM g
    ),
    e AS (SELECT doc_id, unnest(fp) AS fp FROM f),
    rare AS (
      SELECT fp FROM e GROUP BY fp HAVING count(*) <= 10
    ),
    ee AS (SELECT e.doc_id, e.fp FROM e WHERE e.fp IN (SELECT fp FROM rare)),
    pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(count(*) AS BIGINT) AS n_shared
      FROM ee a JOIN ee b ON a.fp = b.fp AND b.doc_id > a.doc_id
      GROUP BY a.doc_id, b.doc_id
      HAVING count(*) >= 3
    )
    SELECT p.id_a, p.id_b, p.n_shared,
           round(CAST(p.n_shared AS DOUBLE)
                 / least(fa.nf, fb.nf), 6) AS overlap
    FROM pairs p
    JOIN (SELECT doc_id, CAST(len(fp) AS BIGINT) AS nf FROM f) fa
      ON fa.doc_id = p.id_a
    JOIN (SELECT doc_id, CAST(len(fp) AS BIGINT) AS nf FROM f) fb
      ON fb.doc_id = p.id_b
    """,
    doc="Vectorized fast path of the winnowing near-dup pair "
    "generator: identical pipeline (winnow mins, DF-capped fp "
    "buckets, pair join), but fingerprints come from ONE Arrow-"
    "batched mapInPandas pass — the whole batch's text concatenated "
    "into a single numpy byte array, a Horner-scheme polynomial "
    "rolling hash (k passes over the batch, no per-gram string "
    "allocation), stride-tricks sliding mins, and doc-boundary "
    "masking. Measured at sf0.1: the fingerprint stage drops "
    "2.4 s (JVM higher-order exprs, interpreted per array element) "
    "-> 0.7 s; winnowing's guarantee is hash-independent, so planted "
    "near-dups surface under both digests. This is the variant to "
    "run at 100 TB. Oracle-paired since r11: the Horner hash is "
    "replayed bit-exactly in DuckDB HUGEINT arithmetic (see "
    "_FNV_TERMS above), closing the registry's last never-"
    "driver-checked name.",
)
def q_dedup_winnow_fast(spark: SparkSession, sf_dir: str) -> DataFrame:
    k, w, df_cap, min_shared = 8, 4, 10, 3
    e = winnow_fingerprints_fast(spark, sf_dir, k=k, w=w)
    nf = e.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("nf"))
    return _winnow_tail(e, nf, df_cap, min_shared)


def winnow_fingerprints_fast(
    spark: SparkSession, sf_dir: str, k: int = 8, w: int = 4
) -> DataFrame:
    """The fast vehicle's fingerprint stage: distinct winnowed
    (doc_id, fp) rows from ONE Arrow mapInPandas pass (batch-
    concatenated bytes, Horner rolling hash, stride-tricks sliding
    min, doc-boundary masking). Split out of q_dedup_winnow_fast so
    tests/test_textops.py can pin it doc-by-doc against a pure-Python
    per-document reference — the standing guard that a numpy refactor
    cannot silently drift the batched machinery (boundary masks,
    lexsort dedup) away from winnowing semantics."""
    import numpy as np
    import pandas as pd
    from numpy.lib.stride_tricks import sliding_window_view

    d = load_table(spark, sf_dir, "documents")
    n = d.select(
        "doc_id", F.lower(F.trim(F.col("text"))).alias("t")
    ).where(F.length("t") >= k + w - 1)
    B = np.uint64(1099511628211)  # FNV-1a prime as the Horner base

    def fp_batches(it):
        for pdf in it:
            texts = [s.encode("utf-8") for s in pdf["t"]]
            ids = pdf["doc_id"].to_numpy()
            lens = np.fromiter(
                (len(t) for t in texts), dtype=np.int64, count=len(texts)
            )
            # one concatenated array for the WHOLE batch: the rolling
            # hash and sliding min are k + 2 vectorized passes total,
            # instead of 2 numpy calls per document
            allb = np.frombuffer(b"".join(texts), dtype=np.uint8).astype(
                np.uint64
            )
            G = len(allb) - k + 1  # k-gram start positions
            h = allb[:G].copy()
            for j in range(1, k):  # Horner: h = h*B + next byte
                h *= B
                h += allb[j : j + G]
            M = G - w + 1  # winnow-window start positions
            mins = sliding_window_view(h, w).min(axis=1)
            # a window starting at byte p spans bytes [p, p+k+w-2]:
            # valid only when both ends fall in the SAME document
            # (cross-boundary grams hash bytes of two docs — masked)
            doc_of = np.repeat(np.arange(len(texts)), lens)
            span = k + w - 2
            valid = doc_of[:M] == doc_of[span : span + M]
            vdoc = doc_of[:M][valid]
            vfp = mins[valid].view(np.int64)
            # per-doc distinct via lexsort + adjacent-difference mask
            # (vectorized np.unique over (doc, fp) pairs)
            order = np.lexsort((vfp, vdoc))
            vdoc, vfp = vdoc[order], vfp[order]
            first = np.ones(len(vdoc), dtype=bool)
            if len(first) > 1:
                first[1:] = (vdoc[1:] != vdoc[:-1]) | (vfp[1:] != vfp[:-1])
            yield pd.DataFrame(
                {"doc_id": ids[vdoc[first]], "fp": vfp[first]}
            )

    # same lineage cut as the md5 vehicle: the exploded fingerprint
    # table feeds 5 downstream references — one bounded
    # materialization keeps the Python stage from re-running per
    # self-join branch
    return n.mapInPandas(
        fp_batches, schema="doc_id long, fp long"
    ).localCheckpoint(eager=False)


def _winnow_pairs(
    spark: SparkSession, sf_dir: str, gram_hash
) -> DataFrame:
    """Shared winnowing front half, parameterized by the per-gram
    hash (``gram_hash``: Column[string k-gram] -> Column[long]).
    Used by q_dedup_winnow_pairs (md5-based, exactly reproducible in
    DuckDB — the ORACLE vehicle); q_dedup_winnow_fast replaces this
    whole stage with a vectorized Arrow pass (the PERF vehicle) and
    shares only ``_winnow_tail``."""
    k, w, df_cap, min_shared = 8, 4, 10, 3
    d = load_table(spark, sf_dir, "documents")
    n = d.select(
        "doc_id", F.lower(F.trim(F.col("text"))).alias("t")
    ).where(F.length("t") >= k + w - 1)
    t = F.col("t")
    grams = F.transform(
        F.sequence(F.lit(1), F.length(t) - (k - 1)),
        lambda i: t.substr(i, F.lit(k)),
    )
    g = n.select("doc_id", F.transform(grams, gram_hash).alias("h"))
    # sliding min of width w=4 in two log-step zip_with passes
    # (shift-1 least, then shift-2 least) — IDENTICAL values to the
    # naive per-window transform(slice+array_min) but O(n log w)
    # array work instead of O(n*w) slice copies (measured ~0.5 s at
    # sf0.1; fingerprint sets verified equal doc-by-doc)
    h = F.col("h")
    s1 = F.zip_with(
        h, F.slice(h, 2, F.size(h) - 1), lambda x, y: F.least(x, y)
    )
    s2 = F.zip_with(
        s1,
        F.slice(s1, 3, F.greatest(F.size(h) - 2, F.lit(0))),
        lambda x, y: F.least(x, y),
    )
    fps = F.array_distinct(F.slice(s2, 1, F.size(h) - (w - 1)))
    # CUT the lineage here: the fingerprint expression is a deep
    # nest of higher-order functions, and the downstream SELF-joins
    # (occurrences ⋈ rare-fp aggregate, pair join, two nf joins)
    # each re-embed it — Catalyst's self-join re-analysis over that
    # tree blows up super-linearly (measured: plan ANALYSIS alone
    # hung at any SF). One bounded materialization (a row per doc)
    # makes every later plan shallow — the same idiom as the
    # connected-components edge checkpoint (operators/graph.py).
    f = g.select("doc_id", fps.alias("fp")).localCheckpoint(eager=False)
    e = f.select("doc_id", F.explode("fp").alias("fp"))
    nf = f.select("doc_id", F.size("fp").cast("bigint").alias("nf"))
    return _winnow_tail(e, nf, df_cap, min_shared)


def _winnow_tail(
    e: DataFrame, nf: DataFrame, df_cap: int, min_shared: int
) -> DataFrame:
    """Back half shared by both winnowing vehicles: DF-cap the
    exploded (doc_id, fp) occurrences (MOSS's 'ignore matches in too
    many documents' rule — bounds every fp bucket, so the pair join
    is never all-pairs), equi-join into pairs, score by shared-fp
    count and overlap vs the smaller fingerprint set ``nf``."""
    rare = (
        e.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") <= df_cap)
        .select("fp")
    )
    ee = e.join(rare, "fp", "left_semi")
    a = ee.alias("a")
    b = ee.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp"))
            & (F.col("b.doc_id") > F.col("a.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return (
        pairs.join(nf.withColumnRenamed("doc_id", "id_a").alias("fa"), "id_a")
        .join(
            nf.withColumnRenamed("doc_id", "id_b")
            .withColumnRenamed("nf", "nfb")
            .alias("fb"),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            "n_shared",
            F.round(
                F.col("n_shared").cast("double")
                / F.least("nf", "nfb"),
                6,
            ).alias("overlap"),
        )
    )


@register(
    "q_strip_boilerplate",
    oracle=f"""
    SELECT doc_id,
           CAST(length(regexp_replace(text, '{_BOILER}', '', 'g')) AS BIGINT)
               AS clean_len,
           CAST(len(regexp_extract_all(text, 'https?://\\S+')) AS BIGINT)
               AS n_urls,
           CAST(len(regexp_extract_all(text, '\\S+@\\S+\\.\\S+')) AS BIGINT)
               AS n_emails
    FROM documents
    """,
    doc="Boilerplate stripping for training corpora: URL/email removal "
    "+ counts, pure JVM regexp (codegen-friendly at 100 TB).",
)
def q_strip_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length(F.regexp_replace("text", _BOILER, "")).cast("bigint").alias(
            "clean_len"
        ),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(r"https?://\S+"), F.lit(0))
        ).cast("bigint").alias("n_urls"),
        F.size(
            F.regexp_extract_all(F.col("text"), F.lit(r"\S+@\S+\.\S+"), F.lit(0))
        ).cast("bigint").alias("n_emails"),
    )


@register(
    "q_winnow_fingerprint",
    oracle="""
    WITH n AS (
      SELECT doc_id, lower(trim(text)) AS t
      FROM documents
      WHERE length(lower(trim(text))) >= 11
    ),
    g AS (
      SELECT doc_id,
             list_transform(range(1, length(t) - 8 + 2),
               i -> CAST(('0x' || substr(md5(substr(t, CAST(i AS INTEGER), 8)),
                          1, 8)) AS BIGINT)) AS h
      FROM n
    ),
    f AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(h) - 4 + 2),
               i -> list_min(h[CAST(i AS INTEGER):CAST(i + 3 AS INTEGER)]))) AS fp
      FROM g
    )
    SELECT doc_id,
           CAST(len(fp) AS BIGINT) AS n_fp,
           list_min(fp)            AS fp_min,
           list_max(fp)            AS fp_max
    FROM f
    """,
    doc="Winnowing document fingerprints (the MOSS rolling-hash "
    "algorithm): hash every 8-gram, slide a window of 4 hashes, keep "
    "each window's minimum — guarantees shared substrings of length "
    ">= 11 produce overlapping fingerprints, at ~1/4 the storage of "
    "full shingle sets. All JVM-side (md5 + higher-order array fns).",
)
def q_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    k, w = 8, 4
    d = load_table(spark, sf_dir, "documents")
    # project the normalized text first: compound expressions inside
    # transform lambdas re-evaluate per element (NOTES lead #6)
    n = d.select(
        "doc_id", F.lower(F.trim(F.col("text"))).alias("t")
    ).where(F.length("t") >= k + w - 1)
    t = F.col("t")
    grams = F.transform(
        F.sequence(F.lit(1), F.length(t) - (k - 1)),
        lambda i: t.substr(i, F.lit(k)),
    )
    g = n.select("doc_id", F.transform(
        grams,
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long"),
    ).alias("h"))
    fps = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size("h") - (w - 1)),
            lambda i: F.array_min(F.slice(F.col("h"), i, w)),
        )
    )
    return g.select(
        "doc_id",
        F.size(fps).cast("bigint").alias("n_fp"),
        F.array_min(fps).alias("fp_min"),
        F.array_max(fps).alias("fp_max"),
    )


_BM25_TERMS = ("spark", "query", "window")
_BM25_K1, _BM25_B = 1.2, 0.75


@register(
    "q_bm25_search",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lower(tok) AS term
      FROM documents,
           unnest(string_split_regex(trim(text), '[^A-Za-z0-9]+')) AS t(tok)
      WHERE length(tok) > 0
    ),
    dl AS (SELECT doc_id, count(*) AS doclen FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs, avg(doclen) AS avgdl FROM dl),
    tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM toks WHERE term IN {_BM25_TERMS!r} GROUP BY doc_id, term
    ),
    dfreq AS (SELECT term, count(*) AS dfreq FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             sum(ln(1 + (stats.n_docs - dfreq.dfreq + 0.5) / (dfreq.dfreq + 0.5))
                 * tf.tf * ({_BM25_K1} + 1)
                 / (tf.tf + {_BM25_K1} * (1 - {_BM25_B}
                    + {_BM25_B} * dl.doclen / stats.avgdl))) AS score
      FROM tf
      JOIN dfreq USING (term)
      JOIN dl USING (doc_id)
      CROSS JOIN stats
      GROUP BY tf.doc_id
    )
    SELECT doc_id, bm25, CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT doc_id, round(score, 6) AS bm25,
             row_number() OVER (ORDER BY round(score, 6) DESC, doc_id) AS rnk
      FROM scored)
    WHERE rnk <= 20
    """,
    doc="BM25 full-text ranking (Robertson/Sparck Jones; k1=1.2 b=0.75) "
    "for a fixed term set, top-20 docs. Scale shape: doc lengths and "
    "per-(doc,term) tf are one explode + two keyed aggs; the per-term "
    "document frequencies and global (N, avgdl) are tiny broadcast "
    "aggregates; no shuffle ever carries raw text. The final global "
    "top-k is a TakeOrderedAndProject over one score row per matching "
    "doc.",
)
def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE tokenize pass for both document lengths and per-term counts:
    # the fixed query-term set becomes conditional counts inside the
    # same doc_id aggregate, so the plan is explode -> one shuffle on
    # doc_id -> two single-row broadcast aggregates (N/avgdl and the
    # per-term document frequencies) -> TakeOrdered top-k. The naive
    # form (separate tf and doclen pipelines joined on doc_id) scans
    # and explodes the 100 TB text column twice and adds a doc_id
    # shuffle join.
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id",
            F.explode(F.split(F.trim(F.col("text")), "[^A-Za-z0-9]+")).alias("tok"),
        )
        .where(F.length("tok") > 0)
        .select("doc_id", F.lower(F.col("tok")).alias("term"))
    )
    per_doc = toks.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("doclen"),
        *[
            F.count(F.when(F.col("term") == t, 1)).alias(f"tf_{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    consts = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("doclen").alias("avgdl"),
        *[
            F.count(F.when(F.col(f"tf_{i}") > 0, 1)).alias(f"df_{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )

    def term_score(i: int):
        tf = F.col(f"tf_{i}")
        idf = F.log(
            1 + (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
        )
        denom = tf + _BM25_K1 * (
            1 - _BM25_B + _BM25_B * F.col("doclen") / F.col("avgdl")
        )
        return F.when(tf > 0, idf * tf * (_BM25_K1 + 1) / denom).otherwise(0.0)

    scored = (
        per_doc.crossJoin(F.broadcast(consts))
        .where(
            sum((F.col(f"tf_{i}") for i in range(1, len(_BM25_TERMS))),
                F.col("tf_0")) > 0
        )
        .select(
            "doc_id",
            # Round BEFORE ranking: the raw doubles differ between
            # engines in the last bits (different summation order),
            # which would flip tie-adjacent rows at the top-k boundary.
            F.round(
                sum((term_score(i) for i in range(1, len(_BM25_TERMS))),
                    term_score(0)),
                6,
            ).alias("bm25"),
        )
    )
    w = Window.orderBy(F.col("bm25").desc(), "doc_id")
    return (
        # rank BEFORE casting: a cast on the row_number breaks
        # InferWindowGroupLimit's rank-function pattern match, and
        # without the Partial WindowGroupLimit every scored doc would
        # funnel through the global window's single partition — with
        # it, each input partition forwards only its own top-20 (r14
        # plan audit pins the limit node)
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= 20)
        .select("doc_id", "bm25", F.col("_rn").cast("int").alias("rnk"))
    )


@register(
    "q_top_bigrams",
    oracle=r"""
    WITH toks AS (
      SELECT list_filter(
               list_transform(
                 string_split_regex(trim(text), '[^A-Za-z0-9]+'),
                 t -> lower(t)),
               t -> length(t) > 0) AS ts
      FROM documents
    ),
    bg AS (
      SELECT unnest(list_transform(
               range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1]
             )) AS bigram
      FROM toks
      WHERE len(ts) >= 2
    )
    SELECT bigram, count(*) AS n
    FROM bg
    GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
    doc="Global top-20 word bigrams: per-doc token array -> adjacent "
    "pairs via an index-sequence transform (no self-join on position), "
    "explode -> count -> top-k. The corpus n-gram census behind "
    "contamination screens and repetition stats. Shuffle carries "
    "(bigram, partial count) only — map-side combine keeps it "
    "sublinear in corpus size.",
)
def q_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.transform(
            F.split(F.trim(F.col("text")), "[^A-Za-z0-9]+"),
            lambda t: F.lower(t),
        ),
        lambda t: F.length(t) > 0,
    )
    a = F.col("ts")
    bigrams = F.transform(
        F.sequence(F.lit(1), F.size(a) - 1),
        lambda i: F.concat(F.element_at(a, i), F.lit(" "), F.element_at(a, i + 1)),
    )
    return (
        d.select(toks.alias("ts"))
        .where(F.size("ts") >= 2)
        .select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


@register(
    "q_heavy_hitters",
    oracle=r"""
    WITH toks AS (
      SELECT lower(tok) AS w
      FROM documents,
           unnest(string_split_regex(trim(text), '[^A-Za-z0-9]+')) AS t(tok)
      WHERE length(tok) > 0
    )
    SELECT w AS value, cnt AS approx_count, CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT w, count(*) AS cnt,
             row_number() OVER (ORDER BY count(*) DESC, w) AS rank
      FROM toks GROUP BY w) s
    WHERE rank <= 10
    """,
    doc="Top-10 corpus words via Misra-Gries per-partition summaries "
    "(operators.sketch.heavy_hitters): bounded memory per task "
    "regardless of key-space size; shuffle carries ≤ counters x tasks "
    "summary rows, not the token stream. EXACT here (and oracle-"
    "checkable) because the synthetic vocabulary fits the 4096 "
    "counters — no eviction fires; with an open-ended key space the "
    "same plan degrades gracefully to ε = n/(counters+1) undercounts "
    "instead of spilling (see tests/test_sketch.py for the bound).",
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ella_spark.operators.sketch import heavy_hitters

    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(
            F.explode(F.split(F.trim(F.col("text")), "[^A-Za-z0-9]+")).alias("tok")
        )
        .where(F.length("tok") > 0)
        .select(F.lower(F.col("tok")).alias("w"))
    )
    return heavy_hitters(toks, "w", k=10, counters=4096)


@register(
    "q_char_entropy",
    oracle="""
    WITH d AS (
      SELECT doc_id, lower(trim(text)) AS s FROM documents
      WHERE length(trim(text)) > 0
    ), counts AS (
      SELECT doc_id, c, count(*) AS n
      FROM d, unnest(list_transform(range(1, length(s) + 1),
                     i -> substr(s, CAST(i AS INTEGER), 1))) AS t(c)
      GROUP BY doc_id, c
    )
    SELECT doc_id,
           CAST(sum(n) AS BIGINT)   AS n_chars_norm,
           CAST(count(*) AS BIGINT) AS n_distinct_chars,
           round(ln(sum(n)) - sum(n * ln(n)) / sum(n), 6) AS char_entropy
    FROM counts
    GROUP BY doc_id
    """,
    doc="Character-level Shannon entropy per document (nats): a cheap "
    "quality signal — near-zero entropy flags repeated-character junk "
    "and binary-ish content; natural text sits in a narrow band. "
    "Shape: explode chars -> count per (doc, char) -> one-pass "
    "entropy via ln(N) - sum(n ln n)/N (identical formula both "
    "engines, so the rounded values are bit-comparable). The shuffle "
    "carries (doc_id, char, count) triples, never text. An "
    "array-expression form (distinct chars x occurrence filters) was "
    "rejected: Catalyst re-evaluates the char-array lambda per "
    "distinct char -> measured 22 s for 500 docs vs 0.2 s here.",
)
def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").where(
        F.length(F.trim("text")) > 0
    )
    # one element per CODEPOINT: regexp_extract_all with '.' matches
    # full code points, so an astral char (emoji) stays one element —
    # the previous zero-width split cut on UTF-16 units and counted
    # surrogate pairs as two chars, diverging from the oracle's
    # codepoint substr on non-BMP text (r14 fuzz)
    chars = d.select(
        "doc_id",
        F.explode(
            F.expr("regexp_extract_all(lower(trim(text)), '(?s).', 0)")
        ).alias("c"),
    )
    counts = chars.groupBy("doc_id", "c").agg(F.count(F.lit(1)).alias("n"))
    return counts.groupBy("doc_id").agg(
        F.sum("n").cast("bigint").alias("n_chars_norm"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_chars"),
        F.round(
            F.log(F.sum("n")) - F.sum(F.col("n") * F.log("n")) / F.sum("n"), 6
        ).alias("char_entropy"),
    )


# ── unigram LM perplexity (CCNet-style quality signal) ───────────────
# CCNet (Wenzek et al. 2020) ranks crawl documents by the perplexity
# of a language model trained on a trusted corpus; low-perplexity text
# is "Wikipedia-like", high-perplexity text is noise. The miniature
# here trains an add-alpha-smoothed UNIGRAM LM as a train-once corpus
# artifact (same bounded-sample recipe as the IVF centroid artifact:
# first _LM_SAMPLE docs by id, top _LM_V tokens) so the oracle can pin
# (token, logprob) pairs as literals; scoring the full corpus is one
# explode -> broadcast vocab join -> per-doc aggregate, where Spark's
# map-side partial aggregation collapses each doc's tokens before the
# shuffle (explode preserves row locality), so the exchange carries
# O(docs), not O(tokens).

_LM_V = 256
_LM_ALPHA = 0.5
_LM_SAMPLE = 512

_LM_CACHE: dict = {}


def corpus_unigram_lm(sf_dir: str):
    """[(token, logprob)] for the top-V sample tokens + the OOV
    logprob, deterministic for a given corpus."""
    import math
    import os
    import re as _re

    import pyarrow.parquet as pq

    key = os.path.abspath(sf_dir)
    got = _LM_CACHE.get(key)
    if got is None:
        tbl = pq.read_table(
            os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
        )
        pdf = tbl.to_pandas().sort_values("doc_id").head(_LM_SAMPLE)
        counts: dict[str, int] = {}
        total = 0
        for txt in pdf["text"]:
            for tok in _re.split(r"\s+", str(txt).lower().strip()):
                if tok:
                    counts[tok] = counts.get(tok, 0) + 1
                    total += 1
        top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:_LM_V]
        denom = total + _LM_ALPHA * (len(top) + 1)
        vocab = [
            (tok, math.log((c + _LM_ALPHA) / denom)) for tok, c in top
        ]
        oov = math.log(_LM_ALPHA / denom)
        got = _LM_CACHE[key] = (vocab, oov)
    return got


def _lm_oracle() -> str | None:
    import os

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
      WHERE t.tok != '')
    SELECT doc_id, count(*) AS n_tokens,
           round(avg(lp), 6) AS avg_logp,
           round(exp(-avg(lp)), 4) AS perplexity
    FROM scored GROUP BY doc_id
    """


@register(
    "q_lm_perplexity",
    oracle=_lm_oracle(),
    doc="CCNet-style unigram-LM perplexity per document: add-alpha "
    "smoothed LM trained once on a bounded corpus sample (pinned into "
    "the DuckDB oracle as literal (token, logprob) pairs), every "
    "document scored by mean token log-prob and exp(-avg) perplexity. "
    "Scoring is explode -> broadcast vocab join -> doc-local "
    "aggregate; the shuffle carries O(docs) after map-side combine.",
)
def q_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    vocab, oov = corpus_unigram_lm(sf_dir)
    vdf = F.broadcast(
        spark.createDataFrame(vocab, "tok string, logp double")
    )
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("tok"),
    ).where(F.col("tok") != "")
    return (
        toks.join(vdf, "tok", "left")
        .select("doc_id", F.coalesce("logp", F.lit(oov)).alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg("lp"), 6).alias("avg_logp"),
            F.round(F.exp(-F.avg("lp")), 4).alias("perplexity"),
        )
    )


@register(
    "q_paragraph_dedup",
    oracle=r"""
    WITH p AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(text), '\n{2,}'),
                         x -> trim(x) != '') AS ps
      FROM documents),
    u AS (
      SELECT doc_id, ps,
             list_filter(ps, (x, i) -> list_position(ps, x) = i) AS uniq
      FROM p)
    SELECT doc_id,
           CAST(len(ps) AS BIGINT) AS n_paragraphs,
           CAST(len(uniq) AS BIGINT) AS n_unique,
           round(CASE WHEN len(ps) > 0
                 THEN CAST(len(uniq) AS DOUBLE) / len(ps) ELSE 1.0 END, 6)
             AS unique_ratio,
           md5(array_to_string(uniq, chr(10) || chr(10))) AS dedup_digest
    FROM u
    """,
    doc="Within-document paragraph dedup (first occurrence wins): the "
    "intra-doc counterpart of corpus-level dedup — crawl text often "
    "repeats nav/boilerplate blocks inside one page. Map-only JVM "
    "expressions (split + indexed filter), no shuffle at any scale; "
    "the deduped text is fingerprinted (md5) so the oracle compares "
    "content without hauling full bodies through the harness.",
)
def q_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    paras = F.filter(
        F.split(F.trim("text"), r"\n{2,}"), lambda x: F.trim(x) != ""
    )
    d = d.select("doc_id", paras.alias("_ps"))
    uniq = F.filter(
        "_ps", lambda x, i: F.array_position("_ps", x) == i + F.lit(1)
    )
    d = d.select("doc_id", "_ps", uniq.alias("_u"))
    return d.select(
        "doc_id",
        F.size("_ps").cast("bigint").alias("n_paragraphs"),
        F.size("_u").cast("bigint").alias("n_unique"),
        F.round(
            F.when(
                F.size("_ps") > 0,
                F.size("_u").cast("double") / F.size("_ps"),
            ).otherwise(1.0),
            6,
        ).alias("unique_ratio"),
        # NULL when there is nothing to hash — a zero-paragraph doc
        # digests to NULL on the oracle side too (r14 fuzz; md5 of the
        # empty concat would otherwise mint d41d8... only on Spark)
        F.when(
            F.size("_u") > 0,
            F.md5(F.concat_ws("\n\n", F.col("_u")).cast("binary")),
        ).alias("dedup_digest"),
    )


@register(
    "q_inverted_index",
    oracle="""
    WITH toks AS (
      SELECT DISTINCT doc_id,
             unnest(string_split_regex(lower(trim(text)), '\\s+')) AS term
      FROM documents
    ),
    filtered AS (SELECT doc_id, term FROM toks WHERE term != '')
    SELECT term,
           CAST(count(*) AS BIGINT) AS df,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc,
           string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
             AS postings
    FROM filtered
    GROUP BY term
    HAVING count(*) >= 20
    """,
    doc="Inverted-index build (posting lists): DISTINCT (doc, term) "
    "pairs grouped per term into df + a doc_id-sorted posting list — "
    "the materialization behind BM25/decontamination lookups. Plan "
    "shape: explode → per-partition distinct → one term-keyed "
    "shuffle carrying (term, doc_id) pairs, never text; posting "
    "lists serialize as sorted CSV so the result is order-canonical "
    "for the oracle compare. At 100 TB the df >= N floor bounds the "
    "output to the head vocabulary while the long tail stays "
    "unmaterialized.",
)
def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id",
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("term"),
        )
        .where(F.col("term") != "")
        .distinct()
    )
    return (
        toks.groupBy("term")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("df"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
            F.max("doc_id").cast("bigint").alias("last_doc"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings"),
        )
        .where(F.col("df") >= 20)
    )


# ── BPE vocabulary induction (iterative, exact cross-engine oracle) ──

_BPE_ROUNDS = 6


def _bpe_sql(table: str, rounds: int = _BPE_ROUNDS) -> str:
    """DuckDB replay of the BPE merge loop, unrolled to ``rounds``
    rounds of CTEs: count adjacent symbol pairs weighted by word
    frequency, pick the most frequent pair (count desc, pair asc —
    integer counts, so the choice is deterministic cross-engine),
    greedily merge it left-to-right in every word via a sequential
    list fold, repeat. The Spark side runs the same algorithm as a
    materialized driver loop (chained-CTE unrolling re-executes
    earlier rounds exponentially) — semantics are pinned equal by the
    oracle compare itself."""
    words = (
        "SELECT w AS word, count(*) AS freq FROM ("
        "SELECT unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w "
        f"FROM {table}) WHERE w != '' GROUP BY w"
    )
    chars = "string_split(word, '')"
    positions = ", unnest(range(1, len(s))) AS t(i)"
    pos_guard = ""
    el = lambda arr, i: f"{arr}[{i}]"
    fold = (
        "list_reduce(list_transform(s, x -> [x]), (acc, x) -> "
        "CASE WHEN len(acc) > 0 AND acc[-1] = b{r}.a AND x[1] = b{r}.b "
        "THEN acc[1:len(acc) - 1] || [b{r}.a || b{r}.b] "
        "ELSE acc || x END)"
    )
    ctes = [
        f"words AS ({words})",
        f"w0 AS (SELECT {chars} AS s, freq FROM words)",
    ]
    outs = []
    for r in range(1, rounds + 1):
        prev = f"w{r - 1}"
        ctes.append(
            f"p{r} AS (SELECT {el('s', 'i')} AS a, "
            f"{el('s', 'i + 1')} AS b, "
            f"CAST(sum(freq) AS BIGINT) AS c "
            f"FROM {prev} {positions} {pos_guard} GROUP BY 1, 2)"
        )
        ctes.append(
            f"b{r} AS (SELECT a, b, c FROM p{r} ORDER BY c DESC, a, b LIMIT 1)"
        )
        ctes.append(
            f"w{r} AS (SELECT {fold.format(r=f'{r}')} AS s, freq "
            f"FROM {prev} CROSS JOIN b{r})"
        )
        outs.append(
            f"SELECT {r} AS round, a AS left_sym, b AS right_sym, "
            f"a || b AS merged, c AS pair_count FROM b{r}"
        )
    return (
        "WITH " + ",\n    ".join(ctes) + "\n    "
        + "\nUNION ALL ".join(outs)
    )


@register(
    "q_bpe_merges",
    oracle=_bpe_sql("documents"),
    doc="BPE tokenizer-vocabulary induction (Sennrich et al. 2016), "
    "the iterative algorithm behind GPT/Llama tokenizers: 6 merge "
    "rounds learned over the corpus word-frequency table. Scale "
    "shape: ONE corpus scan builds (word, freq) — the only O(corpus) "
    "step; every merge round then runs on the compact vocabulary "
    "table (pair counts weighted by freq, a 1-row winning-pair "
    "collect, greedy left-to-right fold re-tokenization — all JVM "
    "expressions). The vocab is materialized ONCE (localCheckpoint); "
    "rounds then chain as lazy narrow folds over that compact table — "
    "unrolling the loop as chained SQL CTEs instead re-executes "
    "earlier rounds exponentially (measured 3.2s vs 1.7s at sf0.1). "
    "Integer counts + (count desc, pair asc) "
    "tie-break make every round deterministic cross-engine, so the "
    "unrolled-SQL DuckDB oracle replays the exact merge table.",
)
def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    out, _cur = _bpe_learn(spark, sf_dir)
    return spark.createDataFrame(
        out,
        "round int, left_sym string, right_sym string, "
        "merged string, pair_count bigint",
    )


def _bpe_learn(spark: SparkSession, sf_dir: str):
    """Run the 6-round BPE merge loop; returns (merge rows, the final
    tokenized vocab frame (s: array<string>, freq)) — shared by
    q_bpe_merges (the merge table) and q_bpe_encode (the applied
    token census)."""
    # Spark-dialect quoting (backslash IS an escape char in Spark's
    # parser, unlike DuckDB's): tokens are interpolated into F.expr
    from ella_spark.queries import spark_sql_quote as lit

    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(
            F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .select(F.split("w", "").alias("s"), "freq")
    )
    cur = vocab.localCheckpoint()
    out = []
    for r in range(1, _BPE_ROUNDS + 1):
        pos = F.when(
            F.size("s") >= 2, F.sequence(F.lit(1), F.size("s") - 1)
        ).otherwise(F.array().cast("array<int>"))
        best = (
            cur.select("s", "freq", F.explode(pos).alias("i"))
            .select(
                F.element_at("s", F.col("i")).alias("a"),
                F.element_at("s", F.col("i") + 1).alias("b"),
                "freq",
            )
            .groupBy("a", "b")
            .agg(F.sum("freq").cast("bigint").alias("c"))
            .orderBy(F.col("c").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not best:
            # no adjacent pairs left (degenerate corpus): the oracle's
            # b{r} CTE is empty too, so both sides emit fewer rounds
            break
        best = best[0]
        out.append((r, best.a, best.b, best.a + best.b, int(best.c)))
        merged = F.expr(
            "aggregate(transform(s, x -> array(x)), "
            "cast(array() as array<string>), (acc, x) -> "
            f"CASE WHEN size(acc) > 0 AND element_at(acc, -1) = {lit(best.a)} "
            f"AND x[0] = {lit(best.b)} "
            f"THEN concat(slice(acc, 1, size(acc) - 1), "
            f"array({lit(best.a + best.b)})) "
            "ELSE concat(acc, x) END)"
        )
        # the fold is a narrow map over the checkpointed vocab — let
        # rounds chain lazily (round r re-runs r-1 cheap folds over
        # the compact table) instead of paying a checkpoint job each
        # round; only the O(corpus) scan is materialized once above
        cur = cur.select(merged.alias("s"), "freq")
    return out, cur


def _bpe_encode_sql(table: str, top: int = 40) -> str:
    """DuckDB replay of the ENCODE step: the merge-loop CTE chain's
    final vocab state w{rounds} exploded into a frequency-weighted
    subword-token census (top ``top`` by count desc, token asc).
    Reuses _bpe_sql's CTE chain up to the last w CTE. Caveat (shared
    with the Spark side's early break): a degenerate corpus with no
    adjacent pairs before round ``rounds`` would empty the chain —
    impossible on the test corpus, where q_bpe_merges pins 6 rounds."""
    full = _bpe_sql(table)
    # reuse the WITH block verbatim; swap the merge-table UNION ALL
    # tail (which starts at the round-1 out) for the encode SELECT
    head = full.split("\n    SELECT 1 AS round")[0]
    return (
        head
        + f"""
    SELECT token, n FROM (
      SELECT t.token AS token, CAST(sum(freq) AS BIGINT) AS n
      FROM w{_BPE_ROUNDS}, unnest(s) AS t(token)
      GROUP BY 1
    ) ORDER BY n DESC, token LIMIT {top}
    """
    )


@register(
    "q_bpe_encode",
    oracle=_bpe_encode_sql("documents"),
    doc="BPE ENCODE — the learned merge table applied back to the "
    "corpus: after the 6 q_bpe_merges rounds, every word is segmented "
    "into its final subword tokens, and the query returns the "
    "frequency-weighted token census (top 40). Completes the "
    "tokenizer chain: pre-tokenize (q_tokenize_bpe) -> induce "
    "(q_bpe_merges) -> encode. Scale shape identical to q_bpe_merges "
    "(the single O(corpus) word-frequency scan is the only large "
    "stage; the encode explode runs over the compact vocab).",
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    _out, cur = _bpe_learn(spark, sf_dir)
    return (
        cur.select(F.explode("s").alias("token"), "freq")
        .groupBy("token")
        .agg(F.sum("freq").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(40)
    )


@register(
    "q_token_fertility",
    oracle=f"""
    SELECT lang,
           CAST(sum(len(regexp_extract_all(text, '{_BPE_PATTERN}'))) AS BIGINT)
             AS n_tokens,
           CAST(sum(len(list_filter(
             string_split_regex(trim(text), '\\s+'), w -> w != ''))) AS BIGINT)
             AS n_words,
           round(CAST(sum(len(regexp_extract_all(text, '{_BPE_PATTERN}'))) AS DOUBLE)
                 / greatest(sum(len(list_filter(
                     string_split_regex(trim(text), '\\s+'), w -> w != ''))), 1), 6)
             AS fertility
    FROM documents GROUP BY lang
    """,
    doc="Tokenizer fertility per language: pre-tokenizer tokens per "
    "whitespace word — the standard metric for how hard a tokenizer "
    "fragments a language (fertility ~1 is ideal; high fertility "
    "inflates sequence lengths and training cost). One JVM-regexp "
    "scan + one tiny per-lang aggregate.",
)
def q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_PATTERN), F.lit(0)))
    words = F.size(
        F.filter(
            F.split(F.trim(F.col("text")), r"\s+"), lambda w: w != ""
        )
    )
    agg = d.groupBy("lang").agg(
        F.sum(toks).cast("bigint").alias("n_tokens"),
        F.sum(words).cast("bigint").alias("n_words"),
    )
    return agg.select(
        "lang",
        "n_tokens",
        "n_words",
        F.round(
            F.col("n_tokens").cast("double")
            / F.greatest(F.col("n_words"), F.lit(1)),
            6,
        ).alias("fertility"),
    )


@register(
    "q_readability",
    oracle="""
    WITH m AS (
      SELECT doc_id, lang,
             CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS DOUBLE)
               AS words,
             CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                  AS DOUBLE) AS sents,
             CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS DOUBLE)
               AS sylls
      FROM documents)
    SELECT doc_id, lang, CAST(words AS BIGINT) AS n_words,
           round(CAST(206.835 AS DOUBLE)
                 - CAST(1.015 AS DOUBLE) * (words / sents)
                 - CAST(84.6 AS DOUBLE) * (sylls / words), 4) AS flesch
    FROM m
    WHERE words > 0
    ORDER BY doc_id
    """,
    doc="Flesch reading-ease per document — the classic readability "
    "quality signal (FineWeb/Dolma-style filters gate on it). Words, "
    "sentences and syllables are regex-group counts (syllable ~ vowel "
    "run — the standard cheap heuristic), so both engines count with "
    "the same pattern semantics and the arithmetic is identical IEEE "
    "ops: exact oracle. Map-only over the corpus: no shuffle at all "
    "at any scale (the filter consuming it is a narrow WHERE).",
)
def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # idx=0: Spark's regexp_extract_all defaults to capture group 1,
    # DuckDB's to the whole match — pin group 0 so both count matches
    words = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z0-9]+"), F.lit(0))
    ).cast("double")
    sents = F.greatest(
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[.!?]+"), F.lit(0))),
        F.lit(1),
    ).cast("double")
    sylls = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), F.lit(0))
    ).cast("double")
    m = d.select("doc_id", "lang", words.alias("words"), sents.alias("sents"), sylls.alias("sylls"))
    return (
        m.where(F.col("words") > 0)
        .select(
            "doc_id",
            "lang",
            F.col("words").cast("bigint").alias("n_words"),
            F.round(
                F.lit(206.835)
                - F.lit(1.015) * (F.col("words") / F.col("sents"))
                - F.lit(84.6) * (F.col("sylls") / F.col("words")),
                4,
            ).alias("flesch"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_collocations",
    oracle=r"""
    WITH toks AS (
      SELECT list_filter(
               list_transform(
                 string_split_regex(trim(text), '[^A-Za-z0-9]+'),
                 t -> lower(t)),
               t -> length(t) > 0) AS ts
      FROM documents
    ),
    uni AS (
      SELECT w, count(*) AS cw FROM (
        SELECT unnest(ts) AS w FROM toks) GROUP BY w
    ),
    nu AS (SELECT CAST(sum(cw) AS DOUBLE) AS n_uni FROM uni),
    bg AS (
      SELECT a, b, count(*) AS cab FROM (
        SELECT unnest(list_transform(range(1, len(ts)), i -> ts[i])) AS a,
               unnest(list_transform(range(1, len(ts)), i -> ts[i + 1])) AS b
        FROM toks WHERE len(ts) >= 2)
      GROUP BY a, b
    ),
    nb AS (SELECT CAST(sum(cab) AS DOUBLE) AS n_bi FROM bg)
    SELECT a || ' ' || b AS bigram, cab,
           round(CAST(cab AS DOUBLE) * (SELECT n_uni FROM nu)
                 * (SELECT n_uni FROM nu)
                 / ((SELECT n_bi FROM nb) * CAST(ua.cw AS DOUBLE)
                    * CAST(ub.cw AS DOUBLE)), 6) AS lift
    FROM bg
    JOIN uni ua ON ua.w = a
    JOIN uni ub ON ub.w = b
    WHERE cab >= 5
    ORDER BY lift DESC, bigram
    LIMIT 20
    """,
    doc="Collocation mining by LIFT — p(ab)/(p(a)p(b)), i.e. exp(PMI): "
    "the monotone-in-PMI association score, chosen over log-PMI so the "
    "oracle needs NO transcendental functions (cross-engine ln can "
    "differ in the last ulp; ratios of counts are identical IEEE "
    "ops). The standard phrase/term extractor for corpus analysis. "
    "Plan: one tokenize pass feeds both the unigram and bigram "
    "counts, 1-row totals broadcast, the scoring join keys on the "
    "head word — O(distinct bigrams) shuffle, min-support cab >= 5 "
    "bounds the scored set.",
)
def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.transform(
            F.split(F.trim(F.col("text")), "[^A-Za-z0-9]+"),
            lambda t: F.lower(t),
        ),
        lambda t: F.length(t) > 0,
    )
    tdf = d.select(toks.alias("ts")).localCheckpoint(eager=False)
    uni = (
        tdf.select(F.explode("ts").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
    )
    a = F.col("ts")
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(a) - 1),
        lambda i: F.struct(
            F.element_at(a, i).alias("a"), F.element_at(a, i + 1).alias("b")
        ),
    )
    bg = (
        tdf.where(F.size("ts") >= 2)
        .select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("cab"))
    )
    n_uni = uni.agg(F.sum("cw").cast("double").alias("n_uni"))
    n_bi = bg.agg(F.sum("cab").cast("double").alias("n_bi"))
    ua = uni.select(F.col("w").alias("a"), F.col("cw").alias("ca"))
    ub = uni.select(F.col("w").alias("b"), F.col("cw").alias("cb"))
    lift = F.round(
        F.col("cab").cast("double") * F.col("n_uni") * F.col("n_uni")
        / (F.col("n_bi") * F.col("ca").cast("double") * F.col("cb").cast("double")),
        6,
    )
    return (
        bg.where(F.col("cab") >= 5)
        .join(ua, "a")
        .join(ub, "b")
        .crossJoin(F.broadcast(n_uni))
        .crossJoin(F.broadcast(n_bi))
        .select(
            F.concat(F.col("a"), F.lit(" "), F.col("b")).alias("bigram"),
            "cab",
            lift.alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "bigram")
        .limit(20)
    )


@register(
    "q_zipf_slope",
    oracle=r"""
    WITH toks AS (
      SELECT lang, unnest(list_filter(
               list_transform(
                 string_split_regex(trim(text), '[^A-Za-z0-9]+'),
                 t -> lower(t)),
               t -> length(t) > 0)) AS w
      FROM documents),
    tf AS (
      SELECT lang, w, CAST(count(*) AS BIGINT) AS f
      FROM toks GROUP BY lang, w),
    ranked AS (
      SELECT lang, f,
             row_number() OVER (PARTITION BY lang
                                ORDER BY f DESC, w) AS r
      FROM tf)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_ranks,
           round(regr_slope(ln(CAST(f AS DOUBLE)),
                            ln(CAST(r AS DOUBLE))), 6) AS zipf_slope
    FROM ranked
    WHERE r <= 100
    GROUP BY lang
    ORDER BY lang
    """,
    doc="Zipf-law exponent per language: OLS slope of ln(freq) on "
    "ln(rank) over each language's top-100 tokens — the "
    "distributional-health diagnostic for generated/boilerplate "
    "corpora (natural text ≈ -1; templated text flattens, spam "
    "steepens). Token census is the same explode → (lang, tok) "
    "groupBy as the TF-IDF family (shuffle carries partial counts); "
    "ranks are deterministic ((freq DESC, token) tie-break) and the "
    "regression runs on ≤100 exact-integer points per lang, so both "
    "engines feed identical (ln r, ln f) pairs to regr_slope; "
    "round(6) absorbs accumulation-order ulps. 100 TB shape: one "
    "token shuffle + a WindowGroupLimit-able rank per lang.",
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.filter(
        F.transform(
            F.split(F.trim(F.col("text")), "[^A-Za-z0-9]+"),
            lambda t: F.lower(t),
        ),
        lambda t: F.length(t) > 0,
    )
    tf = (
        d.select("lang", F.explode(toks).alias("w"))
        .groupBy("lang", "w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    w_rank = Window.partitionBy("lang").orderBy(F.col("f").desc(), "w")
    ranked = tf.select(
        "lang", "f", F.row_number().over(w_rank).alias("r")
    ).where(F.col("r") <= 100)
    return (
        ranked.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_ranks"),
            F.round(
                F.regr_slope(
                    F.log(F.col("f").cast("double")),
                    F.log(F.col("r").cast("double")),
                ),
                6,
            ).alias("zipf_slope"),
        )
        .orderBy("lang")
    )
