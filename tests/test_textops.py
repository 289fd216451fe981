"""Planted-duplicate semantics for the winnowing near-dup variants.

q_dedup_winnow_pairs (md5 grams — the DuckDB-oracle vehicle) and
q_dedup_winnow_fast (xxhash64 grams — the JVM-codegen perf vehicle)
run the SAME pipeline with different gram digests. Winnowing's
guarantee is hash-independent: any shared substring of length
>= w + k - 1 (11 chars here) yields at least one shared fingerprint,
so planted near-duplicates must surface under BOTH digests; marginal
corpus pairs may legitimately differ (different hash -> different
window minima), which is why the fast path is rows-only and this
planted test is its semantics pin.
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def winnow_dir(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("winnowsf")
    lorem = (
        "the quick brown fox jumps over the lazy dog while the "
        "cunning red squirrel hoards acorns beneath the ancient oak "
        "tree near the riverbank every single autumn morning"
    )
    other = (
        "distributed query engines compile declarative plans into "
        "vectorized physical operators that exchange arrow batches "
        "across shuffle boundaries with adaptive re-optimization"
    )
    docs = [
        (1, lorem, "en", "web"),
        (2, lorem + " indeed", "en", "web"),  # near-dup of 1
        (3, other, "en", "web"),
        (4, "short text", "en", "web"),  # below k+w-1 after trim: dropped
        (5, "totally unrelated tiny piece of prose about gardening tools", "en", "web"),
    ]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(base / "documents.parquet")
    )
    return str(base)


@pytest.mark.parametrize("variant", ["q_dedup_winnow_pairs", "q_dedup_winnow_fast"])
def test_winnow_variants_find_planted_pair(spark, winnow_dir, variant):
    from ella_spark.queries import all_queries

    fn = all_queries()[variant]
    rows = {(r.id_a, r.id_b): r for r in fn(spark, winnow_dir).collect()}
    # the planted near-dup pair is found with dominant overlap ...
    assert (1, 2) in rows, rows
    assert rows[(1, 2)].overlap >= 0.8
    # ... and unrelated docs never pair
    assert all(k == (1, 2) for k in rows), rows


def test_winnow_variants_agree_on_planted_pair(spark, winnow_dir):
    """Both digests rank the planted duplicate as their ONLY pair —
    the semantics contract between the oracle and perf vehicles."""
    from ella_spark.queries import all_queries

    qs = all_queries()
    md5_pairs = {
        (r.id_a, r.id_b)
        for r in qs["q_dedup_winnow_pairs"](spark, winnow_dir).collect()
    }
    xx_pairs = {
        (r.id_a, r.id_b)
        for r in qs["q_dedup_winnow_fast"](spark, winnow_dir).collect()
    }
    assert md5_pairs == xx_pairs == {(1, 2)}


def _ref_winnow_fps(t: str, k: int = 8, w: int = 4) -> set[int]:
    """Per-document winnowing reference: naive Horner rolling hash +
    naive sliding min over one doc's (already lower/trimmed) text.
    Deliberately scalar Python — the ground truth the batched numpy
    pipeline (batch concat, boundary masks, lexsort dedup) must match
    exactly, doc by doc."""
    b = t.encode("utf-8")
    B, mask = 1099511628211, (1 << 64) - 1
    hs = []
    for i in range(len(b) - k + 1):
        h = 0
        for byte in b[i : i + k]:
            h = (h * B + byte) & mask
        hs.append(h)
    mins = {min(hs[i : i + w]) for i in range(len(hs) - w + 1)}
    return {m - (1 << 64) if m >= (1 << 63) else m for m in mins}


@pytest.mark.parametrize("corpus", ["planted", "sf"])
def test_winnow_fast_fingerprints_match_reference(spark, winnow_dir, corpus):
    """Standing doc-by-doc equivalence pin for the numpy fast path
    (VERDICT r6 #6), at two corpus sizes: the tiny planted corpus and
    the real sf0.001 documents table. Any refactor of the batched
    rolling hash / sliding min / boundary masking that drifts from
    winnowing semantics fails here."""
    from ella_spark.queries.textops import winnow_fingerprints_fast
    from ella_spark.sources import load_table
    from pyspark.sql import functions as F

    sf_dir = winnow_dir if corpus == "planted" else "/root/testdata/sf0.001"
    k, w = 8, 4
    got: dict[int, set[int]] = {}
    for r in winnow_fingerprints_fast(spark, sf_dir, k=k, w=w).collect():
        got.setdefault(r.doc_id, set()).add(r.fp)

    texts = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.lower(F.trim(F.col("text"))).alias("t"))
        .where(F.length("t") >= k + w - 1)
        .collect()
    )
    assert texts and set(got) == {r.doc_id for r in texts}
    for r in texts:
        assert got[r.doc_id] == _ref_winnow_fps(r.t, k, w), r.doc_id


def test_spark_sql_quote_backslash_roundtrip(spark):
    """Tokens interpolated into Spark F.expr must survive backslashes:
    Spark's parser treats \\ as an escape inside string literals where
    DuckDB does not (the round-5 ADVICE finding on the BPE merge
    fold). spark_sql_quote escapes both quotes and backslashes."""
    from pyspark.sql import functions as F

    from ella_spark.queries import spark_sql_quote

    for tok in ["a\\b", "it's", "\\", "a'\\'b", "plain"]:
        lit = spark_sql_quote(tok)
        got = spark.range(1).select(F.expr(lit).alias("v")).collect()[0].v
        assert got == tok, (tok, lit, got)
