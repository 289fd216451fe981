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
