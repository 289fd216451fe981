#!/usr/bin/env python
"""Training-data curation quickstart — beyond the reference's surface:
the LLM-pipeline operators composed end-to-end over the documents
table. Quality-gate -> exact dedup -> benchmark decontamination ->
deterministic mixture resample, as ONE Catalyst plan
(ella_spark.pipelines.curate), then a near-dup MinHash pass and a
quality-score profile from the registry operators.

    python examples/curation_pipeline.py [sf-dir]

sf-dir defaults to /root/testdata/sf0.001 (any dir with
documents.parquet works).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pyspark.sql.functions as F

from ella_spark import pipelines
from ella_spark.queries import all_queries
from ella_spark.session import get_session
from ella_spark.sources import load_table


def main(sf_dir: str | None = None) -> int:
    sf_dir = sf_dir or "/root/testdata/sf0.001"
    spark = get_session("ella_curation_example")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()

    # hold out 5% of the corpus as a fake benchmark: the pipeline
    # must drop any training doc whose content matches it
    benchmark = docs.where(F.col("doc_id") % 20 == 0).select("text")

    curated = pipelines.curate(
        docs,
        min_chars=40,
        benchmark=benchmark,
        keep_permille=800,
    )
    n_kept = curated.count()
    print(f"curate: {n_raw} raw docs -> {n_kept} kept "
          f"(gates + dedup + decontamination + 80% resample)")
    assert 0 < n_kept < n_raw

    # near-dup candidates via the MinHash-LSH registry operator
    pairs = all_queries()["q_dedup_minhash_lsh"](spark, sf_dir)
    print(f"minhash-lsh near-dup candidate pairs: {pairs.count()}")

    # quality profile of the surviving mix, per language (the
    # q_quality_score columns joined back onto the curated rows)
    q = all_queries()["q_quality_score"](spark, sf_dir).join(
        curated.select("doc_id", "lang"), "doc_id"
    )
    prof = (
        q.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("word_density"), 4).alias("avg_word_density"),
            F.round(F.avg(F.col("len_ok").cast("double")), 4).alias("len_ok_rate"),
        )
        .orderBy("lang")
    )
    for row in prof.collect():
        print("  ", row.asDict())
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else None))
