"""Corpus-wide physical-plan screens (r14 wave 4).

Two exploratory screens over every registry query, complementing the
permanent parametrized tests in tests/test_plan_audit.py (nested
loops, double UDF eval, row-wise Python, rank rewrites — those run
on INITIAL plans and are cheap). These two need full execution, so
they live here and run on demand:

1. **Same-table rescan histogram** (final, post-AQE plan): how many
   times does one parquet file appear as a FileScan after runtime
   exchange reuse? >1 is often fine — the repo's deliberate idioms:

   - tiny-aggregate-joined-back-onto-the-scan (q_psi_drift,
     q_benford_deviation, q_mad_outliers, ...): 2 scans, both
     column-pruned; the alternative (a whole-table window) creates a
     serial stage;
   - set-operation branches (q_set_ops 5, q_set_ops_all 6): each
     branch scans with its own pushed filter;
   - subquery decorrelation (q_correlated_subquery,
     q_semi_anti_join): the standard 2-scan SQL plan shape;
   - recompute-over-materialize (the span/winnow/decontaminate
     family, q_tfidf_top_terms: 3): re-deriving exploded grams is
     cheaper than materializing a frame larger than the corpus —
     "text never moves" constrains shuffles, not scans.

   What it CATCHES is the bounded-frame fan-out class fixed in r14:
   an O(groups)-row aggregate feeding 2-4 consumers, each re-planned
   from the corpus scan because the frame was never cut
   (q_chi2_drift, q_mutual_information, q_importance_weights,
   q_temperature_resample — all now localCheckpoint the frame; the
   graph queries' edge lists were the 45-scan extreme).

2. **Exchange histogram** (initial plan): total exchange counts per
   query, descending. Sudden growth on a query means a
   materialization cut was lost or a new fan-out appeared.

Usage: python tools/plan_screens.py [sf_dir]   (default sf0.001)
"""

from __future__ import annotations

import re
import sys
from collections import Counter

sys.path.insert(0, "/root/repo")

#: (name, table) -> max same-table final-plan scans adjudicated OK.
#: Everything not listed is held to <= 2 (the join-back idiom).
RESCAN_ALLOWED = {
    ("q_set_ops", "orders"): 5,
    ("q_set_ops_all", "orders"): 6,
    ("q_dup_span_fraction", "documents"): 3,
    ("q_ngram_decontaminate", "documents"): 3,
    ("q_span_cleaned_text", "documents"): 3,
    ("q_tfidf_top_terms", "documents"): 3,
    # portable-SQL verification vehicles: ONE SQL text shared with the
    # DuckDB oracle (modulo dialect shims), so Spark inlines the CTE
    # chain — materialization hints would fork the text and defeat the
    # cross-engine point. The SCALE path is the operator twin
    # (similarity.pq_encode / ivf_topk — single corpus pass since the
    # r14 double-eval fixes); recall additionally runs two whole
    # pipelines (approx + exact) by definition.
    ("q_ann_ivfpq_portable", "embeddings"): 8,
    ("q_ann_recall", "embeddings"): 4,
    # r15: the AMERICA semi-prefilter adds a third scan of the
    # CONSTANT 25-row nation dim (semi key frame + the two role
    # joins). Bounded by construction at any SF — never a fact
    # rescan.
    ("q8_market_share", "nation"): 3,
}


def main() -> int:
    from pyspark.sql import SparkSession

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from ella_spark.queries import REGISTRY, _load

    _load()
    exch, flags = [], []
    for name in sorted(REGISTRY):
        df = REGISTRY[name].spark(spark, sf)
        init = df._jdf.queryExecution().executedPlan().toString()
        df.collect()
        final = (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .split("+- == Initial Plan ==")[0]
        )
        exch.append(
            (
                sum(
                    init.count(f"Exchange {k}")
                    for k in ("hashpartitioning", "rangepartitioning", "SinglePartition")
                ),
                name,
            )
        )
        scans = Counter(
            re.findall(r"FileScan parquet[^\n]*?/(\w+)\.parquet", final)
        )
        for table, n in scans.items():
            if n > RESCAN_ALLOWED.get((name, table), 2):
                flags.append((name, table, n))
    print("== same-table final-plan rescans over budget ==")
    for f in flags or [("(none)", "", "")]:
        print("  ", *f)
    print("== top-15 initial-plan exchange counts ==")
    for n, name in sorted(exch, reverse=True)[:15]:
        print(f"  {n:4d}  {name}")
    return 1 if flags else 0


if __name__ == "__main__":
    raise SystemExit(main())
