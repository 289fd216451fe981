"""Query registry: the judgeable operator inventory (SURVEY.md §2).

Each entry pairs a Spark-first DataFrame implementation with an
ANSI-SQL oracle that DuckDB runs over the same parquet tables. Column
names are aliased identically on both sides (the driver hash-compares
by sorted column name).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → non-SQL-expressible; driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def sql_quote(s: str) -> str:
    """SQL single-quoted string literal ('' = escaped quote) — the one
    shared quoting helper for generated oracle/driver SQL."""
    return "'" + s.replace("'", "''") + "'"


def spark_sql_quote(s: str) -> str:
    """SPARK-dialect single-quoted literal: Spark's parser (default
    ``spark.sql.parser.escapedStringLiterals=false``) treats backslash
    as an escape character inside string literals where DuckDB treats
    it literally — so text interpolated into ``F.expr``/Spark SQL must
    escape backslashes too, or a corpus token containing ``\\``
    mis-parses (and silently diverges from the DuckDB oracle)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def register(name: str, oracle: str | None, doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, spark=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _load()
    return {name: spec.spark for name, spec in REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load()
    return {
        name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None
    }


_LOADED = False


def _load() -> None:
    """Import query modules (each registers into REGISTRY on import)."""
    global _LOADED
    if _LOADED:
        return
    # Registration order matters: the correctness driver walks queries in
    # registration order under a run budget (CORRECTNESS_r01 covered exactly
    # the first 50 registered queries). The beyond-reference LLM-pipeline
    # operators (dedup / ANN / text) register FIRST so they are always
    # within the checked prefix.
    from ella_spark.queries import (  # noqa: F401
        dedup,
        similarity,
        textops,
        curation,
        graphalgo,
        relational,
        tpch_full,
        window,
        timeseries,
        arrays,
    )

    _reorder()
    _LOADED = True


# The driver cuts CORRECTNESS at exactly the first 50 registered
# queries. Rotation policy (since r6): newest queries first (first
# chance at a driver row), then names whose NEWEST driver green is
# OLDEST, so no oracle-paired query's latest hard record ages past
# ~2 rounds. NO-ORACLE names are excluded from the prefix entirely —
# they can never produce a hash verdict; their hard signal lives in
# the oracle-paired *_portable counterparts, and their rows-only
# sanity check still runs via tests. All names are additionally
# re-verified locally every run by tests/test_oracle_parity.py
# regardless of tier.
#
# Tier sets below were recomputed for round 8 from the union of
# CORRECTNESS_r01–r07 (newest-green histogram: r7:49, r6:50, r5:47,
# r4:27; never-green = q_pareto_cut (oracle HUGEINT typing, fixed
# this round) plus the 5 no-oracle names).

# Pinned into the first slots this round (VERDICT r7 #1/#2/#4):
# q_pareto_cut's r7 hash-fail was an oracle typing defect (now CAST
# AS BIGINT) and q_rolling_zscore's r7 green was vacuous (0 rows;
# gate lowered to n >= 3) — both need a real driver row. New
# round-8 queries also rank 0 (first chance at a driver row).
_NEW_THIS_ROUND: set[str] = {
    "q_pareto_cut",
    "q_rolling_zscore",
    # added in round 8
    "q_psi_drift",
    "q_chi2_drift",
    "q_zipf_slope",
    "q_neyman_allocation",
    "q_benford_deviation",
    "q_ngram_novelty",
    "q_hill_tail_index",
    "q_event_trigrams",
    "q_mutual_information",
}

# newest hash-green = r4 — the oldest hard records (the names that
# overflowed r7's checked-50): promote first after the pins.
_STALE_R4 = {
    "q11_important_parts", "q12_late_lines", "q13_cust_distribution",
    "q15_top_supplier", "q16_supplier_part_counts",
    "q17_small_qty_revenue", "q18_large_volume_cust",
    "q19_bracket_revenue", "q20_excess_share_suppliers",
    "q21_waiting_suppliers", "q22_dormant_customers",
    "q2_min_cost_supplier", "q4_order_priority", "q7_volume_shipping",
    "q8_market_share", "q9_product_type_profit", "q_array_bool_aggs",
    "q_asof_tolerance", "q_counter_rate", "q_ohlc_bars",
    "q_percentile_exact", "q_regr_funcs", "q_salted_join",
    "q_set_ops_all", "q_string_funcs2", "q_time_convs",
    "q_value_histogram",
}

# newest hash-green = r5 — next-oldest; fill the remaining checked-50
# slots in registration order (overflow rotates in next round).
_R5_GREEN = {
    "q10_returned_items", "q14_promo_effect", "q3_shipping_priority",
    "q5_local_supplier", "q6_forecast_revenue", "q_ann_brute_force",
    "q_ann_ivfpq_portable", "q_ann_recall", "q_array_basics",
    "q_bpe_merges", "q_case_cast_like", "q_ccnet_buckets",
    "q_conditional_funcs", "q_corr_covar", "q_correlated_subquery",
    "q_cross_join", "q_cube", "q_decontaminate", "q_dedup_cluster",
    "q_dedup_embedding", "q_dedup_exact", "q_dedup_ngram_jaccard",
    "q_dedup_winnow_pairs", "q_distinct", "q_dup_span_fraction",
    "q_full_outer_join", "q_grouping_sets", "q_having",
    "q_in_subquery", "q_inverted_index", "q_kmeans_embeddings",
    "q_label_centroid_dist", "q_math_funcs", "q_non_equi_join",
    "q_order_limit_offset", "q_outer_join", "q_quality_score",
    "q_quantile_rollup", "q_rollup", "q_scalar_subquery",
    "q_semi_anti_join", "q_set_ops", "q_stratified_sample",
    "q_string_funcs", "q_token_count", "q_vector_arith",
    "q_vector_norms",
}

# newest hash-green = r7 — the freshest records, checked again last.
_R7_GREEN = {
    "q_semantic_decontaminate", "q_dedup_keep_best",
    "q_dedup_soft_weight", "q_hard_negatives", "q_winsorize",
    "q_kcore_converged", "q_recursive_reachability", "q_data_profile",
    "q_minmax_scale", "q_distinct_overlap", "q_interpolate_linear",
    "q_sessionize_stats", "q_cumulative_distinct",
    "q_event_transitions", "q_first_touch_attribution",
    "q_seasonal_baseline", "q_asof_join", "q_asof_join_forward",
    "q_embed_quantize", "q_event_type_pivot", "q_funnel_steps",
    "q_gap_fill", "q_json_props", "q_range_join",
    "q_retention_cohorts", "q_rolling_1h", "q_ann_ivf", "q_ann_lsh",
    "q_bm25_search", "q_char_entropy", "q_curation_pipeline",
    "q_dedup_incremental", "q_dedup_minhash_portable",
    "q_dedup_simhash_portable", "q_embed_pca", "q_gopher_quality",
    "q_heavy_hitters", "q_importance_weights", "q_lm_perplexity",
    "q_ngram_decontaminate", "q_paragraph_dedup",
    "q_quality_classifier", "q_semantic_dedup", "q_shard_assignment",
    "q_source_caps", "q_temperature_resample", "q_top_bigrams",
    "q_train_test_split",
}


def _rank(name: str) -> int:
    """Priority tier for the driver's budget-limited prefix:

    0. round-8 pins (q_pareto_cut oracle fix, q_rolling_zscore
       de-vacuification) and queries added this round — first
       chance at a real driver row
    1. r4-stale greens — the oldest hard records, due re-verification
    2. r5-latest greens (fill the remaining checked-50 slots in
       registration order; the overflow rotates in next round)
    3. r6-latest greens
    4. r7 greens — freshest records, checked again last
    5. no-oracle names — NEVER in the prefix (no hash verdict
       possible; rows-only sanity lives in pytest and each has an
       oracle-paired portable counterpart above)
    """
    if REGISTRY.get(name) is not None and REGISTRY[name].oracle is None:
        return 5
    if name in _NEW_THIS_ROUND:
        return 0
    if name in _STALE_R4:
        return 1
    if name in _R5_GREEN:
        return 2
    if name in _R7_GREEN:
        return 4
    return 3


def _reorder() -> None:
    """Stable-sort REGISTRY by tier (insertion order within a tier)."""
    items = sorted(REGISTRY.items(), key=lambda kv: _rank(kv[0]))
    ordered = dict(items)
    REGISTRY.clear()
    REGISTRY.update(ordered)
