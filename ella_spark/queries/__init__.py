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
# Tier sets below were recomputed for ROUND 11 from the union of
# CORRECTNESS_r01-r10 (newest-green histogram: r10:50, r9:50, r8:50,
# r7:48; never-green = only the no-oracle names — verified
# programmatically, see tools/rotation_audit.py). With current round
# R=11 and MAX_STALE=3, every oracle-paired name whose newest green is
# r7 would be 4 rounds stale outside the prefix, so the checked-50 is
# exactly: queries ADDED this round (first driver row, at most
# 50 - 48 = 2 of them — the executable growth budget,
# tests/test_fixtures.py::test_next_round_rotation_budget_feasible),
# then ALL 48 r7-latest greens, then r8 greens fill any remaining
# slots in registration order. The staleness invariant (no
# oracle-paired name's newest green older than 3 rounds outside the
# current prefix) is executable: tests/test_fixtures.py::
# test_checked_prefix_staleness_bound recomputes it from the
# CORRECTNESS_r* files on disk every run.

# Queries added this round rank 0 — first chance at a real driver row.
# HARD BUDGET: len(_NEW_THIS_ROUND) + 48 stale names must fit in the
# checked-50 prefix, so at most 2 additions this round (enforced by
# test_next_round_rotation_budget_feasible).
_NEW_THIS_ROUND: set[str] = {
    # not new code — newly ORACLE-PAIRED this round (the Horner hash
    # replayed in DuckDB HUGEINT), closing the registry's only
    # never-driver-checked name (VERDICT r10 #4); spends 1 of the 2
    # budget slots, leaving capacity at 199/200
    "q_dedup_winnow_fast",
}

# newest hash-green = r7 — 4 rounds stale at round 11: the entire tier
# MUST be re-checked this round (leads the prefix after the new names).
_STALE_R7 = {
    "q_ann_ivf", "q_ann_lsh", "q_asof_join", "q_asof_join_forward",
    "q_bm25_search", "q_char_entropy", "q_cumulative_distinct",
    "q_curation_pipeline", "q_data_profile", "q_dedup_incremental",
    "q_dedup_keep_best", "q_dedup_minhash_portable",
    "q_dedup_simhash_portable", "q_dedup_soft_weight",
    "q_distinct_overlap", "q_embed_pca", "q_embed_quantize",
    "q_event_transitions", "q_event_type_pivot",
    "q_first_touch_attribution", "q_funnel_steps", "q_gap_fill",
    "q_gopher_quality", "q_hard_negatives", "q_heavy_hitters",
    "q_importance_weights", "q_interpolate_linear", "q_json_props",
    "q_kcore_converged", "q_lm_perplexity", "q_minmax_scale",
    "q_ngram_decontaminate", "q_paragraph_dedup", "q_quality_classifier",
    "q_range_join", "q_recursive_reachability", "q_retention_cohorts",
    "q_rolling_1h", "q_seasonal_baseline", "q_semantic_decontaminate",
    "q_semantic_dedup", "q_sessionize_stats", "q_shard_assignment",
    "q_source_caps", "q_temperature_resample", "q_top_bigrams",
    "q_train_test_split", "q_winsorize",
}

# newest hash-green = r8 — due next round (r12); fill any remaining
# checked-50 slots in registration order.
_R8_GREEN = {
    "q11_important_parts", "q12_late_lines", "q13_cust_distribution",
    "q15_top_supplier", "q16_supplier_part_counts",
    "q17_small_qty_revenue", "q18_large_volume_cust",
    "q19_bracket_revenue", "q20_excess_share_suppliers",
    "q21_waiting_suppliers", "q22_dormant_customers",
    "q2_min_cost_supplier", "q4_order_priority", "q7_volume_shipping",
    "q8_market_share", "q9_product_type_profit", "q_ann_brute_force",
    "q_ann_ivfpq_portable", "q_ann_recall", "q_array_bool_aggs",
    "q_asof_tolerance", "q_benford_deviation", "q_chi2_drift",
    "q_counter_rate", "q_decontaminate", "q_dedup_cluster",
    "q_dedup_embedding", "q_dedup_exact", "q_dedup_ngram_jaccard",
    "q_dup_span_fraction", "q_event_trigrams", "q_hill_tail_index",
    "q_kmeans_embeddings", "q_mutual_information", "q_neyman_allocation",
    "q_ngram_novelty", "q_ohlc_bars", "q_pareto_cut", "q_percentile_exact",
    "q_psi_drift", "q_regr_funcs", "q_rolling_zscore", "q_salted_join",
    "q_set_ops_all", "q_stratified_sample", "q_string_funcs2",
    "q_time_convs", "q_token_count", "q_value_histogram", "q_zipf_slope",
}

# newest hash-green = r9.
_R9_GREEN = {
    "q10_returned_items", "q14_promo_effect", "q3_shipping_priority",
    "q5_local_supplier", "q6_forecast_revenue", "q_array_basics",
    "q_autocorrelation", "q_bpe_merges", "q_burstiness",
    "q_case_cast_like", "q_ccnet_buckets", "q_changepoint_cusum",
    "q_conditional_funcs", "q_containment_dedup", "q_corr_covar",
    "q_correlated_subquery", "q_cross_join", "q_cube",
    "q_dedup_edit_distance", "q_dedup_winnow_pairs", "q_distinct",
    "q_doc_fingerprint", "q_earth_movers", "q_full_outer_join",
    "q_grouping_sets", "q_having", "q_in_subquery", "q_inverted_index",
    "q_js_divergence", "q_knn_join", "q_ks_drift", "q_label_centroid_dist",
    "q_lang_id", "q_math_funcs", "q_non_equi_join", "q_order_limit_offset",
    "q_outer_join", "q_page_hinkley", "q_quality_score",
    "q_quantile_rollup", "q_repeated_span_removal", "q_rollup",
    "q_scalar_subquery", "q_semi_anti_join", "q_set_ops",
    "q_span_cleaned_text", "q_string_funcs", "q_trend_robust",
    "q_vector_arith", "q_vector_norms",
}

# newest hash-green = r10 — the freshest records, checked again last.
_R10_GREEN = {
    "q1_pricing_summary", "q_agg_stats", "q_approx_top_k", "q_bpe_encode",
    "q_chunk_documents", "q_clustering_coefficient", "q_collocations",
    "q_cramers_v", "q_date_bin_5min", "q_date_trunc_parts", "q_ewma",
    "q_first_last_value", "q_gap_percentiles", "q_gini_concentration",
    "q_grubbs_outlier", "q_kcore", "q_lag_lead", "q_lang_source_stats",
    "q_lateral_topn", "q_latest_per_key", "q_levene_variance",
    "q_m4_downsample", "q_mad_outliers", "q_mann_whitney",
    "q_media_features", "q_mix_resample", "q_mode_per_group",
    "q_ntile_percentiles", "q_pack_sequences", "q_pagerank", "q_pii_scrub",
    "q_quality_repetition", "q_rank_per_group", "q_readability",
    "q_running_sum", "q_runs_test", "q_session_gaps", "q_string_agg",
    "q_strip_boilerplate", "q_tfidf_top_terms", "q_time_range_scan",
    "q_time_weighted_avg", "q_token_fertility", "q_tokenize_bpe",
    "q_triangle_count", "q_unpivot_measures", "q_user_type_entropy",
    "q_weighted_median", "q_weighted_sample", "q_winnow_fingerprint",
}

# Ordered freshest-last: rank = index + 1 in the prefix sort. Tests
# iterate this tuple (round-agnostic) instead of hardcoding tier names.
_TIERS: tuple[set[str], ...] = (
    _NEW_THIS_ROUND,
    _STALE_R7,
    _R8_GREEN,
    _R9_GREEN,
    _R10_GREEN,
)


def _rank(name: str) -> int:
    """Priority tier for the driver's budget-limited prefix:

    0. queries added this round (or any oracle-paired name not yet in
       a tier set — a brand-new registration defaults to rank 0 so it
       cannot silently land outside the checked prefix)
    1. r7-latest greens — 4 rounds stale at round 11; the whole tier
       must lead the prefix or the staleness test goes red
    2. r8-latest greens (due in r12; fill remaining slots)
    3. r9-latest greens
    4. r10 greens — freshest records, checked again last
    5. no-oracle names — NEVER in the prefix (no hash verdict
       possible; rows-only sanity lives in pytest and each has an
       oracle-paired portable counterpart above)
    """
    if REGISTRY.get(name) is not None and REGISTRY[name].oracle is None:
        return 5
    if name in _NEW_THIS_ROUND:
        return 0
    for i, tier in enumerate(_TIERS[1:], start=1):
        if name in tier:
            return i
    return 0  # unlisted oracle-paired name = new this round


def _reorder() -> None:
    """Stable-sort REGISTRY by tier (insertion order within a tier)."""
    items = sorted(REGISTRY.items(), key=lambda kv: _rank(kv[0]))
    ordered = dict(items)
    REGISTRY.clear()
    REGISTRY.update(ordered)
