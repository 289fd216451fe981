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
# queries. Round-6 rotation (VERDICT r5 #2/#6): newest queries first
# (first chance at a driver row), then names whose NEWEST driver
# green is OLDEST, so no oracle-paired query's latest hard record
# ages past ~2 rounds. NO-ORACLE names are excluded from the prefix
# entirely — they can never produce a hash verdict, and r5 wasted 3
# of its 50 slots on them (structurally capping the round at 47/50);
# their hard signal lives in the oracle-paired *_portable
# counterparts, and their rows-only sanity check still runs via
# tests. All names are additionally re-verified locally every run by
# tests/test_oracle_parity.py regardless of tier.

# Queries added in round 6 (no driver row can exist yet).
_NEW_R6 = {
    "q_dedup_edit_distance",
    "q_containment_dedup",
    "q_lateral_topn",
    "q_unpivot_measures",
    "q_repeated_span_removal",
    "q_span_cleaned_text",
    "q_bpe_encode",
    "q_time_weighted_avg",
    "q_mad_outliers",
    "q_string_agg",
    "q_token_fertility",
    # second wave (added after the mid-round rotation freeze)
    "q_pagerank",
    "q_knn_join",
    "q_weighted_sample",
    "q_mode_per_group",
    "q_ewma",
    "q_readability",
    "q_collocations",
    "q_triangle_count",
    "q_m4_downsample",
    "q_kcore",
    "q_clustering_coefficient",
    "q_weighted_median",
    "q_approx_top_k",
    "q_gini_concentration",
}

# newest hash-green = r3 (computed from CORRECTNESS_r0{1..5}.json):
# the oldest-green veterans — all 35 fit the prefix behind _NEW_R6.
_R3_LATEST = {
    "q1_pricing_summary", "q_agg_stats", "q_asof_join",
    "q_asof_join_forward", "q_chunk_documents", "q_date_bin_5min",
    "q_date_trunc_parts", "q_doc_fingerprint", "q_embed_quantize",
    "q_event_type_pivot", "q_first_last_value", "q_funnel_steps",
    "q_gap_fill", "q_json_props", "q_lag_lead", "q_lang_id",
    "q_lang_source_stats", "q_latest_per_key", "q_media_features",
    "q_mix_resample", "q_ntile_percentiles", "q_pack_sequences",
    "q_pii_scrub", "q_quality_repetition", "q_range_join",
    "q_rank_per_group", "q_retention_cohorts", "q_rolling_1h",
    "q_running_sum", "q_session_gaps", "q_strip_boilerplate",
    "q_tfidf_top_terms", "q_time_range_scan", "q_tokenize_bpe",
    "q_winnow_fingerprint",
}

# newest hash-green = r5 — the freshest records, checked last among
# oracle-paired names (r4 greens take the remaining prefix slots).
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


def _rank(name: str) -> int:
    """Priority tier for the driver's budget-limited prefix:

    0. queries added this round (first chance at a driver row)
    1. r3-latest greens — the oldest hard records, due re-verification
    2. r4-latest greens (fill the remaining checked-50 slots in
       registration order; the overflow rotates in next round)
    3. r5 greens — freshest records, checked again last
    4. no-oracle names — NEVER in the prefix (no hash verdict
       possible; rows-only sanity lives in pytest and each has an
       oracle-paired portable counterpart above)
    """
    if REGISTRY.get(name) is not None and REGISTRY[name].oracle is None:
        return 4
    if name in _NEW_R6:
        return 0
    if name in _R3_LATEST:
        return 1
    if name in _R5_GREEN:
        return 3
    return 2


def _reorder() -> None:
    """Stable-sort REGISTRY by tier (insertion order within a tier)."""
    items = sorted(REGISTRY.items(), key=lambda kv: _rank(kv[0]))
    ordered = dict(items)
    REGISTRY.clear()
    REGISTRY.update(ordered)
