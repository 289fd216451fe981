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
        relational,
        tpch_full,
        window,
        timeseries,
        arrays,
    )

    _reorder()
    _LOADED = True


# The driver cuts CORRECTNESS at exactly the first 50 registered
# queries. Round-5 rotation (VERDICT r4 #2): after r4 zeroed the
# never-checked debt, the policy is freshness — newest queries first,
# then the names whose NEWEST driver green is oldest (r1/r2), so no
# oracle-paired query's latest hard record ages past ~2 rounds. All
# names are additionally re-verified locally every run by
# tests/test_oracle_parity.py regardless of tier.

# Queries added in round 5 (no driver row can exist yet).
_NEW_R5 = {
    "q_ann_ivfpq_portable",
    "q_dup_span_fraction",
    "q_ccnet_buckets",
    "q_inverted_index",
    "q_quantile_rollup",
    "q_bpe_merges",
    "q_ann_recall",
    "q_dedup_winnow_pairs",
}

# Names whose newest driver green is r1 (28) or r2 (2) — computed from
# CORRECTNESS_r0{1..4}.json; these are the oldest-green veterans the
# r4 verdict asked to cycle back through the checked-50.
_OLDEST_GREEN = {
    # newest green = r1
    "q3_shipping_priority", "q5_local_supplier", "q6_forecast_revenue",
    "q10_returned_items", "q14_promo_effect", "q_approx_aggs",
    "q_case_cast_like", "q_conditional_funcs", "q_corr_covar",
    "q_correlated_subquery", "q_cross_join", "q_cube", "q_distinct",
    "q_full_outer_join", "q_grouping_sets", "q_having", "q_in_subquery",
    "q_label_centroid_dist", "q_math_funcs", "q_non_equi_join",
    "q_order_limit_offset", "q_outer_join", "q_rollup",
    "q_scalar_subquery", "q_semi_anti_join", "q_set_ops",
    "q_string_funcs", "q_vector_arith",
    # newest green = r2
    "q_array_basics", "q_vector_norms",
}

# Names whose newest driver row is r4 — the freshest greens, demoted
# to the back so r3-latest names fill the remaining prefix slots.
_R4_GREEN = {
    "q11_important_parts", "q12_late_lines", "q13_cust_distribution",
    "q15_top_supplier", "q16_supplier_part_counts",
    "q17_small_qty_revenue", "q18_large_volume_cust",
    "q19_bracket_revenue", "q20_excess_share_suppliers",
    "q21_waiting_suppliers", "q22_dormant_customers",
    "q2_min_cost_supplier", "q4_order_priority", "q7_volume_shipping",
    "q8_market_share", "q9_product_type_profit", "q_ann_ivf",
    "q_ann_ivfpq", "q_ann_lsh", "q_array_bool_aggs", "q_asof_tolerance",
    "q_bm25_search", "q_char_entropy", "q_counter_rate",
    "q_curation_pipeline", "q_dedup_incremental",
    "q_dedup_minhash_portable", "q_dedup_simhash_portable",
    "q_embed_pca", "q_gopher_quality", "q_heavy_hitters",
    "q_importance_weights", "q_lm_perplexity", "q_ngram_decontaminate",
    "q_ohlc_bars", "q_paragraph_dedup", "q_percentile_exact",
    "q_quality_classifier", "q_regr_funcs", "q_salted_join",
    "q_semantic_dedup", "q_set_ops_all", "q_shard_assignment",
    "q_source_caps", "q_string_funcs2", "q_temperature_resample",
    "q_time_convs", "q_top_bigrams", "q_train_test_split",
    "q_value_histogram",
}


def _rank(name: str) -> int:
    """Priority tier for the driver's budget-limited prefix:

    0. queries added this round (first chance at a driver row)
    1. oldest-green veterans (newest driver green is r1/r2)
    2. r3-latest greens (fill the remaining checked-50 slots in
       registration order; the overflow rotates in next round)
    3. r4 greens — freshest records, checked again last
    """
    if name in _NEW_R5:
        return 0
    if name in _OLDEST_GREEN:
        return 1
    if name in _R4_GREEN:
        return 3
    return 2


def _reorder() -> None:
    """Stable-sort REGISTRY by tier (insertion order within a tier)."""
    items = sorted(REGISTRY.items(), key=lambda kv: _rank(kv[0]))
    ordered = dict(items)
    REGISTRY.clear()
    REGISTRY.update(ordered)
