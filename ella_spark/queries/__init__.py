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


def _rank(name: str) -> int:
    """Priority tier for the driver's budget-limited prefix:

    0. LLM-pipeline flagships (dedup / ANN / text) — absent from
       CORRECTNESS_r01, the round-1 top gap
    1. time-series / window / array ops — the engine's TSDB identity
    2. TPC-H shapes + aggregate families
    3. generic SQL surface (scalar fns, set ops, subqueries) — all
       green in round 1, lowest re-verification risk
    """
    if name.startswith(("q_dedup", "q_ann")) or name in {
        "q_token_count", "q_quality_score", "q_lang_id", "q_doc_fingerprint",
        "q_lang_source_stats", "q_tfidf_top_terms", "q_tokenize_bpe",
        "q_media_features", "q_strip_boilerplate", "q_embed_quantize",
        "q_stratified_sample", "q_decontaminate", "q_winnow_fingerprint",
        "q_chunk_documents", "q_pack_sequences", "q_quality_repetition",
        "q_pii_scrub", "q_mix_resample", "q_kmeans_embeddings",
        "q_semantic_dedup",
    }:
        return 0
    if name in {
        # Promoted into the checked-50 prefix for round 3: q_agg_stats
        # was round 1's only hash mismatch (fixed via exact decimal-sum
        # variance) and needs a driver-verified green row; q1 is the
        # headline bench query. They displace the four array queries,
        # whose rows were already green in round 1 (and rounds 1+2 for
        # basics/norms) with unchanged code since.
        "q_agg_stats", "q1_pricing_summary",
        "q_date_bin_5min", "q_date_trunc_parts", "q_latest_per_key",
        "q_time_range_scan", "q_session_gaps", "q_json_props",
        "q_event_type_pivot", "q_asof_join", "q_asof_join_forward",
        "q_funnel_steps", "q_retention_cohorts",
        "q_range_join", "q_gap_fill", "q_rolling_1h",
        "q_rank_per_group", "q_running_sum", "q_lag_lead",
        "q_ntile_percentiles", "q_first_last_value", "q_array_basics",
        "q_vector_norms", "q_vector_arith", "q_label_centroid_dist",
    }:
        return 1
    if name in {
        "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
        "q6_forecast_revenue", "q10_returned_items", "q14_promo_effect",
        "q_agg_stats", "q_corr_covar", "q_rollup", "q_grouping_sets",
        "q_cube", "q_having", "q_approx_aggs", "q_array_bool_aggs",
        "q_outer_join", "q_full_outer_join", "q_semi_anti_join",
        "q4_order_priority", "q7_volume_shipping", "q8_market_share",
        "q12_late_lines", "q13_cust_distribution", "q15_top_supplier",
        "q17_small_qty_revenue", "q18_large_volume_cust",
        "q19_bracket_revenue", "q21_waiting_suppliers",
        "q22_dormant_customers", "q2_min_cost_supplier",
        "q9_product_type_profit", "q11_important_parts",
        "q16_supplier_part_counts", "q20_excess_share_suppliers",
    }:
        return 2
    return 3


def _reorder() -> None:
    """Stable-sort REGISTRY by tier (insertion order within a tier)."""
    items = sorted(REGISTRY.items(), key=lambda kv: _rank(kv[0]))
    ordered = dict(items)
    REGISTRY.clear()
    REGISTRY.update(ordered)
