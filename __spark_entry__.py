"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the
``vector_databases___hydrate_chroma_db_collection_spark`` package;
this module is a thin adapter over its query registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from vector_databases___hydrate_chroma_db_collection_spark import queries as _registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Exact top-5 cosine neighbors of document 1's embedding — the
    retrieval query the reference hydrates Chroma to serve
    (reference README.md:5).
    """
    return _registry.QUERIES["knn_top5_cosine"](spark, SMOKE_SF_DIR)


# The driver checks a budgeted subset per round in iteration order
# (50 in r1, 50 in r2 — CORRECTNESS_r{N}.json), so queries WITHOUT a
# driver correctness row yet must come first, then the least-recently
# checked, so every registry entry accumulates a hard check across
# rounds. Local parity for all entries is committed in
# PARITY_LOCAL.json (same protocol).
_R1_CHECKED = frozenset(
    {
        "knn_top5_cosine", "q1_pricing_summary", "q3_shipping_priority",
        "q5_region_revenue", "join_left_order_counts",
        "join_semi_customers_with_urgent_orders",
        "join_anti_customers_without_orders", "join_full_nation_activity",
        "join_range_shipped_within_30d", "window_top3_orders_per_customer",
        "window_running_spend", "window_lag_event_value", "agg_rollup_returns",
        "agg_cube_orders", "agg_distinct_suppliers", "sort_top10_orders",
        "setop_union_segments", "setop_intersect_active_years",
        "setop_except_inactive", "scalar_string_part", "scalar_math_lineitem",
        "scalar_date_orders", "scalar_json_events", "scalar_array_embeddings",
        "scalar_map_metadata", "text_stats_by_lang", "text_quality_scores",
        "text_language_id", "text_fingerprint", "text_bpe_token_counts",
        "sample_hash_deterministic", "sample_stratified_by_lang",
        "dedup_exact_groups", "dedup_jaccard_pairs", "dedup_minhash_lsh_pairs",
        "dedup_simhash_values", "text_rolling_fingerprint",
        "embedding_int8_quantization", "dedup_embedding_cosine_pairs",
        "hydrate_canonical_shape", "stream_tumbling_event_stats",
        "stream_sliding_user_activity", "stream_session_windows",
        "stream_dedup_by_id", "knn_join_top3", "knn_join_gemm_top3",
        "vector_l2_consecutive", "embedding_stats_by_label",
        "agg_having_active_parts", "agg_median_percentiles",
    }
)


_R2_CHECKED = frozenset(
    {
        "agg_approx_count_distinct", "agg_grouping_sets",
        "agg_statistics", "apply_in_pandas_label_centroids",
        "collection_knn_end_to_end", "dedup_connected_components",
        "dedup_embedding_neardup_ivf", "explode_event_type_chars",
        "join_asof_prior_day_spend", "join_cross_nullsafe",
        "join_right_supplier_nations", "multimodal_image_features",
        "pandas_udf_cosine", "pipeline_training_data",
        "pivot_status_by_priority", "q10_returned_items",
        "q14_promo_revenue_ratio", "q17_small_quantity_revenue",
        "q18_large_orders", "q19_disjunctive_predicates",
        "q20_bulk_suppliers", "q21_multi_supplier_orders",
        "q22_idle_rich_customers", "q2_cheapest_part_suppliers",
        "q4_priority_with_late_lines", "q6_revenue_delta",
        "q7_nation_trade_flows", "q8_market_share",
        "q9_product_type_profit", "scalar_array_algebra",
        "scalar_array_functions", "scalar_case_null_handling",
        "scalar_date_arithmetic", "scalar_from_json_events",
        "scalar_string_extended", "scalar_struct_map_ops",
        "setop_intersect_all_nations", "setop_union_all_priorities",
        "setop_union_by_name", "sql_entry_top_customers",
        "sql_udf_registered", "stream_attribution_join",
        "text_chunking", "text_levenshtein_names",
        "text_repetition_quality", "unpivot_part_attributes",
        "window_ntile_deciles", "window_range_frame_revenue",
        "window_rank_analytics", "window_sessionize_events",
    }
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2,
    riskiest-first: entries with no driver correctness row yet lead."""
    never = {
        n: fn
        for n, fn in _registry.QUERIES.items()
        if n not in _R1_CHECKED | _R2_CHECKED
    }
    r1_only = {
        n: fn
        for n, fn in _registry.QUERIES.items()
        if n in _R1_CHECKED and n not in _R2_CHECKED
    }
    rest = {
        n: fn for n, fn in _registry.QUERIES.items() if n in _R2_CHECKED
    }
    return {**never, **r1_only, **rest}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin for each oracle-checkable query."""
    return dict(_registry.ORACLES)
