"""Operator surface: every query/operator from SURVEY.md §2 as a named,
oracle-paired entry in a typed registry.

Importing this package populates the registry from the per-category
modules; ``all_queries()`` / ``all_oracles()`` back ``__spark_entry__.py``.
"""

from __future__ import annotations

from spark_jdbc_limit_spark.operators.registry import (
    QuerySpec,
    all_oracles,
    all_queries,
    get_query,
    query,
    REGISTRY,
)

# Register all query modules (import order = catalog order).
from spark_jdbc_limit_spark.operators import relational  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import joins  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import aggregates  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import windows  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import setops  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import scalars  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import dedup  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import similarity  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import text  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import multimodal  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import udfs  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import advanced  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import windowed_events  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import pipeline  # noqa: E402,F401
from spark_jdbc_limit_spark.operators import file_sources  # noqa: E402,F401

# Correctness-sampling rotation: the driver samples the first N registry
# entries in iteration order each round. These names already received a
# driver-side CORRECTNESS row in rounds 1-3, so they rotate to the back of
# the catalog; the queries that have only ever been verified by the local
# DuckDB differential (tests/test_oracle.py) move to the front and fill the
# sampling window. Local tests cover all entries regardless of order.
_DRIVER_SAMPLED_R1_R3 = (
    "agg_approx_distinct", "agg_collect_sorted", "agg_conditional_filter",
    "agg_cube", "agg_distinct_counts", "agg_grouping_sets",
    "agg_hll_sketch_union", "agg_mode_argmax", "agg_pivot", "agg_rollup",
    "agg_stats_by_segment", "count_star_filter", "dedup_exact",
    "dedup_minhash_lsh_candidates", "dedup_minhash_verified",
    "dedup_ngram_jaccard_exhaustive", "filter_null_safe_eq",
    "filter_predicate_algebra", "join_anti", "join_asof_events_orders",
    "join_broadcast_dim", "join_cross_product", "join_interval_overlap",
    "join_multiway_star", "join_outer_coverage", "join_range_hybrid",
    "join_salted_replicated", "join_semi", "join_sortmerge_facts",
    "limit_semantics", "q1_pricing_summary", "scalar_array_funcs",
    "scalar_bitwise_funcs", "scalar_conditional", "scalar_date_funcs",
    "scalar_json_funcs", "scalar_map_funcs", "scalar_math_funcs",
    "scalar_string_funcs", "scan_project_filter_topk",
    "set_dropduplicates_subset", "set_except_all", "set_intersect",
    "set_intersect_all", "set_union_all_counts", "set_union_distinct",
    "text_fingerprint", "text_language_id", "text_quality_score",
    "text_token_stats", "window_distribution", "window_lag_lead",
    "window_locf_ignore_nulls", "window_ntile_quartiles",
    "window_range_frame", "window_ranking_trio", "window_running_agg",
    "window_topk_per_group",
)


#: Queries added in round 4 (never sampled either, but the 47 carried-over
#: fresh queries have waited 3 rounds for a driver row — they keep priority
#: for the sampling window; the round-4 additions queue directly behind
#: them, strong-oracle entries first).
_NEW_R4 = (
    "text_pii_redaction", "text_ngram_topk", "cdc_upsert_latest",
    "embedding_dim_stats", "join_bucketed_colocated", "ann_pq_topk",
    "mix_epochs_upsample", "text_unigram_logprob", "agg_histogram_prices",
    "dedup_passage_exact", "text_tfidf_topk", "global_rownum_two_phase",
    "source_parquet_partition_pruning", "events_gapfill_locf",
    "scd2_user_type_history", "agg_distinct_two_phase",
    "events_funnel_conversion", "multimodal_audio_features",
    "join_fuzzy_name_match", "events_retention_cohorts",
    "events_view_click_unattributed",
)


def _rotate_registry() -> None:
    sampled = set(_DRIVER_SAMPLED_R1_R3)
    new = set(_NEW_R4)
    fresh = {n: s for n, s in REGISTRY.items() if n not in sampled and n not in new}
    added = {n: REGISTRY[n] for n in _NEW_R4 if n in REGISTRY}
    seen = {n: s for n, s in REGISTRY.items() if n in sampled}
    REGISTRY.clear()
    REGISTRY.update(fresh)
    REGISTRY.update(added)
    REGISTRY.update(seen)


_rotate_registry()

__all__ = [
    "QuerySpec",
    "REGISTRY",
    "all_oracles",
    "all_queries",
    "get_query",
    "query",
]
