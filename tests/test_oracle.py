"""Differential correctness: every oracle-paired query in the registry,
run at sf0.01 (the driver's correctness scale factor)."""

from __future__ import annotations

import pytest

from spark_jdbc_limit_spark.operators import REGISTRY

from tests.oracle_utils import run_differential

ORACLE_SPECS = [spec for spec in REGISTRY.values() if spec.oracle is not None]


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_differential(spark, sf_correct, spec):
    run_differential(spark, spec, sf_correct)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())


# Cross-SF sweep: the driver's gate runs only at sf0.01; constants tuned
# to one scale (bucket counts, sample sizes, planted-duplicate thresholds)
# are a classic way to be "correct" at the test SF and wrong elsewhere.
# Gated behind an env var so the default suite stays fast — run with
#   SPARK_GRAFT_SF_SWEEP=1 python -m pytest tests/test_oracle.py -k sweep
import os

_SWEEP = bool(os.environ.get("SPARK_GRAFT_SF_SWEEP"))


@pytest.mark.skipif(not _SWEEP, reason="set SPARK_GRAFT_SF_SWEEP=1 to run the cross-SF sweep")
@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_differential_sf0001_sweep(spark, spec):
    run_differential(spark, spec, "/root/testdata/sf0.001")


#: Queries added or materially reworked in the last two rounds. These run
#: the sf0.001 sweep UNGATED (round-6 verdict #6): a scale-tuned constant
#: in a NEW operator must not hide behind the opt-in env var until the
#: next full sweep; entries graduate out once they have survived one.
RECENT_ADDITIONS = [
    # (round-6 entries graduated 2026-08-14: every registry query passed
    # the full sf0.001 sweep this round, which is the exit criterion)
    # round 7 (sketch audits oracle-paired; packing restructured; shared SQL cast)
    "agg_approx_distinct",
    "agg_hll_sketch_union",
    "ann_ivf_topk",
    "ann_pq_topk",
    "pack_tokens_sequential",
    "sql_shared_text_rollup",
    "agg_approx_percentile_audit",
    "agg_approx_topk_audit",
    "graph_label_propagation",
    "agg_cube",
    "agg_rollup",
    "agg_grouping_sets",
    "join_bloom_prefilter",
    "sample_stratified_exact",
    "graph_connected_components",
    "sort_range_equidepth_audit",
    "dedup_winnowing_fingerprints",
    "events_ab_test_zscore",
    "sort_pareto_skyline",
    "text_bm25_retrieval",
    "dedup_jaccard_prefix_filter",
    "text_bigram_perplexity",
    "join_anti_null_aware",
    "udf_cogrouped_order_fill",
    "agg_loo_target_encoding",
    "agg_bitmap_distinct",
    "sql_recursive_hierarchy_walk",
    "ann_hybrid_rrf_fusion",
    "scalar_try_safe_funcs",
    # round 8
    "agg_count_min_frequency_audit",
    "source_parquet_dynamic_partition_pruning",
    "pipeline_snapshot_diff",
    "scalar_sql_udf",
    "scalar_collation_ci_group",
    "agg_hll_intersection_audit",
    "agg_cms_join_size_audit",
    "sort_zorder_skipping_audit",
    "agg_table_fingerprint",
    "events_attribution_multitouch",
    "agg_sampled_sum_ht_audit",
    "pipeline_epoch_shuffle_audit",
    "udf_arrow_map_batches",
    "pipeline_batch_padding_audit",
    "split_group_kfold_audit",
    "orders_trend_mann_kendall",
    "graph_bfs_hops",
    "window_interval_range_frame",
    "source_parquet_nested_pruning",
    "source_versioned_time_travel",
    "source_versioned_incremental",
    "source_versioned_merge_upsert",
    "sql_shared_group_order_all",
    "set_union_by_name_missing",
    "text_pmi_collocations",
    "embedding_int8_quantization_audit",
    "window_count_distinct_workaround",
    "orders_seasonality_dow_index",
]
_RECENT_NAMES = [n for n in RECENT_ADDITIONS if n in REGISTRY]
_RECENT_SPECS = [REGISTRY[n] for n in _RECENT_NAMES]


def test_recent_additions_all_registered():
    missing = [n for n in RECENT_ADDITIONS if n not in REGISTRY]
    assert not missing, f"RECENT_ADDITIONS names drifted from the registry: {missing}"


@pytest.mark.parametrize("spec", _RECENT_SPECS, ids=_RECENT_NAMES)
def test_recent_additions_sf0001(spark, spec):
    run_differential(spark, spec, "/root/testdata/sf0.001")


def test_no_registry_query_emits_complex_typed_columns(spark, sf_dir):
    """Guardrail for the round-4 failure class: the correctness harness
    canonicalizes with pandas sort_values/hashing and CANNOT compare
    array/map/struct cells — every registered query must emit scalar
    columns only (serialize arrays with concat_ws and mirror with
    array_to_string in the oracle). Schema-only: nothing executes."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from spark_jdbc_limit_spark.operators import REGISTRY

    offenders = []
    for name, spec in REGISTRY.items():
        for field in spec.builder(spark, sf_dir).schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append((name, field.name, field.dataType.simpleString()))
    assert not offenders, f"complex-typed output columns: {offenders}"
