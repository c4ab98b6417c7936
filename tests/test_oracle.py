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
    # (round-7/8 cohorts graduated 2026-08-15 after the round-8 closing
    # env-gated sf-sweep; round-9/9b cohorts graduated 2026-08-16 after
    # passing BOTH the round-9 and round-10 closing sweeps — the exit
    # criterion; see BASELINE.md closing notes. The sweep gate still
    # covers every registry entry at both SFs.)
    # round 10: the until-settled graph family (convergence loops in
    # front of the driver, rounds_run cross-checked analytically)
    "graph_cc_until_settled",
    "graph_bfs_until_settled",
    "graph_kcore_until_settled",
    "graph_lpa_until_settled",
    # round 10: materially reworked (two_phase_rank ranks; decimal div;
    # rounded-verdict booleans; checkpointed rank relation)
    "agg_spearman_rank_correlation",
    "customer_gini_revenue",
    "pipeline_quantile_normalize_sources",
    "drift_psi_snapshot_halves",
    "drift_ks_two_sample",
    "dq_chi_square_independence",
    "drift_cusum_daily_revenue",
    # round 10b: classical inference (exact-cents moment sums)
    "stats_welch_ttest_segments",
    "stats_anova_oneway_segments",
    # round 10b: DSIR importance weighting (unigram LLR vs target lang)
    "pipeline_dsir_importance_weights",
    # round 10b: degree-punishing link prediction, fixed-point exact
    "graph_resource_allocation_links",
    # round 10b: Spark-4 SQL surface (ordered string agg, parameterized exec)
    "sql_listagg_within_group",
    "sql_execute_immediate",
    # round 10b: 1-bit sign quantization recall audit
    "embedding_binary_quantization_recall_audit",
    # round 10b: sweep-line peak concurrency (two-phase running sum)
    "events_peak_concurrency_sweep",
    # round 10b: weighted SSSP (fixed-point int64 Bellman-Ford) + its
    # convergence-looped twin with value-equality round detection
    "graph_sssp_bellman_ford",
    "graph_sssp_until_settled",
    # round 10b: nearest as-of (backward+forward composition, argmin)
    "join_asof_nearest",
    # round 10b: mixture planning — closed-form waterfilling allocation
    # and deterministic rejection balancing (both exact-integer)
    "mix_capped_allocation_waterfill",
    "sample_rejection_source_balance",
    # round 10b: thin-category fill (correlated LATERAL top-n; hidden
    # _metadata file provenance)
    "subquery_lateral_correlated_topn",
    "scan_metadata_file_provenance",
    # round 10b: polymorphic UDTF (analyze()-derived output schema)
    "udtf_polymorphic_analyze",
    # round 10b: dynamic-gap session windows (interval-union semantics)
    "events_session_dynamic_gap",
    # round 10b: multi-source BFS closeness centrality
    "graph_closeness_multisource",
    # round 10b: cross-document shingle novelty (memorization audit)
    "text_ngram_novelty_cross_doc",
    # round 10b: per-node local clustering coefficient
    "graph_local_clustering_topk",
    # round 10b: Wilson score intervals on per-source quality rates
    "mix_source_rate_wilson_ci",
    # round 10b: KS uniformity audit of the sampling hash
    "dq_hash_uniformity_ks_audit",
    # round 11: cost-switched kNN join (brute under the pair bound,
    # corpus-scaled IVF cells + bounded exact rerank above) and its
    # forced-partial-probe recall audit entry
    "ann_knn_join",
    "ann_knn_join_recall_audit",
    # round 11: Benjamini-Hochberg step-up over per-segment KS drift
    "stats_bh_fdr_segments",
    # round 11: Heaps'-law vocabulary-growth fit (first-doc trick)
    "text_heaps_law_fit",
    # round 11: reworked oracles (capped settled emit rounds IS NOT NULL;
    # DSIR ranks on rounded weight; peak concurrency duration clamp)
    "graph_kcore_until_settled",
    "graph_lpa_until_settled",
    "graph_sssp_until_settled",
    "pipeline_dsir_importance_weights",
    "events_peak_concurrency_sweep",
]
# dict.fromkeys: a query reworked in a later round than it was added
# appears twice in the list above; the sweep should run it once.
_RECENT_NAMES = [n for n in dict.fromkeys(RECENT_ADDITIONS) if n in REGISTRY]
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
