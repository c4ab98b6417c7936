"""Differential correctness: every oracle-paired query in the registry,
run at sf0.01 (the driver's correctness scale factor)."""

from __future__ import annotations

import pytest

from spark_jdbc_limit_spark.operators import REGISTRY

from tests.oracle_utils import run_differential

ORACLE_SPECS = [spec for spec in REGISTRY.values() if spec.oracle is not None]

#: Built-frame cache at sf0.01, shared between the differentials and the
#: registry-wide schema guard (round-11 verdict #1, measured): building
#: all ~320 queries costs ~90 s even with parameter jobs memoized,
#: because the ITERATIVE builders (star-contraction CC, convergence
#: loops, centroid fits) execute driver-side jobs while CONSTRUCTING the
#: plan. Plans are immutable, so one build per (query, sf0.01) serves
#: both consumers; the schema guard (defined last in this module, so it
#: runs after the differentials under pytest's definition order) clears
#: the cache to release the checkpointed lineage blocks.
_FRAMES: dict[str, object] = {}


def _built_sf_correct(spark, spec, sf_correct: str):
    df = _FRAMES.get(spec.name)
    if df is None:
        df = spec.builder(spark, sf_correct)
        _FRAMES[spec.name] = df
    return df


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=[s.name for s in ORACLE_SPECS])
def test_oracle_differential(spark, sf_correct, spec):
    run_differential(
        spark, spec, sf_correct, frame=_built_sf_correct(spark, spec, sf_correct)
    )


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
    # passing BOTH the round-9 and round-10 closing sweeps; round-10/10b
    # cohorts graduated 2026-08-16 (round 12) after passing the
    # round-10b AND round-11 closing sweeps — the two-sweeps exit
    # criterion; see BASELINE.md closing notes. The sweep gate still
    # covers every registry entry at both SFs.)
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
    # round 12: suffix-array longest-duplicate-substring dedup
    # (anchor-bucketed adjacency LCP) and its extraction twin
    "dedup_longest_dup_substring",
    "dedup_dup_span_extract",
    "dedup_remove_duplicated_spans",
    # round 13: the trio composed into the curation capstone (gate →
    # span cut over gated survivors → per-source per-stage accounting)
    "curate_span_cut_pipeline",
    # round 13: benchmark decontamination (flag + span-level cut of
    # training docs sharing 8-grams with the held-out eval slice)
    "pipeline_decontaminate_eval_overlap",
    "pipeline_decontaminate_span_cut",
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


def test_no_registry_query_emits_complex_typed_columns(spark, sf_correct):
    """Guardrail for the round-4 failure class: the correctness harness
    canonicalizes with pandas sort_values/hashing and CANNOT compare
    array/map/struct cells — every registered query must emit scalar
    columns only (serialize arrays with concat_ws and mirror with
    array_to_string in the oracle). Schema-only — and it reads the
    differentials' shared built-frame cache (this module, sf0.01)
    instead of rebuilding: a second registry-wide build sweep cost ~90 s
    of build-time driver jobs in the iterative builders even warm
    (round-11 verdict #1 measurement)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from spark_jdbc_limit_spark.operators import REGISTRY

    offenders = []
    for name, spec in REGISTRY.items():
        df = _FRAMES.get(name) if spec.oracle is not None else None
        if df is None:
            df = spec.builder(spark, sf_correct)
        for field in df.schema.fields:
            if isinstance(field.dataType, (ArrayType, MapType, StructType)):
                offenders.append((name, field.name, field.dataType.simpleString()))
    _FRAMES.clear()  # release checkpointed lineage blocks held by the cache
    assert not offenders, f"complex-typed output columns: {offenders}"
