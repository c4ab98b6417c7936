#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Execution uses the noop sink — the full physical plan runs JVM-side
(scans, shuffles, aggregations) without driver collection, so timings
measure the engine, not toPandas serialization.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spark_jdbc_limit_spark import build_session  # noqa: E402
from spark_jdbc_limit_spark.operators import REGISTRY  # noqa: E402


#: Fixed anchor set: five stable, plan-frozen entries timed FIRST and LAST
#: in every bench run. Their total against the recorded quiet-slot total
#: (ANCHOR_REF_SEC, measured at sf0.1 / 32 cpus on a quiet slot) yields
#: ``anchor_factor`` — the run's machine-contention multiplier. Round 10's
#: driver artifact read 1.6x slower than round 9's for reasons that took
#: forensics (same binaries, ±25-30% machine-day swing); the anchor makes
#: the contention visible IN the artifact: compare ``value_anchor_norm``
#: (total / anchor_factor) across rounds, not raw ``value``.
ANCHOR_QUERIES = (
    "q1_pricing_summary",
    "set_union_distinct",
    "limit_semantics",
    "scan_project_filter_topk",
    "window_topk_per_group",
)
#: Quiet-slot reference total for ANCHOR_QUERIES at sf0.1, 32 cpus
#: (min-of-5 per query — matching the min-of-first/last the factor uses —
#: recorded round 11 on a quiet slot).
ANCHOR_REF_SEC = 2.602


def _time_anchors(spark, sf_dir: str) -> float:
    total = 0.0
    for name in ANCHOR_QUERIES:
        t0 = time.perf_counter()
        REGISTRY[name].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        total += time.perf_counter() - t0
    return round(total, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    spark = build_session(app_name="bench", cpus=cpus, shuffle_partitions=cpus)
    # Warm the JVM once: codegen/compiler init plus first-touch parquet
    # footer reads dominate the first query's wall-clock (~7 s of pure
    # session warm-up measured at sf0.1) and would be misattributed to it.
    for warm in ("limit_semantics", "q1_pricing_summary"):
        REGISTRY[warm].builder(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    # Touch every catalog table once (footer + first page reads hit the OS
    # cache) so whichever query happens to scan a table first isn't charged
    # the cold-read cost the others don't pay.
    from spark_jdbc_limit_spark.sources.catalog import TABLES, load_table

    for t in TABLES:
        load_table(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    # spin up the Arrow/Python worker pool (session infrastructure, not
    # query cost — the first pandas-UDF query would otherwise absorb it)
    spark.range(0, cpus * 10, 1, cpus).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # Per-query MEDIAN over n reps: a single-shot timing on a shared VM
    # reads contention windows as 10x plan regressions (round-2 bench
    # recorded 11.0s for a query that warm-times 1.37s). Reps run as
    # ROUND-ROBIN PASSES over the whole registry (pass 1 all queries,
    # then pass 2, ...), not back-to-back per query: a multi-second VM
    # noise window then lands in at most one rep of any query, so the
    # recorded MIN stays contention-free (back-to-back reps once
    # recorded 5.1s min for a query that times 2.6s alone — one window
    # swallowed all three samples).
    anchor_first = _time_anchors(spark, sf_dir)

    reps = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3")))
    all_reps: dict[str, list[float]] = {name: [] for name in REGISTRY}
    for _ in range(reps):
        for name, spec in REGISTRY.items():
            t0 = time.perf_counter()
            spec.builder(spark, sf_dir).write.format("noop").mode("overwrite").save()
            all_reps[name].append(round(time.perf_counter() - t0, 3))
    timings: dict[str, float] = {}
    mins: dict[str, float] = {}
    for name, samples in all_reps.items():
        timings[name] = round(statistics.median(samples), 3)
        # MIN across reps is the contention-free estimate: a shared-VM
        # noise window inflates individual reps but never deflates one,
        # so min is the robust round-over-round comparison stat while
        # median remains the expected-latency headline.
        mins[name] = round(min(samples), 3)

    # Pipeline-marginal accounting (round-6 verdict #8): the catalog's
    # heaviest entry, dedup_cluster_best_representative, embeds a full CC
    # recompute so its oracle stays self-contained. In production CC is a
    # materialized intermediate, so ALSO time the survivor step against a
    # checkpointed CC relation — the operator's true marginal cost.
    from spark_jdbc_limit_spark.operators.dedup import (
        best_representative_frame,
        dedup_connected_components,
    )

    from spark_jdbc_limit_spark.operators.graph import (
        _supplier_edges,
        bfs_hops_until_settled,
        connected_components_until_settled,
        graph_bfs_hops,
        graph_closeness_multisource,
        graph_connected_components,
        graph_jaccard_link_prediction,
        graph_kcore_peeling,
        graph_label_propagation,
        graph_local_clustering_topk,
        graph_resource_allocation_links,
        graph_sssp_bellman_ford,
        graph_triangle_stats,
        kcore_until_settled,
        label_propagation_until_settled,
        pagerank_frame,
    )

    cc = dedup_connected_components(spark, sf_dir).localCheckpoint()
    edges = _supplier_edges(spark, sf_dir).localCheckpoint()
    w_edges = _supplier_edges(spark, sf_dir, keep_weight=True).localCheckpoint()
    marginal_builders = {
        "dedup_cluster_best_representative": lambda: best_representative_frame(
            spark, sf_dir, cc
        ),
        # the graph analytics share one materialized edge relation in a
        # pipeline; their standalone entries re-derive it for the oracle
        "graph_pagerank_supplier": lambda: pagerank_frame(spark, sf_dir, edges=edges),
        "graph_label_propagation": lambda: graph_label_propagation(
            spark, sf_dir, edges=edges
        ),
        "graph_triangle_stats": lambda: graph_triangle_stats(
            spark, sf_dir, edges=edges
        ),
        "graph_connected_components": lambda: graph_connected_components(
            spark, sf_dir, edges=edges
        ),
        "graph_bfs_hops": lambda: graph_bfs_hops(spark, sf_dir, edges=edges),
        "graph_kcore_peeling": lambda: graph_kcore_peeling(spark, sf_dir, edges=edges),
        "graph_jaccard_link_prediction": lambda: graph_jaccard_link_prediction(
            spark, sf_dir, edges=edges
        ),
        "graph_resource_allocation_links": lambda: graph_resource_allocation_links(
            spark, sf_dir, edges=edges
        ),
        "graph_closeness_multisource": lambda: graph_closeness_multisource(
            spark, sf_dir, edges=edges
        ),
        "graph_local_clustering_topk": lambda: graph_local_clustering_topk(
            spark, sf_dir, edges=edges
        ),
        # the weighted family shares its OWN materialized relation (the
        # same derivation with the co-order count retained)
        "graph_sssp_bellman_ford": lambda: graph_sssp_bellman_ford(
            spark, sf_dir, edges=w_edges
        ),
    }

    # the until-settled family's marginals: same shared edge relation;
    # the convergence loop's per-round count jobs are part of the
    # operator's cost and stay inside the timed call (the returned state
    # is what a pipeline consumes)
    def _settled_marginal(fn):
        def build():
            state, _rounds, _settled = fn(spark, sf_dir, edges=edges)
            return state

        return build

    marginal_builders.update(
        {
            "graph_cc_until_settled": _settled_marginal(
                connected_components_until_settled
            ),
            "graph_bfs_until_settled": _settled_marginal(bfs_hops_until_settled),
            "graph_kcore_until_settled": _settled_marginal(kcore_until_settled),
            "graph_lpa_until_settled": _settled_marginal(
                label_propagation_until_settled
            ),
        }
    )
    from spark_jdbc_limit_spark.operators.graph import sssp_until_settled

    def _sssp_settled_marginal():
        state, _rounds, _settled = sssp_until_settled(spark, sf_dir, edges=w_edges)
        return state

    marginal_builders["graph_sssp_until_settled"] = _sssp_settled_marginal
    # Marginal reps are round-robin passes like the main loop, so one VM
    # noise window lands in at most one rep of any marginal builder.
    marginal_reps: dict[str, list[float]] = {m: [] for m in marginal_builders}
    for _ in range(reps):
        for mname, build in marginal_builders.items():
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            marginal_reps[mname].append(round(time.perf_counter() - t0, 3))
    pipeline_marginal = {
        mname: round(statistics.median(samples), 3)
        for mname, samples in marginal_reps.items()
    }

    anchor_last = _time_anchors(spark, sf_dir)
    # min of first/last: the contention-free-er of the two bracketing
    # samples (a noise window at one end shouldn't read as a slow machine)
    anchor_sec = min(anchor_first, anchor_last)
    anchor_factor = round(anchor_sec / ANCHOR_REF_SEC, 3)

    total = round(sum(timings.values()), 3)
    total_min = round(sum(mins.values()), 3)
    full = {
        "metric": "total_sec_all_queries",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "reps": reps,
        "rep_stat": "median",
        "value_min": total_min,
        "queries_min": mins,
        "queries_reps": all_reps,
        "sf": sf_val,
        "n_queries": len(timings),
        "cpus": cpus,
        # machine-contention instrumentation: this run's fixed-anchor-set
        # time over the recorded quiet-slot reference, plus the total
        # normalized by it — compare value_anchor_norm across rounds
        "anchor_sec_first": anchor_first,
        "anchor_sec_last": anchor_last,
        "anchor_ref_sec": ANCHOR_REF_SEC,
        "anchor_factor": anchor_factor,
        "value_anchor_norm": round(total / max(anchor_factor, 1e-9), 3),
        # marginal cost with CC as a materialized pipeline intermediate;
        # NOT added to `value` (the self-contained entry already counts)
        "pipeline_marginal": pipeline_marginal,
    }
    here = os.path.dirname(os.path.abspath(__file__))
    with open(os.path.join(here, "BENCH_FULL.json"), "w") as f:
        json.dump(full, f, indent=1)
        f.write("\n")
    # committed staleness artifact (round-10 verdict #8): how far behind
    # the stalest driver-green entry is, given the rotation's
    # stalest-green-first ordering
    from spark_jdbc_limit_spark.operators import rotation_stats

    with open(os.path.join(here, "ROTATION.json"), "w") as f:
        json.dump(rotation_stats(), f, indent=1)
        f.write("\n")
    # The grading driver keeps only the last 2000 chars of stdout; the full
    # 100-query timings dict overflows that and the line becomes
    # unparseable (round-1 BENCH: "parsed": null). Print a compact line
    # whose "queries" holds the SLOWEST queries that fit a 1700-byte
    # budget — they carry the optimization signal — and point at
    # BENCH_FULL.json for the complete per-query map.
    compact_base = {
        k: v for k, v in full.items() if k not in ("queries_reps", "queries_min")
    }
    head: dict[str, float] = {}
    line = json.dumps({**compact_base, "queries": {}, "queries_full": "BENCH_FULL.json"})
    for name in sorted(timings, key=lambda k: timings[k], reverse=True):
        trial = {**head, name: timings[name]}
        candidate = json.dumps(
            {**compact_base, "queries": trial, "queries_full": "BENCH_FULL.json"},
            separators=(",", ":"),
        )
        if len(candidate) > 1700:
            break
        head = trial
        line = candidate
    print(line)


if __name__ == "__main__":
    main()
