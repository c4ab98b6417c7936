#!/usr/bin/env python
"""Lever measurements: targeted A/B experiments whose rows merge into
BENCH_SCALE.json's ``levers`` map (the ``chain_cc_rounds_per_check`` row
is the round-12 precedent; this script makes the mechanism repeatable
instead of a one-off).

Round-13 lever — ``suffix_adjacency_hot_boilerplate`` (round-12 verdict
#4): at sf0.1 the suffix-dedup adjacency plan TIES its exhaustive
all-pairs-within-bucket twin (BASELINE_TOP20: 1.02x/1.00x) because anchor
buckets hold only 2-7 suffixes — the plan's claimed advantage (quadratic
pair blowup on hot boilerplate anchors) had no measured demonstration.
This synthesizes exactly that shape: one fixed 50-token licence block
injected into ~30% of the sf0.01 documents (deterministic by doc_id, no
randomness — scripts here must stay replayable), so every anchor inside
the block lands its bucket one suffix PER INJECTED DOC. With ~1.8k
injected docs, the exhaustive twin pushes ~bucket² ≈ 3.4M pairs per block
anchor through the LCP fold while the adjacency plan windows ~bucket rows.

Both arms first have their RESULTS verified identical on the synthetic
corpus (the adjacency lemma must hold on the shape being timed, not just
on the shipped corpora), then run alternating round-robin reps in ONE
session (machine-days on this VM differ 1.2-1.5x — never A/B across
sessions).

Run:  python bench_levers.py            # merges into BENCH_SCALE.json
Env:  SPARK_GRAFT_LEVER_BASE  (default /root/testdata/sf0.01)
      SPARK_GRAFT_LEVER_CPUS  (default 32)
      SPARK_GRAFT_LEVER_REPS  (default 3)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from spark_jdbc_limit_spark import build_session  # noqa: E402
from spark_jdbc_limit_spark.operators.dedup import (  # noqa: E402
    DUP_ANCHOR_L,
    _dup_survivors,
    longest_dup_substring_frame,
)
from spark_jdbc_limit_spark.sources.catalog import load_table  # noqa: E402

#: The injected block: 50 distinct pseudo-legal tokens, no collision with
#: the corpus vocabulary (``lic##`` prefix), so every duplicated run it
#: creates is attributable to the injection.
LICENSE_BLOCK = " ".join(f"lic{i:02d}" for i in range(50))
#: Injection rate ~30% via doc_id decile (deterministic, engine-exact).
INJECT_DECILES = 3
#: Insert after this many leading tokens (docs shorter than this get the
#: block appended) — mid-document, so the block's anchors coexist with
#: the doc's own text on both sides.
INJECT_AT = 5


def _boilerplate_corpus(spark, base: str):
    d = load_table(spark, base, "documents").select("doc_id", "text")
    w = F.split("text", " ")
    injected = F.concat_ws(
        " ",
        F.array_join(F.slice(w, 1, INJECT_AT), " "),
        F.lit(LICENSE_BLOCK),
        F.array_join(
            F.slice(w, INJECT_AT + 1, F.greatest(F.size(w) - INJECT_AT, F.lit(0))),
            " ",
        ),
    )
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 10 < INJECT_DECILES, injected)
        .otherwise(F.col("text"))
        .alias("text"),
    )


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    base = os.environ.get("SPARK_GRAFT_LEVER_BASE", "/root/testdata/sf0.01")
    cpus = int(os.environ.get("SPARK_GRAFT_LEVER_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_LEVER_REPS", "3"))
    spark = build_session(
        app_name="bench_levers", cpus=cpus, shuffle_partitions=cpus
    )
    from bench_baseline import naive_longest_dup_substring

    # materialize the synthetic corpus once (both arms read the same
    # parquet, like the scale bench's replicated corpora)
    work = "/tmp/spark_graft_levers/boilerplate.parquet"
    docs_plan = _boilerplate_corpus(spark, base)
    docs_plan.write.mode("overwrite").parquet(work)
    docs = spark.read.parquet(work)
    n_docs = docs.count()
    n_injected = docs.filter(F.col("text").contains("lic00")).count()

    # bucket-shape evidence: the injected block must actually create hot
    # anchor buckets (size ~= n_injected), or the lever measures nothing
    sv = _dup_survivors(docs)
    bstats = (
        sv.groupBy("ah")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.max("n").alias("max_bucket"),
            F.avg("n").alias("avg_bucket"),
            F.count(F.lit(1)).alias("n_buckets"),
        )
        .collect()[0]
    )

    def adjacency():
        return longest_dup_substring_frame(docs)

    def exhaustive():
        return naive_longest_dup_substring(spark, base, docs=docs)

    # value check: both arms must agree on the hot-boilerplate shape
    a = {(r["doc_id"], r["max_dup_len"], r["n_dup_anchors"]) for r in adjacency().collect()}
    b = {(r["doc_id"], r["max_dup_len"], r["n_dup_anchors"]) for r in exhaustive().collect()}
    assert a == b, f"arms disagree: {len(a ^ b)} differing rows"
    print(f"# arms agree on {len(a)} rows", file=sys.stderr)

    # warm both arms once, then alternate
    _noop(adjacency())
    _noop(exhaustive())
    walls: dict[str, list[float]] = {"adjacency": [], "exhaustive": []}
    for _ in range(reps):
        for arm, build in (("adjacency", adjacency), ("exhaustive", exhaustive)):
            t0 = time.perf_counter()
            _noop(build())
            walls[arm].append(round(time.perf_counter() - t0, 3))
            print(f"# {arm}: {walls[arm][-1]:.2f}s", file=sys.stderr)

    med = {k: statistics.median(v) for k, v in walls.items()}
    mn = {k: min(v) for k, v in walls.items()}
    row = {
        "corpus": base,
        "n_docs": n_docs,
        "n_injected": n_injected,
        "block_tokens": len(LICENSE_BLOCK.split()),
        "anchor_l": DUP_ANCHOR_L,
        "max_bucket": bstats["max_bucket"],
        "avg_bucket": round(bstats["avg_bucket"], 2),
        "n_buckets": bstats["n_buckets"],
        "wall_adjacency": walls["adjacency"],
        "wall_exhaustive": walls["exhaustive"],
        "wall_adjacency_median": med["adjacency"],
        "wall_exhaustive_median": med["exhaustive"],
        "speedup_adjacency_median": round(med["exhaustive"] / med["adjacency"], 2),
        "speedup_adjacency_min": round(mn["exhaustive"] / mn["adjacency"], 2),
        "note": (
            "one 50-token licence block injected into ~30% of sf0.01 docs "
            "(deterministic by doc_id decile): block anchors bucket one "
            "suffix per injected doc, so the exhaustive twin generates "
            "~bucket^2 LCP pairs per block anchor while the adjacency "
            "plan windows ~bucket rows; arms verified value-identical on "
            "this corpus before timing, alternating reps in one session"
        ),
    }
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "BENCH_SCALE.json")
    with open(path) as f:
        scale = json.load(f)
    scale.setdefault("levers", {})["suffix_adjacency_hot_boilerplate"] = row
    with open(path, "w") as f:
        json.dump(scale, f, indent=1)
        f.write("\n")
    print(json.dumps({"lever": "suffix_adjacency_hot_boilerplate", **row}))


if __name__ == "__main__":
    main()
