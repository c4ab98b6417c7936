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

Round-14 lever — ``stream_ingest_static_index`` (round-13 verdict #4):
the streaming ingest gate's per-trigger static-index re-resolution cost,
derived-from-corpus vs materialized-parquet index (see
``lever_stream_ingest_static_index``).

Run:  python bench_levers.py            # merges into BENCH_SCALE.json
Env:  SPARK_GRAFT_LEVER_BASE  (default /root/testdata/sf0.01)
      SPARK_GRAFT_LEVER_CPUS  (default 32)
      SPARK_GRAFT_LEVER_REPS  (default 3)
      SPARK_GRAFT_LEVERS     (comma list; default: all)
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


def lever_suffix_adjacency(spark, base: str, reps: int) -> dict:
    """The round-13 hot-boilerplate A/B (docstring above): suffix-dedup
    adjacency plan vs its exhaustive all-pairs twin on a corpus with a
    genuinely hot anchor bucket."""
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
    return row


#: Part-file count for the streaming-ingest lever's corpus: with
#: maxFilesPerTrigger=1 this is the micro-batch count, so the derived
#: arm re-resolves (recomputes) the corpus digest/band index this many
#: times while the materialized arm re-reads two small parquet files.
INGEST_STREAM_FILES = 6


def lever_stream_ingest_static_index(spark, base: str, reps: int) -> dict:
    """Round-13 verdict #4's missing scale row: the streaming ingest
    gate's per-trigger static-index re-resolution cost. The gate's
    static sides (corpus content digests + distinct band buckets) are
    re-resolved EVERY micro-batch; formulated as derivations over the
    corpus table that means recomputing md5 + minhash over the whole
    corpus per trigger — cost grows with corpus size × trigger count.
    The production posture (``materialize_corpus_index``) maintains the
    index as parquet, so re-resolution is a footer read + scan of two
    benchmark-of-corpus-digest-sized relations. Both arms run the REAL
    multi-trigger Structured Streaming job (maxFilesPerTrigger=1 over an
    {INGEST_STREAM_FILES}-part corpus), are first verified
    row-identical, then alternate in one session."""
    from spark_jdbc_limit_spark.streaming import (
        materialize_corpus_index,
        run_stream_to_memory,
        stream_ingest_dedup_gate,
    )

    # corpus as a directory of part files → one micro-batch per file
    work = "/tmp/spark_graft_levers/ingest_corpus"
    docs = load_table(spark, base, "documents")
    docs.repartition(INGEST_STREAM_FILES).write.mode("overwrite").parquet(
        f"{work}/documents.parquet"
    )
    n_docs = spark.read.parquet(f"{work}/documents.parquet").count()
    idx = f"{work}/index"
    materialize_corpus_index(spark, work, idx)

    def derived():
        return run_stream_to_memory(
            stream_ingest_dedup_gate(spark, work), "complete"
        )

    def materialized():
        return run_stream_to_memory(
            stream_ingest_dedup_gate(spark, work, index_dir=idx), "complete"
        )

    a = {tuple(r) for r in derived().collect()}
    b = {tuple(r) for r in materialized().collect()}
    assert a == b and a, f"arms disagree: {len(a ^ b)} differing rows"
    print(f"# ingest arms agree on {len(a)} rows", file=sys.stderr)

    walls: dict[str, list[float]] = {"derived": [], "materialized": []}
    for _ in range(reps):
        for arm, run in (("derived", derived), ("materialized", materialized)):
            t0 = time.perf_counter()
            run().count()
            walls[arm].append(round(time.perf_counter() - t0, 3))
            print(f"# ingest {arm}: {walls[arm][-1]:.2f}s", file=sys.stderr)

    med = {k: statistics.median(v) for k, v in walls.items()}
    mn = {k: min(v) for k, v in walls.items()}
    return {
        "corpus": base,
        "n_docs": n_docs,
        "n_stream_files": INGEST_STREAM_FILES,
        "wall_derived": walls["derived"],
        "wall_materialized": walls["materialized"],
        "wall_derived_median": med["derived"],
        "wall_materialized_median": med["materialized"],
        "speedup_materialized_median": round(med["derived"] / med["materialized"], 2),
        "speedup_materialized_min": round(mn["derived"] / mn["materialized"], 2),
        "note": (
            "real multi-trigger availableNow run of the ingest dedup gate "
            "(one micro-batch per part file): the derived arm recomputes "
            "the corpus digest/band-bucket index per trigger, the "
            "materialized arm re-reads the maintained parquet index — the "
            "per-trigger re-resolution cost is the difference / trigger "
            "count, and it is the term that grows with corpus size at "
            "fixed trigger cadence; arms verified row-identical first, "
            "alternating reps in one session"
        ),
    }


LEVERS = {
    "suffix_adjacency_hot_boilerplate": lever_suffix_adjacency,
    "stream_ingest_static_index": lever_stream_ingest_static_index,
}


def main() -> None:
    base = os.environ.get("SPARK_GRAFT_LEVER_BASE", "/root/testdata/sf0.01")
    cpus = int(os.environ.get("SPARK_GRAFT_LEVER_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_LEVER_REPS", "3"))
    names = [
        n
        for n in os.environ.get("SPARK_GRAFT_LEVERS", ",".join(LEVERS)).split(",")
        if n
    ]
    spark = build_session(
        app_name="bench_levers", cpus=cpus, shuffle_partitions=cpus
    )
    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "BENCH_SCALE.json")
    for name in names:
        row = LEVERS[name](spark, base, reps)
        with open(path) as f:
            scale = json.load(f)
        scale.setdefault("levers", {})[name] = row
        with open(path, "w") as f:
            json.dump(scale, f, indent=1)
            f.write("\n")
        print(json.dumps({"lever": name, **row}))


if __name__ == "__main__":
    main()
