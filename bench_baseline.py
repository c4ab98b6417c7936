#!/usr/bin/env python
"""Baseline refresh for the top-20 heaviest catalog entries (round-9
verdict #8): the recorded 57-query plain-PySpark baseline predates the
graph/stats/dedup-audit family, so the 2x bar measured only the catalog's
oldest fifth. This harness gives every current heavyweight a PLAIN
PySpark twin and times engine vs baseline A/B in ONE session
(alternating passes, min per arm — the repo's timing discipline).

What "plain" means here, per arm:

- For entries whose DuckDB oracle is portable SQL, the baseline IS the
  oracle run by Spark itself (``spark.sql`` over temp views, light
  dialect translation: quantile_cont→percentile, `//`→DIV,
  MATERIALIZED stripped, unnest(range(N))→explode(sequence)). The
  oracle is by construction the naive declarative formulation — single
  global windows, exhaustive joins, un-checkpointed unrolls — which is
  exactly what a plain user writes.
- For the dedup/PCA entries whose oracles lean on DuckDB list lambdas,
  a hand-written naive DataFrame twin: the SAME shingle/signature
  arithmetic (shared helpers, so truth is identical) but the plain pair
  strategy — exhaustive posting-list self-joins instead of
  prefix/band filters, corpus windows instead of max-struct aggregates,
  .cache() loops instead of checkpointed lineage cuts.

Every baseline is first VALIDATED semantics-identical against the
engine entry at sf0.01 (sorted canonical rows, 2e-4 float tolerance for
accumulation-order noise under the 1e-4 display rounds) — a baseline
that computes something easier would make the ratio meaningless.

Not re-recorded here: dedup_minhash_verified, dedup_ngram_jaccard_
exhaustive, q1_pricing_summary — the round-1 baseline already holds
rows for them (BASELINE.md "Recorded baseline").

Run:  python bench_baseline.py            # writes BASELINE_TOP20.json
Env:  SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
      SPARK_GRAFT_BASELINE_VALIDATE_SF (default sf0.01; "skip" skips)
"""

from __future__ import annotations

import json
import math
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import Window as W  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from spark_jdbc_limit_spark import build_session  # noqa: E402
from spark_jdbc_limit_spark.operators import REGISTRY  # noqa: E402
from spark_jdbc_limit_spark.sources.catalog import TABLES, load_table  # noqa: E402

#: oracle-as-baseline entries: the translated oracle SQL runs via
#: spark.sql — Catalyst gets the same declarative text DuckDB verified.
SQL_BASELINES = [
    "graph_connected_components",
    "graph_kcore_peeling",
    "graph_bfs_hops",
    "graph_pagerank_supplier",
    "graph_label_propagation",
    "graph_triangle_stats",
    "graph_jaccard_link_prediction",
    "sort_range_equidepth_audit",
    "sort_zorder_skipping_audit",
    "agg_poisson_bootstrap_ci",
    "udf_cogrouped_order_fill",
    "basket_pair_cooccurrence",
    "basket_lift_rules",
    "q16_supplier_part_variety",
    # round-10b heavy additions: the translated oracles are exactly the
    # naive declarative formulations (adjacency self-join wedges; the
    # same min-plus unroll without per-step checkpoint placement)
    "graph_resource_allocation_links",
    "graph_sssp_bellman_ford",
]


def translate(sql: str) -> str:
    s = sql
    s = s.replace(" AS MATERIALIZED (", " AS (")
    s = re.sub(r"\bquantile_cont\(", "percentile(", s)
    s = s.replace(" // ", " DIV ")
    s = re.sub(
        r"unnest\(range\((\d+)\)\)",
        lambda m: f"explode(sequence(0, {int(m.group(1)) - 1}))",
        s,
    )
    # DuckDB's xor(a, b) → Spark's ^ operator (args are paren-free in the
    # catalog's oracles — the `//` operands were already rewritten to DIV)
    s = re.sub(r"\bxor\(([^,()]+), ([^()]+)\)", r"(\1 ^ \2)", s)
    return s


def sql_baseline(name: str):
    sql = translate(REGISTRY[name].oracle)

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        for t in TABLES:
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        return spark.sql(sql)

    return run


# ---------------------------------------------------------------------------
# Hand-written naive twins (same shared arithmetic, plain pair strategy)
# ---------------------------------------------------------------------------


def _naive_verified_pairs(spark, sf_dir) -> DataFrame:
    """Exhaustive shingle self-join at JACCARD_THRESHOLD — what the
    engine's banded-LSH candidates + verify computes, the plain way."""
    from spark_jdbc_limit_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        shingle_hashes,
    )

    d = load_table(spark, sf_dir, "documents")
    sh = shingle_hashes(d).cache()
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    common = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("d1"), F.col("b.doc_id").alias("d2")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    jac = F.col("n_common").cast("double") / (
        F.col("n1") + F.col("n2") - F.col("n_common")
    )
    return (
        common.join(sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1")), "d1")
        .join(sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2")), "d2")
        .filter(jac >= JACCARD_THRESHOLD)
        .select("d1", "d2", jac.alias("jaccard"))
    )


def naive_jaccard_prefix_filter(spark, sf_dir) -> DataFrame:
    from spark_jdbc_limit_spark.operators.dedup import PREFIX_TAU
    from spark_jdbc_limit_spark.operators.relational import round_dbl

    pairs = _naive_verified_pairs(spark, sf_dir)
    return (
        pairs.filter(F.col("jaccard") >= PREFIX_TAU)
        .select("d1", "d2", round_dbl(F.col("jaccard"), 4).alias("jaccard"))
        .orderBy("d1", "d2")
    )


def _naive_cc_labels(spark, sf_dir, rounds: int = 6) -> DataFrame:
    """Plain min-label loop over the exhaustive verified pairs: union of
    self and neighbor votes, .cache() per round (the plain user's lineage
    control), fixed unroll."""
    pairs = _naive_verified_pairs(spark, sf_dir).select("d1", "d2").cache()
    edges = pairs.unionAll(
        pairs.select(F.col("d2").alias("d1"), F.col("d1").alias("d2"))
    )
    labels = (
        edges.select(F.col("d1").alias("doc_id"))
        .distinct()
        .select("doc_id", F.col("doc_id").alias("component"))
        .cache()
    )
    for _ in range(rounds):
        votes = edges.join(
            labels, edges["d1"] == labels["doc_id"]
        ).select(F.col("d2").alias("doc_id"), "component")
        labels = (
            votes.unionAll(labels)
            .groupBy("doc_id")
            .agg(F.min("component").alias("component"))
            .cache()
        )
    return labels


def naive_dedup_connected_components(spark, sf_dir) -> DataFrame:
    return _naive_cc_labels(spark, sf_dir)


def naive_cluster_best_representative(spark, sf_dir) -> DataFrame:
    labels = _naive_cc_labels(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked = (
        labels.join(d, "doc_id")
        .withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(W.partitionBy("component")),
        )
        .withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("component").orderBy(
                    F.desc("n_chars"), F.col("doc_id")
                )
            ),
        )
    )
    return ranked.filter(F.col("rn") == 1).select(
        "component",
        F.col("cluster_size").cast("long").alias("cluster_size"),
        F.col("doc_id").alias("rep_doc_id"),
        F.col("n_chars").alias("rep_n_chars"),
    )


def naive_minhash_estimate_audit(spark, sf_dir) -> DataFrame:
    """Signature via 16 aggregate MINs over the shuffled shingle relation
    (instead of the engine's shuffle-free mapInPandas), banded candidates,
    exhaustive per-pair truth — same integer arithmetic throughout
    (FP_MOD = 2^31-1, products fit int64 exactly)."""
    from spark_jdbc_limit_spark.operators.dedup import (
        FP_BASE,
        FP_MOD,
        LSH_BANDS,
        LSH_ROWS,
        MINHASH_A,
        MINHASH_B,
        NUM_HASHES,
        shingle_hashes,
    )
    from spark_jdbc_limit_spark.operators.relational import round_dbl

    d = load_table(spark, sf_dir, "documents")
    sh = shingle_hashes(d).cache()
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min((F.lit(MINHASH_A[j]) * F.col("h") + F.lit(MINHASH_B[j])) % FP_MOD).alias(f"m{j}")
            for j in range(NUM_HASHES)
        ]
    ).cache()
    bands = None
    for b in range(LSH_BANDS):
        part = sig.select(
            "doc_id",
            F.lit(b).alias("band_id"),
            (
                (F.col(f"m{b * LSH_ROWS}") * FP_BASE + F.col(f"m{b * LSH_ROWS + 1}"))
                % FP_MOD
            ).alias("band_hash"),
        )
        bands = part if bands is None else bands.unionAll(part)
    b2 = bands.select(
        F.col("doc_id").alias("doc_id2"),
        F.col("band_id").alias("band_id2"),
        F.col("band_hash").alias("band_hash2"),
    )
    cand = (
        bands.join(
            b2,
            (F.col("band_id") == F.col("band_id2"))
            & (F.col("band_hash") == F.col("band_hash2"))
            & (F.col("doc_id") < F.col("doc_id2")),
        )
        .select(F.col("doc_id").alias("d1"), F.col("doc_id2").alias("d2"))
        .distinct()
    )
    s1 = sig.select(F.col("doc_id").alias("d1"), *[F.col(f"m{j}").alias(f"a{j}") for j in range(NUM_HASHES)])
    s2 = sig.select(F.col("doc_id").alias("d2"), *[F.col(f"m{j}").alias(f"b{j}") for j in range(NUM_HASHES)])
    n_agree = sum(
        (F.col(f"a{j}") == F.col(f"b{j}")).cast("long") for j in range(NUM_HASHES)
    )
    agree = cand.join(s1, "d1").join(s2, "d2").select("d1", "d2", n_agree.alias("n_agree"))
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    t1 = sh.select(F.col("doc_id").alias("d1"), F.col("h").alias("h1"))
    t2 = sh.select(F.col("doc_id").alias("d2b"), F.col("h").alias("h2"))
    common = (
        cand.join(t1, "d1")
        .join(t2, (F.col("d2") == F.col("d2b")) & (F.col("h1") == F.col("h2")))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    nc = F.coalesce(F.col("n_common"), F.lit(0))
    exact = nc.cast("double") / (F.col("n1") + F.col("n2") - nc)
    est = F.col("n_agree").cast("double") / NUM_HASHES
    return (
        agree.join(common, ["d1", "d2"], "left")
        .join(sizes.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1")), "d1")
        .join(sizes.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2")), "d2")
        .select(
            "d1",
            "d2",
            "n_agree",
            round_dbl(est, 4).alias("est_jaccard"),
            round_dbl(exact, 4).alias("exact_jaccard"),
            round_dbl(F.abs(est - exact), 4).alias("abs_err"),
        )
    )


def naive_pca_power_iteration(spark, sf_dir) -> DataFrame:
    """Covariance via the exploded (vec_id, i, xi) self-join — n·d² join
    rows instead of the engine's per-task GEMM partials — then the same
    fixed power trajectory with a crossJoin norm and .cache() per step."""
    from spark_jdbc_limit_spark.operators.relational import round_dbl
    from spark_jdbc_limit_spark.operators.similarity import (
        EMB_DIM,
        PCA_POWER_ITERS,
    )

    e = load_table(spark, sf_dir, "embeddings")
    flat = e.select(
        "vec_id", F.posexplode(F.col("embedding").cast("array<double>")).alias("i", "xi")
    ).cache()
    nn = flat.select("vec_id").distinct().count()
    mu = flat.groupBy("i").agg((F.sum("xi") / nn).alias("m"))
    cov = (
        flat.alias("a")
        .join(flat.alias("b"), "vec_id")
        .groupBy(F.col("a.i").alias("i"), F.col("b.i").alias("j"))
        .agg((F.sum(F.col("a.xi") * F.col("b.xi")) / nn).alias("ss"))
        .join(mu.select(F.col("i"), F.col("m").alias("mi")), "i")
        .join(mu.select(F.col("i").alias("j"), F.col("m").alias("mj")), "j")
        .select("i", "j", (F.col("ss") - F.col("mi") * F.col("mj")).alias("c"))
        .cache()
    )
    v = spark.createDataFrame([(j, 0.125) for j in range(EMB_DIM)], "j int, x double")
    for _ in range(PCA_POWER_ITERS):
        w = (
            cov.join(v, "j")
            .groupBy("i")
            .agg(F.sum(F.col("c") * F.col("x")).alias("w"))
            .cache()
        )
        nm = w.agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nm"))
        v = w.crossJoin(nm).select(
            F.col("i").alias("j"),
            (F.col("w") / F.col("nm")).alias("x"),
            F.col("nm").alias("lam"),
        )
    return v.select(
        F.col("j").cast("long").alias("dim"),
        round_dbl(F.col("x"), 4).alias("loading"),
        round_dbl(F.col("lam"), 4).alias("eigenvalue"),
    )


def naive_longest_dup_substring(spark, sf_dir, docs: DataFrame | None = None) -> DataFrame:
    """ALL cross-doc suffix pairs within each anchor bucket (the
    exhaustive strategy the oracle runs) instead of the engine's
    sorted-adjacency plan — same survivors relation, same LCP fold, so
    the only difference timed is pair generation: O(bucket²) vs
    O(bucket) rows through the fold. ``docs`` overrides the corpus (the
    hot-boilerplate lever A/B in bench_levers.py feeds a synthetic one)."""
    from spark_jdbc_limit_spark.operators.dedup import _LCP_EXPR, _dup_survivors

    if docs is None:
        docs = load_table(spark, sf_dir, "documents")
    # NOT .cache(): _dup_survivors already ends in a lazy localCheckpoint,
    # so within the one action both self-join sides and the count branch
    # reuse one materialization; a .cache() here additionally registered a
    # NEW CacheManager entry per invocation (each call checkpoints a fresh
    # RDD, so the analyzed plans never match) and bench_levers.py's 5+
    # calls per run accumulated copies that skewed the timed A/B
    # (round-13 advice).
    sv = _dup_survivors(docs)
    pairs = (
        sv.alias("a")
        .join(
            sv.alias("b"),
            (F.col("a.ah") == F.col("b.ah"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.s").alias("s"),
            F.col("b.s").alias("ps"),
        )
        .withColumn("lcp", F.expr(_LCP_EXPR))
    )
    mx = pairs.groupBy("doc_id").agg(F.max("lcp").alias("max_dup_len"))
    cnt = sv.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_dup_anchors"))
    return (
        cnt.join(mx, "doc_id")
        .select("doc_id", "max_dup_len", "n_dup_anchors")
        .orderBy("doc_id")
    )


def naive_dup_span_extract(spark, sf_dir) -> DataFrame:
    """Exhaustive-pairs twin of the span extraction entry."""
    from spark_jdbc_limit_spark.operators.dedup import _LCP_EXPR, _dup_survivors

    # same no-.cache() rationale as naive_longest_dup_substring above
    sv = _dup_survivors(load_table(spark, sf_dir, "documents"))
    spans = (
        sv.alias("a")
        .join(
            sv.alias("b"),
            (F.col("a.ah") == F.col("b.ah"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id"),
            F.col("a.s").alias("s"),
            F.col("b.s").alias("ps"),
        )
        .withColumn("lcp", F.expr(_LCP_EXPR))
        .withColumn(
            "span",
            F.expr("array_join(slice(split(s, ' '), 1, int(lcp)), ' ')"),
        )
        # lazy checkpoint, not .cache(): both downstream branches (best +
        # final join) reuse one materialization within the action, and
        # nothing accumulates in the CacheManager across timed reps
        .localCheckpoint(eager=False)
    )
    best = spans.groupBy("doc_id").agg(F.max("lcp").alias("dup_len"))
    return (
        spans.alias("sp")
        .join(
            best.alias("bl"),
            (F.col("sp.doc_id") == F.col("bl.doc_id"))
            & (F.col("sp.lcp") == F.col("bl.dup_len")),
        )
        .select(F.col("sp.doc_id").alias("doc_id"), "bl.dup_len", "sp.span")
        .groupBy("doc_id", "dup_len")
        .agg(F.min("span").alias("dup_text"))
        .orderBy("doc_id")
    )


PY_BASELINES = {
    "dedup_jaccard_prefix_filter": naive_jaccard_prefix_filter,
    "dedup_connected_components": naive_dedup_connected_components,
    "dedup_cluster_best_representative": naive_cluster_best_representative,
    "dedup_minhash_estimate_audit": naive_minhash_estimate_audit,
    "embedding_pca_power_iteration": naive_pca_power_iteration,
    # round-12: the suffix-dedup pair (now the catalog's two heaviest
    # entries) vs their exhaustive-pairs twins
    "dedup_longest_dup_substring": naive_longest_dup_substring,
    "dedup_dup_span_extract": naive_dup_span_extract,
}


def baselines() -> dict:
    out = {n: sql_baseline(n) for n in SQL_BASELINES}
    out.update(PY_BASELINES)
    # optional subset (comma-separated names): bench additions without
    # re-timing the whole top-20; merge the JSON into BASELINE_TOP20.json
    only = os.environ.get("SPARK_GRAFT_BASELINE_QUERIES")
    if only:
        keep = set(only.split(","))
        out = {n: f for n, f in out.items() if n in keep}
    return out


# ---------------------------------------------------------------------------


def _canon(df: DataFrame):
    from decimal import Decimal

    def cell(v):
        # normalize BEFORE sorting: a Decimal('0.0053000') and the float
        # 0.0053 must sort identically or the pairwise compare misaligns
        if isinstance(v, Decimal):
            return float(v)
        return v

    def sort_key(row):
        # quantize floats in the SORT KEY (not the compared values) so two
        # arms whose floats differ within the comparison tolerance still
        # sort into the same positions — raw-repr sorting would misalign
        # the pairwise zip on the first sub-tolerance difference
        return repr(
            tuple(round(v, 3) if isinstance(v, float) else v for v in row)
        )

    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    rows = [
        tuple(cell(v) for v in r)
        for r in pdf[cols].itertuples(index=False, name=None)
    ]
    return cols, sorted(rows, key=sort_key)


def _rows_equal(a, b, tol=2e-4) -> bool:
    if len(a) != len(b):
        return False
    from decimal import Decimal

    def _absent(v) -> bool:
        return v is None or (isinstance(v, float) and math.isnan(v))

    for ra, rb in zip(a, b):
        if len(ra) != len(rb):
            return False
        for x, y in zip(ra, rb):
            # Spark SQL parses round-literal arithmetic as DECIMAL where
            # the DataFrame arm emits DOUBLE — same value, compare as float
            if isinstance(x, Decimal):
                x = float(x)
            if isinstance(y, Decimal):
                y = float(y)
            if _absent(x) or _absent(y):
                # NaN-vs-NULL: Spark's double NaN and SQL NULL both mean
                # "undefined" at degenerate tiny-SF inputs (0/0 ratios)
                if _absent(x) and _absent(y):
                    continue
                return False
            if isinstance(x, float) and isinstance(y, float):
                if abs(x - y) > tol:
                    return False
            elif x != y:
                return False
    return True


def _noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    val_sf = os.environ.get(
        "SPARK_GRAFT_BASELINE_VALIDATE_SF", "/root/testdata/sf0.01"
    )
    # the naive arms carry deliberately-uncut lineage (the plain user's
    # .cache() loops) whose plan trees are large — give the driver heap
    # room for them
    spark = build_session(
        app_name="bench_baseline",
        cpus=cpus,
        shuffle_partitions=cpus,
        driver_memory="10g",
    )
    base = baselines()

    if val_sf != "skip":
        for name, fn in base.items():
            ec, er = _canon(REGISTRY[name].builder(spark, val_sf))
            bc, br = _canon(fn(spark, val_sf))
            assert ec == bc, f"{name}: column mismatch {ec} vs {bc}"
            assert _rows_equal(er, br), f"{name}: baseline values diverge"
            print(f"# validated {name}: {len(er)} rows identical", file=sys.stderr)
            spark.catalog.clearCache()

    # warm at the bench SF
    for t in TABLES:
        _noop(load_table(spark, sf_dir, t))
    spark.range(0, cpus * 10, 1, cpus).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    # per-arm second-pass cap: an arm whose first sample exceeded this
    # runs once (its min is that sample) — bounds total bench time and
    # avoids re-materializing the pathological naive plans
    cap_s = 30.0
    eng: dict[str, float] = {}
    bas: dict[str, float] = {}
    for pass_i in range(2):
        for name, fn in base.items():
            if not (pass_i and eng.get(name, 0.0) > cap_s):
                t0 = time.perf_counter()
                _noop(REGISTRY[name].builder(spark, sf_dir))
                dt = time.perf_counter() - t0
                eng[name] = round(min(dt, eng.get(name, dt)), 3)
            if not (pass_i and bas.get(name, 0.0) > cap_s):
                t0 = time.perf_counter()
                _noop(fn(spark, sf_dir))
                dt = time.perf_counter() - t0
                bas[name] = round(min(dt, bas.get(name, dt)), 3)
            spark.catalog.clearCache()
            print(
                f"# {name}: engine {eng[name]}s baseline {bas[name]}s",
                file=sys.stderr,
            )

    # Self-clearing quiet-pair reprobes (round-14): in a FULL run the
    # engine arm of a light row can land right after a naive monster's
    # uncut cached plans (GC / Python-worker-pool pressure) and read
    # 1.5-4x its quiet-pair value — r14 measured jaccard's engine arm at
    # 8.55 s in-suite vs 2.15 s solo. Any row above REPROBE_RATIO after
    # the main passes re-runs as an ISOLATED alternating pair (2x each
    # arm, min taken) and the artifact records both readings, so a
    # contended full refresh clears its own outliers the way bench.py's
    # solo reprobes do.
    REPROBE_RATIO = float(
        os.environ.get("SPARK_GRAFT_BASELINE_REPROBE_RATIO", "1.4")
    )
    reprobe: dict[str, dict] = {}
    for name, fn in base.items():
        if bas[name] and eng[name] / bas[name] <= REPROBE_RATIO:
            continue
        if eng[name] > cap_s or bas[name] > cap_s:
            continue  # capped monsters: a second pair would double bench wall
        re_e, re_b = [], []
        for _ in range(2):
            t0 = time.perf_counter()
            _noop(REGISTRY[name].builder(spark, sf_dir))
            re_e.append(round(time.perf_counter() - t0, 3))
            t0 = time.perf_counter()
            _noop(fn(spark, sf_dir))
            re_b.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        pe, pb = min(re_e), min(re_b)
        reprobe[name] = {
            "main_engine_sec": eng[name],
            "main_baseline_sec": bas[name],
            "pair_engine_sec": pe,
            "pair_baseline_sec": pb,
            "pair_ratio": round(pe / pb, 3) if pb else None,
        }
        print(
            f"# reprobe {name}: pair engine {pe}s baseline {pb}s",
            file=sys.stderr,
        )
        # the quiet pair is the canonical row; main-pass values stay in
        # the reprobe record for the contention forensics
        eng[name], bas[name] = pe, pb

    out = {
        "metric": "engine_over_baseline_ratio_top_heavy",
        "unit": "ratio",
        "sf_dir": sf_dir,
        "queries": {
            n: {
                "engine_sec": eng[n],
                "baseline_sec": bas[n],
                "ratio": round(eng[n] / bas[n], 3) if bas[n] else None,
            }
            for n in base
        },
    }
    if reprobe:
        out["reprobe"] = reprobe
    ratios = [v["ratio"] for v in out["queries"].values() if v["ratio"]]
    out["value"] = round(max(ratios), 3)
    out["total_engine_sec"] = round(sum(eng.values()), 3)
    out["total_baseline_sec"] = round(sum(bas.values()), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
