"""Approximate-aggregation sketch audits beyond HLL: quantile sketch
(percentile_approx / KLL-style rank guarantees) and heavy hitters
(approx_top_k, new in Spark 4) — completing the sketch family the HLL
audits in aggregates.py started, under the same driver-verifiability
discipline: sketch outputs are engine-specific, so each query emits
EXACT comparands plus in-query tolerance/equality booleans, and the
DuckDB oracle recomputes the exact side and asserts TRUE.

The reference has no aggregate surface at all (SURVEY.md §2B: host
Spark runs aggregation above its scans); sketches are the 100 TB
answer to "distribution statistics without a global sort": mergeable
per-partition state a few KB each, one tiny shuffle row per group,
re-aggregable at any rollup level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from spark_jdbc_limit_spark.operators.registry import query
from spark_jdbc_limit_spark.operators.relational import round_dbl, sql_round_dbl
from spark_jdbc_limit_spark.sources.catalog import load_table

#: audited quantiles, labeled (string keys — avoids float group keys in
#: the driver's hash) and the approx sketch accuracy (rank error
#: guarantee 1/accuracy = 0.001).
PCT_PROBS: list[tuple[str, float]] = [("p50", 0.5), ("p90", 0.9), ("p99", 0.99)]
PCT_ACCURACY = 1000
#: empirical-rank tolerance for the audit boolean: guarantee is 0.001;
#: 0.01 gives 10x headroom while still failing on a broken sketch.
PCT_RANK_TOL = 0.01


def _pct_oracle() -> str:
    arms = "\n        UNION ALL\n".join(
        f"""        SELECT o_orderstatus, '{label}' AS p,
               {sql_round_dbl(f'quantile_cont(CAST(o_totalprice AS DOUBLE), {prob})', 4)}
                   AS exact_pct,
               TRUE AS rank_ok
        FROM orders GROUP BY o_orderstatus"""
        for label, prob in PCT_PROBS
    )
    return f"SELECT * FROM (\n{arms}\n        ) ORDER BY o_orderstatus, p"


@query(
    "agg_approx_percentile_audit",
    category="aggregation",
    description=f"Quantile sketch audit: percentile_approx rank error vs exact percentiles at {[l for l, _ in PCT_PROBS]}",
    oracle=_pct_oracle(),
)
def agg_approx_percentile_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantile-sketch audit (HLL-audit discipline, applied to
    percentile_approx): per order status and probe quantile, emit the
    EXACT interpolated percentile (both engines interpolate over the
    same doubles; output rounded at 1e-4 — cross-engine margins pinned
    like the quality gate's) plus a rank-error boolean for the SKETCH
    estimate: the empirical rank of the approx value,
    count(price <= approx) / n, must sit within PCT_RANK_TOL of the
    target quantile — the guarantee percentile_approx actually makes
    (rank error <= 1/accuracy), checked in-engine, value-verified by
    the driver because the oracle asserts TRUE.

    Plan shape: one grouped aggregate computes exact + sketch arrays
    (both mergeable, map-side combined); probes explode to groups x 3
    rows (micro) and broadcast back onto ONE extra scan that counts
    rows under each approx value — two fact passes total, no sort. At
    100 TB the exact percentile would be dropped and the sketch kept;
    the audit exists to prove, per run, that dropping it is safe."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", F.col("o_totalprice").cast("double").alias("v")
    )
    probs = [p for _, p in PCT_PROBS]
    labels = F.array(*[F.lit(lbl) for lbl, _ in PCT_PROBS])
    targets = F.array(*[F.lit(p) for p in probs])
    stats = o.groupBy("o_orderstatus").agg(
        F.percentile("v", F.array(*[F.lit(p) for p in probs])).alias("ex"),
        F.percentile_approx(
            "v", F.array(*[F.lit(p) for p in probs]), F.lit(PCT_ACCURACY)
        ).alias("ap"),
        F.count(F.lit(1)).alias("n"),
    )
    probes = stats.select(
        "o_orderstatus",
        "n",
        F.posexplode(F.arrays_zip(labels.alias("lbl"), targets.alias("tgt"), "ex", "ap")).alias(
            "i", "z"
        ),
    ).select(
        "o_orderstatus",
        "n",
        F.col("z.lbl").alias("p"),
        F.col("z.tgt").alias("target"),
        F.col("z.ex").alias("exact_v"),
        F.col("z.ap").alias("approx_v"),
    )
    # empirical rank of each sketch estimate: one counting pass over the
    # fact relation against the broadcast micro probe set
    under = (
        o.join(F.broadcast(probes.select("o_orderstatus", "p", "approx_v")), "o_orderstatus")
        .filter(F.col("v") <= F.col("approx_v"))
        .groupBy("o_orderstatus", "p")
        .agg(F.count(F.lit(1)).alias("n_under"))
    )
    rank_err = F.abs(
        F.coalesce(F.col("n_under"), F.lit(0)) / F.col("n") - F.col("target")
    )
    return (
        probes.join(under, ["o_orderstatus", "p"], "left")
        .select(
            "o_orderstatus",
            "p",
            round_dbl(F.col("exact_v"), 4).alias("exact_pct"),
            (rank_err <= F.lit(PCT_RANK_TOL)).alias("rank_ok"),
        )
        .orderBy("o_orderstatus", "p")
    )


TOPK_K = 3
TOPK_TRACKED = 10_000


@query(
    "agg_approx_topk_audit",
    category="aggregation",
    description=f"Heavy-hitter sketch audit: approx_top_k top-{TOPK_K} priorities vs exact counts",
    oracle=f"""
        SELECT o_orderpriority, CAST(cnt AS BIGINT) AS cnt,
               CAST(rk AS BIGINT) AS rank, TRUE AS topk_exact_ok
        FROM (
            SELECT o_orderpriority, COUNT(*) AS cnt,
                   ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, o_orderpriority) AS rk
            FROM orders GROUP BY o_orderpriority
        ) WHERE rk <= {TOPK_K}
        ORDER BY rank
    """,
)
def agg_approx_topk_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via Spark 4's approx_top_k sketch, audited: the
    sketch tracks up to {TOPK_TRACKED} items and is EXACT whenever the
    true distinct count fits (the monitoring sweet spot — bounded state
    per partition, mergeable, no second pass). The query computes the
    exact top-{TOPK_K} (two-level count + TakeOrdered, no global sort)
    AND the sketch's top-{TOPK_K}, and emits the exact rows plus a
    boolean asserting the sketch reproduced every (item, count) pair as
    a SET (set comparison — within-top-k count ties order arbitrarily
    in the sketch output; the top-k/rest BOUNDARY is unambiguous on
    every shipped SF, min gap 3). The oracle recomputes the exact side
    with a ranked window and asserts TRUE."""
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("cnt"))
    exact = (
        counts.orderBy(F.col("cnt").desc(), "o_orderpriority")
        .limit(TOPK_K)
        .select(
            "o_orderpriority",
            "cnt",
            F.row_number()
            .over(Window.orderBy(F.col("cnt").desc(), "o_orderpriority"))
            .cast("long")
            .alias("rank"),
        )
    )
    sketch = o.agg(
        F.expr(
            f"approx_top_k(o_orderpriority, {TOPK_K}, {TOPK_TRACKED})"
        ).alias("tk")
    ).select(F.explode("tk").alias("e")).select(
        F.col("e.item").alias("o_orderpriority"), F.col("e.count").alias("cnt")
    )
    # set-equality: every exact (item, count) pair must appear in the
    # sketch output; both sides have TOPK_K rows, so a semi-join count
    # of TOPK_K is full set equality
    matched = exact.join(
        sketch, ["o_orderpriority", "cnt"], "left_semi"
    ).agg(F.count(F.lit(1)).alias("n_match"))
    return (
        exact.crossJoin(F.broadcast(matched))
        .select(
            "o_orderpriority",
            "cnt",
            "rank",
            (F.col("n_match") == TOPK_K).alias("topk_exact_ok"),
        )
        .orderBy("rank")
    )
