"""Aggregation queries (SURVEY.md §2B "aggregations"): hash agg with
partial+final combine, distinct aggregates, approx sketches, rollup, cube,
grouping sets, and pivot.

The reference delegates all aggregation to host Spark — its README golden
plan shows partial_count + final HashAggregate planned over its limited
scan (reference: README.md:88-95). Here every shape is exercised directly;
Catalyst plans two-phase hash aggregation (map-side combine) for all of
them, which is the 100 TB-safe default: the shuffle carries one row per
(partition × group), not per input row.

Determinism: variance/stddev are computed from exact decimal sums
(sum, sum of squares, count) instead of the built-in ``stddev`` whose
float accumulation differs between engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_jdbc_limit_spark.operators.registry import query
from spark_jdbc_limit_spark.operators.relational import (
    dec_avg,
    dec_sum,
    round_dbl,
    sql_dec_avg,
    sql_dec_sum,
    sql_round_dbl,
)
from spark_jdbc_limit_spark.sources.catalog import load_table


@query(
    "agg_stats_by_segment",
    category="aggregation",
    description="min/max/count/sum/avg/stddev per customer segment",
    oracle=f"""
        SELECT c_mktsegment,
               COUNT(*) AS n_customers,
               ROUND(MIN(c_acctbal), 2) AS min_bal,
               ROUND(MAX(c_acctbal), 2) AS max_bal,
               {sql_dec_sum('c_acctbal', 'sum_bal')},
               {sql_dec_avg('c_acctbal', 'avg_bal')},
               FLOOR(SQRT(GREATEST(
                   (CAST(SUM(CAST(c_acctbal * c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
                    - CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) ^ 2 / COUNT(*))
                   / NULLIF(COUNT(*) - 1, 0), 0.0)) * 10000.0 + 0.5) / 10000.0 AS stddev_bal
        FROM customer
        GROUP BY c_mktsegment
        ORDER BY c_mktsegment
    """,
)
def agg_stats_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    sum_sq = F.sum((F.col("c_acctbal") * F.col("c_acctbal")).cast("decimal(28,6)")).cast("double")
    sum_v = F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
    n = F.count(F.lit(1))
    var = (sum_sq - F.pow(sum_v, 2) / n) / F.nullif(n - 1, F.lit(0))
    return (
        c.groupBy("c_mktsegment")
        .agg(
            n.alias("n_customers"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
            dec_sum(F.col("c_acctbal"), "sum_bal"),
            dec_avg(F.col("c_acctbal"), "avg_bal"),
            round_dbl(F.sqrt(F.greatest(var, F.lit(0.0))), 4).alias("stddev_bal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "agg_distinct_counts",
    category="aggregation",
    description="COUNT(DISTINCT) — exact distinct aggregation per group",
    oracle="""
        SELECT l_returnflag,
               COUNT(DISTINCT l_suppkey) AS n_suppliers,
               COUNT(DISTINCT l_partkey) AS n_parts,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def agg_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two distinct aggregates in one query → Catalyst plans expand +
    two-phase agg; the expand doubles shuffle rows, which is why approx
    sketches (below) are preferred at 100 TB when tolerance allows."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


#: rel-error tolerance for the HLL++ in-query audit booleans. Measured max
#: rel error across sf0.001/0.01/0.1 for suppkey+partkey is 0.0103
#: (rsd=0.02, sf0.1) — 0.10 gives ~10× headroom while still asserting
#: the sketch is a sketch.
APPROX_CD_TOL = 0.10


@query(
    "agg_approx_distinct",
    category="aggregation",
    description="approx_count_distinct (HLL++) with in-query exact-tolerance audit",
    oracle=f"""
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_suppliers,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
               TRUE AS suppliers_within_tol,
               TRUE AS parts_within_tol
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ sketch: mergeable partial state → one small shuffle row
    per group regardless of cardinality. The scale path for distinct counts.

    Sketch estimates are engine-specific, so raw estimates can never
    hash-match a DuckDB oracle; instead the query audits itself (the
    ``ann_pq_rerank_audit`` discipline): it computes exact AND approx and
    emits the exact counts plus
    ``|approx - exact| / exact <= APPROX_CD_TOL`` booleans. The oracle
    recomputes the exact counts and asserts TRUE — so the driver's hash
    verifies both the exact arithmetic and that the sketch stayed in
    tolerance.

    Plan shape: per audited key, ONE two-level aggregate — groupBy(flag,
    key) first (map-side combine collapses to distinct pairs), then
    count + approx_count_distinct over the distinct-pair relation. HLL
    over a deduplicated column is BIT-IDENTICAL to HLL over the raw rows
    (duplicate inserts never change a sketch — verified at sf0.1), so
    the audit path measures exactly the production estimate while paying
    a distinct-pair shuffle instead of the expand a combined
    countDistinct+approx aggregate would plan (measured 4.7 s vs 1.0 s
    at sf0.1 — the expand quadruples shuffle rows). Audited keys are
    suppkey + PARTKEY: their distinct-pair relations are dimension-
    bounded (suppliers + parts), so the exact comparand's shuffle stays
    micro at any fact-table scale — an orderkey audit would shuffle a
    near-fact-cardinality pair relation (measured 1.6 s vs 0.83 s at
    sf0.1, and unboundedly worse at 100 TB)."""
    li = load_table(spark, sf_dir, "lineitem")

    def two_level(key: str, out: str) -> DataFrame:
        pairs = li.groupBy("l_returnflag", key).agg(F.count(F.lit(1)).alias("pr"))
        # count(key), not count(*): a NULL key collapses to one pair row
        # here, but COUNT(DISTINCT) and the HLL sketch both EXCLUDE nulls
        # — counting it would skew the exact comparand on nullable keys.
        return pairs.groupBy("l_returnflag").agg(
            F.count(F.col(key)).alias(f"exact_{out}"),
            F.approx_count_distinct(key, rsd=0.02).alias(f"approx_{out}"),
        )

    agg = two_level("l_suppkey", "suppliers").join(
        two_level("l_partkey", "parts"), "l_returnflag"
    )

    def within(approx: str, exact: str):
        # zero-safe: a group whose audited key is entirely NULL has
        # exact = approx = 0, and 0/0 would make the boolean NULL while
        # the oracle asserts TRUE — define the empty case as exact match
        rel = F.abs(F.col(approx) - F.col(exact)) / F.col(exact)
        return F.when(F.col(exact) == 0, F.col(approx) == 0).otherwise(
            rel <= F.lit(APPROX_CD_TOL)
        )

    return agg.select(
        "l_returnflag",
        "exact_suppliers",
        "exact_parts",
        within("approx_suppliers", "exact_suppliers").alias("suppliers_within_tol"),
        within("approx_parts", "exact_parts").alias("parts_within_tol"),
    ).orderBy("l_returnflag")


#: rel-error tolerance for the Datasketches-HLL union audit boolean.
#: Measured max rel error across shipped SFs is 0.013 (sf0.1 ALL row);
#: 0.05 matches the bound test_hll_union_of_group_sketches pins.
HLL_UNION_TOL = 0.05


@query(
    "agg_hll_sketch_union",
    category="aggregation",
    description="Datasketches HLL: per-group sketches unioned via hll_union_agg, with in-query exact-tolerance audit",
    oracle="""
        SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
               COUNT(*) AS n_rows,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
               TRUE AS within_tol
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag)
        ORDER BY l_returnflag
    """,
)
def agg_hll_sketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketches as first-class mergeable state (beyond approx_count_distinct,
    which hides the sketch): hll_sketch_agg materializes a per-group binary
    HLL sketch, hll_union_agg merges sketches downstream. This is the 100 TB
    rollup pattern — per-partition/per-day sketches a few KB each are stored
    or shuffled instead of raw keys, and any coarser grouping is answered by
    unioning sketches, never rescanning data. The reference has no aggregate
    code at all (SURVEY.md §2B: host Spark runs aggregation above its scans).

    tests/test_llm_ops.py pins the invariant that makes this sound: a union
    of per-group sketches estimates the same cardinality as one sketch built
    over the whole column (within sketch error — the union path promotes to
    HLL_8/lgMaxK so it is not bit-identical), both within 5% of exact.

    Driver-verifiability (the ``ann_pq_rerank_audit`` discipline): sketch
    estimates are engine-specific, so the query emits exact distincts plus
    a ``|estimate - exact| / exact <= HLL_UNION_TOL`` boolean per row — including
    the ALL row, whose ESTIMATE still comes strictly from unioning the
    per-flag sketches (never a rescan); only the audit's exact comparand
    reads the column again. The DuckDB oracle is a plain ROLLUP with TRUE
    booleans, so a hash match proves the union estimate stayed in
    tolerance in-engine.

    Plan shape: the same expand-free two-level aggregate as
    ``agg_approx_distinct`` — distinct (flag, partkey) pairs first
    (sketching the deduplicated column yields the identical sketch), so
    exact, estimate, AND row counts come out of one chain with no
    countDistinct expand."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.groupBy("l_returnflag", "l_partkey").agg(
        F.count(F.lit(1)).alias("pr")
    )
    per_flag = pairs.groupBy("l_returnflag").agg(
        F.hll_sketch_agg("l_partkey").alias("sk"),
        # count(key), not count(*): a NULL partkey is one pair row but the
        # sketch and COUNT(DISTINCT) exclude nulls (see agg_approx_distinct)
        F.count(F.col("l_partkey")).alias("exact_parts"),
        F.sum("pr").alias("n_rows"),
    )
    flag_rows = per_flag.select(
        "l_returnflag",
        "n_rows",
        "exact_parts",
        F.hll_sketch_estimate("sk").alias("est"),
    )
    # The rollup level: the grand total is answered by UNIONING the per-flag
    # sketches (hll_union_agg), never rescanning lineitem — the whole point
    # of carrying sketches instead of estimates. (The exact_all comparand
    # below exists only for the audit boolean.)
    grand = per_flag.agg(
        F.sum("n_rows").alias("n_rows"),
        F.hll_sketch_estimate(F.hll_union_agg("sk", True)).alias("est"),
    )
    exact_all = pairs.agg(F.countDistinct("l_partkey").alias("exact_parts"))
    grand_rows = grand.crossJoin(exact_all).select(
        F.lit("ALL").alias("l_returnflag"), "n_rows", "exact_parts", "est"
    )
    within = F.when(  # zero-safe like agg_approx_distinct's within()
        F.col("exact_parts") == 0, F.col("est") == 0
    ).otherwise(
        F.abs(F.col("est") - F.col("exact_parts")) / F.col("exact_parts")
        <= F.lit(HLL_UNION_TOL)
    )
    return (
        flag_rows.unionByName(grand_rows)
        .select("l_returnflag", "n_rows", "exact_parts", within.alias("within_tol"))
        .orderBy("l_returnflag")
    )


@query(
    "agg_rollup",
    category="aggregation",
    description="ROLLUP over (returnflag, linestatus) with grouping ids",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(GROUPING(l_returnflag) AS BIGINT) AS g_flag,
               CAST(GROUPING(l_linestatus) AS BIGINT) AS g_status,
               COUNT(*) AS n_rows,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        ORDER BY g_flag, g_status, l_returnflag, l_linestatus
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with the same two-level rewrite as ``agg_cube``: aggregate
    to the finest (flag, status) grouping first so the rollup EXPAND
    (×3 here) touches the micro relation, not the fact rows."""
    li = load_table(spark, sf_dir, "lineitem")
    fine = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).alias("s"),
    )
    return (
        fine.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping("l_returnflag").cast("long").alias("g_flag"),
            F.grouping("l_linestatus").cast("long").alias("g_status"),
            F.sum("n").alias("n_rows"),
            F.round(F.sum("s"), 2).cast("double").alias("sum_qty"),
        )
        .orderBy("g_flag", "g_status", "l_returnflag", "l_linestatus")
    )


@query(
    "agg_cube",
    category="aggregation",
    description="CUBE over (orderstatus, orderpriority)",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_prio,
               COUNT(*) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_price
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY g_status, g_prio, o_orderstatus, o_orderpriority
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE with the two-level rewrite: a naive ``o.cube(a, b)`` EXPANDs
    every fact row ×4 (one copy per grouping set) before the shuffle —
    at 100 TB the expand quadruples exchange volume. Aggregating to the
    FINEST grouping first (status × priority — a few dozen groups,
    map-side combined) and cubing the micro relation computes the
    identical result (counts and decimal sums are re-aggregable; the
    rounding still happens once, after the outer sum) with the expand
    touching only the micro rows."""
    o = load_table(spark, sf_dir, "orders")
    fine = o.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("s"),
    )
    return (
        fine.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping("o_orderstatus").cast("long").alias("g_status"),
            F.grouping("o_orderpriority").cast("long").alias("g_prio"),
            F.sum("n").alias("n_orders"),
            F.round(F.sum("s"), 2).cast("double").alias("sum_price"),
        )
        .orderBy("g_status", "g_prio", "o_orderstatus", "o_orderpriority")
    )


@query(
    "agg_grouping_sets",
    category="aggregation",
    description="Explicit GROUPING SETS — mixed granularities in one pass",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS with the two-level rewrite (see ``agg_cube``): the
    inner subquery collapses the fact rows to the finest grouping with
    ordinary map-side-combined aggregation; the grouping-sets EXPAND
    (×3) then runs over the micro relation."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, SUM(n) AS n_rows
        FROM (
            SELECT l_returnflag, l_linestatus, COUNT(*) AS n
            FROM lineitem_gs
            GROUP BY l_returnflag, l_linestatus
        )
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
        """
    )


@query(
    "agg_pivot",
    category="aggregation",
    description="Pivot linestatus into columns of summed quantity per returnflag",
    oracle="""
        SELECT l_returnflag,
               CAST(ROUND(SUM(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity END
                     AS DECIMAL(18,6))), 2) AS DOUBLE) AS qty_O,
               CAST(ROUND(SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity END
                     AS DECIMAL(18,6))), 2) AS DOUBLE) AS qty_F
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit pivot values ('O','F') — without them Spark runs an extra
    distinct pass over the pivot column, a full shuffle wasted at scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.round(F.sum(F.col("l_quantity").cast("decimal(18,6)")), 2).cast("double"))
        .select(
            "l_returnflag",
            F.col("O").alias("qty_O"),
            F.col("F").alias("qty_F"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_collect_sorted",
    category="aggregation",
    description="Ordered collect_list / string_agg per nation",
    oracle="""
        SELECT n_nationkey,
               string_agg(s_name, '|' ORDER BY s_name) AS supplier_names,
               COUNT(*) AS n_suppliers
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_nationkey
        ORDER BY n_nationkey
    """,
)
def agg_collect_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG/string_agg semantics: collect per-group values into a
    canonically ordered string. ``collect_list`` order is
    partition-layout-dependent, so ``sort_array`` before joining — the
    only way the result is deterministic under ANY partitioning (and the
    reason the oracle's ORDER BY inside string_agg matches exactly).
    One hash aggregate; the small nation dim broadcasts."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .groupBy("n_nationkey")
        .agg(
            F.array_join(F.sort_array(F.collect_list("s_name")), "|").alias(
                "supplier_names"
            ),
            F.count(F.lit(1)).alias("n_suppliers"),
        )
        .orderBy("n_nationkey")
    )


@query(
    "agg_conditional_filter",
    category="aggregation",
    description="FILTER-style conditional aggregates: count_if, filtered sum, bool_and/bool_or",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n_orders,
               COUNT(*) FILTER (WHERE o_totalprice > 100000) AS n_big,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6)))
                          FILTER (WHERE o_orderstatus = 'F'), 2) AS DOUBLE) AS sum_finished,
               bool_and(o_totalprice > 0) AS all_positive,
               bool_or(o_orderstatus = 'P') AS any_pending
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def agg_conditional_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation without self-joins or unions: count_if,
    sum-over-a-predicate (the FILTER clause), and boolean aggregates —
    one pass, one shuffle, every branch in the same partial/final hash
    aggregate. The anti-pattern this replaces (one groupBy per predicate
    + join) multiplies shuffles by the predicate count. Filtered sum in
    decimal domain for engine-exact parity."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_if(F.col("o_totalprice") > 100000).alias("n_big"),
            F.round(
                F.sum(
                    F.when(
                        F.col("o_orderstatus") == "F",
                        F.col("o_totalprice").cast("decimal(18,6)"),
                    )
                ),
                2,
            )
            .cast("double")
            .alias("sum_finished"),
            F.bool_and(F.col("o_totalprice") > 0).alias("all_positive"),
            F.bool_or(F.col("o_orderstatus") == "P").alias("any_pending"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "agg_mode_argmax",
    category="aggregation",
    description="Per-group mode via the deterministic argmax pattern (max over (count, key))",
    oracle="""
        WITH c AS (
            SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
            FROM orders
            GROUP BY o_orderpriority, o_orderstatus
        ),
        r AS (
            SELECT *, row_number() OVER (PARTITION BY o_orderpriority
                                         ORDER BY cnt DESC, o_orderstatus DESC) AS rn
            FROM c
        )
        SELECT o_orderpriority, o_orderstatus AS mode_status, cnt AS mode_count
        FROM r WHERE rn = 1
        ORDER BY o_orderpriority
    """,
)
def agg_mode_argmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most-frequent value per group, deterministically: count pairs, then
    max over the (count, value) struct — ties break to the larger value in
    BOTH engines, unlike built-in mode() whose tie-break is unspecified.
    Two hash aggregates, the second over the (small) distinct-pair set;
    no window, no sort — at 100 TB the pair set is the compressible
    intermediate, not the raw rows."""
    o = load_table(spark, sf_dir, "orders")
    c = o.groupBy("o_orderpriority", "o_orderstatus").agg(F.count(F.lit(1)).alias("cnt"))
    best = F.max(F.struct(F.col("cnt"), F.col("o_orderstatus"))).alias("best")
    return (
        c.groupBy("o_orderpriority")
        .agg(best)
        .select(
            "o_orderpriority",
            F.col("best.o_orderstatus").alias("mode_status"),
            F.col("best.cnt").alias("mode_count"),
        )
        .orderBy("o_orderpriority")
    )


HIST_LO, HIST_HI, HIST_NB = 0.0, 600000.0, 20


@query(
    "agg_histogram_prices",
    category="aggregation",
    description=f"{HIST_NB}-bucket histogram of order prices with under/overflow buckets",
    oracle=f"""
        WITH b AS (
            SELECT CASE WHEN o_totalprice < {HIST_LO} THEN 0
                        WHEN o_totalprice >= {HIST_HI} THEN {HIST_NB} + 1
                        ELSE CAST(FLOOR((o_totalprice - {HIST_LO})
                                        / ({HIST_HI} - {HIST_LO}) * {HIST_NB}) AS INTEGER) + 1
                   END AS bucket,
                   o_totalprice
            FROM orders
        )
        SELECT bucket,
               COUNT(*) AS n,
               ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE), 2) AS total
        FROM b GROUP BY bucket
    """,
)
def agg_histogram_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram with explicit under/overflow buckets — the
    profiling primitive for choosing partition bounds and spotting skew
    before a big job. The bucket id is pure arithmetic on the scan (both
    engines evaluate the identical IEEE double expression, so bucket
    edges agree bit-for-bit), then one HIST_NB+2-key hash agg: map-side
    partial aggregation reduces every scan task to ≤22 rows, so the
    shuffle is constant-size at any corpus scale."""
    o = load_table(spark, sf_dir, "orders")
    v = F.col("o_totalprice")
    bucket = (
        F.when(v < HIST_LO, F.lit(0))
        .when(v >= HIST_HI, F.lit(HIST_NB + 1))
        .otherwise(
            F.floor((v - HIST_LO) / (HIST_HI - HIST_LO) * HIST_NB).cast("int") + 1
        )
    )
    return (
        o.select(bucket.alias("bucket"), v.alias("p"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("p").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total"),
        )
    )


@query(
    "agg_distinct_two_phase",
    category="aggregation",
    description="Skew-safe EXACT distinct count: dedup-then-count in two hash aggs",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(*) AS BIGINT) AS n_distinct_suppliers
        FROM (SELECT DISTINCT l_returnflag, l_suppkey FROM lineitem)
        GROUP BY l_returnflag
    """,
)
def agg_distinct_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) re-expressed as dedup-then-count — the
    skew-safe formulation for 100 TB. ``countDistinct(v)`` per group makes
    the final aggregate for a group hold that group's full distinct SET in
    one task's hash map; with 3 group keys and 10⁹ distinct values each,
    three reducers own gigabytes while the rest idle. Splitting it into
    (1) ``groupBy(key, value)`` dedup — shuffle keyed on the PAIR, so the
    hot group's values spread across every reducer and map-side partials
    absorb repeats at scan speed — then (2) a plain count per key, turns
    the skew monster into two well-spread hash aggregates. Same exact
    answer, pinned against ``agg_distinct_counts``'s COUNT(DISTINCT) by
    the shared oracle tables."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_suppkey")
        .distinct()
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_distinct_suppliers"))
    )


RFM_BINS = 5

#: Shared by the ntile and two-phase variants — both compute EXACTLY this.
_RFM_ORACLE = f"""
        WITH base AS (
            SELECT o_custkey AS custkey,
                   MAX(o_orderdate) AS last_order,
                   CAST(COUNT(*) AS BIGINT) AS frequency,
                   ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2)
                       AS monetary
            FROM orders
            GROUP BY o_custkey
        )
        SELECT custkey, frequency,
               CAST(monetary AS DOUBLE) AS monetary,
               NTILE({RFM_BINS}) OVER (ORDER BY last_order, custkey) AS r_score,
               NTILE({RFM_BINS}) OVER (ORDER BY frequency, custkey) AS f_score,
               NTILE({RFM_BINS}) OVER (ORDER BY monetary, custkey) AS m_score
        FROM base
    """


def _rfm_base(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per customer: (custkey, last_order, frequency, monetary).
    Map-side partials, one shuffle — the only data-sized work in either
    RFM variant."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2).alias(
            "monetary"
        ),
    )


@query(
    "customer_rfm_segmentation",
    category="aggregation",
    description=f"RFM segmentation: {RFM_BINS}-quantile recency/frequency/monetary scores per customer",
    oracle=_RFM_ORACLE,
)
def customer_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the marketing-analytics workhorse: per-customer
    recency (last order), frequency (order count), monetary (total
    spend), each quintile-scored with ntile. Aggregate-first discipline:
    the orders stream collapses to one row per customer (map-side
    partials, one shuffle), and the three ntile windows rank that
    customer-level relation. The ntile windows order globally — at this
    catalog's dimension scale (customers ≈ rows/10³) that single-task
    rank is micro-data; at true 100 TB customer counts use
    ``customer_rfm_segmentation_scalable`` below — the two-phase
    bucket-ranked twin of THIS query (pinned exactly equal by
    tests/test_scale_ops.py), which replaces each global sort with a
    bucket-partitioned rank + micro offset join. Unique (metric,
    custkey) tie-breaks make every score engine-deterministic."""
    from pyspark.sql import Window as W

    base = _rfm_base(spark, sf_dir)
    return base.select(
        "custkey",
        "frequency",
        F.col("monetary").cast("double").alias("monetary"),
        F.ntile(RFM_BINS)
        .over(W.orderBy("last_order", "custkey"))
        .alias("r_score"),
        F.ntile(RFM_BINS)
        .over(W.orderBy("frequency", "custkey"))
        .alias("f_score"),
        F.ntile(RFM_BINS)
        .over(W.orderBy("monetary", "custkey"))
        .alias("m_score"),
    )


@query(
    "customer_rfm_segmentation_scalable",
    category="aggregation",
    description=f"RFM segmentation, 100 TB path: two-phase bucket-ranked ntile, no global sort",
    oracle=_RFM_ORACLE,
)
def customer_rfm_segmentation_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``customer_rfm_segmentation`` without the single-task global
    sorts: EXACTLY the same scores (same oracle), computed scalably.

    Per metric: (1) a MONOTONE value-derived bucket (month index for
    recency, the count itself for frequency, a fixed-width band for
    monetary) — order-preserving, so global order = (bucket, local
    order); (2) ``row_number`` partitioned by bucket — one hash shuffle,
    every bucket ranked in parallel; (3) per-bucket counts → running
    offsets via a window over the #buckets-row MICRO relation →
    broadcast-join back, giving the exact global rank; (4) ntile's
    arithmetic applied to that rank (first n%B buckets get
    floor(n/B)+1 rows) — bit-identical to the window function without
    ever sorting the relation in one task. Three metric rankings join
    back on custkey; each join input is the customer micro-relation.
    Same unique (metric, custkey) tie-breaks as the ntile twin."""
    from pyspark.sql import Window as W

    base = _rfm_base(spark, sf_dir)

    def two_phase_score(bucket, order_cols, out: str) -> DataFrame:
        b = base.withColumn("bucket", bucket)
        local = b.withColumn(
            "local_rn",
            F.row_number().over(W.partitionBy("bucket").orderBy(*order_cols)),
        )
        counts = b.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))
        offsets = counts.withColumn(
            "offset",
            F.coalesce(
                F.sum("cnt").over(
                    W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        ).select("bucket", "offset")
        total = counts.agg(F.sum("cnt").alias("n_total"))
        ranked = (
            local.join(F.broadcast(offsets), "bucket")
            .withColumn("rank", F.col("offset") + F.col("local_rn"))
            .crossJoin(F.broadcast(total))  # one-row relation
        )
        # ntile(B) over n rows: the first n%B buckets hold floor(n/B)+1
        # rows, the rest floor(n/B) — the standard-SQL definition both
        # Spark and DuckDB implement.
        q = F.floor(F.col("n_total") / RFM_BINS)
        r = F.col("n_total") % RFM_BINS
        big = r * (q + 1)  # rows covered by the size-(q+1) buckets
        score = F.when(
            F.col("rank") <= big, F.floor((F.col("rank") - 1) / (q + 1)) + 1
        ).otherwise(r + F.floor((F.col("rank") - big - 1) / q) + 1)
        return ranked.select("custkey", score.cast("int").alias(out))

    r_scores = two_phase_score(
        F.year("last_order") * 12 + F.month("last_order"),
        ["last_order", "custkey"],
        "r_score",
    )
    f_scores = two_phase_score(
        F.col("frequency"), ["frequency", "custkey"], "f_score"
    )
    m_scores = two_phase_score(
        F.floor(F.col("monetary").cast("double") / 100000.0),
        ["monetary", "custkey"],
        "m_score",
    )
    return (
        base.select(
            "custkey", "frequency", F.col("monetary").cast("double").alias("monetary")
        )
        .join(r_scores, "custkey")
        .join(f_scores, "custkey")
        .join(m_scores, "custkey")
    )


@query(
    "brand_abc_pareto",
    category="aggregation",
    description="ABC/Pareto classification of brands by cumulative revenue share",
    oracle="""
        WITH rev AS (
            SELECT p_brand,
                   ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                  AS DECIMAL(28,8))), 2) AS revenue
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand
        ),
        ranked AS (
            SELECT p_brand, CAST(revenue AS DOUBLE) AS revenue,
                   CAST(SUM(revenue) OVER (ORDER BY revenue DESC, p_brand)
                        AS DOUBLE)
                     / CAST(SUM(revenue) OVER () AS DOUBLE) AS cum_share_raw
            FROM rev
        )
        SELECT p_brand, revenue, cum_share,
               CASE WHEN cum_share <= 0.8 THEN 'A'
                    WHEN cum_share <= 0.95 THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM (
            SELECT p_brand, revenue,
                   FLOOR(cum_share_raw * 10000.0 + 0.5) / 10000.0 AS cum_share
            FROM ranked
        )
    """,
)
def brand_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto 80/95) classification — which brands carry the
    revenue. The fact stream reduces to one row per brand via a
    broadcast dim join + partial-aggregated hash agg (the only
    data-sized work); the cumulative-share window then runs over the
    brand-cardinality micro relation, where a global ordered running
    sum is a non-issue. Decimal accumulation keeps the revenue exact;
    the share is rounded half-up at 1e-4 FIRST and the A/B/C label is
    derived from that ROUNDED value in both engines — classifying from
    the raw running double would let a share within ~1 ulp of the
    0.8/0.95 boundary flip class between Spark's per-row double running
    sum and DuckDB's decimal-then-cast accumulation."""
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(28,8)"
                    )
                ),
                2,
            ).alias("revenue")
        )
    )
    w_run = W.orderBy(F.col("revenue").cast("double").desc(), "p_brand").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    w_all = W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    share = (
        F.sum(F.col("revenue").cast("double")).over(w_run)
        / F.sum(F.col("revenue").cast("double")).over(w_all)
    )
    cum_share = F.floor(share * 10000.0 + F.lit(0.5)) / 10000.0
    return rev.select(
        "p_brand",
        F.col("revenue").cast("double").alias("revenue"),
        cum_share.alias("cum_share"),
        F.when(cum_share <= 0.8, "A")
        .when(cum_share <= 0.95, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


@query(
    "dq_expectations_report",
    category="aggregation",
    description="Single-pass data-quality report: completeness/uniqueness/range/set checks",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               FLOOR(AVG(CASE WHEN l_shipdate IS NOT NULL THEN 1.0 ELSE 0.0 END)
                     * 10000.0 + 0.5) / 10000.0 AS shipdate_completeness,
               CAST(COUNT(DISTINCT l_orderkey * 16 + l_linenumber) AS BIGINT)
                   AS n_distinct_line_ids,
               CAST(SUM(CASE WHEN l_quantity BETWEEN 1 AND 50
                             THEN 0 ELSE 1 END) AS BIGINT) AS qty_range_violations,
               CAST(SUM(CASE WHEN l_returnflag IN ('A', 'N', 'R')
                             THEN 0 ELSE 1 END) AS BIGINT) AS flag_domain_violations,
               CAST(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS nonpositive_price_count
        FROM lineitem
    """,
)
def dq_expectations_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality verification, Deequ-style: completeness,
    key uniqueness, range, domain membership, and sign checks — ALL
    computed in ONE scan as columns of a single aggregate. That
    single-pass shape is the entire point at 100 TB: a naive
    check-per-query expectations suite re-reads the table once per
    constraint; folding every metric into one `agg` makes the whole
    report cost one pass + one 1-row shuffle, and adding a constraint
    is free. Uniqueness rides as an exact distinct count of the
    composite line id (the one metric that shuffles more than a row —
    swap for approx_count_distinct when tolerance allows)."""
    li = load_table(spark, sf_dir, "lineitem")
    line_id = F.col("l_orderkey") * 16 + F.col("l_linenumber")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        (
            F.floor(
                F.avg(F.when(F.col("l_shipdate").isNotNull(), 1.0).otherwise(0.0))
                * 10000.0
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("shipdate_completeness"),
        F.countDistinct(line_id).alias("n_distinct_line_ids"),
        F.sum(
            F.when((F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 50), 0)
            .otherwise(1)
        ).cast("long").alias("qty_range_violations"),
        F.sum(
            F.when(F.col("l_returnflag").isin("A", "N", "R"), 0).otherwise(1)
        ).cast("long").alias("flag_domain_violations"),
        F.sum(F.when(F.col("l_extendedprice") <= 0, 1).otherwise(0))
        .cast("long")
        .alias("nonpositive_price_count"),
    )


@query(
    "orders_weekly_trend_forecast",
    category="aggregation",
    description="OLS trend over weekly revenue + next-week forecast, one row",
    oracle=f"""
        WITH weekly AS (
            SELECT date_trunc('week', o_orderdate) AS wk,
                   CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2)
                        AS DOUBLE) AS rev
            FROM orders GROUP BY 1
        ),
        idx AS (
            SELECT (epoch(wk) - (SELECT epoch(MIN(wk)) FROM weekly))
                       / 604800.0 AS x,
                   rev AS y
            FROM weekly
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_weeks,
               {sql_round_dbl('COVAR_POP(x, y) / VAR_POP(x)', 4)} AS slope,
               {sql_round_dbl(
                   'AVG(y) - COVAR_POP(x, y) / VAR_POP(x) * AVG(x)', 4)}
                   AS intercept,
               {sql_round_dbl(
                   '(AVG(y) - COVAR_POP(x, y) / VAR_POP(x) * AVG(x))'
                   ' + COVAR_POP(x, y) / VAR_POP(x) * (MAX(x) + 1.0)', 4)}
                   AS next_week_forecast
        FROM idx
    """,
)
def orders_weekly_trend_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form linear trend + one-step forecast over weekly revenue —
    the canonical capacity/demand-planning query (and the baseline any
    fancier forecaster must beat). The fact stream collapses to the
    week-cardinality micro relation in one decimal-exact pass; the week
    index is epoch arithmetic against the min week (an exact multiple
    of 604800 s → integer-valued doubles, so x is bit-identical in both
    engines); slope/intercept are covar_pop/var_pop built-ins and the
    forecast extrapolates one index step past MAX(x). Everything after
    the first shuffle runs on ~weeks rows at any corpus scale. Same OLS
    shape as text_zipf_fit — one regression primitive, two domains."""
    o = load_table(spark, sf_dir, "orders")
    weekly = o.groupBy(F.date_trunc("week", "o_orderdate").alias("wk")).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("y")
    )
    wmin = weekly.agg(F.min("wk").alias("w0"))
    idx = weekly.crossJoin(F.broadcast(wmin)).select(
        (
            (F.col("wk").cast("double") - F.col("w0").cast("double")) / 604800.0
        ).alias("x"),
        "y",
    )
    slope = F.covar_pop("x", "y") / F.var_pop("x")
    intercept = F.avg("y") - slope * F.avg("x")
    return idx.agg(
        F.count(F.lit(1)).alias("n_weeks"),
        round_dbl(slope, 4).alias("slope"),
        round_dbl(intercept, 4).alias("intercept"),
        round_dbl(intercept + slope * (F.max("x") + 1.0), 4).alias(
            "next_week_forecast"
        ),
    )


@query(
    "supplier_hhi_by_nation",
    category="aggregation",
    description="Market concentration per nation: supplier revenue HHI + top share",
    oracle=f"""
        WITH rev AS (
            SELECT s_nationkey, l_suppkey,
                   CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                                       AS DECIMAL(28,8))), 2) AS DOUBLE)
                       AS revenue
            FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
            GROUP BY 1, 2
        ),
        tot AS (
            SELECT s_nationkey, SUM(revenue) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_suppliers
            FROM rev GROUP BY s_nationkey
        )
        SELECT n_name, t.n_suppliers,
               {sql_round_dbl(
                   'SUM((r.revenue / t.total) * (r.revenue / t.total))', 4)}
                   AS hhi,
               {sql_round_dbl('MAX(r.revenue / t.total)', 4)} AS top_share
        FROM rev r
        JOIN tot t USING (s_nationkey)
        JOIN nation ON n_nationkey = r.s_nationkey
        GROUP BY n_name, t.n_suppliers
    """,
)
def supplier_hhi_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl–Hirschman concentration index per nation — 'is this
    market a monopoly': the sum of squared supplier revenue shares
    (1/n for perfect competition → 1.0 for a single supplier), plus the
    largest single share. The fact-sized work is ONE decimal-exact
    per-supplier revenue aggregate straight off the scan — map-side
    combined, no per-fact-row join probe (round-14: the broadcast
    supplier join moved AFTER the aggregate, so it attaches s_nationkey
    to supplier-cardinality rows instead of being evaluated per
    lineitem row; suppkey determines nationkey, so the grouped values
    are unchanged); nation totals, shares, squares, and the final
    per-nation rollup all run on the supplier-cardinality micro
    relation. The per-supplier revenue is rounded to cents BEFORE share
    division in both engines (the same decimal-then-round discipline as
    brand_abc_pareto) so the share ratios start from identical
    doubles."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    rev = (
        li.groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(28,8)"
                    )
                ),
                2,
            )
            .cast("double")
            .alias("revenue")
        )
        .join(
            F.broadcast(s.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        # rev feeds BOTH the nation-total rollup and the share join, and
        # exchange reuse does not fire across the two differently-joined
        # consumers — without this the fact aggregate ran twice (plan
        # audit, round 14). Supplier-cardinality rows: the checkpoint is
        # micro; eager=False so the first action materializes it.
        .localCheckpoint(eager=False)
    )
    tot = rev.groupBy("s_nationkey").agg(
        F.sum("revenue").alias("total"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    share = F.col("revenue") / F.col("total")
    return (
        rev.join(F.broadcast(tot), "s_nationkey")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name", "n_suppliers")
        .agg(
            round_dbl(F.sum(share * share), 4).alias("hhi"),
            round_dbl(F.max(share), 4).alias("top_share"),
        )
        .select("n_name", "n_suppliers", "hhi", "top_share")
    )


@query(
    "dq_referential_integrity",
    category="aggregation",
    description="FK orphan audit across the star schema: distinct dangling keys per relationship, one row",
    oracle="""
        SELECT
          (SELECT CAST(COUNT(*) AS BIGINT)
           FROM (SELECT DISTINCT l_orderkey FROM lineitem) f
           WHERE NOT EXISTS (SELECT 1 FROM orders
                             WHERE o_orderkey = f.l_orderkey))
              AS orphan_lineitem_orders,
          (SELECT CAST(COUNT(*) AS BIGINT)
           FROM (SELECT DISTINCT o_custkey FROM orders) f
           WHERE NOT EXISTS (SELECT 1 FROM customer
                             WHERE c_custkey = f.o_custkey))
              AS orphan_orders_customer,
          (SELECT CAST(COUNT(*) AS BIGINT)
           FROM (SELECT DISTINCT l_partkey FROM lineitem) f
           WHERE NOT EXISTS (SELECT 1 FROM part
                             WHERE p_partkey = f.l_partkey))
              AS orphan_lineitem_part,
          (SELECT CAST(COUNT(*) AS BIGINT)
           FROM (SELECT DISTINCT l_suppkey FROM lineitem) f
           WHERE NOT EXISTS (SELECT 1 FROM supplier
                             WHERE s_suppkey = f.l_suppkey))
              AS orphan_lineitem_supplier,
          (SELECT CAST(COUNT(*) AS BIGINT)
           FROM (SELECT DISTINCT c_nationkey FROM customer) f
           WHERE NOT EXISTS (SELECT 1 FROM nation
                             WHERE n_nationkey = f.c_nationkey))
              AS orphan_customer_nation
    """,
)
def dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit — the pre-join data-quality gate a
    pipeline runs before trusting a star schema: for each FK→PK
    relationship, the count of DISTINCT dangling foreign keys (keys, not
    rows: a hot orphan key would otherwise dominate the count AND the
    runtime; the key-level number is what you fix). Scale shape: each
    fact column first collapses to its distinct-key micro relation
    (partial-aggregated — the only fact-sized work), then anti-joins its
    PK side: broadcast for the bounded dims (part/supplier/customer/
    nation), shuffle anti-join of two key-cardinality relations for
    lineitem→orders. The five one-row counts cross-join into a single
    report row — the dq_expectations_report posture extended across
    relations. On a healthy corpus every count is 0; the check is the
    contract, and the oracle recomputes each via NOT EXISTS."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")

    def orphans(fk_df, fk, pk_df, pk, name, broadcast_pk):
        pks = pk_df.select(pk)
        if broadcast_pk:
            pks = F.broadcast(pks)
        return (
            fk_df.select(fk)
            .distinct()
            .join(pks, F.col(fk) == F.col(pk), "left_anti")
            .agg(F.count(F.lit(1)).alias(name))
        )

    checks = [
        orphans(li, "l_orderkey", o, "o_orderkey", "orphan_lineitem_orders", False),
        orphans(o, "o_custkey", c, "c_custkey", "orphan_orders_customer", True),
        orphans(li, "l_partkey", p, "p_partkey", "orphan_lineitem_part", True),
        orphans(li, "l_suppkey", s, "s_suppkey", "orphan_lineitem_supplier", True),
        orphans(c, "c_nationkey", n, "n_nationkey", "orphan_customer_nation", True),
    ]
    out = checks[0]
    for chk in checks[1:]:
        out = out.crossJoin(chk)  # five one-row relations
    return out


@query(
    "incremental_reaggregation",
    category="aggregation",
    description="Re-aggregatable rollup: weekly metrics merged FROM daily partials, no raw rescan",
    oracle="""
        SELECT date_trunc('week', o_orderdate) AS week, o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2)
                    AS DOUBLE) AS total_price,
               CAST(MAX(o_totalprice) AS DOUBLE) AS max_price
        FROM orders
        GROUP BY 1, 2
    """,
)
def incremental_reaggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-aggregation/OLAP-cube pattern: weekly metrics are computed
    by MERGING daily partial aggregates — count via sum-of-counts,
    sum via sum-of-sums (decimal partials, rounded once at the end),
    max via max-of-maxes — never by rescanning raw orders. The oracle
    aggregates the raw table directly, so a pass proves the chosen
    metrics are genuinely re-aggregatable (the reason incremental
    rollups must avoid AVG/DISTINCT partials and carry sums + counts
    instead). At 100 TB this is the difference between a weekly report
    that reads 7 daily summary rows per key and one that re-reads a
    week of raw data."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.date_trunc("day", "o_orderdate").alias("day"), "o_orderstatus"
    ).agg(
        F.count(F.lit(1)).alias("d_n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("d_sum"),
        F.max("o_totalprice").alias("d_max"),
    )
    return (
        daily.groupBy(
            F.date_trunc("week", "day").alias("week"), "o_orderstatus"
        )
        .agg(
            F.sum("d_n").cast("long").alias("n_orders"),
            F.round(F.sum("d_sum"), 2).cast("double").alias("total_price"),
            F.max("d_max").cast("double").alias("max_price"),
        )
    )


@query(
    "dq_join_key_skew_report",
    category="aggregation",
    description="Join-key skew diagnostics: cardinality, hottest key, skew ratio in one pass",
    oracle="""
        WITH c AS (
            SELECT l_suppkey AS key, COUNT(*) AS cnt
            FROM lineitem GROUP BY 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(MAX(cnt) AS BIGINT) AS max_freq,
               FLOOR(CAST(SUM(cnt) AS DOUBLE) / COUNT(*) * 10000.0 + 0.5)
                   / 10000.0 AS avg_freq,
               FLOOR(CAST(MAX(cnt) AS DOUBLE) / (CAST(SUM(cnt) AS DOUBLE)
                     / COUNT(*)) * 10000.0 + 0.5) / 10000.0 AS skew_ratio,
               FLOOR(CAST(MAX(cnt) AS DOUBLE) / CAST(SUM(cnt) AS DOUBLE)
                     * 1000000.0 + 0.5) / 1000000.0 AS top1_share,
               (SELECT key FROM c ORDER BY cnt DESC, key LIMIT 1)
                   AS hottest_key
        FROM c
    """,
)
def dq_join_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join skew screening — the diagnostic you run BEFORE deciding
    between a plain shuffle join, a salted join, or AQE skew handling
    (all three live in this catalog): key cardinality, the hottest key
    and its share, and max/mean frequency, from ONE pass over the fact
    table plus one micro aggregate over the key-cardinality relation.
    The hottest key comes from a lexicographic max over (count, -key) —
    deterministic under count ties without a sort. At 100 TB this is two
    map-side-combined hash aggregates; nothing is ever collected or
    globally sorted."""
    li = load_table(spark, sf_dir, "lineitem")
    c = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    avg = F.sum("cnt").cast("double") / F.count(F.lit(1))
    mx = F.max("cnt").cast("double")
    hottest = F.max(F.struct(F.col("cnt"), (-F.col("key")).alias("nk")))
    return c.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_freq"),
        (F.floor(avg * 10000.0 + F.lit(0.5)) / 10000.0).alias("avg_freq"),
        (F.floor(mx / avg * 10000.0 + F.lit(0.5)) / 10000.0).alias("skew_ratio"),
        (
            F.floor(mx / F.sum("cnt").cast("double") * 1000000.0 + F.lit(0.5))
            / 1000000.0
        ).alias("top1_share"),
        (-hottest.getField("nk")).alias("hottest_key"),
    )


@query(
    "orders_benford_first_digit",
    category="aggregation",
    description="Benford's-law fraud screen: first-digit distribution of order totals",
    oracle="""
        WITH digits AS (
            SELECT CAST(FLOOR(o_totalprice
                              / POWER(10, FLOOR(LOG10(o_totalprice))))
                        AS BIGINT) AS digit
            FROM orders
            WHERE o_totalprice > 0
        )
        SELECT digit,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               FLOOR(CAST(COUNT(*) AS DOUBLE)
                     / SUM(COUNT(*)) OVER () * 1000000.0 + 0.5) / 1000000.0
                   AS obs_share,
               FLOOR(LOG10(1.0 + 1.0 / digit) * 1000000.0 + 0.5) / 1000000.0
                   AS benford_share,
               FLOOR(ABS(CAST(COUNT(*) AS DOUBLE) / SUM(COUNT(*)) OVER ()
                         - LOG10(1.0 + 1.0 / digit)) * 1000000.0 + 0.5)
                   / 1000000.0 AS abs_dev
        FROM digits
        GROUP BY digit
        ORDER BY digit
    """,
)
def orders_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law screening — the forensic-accounting classic: natural
    multiplicative amounts put ~30.1% of first digits at 1; fabricated
    numbers don't. One map-side-combined 9-group aggregate over the
    orders scan (digit extraction is pure arithmetic in codegen), the
    share window over the 9-row micro relation; observed vs expected
    share and absolute deviation per digit. (This synthetic corpus draws
    totals near-uniformly, so the screen CORRECTLY reports a strong
    Benford violation — the operator's job is the measurement, which the
    oracle reproduces to 1e-6.)"""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    digit = F.floor(
        F.col("o_totalprice") / F.pow(10.0, F.floor(F.log10("o_totalprice")))
    ).cast("long")
    counts = o.groupBy(digit.alias("digit")).agg(F.count(F.lit(1)).alias("n_orders"))
    total = F.sum("n_orders").over(W.rowsBetween(W.unboundedPreceding, W.unboundedFollowing))
    obs = F.col("n_orders").cast("double") / total
    benford = F.log10(1.0 + 1.0 / F.col("digit"))
    r6 = lambda c: F.floor(c * 1000000.0 + F.lit(0.5)) / 1000000.0  # noqa: E731
    return counts.select(
        "digit",
        "n_orders",
        r6(obs).alias("obs_share"),
        r6(benford).alias("benford_share"),
        r6(F.abs(obs - benford)).alias("abs_dev"),
    ).orderBy("digit")


@query(
    "agg_loo_target_encoding",
    category="aggregation",
    description="Leakage-free leave-one-out target encoding per market segment",
    oracle="""
        WITH oc AS (
            SELECT o.o_orderkey, c.c_mktsegment,
                   CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
            FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        ),
        seg AS (
            SELECT c_mktsegment, SUM(cents) AS s, COUNT(*) AS n
            FROM oc GROUP BY c_mktsegment
        )
        SELECT oc.o_orderkey, oc.c_mktsegment,
               FLOOR(((seg.s - oc.cents) / 100.0) / (seg.n - 1) * 10000.0 + 0.5)
                   / 10000.0 AS loo_mean_price
        FROM oc JOIN seg USING (c_mktsegment)
        WHERE seg.n > 1
        ORDER BY oc.o_orderkey
    """,
)
def agg_loo_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding — the feature-engineering staple
    that turns a categorical column into the target mean of its group
    WITHOUT the row's own target leaking into its own feature:
    ``loo = (Σ_group − x) / (n − 1)``.

    The textbook formulation is a window aggregate with an
    EXCLUDE-CURRENT-ROW frame; Spark has no frame exclusion, and it is
    not needed: one hash aggregate to per-group (sum, count) — a
    category-cardinality micro relation — broadcast back onto the fact,
    then pure arithmetic per row. No window, no per-group sort, one
    fact-sized exchange (the customer join). Group sums are EXACT
    integer cents (a float Σ depends on Spark's partial-agg order vs
    DuckDB's scan order; subtracting x from an order-dependent sum
    would put every row's feature at the mercy of the last bit), so
    both engines divide identical integers. Singleton groups have no
    leave-one-out mean (n−1 = 0) and drop in both engines."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    oc = o.join(c, "o_custkey").select("o_orderkey", "c_mktsegment", "cents")
    seg = oc.groupBy("c_mktsegment").agg(
        F.sum("cents").alias("s"), F.count(F.lit(1)).alias("n")
    )
    loo = ((F.col("s") - F.col("cents")) / 100.0) / (F.col("n") - 1)
    return (
        oc.join(F.broadcast(seg), "c_mktsegment")
        .filter(F.col("n") > 1)
        .select(
            "o_orderkey",
            "c_mktsegment",
            (F.floor(loo * 10000.0 + F.lit(0.5)) / 10000.0).alias("loo_mean_price"),
        )
    )


@query(
    "agg_bitmap_distinct",
    category="aggregation",
    description="Exact distinct parts per return flag via bitmap partial aggregation",
    oracle="""
        SELECT l_returnflag,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_distinct_parts
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting without shipping distinct values: Spark 4's
    bitmap aggregate family (`bitmap_bucket_number` / `bitmap_bit_position`
    / `bitmap_construct_agg` / `bitmap_count`) — the engine-native
    dense-ID sibling of the HLL sketch (`agg_approx_distinct`), exact
    where HLL is approximate, applicable whenever the key is integral.

    Why it scales where `COUNT(DISTINCT)` strains: the classic plan
    either Expands (one row copy per aggregate) or shuffles every
    distinct (group, key) pair; here each task ORs its keys into
    fixed-size 32k-bit bucket bitmaps, so the only exchange carries
    ≤ groups × ceil(keyspace/32768) bitmaps of ≤4 KB regardless of row
    count — partial aggregation does the distinct-ing map-side. The
    final count is a sum of per-bucket popcounts. The oracle computes
    the same number the honest way; equality (not tolerance) is the
    audit, because bitmaps are exact."""
    li = load_table(spark, sf_dir, "lineitem").selectExpr(
        "l_returnflag",
        "bitmap_bucket_number(l_partkey) AS bkt",
        "bitmap_bit_position(l_partkey) AS pos",
    )
    per_bucket = li.groupBy("l_returnflag", "bkt").agg(
        F.expr("bitmap_construct_agg(pos)").alias("bm")
    )
    return (
        per_bucket.groupBy("l_returnflag")
        .agg(F.sum(F.expr("bitmap_count(bm)")).cast("long").alias("n_distinct_parts"))
        .orderBy("l_returnflag")
    )


#: rel-error tolerance for the HLL inclusion-exclusion intersection
#: audit. Three sketch estimates compound (est A + est B − est A∪B);
#: measured max rel error across shipped SFs is 0.0151 (sf0.1 A∩N) —
#: 0.08 gives ~5× headroom while still failing a broken union.
HLL_INTERSECT_TOL = 0.08


@query(
    "agg_hll_intersection_audit",
    category="aggregation",
    description="Sketch algebra: HLL set-intersection estimates via inclusion-exclusion, with exact-tolerance audit",
    oracle="""
        SELECT a.l_returnflag AS flag_a, b.l_returnflag AS flag_b,
               CAST(COUNT(*) AS BIGINT) AS exact_common_parts,
               TRUE AS within_tol
        FROM (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem) a
        JOIN (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem) b
          ON a.l_partkey = b.l_partkey AND a.l_returnflag < b.l_returnflag
        GROUP BY a.l_returnflag, b.l_returnflag
        ORDER BY flag_a, flag_b
    """,
)
def agg_hll_intersection_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch ALGEBRA — the payoff of storing sketches instead of
    estimates (see ``agg_hll_sketch_union``): set intersections between
    any two groups are answered from the already-built per-group sketches
    via inclusion–exclusion, ``|A∩B| ≈ est(A) + est(B) − est(A ∪ B)``,
    with the union coming from ``hll_union`` — no rescan, no pairwise
    key join. At 100 TB this is "how many customers did segments X and Y
    share last quarter" from two stored KB-sized sketches, against an
    exact answer that would shuffle both key sets.

    Audit discipline: inclusion–exclusion COMPOUNDS three sketch errors,
    so this is exactly the estimate one should not trust unaudited. The
    query computes the exact intersection (distinct-pair micro self-join,
    dimension-bounded) beside the sketch estimate and emits
    ``|est − exact| / exact <= HLL_INTERSECT_TOL`` (measured max 0.0151
    across shipped SFs); the oracle recomputes the exact side and asserts
    TRUE. Flag pairs are ordered (a < b) so each intersection appears
    once."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.groupBy("l_returnflag", "l_partkey").agg(
        F.count(F.lit(1)).alias("pr")
    )
    sk = pairs.groupBy("l_returnflag").agg(F.hll_sketch_agg("l_partkey").alias("sk"))
    crossed = sk.alias("x").join(
        sk.alias("y"), F.col("x.l_returnflag") < F.col("y.l_returnflag")
    )
    est_i = (
        F.hll_sketch_estimate(F.col("x.sk"))
        + F.hll_sketch_estimate(F.col("y.sk"))
        - F.hll_sketch_estimate(F.hll_union(F.col("x.sk"), F.col("y.sk")))
    )
    ests = crossed.select(
        F.col("x.l_returnflag").alias("flag_a"),
        F.col("y.l_returnflag").alias("flag_b"),
        est_i.alias("est_common"),
    )
    exact = (
        pairs.alias("a")
        .join(
            pairs.alias("b"),
            (F.col("a.l_partkey") == F.col("b.l_partkey"))
            & (F.col("a.l_returnflag") < F.col("b.l_returnflag")),
        )
        .groupBy(
            F.col("a.l_returnflag").alias("flag_a"),
            F.col("b.l_returnflag").alias("flag_b"),
        )
        .agg(F.count(F.lit(1)).alias("exact_common_parts"))
    )
    within = F.when(
        F.col("exact_common_parts") == 0, F.col("est_common") == 0
    ).otherwise(
        F.abs(F.col("est_common") - F.col("exact_common_parts"))
        / F.col("exact_common_parts")
        <= F.lit(HLL_INTERSECT_TOL)
    )
    return (
        exact.join(F.broadcast(ests), ["flag_a", "flag_b"])
        .select(
            "flag_a", "flag_b", "exact_common_parts", within.alias("within_tol")
        )
        .orderBy("flag_a", "flag_b")
    )


#: Table-fingerprint row hash: the first 15 hex chars of the row's md5
#: as an int64 (16^15 = 2^60, sign-safe). Nibble decoding is plain
#: ascii arithmetic so the SAME expression string runs in Spark SQL and
#: DuckDB — the fingerprint is cross-engine by construction, which is
#: the entire point (engine-native hashes like xxhash64/duckdb hash()
#: can never agree).
_FP_HEX_CHARS = 15
#: low-bits modulus for the additive channel: 2^20 keeps SUM exact in
#: int64 up to ~2^43 rows.
_FP_SUM_MOD = 1 << 20


def _fp_rowhash_sql(cols: list[str], hcol: str = "h") -> tuple[str, str]:
    # ``hcol`` names the hash column the polynomial reads — callers that
    # carry TWO hashes in one relation (e.g. the group-kfold oracle's
    # group hash + doc hash) pass distinct aliases instead of rewriting
    # the generated SQL textually.
    canon = ", ".join(cols)
    h = f"md5(concat_ws('|', {canon}))"
    nibble = lambda i: (  # noqa: E731
        f"CAST(ascii(substr({hcol}, {i}, 1)) - "
        f"(CASE WHEN ascii(substr({hcol}, {i}, 1)) >= 97 THEN 87 ELSE 48 END) AS BIGINT)"
    )
    poly = " + ".join(
        f"({nibble(i)} * {16 ** (_FP_HEX_CHARS - i)})" for i in range(1, _FP_HEX_CHARS + 1)
    )
    return h, poly


_FP_COLS = [
    "CAST(c_custkey AS STRING)",
    "c_name",
    "CAST(c_nationkey AS STRING)",
    "c_mktsegment",
]


def _fp_oracle() -> str:
    h, poly = _fp_rowhash_sql([c.replace(" AS STRING", " AS VARCHAR") for c in _FP_COLS])
    return f"""
        WITH hashed AS (SELECT c_mktsegment, {h} AS h FROM customer),
        valued AS (SELECT c_mktsegment, {poly} AS v FROM hashed)
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(BIT_XOR(v) AS BIGINT) AS xor_fp,
               CAST(SUM(v % {_FP_SUM_MOD}) AS BIGINT) AS sum_fp
        FROM valued GROUP BY c_mktsegment ORDER BY c_mktsegment
    """


@query(
    "agg_table_fingerprint",
    category="aggregation",
    description="Order-independent cross-engine table fingerprint (md5 row hash, XOR + modular-sum channels) per segment",
    oracle=_fp_oracle(),
)
def agg_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprinting — the migration/replication
    validator: "does the copy of this 100 TB table over there hold
    exactly these rows?" answered by ONE aggregate per engine, no row
    shipping, no sort. Each row canonicalizes to
    md5(concat_ws('|', key cols)) whose first 15 hex chars decode to an
    int64; the table fingerprint per segment is the XOR of row hashes
    (commutative + associative → partition-order independent, mergeable
    across partials, overflow-free) plus an additive low-bits channel
    (SUM mod 2^20) and the row count — three channels because XOR alone
    is blind to rows duplicated an even number of times. The nibble
    decoding is pure ascii arithmetic, so the identical SQL runs on
    Spark and DuckDB and the fingerprints agree BIT-FOR-BIT cross-engine
    — which is exactly what makes it a migration check rather than an
    engine-local checksum (xxhash64/hash() never agree across engines).

    Plan shape: one scan, per-row codegen'd string work, one partial-
    aggregated exchange carrying |segments| rows of three int64s. At
    100 TB this is the cheapest possible full-table verification: every
    executor folds its partition locally and ships 24 bytes per segment;
    fingerprints are also re-aggregable (XOR of segment XORs = table
    XOR) so per-partition fingerprints compose into table-level ones.
    Columns chosen (custkey/name/nationkey/segment) are the int/string
    subset — float columns would need an explicit decimal canonical form
    before entering a cross-engine digest, the same rule the driver's
    own hash applies.
    """
    h, poly = _fp_rowhash_sql(_FP_COLS)
    cust = load_table(spark, sf_dir, "customer")
    valued = cust.select(
        "c_mktsegment", F.expr(h).alias("h")
    ).select("c_mktsegment", F.expr(poly).alias("v"))
    return (
        valued.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(v)").alias("xor_fp"),
            F.sum(F.col("v") % _FP_SUM_MOD).alias("sum_fp"),
        )
        .orderBy("c_mktsegment")
    )


#: Mann-Kendall significance threshold (two-sided normal 5%).
MK_Z_CRIT = 1.96


@query(
    "orders_trend_mann_kendall",
    category="aggregation",
    description="Mann-Kendall nonparametric trend test on weekly revenue (exact pairwise S, tau, z)",
    oracle=f"""
        WITH w AS (
            SELECT date_trunc('week', o_orderdate) AS wk,
                   CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE)
                       AS rev
            FROM orders GROUP BY 1
        ),
        pairs AS (
            SELECT CAST(SUM(CASE WHEN b.rev > a.rev THEN 1
                                 WHEN b.rev < a.rev THEN -1 ELSE 0 END) AS BIGINT) AS s,
                   COUNT(*) AS np
            FROM w a JOIN w b ON b.wk > a.wk
        ),
        n AS (SELECT COUNT(*) AS n FROM w),
        ties AS (
            SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT) AS tc
            FROM (SELECT COUNT(*) AS t FROM w GROUP BY rev) tg
        )
        SELECT CAST(n.n AS BIGINT) AS n_weeks,
               pairs.s AS s_stat,
               FLOOR((CAST(pairs.s AS DOUBLE) / pairs.np) * 10000.0 + 0.5) / 10000.0
                   AS tau,
               FLOOR(((pairs.s - CASE WHEN pairs.s > 0 THEN 1
                                      WHEN pairs.s < 0 THEN -1 ELSE 0 END)
                      / sqrt((n.n * (n.n - 1) * (2 * n.n + 5) - ties.tc) / 18.0))
                     * 10000.0 + 0.5) / 10000.0 AS z,
               ABS((pairs.s - CASE WHEN pairs.s > 0 THEN 1
                                   WHEN pairs.s < 0 THEN -1 ELSE 0 END)
                   / sqrt((n.n * (n.n - 1) * (2 * n.n + 5) - ties.tc) / 18.0)) > {MK_Z_CRIT}
                   AS trend_significant
        FROM pairs, n, ties
    """,
)
def orders_trend_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Kendall trend test — the NONPARAMETRIC sibling of the OLS
    weekly forecast above: S = sum over i<j of sign(x_j − x_i), counting
    concordant minus discordant week pairs, so the statistic is exact
    integer arithmetic over rank order (immune to outliers and to any
    monotone transform of revenue — the reasons ops dashboards prefer
    it), and the continuity-corrected z uses the closed-form null
    variance with the standard tie correction,
    (n(n−1)(2n+5) − Σ t(t−1)(2t+5))/18 over equal-value groups t. On this corpus |z| < 1.96 at every SF —
    the honest "no trend" answer for deliberately stationary synthetic
    revenue, and both engines agree on the verdict from identical
    integer S and IEEE-identical z.

    Plan shape: the weekly rollup is one partial-aggregated shuffle of
    the fact relation; the pairwise join runs on the WEEK relation
    (~345 rows — bounded by calendar span, not data volume, so the
    quadratic pair space is a micro relation at any corpus scale). At
    100 TB nothing here grows except the first rollup."""
    o = load_table(spark, sf_dir, "orders")
    w = o.groupBy(F.date_trunc("week", F.col("o_orderdate")).alias("wk")).agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("rev")
    )
    a, b = w.alias("a"), w.alias("b")
    pairs = (
        a.join(b, F.col("b.wk") > F.col("a.wk"))
        .agg(
            F.sum(
                F.when(F.col("b.rev") > F.col("a.rev"), 1)
                .when(F.col("b.rev") < F.col("a.rev"), -1)
                .otherwise(0)
            )
            .cast("long")
            .alias("s"),
            F.count(F.lit(1)).alias("np"),
        )
    )
    n = w.agg(F.count(F.lit(1)).alias("n"))
    # tie correction: groups of equal rev contribute no sign information,
    # so the null variance subtracts sum(t(t-1)(2t+5)) over tie groups —
    # without it z is biased toward non-significance whenever values tie
    # (a singleton group has t-1 = 0, so summing over ALL groups is exact)
    ties = (
        w.groupBy("rev")
        .agg(F.count(F.lit(1)).alias("t"))
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)), F.lit(0)
            )
            .cast("long")
            .alias("tc")
        )
    )
    corr = F.when(F.col("s") > 0, 1).when(F.col("s") < 0, -1).otherwise(0)
    z = (F.col("s") - corr) / F.sqrt(
        (F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tc")) / 18.0
    )
    return pairs.crossJoin(F.broadcast(n)).crossJoin(F.broadcast(ties)).select(
        F.col("n").cast("long").alias("n_weeks"),
        F.col("s").alias("s_stat"),
        (F.floor((F.col("s").cast("double") / F.col("np")) * 10000.0 + 0.5) / 10000.0).alias(
            "tau"
        ),
        (F.floor(z * 10000.0 + 0.5) / 10000.0).alias("z"),
        (F.abs(z) > MK_Z_CRIT).alias("trend_significant"),
    )


@query(
    "orders_seasonality_dow_index",
    category="aggregation",
    description="Day-of-week seasonal indices of daily revenue (exact decimal means, ISO day numbering)",
    oracle=f"""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   CAST(EXTRACT(ISODOW FROM o_orderdate) AS BIGINT) AS dow,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS rev
            FROM orders GROUP BY 1, 2
        ),
        overall AS (SELECT AVG(rev) AS g FROM daily)
        SELECT dow,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               {sql_round_dbl('AVG(rev)', 2)} AS dow_avg_rev,
               {sql_round_dbl('AVG(rev) / (SELECT g FROM overall)', 4)}
                   AS seasonal_index
        FROM daily GROUP BY dow ORDER BY dow
    """,
)
def orders_seasonality_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal DECOMPOSITION — the missing member of the time-series
    family (OLS forecast = trend, Mann-Kendall = monotonicity, EWMA =
    smoothing; this is the periodic component): revenue rolls up to
    days, days group by ISO day-of-week, and each weekday's seasonal
    index is its mean daily revenue over the global mean — the
    multiplicative factor a deseasonalized anomaly monitor divides out
    before alerting (Monday's dip is seasonality, not an incident).
    Day numbering is pinned to ISO (Mon=1..Sun=7): Spark's weekday()+1
    equals DuckDB's EXTRACT(ISODOW) — dialects disagree on week start,
    so the convention is explicit, not inherited. Daily sums are exact
    decimal; the index divides IEEE-identical doubles.

    Plan shape: one partial-aggregated rollup to days (calendar-bounded
    relation, ~2400 rows), everything downstream is micro. At 100 TB
    the daily rollup is the only fact pass."""
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.col("o_orderdate").cast("date").alias("d"),
        (F.weekday(F.col("o_orderdate")) + 1).cast("long").alias("dow"),
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double").alias("rev")
    )
    overall = daily.agg(F.avg("rev").alias("g"))
    return (
        daily.groupBy("dow")
        .agg(F.count(F.lit(1)).alias("n_days"), F.avg("rev").alias("dow_avg"))
        .crossJoin(F.broadcast(overall))
        .select(
            "dow",
            "n_days",
            round_dbl(F.col("dow_avg"), 2).alias("dow_avg_rev"),
            round_dbl(F.col("dow_avg") / F.col("g"), 4).alias("seasonal_index"),
        )
        .orderBy("dow")
    )


@query(
    "agg_moments_skew_kurtosis",
    category="aggregation",
    description="Per-group skewness and excess kurtosis from exact integer power sums",
    oracle=f"""
        WITH s AS (
            SELECT l_returnflag,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(q) AS BIGINT) AS s1,
                   CAST(SUM(q*q) AS BIGINT) AS s2,
                   CAST(SUM(q*q*q) AS BIGINT) AS s3,
                   CAST(SUM(q*q*q*q) AS BIGINT) AS s4
            FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS q
                  FROM lineitem)
            GROUP BY l_returnflag
        ),
        m AS (
            SELECT l_returnflag, n,
                   CAST(s1 AS DOUBLE) / n AS mean,
                   CAST(s2 AS DOUBLE) / n AS r2,
                   CAST(s3 AS DOUBLE) / n AS r3,
                   CAST(s4 AS DOUBLE) / n AS r4
            FROM s
        )
        SELECT l_returnflag, n,
               {sql_round_dbl('mean', 6)} AS mean_qty,
               {sql_round_dbl('(r3 - 3 * mean * r2 + 2 * mean * mean * mean)'
                              ' / pow(r2 - mean * mean, 1.5)', 6)} AS skewness,
               {sql_round_dbl('(r4 - 4 * mean * r3 + 6 * mean * mean * r2'
                              ' - 3 * mean * mean * mean * mean)'
                              ' / pow(r2 - mean * mean, 2.0) - 3.0', 6)}
                   AS kurtosis_excess
        FROM m ORDER BY l_returnflag
    """,
)
def agg_moments_skew_kurtosis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-moment profile (skewness g1, excess kurtosis g2) of order
    quantities per return flag — the distribution-shape statistics a
    data-quality monitor tracks beyond mean/stddev. Engine-exactness
    design: l_quantity is integral (1..50 — pinned by the differential
    itself: a fractional quantity would change the BIGINT sums), so the
    four power sums are EXACT int64 arithmetic in both engines (max
    possible sum 50^4·|lineitem| needs only ~3.75e12 at sf0.1, far
    inside int64); the float work is a FIXED algebraic expression over
    those exact sums — identical operator tree in builder and oracle,
    left-associated the same way, so the doubles are IEEE-identical
    before the 1e-6 round, not merely close.

    Plan shape: ONE partial-aggregated pass (all four sums fold
    map-side into 3 groups); the moment algebra runs on a 3-row
    relation. At 100 TB nothing but the scan grows."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    s = li.select("l_returnflag", q.alias("q")).groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
        F.sum(F.col("q") * F.col("q") * F.col("q")).alias("s3"),
        F.sum(F.col("q") * F.col("q") * F.col("q") * F.col("q")).alias("s4"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    r2 = F.col("s2").cast("double") / F.col("n")
    r3 = F.col("s3").cast("double") / F.col("n")
    r4 = F.col("s4").cast("double") / F.col("n")
    m = s.select("l_returnflag", "n", mean.alias("mean"), r2.alias("r2"), r3.alias("r3"), r4.alias("r4"))
    mn, m2 = F.col("mean"), F.col("r2") - F.col("mean") * F.col("mean")
    m3 = F.col("r3") - 3 * mn * F.col("r2") + 2 * mn * mn * mn
    m4 = (
        F.col("r4")
        - 4 * mn * F.col("r3")
        + 6 * mn * mn * F.col("r2")
        - 3 * mn * mn * mn * mn
    )
    return m.select(
        "l_returnflag",
        "n",
        round_dbl(mn, 6).alias("mean_qty"),
        round_dbl(m3 / F.pow(m2, 1.5), 6).alias("skewness"),
        round_dbl(m4 / F.pow(m2, 2.0) - 3.0, 6).alias("kurtosis_excess"),
    ).orderBy("l_returnflag")


@query(
    "dq_functional_dependency_audit",
    category="aggregation",
    description="Candidate functional-dependency audit: violating LHS groups counted per FD",
    oracle="""
        WITH fd1 AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_lhs,
                   CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_violating
            FROM (SELECT p_brand, COUNT(DISTINCT p_type) AS nd
                  FROM part GROUP BY p_brand)
        ),
        fd2 AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_lhs,
                   CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_violating
            FROM (SELECT c_name, COUNT(DISTINCT c_mktsegment) AS nd
                  FROM customer GROUP BY c_name)
        ),
        fd3 AS (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_lhs,
                   CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_violating
            FROM (SELECT o_custkey, COUNT(DISTINCT o_orderpriority) AS nd
                  FROM orders GROUP BY o_custkey)
        )
        SELECT fd, n_lhs, n_violating, n_violating = 0 AS holds FROM (
            SELECT 'part.p_brand->p_type' AS fd, * FROM fd1
            UNION ALL SELECT 'customer.c_name->c_mktsegment', * FROM fd2
            UNION ALL SELECT 'orders.o_custkey->o_orderpriority', * FROM fd3
        ) ORDER BY fd
    """,
)
def dq_functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery primitive — profile whether a
    candidate column determines another (A → B holds iff no A-group
    carries two distinct B values). Three candidates spanning the
    interesting outcomes on this corpus: a dimensional FD that FAILS
    (brands span part types), a key-like FD that HOLDS (customer names
    are unique here, so they trivially determine segment — the audit
    would catch a generator change), and a behavioral FD that FAILS
    (customers order at many priorities). This is the groupBy-countDistinct
    shape FD-mining systems (Tane-style) run per candidate, expressed
    once per FD.

    Plan shape: each FD is one partial-aggregated groupBy on its own
    table followed by a 1-row rollup; the union is 3 rows. No joins.
    At 100 TB each candidate costs one scan of its table (and columnar
    pruning reads only the two columns involved)."""

    def fd(table: str, lhs: str, rhs: str) -> DataFrame:
        t = load_table(spark, sf_dir, table)
        return (
            t.groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("nd"))
            .agg(
                F.count(F.lit(1)).alias("n_lhs"),
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
                .cast("long")
                .alias("n_violating"),
            )
            .select(
                F.lit(f"{table}.{lhs}->{rhs}").alias("fd"),
                "n_lhs",
                "n_violating",
            )
        )

    return (
        fd("part", "p_brand", "p_type")
        .unionAll(fd("customer", "c_name", "c_mktsegment"))
        .unionAll(fd("orders", "o_custkey", "o_orderpriority"))
        .withColumn("holds", F.col("n_violating") == 0)
        .orderBy("fd")
    )


@query(
    "orders_cohort_ltv_triangle",
    category="aggregation",
    description="Cohort LTV triangle: cumulative revenue by first-order month cohort x months-since-acquisition",
    oracle="""
        WITH m AS (
            SELECT o_custkey,
                   CAST(EXTRACT(YEAR FROM o_orderdate) * 12
                        + EXTRACT(MONTH FROM o_orderdate) AS BIGINT) AS midx,
                   CAST(o_totalprice AS DECIMAL(18,2)) AS price
            FROM orders
        ),
        cohort AS (SELECT o_custkey, MIN(midx) AS cmidx FROM m GROUP BY o_custkey),
        cell AS (
            SELECT c.cmidx AS cohort_month, m.midx - c.cmidx AS month_offset,
                   COUNT(*) AS n_orders, SUM(m.price) AS rev
            FROM m JOIN cohort c USING (o_custkey)
            GROUP BY 1, 2
        )
        SELECT cohort_month,
               CAST(month_offset AS BIGINT) AS month_offset,
               CAST(n_orders AS BIGINT) AS n_orders,
               CAST(ROUND(rev, 2) AS DOUBLE) AS revenue,
               CAST(ROUND(SUM(rev) OVER (PARTITION BY cohort_month
                                         ORDER BY month_offset), 2) AS DOUBLE)
                   AS cum_revenue
        FROM cell ORDER BY cohort_month, month_offset
    """,
)
def orders_cohort_ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cohort lifetime-value triangle — the acquisition-economics
    rollup (cumulative revenue per first-order-month cohort at each
    month offset) that the events retention-cohort entry's revenue
    sibling. Month indices are integer arithmetic; revenue stays an
    exact 2dp decimal through BOTH the cell aggregate AND the running
    cumulative (decimal window sums are exact in any fold order, unlike
    doubles), so every output hash-matches without a tolerance.

    Plan shape: the cohort relation is one partial-aggregated
    groupBy(custkey) min; its join back to orders shares the custkey
    hash partitioning; the triangle cells are calendar-bounded (≤ 80 ×
    80 rows at any corpus scale) so the cumulative window runs on a
    micro relation. Two fact-table shuffles total at 100 TB, both on
    the same key."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    m = o.select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
        .cast("long")
        .alias("midx"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("price"),
    )
    cohort = m.groupBy("o_custkey").agg(F.min("midx").alias("cmidx"))
    cell = (
        m.join(cohort, "o_custkey")
        .groupBy(
            F.col("cmidx").alias("cohort_month"),
            (F.col("midx") - F.col("cmidx")).alias("month_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"), F.sum("price").alias("rev"))
    )
    wc = W.partitionBy("cohort_month").orderBy("month_offset")
    return cell.select(
        "cohort_month",
        F.col("month_offset").cast("long").alias("month_offset"),
        F.col("n_orders").cast("long").alias("n_orders"),
        F.round(F.col("rev"), 2).cast("double").alias("revenue"),
        F.round(F.sum("rev").over(wc), 2).cast("double").alias("cum_revenue"),
    ).orderBy("cohort_month", "month_offset")


@query(
    "agg_rollup_grouping_id",
    category="aggregation",
    description="ROLLUP with GROUPING() flags: subtotal rows disambiguated from data NULLs",
    oracle="""
        SELECT COALESCE(o_orderstatus, '<all>') AS status,
               COALESCE(o_orderpriority, '<all>') AS priority,
               CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
               CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
               CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority)
                    AS BIGINT) AS grouping_level,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        ORDER BY grouping_level, status, priority
    """,
)
def agg_rollup_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The disambiguation every ROLLUP consumer eventually needs:
    subtotal rows carry NULL group keys, which is ambiguous the moment
    a grouping column can itself be NULL in the data — ``GROUPING(col)``
    is the standard's answer (1 = this NULL means "all values", 0 = a
    real data value), and the packed grouping level is the bitmask
    downstream BI tools key legends on. Both engines implement the
    standard function, so the flags, the level, and the COALESCE'd
    display keys hash-match exactly.

    Plan shape: a single Expand + partial-aggregated hash aggregate —
    identical physical shape to the plain rollup entry; the flags are
    free metadata from the Expand's grouping-set id."""
    o = load_table(spark, sf_dir, "orders")
    # grouping() is only resolvable INSIDE the rollup's aggregate list
    # (it reads the Expand's grouping-set id), so the flags are computed
    # in agg() and the display projection runs downstream.
    g_s = F.grouping("o_orderstatus").cast("long")
    g_p = F.grouping("o_orderpriority").cast("long")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            g_s.alias("g_status"),
            g_p.alias("g_priority"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("<all>")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("<all>")).alias("priority"),
            "g_status",
            "g_priority",
            (F.col("g_status") * 2 + F.col("g_priority")).alias("grouping_level"),
            "n_orders",
        )
        .orderBy("grouping_level", "status", "priority")
    )
