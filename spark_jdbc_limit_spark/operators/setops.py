"""Set-operation queries (SURVEY.md §2B "set ops"): union / union-all,
intersect / intersect-all, except-all, distinct / dropDuplicates.

Physicals to know at 100 TB: UNION ALL is a free concatenation (no
shuffle); DISTINCT / INTERSECT / EXCEPT each hash-shuffle on the full row —
so we project to the minimal column set FIRST, shrinking shuffle width.

No builder here ends in a global sort: set-op output is a bag compared
order-insensitively (the oracle SQL keeps ORDER BY only for human
readability — DuckDB pays nothing for it at this scale), and a trailing
``orderBy`` would add a range-partition exchange that at 100 TB is pure
waste. Same reasoning as the asof join (joins.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_jdbc_limit_spark.operators.registry import query
from spark_jdbc_limit_spark.sources.catalog import load_table


@query(
    "set_union_distinct",
    category="setop",
    description="Nations that have customers or suppliers (UNION distinct)",
    oracle="""
        SELECT nk FROM (
            SELECT c_nationkey AS nk FROM customer
            UNION
            SELECT s_nationkey AS nk FROM supplier
        ) t
        ORDER BY nk
    """,
)
def set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).distinct()


@query(
    "set_union_all_counts",
    category="setop",
    description="UNION ALL keeps duplicates — verified via per-key counts",
    oracle="""
        SELECT nk, COUNT(*) AS n
        FROM (
            SELECT c_nationkey AS nk FROM customer
            UNION ALL
            SELECT s_nationkey AS nk FROM supplier
        ) t
        GROUP BY nk
        ORDER BY nk
    """,
)
def set_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.union(s).groupBy("nk").agg(F.count(F.lit(1)).alias("n"))


@query(
    "set_intersect",
    category="setop",
    description="Nations with BOTH customers and suppliers (INTERSECT)",
    oracle="""
        SELECT c_nationkey AS nk FROM customer
        INTERSECT
        SELECT s_nationkey AS nk FROM supplier
        ORDER BY nk
    """,
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nk"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nk"))
    return c.intersect(s)


@query(
    "set_except_all",
    category="setop",
    description="Multiset difference (EXCEPT ALL) of order-status key streams",
    oracle="""
        SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'O'
        EXCEPT ALL
        SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'F'
        ORDER BY ck
    """,
)
def set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """exceptAll keeps multiplicity (bag semantics): a key appearing 5× in
    the left and 2× in the right survives 3× — unlike EXCEPT's set
    semantics. Planned as a hash anti-count, one shuffle."""
    o = load_table(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("ck"))
    right = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("ck"))
    return left.exceptAll(right)


@query(
    "set_intersect_all",
    category="setop",
    description="Multiset intersection (INTERSECT ALL) of status key streams",
    oracle="""
        SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'O'
        INTERSECT ALL
        SELECT o_custkey AS ck FROM orders WHERE o_orderstatus = 'F'
        ORDER BY ck
    """,
)
def set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    left = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("ck"))
    right = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("ck"))
    return left.intersectAll(right)


@query(
    "set_dropduplicates_subset",
    category="setop",
    description="dropDuplicates on a column subset with deterministic survivor",
    oracle="""
        SELECT o_custkey, o_orderstatus, o_orderkey AS min_orderkey
        FROM (
            SELECT o_custkey, o_orderstatus, o_orderkey,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderstatus
                                      ORDER BY o_orderkey) AS rn
            FROM orders
        ) t
        WHERE rn = 1
        ORDER BY o_custkey, o_orderstatus
    """,
)
def set_dropduplicates_subset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates(subset) keeps an ARBITRARY row per key — useless for
    differential testing and dangerous at scale (nondeterministic reruns).
    The engine's canonical form is min-by-key via window, pinned here."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey", "o_orderstatus").orderBy("o_orderkey")
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderstatus", F.col("o_orderkey").alias("min_orderkey"))
    )


@query(
    "set_union_by_name_missing",
    category="setop",
    description="Schema-aligned union by NAME with missing columns null-padded (unionByName / UNION ALL BY NAME)",
    oracle="""
        SELECT arm,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(CASE WHEN line IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_line_null,
               CAST(ROUND(SUM(CAST(amount AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS total_amount
        FROM (
            SELECT 'orders' AS arm, o_orderkey AS key, o_totalprice AS amount
            FROM orders
            UNION ALL BY NAME
            SELECT 'lineitem' AS arm, l_orderkey AS key,
                   l_extendedprice AS amount, l_linenumber AS line
            FROM lineitem
        )
        GROUP BY arm ORDER BY arm
    """,
)
def set_union_by_name_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union by COLUMN NAME with unequal schemas — the ingestion-time
    union (vintages of a feed rarely share column order or even column
    sets): Spark's ``unionByName(allowMissingColumns=True)`` and
    DuckDB's ``UNION ALL BY NAME`` both align on names and null-pad the
    columns an arm lacks, where positional UNION would silently pair
    o_totalprice with l_orderkey or refuse outright. The rollup counts
    the null-padded cells per arm, so the padding semantics themselves
    are what the driver hash-verifies. Zero-shuffle union; the rollup is
    one partial-aggregated exchange."""
    o = load_table(spark, sf_dir, "orders").select(
        F.lit("orders").alias("arm"),
        F.col("o_orderkey").alias("key"),
        F.col("o_totalprice").alias("amount"),
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.lit("lineitem").alias("arm"),
        F.col("l_orderkey").alias("key"),
        F.col("l_extendedprice").alias("amount"),
        F.col("l_linenumber").alias("line"),
    )
    u = o.unionByName(li, allowMissingColumns=True)
    return (
        u.groupBy("arm")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(F.col("line").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_line_null"),
            F.round(F.sum(F.col("amount").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_amount"),
        )
        .orderBy("arm")
    )
