"""Shared-text ANSI SQL queries: ONE SQL string is executed verbatim by
BOTH engines — ``spark.sql(SQL)`` on our side, the identical string as
the DuckDB oracle. This is the strongest possible parity statement for
the SQL surface (no dialect translation to hide a semantic gap), and it
exercises Spark 4's ANSI coverage the reference never had: common table
expressions, window functions over SQL text, and WITH RECURSIVE
(SPARK-24497, new in Spark 4.x).

Discipline for engine-identical results with shared text: integer/count
aggregates only (no float accumulation), explicit tie-broken ORDER BY
inside window specs, and EXTRACT instead of dialect date functions.
Physical result types must ALSO agree, not just values — DuckDB widens
SUM(BIGINT) to HUGEINT and pandas has no date dtype, so sums are
CAST(... AS BIGINT) and date outputs go through CAST(... AS STRING)
(round-6 lesson: sql_shared_text_rollup hash-failed on identical values).

Scale notes: these compile to exactly the plans their DataFrame twins
elsewhere in this catalog produce (Catalyst does not care whether a plan
arrived via SQL or DataFrame calls) — pushdown, partial aggregation and
window exchange behavior are identical. The recursive CTE is the one
new physical shape: Spark executes it as an iterative union of step
plans, which is the right tool for BOUNDED recursion (spines, org
charts, shallow BOM walks) — unbounded graph closure at 100 TB still
belongs to the checkpointed-loop pattern in dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from spark_jdbc_limit_spark.operators.registry import query
from spark_jdbc_limit_spark.sources.catalog import load_table

SQL_SEGMENT_ROLLUP = """
    WITH cust_orders AS (
        SELECT o_custkey, COUNT(*) AS n_orders, MAX(o_orderdate) AS last_order
        FROM orders
        GROUP BY o_custkey
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(n_orders) AS BIGINT) AS total_orders,
           CAST(CAST(MIN(last_order) AS DATE) AS STRING) AS earliest_last_order
    FROM customer
    JOIN cust_orders ON c_custkey = o_custkey
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
"""

SQL_RECURSIVE_YEARS = """
    WITH RECURSIVE years(y) AS (
        SELECT 1995
        UNION ALL
        SELECT y + 1 FROM years WHERE y < 2001
    )
    SELECT y, COUNT(o_orderkey) AS n_orders
    FROM years
    LEFT JOIN orders ON EXTRACT(YEAR FROM o_orderdate) = y
    GROUP BY y
    ORDER BY y
"""

SQL_WINDOW_TEXT = """
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey) AS rn
    FROM orders
    WHERE o_totalprice > 400000
"""


def _run_shared(spark: SparkSession, sf_dir: str, sql: str, tables: tuple[str, ...]) -> DataFrame:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(sql)


@query(
    "sql_shared_text_rollup",
    category="sql_text",
    description="Shared-text ANSI SQL: CTE + join + grouped rollup, one string for both engines",
    oracle=SQL_SEGMENT_ROLLUP,
)
def sql_shared_text_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle is not a translation — it IS this SQL string."""
    return _run_shared(spark, sf_dir, SQL_SEGMENT_ROLLUP, ("orders", "customer"))


@query(
    "sql_recursive_year_spine",
    category="sql_text",
    description="Shared-text WITH RECURSIVE year spine LEFT JOINed to orders (Spark 4 recursion)",
    oracle=SQL_RECURSIVE_YEARS,
)
def sql_recursive_year_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded recursion as a spine generator: the recursive CTE emits
    the 1995-2001 year axis (including empty years — LEFT JOIN + COUNT
    keeps the zero rows a plain GROUP BY would drop), shared verbatim
    with DuckDB."""
    return _run_shared(spark, sf_dir, SQL_RECURSIVE_YEARS, ("orders",))


@query(
    "sql_shared_text_window",
    category="sql_text",
    description="Shared-text SQL window: per-customer order sequence numbers",
    oracle=SQL_WINDOW_TEXT,
)
def sql_shared_text_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _run_shared(spark, sf_dir, SQL_WINDOW_TEXT, ("orders",))
