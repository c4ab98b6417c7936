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


SQL_RECURSIVE_HIERARCHY = """
    WITH RECURSIVE walk(start, cur, depth) AS (
        SELECT p_partkey, p_partkey, 0 FROM part
        UNION ALL
        SELECT start, CAST(FLOOR(cur / 10.0) AS BIGINT), depth + 1
        FROM walk WHERE cur > 0
    )
    SELECT CAST(COALESCE(root, 0) AS BIGINT) AS root,
           CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(MAX(max_depth) AS BIGINT) AS deepest,
           CAST(SUM(max_depth) AS BIGINT) AS total_depth
    FROM (
        SELECT start,
               MAX(depth) AS max_depth,
               MAX(CASE WHEN cur BETWEEN 1 AND 9 THEN cur END) AS root
        FROM walk
        GROUP BY start
    ) chains
    GROUP BY COALESCE(root, 0)
    ORDER BY root
"""


@query(
    "sql_recursive_hierarchy_walk",
    category="sql_text",
    description="DATA-DEPENDENT WITH RECURSIVE: BOM-style ancestor walk with per-root rollup",
    oracle=SQL_RECURSIVE_HIERARCHY,
)
def sql_recursive_hierarchy_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True data-dependent recursion — the BOM/org-chart shape
    ``sql_recursive_year_spine`` (a fixed 7-step spine) does not
    exercise: every part walks its ancestor chain ``k → floor(k/10)``
    until the root, so the recursion DEPTH VARIES PER ROW with the key
    value and the iteration count follows the data (≈ log10 of the key
    space: one extra round per corpus decade). The rollup reports, per
    single-digit root, how many parts descend from it and how deep the
    chains run — the "flatten the hierarchy" query every recursive-CTE
    engine demo ships, here differentially pinned against DuckDB on the
    SAME SQL text.

    Execution shape: Spark runs the CTE as an iterative union-of-steps
    loop; each step is one codegen projection + filter over the
    previous frontier (part-cardinality rows, shrinking as chains
    terminate), so the work is bounded by Σ frontier sizes ≈ n·log(n)
    rows — no joins inside the loop, nothing quadratic. The synthetic
    parent function keeps the walk self-contained on the shipped
    corpus (parts carry no parent column); swapping in a real parent
    edge column changes one line of the recursive step."""
    return _run_shared(spark, sf_dir, SQL_RECURSIVE_HIERARCHY, ("part",))


SQL_GROUP_ORDER_ALL = """
    SELECT o_orderstatus, o_orderpriority,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS order_year,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY ALL
    ORDER BY ALL
"""


@query(
    "sql_shared_group_order_all",
    category="sql_text",
    description="Shared-text modern SQL: GROUP BY ALL + ORDER BY ALL, one string both engines",
    oracle=SQL_GROUP_ORDER_ALL,
)
def sql_shared_group_order_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` / ``ORDER BY ALL`` — the modern-SQL ergonomics
    both engines converged on (Spark 3.4+/DuckDB): every non-aggregate
    select-list expression becomes a grouping key, and the result orders
    by the full select list. Shared-text discipline makes the parity
    claim exact: the SAME string must not only parse in both engines but
    resolve the SAME implicit grouping set — a dialect divergence in
    which expressions count as "non-aggregate" would hash-fail here.
    Count-only aggregates per the module's no-float rule; EXTRACT for
    the date key. Plan-wise this is an ordinary partial-aggregated
    grouped count; ALL is pure resolution sugar."""
    return _run_shared(spark, sf_dir, SQL_GROUP_ORDER_ALL, ("orders",))
