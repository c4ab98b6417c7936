"""Bucketed co-located join: the layout shuffle is paid once at write;
the join itself must plan with ZERO exchanges (both sides bucketed the
same way) — the plan shape that makes repeated fact-to-fact joins viable
at 100 TB."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from spark_jdbc_limit_spark.plans import count_exchanges, plan_text
from spark_jdbc_limit_spark.sources.bucketing import read_table, write_bucketed
from spark_jdbc_limit_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    """Create orders_b / lineitem_b once for every test in this module, so
    each test passes in isolation (pytest -k, shuffled order)."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "orders_b", "o_orderkey", num_buckets=8)
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "lineitem_b",
        "o_orderkey",
        num_buckets=8,
    )
    return orders, lineitem


def test_bucketed_join_no_exchange(spark, sf_dir, bucketed_tables):
    orders, lineitem = bucketed_tables
    joined = read_table(spark, "orders_b").join(
        read_table(spark, "lineitem_b"), "o_orderkey"
    )
    n_ex = count_exchanges(joined)
    assert n_ex == 0, f"bucketed join should not shuffle, found {n_ex} exchanges:\n{plan_text(joined)}"

    # correctness: same row count as the plain (shuffling) join
    plain = orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    )
    assert joined.count() == plain.count()


def test_bucketed_groupby_no_exchange(spark, sf_dir, bucketed_tables):
    agg = (
        read_table(spark, "lineitem_b")
        .groupBy("o_orderkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    n_ex = count_exchanges(agg)
    assert n_ex == 0, f"bucketed groupBy should not shuffle:\n{plan_text(agg)}"
