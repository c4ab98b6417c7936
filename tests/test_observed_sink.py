"""Observation-API sink telemetry: metrics collected IN the sink job
must equal an explicit aggregate pass, compose with the atomic sink, and
measure post-transformation rows (what landed, not what was scanned)."""

from __future__ import annotations

import pyspark.sql.functions as F

from spark_jdbc_limit_spark.sinks import (
    standard_sink_metrics,
    write_parquet_atomic,
    write_with_observations,
)
from spark_jdbc_limit_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def test_observed_metrics_match_explicit_agg(spark, tmp_path):
    df = load_table(spark, SF, "orders").filter(F.col("o_orderstatus") == "O")
    metrics = {
        "n_rows": F.count(F.lit(1)),
        "sum_price_cents": F.sum(
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
        ),
        "max_date": F.max("o_orderdate"),
    }
    got = write_with_observations(
        df,
        lambda d: d.write.mode("overwrite").parquet(str(tmp_path / "out")),
        metrics,
    )
    expected = df.agg(*[c.alias(n) for n, c in metrics.items()]).first().asDict()
    assert got == expected
    # and the sink really landed the same rows
    assert spark.read.parquet(str(tmp_path / "out")).count() == got["n_rows"]


def test_observed_counts_are_post_transformation(spark, tmp_path):
    """The observe node sits above the caller's filters: the count is
    rows LANDED, not rows scanned."""
    base = load_table(spark, SF, "customer")
    filtered = base.filter(F.col("c_acctbal") > 0)
    got = write_with_observations(
        filtered,
        lambda d: d.write.mode("overwrite").parquet(str(tmp_path / "c")),
        standard_sink_metrics(null_audit_cols=("c_name",)),
    )
    n_all, n_filtered = base.count(), filtered.count()
    assert n_filtered < n_all
    assert got["n_rows"] == n_filtered
    assert got["n_null_c_name"] == 0


def test_observed_composes_with_atomic_sink(spark, tmp_path):
    """The observed frame threads through the staging-then-publish atomic
    sink unchanged — telemetry and all-or-nothing visibility in ONE job."""
    df = load_table(spark, SF, "nation")
    target = str(tmp_path / "atomic")
    got = write_with_observations(
        df,
        lambda d: write_parquet_atomic(d, target, mode="overwrite"),
        standard_sink_metrics(),
    )
    assert got["n_rows"] == 25
    assert spark.read.parquet(target).count() == 25
