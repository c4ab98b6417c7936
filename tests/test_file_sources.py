"""File-format source round-trips: quarantine semantics and evolution
nulls — the properties the oracle aggregate alone doesn't pin."""

from pyspark.sql import functions as F

from spark_jdbc_limit_spark.operators import get_query


def test_corrupt_csv_quarantines_raw_lines(spark, sf_dir):
    """PERMISSIVE mode keeps every malformed line's raw text — the audit
    trail that DROPMALFORMED destroys."""
    import os

    from spark_jdbc_limit_spark.operators.file_sources import _staging

    rows = get_query("source_csv_corrupt_permissive").builder(spark, sf_dir).collect()
    assert rows[0].n_good == 25 and rows[0].n_corrupt == 3

    path = _staging("source_csv_corrupt_permissive", sf_dir)
    back = (
        spark.read.schema(
            "n_nationkey int, n_name string, n_regionkey int, _corrupt_record string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        .cache()
    )
    bad = {r._corrupt_record for r in back.filter(F.col("_corrupt_record").isNotNull()).collect()}
    back.unpersist()
    assert "xyz" in bad  # raw line preserved verbatim
    assert any(b.startswith("not-a-number") for b in bad)
    assert os.path.isdir(path)


def test_schema_evolution_nulls_only_old_vintage(spark, sf_dir):
    """mergeSchema: the evolved column is null exactly for files written
    before it existed (even o_orderkey → v1 without o_orderpriority)."""
    from spark_jdbc_limit_spark.operators.file_sources import _staging

    get_query("source_parquet_schema_evolution").builder(spark, sf_dir).collect()
    base = _staging("source_parquet_schema_evolution", sf_dir)
    back = spark.read.option("mergeSchema", "true").parquet(f"{base}/v1", f"{base}/v2")
    mismatches = back.filter(
        (F.col("o_orderkey") % 2 == 1) != F.col("o_orderpriority").isNotNull()
    ).count()
    assert mismatches == 0


def test_csv_roundtrip_preserves_doubles_exactly(spark, sf_dir):
    """Spark's CSV writer emits shortest-round-trip double strings; the
    read-back values must be bit-identical, not approximately equal."""
    from spark_jdbc_limit_spark.operators.file_sources import _staging
    from spark_jdbc_limit_spark.sources.catalog import load_table

    get_query("source_csv_roundtrip").builder(spark, sf_dir).collect()
    path = _staging("source_csv_roundtrip", sf_dir)
    back = (
        spark.read.schema("o_orderkey long, o_orderstatus string, o_totalprice double")
        .option("header", "true")
        .csv(path)
    )
    orig = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    diff = (
        back.select("o_orderkey", F.col("o_totalprice").alias("p2"))
        .join(orig, "o_orderkey")
        .filter(F.col("o_totalprice") != F.col("p2"))
        .count()
    )
    assert diff == 0


def test_ignore_corrupt_files_survives_truncated_parquet(spark, tmp_path):
    """A truncated parquet file among healthy ones must not kill the scan
    when ignoreCorruptFiles is on: rows from every healthy file survive,
    the torn file's rows are skipped. (Default posture — FAILFAST — is
    also pinned: the same read without the flag raises.) At 100 TB a torn
    file from a killed writer is a WHEN, not an IF."""
    import glob

    import pytest
    from pyspark.sql import functions as F

    path = str(tmp_path / "torn_table")
    spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("g")
    ).repartition(4).write.mode("overwrite").parquet(path)
    files = sorted(glob.glob(f"{path}/part-*.parquet"))
    assert len(files) == 4
    healthy_rows = 1000
    # count the victim's rows, then tear it mid-file
    victim = files[0]
    victim_rows = spark.read.parquet(victim).count()
    with open(victim, "r+b") as f:
        f.truncate(200)  # strip the footer and most of the data

    # explicit schema on both reads: schema inference itself reads every
    # footer (and would die on the torn one before the scan even plans) —
    # the explicit-schema posture the module header mandates anyway
    strict = spark.read.schema("id long, g long").parquet(path)
    with pytest.raises(Exception):
        strict.count()

    lenient = (
        spark.read.schema("id long, g long")
        .option("ignoreCorruptFiles", "true")
        .parquet(path)
    )
    assert lenient.count() == healthy_rows - victim_rows
    assert lenient.select("g").distinct().count() <= 7
