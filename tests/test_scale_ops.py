"""Structural correctness properties for the scale-pattern operators
(two-phase row numbering, gap-fill densification, SCD2 intervals) that
the value-hash differential alone wouldn't explain on failure."""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_jdbc_limit_spark.operators import get_query


def test_global_rownum_is_a_permutation_and_monotone(spark, sf_correct):
    out = (
        get_query("global_rownum_two_phase")
        .builder(spark, sf_correct)
        .orderBy("rn")
        .collect()
    )
    n = len(out)
    assert [r.rn for r in out] == list(range(1, n + 1))
    keys = [r.o_orderkey for r in out]
    assert keys == sorted(keys)


def test_gapfill_spine_is_dense_with_real_gaps(spark, sf_correct):
    df = get_query("events_gapfill_locf").builder(spark, sf_correct)
    agg = df.agg(
        F.countDistinct("event_type").alias("n_types"),
        F.countDistinct("bucket").alias("n_buckets"),
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("n_events") == 0, 1).otherwise(0)).alias("n_gap_rows"),
        F.sum(
            F.when(
                (F.col("n_events") == 0) & F.col("value_locf").isNotNull(), 1
            ).otherwise(0)
        ).alias("n_gap_rows_filled"),
    ).first()
    # dense grid: every (type, hour) cell exists exactly once
    assert agg.n_rows == agg.n_types * agg.n_buckets
    # the synthetic corpus leaves real silent hours per type...
    assert agg.n_gap_rows > 0
    # ...and LOCF fills every gap row that has any prior observation
    # (only a leading gap before a type's first hour may stay null)
    assert agg.n_gap_rows_filled >= agg.n_gap_rows - agg.n_types


def test_scd2_intervals_tile_each_user_timeline(spark, sf_correct):
    df = get_query("scd2_user_type_history").builder(spark, sf_correct)
    # exactly one open (current) interval per user
    open_per_user = (
        df.groupBy("user_id")
        .agg(F.sum(F.col("is_current").cast("int")).alias("n_open"))
        .filter(F.col("n_open") != 1)
        .count()
    )
    assert open_per_user == 0
    # closed intervals chain exactly: this row's valid_to equals the next
    # row's valid_from (no gaps, no overlaps) within each user
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("valid_from")
    chained = df.withColumn("next_from", F.lead("valid_from").over(w))
    broken = chained.filter(
        F.col("valid_to").isNotNull() & (F.col("valid_to") != F.col("next_from"))
    ).count()
    assert broken == 0
    # change suppression: consecutive intervals never carry the same type
    same_neighbor = (
        df.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type") == F.col("event_type"))
        .count()
    )
    assert same_neighbor == 0
