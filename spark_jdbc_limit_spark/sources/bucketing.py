"""Bucketed-table layout: pre-shuffle data ONCE at write time so repeated
joins and aggregations on the bucket key run with ZERO exchanges.

The reference's only layout tool is predicate-range partitioning of a JDBC
scan (reference: src/main/scala/org/apache/spark/sql/JDBCRDDWithLimit.scala:53-63
— static WHERE-clause splits). Bucketing is the file-native upgrade: rows
are hash-distributed into a fixed number of buckets per key at write time,
and Catalyst proves at plan time that two tables bucketed the same way are
co-partitioned — the sort-merge join then needs no Exchange on either side.

At 100 TB this is the difference between shuffling the fact table on every
join (network-bound, re-paid per query) and paying one layout shuffle at
ingest that every downstream join reuses. The same layout accelerates
groupBy on the bucket key (no partial/final exchange) and, with
``sortBy``, gives merge-ready runs inside each bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 16,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally per-bucket sorted)
    catalog table. ``num_buckets`` should divide evenly into the cluster's
    parallelism and keep each bucket under a few hundred MB at target
    scale — at 100 TB that means thousands of buckets, set at ingest."""
    writer = df.write.mode(mode).bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
