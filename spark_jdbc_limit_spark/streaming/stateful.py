"""Custom stateful streaming operators (SURVEY.md §2B "stateful ops") and
the exactly-once foreachBatch sink.

``applyInPandasWithState`` is the engine's arbitrary-state primitive: per
key, an Arrow-batched pandas function folds new rows into a typed state
tuple. State lives in the state store (RocksDB/HDFS-backed on a cluster),
partitioned by key — the same scale shape as every keyed aggregation.

The foreachBatch sink routes each micro-batch through
:func:`spark_jdbc_limit_spark.sinks.write_parquet_atomic` into an
epoch-keyed directory: replays of a failed epoch overwrite the same
directory (idempotent), which upgrades at-least-once delivery to
effectively-once output — the streaming analogue of the reference's
all-or-nothing write goal (reference: ExtJdbcUtils.scala:70-109).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from spark_jdbc_limit_spark.streaming.windows import _events_raw_schema

#: The stateful-stream fixtures feed a LONG-nanos ``ts`` directory (the
#: fixture normalizes whatever the catalog's events generation is back to
#: raw nanos), so this source keeps the long schema unconditionally.
EVENTS_RAW_SCHEMA = _events_raw_schema(T.LongType())

RUNNING_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events_so_far", T.LongType()),
        T.StructField("total_value_cents", T.LongType()),
    ]
)
RUNNING_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total_cents", T.LongType()),
    ]
)


def _fold_user_state(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Fold new events into (count, total): value is accumulated in integer
    CENTS so state totals are exact across any batch arrival order."""
    n, total = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events_so_far": [n], "total_value_cents": [total]}
    )


def events_file_stream(spark: SparkSession, src_dir: str, files_per_trigger: int = 1) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", files_per_trigger)
        .parquet(src_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def stream_user_running_totals(spark: SparkSession, src_dir: str) -> DataFrame:
    """Per-user running (count, total) via applyInPandasWithState — emits
    one updated row per user per micro-batch."""
    ev = events_file_stream(spark, src_dir)
    return (
        ev.groupBy("user_id")
        .applyInPandasWithState(
            _fold_user_state,
            RUNNING_OUTPUT_SCHEMA,
            RUNNING_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def run_stream_foreach_batch_atomic(
    stream_df: DataFrame, target: str, checkpoint: str
) -> None:
    """Drive a (finite) stream into epoch-keyed atomic parquet publishes."""
    from spark_jdbc_limit_spark.sinks import write_parquet_atomic

    def publish(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # overwrite per epoch → a retried epoch replaces, never duplicates
        write_parquet_atomic(batch_df, f"{target}/epoch={epoch_id}", mode="overwrite")

    q = (
        stream_df.writeStream.foreachBatch(publish)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
