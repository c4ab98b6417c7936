"""Stateful streaming tests: multi-batch state folding must converge to
the batch ground truth; the foreachBatch atomic sink must deliver every
row exactly once across micro-batches."""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import functions as F

from spark_jdbc_limit_spark.sources.catalog import load_table
from spark_jdbc_limit_spark.streaming.stateful import (
    run_stream_foreach_batch_atomic,
    stream_user_running_totals,
    stream_user_running_totals_tws,
)
from spark_jdbc_limit_spark.streaming.windows import run_stream_to_memory


def _split_events(spark, sf_dir, tmp_path, n_files=4) -> str:
    """Copy the events table into n parquet files so maxFilesPerTrigger=1
    yields n micro-batches (state must survive across them)."""
    src = str(tmp_path / "events_src")
    ev = load_table(spark, sf_dir, "events")
    # preserve the raw long-nanos ts shape the stream schema expects
    raw = ev.withColumn("ts", (F.unix_micros("ts") * 1000).cast("long"))
    raw.repartition(n_files).write.mode("overwrite").parquet(src)
    return src


def test_running_totals_converge_to_batch(spark, sf_dir, tmp_path):
    src = _split_events(spark, sf_dir, tmp_path)
    out = run_stream_to_memory(stream_user_running_totals(spark, src), "update").toPandas()
    # update mode emits one row per user per batch that touched it; the
    # LAST emission per user must equal the batch aggregate.
    final = out.groupby("user_id").last()
    truth = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == len(truth)
    for uid, row in truth.iterrows():
        assert final.loc[uid, "n_events_so_far"] == row["n"], uid
        assert final.loc[uid, "total_value_cents"] == row["cents"], uid
    # multiple batches actually happened (state crossed batch boundaries)
    assert len(out) > len(final)


def test_running_totals_processor_folds_state_like_legacy():
    """RunningTotalsProcessor's fold logic, exercised directly against a
    fake ValueState (the TWS protocol layer needs protobuf, but the
    processor's arithmetic must match _fold_user_state regardless):
    accumulation across calls, integer-cents exactness, emitted rows."""
    import pandas as pd

    from spark_jdbc_limit_spark.streaming.stateful import RunningTotalsProcessor

    class FakeState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def getValueState(self, name, schema):
            return FakeState()

    proc = RunningTotalsProcessor()
    proc.init(FakeHandle())
    b1 = pd.DataFrame({"value": [1.10, 2.25]})
    b2 = pd.DataFrame({"value": [0.65]})
    (out1,) = proc.handleInputRows((7,), iter([b1]), None)
    assert out1.iloc[0].to_dict() == {
        "user_id": 7, "n_events_so_far": 2, "total_value_cents": 335,
    }
    (out2,) = proc.handleInputRows((7,), iter([b2]), None)
    assert out2.iloc[0].to_dict() == {
        "user_id": 7, "n_events_so_far": 3, "total_value_cents": 400,
    }


def test_running_totals_transform_with_state_converges_to_batch(spark, sf_dir, tmp_path):
    """The transformWithStateInPandas implementation must fold state across
    micro-batches to the same batch ground truth as the legacy
    applyInPandasWithState path. Skipped where protobuf (required by
    Spark's TWS Python driver worker) is not installed."""
    import pytest

    from spark_jdbc_limit_spark.streaming.stateful import transform_with_state_available

    if not transform_with_state_available():
        pytest.skip("transformWithState needs the protobuf package (not in this container)")
    src = _split_events(spark, sf_dir, tmp_path)
    out = run_stream_to_memory(
        stream_user_running_totals_tws(spark, src), "update"
    ).toPandas()
    final = out.groupby("user_id").last()
    truth = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == len(truth)
    for uid, row in truth.iterrows():
        assert final.loc[uid, "n_events_so_far"] == row["n"], uid
        assert final.loc[uid, "total_value_cents"] == row["cents"], uid
    assert len(out) > len(final), "state did not cross micro-batch boundaries"


def test_foreach_batch_atomic_exactly_once(spark, sf_dir, tmp_path):
    src = _split_events(spark, sf_dir, tmp_path)
    target = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    from spark_jdbc_limit_spark.streaming.stateful import events_file_stream

    run_stream_foreach_batch_atomic(
        events_file_stream(spark, src).select("event_id", "user_id", "value"),
        target,
        ckpt,
    )
    epochs = [d for d in os.listdir(target) if d.startswith("epoch=")]
    assert len(epochs) >= 2, "expected multiple micro-batches"
    got = spark.read.parquet(*[f"{target}/{e}" for e in epochs])
    want = load_table(spark, sf_dir, "events")
    assert got.count() == want.count()
    assert got.select("event_id").distinct().count() == want.count()


def test_latest_state_converges_to_batch_cdc(spark, sf_dir, tmp_path):
    """The streaming CDC keeper's final emission per user must equal the
    batch cdc_upsert_latest result (same version order), across real
    multi-batch boundaries."""
    from spark_jdbc_limit_spark.operators import get_query
    from spark_jdbc_limit_spark.streaming.stateful import stream_user_latest_state

    src = _split_events(spark, sf_dir, tmp_path)
    out = run_stream_to_memory(stream_user_latest_state(spark, src), "update").toPandas()
    final = out.groupby("user_id").last()
    truth = (
        get_query("cdc_upsert_latest")
        .builder(spark, sf_dir)
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == len(truth)
    for uid, row in truth.iterrows():
        assert final.loc[uid, "last_event_id"] == row["last_event_id"], uid
        assert final.loc[uid, "last_type"] == row["last_type"], uid
        assert final.loc[uid, "last_value"] == row["last_value"], uid
        # the ts contract is MICROseconds since epoch (pandas delivers
        # datetime64[ns] inside the state fold — a ns leak is 1000x off)
        expect_us = pd.Timestamp(row["last_ts"]).value // 1000
        assert final.loc[uid, "last_ts_us"] == expect_us, uid
    assert len(out) > len(final), "state must have crossed batch boundaries"


def test_running_totals_on_rocksdb_state_store(spark, sf_dir, tmp_path):
    """Same multi-batch state fold on the RocksDB state-store provider —
    the 100 TB-grade backend (default HDFSBackedStateStore keeps every
    key in executor HEAP; RocksDB spills state to local disk, which is
    what makes billions of streaming keys survivable). The convergence
    contract must be byte-identical to the default provider's."""
    provider_conf = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_conf, None)
    spark.conf.set(
        provider_conf,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        src = _split_events(spark, sf_dir, tmp_path)
        out = run_stream_to_memory(
            stream_user_running_totals(spark, src), "update"
        ).toPandas()
    finally:
        if prev is None:
            spark.conf.unset(provider_conf)
        else:
            spark.conf.set(provider_conf, prev)
    final = out.groupby("user_id").last()
    truth = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == len(truth)
    for uid, row in truth.iterrows():
        assert final.loc[uid, "n_events_so_far"] == row["n"], uid
        assert final.loc[uid, "total_value_cents"] == row["cents"], uid
    assert len(out) > len(final)


def test_state_store_reader_exposes_live_state(spark, tmp_path):
    """The state data source (Spark 4): a checkpoint's operator state is
    QUERYABLE as a DataFrame — the production debugging/ops surface for
    stateful streams (state-size audits, hot-key hunts, migration
    inspection) with no reprocessing. Run a keyed streaming count to a
    checkpoint, then read the state back via format('statestore') and
    assert it equals the aggregate the stream emitted; 'state-metadata'
    names the operator and its store."""
    ckpt = str(tmp_path / "ckpt")
    src = str(tmp_path / "src")
    spark.range(100).select(
        (F.col("id") % 7).alias("k"), F.col("id").alias("v")
    ).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema("k long, v long")
        .parquet(src)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    q = (
        stream.writeStream.outputMode("complete")
        .format("memory")
        .queryName("state_reader_probe")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()

    emitted = {
        r.k: r.n for r in spark.sql("SELECT * FROM state_reader_probe").collect()
    }
    state = spark.read.format("statestore").load(ckpt)
    stored = {r.key.k: r.value["count"] for r in state.collect()}
    assert stored == emitted
    assert set(emitted) == set(range(7))

    md = spark.read.format("state-metadata").load(ckpt).collect()
    assert any("stateStoreAgg" in (r.operatorName or "") or r.operatorId == 0 for r in md)
