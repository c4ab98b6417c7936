"""Python DataSource (Spark 4 V2 API) — the reference relation provider's
contract rebuilt natively: partitioned scan, real filter pushdown with a
handled/unhandled split, and a two-phase-commit writer."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from spark_jdbc_limit_spark.sources.pydatasource import (
    FLAGS,
    LedgerReader,
    register,
)


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    register(spark)
    prev = spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    yield
    spark.conf.set("spark.sql.python.filterPushdown.enabled", prev)


def _ledger(spark, **opts):
    r = spark.read.format("ledger")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_full_scan_row_count_and_partitioning(spark):
    df = _ledger(spark, numRows=1000, numPartitions=5)
    assert df.count() == 1000
    assert df.rdd.getNumPartitions() == 5
    row = df.filter(F.col("id") == 7).first()
    assert (row.bucket, row.flag) == (7, FLAGS[7 % 3])
    assert row.amount == ((7 * 7919) % 10000) / 100.0


def test_key_range_pushdown_prunes_generation(spark):
    """Pushed id bounds must reach partition planning: with bounds
    [900, 950) and 4 partitions, the slices cover exactly 50 ids."""
    df = _ledger(spark, numRows=100000, numPartitions=4).filter(
        (F.col("id") >= 900) & (F.col("id") < 950)
    )
    assert df.count() == 50
    assert {r.id for r in df.collect()} == set(range(900, 950))
    # unit-level: the reader narrows bounds and accepts the filters
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThan

    rd = LedgerReader({"numRows": "100000", "numPartitions": "4"})
    residual = list(
        rd.pushFilters([GreaterThanOrEqual(("id",), 900), LessThan(("id",), 950)])
    )
    assert residual == []
    assert (rd.lo, rd.hi) == (900, 950)
    parts = rd.partitions()
    assert sum(p.end - p.start for p in parts) == 50


def test_flag_equality_pushdown_and_residual_split(spark):
    """flag = 'A' is handled in generation; a StringContains-style
    predicate is NOT handled and must be returned for Spark to apply —
    results stay correct either way."""
    df = _ledger(spark, numRows=3000, numPartitions=3).filter(F.col("flag") == "A")
    assert df.count() == 1000
    assert {r.flag for r in df.collect()} == {"A"}

    from pyspark.sql.datasource import EqualTo, StringContains

    rd = LedgerReader({"numRows": "3000", "numPartitions": "3"})
    residual = list(
        rd.pushFilters([EqualTo(("flag",), "A"), StringContains(("flag",), "A")])
    )
    assert len(residual) == 1 and isinstance(residual[0], StringContains)
    assert rd.flag == "A"

    # end-to-end with an unhandled predicate on top
    df2 = _ledger(spark, numRows=3000, numPartitions=3).filter(
        (F.col("flag") == "A") & F.col("amount").between(10, 20)
    )
    got = {r.id for r in df2.collect()}
    want = {
        i
        for i in range(3000)
        if FLAGS[i % 3] == "A" and 10 <= ((i * 7919) % 10000) / 100.0 <= 20
    }
    assert got == want


def test_ledger_writer_two_phase_commit(spark, tmp_path):
    target = str(tmp_path / "out")
    df = _ledger(spark, numRows=200, numPartitions=4)
    df.write.format("ledger").option("path", target).mode("append").save()
    manifest = json.load(open(os.path.join(target, "_LEDGER_MANIFEST.json")))
    assert sum(f["rows"] for f in manifest["files"]) == 200
    # staged nothing left behind; every published file named in manifest
    assert not os.path.isdir(os.path.join(target, "_staging"))
    data_files = [n for n in os.listdir(target) if n.endswith(".jsonl")]
    assert sorted(data_files) == sorted(f["file"] for f in manifest["files"])
    rows = []
    for n in data_files:
        with open(os.path.join(target, n)) as f:
            rows += [json.loads(line) for line in f]
    assert len(rows) == 200
    assert sorted(r[0] for r in rows) == list(range(200))


def test_ledger_writer_abort_leaves_no_partial_output(spark, tmp_path):
    """A failing task must abort the write with no published files and
    no manifest — all-or-nothing, like the reference's global rollback."""
    target = str(tmp_path / "out")

    @F.udf("long")
    def boom(i):
        if i == 150:
            raise RuntimeError("injected task failure")
        return i

    df = _ledger(spark, numRows=200, numPartitions=4).withColumn("id", boom("id"))
    with pytest.raises(Exception, match="injected task failure"):
        df.write.format("ledger").option("path", target).mode("append").save()
    assert not os.path.exists(os.path.join(target, "_LEDGER_MANIFEST.json"))
    published = (
        [n for n in os.listdir(target) if n.endswith(".jsonl")]
        if os.path.isdir(target)
        else []
    )
    assert published == [], f"partial output leaked: {published}"


def test_ledger_stream_reads_each_row_exactly_once(spark, tmp_path):
    """The streaming leg: offset-watermarked micro-batches drain the
    ledger exactly once; a restart over the same checkpoint emits
    nothing new (offsets honored, replay via readBetweenOffsets)."""
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "sink")

    def run():
        q = (
            spark.readStream.format("ledger")
            .option("numRows", 350)
            .option("rowsPerBatch", 100)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
        return spark.read.parquet(out).collect()

    # drain: each availableNow run commits the prefetched batch(es) and
    # advances the checkpointed offset; repeated RESTARTS over the same
    # checkpoint walk the whole ledger with no duplicates and no gaps —
    # exactly-once across restarts by construction (file-sink log +
    # source offsets both live in the checkpoint).
    rows: list = []
    for _ in range(10):
        rows = run()
        if len(rows) == 350:
            break
    ids = sorted(r.id for r in rows)
    assert ids == list(range(350)), f"got {len(ids)} ids, dupes/gaps present"
    assert all(r.flag == FLAGS[r.id % 3] for r in rows)
    # fully drained: one more restart adds nothing
    assert len(run()) == 350
