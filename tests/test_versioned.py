"""Versioned snapshot store: time travel, zero-copy append, commit
atomicity (manifest presence IS visibility), and reference-safe vacuum."""

from __future__ import annotations

import pytest

from spark_jdbc_limit_spark.sinks.transactional import AtomicWriteError
from spark_jdbc_limit_spark.sinks.versioned import (
    list_versions,
    read_snapshot,
    vacuum,
    write_snapshot,
)


def _range(spark, start, n):
    return spark.range(start, start + n).selectExpr("id", "id * 2 AS v")


def test_time_travel_across_overwrite_and_append(spark, tmp_path):
    t = str(tmp_path / "tbl")
    assert write_snapshot(_range(spark, 0, 10), t, "overwrite") == 1
    assert write_snapshot(_range(spark, 100, 5), t, "append") == 2
    assert write_snapshot(_range(spark, 200, 3), t, "overwrite") == 3
    assert list_versions(spark, t) == [1, 2, 3]
    assert read_snapshot(spark, t, 1).count() == 10
    assert read_snapshot(spark, t, 2).count() == 15
    assert read_snapshot(spark, t, 3).count() == 3
    assert read_snapshot(spark, t).count() == 3  # latest
    # v2 really is v1 ∪ delta
    ids = {r.id for r in read_snapshot(spark, t, 2).collect()}
    assert ids == set(range(10)) | set(range(100, 105))


def test_append_is_zero_copy(spark, tmp_path):
    """An append's manifest must REFERENCE the parent's files, not copy
    them: v2 lists v1/ paths verbatim."""
    import json
    import glob
    import os

    t = str(tmp_path / "tbl")
    write_snapshot(_range(spark, 0, 10), t, "overwrite")
    write_snapshot(_range(spark, 100, 5), t, "append")
    with open(os.path.join(t, "v2", "_manifest.json")) as f:
        man = json.load(f)
    v1_refs = [f for f in man["files"] if f.startswith("v1/")]
    v2_own = [f for f in man["files"] if f.startswith("v2/")]
    assert v1_refs and v2_own, man["files"]
    # no data file was duplicated into v2
    v1_names = {os.path.basename(p) for p in glob.glob(os.path.join(t, "v1", "*.parquet"))}
    v2_names = {os.path.basename(p) for p in glob.glob(os.path.join(t, "v2", "*.parquet"))}
    assert v1_names.isdisjoint(v2_names) or not (v1_names & v2_names)


def test_uncommitted_version_dir_is_invisible_and_swept(spark, tmp_path):
    """A crashed writer leaves a manifest-less v-dir: readers must not see
    it, list_versions must skip it, vacuum must reclaim it."""
    t = str(tmp_path / "tbl")
    write_snapshot(_range(spark, 0, 10), t, "overwrite")
    # simulate a writer that died after the data write, before commit
    _range(spark, 900, 4).write.parquet(f"{t}/v7")
    assert list_versions(spark, t) == [1]
    assert read_snapshot(spark, t).count() == 10
    report = vacuum(spark, t, retain_last=2)
    assert report["swept_uncommitted_dirs"] == 1
    import os

    assert not os.path.exists(os.path.join(t, "v7"))
    assert read_snapshot(spark, t).count() == 10


def test_vacuum_keeps_files_referenced_by_retained_appends(spark, tmp_path):
    """Dropping v1 must NOT delete v1's data files while the retained v2
    (an append) still references them — manifests die before data."""
    t = str(tmp_path / "tbl")
    write_snapshot(_range(spark, 0, 10), t, "overwrite")
    write_snapshot(_range(spark, 100, 5), t, "append")
    report = vacuum(spark, t, retain_last=1)
    assert report["dropped_versions"] == [1]
    assert report["dropped_files"] == 0  # every v1 file inherited by v2
    assert list_versions(spark, t) == [2]
    assert read_snapshot(spark, t, 2).count() == 15  # fully readable
    with pytest.raises(AtomicWriteError, match="no committed v1"):
        read_snapshot(spark, t, 1)


def test_vacuum_drops_files_of_dead_overwrites(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_snapshot(_range(spark, 0, 10), t, "overwrite")
    write_snapshot(_range(spark, 200, 3), t, "overwrite")  # v1 unreferenced
    report = vacuum(spark, t, retain_last=1)
    assert report["dropped_versions"] == [1]
    assert report["dropped_files"] > 0
    import os

    assert not os.path.exists(os.path.join(t, "v1"))
    assert read_snapshot(spark, t).count() == 3


def test_read_errors(spark, tmp_path):
    t = str(tmp_path / "empty")
    with pytest.raises(AtomicWriteError, match="no committed snapshots"):
        read_snapshot(spark, t)
    write_snapshot(_range(spark, 0, 2), t, "overwrite")
    with pytest.raises(AtomicWriteError, match="no committed v9"):
        read_snapshot(spark, t, 9)
    with pytest.raises(ValueError):
        write_snapshot(_range(spark, 0, 2), t, "merge")


def test_incremental_read_is_exact_delta(spark, tmp_path):
    from spark_jdbc_limit_spark.sinks.versioned import read_incremental

    t = str(tmp_path / "tbl")
    write_snapshot(_range(spark, 0, 10), t, "overwrite")
    write_snapshot(_range(spark, 100, 5), t, "append")
    write_snapshot(_range(spark, 200, 2), t, "append")
    inc12 = read_incremental(spark, t, 1, 2)
    assert {r.id for r in inc12.collect()} == set(range(100, 105))
    inc13 = read_incremental(spark, t, 1, 3)
    assert {r.id for r in inc13.collect()} == set(range(100, 105)) | {200, 201}
    assert read_incremental(spark, t, 3, 3).count() == 0


def test_incremental_read_refuses_overwrite_boundary(spark, tmp_path):
    from spark_jdbc_limit_spark.sinks.versioned import read_incremental

    t = str(tmp_path / "tbl")
    write_snapshot(_range(spark, 0, 10), t, "overwrite")
    write_snapshot(_range(spark, 200, 3), t, "overwrite")
    with pytest.raises(AtomicWriteError, match="re-baseline"):
        read_incremental(spark, t, 1, 2)


def test_merge_snapshot_upserts_by_key(spark, tmp_path):
    from spark_jdbc_limit_spark.sinks.versioned import merge_snapshot

    t = str(tmp_path / "tbl")
    write_snapshot(_range(spark, 0, 10), t, "overwrite")  # v = id*2
    updates = spark.createDataFrame(
        [(3, 999), (4, 888), (50, 777)], "id long, v long"
    )
    v = merge_snapshot(updates, t, ["id"])
    assert v == 2
    rows = {r.id: r.v for r in read_snapshot(spark, t).collect()}
    assert len(rows) == 11  # 10 originals, one new key
    assert rows[3] == 999 and rows[4] == 888 and rows[50] == 777
    assert rows[5] == 10  # untouched rows survive
    # time travel still sees the pre-merge state
    old = {r.id: r.v for r in read_snapshot(spark, t, 1).collect()}
    assert old[3] == 6 and 50 not in old


def test_merge_snapshot_schema_mismatch_raises(spark, tmp_path):
    from spark_jdbc_limit_spark.sinks.versioned import merge_snapshot

    t = str(tmp_path / "tbl")
    write_snapshot(_range(spark, 0, 5), t, "overwrite")
    bad = spark.createDataFrame([(1, 2, 3)], "id long, v long, extra long")
    with pytest.raises(AtomicWriteError, match="schema mismatch"):
        merge_snapshot(bad, t, ["id"])


def test_stream_appends_snapshots_exactly_once(spark, sf_dir, tmp_path):
    """Streaming into the snapshot store: every micro-batch is one append
    version; the union of versions equals the source; a restart over the
    unchanged source adds nothing; a forced epoch replay is a no-op."""
    from spark_jdbc_limit_spark.sinks.versioned import (
        append_snapshot_epoch,
        run_stream_snapshot_appends,
        snapshot_manifest,
    )
    from spark_jdbc_limit_spark.sources.catalog import load_table
    from spark_jdbc_limit_spark.streaming.stateful import events_file_stream
    from test_stateful_streaming import _split_events

    src = _split_events(spark, sf_dir, tmp_path)
    t, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ckpt")
    stream = events_file_stream(spark, src).select("event_id", "user_id", "value")
    run_stream_snapshot_appends(stream, t, ckpt)
    versions = list_versions(spark, t)
    assert versions, "stream produced no snapshots"
    total = load_table(spark, sf_dir, "events").count()
    assert read_snapshot(spark, t).count() == total
    # restart over the same source: checkpoint offsets → nothing new
    run_stream_snapshot_appends(stream, t, ckpt)
    assert list_versions(spark, t) == versions
    # forced replay of the last epoch: idempotent no-op
    last_epoch = snapshot_manifest(spark, t)["meta"]["epoch"]
    batch = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value").limit(5)
    assert append_snapshot_epoch(batch, t, last_epoch) is None
    assert list_versions(spark, t) == versions
    assert read_snapshot(spark, t).count() == total


def test_snapshot_store_matches_model_over_random_histories(spark, tmp_path):
    """Model-based check: run seeded random op sequences
    (overwrite/append/merge) against the store AND a plain in-memory
    model; every committed version must replay to the model's state at
    that point, and time travel must keep ALL of history readable."""
    import random

    from spark_jdbc_limit_spark.sinks.versioned import merge_snapshot

    rng = random.Random(20260814)
    # 2 seeded histories (was 3; round-12 suite budget) x 4 steps still
    # exercises overwrite/append/merge interleavings and full replay
    for case in range(2):
        t = str(tmp_path / f"tbl{case}")
        model: dict[int, int] = {}
        history: list[dict[int, int]] = []
        next_id = 0
        for step in range(4):
            op = rng.choice(["overwrite", "append", "merge"] if history else ["overwrite"])
            n = rng.randint(1, 6)
            rows = {next_id + i: rng.randint(0, 99) for i in range(n)}
            if op == "merge":  # touch some existing keys too
                for k in rng.sample(sorted(model), min(2, len(model))):
                    rows[k] = rng.randint(100, 199)
            next_id += n
            df = spark.createDataFrame(
                [(k, v) for k, v in rows.items()], "id long, v long"
            )
            if op == "overwrite":
                model = dict(rows)
                write_snapshot(df, t, "overwrite")
            elif op == "append":
                model = {**model, **rows}  # ids are fresh → pure addition
                write_snapshot(df, t, "append")
            else:
                model = {**model, **rows}
                merge_snapshot(df, t, ["id"])
            history.append(dict(model))
        for version, expected in zip(list_versions(spark, t), history):
            got = {r.id: r.v for r in read_snapshot(spark, t, version).collect()}
            assert got == expected, (case, version, op)
