"""Streaming tests: each real stream (file source → watermark → windowed
agg → memory sink, run to completion with availableNow) must produce
exactly the rows of its oracle-checked batch twin."""

from __future__ import annotations

import pytest

from spark_jdbc_limit_spark.operators import get_query
from spark_jdbc_limit_spark.streaming import (
    run_stream_to_memory,
    stream_dedup_within_watermark,
    stream_session_windows,
    stream_sliding_counts,
    stream_tumbling_counts,
)

from tests.oracle_utils import compare_frames


def _assert_stream_matches_twin(spark, sf_dir, stream_builder, twin_name, output_mode):
    got = run_stream_to_memory(stream_builder(spark, sf_dir), output_mode).toPandas()
    want = get_query(twin_name).builder(spark, sf_dir).toPandas()
    compare_frames(got, want, f"stream vs {twin_name}")


def test_tumbling_stream_matches_batch(spark, sf_dir):
    _assert_stream_matches_twin(
        spark, sf_dir, stream_tumbling_counts, "events_tumbling_windows", "complete"
    )


def test_sliding_stream_matches_batch(spark, sf_dir):
    _assert_stream_matches_twin(
        spark, sf_dir, stream_sliding_counts, "events_sliding_windows", "complete"
    )


def test_session_stream_matches_batch(spark, sf_dir):
    _assert_stream_matches_twin(
        spark, sf_dir, stream_session_windows, "events_session_windows", "complete"
    )


def test_session_dynamic_gap_stream_matches_batch(spark, sf_dir):
    from spark_jdbc_limit_spark.streaming.windows import stream_session_dynamic_gap

    _assert_stream_matches_twin(
        spark, sf_dir, stream_session_dynamic_gap, "events_session_dynamic_gap",
        "complete",
    )


def test_dedup_stream_matches_batch(spark, sf_dir):
    got = run_stream_to_memory(
        stream_dedup_within_watermark(spark, sf_dir), "append"
    ).toPandas()
    want = get_query("events_dedup_keys").builder(spark, sf_dir).toPandas()
    compare_frames(got, want, "stream dedup vs batch distinct")


def test_ingest_dedup_gate_stream_matches_batch(spark, sf_dir):
    """The streaming ingest dedup gate (stream-static digest + band-bucket
    probes over the documents file stream) must produce exactly the rows
    of its oracle-checked batch twin, dedup_incremental_new_batch — the
    dedup-on-ingest shape a production pipeline deploys. Also asserts
    the gate is non-vacuous: at every shipped SF some incoming doc has a
    near-dup candidate (FIXTURES.md)."""
    from spark_jdbc_limit_spark.streaming import stream_ingest_dedup_gate

    got = run_stream_to_memory(
        stream_ingest_dedup_gate(spark, sf_dir), "complete"
    ).toPandas()
    want = get_query("dedup_incremental_new_batch").builder(spark, sf_dir).toPandas()
    compare_frames(got, want, "stream ingest gate vs batch twin")
    assert got["has_near_dup_candidate"].sum() > 0


def test_stream_decontamination_screen_matches_batch(spark, sf_dir):
    """The ingest-time decontamination screen must emit exactly the rows
    of the oracle-checked batch entry (same anchors, same eval slice,
    same flags) once the finite stream drains — decon-on-arrival is
    semantics-free sugar over the batch screen."""
    from spark_jdbc_limit_spark.streaming import stream_decontamination_screen

    got = run_stream_to_memory(
        stream_decontamination_screen(spark, sf_dir), "complete"
    ).toPandas()
    want = (
        get_query("pipeline_decontaminate_eval_overlap")
        .builder(spark, sf_dir)
        .toPandas()
    )
    compare_frames(got, want, "stream decon screen vs batch entry")


def test_ingest_dedup_gate_materialized_index_matches(spark, sf_dir, tmp_path):
    """The production posture — the gate's static probe sides read from a
    MAINTAINED parquet index instead of being re-derived from the corpus
    per trigger — must emit exactly the derived formulation's (and hence
    the batch twin's) rows."""
    from spark_jdbc_limit_spark.streaming import (
        materialize_corpus_index,
        stream_ingest_dedup_gate,
    )
    from spark_jdbc_limit_spark.streaming.windows import run_stream_to_memory

    idx = str(tmp_path / "ingest_index")
    materialize_corpus_index(spark, sf_dir, idx)
    got = run_stream_to_memory(
        stream_ingest_dedup_gate(spark, sf_dir, index_dir=idx), "complete"
    ).toPandas()
    want = get_query("dedup_incremental_new_batch").builder(spark, sf_dir).toPandas()
    compare_frames(got, want, "ingest gate (materialized index) vs batch twin")


def test_late_data_dropped_beyond_watermark(spark, sf_dir):
    """Append-mode windowed agg only emits windows the watermark has
    closed; with availableNow over a finite source the final watermark
    still trails max(ts), so append output is a strict subset of the
    complete result — the late/open windows are withheld."""
    appended = run_stream_to_memory(
        stream_tumbling_counts(spark, sf_dir), "append"
    ).toPandas()
    complete = get_query("events_tumbling_windows").builder(spark, sf_dir).toPandas()
    assert len(appended) < len(complete)
    merged = appended.merge(
        complete, on=["window_start", "event_type"], suffixes=("_s", "_b")
    )
    assert len(merged) == len(appended)  # every emitted window exists in batch
    assert (merged["n_events_s"] == merged["n_events_b"]).all()


def test_stream_static_join_matches_batch(spark, sf_dir):
    """Stream-static dim enrichment emits exactly the batch join's rows."""
    from spark_jdbc_limit_spark.streaming.windows import stream_enriched_with_dim

    got = run_stream_to_memory(
        stream_enriched_with_dim(spark, sf_dir), "append"
    ).toPandas()
    want = get_query("events_enrich_dim_join").builder(spark, sf_dir).toPandas()
    compare_frames(got, want, "stream-static join vs batch twin")


def test_stream_stream_join_matches_batch(spark, sf_dir):
    """Stream-stream view→click attribution must emit exactly the batch
    twin's row set once the finite source drains (availableNow)."""
    from spark_jdbc_limit_spark.streaming.windows import (
        run_stream_to_memory,
        stream_view_click_join,
    )

    got = {
        (r.view_id, r.click_id, r.user_id, r.lag_us)
        for r in run_stream_to_memory(
            stream_view_click_join(spark, sf_dir), "append"
        ).collect()
    }
    want = {
        (r.view_id, r.click_id, r.user_id, r.lag_us)
        for r in get_query("events_view_click_attribution")
        .builder(spark, sf_dir)
        .collect()
    }
    assert got == want and len(want) > 0


def test_checkpoint_restart_no_reprocessing(spark, sf_dir, tmp_path):
    """Exactly-once across restarts: a checkpointed stream drained with
    availableNow emits nothing on a second start over the same (unchanged)
    source — committed offsets in the checkpoint are honored, so a crashed
    and restarted 100 TB backfill never double-counts a file."""
    import uuid as _uuid

    from spark_jdbc_limit_spark.streaming.windows import events_stream
    from pyspark.sql import functions as F

    ckpt = str(tmp_path / "ckpt")

    def run_once(name):
        counts = (
            events_stream(spark, sf_dir)
            .withWatermark("ts", "10 minutes")
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            counts.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
            n_batches = len(q.recentProgress)
            processed = sum(p["numInputRows"] for p in q.recentProgress)
        finally:
            q.stop()
        return processed

    first = run_once(f"ck_{_uuid.uuid4().hex[:8]}")
    assert first > 0
    second = run_once(f"ck_{_uuid.uuid4().hex[:8]}")
    assert second == 0, f"restart reprocessed {second} rows despite checkpoint"


def test_stream_stream_left_outer_matches_batch(spark, sf_dir, tmp_path):
    """Left-outer stream-stream attribution: matched pairs AND
    watermark-finalized unmatched views must equal the batch left join's
    row set — null click columns included.

    A finite stream's TAIL can never be proven matchless (the watermark
    stops short of the last events), so the source gets two far-future
    SENTINEL punctuation events — one per join side, the streaming
    equivalent of a heartbeat — that push both watermarks past every real
    view's window; sentinel-derived rows are excluded from the compare."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from spark_jdbc_limit_spark.operators.windowed_events import ATTRIBUTION_WINDOW_MIN
    from spark_jdbc_limit_spark.sources.catalog import table_path
    from spark_jdbc_limit_spark.streaming.windows import (
        run_stream_to_memory,
        stream_view_click_left_outer,
    )

    src = pq.read_table(table_path(sf_dir, "events"))
    max_ts = max(src.column("ts").to_pylist())
    far = max_ts + __import__("datetime").timedelta(minutes=3 * ATTRIBUTION_WINDOW_MIN)
    sentinels = pa.table(
        {
            "event_id": [-1, -2],
            "ts": [far, far],
            "user_id": [-999, -998],
            "event_type": ["view", "click"],
            "value": [0.0, 0.0],
            "props": ["", ""],
        },
        schema=src.schema,
    )
    stream_dir = tmp_path / "events_with_sentinels"
    stream_dir.mkdir()
    pq.write_table(pa.concat_tables([src, sentinels]), stream_dir / "events.parquet")

    got = {
        (r.view_id, r.click_id, r.user_id, r.lag_us)
        for r in run_stream_to_memory(
            stream_view_click_left_outer(spark, str(stream_dir)), "append"
        ).collect()
        if r.view_id >= 0
    }
    want = {
        (r.view_id, r.click_id, r.user_id, r.lag_us)
        for r in get_query("events_view_click_unattributed")
        .builder(spark, sf_dir)
        .collect()
    }
    assert got == want
    unmatched = {t for t in want if t[1] is None}
    assert unmatched, "fixture must contain views with no click in window"
    assert len(want) > len(unmatched), "and some attributed views"


def test_cms_stream_matches_batch_cells(spark, sf_dir):
    """Streaming CMS (complete-mode cell aggregate) equals the cell
    relation computed over the events at rest with the same shared hash
    arithmetic — the mergeability claim of the sketch family, pinned on
    a real incremental execution."""
    from pyspark.sql import functions as F

    from spark_jdbc_limit_spark.operators.sketches import cms_cell_structs
    from spark_jdbc_limit_spark.sources.catalog import load_table
    from spark_jdbc_limit_spark.streaming.windows import stream_cms_cells

    got = run_stream_to_memory(stream_cms_cells(spark, sf_dir), "complete").toPandas()

    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    hb = cms_cell_structs("user_id").alias("hb")
    want = (
        ev.select(hb)
        .select("hb.i", "hb.bucket")
        .groupBy("i", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .toPandas()
    )
    compare_frames(got, want, "stream CMS cells vs batch")


def test_fingerprint_stream_matches_batch_channels(spark, sf_dir):
    """Streaming fingerprint (complete-mode XOR/sum/count channels per
    event_type) equals the same fold over the events at rest — the
    mergeability that makes continuous replication verification a
    constant-memory streaming job."""
    from pyspark.sql import functions as F

    from spark_jdbc_limit_spark.operators.aggregates import _FP_SUM_MOD, _fp_rowhash_sql
    from spark_jdbc_limit_spark.sources.catalog import load_table
    from spark_jdbc_limit_spark.streaming.windows import (
        FP_EVENT_COLS,
        stream_table_fingerprint,
    )

    got = run_stream_to_memory(stream_table_fingerprint(spark, sf_dir), "complete").toPandas()

    h, poly = _fp_rowhash_sql(FP_EVENT_COLS)
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id").isNotNull())
    want = (
        ev.select("event_type", F.expr(h).alias("h"))
        .select("event_type", F.expr(poly).alias("v"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.expr("bit_xor(v)").alias("xor_fp"),
            F.sum(F.col("v") % _FP_SUM_MOD).alias("sum_fp"),
        )
        .toPandas()
    )
    compare_frames(got, want, "stream fingerprint vs batch")


def test_feature_matrix_stream_matches_batch(spark, sf_dir):
    """Online/offline feature-store consistency: the complete-mode
    streaming feature matrix equals the batch reshape entry row-for-row
    (same aggregation body, imported not copied)."""
    from spark_jdbc_limit_spark.streaming.windows import stream_user_feature_matrix

    got = run_stream_to_memory(
        stream_user_feature_matrix(spark, sf_dir), "complete"
    ).toPandas()
    want = get_query("reshape_user_feature_matrix").builder(spark, sf_dir).toPandas()
    compare_frames(got, want, "stream feature matrix vs batch twin")
