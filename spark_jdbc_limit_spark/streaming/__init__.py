"""Structured Streaming slice (SURVEY.md §2B "streaming"; build plan M4).

The reference is batch-only JDBC; streams are a north-star extension.
Every streaming query here has a batch twin registered in
:mod:`spark_jdbc_limit_spark.operators.windowed_events` so the DuckDB
oracle can check the window semantics, and tests additionally assert
stream-vs-batch equivalence by running the real stream to completion on
the same files."""

from __future__ import annotations

from spark_jdbc_limit_spark.streaming.ingest import (
    documents_stream,
    materialize_corpus_index,
    stream_decontamination_screen,
    stream_ingest_dedup_gate,
)
from spark_jdbc_limit_spark.streaming.windows import (
    events_stream,
    stream_cms_cells,
    run_stream_to_memory,
    stream_dedup_within_watermark,
    stream_session_windows,
    stream_sliding_counts,
    stream_tumbling_counts,
    stream_user_feature_matrix,
)

__all__ = [
    "documents_stream",
    "events_stream",
    "materialize_corpus_index",
    "stream_decontamination_screen",
    "stream_cms_cells",
    "run_stream_to_memory",
    "stream_dedup_within_watermark",
    "stream_ingest_dedup_gate",
    "stream_session_windows",
    "stream_sliding_counts",
    "stream_tumbling_counts",
    "stream_user_feature_matrix",
]
