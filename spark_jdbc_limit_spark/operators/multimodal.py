"""Multimodal column plumbing (north-star LLM pipeline, SURVEY.md §2B;
build plan M5): opaque binary payloads with typed metadata, processed by
Arrow-batched ``mapInPandas`` operators.

The container ships no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features / NotImplementedError for real codecs) while
everything Spark-side is real and tested: binary column construction,
schema, partitioning, the mapInPandas batch shape, and feature-extraction
output.

Scale design: binary payloads ride through relational ops untouched
(Tungsten treats them as byte arrays); decode/feature-extract runs once
per Arrow batch (10k rows default), not per row; output is a narrow typed
frame so downstream aggs never carry the blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_jdbc_limit_spark.operators.registry import query
from spark_jdbc_limit_spark.sources.catalog import load_table

FEATURE_SCHEMA = "doc_id long, n_bytes long, codepoint_sum long, head_hex string"


def decode_image(payload: bytes) -> dict:
    """Real codec hook — intentionally unavailable in this container.

    In production this imports PIL/torchvision inside the executor and
    returns decoded dimensions/tensors. Gated so the Spark plumbing stays
    testable without the codec.
    """
    raise NotImplementedError("image codecs are not installed in this environment")


def extract_binary_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas operator: per Arrow batch, compute deterministic
    features of each binary payload (stand-in for decode+featurize)."""
    for pdf in batches:
        payloads = pdf["payload"]
        texts = pdf["text"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": payloads.map(len).astype("int64"),
                # codepoint sum of the ORIGINAL text — cheap deterministic
                # "feature" the oracle can recompute; a real pipeline would
                # decode `payload` here instead.
                # utf-32-le bytes ARE the codepoints — one numpy sum per
                # doc instead of a per-char Python loop
                "codepoint_sum": texts.map(
                    lambda t: int(
                        np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).sum(
                            dtype=np.int64
                        )
                    )
                    % 997
                ).astype("int64"),
                "head_hex": payloads.map(lambda b: b[:4].hex()),
            }
        )


@query(
    "multimodal_binary_features",
    category="llm_multimodal",
    description="Binary payload column → mapInPandas feature extraction",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(list_sum(list_transform(regexp_extract_all(text, '.'),
                                            c -> unicode(c)::BIGINT)) % 997 AS BIGINT)
                   AS codepoint_sum,
               lower(hex(encode(SUBSTRING(text, 1, 4)))) AS head_hex
        FROM documents
        WHERE n_chars >= 4
        ORDER BY doc_id
    """,
)
def multimodal_binary_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end multimodal shape: text → binary payload column (stands in
    for image/audio bytes) → Arrow-batched mapInPandas feature extraction.
    The oracle recomputes every feature from the source text, proving the
    binary roundtrip and the batch operator are lossless."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") >= 4)
    with_payload = d.select("doc_id", "text", F.encode("text", "utf-8").alias("payload"))
    return with_payload.mapInPandas(extract_binary_features, FEATURE_SCHEMA)


@query(
    "multimodal_payload_through_relational",
    category="llm_multimodal",
    description="Binary payloads survive join/filter/agg untouched",
    oracle="""
        SELECT lang,
               COUNT(*) AS n_docs,
               CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               CAST(MAX(octet_length(encode(text))) AS BIGINT) AS max_bytes
        FROM documents
        GROUP BY lang
        ORDER BY lang
    """,
)
def multimodal_payload_through_relational(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob columns flowing through relational ops: construct payloads,
    filter/aggregate by metadata, measure payload sizes with built-ins
    (octet-level ops never leave the JVM)."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("lang", F.encode("text", "utf-8").alias("payload"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.max(F.length("payload")).alias("max_bytes"),
        )
        .orderBy("lang")
    )


FRAME_SIZE = 32     # bytes per "frame" of the opaque payload
FRAME_STRIDE = 4    # keep every 4th frame


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas operator: 1 payload row in → one row per SAMPLED frame
    out (the row-explosion shape video pipelines use: decode is per-frame,
    so sampling BEFORE decode is what makes 100 TB of video tractable).
    Frames are fixed-size byte slices here; a real pipeline would hand
    each slice to the codec (see decode_image) instead of hex-dumping it."""
    for pdf in batches:
        ids: list[int] = []
        idxs: list[int] = []
        hexes: list[str] = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = len(payload) // FRAME_SIZE
            for i in range(0, n_frames, FRAME_STRIDE):
                ids.append(doc_id)
                idxs.append(i)
                hexes.append(payload[i * FRAME_SIZE : (i + 1) * FRAME_SIZE].hex())
        yield pd.DataFrame(
            {
                "doc_id": np.asarray(ids, dtype=np.int64),
                "frame_idx": np.asarray(idxs, dtype=np.int64),
                "frame_hex": pd.Series(hexes, dtype="object"),
            }
        )


@query(
    "multimodal_frame_sample",
    category="llm_multimodal",
    description=f"Strided frame sampling: every {FRAME_STRIDE}th {FRAME_SIZE}-byte frame",
    oracle=f"""
        SELECT doc_id, i AS frame_idx,
               lower(substring(hex(encode(text)),
                               CAST(i * {FRAME_SIZE} * 2 + 1 AS BIGINT),
                               {FRAME_SIZE} * 2)) AS frame_hex
        FROM documents,
             UNNEST(range(0, octet_length(encode(text)) // {FRAME_SIZE},
                          {FRAME_STRIDE})) t(i)
        ORDER BY doc_id, frame_idx
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling over opaque binary payloads: slice each
    payload into FRAME_SIZE-byte frames, keep every FRAME_STRIDE-th, one
    output row per kept frame. Runs embarrassingly parallel (frame
    extraction is payload-local, no shuffle); the oracle recomputes each
    kept slice from the source text via hex-string arithmetic, proving
    the byte-offset math end-to-end."""
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return with_payload.mapInPandas(
        sample_frames, "doc_id long, frame_idx long, frame_hex string"
    )


RESIZE_STRIDE = 4  # byte-level decimation factor of the "resize" stub


def resize_payloads(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas 'resize': deterministic 1-in-RESIZE_STRIDE byte
    decimation of the payload (the testable stand-in for an image resize —
    a real pipeline calls PIL.Image.resize here, same batch shape, same
    output contract: smaller payload + its summary stats)."""
    for pdf in batches:
        resized = pdf["payload"].map(lambda b: bytes(b[::RESIZE_STRIDE]))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "orig_bytes": pdf["payload"].map(len).astype("int64"),
                "resized_bytes": resized.map(len).astype("int64"),
                "resized_sum": resized.map(
                    lambda b: int(np.frombuffer(b, dtype=np.uint8).sum(dtype=np.int64)) % 997
                ).astype("int64"),
            }
        )


@query(
    "multimodal_resize_stub",
    category="llm_multimodal",
    description=f"Resize stub: 1-in-{RESIZE_STRIDE} byte decimation with verifiable stats",
    oracle=f"""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS orig_bytes,
               CAST((octet_length(encode(text)) + {RESIZE_STRIDE - 1}) // {RESIZE_STRIDE} AS BIGINT)
                   AS resized_bytes,
               CAST(COALESCE(list_sum(list_transform(
                        range(1, octet_length(encode(text)) + 1),
                        i -> CASE WHEN (i - 1) % {RESIZE_STRIDE} = 0
                                  THEN unicode(SUBSTRING(text, i, 1))::BIGINT
                                  ELSE 0 END)), 0) % 997 AS BIGINT) AS resized_sum
        FROM documents
        ORDER BY doc_id
    """,
)
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The missing piece of the decode/feature/resize/frame-sample quartet
    (SURVEY.md §2B multimodal): payload in, SMALLER payload out, verified
    by size + content checksum. The corpus is ASCII so byte i of the
    payload == code point of char i+1 — which is what lets the DuckDB twin
    recompute the decimated checksum from the source text, proving the
    binary transform is exactly the declared function of its input."""
    d = load_table(spark, sf_dir, "documents")
    with_payload = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return with_payload.mapInPandas(
        resize_payloads,
        "doc_id long, orig_bytes long, resized_bytes long, resized_sum long",
    )
