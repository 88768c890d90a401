"""Multimodal columns: image/audio/video as opaque `binary` + typed metadata.

The container has no image/audio libraries, so the DECODE step is a
clearly-marked stub (deterministic fake); everything Spark-side — schema,
partitioning, Arrow batch shape, mapInPandas plumbing — is real and tested.
Swap `_decode_image_stub` for a PIL/ffmpeg call in production.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Media row: payload + typed metadata, the multimodal analog of the
#: StreamMessage envelope (opaque payload, queryable envelope).
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("mime", StringType(), True),
        StructField("payload", BinaryType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("payload_bytes", LongType(), True),
        StructField("payload_sha", StringType(), True),
        StructField("feat_dim", IntegerType(), True),
        StructField("feat_head", StringType(), True),
    ]
)


def _decode_image_stub(payload: bytes) -> list[float]:
    """STUB: deterministic fake 'decode + feature extract'.

    Real implementation would be e.g. PIL.Image.open + a vision encoder;
    neither library ships in this container.  The fake derives an 8-dim
    feature from the payload's sha256 so tests are reproducible.
    """
    if payload is None:
        raise NotImplementedError("decode of NULL payload")
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(media: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """Decode/feature-extract via mapInPandas — Arrow batches of whole
    rows in, feature rows out; payload bytes never pass through the driver.

    The per-batch loop is the pattern for any real decoder: vectorize
    what you can, keep the batch small enough that decoded frames fit in
    executor memory (spark.sql.execution.arrow.maxRecordsPerBatch)."""

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_image_stub(p) if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "payload_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "payload_sha": [
                        hashlib.sha256(p).hexdigest() if p is not None else None
                        for p in pdf["payload"]
                    ],
                    "feat_dim": [len(f) if f else 0 for f in feats],
                    "feat_head": [
                        ",".join(f"{x:.6f}" for x in f[:2]) if f else None for f in feats
                    ],
                }
            )

    return media.mapInPandas(_extract, FEATURE_SCHEMA)


def media_metadata_stats(media: DataFrame) -> DataFrame:
    """Metadata-only aggregation — never touches payload bytes, so Parquet
    column pruning keeps it cheap at any scale."""
    return media.groupBy("kind").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.octet_length("payload")).alias("total_payload_bytes"),
        F.avg("width").alias("avg_width"),
        F.avg("duration_ms").alias("avg_duration_ms"),
    )


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame to decode
    (media_id, frame_ts_ms) — the explode happens engine-side; the decode
    of each planned frame would run through `extract_features`."""
    n_frames = (F.col("duration_ms") / every_ms).cast("int")
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0))),
                    lambda i: i * every_ms,
                )
            ).alias("frame_ts_ms"),
        )
    )
