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


def audio_chunk_plan(media: DataFrame, chunk_ms: int = 5000) -> DataFrame:
    """Audio chunking *plan*: one row per fixed-length chunk
    (media_id, chunk_idx, chunk_start_ms, chunk_end_ms) — the Whisper-style
    pre-segmentation step.  Pure column expressions (sequence + explode);
    the last chunk is clipped to the clip's duration.  The per-chunk decode
    would run through the same mapInPandas shape as extract_features."""
    n_chunks = F.ceil(F.col("duration_ms") / chunk_ms).cast("int")
    return (
        media.filter(F.col("kind") == "audio")
        .select(
            "media_id",
            F.col("duration_ms"),
            F.posexplode(
                F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))
            ).alias("chunk_idx", "_i"),
        )
        .select(
            "media_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            (F.col("chunk_idx") * chunk_ms).cast("long").alias("chunk_start_ms"),
            F.least(
                (F.col("chunk_idx") + 1) * F.lit(chunk_ms).cast("long"),
                F.col("duration_ms"),
            ).cast("long").alias("chunk_end_ms"),
        )
    )


def image_resize_batches(
    media: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Image-resize plumbing over mapInPandas: Arrow batches in, one row per
    image out with the resize geometry (scale factors, letterbox padding).
    The pixel work is STUBBED — no image libs in this container — but the
    batch shape, schema, and geometry math are the real pipeline: swap the
    body for PIL/cv2 `resize` and the plan is unchanged."""
    import pandas as pd

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            w = pdf["width"].astype("float64")
            scale = (target_w / w).round(6)
            out_h = (w * 0 + target_h).astype("int32")  # letterbox to target
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].astype("int64"),
                    "src_width": pdf["width"].astype("int32"),
                    "target_w": pd.Series([target_w] * len(pdf), dtype="int32"),
                    "target_h": out_h,
                    "scale_x": scale.astype("float64"),
                    "payload_bytes": pdf["payload"].map(len).astype("int64"),
                }
            )

    return (
        media.filter(F.col("kind") == "image")
        .select("media_id", "width", "payload")
        .mapInPandas(
            _resize,
            "media_id long, src_width int, target_w int, target_h int,"
            " scale_x double, payload_bytes long",
        )
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
