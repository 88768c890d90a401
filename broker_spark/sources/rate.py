"""Synthetic message source: Spark's rate source mapped onto the envelope.

The rate source emits (timestamp, value) rows at a configured rate; the
adapter derives a deterministic StreamMessage envelope from `value` so a
full ingest → store → resend pipeline can run with no external broker —
the Spark analog of the reference's test publishers.  Swap for
`format("kafka")` + the same `with_envelope` projection in production.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_envelope(
    raw: DataFrame,
    n_streams: int = 4,
    n_partitions: int = 4,
    value_col: str = "value",
    ts_col: str = "timestamp",
) -> DataFrame:
    """Project (ts, value) rows onto the message envelope, deterministically:
    stream/partition/publisher cycle by value, content is a JSON payload."""
    v = F.col(value_col)
    return raw.select(
        F.concat(F.lit("stream-"), (v % n_streams).cast("string")).alias("stream_id"),
        ((v / n_streams).cast("long") % n_partitions).cast("int").alias("partition"),
        F.col(ts_col).alias("ts"),
        (v % 2_147_483_647).cast("int").alias("sequence_no"),
        F.concat(F.lit("pub-"), (v % 3).cast("string")).alias("publisher_id"),
        F.lit("1").alias("msg_chain_id"),
        F.lit(None).cast("timestamp").alias("prev_ts"),
        F.lit(None).cast("int").alias("prev_sequence_no"),
        F.lit(0).alias("signature_type"),
        F.lit(None).cast("string").alias("signature"),
        F.lit(0).alias("encryption_type"),
        F.to_json(F.struct(v.alias("n"))).alias("content"),
    )


def rate_stream(
    spark: SparkSession,
    rows_per_second: int = 100,
    n_streams: int = 4,
    n_partitions: int = 4,
) -> DataFrame:
    """`readStream.format("rate")` → envelope columns (streaming frame)."""
    raw = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    return with_envelope(raw, n_streams, n_partitions)
