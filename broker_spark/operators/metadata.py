"""Metadata aggregates (SURVEY §2.4 A1-A8).

The reference answers count/bytes/first/last from the small `bucket`
counter table (`src/storage/Storage.ts:452-576`,
`src/http/DataMetadataEndpoints.ts:21-26`).  On Spark the same numbers
come from either (a) a metadata-only parquet scan — `count()` reads footer
row counts, min/max read row-group stats (spark.sql.parquet.aggregatePushdown)
— or (b) the `bucket_index` summary DataFrame below, the direct analog of
the reference's bucket table, cheap to maintain per micro-batch and the
right answer at 100 TB (keep a summary table; never full-scan for a count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from broker_spark.schema import DEFAULT_BUCKET_MS, bucket_of


def bucket_index(df: DataFrame, bucket_ms: int = DEFAULT_BUCKET_MS) -> DataFrame:
    """A8: the `bucket` summary table, derived instead of hand-maintained.

    Reference columns `stream_id, partition, date_create, id, records, size`
    with counters UPSERTed every 500 ms (src/storage/BucketManager.ts:
    232,302,325-344).  Here it is one aggregation; in streaming it is the
    same aggregation merged in foreachBatch.
    """
    with_b = df.withColumn("bucket", bucket_of(F.col("ts"), bucket_ms))
    return with_b.groupBy("stream_id", "partition", "bucket").agg(
        F.count(F.lit(1)).alias("records"),
        F.sum(F.octet_length(F.col("content"))).alias("size"),
        F.min("ts").alias("date_create"),
        F.max("ts").alias("max_ts"),
    )


def message_count(df: DataFrame, stream_id: str) -> DataFrame:
    """A2 getNumberOfMessagesInStream (src/storage/Storage.ts:520-537)."""
    return (
        df.filter(F.col("stream_id") == stream_id)
        .groupBy("stream_id", "partition")
        .agg(F.count(F.lit(1)).alias("records"))
    )


def total_bytes(df: DataFrame, stream_id: str) -> DataFrame:
    """A3 getTotalBytesInStream (src/storage/Storage.ts:539-576).

    LongType sum — the reference's int-overflow fallback re-sum
    (src/storage/Storage.ts:556-575) is unnecessary.
    """
    return (
        df.filter(F.col("stream_id") == stream_id)
        .groupBy("stream_id", "partition")
        .agg(F.sum(F.octet_length(F.col("content"))).alias("total_bytes"))
    )


def first_message_ts(df: DataFrame, stream_id: str, partition: int) -> DataFrame:
    """A4 getFirstMessageTimestampInStream (src/storage/Storage.ts:452-484).
    min() reads parquet row-group stats — metadata-only at any scale."""
    return (
        df.filter((F.col("stream_id") == stream_id) & (F.col("partition") == partition))
        .agg(F.min("ts").alias("first_ts"))
    )


def last_message_ts(df: DataFrame, stream_id: str, partition: int) -> DataFrame:
    """A5 getLastMessageTimestampInStream (src/storage/Storage.ts:486-518)."""
    return (
        df.filter((F.col("stream_id") == stream_id) & (F.col("partition") == partition))
        .agg(F.max("ts").alias("last_ts"))
    )


def partition_metadata(df: DataFrame, stream_id: str, partition: int) -> DataFrame:
    """The DataMetadataEndpoints response (src/http/DataMetadataEndpoints.ts:
    21-26) — totalBytes / totalMessages / firstMessage / lastMessage — as
    ONE aggregation pass (the reference issues four separate queries)."""
    return (
        df.filter((F.col("stream_id") == stream_id) & (F.col("partition") == partition))
        .agg(
            F.sum(F.octet_length(F.col("content"))).alias("totalBytes"),
            F.count(F.lit(1)).alias("totalMessages"),
            F.unix_millis(F.min("ts")).alias("firstMessage"),
            F.unix_millis(F.max("ts")).alias("lastMessage"),
        )
    )


def distinct_stream_partitions(df: DataFrame) -> DataFrame:
    """A7: `SELECT DISTINCT stream_id, partition`
    (src/storage/DeleteExpiredCmd.ts:73)."""
    return df.select("stream_id", "partition").distinct()
