"""Retention: select and drop expired buckets (SURVEY §2.2 F9, §2.7 W8).

The reference's DeleteExpiredCmd fetches per-stream `storageDays` from the
core API, selects candidate buckets older than the cutoff, verifies
`MAX(ts) < cutoff` per bucket, then deletes bucket + data
(src/storage/DeleteExpiredCmd.ts:73-187).

Spark-first: per-stream retention config is a small DataFrame broadcast-
joined (J3) against the bucket summary; deletion is a partition drop —
O(metadata), no data rewrite — because `bucket` is a physical partition
column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

# Reference default retention — src/storage/DeleteExpiredCmd.ts:91
DEFAULT_STORAGE_DAYS = 365

# Characters Spark escapes in partition directory names (Hive
# FileUtils.escapePathName, mirrored by Spark's ExternalCatalogUtils):
# ASCII control chars plus the shell/URI-special set.  Reference stream
# ids routinely contain '/' and ':', so a raw f-string path never matches
# the on-disk directory.
_ESCAPE_CHARS = frozenset(chr(c) for c in range(0x01, 0x20)) | frozenset(
    '"#%\'*/:=?\\\x7f{[]^'
)


def escape_path_name(value: str) -> str:
    """Percent-encode a partition value exactly the way Spark does on
    write (ExternalCatalogUtils.escapePathName), so reconstructed paths
    match the physical directory layout."""
    return "".join(f"%{ord(ch):02X}" if ch in _ESCAPE_CHARS else ch for ch in value)


def partition_path(table_path: str, stream_id: str, partition, bucket) -> str:
    """Physical directory of one (stream_id, partition, bucket) log
    partition, with partition values escaped as Spark escapes them."""
    return (
        f"{table_path}/stream_id={escape_path_name(str(stream_id))}"
        f"/partition={partition}/bucket={bucket}"
    )


def expired_buckets(
    bucket_idx: DataFrame,
    retention: DataFrame,
    now_ms: int,
    default_days: int = DEFAULT_STORAGE_DAYS,
) -> DataFrame:
    """F9 + J3: buckets fully older than each stream's retention cutoff.

    `bucket_idx` has (stream_id, partition, bucket, max_ts, ...) — see
    operators.metadata.bucket_index.  `retention` is a small config frame
    (stream_id, storage_days) — broadcast it; never shuffle the big side.

    A bucket is expired iff its newest row is older than the cutoff
    (the reference double-checks MAX(ts) the same way,
    src/storage/DeleteExpiredCmd.ts:138-161).
    """
    cutoff = F.timestamp_millis(
        F.lit(now_ms) - F.col("storage_days").cast("long") * F.lit(86_400_000)
    )
    joined = bucket_idx.join(broadcast(retention), "stream_id", "left").withColumn(
        "storage_days",
        F.coalesce(F.col("storage_days"), F.lit(default_days)),
    )
    return joined.filter(F.col("max_ts") < cutoff).select(
        "stream_id", "partition", "bucket", "max_ts"
    )


def drop_expired_partitions(
    spark,
    table_path: str,
    expired: DataFrame,
) -> list[str]:
    """W8: physically drop expired partitions (directory removal — the
    Spark analog of the reference's bucket+data DELETEs,
    src/storage/DeleteExpiredCmd.ts:163-187).

    Returns the partition paths removed.  Uses the Hadoop FileSystem API via
    the JVM gateway so it works against any Hadoop-compatible store (local,
    HDFS, S3A) without shelling out.
    """
    rows = expired.collect()  # small: one row per expired (stream, part, bucket)
    jvm = spark._jvm
    jsc = spark._jsc
    conf = jsc.hadoopConfiguration()
    removed: list[str] = []
    for r in rows:
        path_str = partition_path(table_path, r["stream_id"], r["partition"], r["bucket"])
        path = jvm.org.apache.hadoop.fs.Path(path_str)
        fs = path.getFileSystem(conf)
        if fs.exists(path):
            fs.delete(path, True)
            removed.append(path_str)
    return removed
