"""Loaders for the driver-provided parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file each under a scale-factor dir.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: Name of the per-session memo attribute of resolved table DataFrames.
#: `spark.read.parquet` costs ~80 ms of file listing + footer schema read
#: PER CALL; across a catalog run that re-loads the same static tables
#: hundreds of times it adds tens of seconds of pure metadata latency.
#: Reusing the resolved (immutable, lazy) DataFrame is exactly what a
#: metastore `spark.table(...)` gives on a real cluster — the relation and
#: its file index resolve once, every query re-plans and re-scans from
#: there.  The driver testdata dirs are read-only, so the cached file
#: index can never go stale; loaders for MUTABLE paths (the partitioned
#: storage log) do not go through this function —
#: tests/test_round11_ops.py pins that invariant.
#:
#: The dict lives ON the session object (not in a module-level
#: WeakKeyDictionary): cached DataFrames hold a strong reference back to
#: their session, and a WeakKeyDictionary value that refers to its key is
#: never discarded — stopped sessions would accumulate for process
#: lifetime.  As a plain attribute the session -> dict -> DataFrame ->
#: session loop is an ordinary reference CYCLE, collectable by gc as soon
#: as the last outside reference to the session drops.
_MEMO_ATTR = "_broker_spark_load_memo"


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table, normalizing `ts` to TimestampType.

    The driver has shipped three physical encodings of `events.ts` across
    rounds; all must land as session-tz (UTC) TimestampType with identical
    epoch-micros values to what DuckDB's naive reader sees:

    - TIMESTAMP(NANOS): Spark rejects it by default (PARQUET_TYPE_ILLEGAL);
      read nanos as long, truncate to micros (what DuckDB does).
    - timestamp[us] without tz: Spark infers TIMESTAMP_NTZ, which
      `unix_millis()` rejects; cast to TimestampType — the session tz is
      UTC, so the cast is value-identical to DuckDB's naive reading.
    - timestamp[us, tz=UTC]: already TimestampType, no-op.
    """
    memo = spark.__dict__.setdefault(_MEMO_ATTR, {})
    key = (os.path.abspath(sf_dir), name)
    cached = memo.get(key)
    if cached is not None:
        return cached
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # conf locked down -> fall through; non-nanos tables still read
    df = spark.read.parquet(path)
    for field in df.schema.fields:
        if field.name == "ts" and isinstance(field.dataType, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif field.name == "ts" and isinstance(field.dataType, TimestampNTZType):
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    memo[key] = df
    return df


def _size_bytes(s: str) -> int:
    """Parse a Spark byte-size conf value ("128m", "4mb", "134217728")."""
    t = s.strip().lower()
    for suf, mult in (
        ("kb", 1024),
        ("mb", 1024**2),
        ("gb", 1024**3),
        ("tb", 1024**4),
        ("k", 1024),
        ("m", 1024**2),
        ("g", 1024**3),
        ("t", 1024**4),
        ("b", 1),
    ):
        if t.endswith(suf):
            return int(float(t[: -len(suf)]) * mult)
    return int(t)


def est_scan_splits(df: DataFrame) -> int:
    """Estimate the PRODUCTIVE scan parallelism of `df`'s file sources:
    input bytes / maxPartitionBytes (+ per-file open cost) — i.e. how many
    ~128 MB units of real data the scan feeds, the number that decides
    whether a downstream compute stage needs an explicit core-width
    repartition (guide §2.5) or is already wide.

    Deliberately NOT `df.rdd.getNumPartitions()`: that call builds a
    pickled-row RDD plan (~0.1-0.5 s of driver latency per call, measured
    r14), and Spark's bytesPerCore split rule slices even a single
    row-group file into core-count EMPTY splits — only the split holding
    the row group does work, so the partition count over-reports usable
    parallelism exactly when the guard matters.  File listing is cached on
    the session's file index, so this is a few ms of os.stat.

    Returns 1 (the conservative "narrow" answer) for non-file-backed
    frames (in-memory test relations) — matching the r13 behavior of an
    unconditional core-width repartition."""
    try:
        files = df.inputFiles()
    except Exception:
        return 1
    if not files:
        return 1
    conf = df.sparkSession.conf
    max_split = _size_bytes(conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    open_cost = _size_bytes(conf.get("spark.sql.files.openCostInBytes", "4194304"))
    total = 0
    for f in files:
        p = f
        if p.startswith("file://"):
            p = p[7:]
        elif p.startswith("file:"):
            p = p[5:]
        try:
            total += os.path.getsize(p) + open_cost
        except OSError:
            total += open_cost
    return max(1, -(-total // max_split))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so spark.sql() can reference it."""
    for name in TABLE_NAMES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
