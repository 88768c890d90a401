"""SparkSession factory with scale-appropriate defaults.

Defaults are chosen for a large cluster but work in local mode:
- AQE on (runtime re-plan, skew-join splitting, shuffle coalescing)
- Arrow on (pandas UDF hot paths)
- session timezone UTC (matches the reference's epoch-ms timestamps and
  the DuckDB oracle's naive timestamps)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "broker-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    In production these confs come from spark-submit; the function only
    fills in what is unset so cluster-level config wins.
    """
    # Python workers deserialize our pandas-UDF / applyInPandas functions by
    # module reference; make the package importable there no matter where
    # the driver script lives.  (Cluster deployments ship the package with
    # --py-files instead; this covers local mode.)
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pypath = os.environ.get("PYTHONPATH", "")
    if pkg_root not in pypath.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_root}{os.pathsep}{pypath}" if pypath else pkg_root
        )

    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else DEFAULT_SHUFFLE_PARTITIONS

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # initialPartitionNum is deliberately UNSET (= shuffle.partitions):
        # a blanket 8x start for every exchange was measured at +9% on the
        # sf0.1 headline subset and compounds over a long session's AQE /
        # map-status bookkeeping (r10 A/B, BENCH_DETAIL run at 118 s vs
        # 96 s).  The one shape that needed finer reduce partitions at
        # 100x — the shingle inverted-index SMJ joins — gets them from the
        # operator itself (corpus-scaled co-partitioning in
        # pipeline/dedup.py), and SMJ sorts spill to disk by design when a
        # partition outgrows its buffer.  On a real cluster, size
        # shuffle_partitions to the executor fleet via spark-submit.
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # keep wide plans (simhash bit counters, unpivoted percentile grids)
        # inside whole-stage codegen; the default silently falls back to
        # interpreted mode above 100 fields
        .config("spark.sql.codegen.maxFields", "400")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
