"""Round-14 optimization pins: the scale-adaptive core-width guard
(ADVICE r13 — the r13 explicit repartitions on q17/q18/q21/market-basket
and the brute-force cosine scorers must fire at fixture scale but skip
once the input scan is already wide)."""

from __future__ import annotations

from pyspark.sql import functions as F

from broker_spark.tables import _size_bytes, est_scan_splits


class TestSizeBytes:
    def test_suffixes(self):
        assert _size_bytes("128m") == 128 * 1024**2
        assert _size_bytes("4mb") == 4 * 1024**2
        assert _size_bytes("1g") == 1024**3
        assert _size_bytes("16k") == 16 * 1024
        assert _size_bytes("134217728") == 134217728
        assert _size_bytes("512b") == 512


class TestEstScanSplits:
    def test_in_memory_frame_is_narrow(self, spark):
        df = spark.range(10).select(F.col("id").alias("k"))
        assert est_scan_splits(df) == 1

    def test_small_file_is_one_split(self, spark, tmp_path):
        p = str(tmp_path / "t.parquet")
        spark.range(100).write.parquet(p)
        assert est_scan_splits(spark.read.parquet(p)) == 1

    def test_wide_scan_detected(self, spark, tmp_path):
        """Lowering maxPartitionBytes makes the same file 'wide': the
        estimate is pure driver-side arithmetic over conf + file sizes,
        so no query runs."""
        p = str(tmp_path / "wide.parquet")
        spark.range(50_000).write.parquet(p)
        df = spark.read.parquet(p)
        old_max = spark.conf.get("spark.sql.files.maxPartitionBytes")
        old_open = spark.conf.get(
            "spark.sql.files.openCostInBytes", "4194304"
        )
        try:
            spark.conf.set("spark.sql.files.maxPartitionBytes", "8k")
            spark.conf.set("spark.sql.files.openCostInBytes", "0")
            wide = est_scan_splits(df)
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old_max)
            spark.conf.set("spark.sql.files.openCostInBytes", old_open)
        assert wide >= spark.sparkContext.defaultParallelism
        assert est_scan_splits(df) == 1  # restored conf: narrow again


class TestWidthGuard:
    def test_reduce_width_fires_when_narrow(self, spark):
        from broker_spark.plans.catalog import _reduce_width

        df = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") % 7).alias("v")
        )
        out = _reduce_width(df, spark, "k")
        assert "RepartitionByExpression" in out._jdf.queryExecution().logical().toString()
        # values unchanged
        assert sorted(r["k"] for r in out.collect()) == list(range(100))

    def test_reduce_width_skips_when_wide(self, spark, tmp_path):
        from broker_spark.plans.catalog import _reduce_width

        p = str(tmp_path / "w.parquet")
        spark.range(50_000).write.parquet(p)
        df = spark.read.parquet(p)
        old_max = spark.conf.get("spark.sql.files.maxPartitionBytes")
        old_open = spark.conf.get(
            "spark.sql.files.openCostInBytes", "4194304"
        )
        try:
            spark.conf.set("spark.sql.files.maxPartitionBytes", "8k")
            spark.conf.set("spark.sql.files.openCostInBytes", "0")
            out = _reduce_width(df, spark, "id")
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old_max)
            spark.conf.set("spark.sql.files.openCostInBytes", old_open)
        assert out is df  # wide scan: partial-agg path kept, no shuffle added

    def test_core_width_guard_same_rule(self, spark, tmp_path):
        from broker_spark.pipeline.ann import _core_width

        narrow = spark.range(10).select(
            F.col("id").alias("cand_id"), F.array(F.lit(1.0)).alias("v")
        )
        assert (
            "RepartitionByExpression"
            in _core_width(narrow, "cand_id")
            ._jdf.queryExecution()
            .logical()
            .toString()
        )
        p = str(tmp_path / "c.parquet")
        spark.range(50_000).write.parquet(p)
        df = spark.read.parquet(p).select(F.col("id").alias("cand_id"))
        old_max = spark.conf.get("spark.sql.files.maxPartitionBytes")
        old_open = spark.conf.get(
            "spark.sql.files.openCostInBytes", "4194304"
        )
        try:
            spark.conf.set("spark.sql.files.maxPartitionBytes", "8k")
            spark.conf.set("spark.sql.files.openCostInBytes", "0")
            assert _core_width(df, "cand_id") is df
        finally:
            spark.conf.set("spark.sql.files.maxPartitionBytes", old_max)
            spark.conf.set("spark.sql.files.openCostInBytes", old_open)
