"""Golden-vector partitioner parity (reference test/unit/Partitioner.test.ts)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from broker_spark.functions.partitioner import keyed_partition, partition_for_key

# test/unit/Partitioner.test.ts:24-27 — md5 golden vectors for key-0..key-99
GOLDEN = [6, 7, 4, 4, 9, 1, 8, 0, 6, 6, 7, 6, 7, 3, 2, 2, 0, 9, 4, 9, 9, 5, 5,
          1, 7, 3, 0, 6, 5, 6, 3, 6, 3, 5, 6, 2, 3, 6, 7, 2, 1, 3, 2, 7, 1, 1,
          5, 1, 4, 0, 1, 9, 7, 4, 2, 3, 2, 9, 7, 7, 4, 3, 5, 4, 5, 3, 9, 0, 4,
          8, 1, 7, 4, 8, 1, 2, 9, 9, 5, 3, 5, 0, 9, 4, 3, 9, 6, 7, 8, 6, 4, 6,
          0, 1, 1, 5, 8, 3, 9, 7]


def test_scalar_golden_vectors():
    assert [partition_for_key(10, f"key-{i}") for i in range(100)] == GOLDEN


def test_scalar_count_one_fast_path():
    assert all(partition_for_key(1, f"foo{i}") == 0 for i in range(100))


def test_scalar_throws_on_zero_count():
    with pytest.raises(ValueError):
        partition_for_key(0, "foo")


def test_column_expression_golden_vectors(spark):
    df = spark.createDataFrame([(f"key-{i}",) for i in range(100)], ["k"])
    out = df.select(keyed_partition(F.col("k"), 10).alias("p")).collect()
    assert [r["p"] for r in out] == GOLDEN


def test_column_expression_count_one(spark):
    df = spark.createDataFrame([("x",), ("y",)], ["k"])
    out = df.select(keyed_partition(F.col("k"), 1).alias("p")).collect()
    assert [r["p"] for r in out] == [0, 0]


def test_column_expression_null_key_random_in_range(spark):
    df = spark.createDataFrame([(None,)] * 50, "k string")
    out = df.select(keyed_partition(F.col("k"), 7).alias("p")).collect()
    assert all(0 <= r["p"] < 7 for r in out)


def test_column_matches_scalar_on_arbitrary_keys(spark):
    keys = [f"stream-{i}-xyz" for i in range(200)]
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    out = df.select("k", keyed_partition(F.col("k"), 100).alias("p")).collect()
    expected = {k: partition_for_key(100, k) for k in keys}
    assert all(expected[r["k"]] == r["p"] for r in out)
