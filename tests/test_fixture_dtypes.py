"""Fixture-dtype robustness: the driver has shipped two different physical
timestamp encodings of events.parquet across rounds (TIMESTAMP(NANOS) in
round 1, timestamp[us] no-tz in round 2).  tables.load() must normalize
every variant — nanos-as-long, us-NTZ, and us-UTC — to session-tz
TimestampType with identical epoch-ms values, or every unix_millis() call
in the repo breaks (the round-2 incident).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pyspark.sql.functions as F
import pytest
from pyspark.sql.types import TimestampType

from broker_spark.tables import load

SF_DIRS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]

EPOCH_US = [1_700_000_000_000_000, 1_700_000_123_456_000, 1_700_086_400_000_000]


def test_driver_fixtures_ts_is_timestamp(spark):
    for sf_dir in SF_DIRS:
        if not os.path.isdir(sf_dir):
            pytest.skip(f"{sf_dir} missing")
        df = load(spark, sf_dir, "events")
        (ts_field,) = [f for f in df.schema.fields if f.name == "ts"]
        assert isinstance(ts_field.dataType, TimestampType), (sf_dir, ts_field)
        # unix_millis must resolve — this is exactly what broke in round 2
        row = df.select(F.unix_millis("ts").alias("ms")).limit(1).collect()
        assert row and row[0]["ms"] > 0


@pytest.mark.parametrize(
    "arrow_type",
    [
        pa.timestamp("ns"),
        pa.timestamp("us"),
        pa.timestamp("us", tz="UTC"),
    ],
    ids=["nanos", "us-ntz", "us-utc"],
)
def test_all_ts_encodings_normalize_identically(spark, tmp_path, arrow_type):
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(EPOCH_US, pa.timestamp("us")).cast(arrow_type),
        }
    )
    d = tmp_path / "sfx"
    d.mkdir()
    pq.write_table(tbl, str(d / "events.parquet"))
    df = load(spark, str(d), "events")
    (ts_field,) = [f for f in df.schema.fields if f.name == "ts"]
    assert isinstance(ts_field.dataType, TimestampType), (arrow_type, ts_field)
    got = sorted(
        r["ms"] for r in df.select(F.unix_millis("ts").alias("ms")).collect()
    )
    assert got == sorted(us // 1000 for us in EPOCH_US), (arrow_type, got)
