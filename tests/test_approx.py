"""Bound the sketch-based catalog entries against their exact counterparts.

HLL++ and Greenwald-Khanna sketch state is engine-internal (not
bit-portable to DuckDB), so `approx_distinct_users_daily` and
`approx_value_percentiles` are rows-only catalog entries; this test is
their accuracy contract: each approximate answer must sit within the
sketch's published error bound of the exact answer computed by Spark on
the same data."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from broker_spark.plans.catalog import CATALOG
from broker_spark.tables import load
from tests.conftest import SF_SMALL


def test_approx_distinct_within_rsd(spark):
    approx = {
        r["day"]: r["approx_users"]
        for r in CATALOG["approx_distinct_users_daily"].fn(spark, SF_SMALL).collect()
    }
    exact = {
        r["day"]: r["exact_users"]
        for r in (
            load(spark, SF_SMALL, "events")
            .withColumn(
                "day", F.floor(F.unix_millis("ts") / F.lit(86_400_000)).cast("long")
            )
            .groupBy("day")
            .agg(F.countDistinct("user_id").alias("exact_users"))
            .collect()
        )
    }
    assert set(approx) == set(exact)
    for day, ex in exact.items():
        # rsd=0.02; allow 4 sigma plus integer slack for tiny groups.
        assert abs(approx[day] - ex) <= max(4, 0.08 * ex), (day, approx[day], ex)


def test_approx_percentiles_bounded(spark):
    rows = CATALOG["approx_value_percentiles"].fn(spark, SF_SMALL).collect()
    assert rows
    ev = load(spark, SF_SMALL, "events")
    exact = {
        r["event_type"]: r["pcts"]
        for r in ev.groupBy("event_type")
        .agg(F.expr("percentile(value, array(0.5, 0.9, 0.99))").alias("pcts"))
        .collect()
    }
    spread = {
        r["event_type"]: (r["lo"], r["hi"])
        for r in ev.groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in rows:
        lo, hi = spread[r["event_type"]]
        scale = max(hi - lo, 1e-9)
        for got, want in zip(r["approx_pcts"], exact[r["event_type"]]):
            # GK with accuracy=10000 is near-exact at this scale; 1% of the
            # value range is a generous envelope that still catches a wrong
            # column or a broken merge.
            assert abs(got - want) <= 0.01 * scale, (r["event_type"], got, want)


def test_rows_only_entries_have_no_oracle():
    for name in ("approx_distinct_users_daily", "approx_value_percentiles"):
        assert name in CATALOG
        assert CATALOG[name].sql is None
