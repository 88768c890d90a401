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
    # Rank-based accuracy contract: GK returns an actual data element whose
    # rank must be within eps*n (+1 slack) order statistics of the target
    # rank.  A value-distance bound is wrong at sf0.001 (n≈200/group): the
    # gap between adjacent order statistics near p99 legitimately exceeds
    # any small fraction of the value range.
    import bisect

    rows = CATALOG["approx_value_percentiles"].fn(spark, SF_SMALL).collect()
    assert rows
    ev = load(spark, SF_SMALL, "events")
    by_type: dict[str, list[float]] = {}
    for r in ev.select("event_type", "value").collect():
        by_type.setdefault(r["event_type"], []).append(r["value"])
    for vals in by_type.values():
        vals.sort()
    for r in rows:
        vals = by_type[r["event_type"]]
        n = len(vals)
        tol = max(2, int(n / 10_000) + 1)  # accuracy=10000 -> eps*n, +1 slack
        for got, p in zip(r["approx_pcts"], (0.5, 0.9, 0.99)):
            target = p * (n - 1)
            lo = bisect.bisect_left(vals, got)
            hi = bisect.bisect_right(vals, got) - 1
            # got's attainable rank interval must overlap [target±tol]
            assert lo - tol <= target <= hi + tol, (
                r["event_type"],
                p,
                got,
                lo,
                hi,
                target,
            )


def test_rows_only_entries_have_no_oracle():
    for name in ("approx_distinct_users_daily", "approx_value_percentiles"):
        assert name in CATALOG
        assert CATALOG[name].sql is None
