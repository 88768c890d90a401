"""As-of join unit tests: inclusive boundary, no-prior-row nulls,
tolerance windows, key isolation."""

from __future__ import annotations

import datetime as dt

from broker_spark.operators.asof import asof_join


def _dt(ms):
    return dt.datetime.utcfromtimestamp(ms / 1000.0)


def _frames(spark):
    left = spark.createDataFrame(
        [("u1", 1, _dt(1000)), ("u1", 2, _dt(2000)), ("u1", 3, _dt(3500)),
         ("u2", 4, _dt(1000))],
        "user_id string, eid int, ts timestamp",
    )
    right = spark.createDataFrame(
        [("u1", _dt(500), 10.0), ("u1", _dt(2000), 20.0), ("u1", _dt(3000), 30.0)],
        "user_id string, ts timestamp, v double",
    )
    return left, right


def test_basic_asof_semantics(spark):
    left, right = _frames(spark)
    out = {
        r["eid"]: (r["asof_v"], r["asof_ts"])
        for r in asof_join(left, right, ["user_id"]).collect()
    }
    assert out[1] == (10.0, _dt(500))     # latest at/before 1000 is 500
    assert out[2] == (20.0, _dt(2000))    # inclusive boundary: ts == ts
    assert out[3] == (30.0, _dt(3000))
    assert out[4] == (None, None)         # u2 has no purchases


def test_tolerance_window(spark):
    left, right = _frames(spark)
    out = {
        r["eid"]: r["asof_v"]
        for r in asof_join(left, right, ["user_id"], tolerance_ms=600).collect()
    }
    assert out[1] == 10.0   # 500ms back, within 600
    assert out[2] == 20.0   # exact
    assert out[3] == 30.0   # 500ms back
    assert out[4] is None


def test_left_rows_preserved(spark):
    left, right = _frames(spark)
    assert asof_join(left, right, ["user_id"]).count() == left.count()
