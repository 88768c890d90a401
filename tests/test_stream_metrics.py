"""Metrics publish-back cascade tests, mirroring
test/integration/per-node-stream-metrics.test.ts: fill the source tier with
mock reports, run the next tier, and assert the averaged report lands on
the target metrics stream."""

from __future__ import annotations

import json

import pytest

from broker_spark.jobs.stream_metrics import (
    METRICS_PATH,
    MetricsContext,
    StreamMetrics,
    throttled_avg,
    zero_report,
)
from broker_spark.serving.publish import PublishRequest, PublishSpool
from broker_spark.storage.store import Storage

NODE = "0xnode"
MOCK_T0 = 1_577_836_800_000  # 2020-01-01, like the reference's fillMetrics


@pytest.fixture()
def stack(spark, tmp_path):
    st = Storage(spark, str(tmp_path / "metrics-log"), bucket_ms=86_400_000)
    spool = PublishSpool(st, partition_count=1, close_timeout_s=60.0)
    yield st, spool
    spool.close()


def fill_metrics(spool, count, source, value=3.0):
    """fillMetrics (per-node-stream-metrics.test.ts:13-51): publish `count`
    mock reports into the source tier's stream."""
    stream_id = NODE + METRICS_PATH + source
    for i in range(count):
        ts = MOCK_T0 + i * 1000
        report = zero_report(NODE)
        report["broker"]["messagesToNetworkPerSec"] = value
        report["network"]["connections"] = value * 2
        report["currentTime"] = ts
        report["timestamp"] = ts
        spool.publish(
            PublishRequest(
                stream_id=stream_id, content=json.dumps(report), timestamp=ts
            ),
            now_ms=ts,
        )
    spool.flush()


def read_tier(st, interval, n=10):
    rows = st.request_last(NODE + METRICS_PATH + interval, 0, n).collect()
    return [json.loads(r["content"]) for r in rows]


def test_min_tier_averages_sec_reports(stack):
    st, spool = stack
    fill_metrics(spool, 60, "sec", value=3.0)

    tier = StreamMetrics(st, spool, NODE, "min")
    now = MOCK_T0 + 60_000
    assert tier.run_report(now_ms=now) is True
    spool.flush()

    reports = read_tier(st, "min")
    assert len(reports) == 1
    r = reports[0]
    assert r["broker"]["messagesToNetworkPerSec"] == pytest.approx(3.0)
    assert r["network"]["connections"] == pytest.approx(6.0)
    assert r["timestamp"] == now
    assert r["peerId"] == NODE


def test_day_tier_averages_24_hour_reports(stack):
    st, spool = stack
    fill_metrics(spool, 24, "hour", value=12.0)
    tier = StreamMetrics(st, spool, NODE, "day")
    assert tier.run_report(now_ms=MOCK_T0 + 86_400_000) is True
    spool.flush()
    (r,) = read_tier(st, "day")
    assert r["broker"]["messagesToNetworkPerSec"] == pytest.approx(12.0)


def test_empty_source_publishes_zero_report(stack):
    st, spool = stack
    tier = StreamMetrics(st, spool, NODE, "hour")
    assert tier.run_report(now_ms=MOCK_T0) is True
    spool.flush()
    (r,) = read_tier(st, "hour")
    assert r["broker"]["messagesToNetworkPerSec"] == 0
    assert r["timestamp"] == MOCK_T0


def test_fresh_target_skips_publish(stack):
    """StreamMetrics.ts:166-167 — no publish while the newest target
    report is younger than the report interval."""
    st, spool = stack
    fill_metrics(spool, 60, "sec")
    tier = StreamMetrics(st, spool, NODE, "min")
    assert tier.run_report(now_ms=MOCK_T0 + 60_000) is True
    spool.flush()
    # 1 s later: target is fresh -> skipped
    assert tier.run_report(now_ms=MOCK_T0 + 61_000) is False
    # a full interval later: published again
    assert tier.run_report(now_ms=MOCK_T0 + 121_000) is True
    spool.flush()
    assert len(read_tier(st, "min")) == 2


def test_sec_tier_ewma_smoothing(stack):
    """First sample assigns, later samples smooth with 0.8/0.2
    (StreamMetrics.ts:113-147)."""
    st, spool = stack
    ctx = MetricsContext()
    tier = StreamMetrics(st, spool, NODE, "sec", metrics=ctx)

    ctx.record("publisher.messages", 100)
    tier.run_report(now_ms=MOCK_T0)
    first = tier.report["broker"]["messagesToNetworkPerSec"]
    assert first > 0

    # no traffic since -> rate 0; EWMA decays by exactly 0.8
    tier.run_report(now_ms=MOCK_T0 + 1000)
    assert tier.report["broker"]["messagesToNetworkPerSec"] == pytest.approx(
        throttled_avg(first, 0.0)
    )
    spool.flush()
    assert len(read_tier(st, "sec")) == 2


def test_cascade_end_to_end(stack):
    """sec reports -> min average -> hour average, all through the log."""
    st, spool = stack
    fill_metrics(spool, 60, "sec", value=5.0)
    mins = StreamMetrics(st, spool, NODE, "min")
    hours = StreamMetrics(st, spool, NODE, "hour")

    assert mins.run_report(now_ms=MOCK_T0 + 60_000)
    spool.flush()
    assert hours.run_report(now_ms=MOCK_T0 + 3_600_000)
    spool.flush()

    (h,) = read_tier(st, "hour")
    assert h["broker"]["messagesToNetworkPerSec"] == pytest.approx(5.0)
