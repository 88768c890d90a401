"""Stateful streaming EWMA (W4), pub-sub fan-out (S4/W10), and the
resend-then-realtime handoff."""

from __future__ import annotations

import datetime as dt
import queue

import pytest
from pyspark.sql import functions as F

from broker_spark.operators.rollup import EWMA_PREV_WEIGHT, EWMA_SAMPLE_WEIGHT
from broker_spark.serving.live_merge import LiveBuffer, resend_then_realtime
from broker_spark.streaming import stateful
from broker_spark.streaming.fanout import SubscriptionRegistry, foreach_batch_fanout
from tests.conftest import make_msg

ENVELOPE = (
    "stream_id string, partition int, ts timestamp, sequence_no int, "
    "publisher_id string, msg_chain_id string, prev_ts timestamp, "
    "prev_sequence_no int, signature_type int, signature string, "
    "encryption_type int, content string"
)


class TestStreamingEwma:
    def test_matches_batch_recurrence_across_microbatches(self, spark, tmp_path):
        """Feed two files (two micro-batches with availableNow one-by-one);
        state must carry the EWMA across restarts of the stream."""
        src = tmp_path / "src"
        sink = str(tmp_path / "sink")
        ckpt = str(tmp_path / "ckpt")
        src.mkdir()

        def run_batch():
            source = (
                spark.readStream.schema("key string, bucket long, value double")
                .parquet(str(src))
            )
            q = (
                stateful.streaming_ewma(source)
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return {
                (r["key"], r["bucket"]): (r["value"], r["ewma"])
                for r in spark.read.parquet(sink).collect()
            }

        spark.createDataFrame(
            [("a", 0, 10.0), ("a", 1, 20.0), ("b", 0, 1.0)],
            "key string, bucket long, value double",
        ).write.mode("append").parquet(str(src))
        first = run_batch()

        spark.createDataFrame(
            [("a", 2, 30.0), ("b", 1, 3.0)], "key string, bucket long, value double"
        ).write.mode("append").parquet(str(src))
        both = run_batch()
        out_rows = {**first, **both}  # parquet sink accumulates; later read has all

        e_a0 = 10.0
        e_a1 = EWMA_PREV_WEIGHT * e_a0 + EWMA_SAMPLE_WEIGHT * 20.0
        e_a2 = EWMA_PREV_WEIGHT * e_a1 + EWMA_SAMPLE_WEIGHT * 30.0
        assert out_rows[("a", 0)][1] == pytest.approx(e_a0)
        assert out_rows[("a", 1)][1] == pytest.approx(e_a1)
        assert out_rows[("a", 2)][1] == pytest.approx(e_a2)  # state crossed batches
        assert out_rows[("b", 1)][1] == pytest.approx(
            EWMA_PREV_WEIGHT * 1.0 + EWMA_SAMPLE_WEIGHT * 3.0
        )


class TestFanout:
    def test_dispatch_only_to_subscribers_in_order(self, spark):
        reg = SubscriptionRegistry()
        got_a, got_x = [], []
        reg.subscribe("conn-1", "a", 0, lambda r: got_a.append(r["sequence_no"]))
        reg.subscribe("conn-2", "x", 0, lambda r: got_x.append(r["sequence_no"]))
        reg.unsubscribe("conn-2", "x", 0)

        now = int(dt.datetime.now(dt.timezone.utc).timestamp() * 1000)
        rows = [make_msg("a", 0, now + i, i) for i in (3, 1, 2)] + [
            make_msg("x", 0, now, 9),
            make_msg("unrelated", 5, now, 0),
        ]
        batch = spark.createDataFrame(rows, ENVELOPE)
        foreach_batch_fanout(reg)(batch, 0)
        assert got_a == [1, 2, 3]  # total order within the batch
        assert got_x == []  # unsubscribed

    def test_refcounted_subscription_across_connections(self):
        """SubscriptionManager semantics (src/SubscriptionManager.ts:14-30):
        the stream-partition stays network-subscribed while ANY connection
        holds it; the last unsubscribe releases it."""
        reg = SubscriptionRegistry()
        reg.subscribe("conn-1", "s", 0, lambda r: None)
        reg.subscribe("conn-2", "s", 0, lambda r: None)
        assert reg.subscribed_keys() == [("s", 0)]
        reg.unsubscribe("conn-1", "s", 0)
        assert reg.subscribed_keys() == [("s", 0)]  # conn-2 still holds it
        reg.unsubscribe("conn-2", "s", 0)
        assert reg.subscribed_keys() == []  # count hit zero -> released

    def test_no_subscribers_is_free(self, spark):
        reg = SubscriptionRegistry()
        called = []
        batch = spark.createDataFrame(
            [make_msg("a", 0, 1000, 0)], ENVELOPE
        )
        # would throw if it tried to filter/collect with no condition
        foreach_batch_fanout(reg)(batch, 0)
        assert called == []


class _Row(dict):
    def __getitem__(self, k):
        return dict.__getitem__(self, k)


def _msg(ts, seq, pub="p", chain="1"):
    return _Row(ts=ts, sequence_no=seq, publisher_id=pub, msg_chain_id=chain)


class TestResendThenRealtime:
    def test_overlap_deduplicated(self):
        hist = [_msg(1000, 0), _msg(2000, 0), _msg(3000, 0)]
        live = LiveBuffer()
        # live saw the tail of history plus two new messages, out of order
        for m in [_msg(3000, 0), _msg(5000, 0), _msg(4000, 0), _msg(2000, 0)]:
            live.push(m)
        out = list(resend_then_realtime(iter(hist), live))
        assert [(m["ts"], m["sequence_no"]) for m in out] == [
            (1000, 0), (2000, 0), (3000, 0), (4000, 0), (5000, 0),
        ]

    def test_empty_history(self):
        live = LiveBuffer()
        live.push(_msg(1000, 1))
        live.push(_msg(1000, 0))
        out = list(resend_then_realtime(iter([]), live))
        assert [(m["ts"], m["sequence_no"]) for m in out] == [(1000, 0), (1000, 1)]

    def test_tie_break_on_publisher(self):
        hist = [_msg(1000, 0, pub="a")]
        live = LiveBuffer()
        live.push(_msg(1000, 0, pub="b"))  # same (ts, seq), later publisher
        out = list(resend_then_realtime(iter(hist), live))
        assert [m["publisher_id"] for m in out] == ["a", "b"]


class TestStreamingLshDedup:
    def test_candidates_across_microbatches(self, spark, tmp_path):
        """The state store is the corpus index: a near-identical document
        arriving in a LATER micro-batch must still be flagged against the
        first-seen partner; batch-2 reruns must not re-flag batch-1 docs."""
        src = tmp_path / "docs-src"
        sink = str(tmp_path / "docs-sink")
        ckpt = str(tmp_path / "docs-ckpt")
        src.mkdir()

        base = "the quick brown fox jumps over the lazy dog again and again"
        near = base + " extra"   # shares shingles -> same band keys
        other = "completely different words entirely unrelated to anything here now"

        def run_batch():
            source = (
                spark.readStream.schema("doc_id long, text string")
                .parquet(str(src))
            )
            q = (
                stateful.streaming_lsh_candidates_backfill(source)
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return {
                (r["doc_id"], r["dup_of"])
                for r in spark.read.parquet(sink).collect()
            }

        spark.createDataFrame(
            [(1, base), (2, other)], "doc_id long, text string"
        ).write.mode("append").parquet(str(src))
        first = run_batch()
        assert first == set()  # two distinct docs claim their buckets

        spark.createDataFrame(
            [(3, near)], "doc_id long, text string"
        ).write.mode("append").parquet(str(src))
        second = run_batch()
        # doc 3 flagged against first-seen doc 1 (state carried over);
        # no re-flagging of batch-1 docs
        assert (3, 1) in second
        assert all(d == 3 for d, _ in second - first | second)
