"""Golden tests for the resend family, porting the exact scenarios of
reference test/integration/storage/Storage.test.ts onto DataFrames."""

from __future__ import annotations

from broker_spark.operators import resend
from tests.conftest import ids, make_msg


class TestRequestLast:
    def test_last_n_returned_ascending(self, golden_df, golden_messages):
        # Storage.test.ts:154-176 — last 3 messages, ascending order
        sid, _ = golden_messages
        out = resend.request_last(golden_df, sid, 10, 3).collect()
        assert ids(out) == [
            (3000, 2, "publisher3", "1"),
            (3000, 3, "publisher1", "4"),
            (4000, 0, "publisher3", "1"),
        ]

    def test_tie_break_by_sequence_no(self, golden_df, golden_messages):
        # Storage.test.ts:180-204 — ties at ts=3000 sort by sequence_no
        sid, _ = golden_messages
        out = resend.request_last(golden_df, sid, 10, 5).collect()
        assert ids(out) == [
            (3000, 0, "publisher1", "1"),
            (3000, 1, "publisher2", "1"),
            (3000, 2, "publisher3", "1"),
            (3000, 3, "publisher1", "4"),
            (4000, 0, "publisher3", "1"),
        ]

    def test_fewer_messages_than_requested(self, golden_df, golden_messages):
        sid, _ = golden_messages
        out = resend.request_last(golden_df, sid, 10, 10_000).collect()
        assert len(out) == 9  # decoys excluded

    def test_empty_stream(self, golden_df):
        # Storage.test.ts:95-121 — unknown stream -> empty
        out = resend.request_last(golden_df, "nope", 0, 5).collect()
        assert out == []

    def test_zero_and_negative_count(self, golden_df, golden_messages):
        sid, _ = golden_messages
        assert resend.request_last(golden_df, sid, 10, 0).collect() == []
        assert resend.request_last(golden_df, sid, 10, -1).collect() == []

    def test_clamp_at_max(self, golden_df, golden_messages):
        # MAX_RESEND_LAST clamp — Storage.ts:18,102-105
        sid, _ = golden_messages
        out = resend.request_last(golden_df, sid, 10, 1_000_000).collect()
        assert len(out) == 9


class TestRequestFrom:
    def test_from_timestamp(self, golden_df, golden_messages):
        # Storage.test.ts:207-229 — everything at/after ts=2500
        sid, _ = golden_messages
        out = resend.request_from(golden_df, sid, 10, 2500).collect()
        assert ids(out) == [
            (2500, 0, "publisher2", "2"),
            (3000, 0, "publisher1", "1"),
            (3000, 1, "publisher2", "1"),
            (3000, 2, "publisher3", "1"),
            (3000, 3, "publisher1", "4"),
            (4000, 0, "publisher3", "1"),
        ]

    def test_from_with_sequence_boundary(self, golden_df, golden_messages):
        # composite (ts=f & seq>=fs) | ts>f — Storage.ts:295-298
        sid, _ = golden_messages
        out = resend.request_from(golden_df, sid, 10, 3000, 2).collect()
        assert ids(out) == [
            (3000, 2, "publisher3", "1"),
            (3000, 3, "publisher1", "4"),
            (4000, 0, "publisher3", "1"),
        ]

    def test_from_with_publisher_filter(self, golden_df, golden_messages):
        # Storage.test.ts:217-229 — narrow to publisher1 / chain "1"
        sid, _ = golden_messages
        out = resend.request_from(
            golden_df, sid, 10, 0, 0, publisher_id="publisher1", msg_chain_id="1"
        ).collect()
        assert ids(out) == [(0, 0, "publisher1", "1"), (3000, 0, "publisher1", "1")]


class TestRequestRange:
    def test_range_inclusive(self, golden_df, golden_messages):
        # Storage.test.ts:234-257
        sid, _ = golden_messages
        out = resend.request_range(golden_df, sid, 10, 1000, 0, 3000, 1).collect()
        assert ids(out) == [
            (1000, 0, "publisher2", "1"),
            (2000, 0, "publisher3", "1"),
            (2500, 0, "publisher2", "2"),
            (3000, 0, "publisher1", "1"),
            (3000, 1, "publisher2", "1"),
        ]

    def test_range_sequence_boundaries_both_ends(self, golden_df, golden_messages):
        sid, _ = golden_messages
        out = resend.request_range(golden_df, sid, 10, 3000, 1, 3000, 2).collect()
        assert ids(out) == [(3000, 1, "publisher2", "1"), (3000, 2, "publisher3", "1")]

    def test_range_with_publisher(self, golden_df, golden_messages):
        # Storage.test.ts:259-292 — publisher+chain narrowed range
        sid, _ = golden_messages
        out = resend.request_range(
            golden_df, sid, 10, 0, 0, 4000, 0, publisher_id="publisher3", msg_chain_id="1"
        ).collect()
        assert ids(out) == [
            (2000, 0, "publisher3", "1"),
            (3000, 2, "publisher3", "1"),
            (4000, 0, "publisher3", "1"),
        ]

    def test_wrong_partition_excluded(self, golden_df, golden_messages):
        sid, _ = golden_messages
        out = resend.request_range(golden_df, sid, 0, 0, 0, 10_000, 0).collect()
        assert out == []


class TestMultiBucket:
    def test_range_spans_buckets(self, spark):
        # Storage.test.ts:295-313 — messages across >= 3 buckets come back
        # complete and ordered; forced small buckets via bucket_ms=1000
        from broker_spark.schema import STREAM_MESSAGE_SCHEMA

        sid = "stream-multibucket"
        rows = [make_msg(sid, 0, ts, seq) for ts in range(0, 60_000, 1000) for seq in (0, 1)]
        df = spark.createDataFrame(rows, STREAM_MESSAGE_SCHEMA)
        out = resend.request_range(df, sid, 0, 0, 0, 60_000, 0, bucket_ms=1000).collect()
        assert len(out) == 120
        assert ids(out) == sorted(ids(out))

    def test_volume_1000_messages(self, spark):
        # Storage.test.ts:315-332 — 1000-message store+resend round trip
        import time

        from broker_spark.schema import STREAM_MESSAGE_SCHEMA

        sid = "stream-volume"
        rows = [make_msg(sid, 0, ts, 0) for ts in range(0, 100_000, 100)]
        df = spark.createDataFrame(rows, STREAM_MESSAGE_SCHEMA)
        t0 = time.time()
        last = resend.request_last(df, sid, 0, 10_000).collect()
        frm = resend.request_from(df, sid, 0, 0).collect()
        elapsed = time.time() - t0
        assert len(last) == 1000 and len(frm) == 1000
        assert elapsed < 60  # reference volume-test budget
