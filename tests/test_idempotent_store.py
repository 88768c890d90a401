"""Primary-key write semantics: re-publishing a message id must be a
no-op (Cassandra INSERT upsert parity), batch and streaming."""

from __future__ import annotations

import datetime as dt

from broker_spark.storage.store import Storage
from tests.conftest import make_msg

ENVELOPE = (
    "stream_id string, partition int, ts timestamp, sequence_no int, "
    "publisher_id string, msg_chain_id string, prev_ts timestamp, "
    "prev_sequence_no int, signature_type int, signature string, "
    "encryption_type int, content string"
)


def test_store_idempotent_skips_existing_ids(spark, tmp_path):
    st = Storage(spark, str(tmp_path / "log"), bucket_ms=1000)
    batch1 = [make_msg("s", 0, 1000 + i, 0) for i in range(5)]
    st.store_idempotent(spark.createDataFrame(batch1, ENVELOPE))
    assert st.request_last("s", 0, 100).count() == 5

    # overlap: 3 replays + 2 new
    batch2 = [make_msg("s", 0, 1002 + i, 0) for i in range(5)]
    st.store_idempotent(spark.createDataFrame(batch2, ENVELOPE))
    assert st.request_last("s", 0, 100).count() == 7

    # full replay -> no-op
    st.store_idempotent(spark.createDataFrame(batch1, ENVELOPE))
    assert st.request_last("s", 0, 100).count() == 7


def test_store_idempotent_dedups_within_batch(spark, tmp_path):
    st = Storage(spark, str(tmp_path / "log2"), bucket_ms=1000)
    rows = [make_msg("s", 0, 1000, 0)] * 3 + [make_msg("s", 0, 2000, 0)]
    st.store_idempotent(spark.createDataFrame(rows, ENVELOPE))
    assert st.request_last("s", 0, 100).count() == 2


def test_store_idempotent_only_reads_touched_buckets(spark, tmp_path):
    """The dedup read must prune to the buckets being written."""
    st = Storage(spark, str(tmp_path / "log3"), bucket_ms=1000)
    st.store(spark.createDataFrame(
        [make_msg("s", 0, b * 1000 + 1, 0) for b in range(20)], ENVELOPE
    ))
    incoming = spark.createDataFrame([make_msg("s", 0, 5001, 0),  # replay, bucket 5
                                      make_msg("s", 0, 5002, 0)], ENVELOPE)
    st.store_idempotent(incoming)
    assert st.request_last("s", 0, 100).count() == 21


def test_streaming_dedup_watermark(spark, tmp_path):
    from broker_spark.streaming import ingest

    src, log, ckpt = str(tmp_path / "src"), str(tmp_path / "slog"), str(tmp_path / "ckpt")
    now = int(dt.datetime.now(dt.timezone.utc).timestamp() * 1000)
    rows = [make_msg("s", 0, now - 5000 + i, 0) for i in range(10)]
    dup_rows = rows + rows[:4]  # 4 duplicates in the same batch
    spark.createDataFrame(dup_rows, ENVELOPE).write.mode("append").parquet(src)
    q = ingest.start_ingest(
        spark.readStream.schema(ENVELOPE).parquet(src), log, ckpt,
        trigger_available_now=True, dedup_watermark="10 minutes",
    )
    q.awaitTermination(120)
    assert spark.read.parquet(log).count() == 10
