"""Round-10 operators: the default streaming-dedup entry point carries
the eviction contract (VERDICT r9 #4), the horizon constant is
interpolated into its oracles (ADVICE r9), and the trailing-horizon
threshold alerts give the last unbounded-key-space stateful op a
bounded sibling (VERDICT r9 #3)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from broker_spark.streaming import stateful

HOUR_MS = 3_600_000
BASE_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z


def _ts(hours: float) -> dt.datetime:
    return dt.datetime.fromtimestamp(
        (BASE_MS + hours * HOUR_MS) / 1000.0, tz=dt.timezone.utc
    ).replace(tzinfo=None)


TXT = "the quick brown fox jumps over the lazy dog again and again"


def _stage_batches(spark, tmp_path, batches, schema):
    """One parquet file per micro-batch with ascending mtimes."""
    import glob as glob_mod
    import os
    import shutil
    import time

    src = tmp_path / "src"
    src.mkdir(exist_ok=True)
    now = time.time()
    for i, rows in enumerate(batches):
        stage = str(tmp_path / f"stage{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(stage)
        part = glob_mod.glob(f"{stage}/part-*.parquet")[0]
        target = str(src / f"batch{i:02d}.parquet")
        shutil.move(part, target)
        t = now - (len(batches) - i) * 10
        os.utime(target, (t, t))
        shutil.rmtree(stage, ignore_errors=True)
    return str(src)


def _replay(spark, tmp_path, df):
    q = (
        df.writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "replay did not terminate"
    return spark.read.parquet(str(tmp_path / "sink")), q


class TestDefaultEntryPointIsHorizon:
    """VERDICT r9 #4: the zero-config streaming-dedup name must carry the
    eviction contract; unbounded lifetime state is an explicit opt-in."""

    BATCHES = [
        [(1, TXT, _ts(0)), (2, TXT, _ts(1))],
        [(3, TXT, _ts(400))],  # 399 h gap > the 168 h default horizon
        [(4, TXT, _ts(401))],
    ]

    def test_default_name_applies_the_horizon(self, spark, tmp_path):
        src_dir = _stage_batches(
            spark, tmp_path, self.BATCHES, "doc_id long, text string, ts timestamp"
        )
        stream = (
            spark.readStream.schema("doc_id long, text string, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        out, _ = _replay(spark, tmp_path, stateful.streaming_lsh_candidates(stream))
        by_doc = {}
        for r in out.collect():
            by_doc.setdefault(r["doc_id"], set()).add(r["dup_of"])
        assert by_doc.get(2) == {1}
        # the unqualified name FORGETS claims beyond the horizon: doc 3
        # re-claims (no row), doc 4 matches the new claimer — the
        # NoTimeout form would have matched both against doc 1
        assert 3 not in by_doc
        assert by_doc.get(4) == {3}

    def test_backfill_name_never_forgets(self, spark, tmp_path):
        rows = [(d, t) for batch in self.BATCHES for (d, t, _ts_) in batch]
        src_dir = _stage_batches(
            spark,
            tmp_path,
            [[r] for r in rows],  # one doc per micro-batch, same order
            "doc_id long, text string",
        )
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        out, _ = _replay(
            spark, tmp_path, stateful.streaming_lsh_candidates_backfill(stream)
        )
        by_doc = {}
        for r in out.collect():
            by_doc.setdefault(r["doc_id"], set()).add(r["dup_of"])
        # lifetime index: every later twin matches the FIRST claimer ever
        assert by_doc.get(2) == {1}
        assert by_doc.get(3) == {1}
        assert by_doc.get(4) == {1}

    def test_timeout_branch_yields_nothing(self):
        """ADVICE r9: the hasTimedOut branch must not yield an empty
        dict-built frame (default float64/object dtypes would fight the
        declared long/string output schema) — it removes state and
        yields NOTHING."""

        class FakeState:
            hasTimedOut = True
            exists = False
            removed = False

            def remove(self):
                self.removed = True

        st = FakeState()
        fn = stateful._band_dedup_horizon_func(HOUR_MS)
        out = list(fn((0, "k"), iter([]), st))
        assert out == []
        assert st.removed


def _replay_alerts(spark, tmp_path, batches, threshold, horizon_ms, delay="0 seconds"):
    src_dir = _stage_batches(spark, tmp_path, batches, "key long, ts timestamp")
    stream = (
        spark.readStream.schema("key long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    out, q = _replay(
        spark,
        tmp_path,
        stateful.streaming_threshold_alerts_horizon(
            stream, threshold=threshold, horizon_ms=horizon_ms, watermark_delay=delay
        ),
    )
    return sorted((r["key"], r["crossed_ms"]) for r in out.collect()), q


class TestAlertsHorizon:
    """VERDICT r9 #3: the trailing-horizon threshold alerts — session
    semantics, fire-once, the late-data contract, and state eviction."""

    def test_fires_once_per_session_and_forgets_across_gaps(self, spark, tmp_path):
        horizon = 24 * HOUR_MS
        batches = [
            # session 1: three events inside the horizon -> alert at the
            # third event's time; the fourth must NOT re-fire
            [(1, _ts(0)), (1, _ts(1)), (1, _ts(2)), (1, _ts(3))],
            # 997 h gap > 24 h: the count is FORGOTTEN (two events are
            # not enough to fire in the new session)
            [(1, _ts(1000)), (1, _ts(1001))],
            # another gap, a full session again -> second alert
            [(1, _ts(2000)), (1, _ts(2001)), (1, _ts(2002))],
            # a key that never reaches the threshold emits nothing
            [(2, _ts(2000)), (2, _ts(2001))],
        ]
        got, _ = _replay_alerts(spark, tmp_path, batches, 3, horizon)
        assert got == [
            (1, BASE_MS + 2 * HOUR_MS),
            (1, BASE_MS + 2002 * HOUR_MS),
        ]

    def test_lifetime_form_would_differ(self, spark, tmp_path):
        """The same schedule through the NoTimeout lifetime op fires on
        the 5th event ever — the horizon form's second-session alert is a
        genuinely different (and bounded-state) question."""
        horizon = 24 * HOUR_MS
        batches = [
            [(1, _ts(0)), (1, _ts(1))],
            [(1, _ts(1000)), (1, _ts(1001))],
            [(1, _ts(2000))],
        ]
        got, _ = _replay_alerts(spark, tmp_path, batches, 3, horizon)
        assert got == []  # no session ever holds 3 events

    def test_late_row_joins_current_session(self, spark, tmp_path):
        """The late-data contract: an event admitted behind the running
        max (non-positive gap) increments the CURRENT session — here it
        is the crossing event, so the alert carries the LATE event's
        time."""
        horizon = 24 * HOUR_MS
        batches = [
            [(1, _ts(0)), (1, _ts(10))],
            [(1, _ts(5))],  # late: behind the running max 10 h
        ]
        got, _ = _replay_alerts(
            spark, tmp_path, batches, 3, horizon, delay="100 hours"
        )
        assert got == [(1, BASE_MS + 5 * HOUR_MS)]

    def test_expired_key_state_rows_are_gone(self, spark, tmp_path):
        """VERDICT r9 #3 'done' condition: keys idle past the horizon are
        REMOVED from the state store — numRowsRemoved fires mid-replay
        and the final store holds fewer rows than keys-ever (what the
        NoTimeout form would retain)."""
        horizon = 24 * HOUR_MS
        # 8 keys, each alive in its own 1000 h epoch: every earlier
        # key's state expires as later batches advance the watermark
        batches = [
            [(k, _ts(k * 1000)), (k, _ts(k * 1000 + 1))] for k in range(8)
        ]
        got, q = _replay_alerts(spark, tmp_path, batches, 2, horizon)
        # semantics unaffected by eviction: every key's second event fires
        assert [k for k, _ in got] == list(range(8))
        removed, final_total = 0, None
        for p in q.recentProgress:
            for so in p["stateOperators"] or []:
                removed += so["numRowsRemoved"] or 0
                if so["numRowsTotal"] is not None:
                    final_total = so["numRowsTotal"]
        assert removed > 0, "no state rows were ever evicted"
        assert final_total is not None and final_total < 8

    def test_timeout_branch_yields_nothing(self):
        class FakeState:
            hasTimedOut = True
            exists = False
            removed = False

            def remove(self):
                self.removed = True

        st = FakeState()
        fn = stateful._threshold_horizon_func(3, HOUR_MS)
        out = list(fn((7,), iter([]), st))
        assert out == []
        assert st.removed

    def test_certificate_constants_are_interpolated(self):
        """The 12 h horizon / threshold 8 pins appear in BOTH certificate
        oracles via interpolation from the module constants."""
        from broker_spark.plans import catalog

        for name in (
            "streaming_alerts_replay_horizon",
            "streaming_alerts_replay_horizon_shuffled",
        ):
            sql = catalog.CATALOG[name].sql
            assert f"> {catalog._ALERT_HORIZON_MS}" in sql
            assert f"{catalog._ALERT_HORIZON_THRESHOLD}" in sql


class TestHorizonConstantSync:
    def test_oracles_interpolate_the_default_horizon(self):
        """ADVICE r9 (mirrors TestGuardConstantSync): the dedup horizon
        is ONE constant — both horizon oracles must render it from
        stateful.DEFAULT_DEDUP_HORIZON_MS, so changing the constant
        re-renders the SQL in lockstep with the engine."""
        from broker_spark.plans.catalog import CATALOG

        hours = stateful.DEFAULT_DEDUP_HORIZON_MS // HOUR_MS
        sql_inorder = CATALOG["streaming_lsh_replay_horizon"].sql
        assert f"> {hours}" in sql_inorder
        sql_shuffled = CATALOG["streaming_lsh_replay_horizon_shuffled"].sql
        assert f"> {stateful.DEFAULT_DEDUP_HORIZON_MS}" in sql_shuffled


class TestPrefixFilterCoPartition:
    """Round-10 second pass: the blanket AQE initialPartitionNum bump is
    gone (it cost ~9% across the small-scale headline); the 100x SMJ
    sort-buffer protection lives in the operator as corpus-scaled
    co-partitioning, active only above the broadcast bound."""

    TEXTS = [
        "the quick brown fox jumps over the lazy dog tonight",
        "the quick brown fox jumps over the lazy cat tonight",
        "a completely different sentence with other words entirely here",
        "the quick brown fox jumps over the lazy dog tonight",
        "numbers one two three four five six seven eight nine",
        "pack my box with five dozen liquor jugs right now",
        "pack my box with five dozen liquor jugs right here",
    ]

    def test_big_path_equals_small_path(self, spark):
        """Partitioning must never change the answer: forcing the
        shuffle path (broadcast_below_docs=0, merge hints + explicit
        co-partitioning) returns exactly the small path's pairs."""
        from broker_spark.pipeline import dedup

        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(self.TEXTS)],
            "doc_id long, text string",
        )
        for t in (0.3, 0.7):
            small = {
                (r["doc_a"], r["doc_b"], r["common"], r["jaccard"])
                for r in dedup.prefix_filter_jaccard_pairs(docs, threshold=t).collect()
            }
            big = {
                (r["doc_a"], r["doc_b"], r["common"], r["jaccard"])
                for r in dedup.prefix_filter_jaccard_pairs(
                    docs, threshold=t, broadcast_below_docs=0
                ).collect()
            }
            assert small == big and small

    def test_session_has_no_global_initial_partition_override(self, spark):
        """The regression guard for the r10 bench finding: no blanket
        initialPartitionNum in the session factory — the default (unset,
        = shuffle.partitions) keeps small-scale exchanges cheap."""
        got = spark.conf.get(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum", None
        )
        assert got is None
