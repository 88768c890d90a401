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
