"""Round-11 operators and invariants: the default threshold-alert entry
point carries the eviction contract (VERDICT r10 #2), the table-load memo
invariant is pinned by tests (VERDICT r10 #5 + ADVICE r10), the
caller-supplied minhash signature frame is validated eagerly (ADVICE r10),
and the prefix-filter family gains a bounded interactive twin
(VERDICT r10 #3)."""

from __future__ import annotations

import datetime as dt
import glob
import os

import pytest
from pyspark.sql import functions as F

from broker_spark.streaming import stateful

HOUR_MS = 3_600_000
BASE_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z

SF_SMALL = "/root/testdata/sf0.001"


def _ts(hours: float) -> dt.datetime:
    return dt.datetime.fromtimestamp(
        (BASE_MS + hours * HOUR_MS) / 1000.0, tz=dt.timezone.utc
    ).replace(tzinfo=None)


# ---------------------------------------------------------------------------
# VERDICT r10 #5 + ADVICE r10: the table-load memo
# ---------------------------------------------------------------------------


class TestLoadMemoInvariants:
    """`tables.load` memoizes resolved DataFrames — safe ONLY because every
    caller reads the immutable driver testdata.  These tests turn the
    comment into a machine-checked invariant."""

    def test_memo_lives_on_the_session_object(self, spark):
        """ADVICE r10: a module-level WeakKeyDictionary never evicts
        (cached DataFrames hold their session, and a value that refers to
        its key pins the entry).  The memo must be an ordinary attribute
        on the session — session -> dict -> DataFrame -> session is then a
        collectable cycle."""
        from broker_spark import tables

        assert not hasattr(tables, "_LOAD_MEMO")
        a = tables.load(spark, SF_SMALL, "region")
        b = tables.load(spark, SF_SMALL, "region")
        assert a is b, "memo must return the SAME resolved DataFrame"
        memo = spark.__dict__.get(tables._MEMO_ATTR)
        assert isinstance(memo, dict) and memo, "memo dict not on the session"
        # no module-global container holds DataFrames keyed by session
        module_state = [
            v
            for k, v in vars(tables).items()
            if isinstance(v, dict) and not k.startswith("__")
        ]
        assert module_state == [], "tables.py must hold no module-level caches"

    def test_mutable_path_readers_never_route_through_the_memo(self):
        """VERDICT r10 #5: the partitioned-log readers (storage/store.py,
        the streaming sinks/maintenance jobs) re-list their directories on
        every read — a memoized relation would serve stale file indexes
        after an append.  Pin it statically: those modules must not
        reference tables.load at all.  (storage/bucketed.py is exempt by
        design: it loads the IMMUTABLE sf_dir tables to write bucketed
        copies.)"""
        import broker_spark

        pkg = os.path.dirname(broker_spark.__file__)
        mutable_modules = [os.path.join(pkg, "storage", "store.py")] + sorted(
            glob.glob(os.path.join(pkg, "streaming", "*.py"))
        )
        assert mutable_modules
        import ast

        def imports_tables(path: str) -> bool:
            """True if the module imports broker_spark.tables under ANY
            spelling: absolute, relative (from ..tables import load),
            aliased, or via `from broker_spark import tables` — an AST
            walk, so string tricks can't evade the pin."""
            tree = ast.parse(open(path).read())
            for node in ast.walk(tree):
                if isinstance(node, ast.Import):
                    if any(a.name.startswith("broker_spark.tables") for a in node.names):
                        return True
                elif isinstance(node, ast.ImportFrom):
                    mod = node.module or ""
                    if mod == "broker_spark.tables" or (
                        node.level > 0 and mod.split(".")[-1] == "tables"
                    ):
                        return True
                    if mod == "broker_spark" and any(
                        a.name == "tables" for a in node.names
                    ):
                        return True
            return False

        offenders = [p for p in mutable_modules if imports_tables(p)]
        assert offenders == [], f"mutable-path modules import tables: {offenders}"

    def test_store_reads_see_appends_immediately(self, spark, tmp_path):
        """Runtime form of the same invariant: a Storage append is visible
        to the very next read — impossible if the log reader memoized its
        resolved file index."""
        from broker_spark.schema import STREAM_MESSAGE_SCHEMA
        from broker_spark.storage.store import Storage

        from tests.conftest import make_msg

        st = Storage(spark, str(tmp_path / "log"))
        st.store(
            spark.createDataFrame(
                [make_msg("s1", 0, ts=1000)], STREAM_MESSAGE_SCHEMA
            )
        )
        assert st.request_last("s1", 0, 10).count() == 1
        st.store(
            spark.createDataFrame(
                [make_msg("s1", 0, ts=2000)], STREAM_MESSAGE_SCHEMA
            )
        )
        assert st.request_last("s1", 0, 10).count() == 2


# ---------------------------------------------------------------------------
# ADVICE r10: caller-supplied minhash signature validation
# ---------------------------------------------------------------------------


class TestMinhashSigValidation:
    def test_mismatched_sig_fails_eagerly_with_a_clear_message(self, spark):
        from broker_spark.pipeline import dedup

        docs = spark.createDataFrame(
            [(1, "a b c d e f"), (2, "a b c d e f")], "doc_id long, text string"
        )
        sig2 = dedup.minhash_signatures(docs, num_hashes=2)
        with pytest.raises(ValueError, match="num_hashes=4 requires exactly"):
            dedup.minhash_lsh_pairs(docs, num_hashes=4, sig=sig2)
        # a WIDER sig is just as wrong: silently banding over a subset
        # would under-generate candidates
        sig4 = dedup.minhash_signatures(docs, num_hashes=4)
        with pytest.raises(ValueError, match="num_hashes=2 requires exactly"):
            dedup.minhash_lsh_pairs(docs, num_hashes=2, sig=sig4)

    def test_matching_sig_equals_default_path(self, spark):
        from broker_spark.pipeline import dedup

        docs = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog tonight"),
                (2, "the quick brown fox jumps over the lazy dog tonight"),
                (3, "a completely different sentence with other words here"),
            ],
            "doc_id long, text string",
        )
        sig = dedup.minhash_signatures(docs, num_hashes=4)
        via_sig = {
            (r["doc_a"], r["doc_b"])
            for r in dedup.minhash_lsh_pairs(docs, num_hashes=4, sig=sig).collect()
        }
        default = {
            (r["doc_a"], r["doc_b"])
            for r in dedup.minhash_lsh_pairs(docs, num_hashes=4).collect()
        }
        assert via_sig == default == {(1, 2)}


# ---------------------------------------------------------------------------
# VERDICT r10 #2: the default threshold-alert entry point is the horizon form
# ---------------------------------------------------------------------------


def _stage_batches(spark, tmp_path, batches, schema):
    """One parquet file per micro-batch with ascending mtimes."""
    import shutil
    import time

    src = tmp_path / "src"
    src.mkdir(exist_ok=True)
    now = time.time()
    for i, rows in enumerate(batches):
        stage = str(tmp_path / f"stage{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(stage)
        part = glob.glob(f"{stage}/part-*.parquet")[0]
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


class TestDefaultAlertEntryPointIsHorizon:
    """VERDICT r10 #2 (the round-10 default-entry doctrine applied to
    threshold alerts): the zero-config name must carry the eviction
    contract; lifetime counting is an explicit opt-in."""

    # key 1: two events, then a 1000 h gap (> the 7-day default horizon),
    # then two more — the horizon form forgets the first session's count,
    # the lifetime form would fire at the 3rd event ever
    BATCHES = [
        [(1, _ts(0)), (1, _ts(1))],
        [(1, _ts(1200)), (1, _ts(1201))],
    ]

    def test_default_name_applies_the_horizon(self, spark, tmp_path):
        src_dir = _stage_batches(
            spark, tmp_path, self.BATCHES, "key long, ts timestamp"
        )
        stream = (
            spark.readStream.schema("key long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        out, _ = _replay(
            spark, tmp_path, stateful.streaming_threshold_alerts(stream, threshold=3)
        )
        # no trailing-horizon session ever holds 3 events -> no alert
        assert out.count() == 0

    def test_default_name_has_event_time_timeout(self, spark, tmp_path):
        """The 'done' condition verbatim: the default path registers
        EventTimeTimeout eviction — expired keys' state rows are GONE."""
        batches = [[(k, _ts(k * 1000)), (k, _ts(k * 1000 + 1))] for k in range(4)]
        src_dir = _stage_batches(spark, tmp_path, batches, "key long, ts timestamp")
        stream = (
            spark.readStream.schema("key long, ts timestamp")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        out, q = _replay(
            spark, tmp_path, stateful.streaming_threshold_alerts(stream, threshold=2)
        )
        assert sorted(r["key"] for r in out.collect()) == list(range(4))
        removed = 0
        final_total = None
        for p in q.recentProgress:
            for so in p["stateOperators"] or []:
                removed += so["numRowsRemoved"] or 0
                if so["numRowsTotal"] is not None:
                    final_total = so["numRowsTotal"]
        assert removed > 0, "default entry point never evicted state"
        assert final_total is not None and final_total < 4

    def test_lifetime_name_never_forgets(self, spark, tmp_path):
        rows = [(k, ) for batch in self.BATCHES for (k, _t) in batch]
        src_dir = _stage_batches(spark, tmp_path, [[r] for r in rows], "key long")
        stream = (
            spark.readStream.schema("key long")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
        )
        out, _ = _replay(
            spark,
            tmp_path,
            stateful.streaming_threshold_alerts_lifetime(stream, threshold=3),
        )
        got = [(r["key"], r["total"]) for r in out.collect()]
        assert got == [(1, 3)]  # fires at the 3rd event EVER, gap or not


# ---------------------------------------------------------------------------
# VERDICT r10 #3: the prefix-filter join's bounded interactive twin
# ---------------------------------------------------------------------------


class TestPrefixFilterGuards:
    TEXTS = [
        "the quick brown fox jumps over the lazy dog tonight",
        "the quick brown fox jumps over the lazy cat tonight",
        "the quick brown fox jumps over the lazy dog today ok",
        "a completely different sentence with other words entirely here",
        "pack my box with five dozen liquor jugs right now",
        "pack my box with five dozen liquor jugs right here",
    ]

    def _docs(self, spark, texts=None):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts or self.TEXTS)],
            "doc_id long, text string",
        )

    def test_wide_caps_equal_the_exact_form(self, spark):
        from broker_spark.pipeline import dedup

        docs = self._docs(spark)
        key = lambda r: (r["doc_a"], r["doc_b"], r["common"], r["jaccard"])  # noqa: E731
        exact = {
            key(r)
            for r in dedup.prefix_filter_jaccard_pairs(docs, threshold=0.3).collect()
        }
        capped = {
            key(r)
            for r in dedup.prefix_filter_jaccard_pairs(
                docs,
                threshold=0.3,
                max_candidates_per_doc=10_000,
                max_posting_size=10_000,
            ).collect()
        }
        assert capped == exact and exact

    def test_topk_bounds_verified_candidates_per_anchor(self, spark):
        """With K=1 each anchor keeps only its single best size-bound
        candidate — output is a subset of the exact pairs and no anchor
        appears more than once."""
        from broker_spark.pipeline import dedup

        docs = self._docs(spark)
        exact = {
            (r["doc_a"], r["doc_b"])
            for r in dedup.prefix_filter_jaccard_pairs(docs, threshold=0.3).collect()
        }
        capped = dedup.prefix_filter_jaccard_pairs(
            docs, threshold=0.3, max_candidates_per_doc=1
        ).collect()
        pairs = {(r["doc_a"], r["doc_b"]) for r in capped}
        assert pairs <= exact
        anchors = [r["doc_a"] for r in capped]
        assert len(anchors) == len(set(anchors))

    def test_posting_cap_drops_verbatim_clone_families(self, spark):
        """The stop-bucket semantics: a clone family wider than the cap
        shares every prefix token, so all its postings go hot and the
        family yields NO candidates — verbatim duplication is
        exact_dedup_groups' job.  Organic near-dups below the cap
        survive."""
        from broker_spark.pipeline import dedup

        clones = ["copy of this exact sentence repeated verbatim each time"] * 5
        organic = [
            "one organic near duplicate sentence with shared words inside",
            "one organic near duplicate sentence with shared words outside",
        ]
        docs = self._docs(spark, clones + organic)
        got = dedup.prefix_filter_jaccard_pairs(
            docs, threshold=0.3, max_posting_size=2
        ).collect()
        pairs = {(r["doc_a"], r["doc_b"]) for r in got}
        assert pairs == {(5, 6)}  # the organic pair; no clone-family pairs
        # without the cap the 5-clone family contributes C(5,2) = 10 pairs
        exact = dedup.prefix_filter_jaccard_pairs(docs, threshold=0.3).collect()
        assert {(r["doc_a"], r["doc_b"]) for r in exact} >= {
            (a, b) for a in range(5) for b in range(a + 1, 5)
        }

    def test_incremental_form_is_lossless_vs_brute_force(self, spark):
        """The cross-side prefix join must find exactly the pairs a full
        new x corpus comparison finds at the threshold (the pairwise
        prefix lemma under one shared df order)."""
        from broker_spark.pipeline import dedup

        texts = self.TEXTS + [
            "the quick brown fox jumps over the lazy dog toniiight",
            "pack my box with five dozen liquor jugs right now ok",
        ]
        docs = self._docs(spark, texts)
        new = docs.filter(F.col("doc_id") % 3 == 0)
        corp = docs.filter(F.col("doc_id") % 3 != 0)
        got = {
            (r["new_doc_id"], r["corpus_doc_id"], r["common"], r["jaccard"])
            for r in dedup.prefix_filter_jaccard_pairs_between(
                new, corp, threshold=0.3
            ).collect()
        }
        # brute force: shingle sets in python
        rows = {r["doc_id"]: r["text"] for r in docs.collect()}

        def sh(t):
            w = t.split(" ")
            return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

        want = set()
        for a in rows:
            if a % 3 != 0:
                continue
            for b in rows:
                if b % 3 == 0 or a == b:
                    continue
                sa, sb = sh(rows[a]), sh(rows[b])
                common = len(sa & sb)
                if common == 0:
                    continue
                j = round(common / (len(sa) + len(sb) - common), 6)
                if j >= 0.3:
                    want.add((a, b, common, j))
        assert got == want and want

    def test_incremental_big_path_equals_small_path(self, spark):
        """Partitioning must never change the answer: forcing the merge-
        hinted co-partitioned path (broadcast_below_docs=0) returns
        exactly the broadcast path's pairs."""
        from broker_spark.pipeline import dedup

        texts = self.TEXTS + [
            "the quick brown fox jumps over the lazy dog toniiight",
            "pack my box with five dozen liquor jugs right now ok",
        ]
        docs = self._docs(spark, texts)
        new = docs.filter(F.col("doc_id") % 3 == 0)
        corp = docs.filter(F.col("doc_id") % 3 != 0)
        key = lambda r: (  # noqa: E731
            r["new_doc_id"], r["corpus_doc_id"], r["common"], r["jaccard"]
        )
        small = {
            key(r)
            for r in dedup.prefix_filter_jaccard_pairs_between(
                new, corp, threshold=0.3
            ).collect()
        }
        big = {
            key(r)
            for r in dedup.prefix_filter_jaccard_pairs_between(
                new, corp, threshold=0.3, broadcast_below_docs=0
            ).collect()
        }
        assert small == big and small

    def test_incremental_posting_cap_drops_hot_corpus_tokens(self, spark):
        from broker_spark.pipeline import dedup

        clone = "copy of this exact sentence repeated verbatim each time"
        corp = self._docs(spark, [clone] * 6)
        new = spark.createDataFrame([(100, clone)], "doc_id long, text string")
        exact = dedup.prefix_filter_jaccard_pairs_between(
            new, corp, threshold=0.5
        ).count()
        capped = dedup.prefix_filter_jaccard_pairs_between(
            new, corp, threshold=0.5, max_posting_size=2
        ).count()
        assert exact == 6 and capped == 0

    def test_guard_constants_are_interpolated(self):
        """The certificate pins (threshold, posting cap, top-K) appear in
        the oracle SQL via interpolation from the module constants."""
        from broker_spark.plans import catalog

        sql = catalog.CATALOG["dedup_prefix_filter_pairs_guarded"].sql
        assert f"> {catalog._PREFIX_GUARD_POSTING}" in sql
        assert f"rn <= {catalog._PREFIX_GUARD_TOPK}" in sql
        assert f"{catalog._PREFIX_GUARD_T} * greatest" in sql
