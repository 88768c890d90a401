"""Round-4 additions (second batch): BM25 retrieval ranking, passage-level
exact dedup, the linear quality classifier, and temperature mixing."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from broker_spark.pipeline import text

# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------


def _docs(spark, texts: list[str]):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_bm25_more_matching_terms_scores_higher(spark):
    docs = _docs(
        spark,
        [
            "spark join order filler filler",   # all three q1 terms
            "spark join filler filler filler",  # two
            "spark filler filler filler filler",  # one
            "filler filler filler filler filler",  # none
        ],
    )
    out = text.bm25_topk(docs, queries=[("q1", ["spark", "join", "order"])], k=10)
    rows = {r["doc_id"]: (r["score"], r["rank"]) for r in out.collect()}
    assert set(rows) == {0, 1, 2}  # no-match doc absent
    assert rows[0][0] > rows[1][0] > rows[2][0]
    assert [rows[i][1] for i in (0, 1, 2)] == [1, 2, 3]


def test_bm25_rare_term_outweighs_common_term(spark):
    # 'rare' appears in 1 of 6 docs, 'common' in 5 of 6: idf(rare) >> idf(common)
    docs = _docs(
        spark,
        [
            "rare pad pad pad",
            "common pad pad pad",
            "common x y z",
            "common a b c",
            "common d e f",
            "common g h i",
        ],
    )
    out = text.bm25_topk(docs, queries=[("q", ["rare", "common"])], k=10).collect()
    by_rank = sorted(out, key=lambda r: r["rank"])
    assert by_rank[0]["doc_id"] == 0  # the rare-term doc wins


def test_bm25_length_normalization_prefers_short_docs(spark):
    # same tf for the term, but the longer doc is penalized via dl/avgdl
    docs = _docs(spark, ["hit one two", "hit " + "pad " * 40 + "end"])
    out = {r["doc_id"]: r["score"] for r in
           text.bm25_topk(docs, queries=[("q", ["hit"])]).collect()}
    assert out[0] > out[1]


# ---------------------------------------------------------------------------
# passage dedup
# ---------------------------------------------------------------------------


def _passage(tag: str) -> str:
    # one exact 8-word passage
    return " ".join(f"{tag}{i}" for i in range(8))


def test_passage_dedup_first_occurrence_wins(spark):
    p1, p2, p3 = _passage("a"), _passage("b"), _passage("c")
    docs = _docs(spark, [f"{p1} {p2}", f"{p1} {p3}"])
    rows = {r["doc_id"]: r for r in text.passage_dedup_stats(docs).collect()}
    assert rows[0]["n_dup_passages"] == 0  # doc 0 holds the first occurrences
    assert rows[1]["n_dup_passages"] == 1 and rows[1]["n_passages"] == 2
    assert rows[1]["dup_ratio"] == 0.5 and bool(rows[1]["keep"])


def test_passage_dedup_internal_repeat_counts(spark):
    p = _passage("x")
    docs = _docs(spark, [f"{p} {p} {p}"])
    r = text.passage_dedup_stats(docs).collect()[0]
    assert r["n_passages"] == 3 and r["n_dup_passages"] == 2
    assert not bool(r["keep"])  # 2/3 > 0.5


def test_passage_dedup_tail_passage_is_shorter_but_counted(spark):
    docs = _docs(spark, ["w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"])  # 8 + 2 words
    r = text.passage_dedup_stats(docs).collect()[0]
    assert r["n_passages"] == 2 and r["n_dup_passages"] == 0


# ---------------------------------------------------------------------------
# linear quality classifier
# ---------------------------------------------------------------------------


def test_quality_classifier_orders_natural_above_gibberish(spark):
    natural = "the cat sat of the mat and the dog is in the house to stay"
    gibberish = "@@@@ #### !!!! %%%% ^^^^ &&&& **** (((( )))) $$$$"
    rows = {r["doc_id"]: r for r in
            text.quality_classifier_score(_docs(spark, [natural, gibberish])).collect()}
    assert rows[0]["quality_prob"] > rows[1]["quality_prob"]
    assert 0.0 < rows[1]["quality_prob"] < rows[0]["quality_prob"] < 1.0
    for r in rows.values():
        assert bool(r["keep"]) == (r["quality_prob"] >= 0.5)


def test_quality_classifier_matches_hand_computed_sigmoid(spark):
    doc = "the a of and to in is"  # 7 tokens, all stopwords, no punctuation
    r = text.quality_classifier_score(_docs(spark, [doc])).collect()[0]
    n_tokens, n_len = 7.0, float(len(doc))
    f_len = min(n_tokens / 100.0, 1.0)
    f_alpha = 1.0  # no punctuation
    f_stop = 1.0
    mean_wordlen = (n_len - (n_tokens - 1.0)) / n_tokens
    f_wordlen = min(mean_wordlen / 10.0, 1.0)
    logit = 1.2 * f_len + 0.8 * f_alpha + 1.5 * f_stop + -0.3 * f_wordlen + -1.0
    assert abs(r["quality_prob"] - 1.0 / (1.0 + math.exp(-logit))) < 1e-6


# ---------------------------------------------------------------------------
# temperature mixing
# ---------------------------------------------------------------------------


def _sourced(spark, sizes: dict[str, int]):
    rows = [
        (f"{s}-{i}", "tok " * 9 + "tok", s)
        for s, n in sizes.items()
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id string, text string, source string")


def test_temperature_shares_sum_to_one_and_upsample_small(spark):
    docs = _sourced(spark, {"big": 80, "small": 10, "tiny": 10})
    rows = {r["source"]: r for r in text.temperature_mix_allocation(docs).collect()}
    assert abs(sum(r["p_temp"] for r in rows.values()) - 1.0) < 1e-5
    assert rows["tiny"]["repeat_factor"] > 1.0  # low-resource upsampled
    assert rows["big"]["repeat_factor"] < 1.0  # head source downsampled
    # temperature flattens but preserves order
    assert rows["big"]["p_temp"] > rows["tiny"]["p_temp"]
    assert rows["big"]["p_temp"] < rows["big"]["p_nat"]


def test_temperature_alpha_one_is_natural_distribution(spark):
    docs = _sourced(spark, {"a": 30, "b": 10})
    rows = text.temperature_mix_allocation(docs, alpha=1.0).collect()
    for r in rows:
        assert abs(r["p_temp"] - r["p_nat"]) < 1e-6
        assert abs(r["repeat_factor"] - 1.0) < 1e-6


# ---------------------------------------------------------------------------
# native session_window streaming (availableNow replay protocol)
# ---------------------------------------------------------------------------


def test_streaming_user_sessions_two_run_flush(spark, tmp_path):
    """Two bursts > gap apart close as two sessions; the sentinel-advanced
    second run flushes them (a single run emits nothing in append mode)."""
    import datetime as dt

    from broker_spark.streaming import ingest as st_ingest

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    src, sink, ckpt = str(tmp_path / "in"), str(tmp_path / "sink"), str(tmp_path / "ck")
    rows = [(7, base + dt.timedelta(minutes=m)) for m in (0, 5, 10)]
    rows += [(7, base + dt.timedelta(minutes=m)) for m in (90, 95)]
    schema = "user_id long, ts timestamp"
    spark.createDataFrame(rows, schema).write.parquet(src)

    def run():
        q = (
            st_ingest.streaming_user_sessions(
                spark.readStream.schema(schema).parquet(src), gap="30 minutes"
            )
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run()
    # availableNow's final batch flushes sessions whose window end is below
    # the watermark (= max ts seen): session 1 (ends 12:40) flushes, but the
    # LAST session (ends max_ts + gap, always above the watermark) cannot —
    # that's what the sentinel run is for
    assert spark.read.parquet(sink).count() == 1
    spark.createDataFrame(
        [(-1, base + dt.timedelta(minutes=95 + 61))], schema
    ).write.mode("append").parquet(src)
    run()
    got = sorted(
        (r["session_start"], r["n_events"])
        for r in spark.read.parquet(sink).filter("user_id >= 0").collect()
    )
    assert [(s.minute, n) for s, n in got] == [(0, 3), (30, 2)]


# ---------------------------------------------------------------------------
# entropy stats + split leakage
# ---------------------------------------------------------------------------


def test_entropy_uniform_equals_log_vocab_and_repetition_is_zero(spark):
    uniform = "a b c d"            # 4 distinct, each p=1/4 -> ln(4)
    repeated = "x x x x x"         # single type -> entropy 0
    rows = {r["doc_id"]: r for r in
            text.doc_entropy_stats(_docs(spark, [uniform, repeated])).collect()}
    assert abs(rows[0]["word_entropy"] - math.log(4)) < 1e-6
    assert rows[0]["ttr"] == 1.0
    assert rows[1]["word_entropy"] == 0.0
    assert rows[1]["ttr"] == 0.2
    assert rows[0]["n_tokens"] == 4 and rows[0]["n_distinct"] == 4


def _split_of(doc_id: int) -> str:
    import hashlib

    b = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16)
    if b < text.SPLIT_TRAIN_MAX:
        return "train"
    if b < text.SPLIT_VAL_MAX:
        return "val"
    return "test"


def test_split_leakage_flags_cross_split_duplicates_only(spark):
    # pick one train id and one test id deterministically, plus two train ids
    train_ids = [i for i in range(200) if _split_of(i) == "train"]
    test_ids = [i for i in range(200) if _split_of(i) == "test"]
    a, b = train_ids[0], test_ids[0]       # same text, different splits -> leak
    c, d = train_ids[1], train_ids[2]      # same text, same split -> no leak
    docs = spark.createDataFrame(
        [(a, "dup words here"), (b, "words dup here"),   # same bag of words
         (c, "other thing"), (d, "thing other"),
         (train_ids[3], "unique text entirely")],
        "doc_id long, text string",
    )
    rows = text.split_leakage_audit(docs).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_docs"] == 2 and r["n_splits"] == 2
    assert r["splits"] == "test,train" and r["keeper_doc_id"] == min(a, b)


# ---------------------------------------------------------------------------
# curated mixture composition
# ---------------------------------------------------------------------------


def test_curated_mix_excludes_filtered_and_duplicate_docs(spark):
    """The composed manifest counts only docs passing BOTH filters with
    exact duplicates collapsed to one keeper."""
    from broker_spark.plans.catalog import CATALOG
    from tests.conftest import SF_SMALL

    out = {r["source"]: r for r in CATALOG["curated_mix_manifest"].fn(spark, SF_SMALL).collect()}
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    qc = {r["doc_id"] for r in text.quality_classifier_score(docs).collect() if r["keep"]}
    pd_ = {r["doc_id"] for r in text.passage_dedup_stats(docs).collect() if r["keep"]}
    rows = docs.select("doc_id", "text", "source").collect()
    surviving = [r for r in rows if r["doc_id"] in qc and r["doc_id"] in pd_]
    # exact dedup among survivors: keeper = min doc_id per text
    first: dict = {}
    for r in sorted(surviving, key=lambda r: r["doc_id"]):
        first.setdefault(r["text"], r["doc_id"])
    kept = [r for r in surviving if first[r["text"]] == r["doc_id"]]
    per_source: dict = {}
    for r in kept:
        per_source[r["source"]] = per_source.get(r["source"], 0) + 1
    assert {s: r["n_docs"] for s, r in out.items()} == per_source
    assert abs(sum(r["p_temp"] for r in out.values()) - 1.0) < 1e-4


# ---------------------------------------------------------------------------
# recall-vs-nprobe curve
# ---------------------------------------------------------------------------


def test_recall_curve_monotone_and_consistent(spark):
    from broker_spark.pipeline import ann
    from tests.conftest import SF_SMALL

    emb = spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
    rows = sorted(
        ann.recall_vs_nprobe(emb, n_clusters=10, nprobes=(1, 4, 10), k=5,
                             max_query_id=50).collect(),
        key=lambda r: r["nprobe"],
    )
    recalls = [r["recall"] for r in rows]
    assert recalls == sorted(recalls)  # more probes never hurt
    for r in rows:
        assert 0.0 <= r["recall"] <= 1.0
        assert r["n_agree"] == round(r["recall"] * r["n_queries"] * r["k"])
    # probing ALL 10 lists = exhaustive search = exact
    assert rows[-1]["nprobe"] == 10 and rows[-1]["recall"] == 1.0


# ---------------------------------------------------------------------------
# LSH S-curve
# ---------------------------------------------------------------------------


def test_lsh_s_curve_identical_docs_always_captured(spark):
    from broker_spark.pipeline import dedup

    base = " ".join(f"w{i}" for i in range(20))
    near = " ".join(f"w{i}" for i in range(19)) + " zz"     # high jaccard
    far = "a b c " + " ".join(f"q{i}" for i in range(17))   # tiny overlap w/ nothing
    docs = spark.createDataFrame(
        [(0, base), (1, base), (2, near), (3, far), (4, "x y z only three")],
        "doc_id long, text string",
    )
    rows = {r["decile"]: r for r in dedup.lsh_s_curve(docs).collect()}
    top = rows[max(rows)]  # the identical pair lands in the top decile
    assert top["candidate_rate"] == 1.0  # identical signatures share every band
    for r in rows.values():
        assert 0.0 <= r["candidate_rate"] <= 1.0
        mid = r["decile"] / 10.0 + 0.05
        assert abs(r["theory_mid_rate"] - (1 - (1 - mid**2) ** 2)) < 1e-6
        assert r["n_candidates"] <= r["n_pairs"]


# ---------------------------------------------------------------------------
# wordpiece encode
# ---------------------------------------------------------------------------


def test_wordpiece_greedy_longest_match_and_mass_conservation(spark):
    docs = _docs(spark, ["the scan scan", "window"])
    rows = {r["token"]: r for r in
            text.wordpiece_encode_counts(docs).collect()}
    # 'the' is a vocab piece: matched whole, not as t+h+e
    assert rows["the"]["n_occurrences"] == 1
    # 'scan' -> sc|an (both pieces present, longest-match from position 0)
    assert rows["sc"]["n_occurrences"] == 2 and rows["an"]["n_occurrences"] == 2
    # 'window' -> win|dow
    assert rows["win"]["n_occurrences"] == 1 and rows["dow"]["n_occurrences"] == 1
    # token character mass equals corpus character mass (no word loses chars)
    total_chars = sum(len(t) * r["n_occurrences"] for t, r in rows.items())
    assert total_chars == len("thescanscan") + len("window")


# ---------------------------------------------------------------------------
# sharded trailing window == global window
# ---------------------------------------------------------------------------


def test_sharded_trailing_window_stitches_day_boundary(spark):
    """Rows whose trailing hour spans a shard (day) boundary must see the
    previous day's tail — the exact case the helper copies exist for."""
    import datetime as dt

    from broker_spark.operators.rollup import sharded_trailing_window_stats

    day2 = dt.datetime(2024, 1, 2, 0, 0, 0)
    rows = [
        (1, day2 - dt.timedelta(minutes=50), 10.0),  # day 1, inside next row's window
        (2, day2 - dt.timedelta(minutes=10), 20.0),  # day 1 tail
        (3, day2 + dt.timedelta(minutes=5), 30.0),   # day 2: window spans boundary
        (4, day2 + dt.timedelta(minutes=70), 40.0),  # day 2: window excludes row 2
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    out = {r["event_id"]: r for r in sharded_trailing_window_stats(ev).collect()}
    assert len(out) == 4  # helper copies dropped
    assert out[3]["n_prev_hour"] == 3 and out[3]["sum_prev_hour"] == 60.0
    # row 4's trailing hour starts at +10 min: rows 1-3 all fall outside
    assert out[4]["n_prev_hour"] == 1 and out[4]["sum_prev_hour"] == 40.0
    assert out[1]["n_prev_hour"] == 1 and out[2]["n_prev_hour"] == 2
