"""Round-6 session-1 operators: distributed BPE merge learning, record
linkage / entity resolution, Holt linear smoothing, Theil-Sen robust
trend, the seasonal-naive forecast scorecard, and U-shaped multi-touch
attribution — each pinned against a pure-Python reference or a
hand-computed result on tiny frames."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

from broker_spark.operators.stats import (
    holt_trend_daily,
    multitouch_attribution,
    seasonal_naive_errors,
    theil_sen_daily_trend,
)
from broker_spark.pipeline import linkage, text


def _ts(d, h=0, m=0):
    return dt.datetime(2024, 1, d, h, m)


# -- BPE merge learning ------------------------------------------------------


def _bpe_reference(words_freq: dict[str, int], n_merges: int):
    """Textbook BPE (Sennrich et al. get_stats/merge loop): overlapping
    pair counts, argmax with lexicographic tie-break, greedy
    left-to-right merge application."""
    vocab = {tuple(w): f for w, f in words_freq.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: dict[tuple[str, str], int] = {}
        for toks, f in vocab.items():
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] = (
                    pairs.get((toks[i], toks[i + 1]), 0) + f
                )
        if not pairs:
            break
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, f"{l} {r}", l + r, n))
        new_vocab = {}
        for toks, f in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == l and toks[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + f
        vocab = new_vocab
    return merges, vocab


def _docs_frame(spark, texts):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars int",
    )


def test_bpe_learn_matches_textbook_reference(spark):
    texts = ["the cat sat on the mat", "the hat of the cat", "banana bandana"]
    docs = _docs_frame(spark, texts)
    words: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            words[w] = words.get(w, 0) + 1
    ref_merges, _ = _bpe_reference(words, 4)
    got = [
        (r["rank"], r["pair"], r["merged"], r["n"])
        for r in text.bpe_learn_merges(docs, 4).orderBy("rank").collect()
    ]
    assert got == ref_merges


def test_bpe_vocab_after_merges_matches_reference_retokenization(spark):
    texts = ["aa ab aa", "ab aa ab", "ba ba"]
    docs = _docs_frame(spark, texts)
    words: dict[str, int] = {}
    for t in texts:
        for w in t.split(" "):
            words[w] = words.get(w, 0) + 1
    _, ref_vocab = _bpe_reference(words, 4)
    ref_counts: dict[str, int] = {}
    for toks, f in ref_vocab.items():
        for tok in toks:
            ref_counts[tok] = ref_counts.get(tok, 0) + f
    got = {
        r["token"]: r["n"]
        for r in text.bpe_vocab_after_merges(docs, 4, k=50).collect()
    }
    assert got == ref_counts


def test_bpe_two_pass_replace_handles_token_runs(spark):
    # 'aaaa' -> pairs ('a','a') x3; after merging 'a a' -> 'aa' the word
    # must become 'aa aa' (greedy left-to-right), which one replace pass
    # alone would get wrong.
    docs = _docs_frame(spark, ["aaaa aaaa b"])
    merges, wf = text.bpe_learn(docs, 1)
    assert merges[0]["pair"] == "a a"
    toks = {r["word"]: r["toks"] for r in wf.collect()}
    assert toks["aaaa"] == "aa aa"


# -- record linkage / entity resolution --------------------------------------


def _parts_frame(spark, names):
    return spark.createDataFrame([(i, n) for i, n in enumerate(names)], "p_partkey long, p_name string")


def test_corruption_is_single_edit_and_preserves_first_char(spark):
    # Includes len<=2 names: the degenerate-case fallback (ADVICE r6)
    # must still plant a real edit (duplicate last char), so the
    # "one deterministic single-edit corruption" contract holds with
    # NO length escape hatch.
    names = ["small ring", "red widget", "cold bolt", "promo anvil x",
             "ab", "x"]
    df = _parts_frame(spark, names)
    out = linkage.dirty_clean_names(df).collect()
    for r in out:
        assert r["dirty_name"] != r["clean_name"]
        assert r["dirty_name"][0] == r["clean_name"][0]
        assert abs(len(r["dirty_name"]) - len(r["clean_name"])) <= 1


def test_linkage_planted_recall_is_total(spark):
    names = ["small ring", "red widget", "cold bolt", "old bolt", "hot gear"]
    df = _parts_frame(spark, names)
    planted = {
        (r["dirty_name"], r["clean_name"])
        for r in linkage.dirty_clean_names(df).collect()
    }
    got = {
        (r["dirty_name"], r["clean_name"])
        for r in linkage.linkage_pairs(df).collect()
    }
    assert planted <= got  # every planted edit is recovered


def test_suffix_block_catches_cross_prefix_matches(spark):
    # 'cold bolt' ~ 'old bolt' is distance 1 but differs in char 1:
    # only the suffix block can produce the candidate.
    df = _parts_frame(spark, ["cold bolt", "old bolt"])
    pairs = {
        (r["dirty_name"], r["clean_name"]): r["dist"]
        for r in linkage.linkage_pairs(df).collect()
    }
    cross = {k: v for k, v in pairs.items() if k[0][0] != k[1][0]}
    assert cross, f"expected cross-prefix matches, got only {pairs}"


def test_entity_resolution_merges_linked_names(spark):
    # cold bolt / old bolt chain into ONE entity via cross matches;
    # hot gear stays its own 2-node (clean+dirty) entity.
    df = _parts_frame(spark, ["cold bolt", "old bolt", "hot gear"])
    ents = linkage.entity_components(df).collect()
    by_entity = {r["entity"]: r for r in ents}
    assert len(by_entity) == 2
    big = max(ents, key=lambda r: r["n_names"])
    assert big["n_clean"] == 2 and big["n_dirty"] == 2
    small = min(ents, key=lambda r: r["n_names"])
    assert small["n_clean"] == 1 and small["n_dirty"] == 1
    assert small["n_records"] == 1


# -- Holt linear smoothing ---------------------------------------------------


def test_holt_matches_pure_python_recurrence(spark):
    xs = [10, 12, 15, 13, 18, 21]
    rows, eid = [], 0
    for d, c in enumerate(xs):
        for _ in range(c):
            rows.append((eid, _ts(1 + d), 1, "click", 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    a, b = 0.5, 0.2
    lvl, trd = float(xs[0]), float(xs[1] - xs[0])
    exp = [(lvl, trd, float(xs[0]))]
    for x in xs[1:]:
        f = lvl + trd
        l_new = a * x + (1 - a) * (lvl + trd)
        trd = b * (l_new - lvl) + (1 - b) * trd
        lvl = l_new
        exp.append((lvl, trd, f))
    rows = holt_trend_daily(ev).orderBy("day").collect()
    assert len(rows) == len(xs)
    for r, (el, et, ef) in zip(rows, exp):
        assert math.isclose(r["level"], round(el, 6), abs_tol=1e-9)
        assert math.isclose(r["trend"], round(et, 6), abs_tol=1e-9)
        assert math.isclose(r["forecast"], round(ef, 6), abs_tol=1e-9)


def test_holt_single_point_series_has_zero_trend(spark):
    ev = spark.createDataFrame(
        [(1, _ts(1), 1, "view", 1.0, "{}")],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    r = holt_trend_daily(ev).collect()[0]
    assert r["trend"] == 0.0 and r["level"] == r["forecast"] == 1.0


# -- Theil-Sen ---------------------------------------------------------------


def test_theil_sen_is_outlier_robust(spark):
    # perfect slope-2 line with one wild outlier day: OLS would bend,
    # the pairwise-slope median must stay at 2.
    days = list(range(9))
    counts = [3 + 2 * d for d in days]
    counts[4] = 500  # outlier
    rows = []
    eid = 0
    for d, c in zip(days, counts):
        for _ in range(c):
            rows.append((eid, _ts(1 + d), 1, "click", 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    r = theil_sen_daily_trend(ev).collect()[0]
    assert r["slope"] == 2.0
    assert r["n_days"] == 9 and r["n_pairs"] == 36


# -- seasonal naive ----------------------------------------------------------


def test_seasonal_naive_errors_hand_computed(spark):
    # 14 days, week2 = week1 + [1, -2, 0, 3, 0, 0, 0]
    week1 = [10, 20, 30, 40, 50, 60, 70]
    deltas = [1, -2, 0, 3, 0, 0, 0]
    rows, eid = [], 0
    for d in range(14):
        c = week1[d % 7] + (deltas[d % 7] if d >= 7 else 0)
        for _ in range(c):
            rows.append((eid, _ts(1 + d), 1, "click", 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    r = seasonal_naive_errors(ev).collect()[0]
    errs = deltas
    n = 7
    assert r["n_days"] == n
    assert math.isclose(r["mae"], round(sum(abs(e) for e in errs) / n, 6), abs_tol=1e-9)
    assert math.isclose(r["bias"], round(sum(errs) / n, 6), abs_tol=1e-9)
    assert math.isclose(
        r["rmse"], math.sqrt(sum(e * e for e in errs) / n), abs_tol=1e-6
    )
    actual = [week1[i] + deltas[i] for i in range(7)]
    mape = sum(abs(e) / a for e, a in zip(errs, actual)) / n
    assert math.isclose(r["mape"], mape, abs_tol=1e-6)


# -- multi-touch attribution -------------------------------------------------


def test_attribution_weights_u_shape(spark):
    # one purchase of value 100 with 4 prior clicks at hours 1..4:
    # weights 0.4, 0.1, 0.1, 0.4
    rows = [
        (1, _ts(1, 1), 7, "click", 0.0, "{}"),
        (2, _ts(1, 2), 7, "click", 0.0, "{}"),
        (3, _ts(1, 3), 7, "click", 0.0, "{}"),
        (4, _ts(1, 4), 7, "click", 0.0, "{}"),
        (5, _ts(1, 5), 7, "purchase", 100.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {r["click_hour"]: r["attributed_value"] for r in multitouch_attribution(ev).collect()}
    assert out == {1: 40.0, 2: 10.0, 3: 10.0, 4: 40.0}


def test_attribution_single_and_double_touch(spark):
    rows = [
        (1, _ts(1, 1), 7, "click", 0.0, "{}"),
        (2, _ts(1, 5), 7, "purchase", 60.0, "{}"),
        (3, _ts(2, 1), 8, "click", 0.0, "{}"),
        (4, _ts(2, 2), 8, "click", 0.0, "{}"),
        (5, _ts(2, 5), 8, "purchase", 80.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {r["click_hour"]: r["attributed_value"] for r in multitouch_attribution(ev).collect()}
    # hour 1: 60 (single) + 40 (half of 80); hour 2: 40
    assert out == {1: 100.0, 2: 40.0}


def test_attribution_lookback_window_excludes_old_clicks(spark):
    rows = [
        (1, _ts(1, 1), 7, "click", 0.0, "{}"),
        (2, _ts(9, 1), 7, "click", 0.0, "{}"),
        (3, _ts(10, 1), 7, "purchase", 50.0, "{}"),  # click 1 is 9 days old
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = multitouch_attribution(ev).collect()
    assert len(out) == 1 and out[0]["attributed_value"] == 50.0


# -- review regressions (round-6 session-1 self-review) ----------------------


def test_bpe_oracle_survives_early_vocabulary_saturation(spark, tmp_path):
    # A corpus whose vocabulary saturates in ONE merge ('ab ab ab'):
    # the Spark trainer breaks early and keeps the vocabulary; the
    # unrolled oracle must pass the word table through its remaining
    # stages unchanged (LEFT JOIN ON true) instead of emptying it.
    import duckdb

    from broker_spark.plans.catalog import CATALOG

    docs = _docs_frame(spark, ["ab ab ab"])
    got = {
        (r["token"], r["n"]) for r in text.bpe_vocab_after_merges(docs, 4).collect()
    }
    assert got == {("ab", 3)}

    pq = str(tmp_path / "documents.parquet")
    docs.toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{pq}'")
    oracle = set(
        map(tuple, con.execute(
            "SELECT token, n FROM (" + CATALOG["bpe_vocab_after_merges"].sql + ")"
        ).fetchall())
    )
    assert oracle == got
    merges = con.execute(
        "SELECT rank, pair FROM (" + CATALOG["bpe_learn_merges"].sql + ")"
    ).fetchall()
    assert merges == [(1, "a b")]


def test_seasonal_naive_squares_survive_long_overflow(spark):
    # err*err beyond Long.MAX must not blow up the decimal-domain sums
    # (synthesized via a pre-aggregated frame through the same agg path).
    from broker_spark.operators.stats import seasonal_naive_errors

    big = 4_000_000_000  # err^2 = 1.6e19 > 2^63-1
    rows = [(i, _ts(1), 1, "click", 1.0, "{}") for i in range(2)]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    # can't materialize 4e9 events: drive the decimal path directly by
    # checking the expression tree types instead
    out = seasonal_naive_errors(ev)
    s_sq_field = [f for f in out.schema.fields if f.name == "rmse"]
    assert s_sq_field  # shape intact
    import re

    plan = out._jdf.queryExecution().analyzed().toString()
    assert re.search(r"decimal\(3[78],0\)", plan), plan


# -- session-2: streaming Holt, STL anomalies, Adamic-Adar, Heaps ------------


def test_streaming_holt_crosses_microbatches_and_holds_first_point(
    spark, tmp_path
):
    # The textbook init trend_1 = x_2 - x_1 is a one-step lookahead: the
    # first point must be HELD until the second arrives, and state must
    # survive micro-batch boundaries.
    import pytest as _pytest

    from broker_spark.streaming import stateful

    src = tmp_path / "in"
    sink, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")

    def run_batch():
        source = spark.readStream.schema("key string, bucket long, value double").parquet(
            str(src)
        )
        q = (
            stateful.streaming_holt(source)
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["key"], r["bucket"]): (r["level"], r["trend"], r["forecast"])
            for r in spark.read.parquet(sink).collect()
        }

    spark.createDataFrame(
        [("a", 0, 10.0)], "key string, bucket long, value double"
    ).write.mode("append").parquet(str(src))
    first = run_batch()
    assert ("a", 0) not in first  # held: trend needs x_2

    spark.createDataFrame(
        [("a", 1, 12.0), ("a", 2, 15.0)], "key string, bucket long, value double"
    ).write.mode("append").parquet(str(src))
    out = run_batch()

    a, b = 0.5, 0.2
    l1, t1 = 10.0, 2.0
    f2 = l1 + t1
    l2 = a * 12.0 + (1 - a) * (l1 + t1)
    t2 = b * (l2 - l1) + (1 - b) * t1
    f3 = l2 + t2
    l3 = a * 15.0 + (1 - a) * (l2 + t2)
    t3 = b * (l3 - l2) + (1 - b) * t2
    assert out[("a", 0)] == _pytest.approx((l1, t1, 10.0))
    assert out[("a", 1)] == _pytest.approx((l2, t2, f2))
    assert out[("a", 2)] == _pytest.approx((l3, t3, f3))


def test_seasonal_trend_anomalies_flags_only_the_break(spark):
    # weekly pattern + steady trend for 4 weeks, with one day shoved far
    # off pattern: exactly that day must flag.
    from broker_spark.operators.stats import seasonal_trend_anomalies

    week = [30, 10, 10, 10, 10, 20, 30]
    rows, eid = [], 0
    for d in range(28):
        c = week[d % 7] + 2 * d  # trend +2/day
        if d == 17:
            c += 120  # the anomaly
        for _ in range(c):
            rows.append((eid, _ts(1 + d), 1, "click", 1.0, "{}"))
            eid += 1
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {r["day"]: r["anomaly"] for r in seasonal_trend_anomalies(ev).collect()}
    flagged = {d for d, a in out.items() if a}
    anomaly_day = min(out) + 17
    assert anomaly_day in flagged
    assert len(flagged) <= 3  # the break (+ at most residual-pollution edges)


def test_adamic_adar_scores_hand_computed(spark):
    # path graph 1-2, 2-3, 1-4: non-edges with common neighbors are
    # (1,3) via 2 and (2,4) via 1.
    import math as _math

    from broker_spark.pipeline.dedup import adamic_adar_scores

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 4)], "doc_a long, doc_b long"
    )
    out = {
        (r["doc_a"], r["doc_b"]): r
        for r in adamic_adar_scores(pairs, k=10).collect()
    }
    assert set(out) == {(1, 3), (2, 4)}
    # deg(2) = 2 -> AA(1,3) = 1/ln 2; deg(1) = 2 -> AA(2,4) = 1/ln 2
    aa = round(
        int(1.0 / _math.log(2.0) * 1e12 + 0.5) / 1e12, 6
    )
    assert out[(1, 3)]["adamic_adar"] == aa
    assert out[(1, 3)]["common_neighbors"] == 1
    # jaccard: |{2,4} ∩ {2}| / |{2,4} ∪ {2}| = 1/2
    assert out[(1, 3)]["nbr_jaccard"] == 0.5


def test_heaps_vocab_growth_cumulative_and_monotone(spark):
    docs = _docs_frame(
        spark,
        ["a b c", "a b d", "a e", "f g h i", "a b", "j k", "a", "l m", "n", "o p"],
    )
    out = {r["tier"]: r for r in text.heaps_vocab_growth(docs).collect()}
    assert len(out) == 10
    assert out[10]["n_docs"] == 10
    assert out[10]["vocab"] == 16  # a..p
    docs_seen = [out[t]["n_docs"] for t in range(1, 11)]
    vocab_seen = [out[t]["vocab"] for t in range(1, 11)]
    assert docs_seen == sorted(docs_seen)
    assert vocab_seen == sorted(vocab_seen)


# -- session-3: matryoshka, layout pruning, k-anonymity ----------------------


def test_matryoshka_full_dim_tier_is_perfect_recall(spark):
    # with d = full dimension, the truncated top-k IS the full top-k.
    from broker_spark.pipeline.ann import matryoshka_recall

    emb = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3) % 11) for j in range(4)]) for i in range(20)],
        "vec_id long, embedding array<float>",
    )
    out = matryoshka_recall(emb, dims=(2, 4), k=5, n_queries=3).collect()
    by_dim = {}
    for r in out:
        by_dim.setdefault(r["dim"], []).append(r["recall"])
    assert all(v == 1.0 for v in by_dim[4])
    assert len(by_dim[2]) == 3


def test_layout_pruning_clustered_beats_arrival(spark):
    import random

    rng = random.Random(7)
    rows = [
        (i, _ts(1 + i % 28, i % 24), rng.randrange(50), "click", 1.0, "{}")
        for i in range(2000)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from broker_spark.operators.profile import layout_pruning_benefit

    out = {r["layout"]: r for r in layout_pruning_benefit(ev).collect()}
    assert out["clustered"]["scan_fraction"] < out["arrival"]["scan_fraction"]
    assert out["arrival"]["n_files"] == out["clustered"]["n_files"] == 8


def test_k_anonymity_flags_small_cells(spark):
    rows = []
    # cell A: 6 users -> ok; cell B: 2 users -> suppress
    for u in range(6):
        rows.append((u, _ts(1, 1), u, "click", 1.0, "{}"))
    for u in range(2):
        rows.append((100 + u, _ts(2, 9), 50 + u, "view", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from broker_spark.operators.profile import k_anonymity_audit

    out = {(r["event_type"]): r for r in k_anonymity_audit(ev).collect()}
    assert out["click"]["k_users"] == 6 and not out["click"]["suppress"]
    assert out["view"]["k_users"] == 2 and out["view"]["suppress"]


# -- session-4: churn frame, conversion latency, BPE fertility ---------------


def test_churn_frame_windows_and_label(spark):
    rows = [
        # user 1: active weeks 1-3, silent after -> churned
        (1, _ts(1), 1, "click", 2.0, "{}"),
        (2, _ts(9), 1, "view", 3.0, "{}"),
        (3, _ts(16), 1, "purchase", 5.0, "{}"),
        # user 2: active week 1 AND after day 21 -> retained
        (4, _ts(2), 2, "click", 1.0, "{}"),
        (5, _ts(25), 2, "click", 1.0, "{}"),
        # user 3: only active after the feature window -> excluded
        (6, _ts(26), 3, "click", 1.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from broker_spark.operators.stats import churn_label_features

    out = {r["user_id"]: r for r in churn_label_features(ev).collect()}
    assert set(out) == {1, 2}
    assert out[1]["churned"] and not out[2]["churned"]
    assert (out[1]["n_events_w1"], out[1]["n_events_w2"], out[1]["n_events_w3"]) == (1, 1, 1)
    assert out[1]["n_purchases"] == 1 and out[1]["feat_value"] == 10.0
    assert out[2]["n_events_w1"] == 1 and out[2]["feat_value"] == 1.0


def test_conversion_latency_uses_last_touch(spark):
    rows = [
        (1, _ts(1, 0), 7, "click", 0.0, "{}"),
        (2, _ts(1, 3), 7, "click", 0.0, "{}"),   # last touch
        (3, _ts(1, 5), 7, "purchase", 9.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    from broker_spark.operators.stats import conversion_latency_quantiles

    out = conversion_latency_quantiles(ev).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_conversions"] == 1
    assert r["p50_ms"] == r["p90_ms"] == r["p99_ms"] == 2 * 3600 * 1000.0


def test_bpe_fertility_by_lang_counts(spark):
    docs = spark.createDataFrame(
        [
            (0, "aa aa bb", "en", "s", 8),
            (1, "aa cc", "de", "s", 5),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    out = {r["lang"]: r for r in text.bpe_fertility_by_lang(docs, n_merges=1).collect()}
    # merge 1 is 'a a' (freq 3) -> 'aa' single token; bb/cc stay 2 tokens
    assert out["en"]["n_words"] == 3 and out["en"]["n_tokens"] == 1 + 1 + 2
    assert out["de"]["n_words"] == 2 and out["de"]["n_tokens"] == 1 + 2
    assert out["de"]["fertility"] == 1.5
