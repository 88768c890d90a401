"""Round-5 hardening regressions: total behavior on degenerate inputs
(empty docs, uncovered tokenizer characters), loud precondition failures,
and zero-agreement recall tiers — each pinned by the ADVICE item that
motivated it."""

from __future__ import annotations

import datetime as dt

import pytest

from broker_spark.operators import rollup
from broker_spark.pipeline import text


def _docs(spark, texts):
    return spark.createDataFrame(
        [(f"d{i:04d}", t) for i, t in enumerate(texts)], "doc_id string, text string"
    )


def test_quality_classifier_scores_empty_doc_without_nulls(spark):
    # n_len == 0 and n_tokens behavior: Spark Divide yields NULL, DuckDB
    # yields NaN/inf — the greatest(x, 1) guard must keep every column
    # non-null and finite on both engines.
    rows = text.quality_classifier_score(_docs(spark, ["", "real text here"]))
    got = {r["doc_id"]: r for r in rows.collect()}
    assert len(got) == 2
    for r in got.values():
        assert r["quality_prob"] is not None
        assert r["f_len"] is not None and r["f_stop"] is not None
        assert 0.0 <= r["quality_prob"] <= 1.0


def test_sharded_window_rejects_window_wider_than_shard(spark):
    df = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1), 1.0)], "event_id long, ts timestamp, value double"
    )
    with pytest.raises(ValueError, match="window_ms <= shard_ms"):
        rollup.sharded_trailing_window_stats(
            df, window_ms=86_400_000, shard_ms=3_600_000
        )


def test_wordpiece_total_on_uncovered_characters(spark):
    # digits / uppercase / punctuation inside a whitespace token must
    # encode as explicit '[unk]' steps, never raise mid-job.
    out = text.wordpiece_encode_counts(_docs(spark, ["the batch X9; costs $5"]))
    counts = {r["token"]: r["n_occurrences"] for r in out.collect()}
    # X, 9, ;, $, 5 are uncovered single characters -> five [unk] emissions
    assert counts["[unk]"] == 5
    # covered pieces still encode normally
    assert counts["the"] >= 1 and counts["bat"] >= 1 and counts["ch"] >= 1


def test_recall_reports_zero_agreement_tiers(spark):
    # every requested nprobe tier must appear in the output even when its
    # agreement count is zero (left join + coalesce, not inner join).
    from broker_spark.pipeline import ann

    import numpy as np

    rng = np.random.default_rng(7)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(40)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = ann.recall_vs_nprobe(
        emb, n_clusters=4, nprobes=(1, 2, 4), k=3, max_query_id=10,
        cache_key="t_r5_recall",
    ).collect()
    assert {r["nprobe"] for r in out} == {1, 2, 4}
    for r in out:
        assert r["n_agree"] is not None and r["recall"] is not None
