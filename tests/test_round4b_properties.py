"""Hypothesis property tests for the second-batch round-4 operators:
passage dedup, word entropy, and the BM25 scorer are each checked against
an independent pure-Python reference on randomized corpora — boundary
shapes (short docs, repeated words, single-type docs) included by
construction."""

from __future__ import annotations

import hashlib
import math
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from broker_spark.pipeline import text

WORDS = ["aa", "bb", "cc", "dd", "ee"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=20).map(" ".join),
    min_size=1,
    max_size=8,
)


def _ref_passages(texts: list[str], k: int = 8):
    """Pure-python reference for passage_dedup_stats."""
    seen: set[str] = set()
    out = {}
    for doc_id, t in enumerate(texts):
        ws = t.split(" ")
        passages = [" ".join(ws[i : i + k]) for i in range(0, len(ws), k)]
        n_dup = 0
        for p in passages:
            h = hashlib.md5(p.encode()).hexdigest()
            if h in seen:
                n_dup += 1
            else:
                seen.add(h)
        out[doc_id] = (len(passages), n_dup)
    return out


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus_strategy)
def test_passage_dedup_matches_sequential_reference(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_passages"], r["n_dup_passages"])
        for r in text.passage_dedup_stats(docs).collect()
    }
    assert got == _ref_passages(texts)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus_strategy)
def test_entropy_matches_reference(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in text.doc_entropy_stats(docs).collect()}
    for i, t in enumerate(texts):
        c = Counter(t.split(" "))
        n = sum(c.values())
        ent = -sum((v / n) * math.log(v / n) for v in c.values())
        assert got[i]["n_tokens"] == n
        assert got[i]["n_distinct"] == len(c)
        assert abs(got[i]["word_entropy"] - ent) < 1e-5
        assert abs(got[i]["ttr"] - len(c) / n) < 1e-5


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus_strategy)
def test_bm25_matches_reference(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    terms = ["aa", "bb"]
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in text.bm25_topk(docs, queries=[("q", terms)], k=100).collect()
    }
    # reference BM25
    n_docs = len(texts)
    dls = [len(t.split(" ")) for t in texts]
    avgdl = sum(dls) / n_docs
    dfs = {t: sum(1 for x in texts if t in x.split(" ")) for t in terms}
    for i, t in enumerate(texts):
        tf = Counter(t.split(" "))
        score = 0.0
        for term in terms:
            if tf[term] == 0:
                continue
            idf = math.log(1 + (n_docs - dfs[term] + 0.5) / (dfs[term] + 0.5))
            score += (
                idf
                * tf[term]
                * (text.BM25_K1 + 1)
                / (tf[term] + text.BM25_K1 * (1 - text.BM25_B + text.BM25_B * dls[i] / avgdl))
            )
        if score > 0:
            assert abs(got[("q", i)] - score) < 1e-5, (i, t)
        else:
            assert ("q", i) not in got
