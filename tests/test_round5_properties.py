"""Hypothesis property tests for the round-5 numeric operators: Gini,
Zipf slope, repetition share, and equi-depth tiling are each checked
against an independent pure-Python reference on randomized inputs —
degenerate shapes (single customer, all-equal values, one-word docs)
included by construction."""

from __future__ import annotations

import datetime as dt
import math
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from broker_spark.pipeline import text


def _load_from(tmpdir):
    def load(spark_, sf, name):
        return spark_.read.parquet(f"{tmpdir}/{name}.parquet")

    return load


revenues = st.lists(
    st.floats(min_value=1.0, max_value=10_000.0, allow_nan=False, width=32),
    min_size=1,
    max_size=40,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(revenues)
def test_gini_matches_closed_form_reference(spark, tmp_path_factory, vals):
    from broker_spark.plans import catalog

    p = str(tmp_path_factory.mktemp("gini_prop"))
    rows = [(i, 1000 + i, round(v, 2)) for i, v in enumerate(vals)]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double"
    ).write.mode("overwrite").parquet(f"{p}/orders.parquet")
    orig = catalog.load
    catalog.load = _load_from(p)
    try:
        r = catalog.CATALOG["revenue_gini"].fn(spark, p).collect()[0]
    finally:
        catalog.load = orig
    # pure-python closed form on the same (revenue, custkey) ordering
    revs = sorted(round(v, 2) for v in vals)
    n = len(revs)
    tot = sum(revs)
    wsum = sum((i + 1) * v for i, v in enumerate(revs))
    gini = 2.0 * wsum / (n * tot) - (n + 1.0) / n
    k = math.ceil(n / 10.0)
    top = sum(revs[-k:])
    assert r["n_customers"] == n
    assert r["gini"] == pytest.approx(gini, abs=2e-6)
    assert r["top10_share"] == pytest.approx(top / tot, abs=2e-6)


WORDS = ["aa", "bb", "cc", "dd", "ee", "ff"]

corpus = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=25).map(" ".join),
    min_size=1,
    max_size=6,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus)
def test_zipf_slope_matches_ols_reference(spark, texts):
    docs = spark.createDataFrame(
        [(i, t, "xx") for i, t in enumerate(texts)],
        "doc_id long, text string, lang string",
    )
    got = {r["lang"]: r for r in text.vocab_zipf_slope(docs, min_types=1).collect()}
    freq = Counter(w for t in texts for w in t.split(" "))
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.log(i + 1) for i in range(len(ranked))]
    ys = [math.log(c) for _, c in ranked]
    n = len(xs)
    denom = n * sum(x * x for x in xs) - sum(xs) ** 2
    if n < 2 or denom == 0:
        # single type (or log-degenerate): slope is undefined — the
        # operator emits NULL (guarded division), never a job failure
        assert got["xx"]["n_types"] == n
        assert got["xx"]["zipf_slope"] is None
        return
    slope = (n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)) / denom
    assert got["xx"]["n_types"] == n
    assert got["xx"]["zipf_slope"] == pytest.approx(slope, abs=2e-6)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus)
def test_repetition_share_matches_reference(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["top_bigram"], r["top_count"], r["top2gram_share"])
        for r in text.repetition_top2gram_share(docs).collect()
    }
    for i, t in enumerate(texts):
        ws = t.split(" ")
        if len(ws) < 2:
            assert i not in got
            continue
        bgs = Counter(" ".join(ws[j : j + 2]) for j in range(len(ws) - 1))
        top = sorted(bgs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got[i][0] == top[0]
        assert got[i][1] == top[1]
        assert got[i][2] == pytest.approx(
            round(top[1] * 2.0 / len(ws), 6), abs=1e-9
        )


values = st.lists(
    st.floats(min_value=0.0, max_value=100.0, allow_nan=False, width=32),
    min_size=1,
    max_size=50,
)


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(values)
def test_equidepth_tiles_match_ntile_reference(spark, tmp_path_factory, vals):
    from broker_spark.plans import catalog

    p = str(tmp_path_factory.mktemp("ed_prop"))
    rows = [
        (i, dt.datetime(2024, 1, 1), 1, "t", round(v, 2), "{}")
        for i, v in enumerate(vals)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{p}/events.parquet")
    orig = catalog.load
    catalog.load = _load_from(p)
    try:
        got = catalog.CATALOG["events_equidepth_histogram"].fn(spark, p).collect()
    finally:
        catalog.load = orig
    # ANSI ntile reference: first (n % 10) tiles get ceil(n/10) rows
    ordered = sorted((round(v, 2), i) for i, v in enumerate(vals))
    n = len(ordered)
    base, rem = divmod(n, 10)
    sizes = [base + 1 if t < rem else base for t in range(10)]
    tiles, pos = {}, 0
    for t, sz in enumerate(sizes, start=1):
        if sz:
            chunk = ordered[pos : pos + sz]
            tiles[t] = (len(chunk), chunk[0][0], chunk[-1][0])
            pos += sz
    got_m = {r["tile"]: (r["n_events"], r["lo"], r["hi"]) for r in got}
    assert got_m == {
        t: (c, pytest.approx(lo), pytest.approx(hi))
        for t, (c, lo, hi) in tiles.items()
    }


# -- funnel state machine: arrival-order invariance -------------------------


class _FakeState:
    """Minimal GroupState stand-in driving _funnel_func directly."""

    def __init__(self):
        self._val = None
        self.hasTimedOut = False

    @property
    def exists(self):
        return self._val is not None

    @property
    def get(self):
        return self._val

    def update(self, v):
        self._val = v

    def remove(self):
        self._val = None

    def setTimeoutTimestamp(self, ts):
        pass

    def getCurrentWatermarkMs(self):
        return 0


def _drive_funnel(batches):
    """Feed event batches through the real _funnel_func state logic and
    return the emitted (t_view, t_click, t_purchase) for user 1."""
    import pandas as pd

    from broker_spark.streaming.stateful import _funnel_func

    func = _funnel_func(flush_ts_ms=10**15)
    state = _FakeState()
    for batch in batches:
        pdf = pd.DataFrame(
            {
                "ts": pd.to_datetime([ts for ts, _ in batch], unit="us"),
                "event_type": [et for _, et in batch],
            }
        )
        list(func((1,), iter([pdf]), state) or [])
    state.hasTimedOut = True
    out = list(func((1,), iter([]), state))
    row = out[0].iloc[0]

    def _n(v):
        return None if pd.isna(v) else int(v)

    return (_n(row["t_view_us"]), _n(row["t_click_us"]), _n(row["t_purchase_us"]))


def _funnel_reference(events):
    """Pure-python strict-order funnel on the full event list."""
    views = sorted(ts for ts, et in events if et == "view")
    t1 = views[0] if views else None
    t2 = min(
        (ts for ts, et in events if et == "click" and t1 is not None and ts > t1),
        default=None,
    )
    t3 = min(
        (ts for ts, et in events if et == "purchase" and t2 is not None and ts > t2),
        default=None,
    )
    return (t1, t2, t3)


events_strategy = st.lists(
    st.tuples(
        st.integers(min_value=1_000_000, max_value=2_000_000),
        st.sampled_from(["view", "click", "purchase"]),
    ),
    min_size=1,
    max_size=30,
)


@settings(max_examples=200, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy, st.randoms())
def test_funnel_state_is_arrival_order_invariant(evts, rnd):
    # shuffle the events and split them into random micro-batches: the
    # buffered state must produce the batch reference regardless
    shuffled = list(evts)
    rnd.shuffle(shuffled)
    batches, i = [], 0
    while i < len(shuffled):
        j = i + rnd.randint(1, max(1, len(shuffled) - i))
        batches.append(shuffled[i:j])
        i = j
    assert _drive_funnel(batches) == _funnel_reference(evts)


# -- pagerank vs pure-python power iteration --------------------------------


def _pr_reference(edges, damping=0.85, iters=10):
    """Pure-python PageRank with the operator's exact arithmetic shape."""
    sym = set()
    for a, b in edges:
        sym.add((a, b))
        sym.add((b, a))
    nodes = sorted({a for a, _ in sym})
    n = len(nodes)
    deg = {u: sum(1 for a, _ in sym if a == u) for u in nodes}
    pr = {u: 1.0 / n for u in nodes}
    base = (1 - damping) / n
    for _ in range(iters):
        nxt = {}
        for u in nodes:
            s = sum(pr[a] / deg[a] for a, b in sym if b == u)
            nxt[u] = base + damping * s
        pr = nxt
    return {u: round(v, 6) for u, v in pr.items()}


edge_strategy = st.lists(
    st.tuples(st.integers(0, 12), st.integers(0, 12)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=25,
)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(edge_strategy)
def test_pagerank_matches_power_iteration_reference(spark, edges):
    from broker_spark.pipeline import dedup

    pairs = spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in edges], "doc_a long, doc_b long"
    ).distinct()
    docs = spark.createDataFrame([(i,) for i in range(13)], "doc_id long")
    got = {
        r["doc_id"]: r["pagerank"] for r in dedup.pagerank(docs, pairs).collect()
    }
    ref = _pr_reference(edges)
    assert set(got) == set(ref)
    for u in ref:
        assert got[u] == pytest.approx(ref[u], abs=2e-6)
