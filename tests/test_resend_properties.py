"""Property-based tests (hypothesis) for the resend predicate algebra:
any (from/to, seq, publisher) query must equal a brute-force Python
reference evaluated over the same in-memory message set — ordering,
tie-breaks, boundary semantics and all.

(The reference repo has no property tests — SURVEY §5; this guards the
composite-boundary semantics its golden tests only spot-check.)
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from broker_spark.operators import resend

ENVELOPE = (
    "stream_id string, partition int, ts timestamp, sequence_no int,"
    " publisher_id string, msg_chain_id string, content string"
)

#: small, collision-heavy domain so ties and boundaries actually occur
TS_VALUES = [1000, 2000, 2000, 3000, 3000, 3000, 4000, 5000]
PUBS = ["a", "b"]


def _mk_rows():
    rows = []
    i = 0
    for ts in TS_VALUES:
        for pub in PUBS:
            for seq in (0, 1, 2):
                rows.append(("s", 0, dt.datetime.utcfromtimestamp(ts / 1000.0),
                             seq, pub, "1", f'{{"i":{i}}}'))
                i += 1
    return rows


ROWS = _mk_rows()
KEY = lambda r: (r[2], r[3], r[4], r[5])  # noqa: E731 — ordering contract


@pytest.fixture(scope="module")
def messages(spark):
    df = spark.createDataFrame(ROWS, ENVELOPE).cache()
    df.count()
    return df


def _collect(df):
    return [(int(r["ts"].timestamp() * 1000), r["sequence_no"], r["publisher_id"])
            for r in df.collect()]


def _expected(pred):
    out = [r for r in ROWS if pred(r)]
    out.sort(key=KEY)
    return [(int(r[2].replace(tzinfo=dt.timezone.utc).timestamp() * 1000), r[3], r[4])
            for r in out]


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    from_ms=st.sampled_from([999, 1000, 2000, 3000, 3500, 5000, 6000]),
    from_seq=st.integers(min_value=0, max_value=3),
    publisher=st.sampled_from([None, "a", "b", "zz"]),
)
def test_request_from_matches_bruteforce(messages, from_ms, from_seq, publisher):
    got = _collect(resend.request_from(messages, "s", 0, from_ms, from_seq, publisher, "1" if publisher else None))
    want = _expected(
        lambda r: (
            (r[2].replace(tzinfo=dt.timezone.utc).timestamp() * 1000, r[3])
            >= (from_ms, from_seq)
            if r[2].replace(tzinfo=dt.timezone.utc).timestamp() * 1000 == from_ms
            else r[2].replace(tzinfo=dt.timezone.utc).timestamp() * 1000 > from_ms
        )
        and (publisher is None or r[4] == publisher)
    )
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    from_ms=st.sampled_from([1000, 2000, 3000]),
    from_seq=st.integers(min_value=0, max_value=3),
    to_ms=st.sampled_from([2000, 3000, 4000, 5000]),
    to_seq=st.integers(min_value=0, max_value=3),
)
def test_request_range_matches_bruteforce(messages, from_ms, from_seq, to_ms, to_seq):
    got = _collect(
        resend.request_range(messages, "s", 0, from_ms, from_seq, to_ms, to_seq)
    )

    def pred(r):
        ms = r[2].replace(tzinfo=dt.timezone.utc).timestamp() * 1000
        lower = ms > from_ms or (ms == from_ms and r[3] >= from_seq)
        upper = ms < to_ms or (ms == to_ms and r[3] <= to_seq)
        return lower and upper

    assert got == _expected(pred)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(n=st.integers(min_value=0, max_value=60))
def test_request_last_matches_bruteforce(messages, n):
    got = _collect(resend.request_last(messages, "s", 0, n))
    all_sorted = sorted(ROWS, key=KEY)
    want = [(int(r[2].replace(tzinfo=dt.timezone.utc).timestamp() * 1000), r[3], r[4])
            for r in (all_sorted[-n:] if n else [])]
    assert got == want
