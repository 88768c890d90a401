"""Hypothesis properties for the round-7 interval-merge trailing distinct:
randomized (user, hour) activity grids checked against a brute-force
pure-Python reference (and, transitively, against the hop-form operator
the driver certifies) — the merge/split/prefix-sum edge cases a few
hand-picked examples can't sweep."""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from broker_spark.operators import rollup
from broker_spark.pipeline.linkage import corrupted_name

WINDOW = 24


def _reference(pairs: set[tuple[int, int]]) -> dict[int, int]:
    """Brute force: at every active hour h, count users with an active
    hour in [h-23, h]."""
    hours = sorted({h for _, h in pairs})
    out = {}
    for h in hours:
        out[h] = len(
            {u for u, a in pairs if h - (WINDOW - 1) <= a <= h}
        )
    return out


def _frame(spark, pairs):
    rows = [
        (int(u), dt.datetime(2024, 1, 1) + dt.timedelta(hours=int(h)))
        for u, h in sorted(pairs)
    ]
    return spark.createDataFrame(rows, "user_id long, ts timestamp")


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    pairs=st.sets(
        st.tuples(
            st.integers(min_value=1, max_value=8),
            # hour span wider than several windows, with gaps that land
            # on/around the 23/24 merge boundary by construction
            st.integers(min_value=0, max_value=120),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_interval_trailing_distinct_matches_bruteforce(spark, pairs):
    base = int(dt.datetime(2024, 1, 1).timestamp() * 1000) // 3_600_000
    got = {
        r["bucket"] - base: r["n_users"]
        for r in rollup.trailing_distinct_users_interval(
            _frame(spark, pairs)
        ).collect()
    }
    assert got == _reference(pairs)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    names=st.sets(
        # a TWO-letter alphabet on purpose: runs of equal adjacent chars
        # are then common, pinning the swap-of-equal-chars identity edit
        # this property originally exposed (fallback: duplicate), on top
        # of the ADVICE r6 len<=2 fallback (1- and 2-char names included)
        st.text(alphabet="ab ", min_size=1, max_size=12),
        min_size=1,
        max_size=25,
    ).map(lambda s: {n for n in s if n.strip()}).filter(len)
)
def test_corrupted_name_always_single_edit(spark, names):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(n,) for n in names], "name string")
    out = df.select("name", corrupted_name(F.col("name")).alias("dirty")).collect()
    for r in out:
        # a real edit was planted...
        assert r["dirty"] != r["name"]
        # ...of exactly one drop/duplicate/swap: length moves by at most 1
        assert abs(len(r["dirty"]) - len(r["name"])) <= 1
        # and the first character survives (blocking contract)
        assert r["dirty"][0] == r["name"][0]
