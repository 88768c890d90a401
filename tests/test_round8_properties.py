"""Hypothesis properties for the round-8 order-defined replay machinery:
random keyed series pushed through the REAL state-store replay under the
deterministic batch schedule, checked against the pure-Python fold of the
documented late-data contract — the merge/duplicate/empty-batch edge
cases a few hand-picked examples can't sweep.

Each example spins an availableNow streaming query, so max_examples stays
small; the shrink path still exercises single-key / single-bucket /
all-late degenerate schedules."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from broker_spark.streaming import stateful


def _ewma_reference(rows, n_batches: int):
    out = {}
    by_key: dict = {}
    for k, b, v in rows:
        by_key.setdefault(k, []).append((b, v))
    for k, pairs in by_key.items():
        prev_e, prev_b = None, None
        for b, v in sorted(pairs, key=lambda p: (p[0] % n_batches, p[0])):
            if prev_b is not None and b <= prev_b:
                continue
            prev_e = v if prev_e is None else 0.8 * prev_e + 0.2 * v
            prev_b = b
            out[(k, b)] = (round(v, 6), round(prev_e, 6))
    return out


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cells=st.dictionaries(
        st.tuples(
            st.sampled_from(["a", "b", "c"]),
            st.integers(min_value=0, max_value=20),
        ),
        st.floats(
            min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
        ),
        min_size=1,
        max_size=30,
    ),
    n_batches=st.sampled_from([2, 3, 4]),
)
def test_shuffled_ewma_state_store_matches_reference(
    spark, tmp_path_factory, cells, n_batches
):
    from broker_spark.plans.catalog import _stage_ordered_batches

    tmp = tmp_path_factory.mktemp("ewma_prop")
    rows = [(k, b, float(v)) for (k, b), v in cells.items()]
    df = spark.createDataFrame(rows, "key string, bucket long, value double")
    _stage_ordered_batches(df, F.col("bucket") % n_batches, n_batches, str(tmp / "in"))
    src = (
        spark.readStream.schema("key string, bucket long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(tmp / "in"))
    )
    q = (
        stateful.streaming_ewma(src)
        .writeStream.format("parquet")
        .option("path", str(tmp / "sink"))
        .option("checkpointLocation", str(tmp / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r["key"], r["bucket"]): (round(r["value"], 6), round(r["ewma"], 6))
        for r in spark.read.parquet(str(tmp / "sink")).collect()
    }
    assert got == _ewma_reference(rows, n_batches)
