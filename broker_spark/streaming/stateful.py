"""Stateful streaming operators (W4): EWMA smoothing with
applyInPandasWithState.

The reference smooths per-second rates with `0.8*avg + 0.2*sample`
(src/StreamMetrics.ts:7-9,133-143), state living in the broker process.
Here the recurrence state is one float per key inside Spark's state
store — checkpointed, exactly-once, and partitioned by key so a million
streams cost a million floats spread across executors, not a process.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from broker_spark.operators.rollup import EWMA_PREV_WEIGHT, EWMA_SAMPLE_WEIGHT

_OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("bucket", LongType(), False),
        StructField("value", DoubleType(), True),
        StructField("ewma", DoubleType(), True),
    ]
)

#: state = (last ewma, last bucket seen) — one row per key
_STATE_SCHEMA = StructType(
    [StructField("ewma", DoubleType(), True), StructField("bucket", LongType(), True)]
)


def _ewma_func(
    key: Any,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's (bucket, value) rows — ordered by bucket —
    into the running EWMA carried in `state`."""
    if state.exists:
        prev_ewma, prev_bucket = state.get
    else:
        prev_ewma, prev_bucket = None, None
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("bucket")
    out_bucket, out_value, out_ewma = [], [], []
    for _, r in rows.iterrows():
        b, x = int(r["bucket"]), float(r["value"])
        if prev_bucket is not None and b <= prev_bucket:
            continue  # state is strictly forward; late buckets are no-ops
        prev_ewma = (
            x
            if prev_ewma is None
            else EWMA_PREV_WEIGHT * prev_ewma + EWMA_SAMPLE_WEIGHT * x
        )
        prev_bucket = b
        out_bucket.append(b)
        out_value.append(x)
        out_ewma.append(prev_ewma)
    state.update((prev_ewma, prev_bucket))
    yield pd.DataFrame(
        {
            "key": [key[0]] * len(out_bucket),
            "bucket": out_bucket,
            "value": out_value,
            "ewma": out_ewma,
        }
    )


def streaming_ewma(keyed: DataFrame) -> DataFrame:
    """`keyed` must have columns (key string, bucket long, value double) —
    e.g. the output of a windowed rollup level.  Returns the appended
    (key, bucket, value, ewma) rows per micro-batch."""
    return keyed.groupBy("key").applyInPandasWithState(
        _ewma_func,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
