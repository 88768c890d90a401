"""As-of join: attach to each left row the most recent right row at or
before its timestamp, per key.

Spark has no native as-of join (pandas-on-Spark `merge_asof` exists but
shuffles through pandas).  The scalable DataFrame formulation is the
union + ordered-window trick:

    union(left tagged, right tagged)
      -> window per key ordered by (ts, right-first)
      -> last non-null right value seen so far
      -> keep left rows

One shuffle on the key, no range-join row explosion, no Python.  This is
the backbone of "state of stream X when message Y arrived" queries over
the message log (the reference's clients do this merge by hand when
combining resend + realtime; cf. serving/live_merge.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    tolerance_ms: int | None = None,
) -> DataFrame:
    """For each left row: the latest right row with
    ``right.ts <= left.ts`` (inclusive) on the same key.

    Returns the left columns plus, per value column `v`, `asof_v` and
    `asof_ts` (null when no prior right row exists, or when it is older
    than `tolerance_ms`).  Right rows tying on ts resolve to the one
    latest in the right frame's (ts, original order); give the right
    frame a deterministic tiebreaker column if that matters.
    """
    value_cols = value_cols if value_cols is not None else [
        c for c in right.columns if c not in on and c != right_ts
    ]
    lt = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_rv_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rt"),
    )
    rt = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) if c not in on else F.col(c)
          for c in left.columns],
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.col(c).alias(f"_rv_{c}") for c in value_cols],
        F.col(right_ts).alias("_rt"),
    )
    u = lt.unionByName(rt)
    # right rows sort before left rows at equal ts -> inclusive (<=) match
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("_t").asc(), F.col("_is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = u.select(
        "*",
        *[
            F.last(F.col(f"_rv_{c}"), ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
        F.last(F.col("_rt"), ignorenulls=True).over(w).alias("asof_ts"),
    )
    out = filled.filter(F.col("_is_left") == 1)
    if tolerance_ms is not None:
        within = (
            F.unix_millis(F.col(left_ts)) - F.unix_millis(F.col("asof_ts"))
        ) <= tolerance_ms
        out = out.select(
            *[F.col(c) for c in left.columns],
            *[
                F.when(within, F.col(f"asof_{c}")).alias(f"asof_{c}")
                for c in value_cols
            ],
            F.when(within, F.col("asof_ts")).alias("asof_ts"),
        )
    else:
        out = out.select(
            *[F.col(c) for c in left.columns],
            *[F.col(f"asof_{c}") for c in value_cols],
            "asof_ts",
        )
    return out
