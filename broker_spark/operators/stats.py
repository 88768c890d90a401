"""Cross-row statistics operators: time-decay scoring, co-occurrence
PMI, and two-sample distribution drift.

Shared discipline (same as the catalog's float rules): every sum that a
different engine might accumulate in a different ORDER goes through an
exact representation (DECIMAL for weighted sums, BIGINT counts for
ratios), so the only floating-point steps are order-free scalar ops on
identical inputs — that is what makes these value-hash-reproducible
against a DuckDB oracle while staying fully distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window


def decayed_user_scores(
    events: DataFrame, half_life_weeks: int = 1
) -> DataFrame:
    """Recency-weighted engagement score per user: each event contributes
    value * 0.5^k where k = floor(age_days / (7 * half_life_weeks)) is
    the event's age in WHOLE half-lives, measured back from the corpus
    max day — i.e. half-life-granular step decay, not continuous decay.

    Exactness: ages are INTEGER half-life counts, so 0.5^k is an exact power
    of two and each weight is one exact double multiply; the weighted
    sum is carried as DECIMAL(28,12) (order-independent) and only cast
    to double at the end — the estimate is bit-identical no matter how
    partitions merge.  One data-pass aggregation after a broadcast of
    the scalar max day; at 100 TB this is a plain map-side-combined
    groupBy(user)."""
    max_day = events.agg(
        F.floor(F.max(F.unix_millis("ts")) / F.lit(86_400_000))
        .cast("long")
        .alias("max_day")
    )
    day = F.floor(F.unix_millis("ts") / F.lit(86_400_000)).cast("long")
    age_weeks = F.floor((F.col("max_day") - day) / F.lit(7 * half_life_weeks)).cast(
        "long"
    )
    weight = F.pow(F.lit(0.5), age_weeks.cast("double"))
    return (
        events.crossJoin(broadcast(max_day))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("value") * weight).cast("decimal(28,12)"))
            .cast("double")
            .alias("decayed_score"),
        )
        .select(
            "user_id", "n_events", F.round("decayed_score", 6).alias("decayed_score")
        )
    )


def event_pmi_pairs(events: DataFrame) -> DataFrame:
    """Pointwise mutual information between event types co-occurring in
    the same (user, day) context: pmi(a,b) = ln(c_ab * N / (c_a * c_b))
    over context counts — positive = the types travel together (funnel
    stages), negative = they repel (error vs purchase).

    The ratio's numerator/denominator are exact BIGINT products, so the
    only float steps are one division and one ln on identical inputs.
    Contexts are the deduplicated (user, day, type) frame — orders of
    magnitude below raw events — and the pair join is an equi-join on
    (user, day); type-marginal counts attach by broadcast."""
    ctx = events.select(
        "user_id",
        F.floor(F.unix_millis("ts") / F.lit(86_400_000)).cast("long").alias("day"),
        F.col("event_type"),
    ).distinct()
    n_ctx = ctx.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).alias("n_contexts")
    )
    marg = ctx.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    pairs = (
        ctx.alias("a")
        .join(ctx.alias("b"), ["user_id", "day"])
        .filter(F.col("a.event_type") < F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_co"))
    )
    ma = broadcast(marg.select(F.col("event_type").alias("type_a"), F.col("c").alias("c_a")))
    mb = broadcast(marg.select(F.col("event_type").alias("type_b"), F.col("c").alias("c_b")))
    return (
        pairs.join(ma, "type_a")
        .join(mb, "type_b")
        .crossJoin(broadcast(n_ctx))
        .select(
            "type_a",
            "type_b",
            "n_co",
            F.round(
                F.log(
                    (F.col("n_co") * F.col("n_contexts")).cast("double")
                    / (F.col("c_a") * F.col("c_b")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
    )


def ks_two_sample(
    df: DataFrame, value_col: str, group_col: str, group_a: str
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between `group_a`'s and
    the rest's distribution of `value_col`: D = max over v of
    |F_A(v) - F_B(v)| — the standard drift gate between two ingest
    batches / sources of a training corpus.

    Scale shape: raw rows collapse to per-distinct-value counts FIRST
    (one shuffle, output bounded by the value domain, not the row
    count); the ECDF running sums then run over that compact frame.  The
    ECDF ordinates are exact integer ratios, so both engines compute
    identical doubles.  Output: one row — n_a, n_b, ks_stat, and the
    smallest value attaining it.  If either group is EMPTY the statistic
    is undefined and the result has zero rows (the ECDF ratio is NULL,
    so every gap row filters out) — callers gating on drift should treat
    an empty result as "nothing to compare", not "no drift"."""
    flagged = df.select(
        F.col(value_col).alias("v"),
        F.when(F.col(group_col) == group_a, 1).otherwise(0).alias("in_a"),
    )
    per_v = flagged.groupBy("v").agg(
        F.sum("in_a").cast("long").alias("na_v"),
        F.sum(1 - F.col("in_a")).cast("long").alias("nb_v"),
    )
    totals = flagged.agg(
        F.sum("in_a").cast("long").alias("n_a"),
        F.sum(1 - F.col("in_a")).cast("long").alias("n_b"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    ecdf = per_v.crossJoin(broadcast(totals)).select(
        "v",
        "n_a",
        "n_b",
        # try_divide: an empty group makes the ECDF (and so KS) undefined
        # -> NULL -> zero output rows, instead of an ANSI divide-by-zero
        F.try_divide(
            F.sum("na_v").over(w).cast("double"), F.col("n_a").cast("double")
        ).alias("fa"),
        F.try_divide(
            F.sum("nb_v").over(w).cast("double"), F.col("n_b").cast("double")
        ).alias("fb"),
    )
    gap = ecdf.select(
        "n_a", "n_b", "v", F.abs(F.col("fa") - F.col("fb")).alias("gap")
    )
    best = gap.agg(F.max("gap").alias("ks"))
    return (
        gap.crossJoin(broadcast(best))
        .filter(F.col("gap") == F.col("ks"))
        .groupBy("n_a", "n_b")
        .agg(
            F.round(F.min(F.col("ks")), 6).alias("ks_stat"),
            F.min("v").alias("ks_at"),
        )
    )


def cusum_daily_alarms(
    events: DataFrame,
    slack_frac: float = 0.1,
    alarm_frac: float = 0.5,
) -> DataFrame:
    """CUSUM control chart over daily event-rate series, per type: the
    MEMORYFUL complement to `zscore_anomaly_events` — a small persistent
    shift accumulates until it alarms even though no single day is a
    z-score outlier.  s_t = max(0, s_{t-1} + x_t - mu - k) with slack
    k = slack_frac * mu and alarm at s_t > alarm_frac * mu (Page 1954).

    The per-key mean rides the DECIMAL-exact sum (order-independent), so
    both engines fold the recurrence over identical doubles in the same
    order — oracle-reproducible like the EWMA entry's recursive CTE.
    Iterative -> applyInPandas per key (the EWMA pattern): the recurrence
    runs over the DAILY frame (days x types rows), never raw events, and
    parallelizes across keys."""
    import pandas as pd
    from pyspark.sql.types import (
        BooleanType,
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    daily = (
        events.withColumn(
            "day", F.floor(F.unix_millis("ts") / F.lit(86_400_000)).cast("long")
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    mu = daily.groupBy("event_type").agg(
        (
            F.sum(F.col("n_events").cast("decimal(28,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu")
    )
    joined = daily.join(broadcast(mu), "event_type")
    schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("day", LongType()),
            StructField("n_events", LongType()),
            StructField("cusum", DoubleType()),
            StructField("alarm", BooleanType()),
        ]
    )

    def _one_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        m = float(pdf["mu"].iloc[0])
        k, h = slack_frac * m, alarm_frac * m
        s, out_s, out_a = 0.0, [], []
        for x in pdf["n_events"]:
            s = max(0.0, s + (float(x) - m - k))
            out_s.append(round(s, 6))
            out_a.append(s > h)
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"],
                "day": pdf["day"],
                "n_events": pdf["n_events"],
                "cusum": out_s,
                "alarm": out_a,
            }
        )

    return joined.groupBy("event_type").applyInPandas(_one_key, schema)
