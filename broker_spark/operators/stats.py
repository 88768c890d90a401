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

from broker_spark.pinning import pin
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
    magnitude below raw events — PINNED eagerly (r13, guide §2.4): its
    four readers (both self-join sides, the context count, the
    marginals) race as independent stages and each re-ran the events
    scan + distinct un-pinned; one checkpoint job runs the pass once.
    The pair join is an equi-join on (user, day) over the compact
    context frame; type-marginal counts attach by broadcast.  (An
    in-row pair-expansion form — collect_set baskets + combined emit —
    measured SLOWER at bench scale: the events frame is small enough
    that the hash-join plan beats the higher-order-function chain, and
    it would equally at 100 TB given contexts stay vocabulary-bounded;
    see OPTIMIZATION_r13.md.)"""
    ctx = (
        events.select(
            "user_id",
            F.floor(F.unix_millis("ts") / F.lit(86_400_000))
            .cast("long")
            .alias("day"),
            F.col("event_type"),
        )
        .distinct()
        .transform(pin)
    )
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

    daily = _daily_counts(events)
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


def event_path_trigrams(events: DataFrame, min_count: int = 1) -> DataFrame:
    """Consecutive event-type TRIGRAMS per user over the deterministic
    (ts, event_id) order — the second-order extension of the transition
    matrix (`event_transition_matrix` is first-order), the primitive
    behind path mining ("view -> click -> purchase happens N times") and
    higher-order Markov baselines for sequence models.

    One window shuffle on user_id produces both lags; the result agg is
    bounded by |types|^3 regardless of corpus size, so at 100 TB the
    only scan-sized cost is the user-key shuffle the sessionization
    family already pays."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("t2", F.lag("event_type", 1).over(w))
        .withColumn("t1", F.lag("event_type", 2).over(w))
        .filter(F.col("t1").isNotNull())
        .groupBy(
            F.col("t1").alias("type_1"),
            F.col("t2").alias("type_2"),
            F.col("event_type").alias("type_3"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_paths"))
        .filter(F.col("n_paths") >= min_count)
    )


def chisq_independence(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns — the drift gate companion to `ks_two_sample` (KS covers
    numeric distributions; this covers categorical ones, e.g. "did the
    source mix shift across languages after this crawl refresh").

    Exactness discipline: each cell's statistic is computed from the
    INTEGER identity (N*o - rt*ct)^2 / (N*rt*ct) — the inner difference
    and the denominator are exact DECIMAL(38,0) products of counts
    (bounded by N^2 and N^3 — within 128 bits out past 10^12 rows);
    the SQUARE is taken in the double domain after one exact-to-double
    cast, because num^2 can reach N^4 and would overflow the 38-digit
    ceiling at ~3e9 rows (ANSI mode turns that into a query abort, not
    a wrap).  Both engines square and divide identical doubles; the
    per-cell results are rounded at 6 dp and summed in DECIMAL
    (order-free).  Scale shape: one
    contingency agg bounded by |A|x|B| cells; marginals derive from the
    cells (no second scan) and attach by broadcast.  Output one row:
    n, n_cells, dof, chi2."""
    cells = (
        df.groupBy(F.col(col_a).alias("a"), F.col(col_b).alias("b"))
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
        # eager pin (r13, guide §2.4): rt/ct/tot broadcast builds and the
        # joined probe race as independent readers of this |A|x|B| frame
        # and each re-ran the input scan + contingency agg un-pinned
        .transform(pin)
    )
    rt = cells.groupBy("a").agg(F.sum("o").cast("long").alias("rt"))
    ct = cells.groupBy("b").agg(F.sum("o").cast("long").alias("ct"))
    tot = cells.agg(
        F.sum("o").cast("long").alias("n"),
        F.count_distinct("a").alias("n_a"),
        F.count_distinct("b").alias("n_b"),
    )
    d = lambda c: c.cast("decimal(38,0)")
    joined = (
        cells.join(broadcast(rt), "a")
        .join(broadcast(ct), "b")
        .crossJoin(broadcast(tot))
    )
    num = (
        d(F.col("n")) * d(F.col("o")) - d(F.col("rt")) * d(F.col("ct"))
    ).cast("double")
    den = (d(F.col("n")) * d(F.col("rt")) * d(F.col("ct"))).cast("double")
    term = F.round(num * num / den, 6)
    return (
        joined.select(
            "n",
            "n_a",
            "n_b",
            term.cast("decimal(28,12)").alias("term"),
        )
        .groupBy("n", "n_a", "n_b")
        .agg(F.sum("term").cast("double").alias("chi2"))
        .select(
            "n",
            (F.col("n_a") * F.col("n_b")).cast("long").alias("n_cells"),
            ((F.col("n_a") - 1) * (F.col("n_b") - 1)).cast("long").alias("dof"),
            F.round("chi2", 6).alias("chi2"),
        )
    )


def acf_daily_counts(events: DataFrame, max_lag: int = 7) -> DataFrame:
    """Autocorrelation of the DAILY event-count series at lags 1..max_lag
    (Pearson r between the series and its k-day shift) — the
    seasonality probe behind "is this metric weekly-periodic", run
    before any forecasting/anomaly threshold is tuned.

    The raw scan collapses to one row per day FIRST, so every join and
    moment below runs on a days-sized frame (365 rows/year no matter the
    corpus).  All five moments per lag are exact DECIMAL sums of integer
    products; r_k is one double division + sqrt over identical inputs.
    Days missing from the data simply contribute no pair (r is over
    observed day pairs)."""
    daily = events.select(
        F.floor(F.unix_millis("ts") / F.lit(86_400_000)).cast("long").alias("day")
    ).groupBy("day").agg(F.count(F.lit(1)).cast("long").alias("n"))
    lags = (
        daily.sparkSession.range(1, max_lag + 1)
        .select(F.col("id").cast("long").alias("lag"))
    )
    x = daily.select(F.col("day").alias("day0"), F.col("n").alias("x"))
    y = daily.select(F.col("day").alias("day1"), F.col("n").alias("y"))
    pairs = (
        x.crossJoin(broadcast(lags))
        .withColumn("day1", F.col("day0") + F.col("lag"))
        .join(y, "day1")
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")
    m = (
        pairs.groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.sum(d("x")).alias("sx"),
            F.sum(d("y")).alias("sy"),
            F.sum(d("x") * d("y")).alias("sxy"),
            F.sum(d("x") * d("x")).alias("sxx"),
            F.sum(d("y") * d("y")).alias("syy"),
        )
    )
    np_ = F.col("n_pairs").cast("decimal(38,0)")
    cov = (np_ * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (np_ * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (np_ * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        F.col("lag").alias("lag_days"),
        "n_pairs",
        F.round(F.try_divide(cov, F.sqrt(vx * vy)), 6).alias("acf"),
    )


def benford_digit_stats(df: DataFrame, value_col: str) -> DataFrame:
    """First-significant-digit distribution of a positive numeric column
    against Benford's law — the classic data-quality / fabrication probe
    for financial-style magnitudes (Newcomb 1881, Benford 1938).

    Digit extraction stays in the exact integer domain: values become
    integer CENTS, the digit is the first character of the integer's
    decimal string (both engines print integers identically — no float
    formatting involved).  The cent quantization defines the semantics
    at both edges: values that round below one cent carry no first
    digit and are excluded (filtering on `cents >= 1`, not the raw
    value — a 0.004 would otherwise quantize to digit 0 and divide by
    zero), and a value within half a cent below a power of ten takes
    the rounded-up digit (9.997 -> 1000 cents -> digit 1), which is the
    correct digit OF THE QUANTIZED VALUE both engines share.  p_obs is
    an exact BIGINT ratio; p_benford = log10(1+1/d) over nine small-int
    inputs; deviations are computed from the 6-dp-rounded probabilities
    so the comparison is engine-stable.  One scan, nine-row output."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    per = (
        df.select(cents.alias("cents"))
        .filter(F.col("cents") >= 1)
        .select(
            F.substring(F.col("cents").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    )
    tot = per.agg(F.sum("n_obs").cast("long").alias("n_total"))
    p_obs = F.round(
        F.col("n_obs").cast("double") / F.col("n_total").cast("double"), 6
    )
    p_ben = F.round(
        F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")), 6
    )
    return (
        per.crossJoin(broadcast(tot))
        .select(
            "digit",
            "n_obs",
            p_obs.alias("p_obs"),
            p_ben.alias("p_benford"),
        )
        .withColumn(
            "abs_dev", F.round(F.abs(F.col("p_obs") - F.col("p_benford")), 6)
        )
    )


def dow_adjusted_anomalies(
    events: DataFrame, z_threshold: float = 2.0
) -> DataFrame:
    """Seasonality-adjusted daily anomaly flags: each (event_type, day)
    count is z-scored against the baseline of the SAME WEEKDAY
    (epoch-day mod 7), so a quiet Sunday is not an incident and a Sunday
    spike is not hidden by the weekday mean — the day-of-week-aware
    complement to the global `zscore_anomaly_events`.

    Baseline moments are exact integer sums per (type, dow): mean and
    sample variance come from (n, Σx, Σx²) in DECIMAL, so both engines
    z-score identical doubles.  A (type, dow) cell with fewer than two
    observations has undefined variance and flags nothing (try_divide
    -> NULL).  The baseline table is |types| x 7 rows — broadcast."""
    daily = (
        events.select(
            "event_type",
            F.floor(F.unix_millis("ts") / F.lit(86_400_000)).cast("long").alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")
    base = daily.groupBy(
        "event_type", (F.col("day") % 7).alias("dow")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_base"),
        F.sum(d("n_events")).alias("sx"),
        F.sum(d("n_events") * d("n_events")).alias("sxx"),
    )
    j = daily.withColumn("dow", F.col("day") % 7).join(
        broadcast(base), ["event_type", "dow"]
    )
    nb = F.col("n_base").cast("decimal(38,0)")
    mean = F.col("sx").cast("double") / F.col("n_base").cast("double")
    # try_divide on BOTH divisions: a (type, dow) cell observed on a
    # single day has n_base*(n_base-1) = 0, which under ANSI mode would
    # abort the whole query with DIVIDE_BY_ZERO instead of flagging
    # nothing
    var = F.try_divide(
        (nb * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"),
        (F.col("n_base") * (F.col("n_base") - 1)).cast("double"),
    )
    z = F.try_divide(F.col("n_events").cast("double") - mean, F.sqrt(var))
    return (
        j.withColumn("zscore", z)
        .filter(F.abs(F.col("zscore")) > z_threshold)
        .select(
            "event_type",
            "day",
            "n_events",
            "n_base",
            F.round("zscore", 6).alias("zscore"),
        )
    )


def ccf_daily_counts(
    events: DataFrame,
    type_a: str = "click",
    type_b: str = "purchase",
    max_lag: int = 7,
) -> DataFrame:
    """Cross-correlation between two event types' daily-count series at
    lags 0..max_lag (does `type_a` today predict `type_b` k days
    later?) — the lead-lag probe behind "do clicks forecast purchases",
    the two-series generalization of `acf_daily_counts`.

    Identical exactness shape: the scan collapses to days-sized series
    first, all five moments per lag are exact 128-bit integer sums, and
    r_k is one double division + sqrt on identical inputs.  Days where
    either series is missing contribute no pair."""
    def series(t: str, day: str, val: str) -> DataFrame:
        return (
            events.filter(F.col("event_type") == t)
            .select(
                F.floor(F.unix_millis("ts") / F.lit(86_400_000))
                .cast("long")
                .alias(day)
            )
            .groupBy(day)
            .agg(F.count(F.lit(1)).cast("long").alias(val))
        )

    da = series(type_a, "day0", "x")
    db = series(type_b, "day1", "y")
    lags = (
        events.sparkSession.range(0, max_lag + 1)
        .select(F.col("id").cast("long").alias("lag"))
    )
    pairs = (
        da.crossJoin(broadcast(lags))
        .withColumn("day1", F.col("day0") + F.col("lag"))
        .join(db, "day1")
    )
    d = lambda c: F.col(c).cast("decimal(38,0)")
    m = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum(d("x")).alias("sx"),
        F.sum(d("y")).alias("sy"),
        F.sum(d("x") * d("y")).alias("sxy"),
        F.sum(d("x") * d("x")).alias("sxx"),
        F.sum(d("y") * d("y")).alias("syy"),
    )
    np_ = F.col("n_pairs").cast("decimal(38,0)")
    cov = (np_ * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    vx = (np_ * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vy = (np_ * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    return m.select(
        F.col("lag").alias("lag_days"),
        "n_pairs",
        F.round(F.try_divide(cov, F.sqrt(vx * vy)), 6).alias("ccf"),
    )


def user_decile_migration(
    events: DataFrame,
    split_ms: int,
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Engagement-decile migration matrix: each user's activity decile in
    the period BEFORE `split_ms` vs AFTER it, counted per (from, to)
    cell — the retention/churn structure ("are my heavy users going
    quiet") that a plain retention triangle can't show.  Decile 0 means
    inactive in that half; decile 10 is the most active band.

    Scale discipline: deciles are VALUE-based equi-depth bands computed
    from the count-of-counts histogram — the cumulative window runs over
    the (half, activity-count) DOMAIN (bounded by distinct per-user
    event counts), never over the user population, so there is no
    corpus-sized single-partition ntile (the trap the histogram shape
    exists to avoid).  Users sharing an activity count share a decile,
    which also makes the banding deterministic without an arbitrary
    tiebreak.  Everything is integer counts — exact in any engine."""
    half = F.when(F.unix_millis(F.col(ts_col)) < F.lit(split_ms), 1).otherwise(2)
    per = (
        events.select(F.col(user_col).alias("u"), half.alias("h"))
        .groupBy("u", "h")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    hist = per.groupBy("h", "n").agg(F.count(F.lit(1)).cast("long").alias("nu"))
    totals = per.groupBy("h").agg(F.count(F.lit(1)).cast("long").alias("n_half"))
    w = Window.partitionBy("h").orderBy("n").rowsBetween(
        Window.unboundedPreceding, 0
    )
    mapping = (
        hist.withColumn("cum", F.sum("nu").over(w))
        .join(broadcast(totals), "h")
        .select(
            "h",
            "n",
            F.ceil(F.lit(10) * F.col("cum") / F.col("n_half"))
            .cast("int")
            .alias("decile"),
        )
    )
    banded = per.join(mapping, ["h", "n"]).select("u", "h", "decile")
    d1 = banded.filter(F.col("h") == 1).select("u", F.col("decile").alias("d1"))
    d2 = banded.filter(F.col("h") == 2).select("u", F.col("decile").alias("d2"))
    return (
        d1.join(d2, "u", "full_outer")
        .select(
            F.coalesce("d1", F.lit(0)).alias("decile_before"),
            F.coalesce("d2", F.lit(0)).alias("decile_after"),
        )
        .groupBy("decile_before", "decile_after")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )


def _daily_counts(events: DataFrame) -> DataFrame:
    """Per-type daily event counts with epoch-day keys (the shared base
    for the forecasting/trend family)."""
    return (
        events.withColumn(
            "day", F.floor(F.unix_millis("ts") / F.lit(86_400_000)).cast("long")
        )
        .groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )


def holt_trend_daily(
    events: DataFrame, alpha: float = 0.5, beta: float = 0.2
) -> DataFrame:
    """Holt's linear (double-exponential) smoothing per event type over
    the daily count series: level + trend state, plus the one-step-ahead
    fitted forecast — the forecasting upgrade of the EWMA entry (which
    tracks level only and lags any trending series by construction).

    Recurrence (classic Holt 1957 form, literal op order shared with the
    recursive-CTE oracle so the doubles fold identically):
      l_1 = x_1,  b_1 = x_2 - x_1 (0 for a one-point series)
      l_t = alpha*x_t + (1-alpha)*(l_{t-1} + b_{t-1})
      b_t = beta*(l_t - l_{t-1}) + (1-beta)*b_{t-1}
      f_t = l_{t-1} + b_{t-1}   (f_1 = x_1)

    Iterative -> applyInPandas per key (the EWMA/CUSUM pattern): the
    recurrence runs over the DAILY frame — one row per day per type,
    bounded by calendar length regardless of corpus scale — and
    parallelizes across keys."""
    import pandas as pd
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    a, b_w = float(alpha), float(beta)
    schema = StructType(
        [
            StructField("event_type", StringType()),
            StructField("day", LongType()),
            StructField("n_events", LongType()),
            StructField("level", DoubleType()),
            StructField("trend", DoubleType()),
            StructField("forecast", DoubleType()),
        ]
    )

    def _one_key(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        xs = [float(v) for v in pdf["n_events"]]
        lvl = xs[0]
        trd = (xs[1] - xs[0]) if len(xs) >= 2 else 0.0
        levels, trends, fcsts = [lvl], [trd], [xs[0]]
        for x in xs[1:]:
            f = lvl + trd
            l_new = a * x + (1.0 - a) * (lvl + trd)
            trd = b_w * (l_new - lvl) + (1.0 - b_w) * trd
            lvl = l_new
            levels.append(lvl)
            trends.append(trd)
            fcsts.append(f)
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"],
                "day": pdf["day"],
                "n_events": pdf["n_events"],
                "level": [round(v, 6) for v in levels],
                "trend": [round(v, 6) for v in trends],
                "forecast": [round(v, 6) for v in fcsts],
            }
        )

    return _daily_counts(events).groupBy("event_type").applyInPandas(_one_key, schema)


def theil_sen_daily_trend(events: DataFrame) -> DataFrame:
    """Theil-Sen robust trend per event type over the daily count
    series: slope = median of all pairwise slopes, intercept = median of
    (x - slope*day) — the estimator that shrugs off the outlier days
    that wreck an OLS fit (29% breakdown point).

    Scale shape: the O(d^2) pair generation runs on the DAILY aggregate
    (d = calendar days, bounded and corpus-scale-independent), joined
    per type — never on raw events.  Exact medians via percentile();
    both engines interpolate lower + frac*(upper-lower) over identical
    double lists, and outputs round to 6dp."""
    daily = (
        _daily_counts(events)
        .withColumn("x", F.col("n_events").cast("double"))
        # eager pin (r13, guide §2.4): both self-join sides and the
        # residual join each re-ran the events scan + daily agg un-pinned
        .transform(pin)
    )
    a, bb = [daily.alias(s) for s in ("a", "b")]
    slopes = (
        a.join(bb, "event_type")
        .filter(F.col("a.day") < F.col("b.day"))
        .select(
            "event_type",
            (
                (F.col("b.x") - F.col("a.x"))
                / (F.col("b.day") - F.col("a.day")).cast("double")
            ).alias("slope"),
        )
    )
    med = slopes.groupBy("event_type").agg(
        F.percentile("slope", F.lit(0.5)).alias("slope"),
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
    )
    resid = daily.join(broadcast(med), "event_type").select(
        "event_type",
        "n_pairs",
        "slope",
        (F.col("x") - F.col("slope") * F.col("day").cast("double")).alias("r"),
    )
    return (
        resid.groupBy("event_type", "n_pairs", "slope")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.percentile("r", F.lit(0.5)).alias("icpt"),
        )
        .select(
            "event_type",
            "n_days",
            "n_pairs",
            F.round("slope", 6).alias("slope"),
            F.round("icpt", 6).alias("intercept"),
        )
    )


def seasonal_naive_errors(events: DataFrame, season_days: int = 7) -> DataFrame:
    """Forecast-skill scorecard of the seasonal-naive baseline
    (forecast(d) = count(d - 7)) per event type: MAE, bias, RMSE, MAPE.
    The standard sanity floor every real forecaster must beat — and the
    drift signal when a series' own weekly rhythm stops predicting it.

    Exactness: errors are integer count differences, so MAE/bias/RMSE
    ride BIGINT sums (order-free); MAPE's rational per-day terms go
    through the picounit floor-quantization used by the PSI/KL entries,
    then one double division each — value-hash reproducible."""
    daily = _daily_counts(events)
    lag = daily.select(
        "event_type",
        (F.col("day") + F.lit(int(season_days))).alias("day"),
        F.col("n_events").alias("n_base"),
    )
    j = daily.join(lag, ["event_type", "day"])
    err = (F.col("n_events") - F.col("n_base")).cast("long")
    quant = 1_000_000_000_000
    mape_term = F.floor(
        F.abs(err).cast("double")
        / F.col("n_events").cast("double")
        * F.lit(float(quant))
        + F.lit(0.5)
    ).cast("long")
    # error sums ride DECIMAL(38,0) (not BIGINT): err*err is ~N^2 per day
    # and the squared-error sum would overflow a long at full corpus
    # scale, where DuckDB's HUGEINT survives — the exact-representation
    # rule applies to every cross-engine sum here.
    agg = j.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum(F.abs(err).cast("decimal(38,0)")).alias("s_abs"),
        F.sum(err.cast("decimal(38,0)")).alias("s_err"),
        # the square must be computed in the decimal domain too — a
        # long*long product overflows before any cast could save it
        F.sum(err.cast("decimal(18,0)") * err.cast("decimal(18,0)")).alias(
            "s_sq"
        ),
        F.sum(mape_term.cast("decimal(38,0)")).alias("s_mape"),
    )
    n = F.col("n_days").cast("double")
    return agg.select(
        "event_type",
        "n_days",
        F.round(F.col("s_abs").cast("double") / n, 6).alias("mae"),
        F.round(F.col("s_err").cast("double") / n, 6).alias("bias"),
        F.round(F.sqrt(F.col("s_sq").cast("double") / n), 6).alias("rmse"),
        F.round(
            F.col("s_mape").cast("double") / F.lit(float(quant)) / n, 6
        ).alias("mape"),
    )


def multitouch_attribution(
    events: DataFrame,
    touch_type: str = "click",
    convert_type: str = "purchase",
    lookback_ms: int = 7 * 86_400_000,
) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution: each purchase's
    value is credited 40/20/40 across the user's clicks in the 7-day
    lookback window (1 click -> 100%, 2 -> 50/50, k>=3 -> first 40%,
    last 40%, middles share 20%), aggregated by the CLICK's hour of day
    — "which hour's engagement earns revenue", the standard marketing
    answer the last-touch-only as-of join cannot give.

    Shape: one equi-join on user_id (hash join; the lookback window is a
    post-join range filter), one window over the purchase id for
    position/count, exact picounit-quantized value sums."""
    t = F.unix_millis("ts")
    touches = events.filter(F.col("event_type") == touch_type).select(
        F.col("user_id"),
        F.col("event_id").alias("touch_id"),
        t.alias("t_ms"),
    )
    convs = events.filter(F.col("event_type") == convert_type).select(
        F.col("user_id"),
        F.col("event_id").alias("conv_id"),
        t.alias("c_ms"),
        F.col("value").alias("c_value"),
    )
    j = touches.join(convs, "user_id").filter(
        (F.col("t_ms") < F.col("c_ms"))
        & (F.col("t_ms") >= F.col("c_ms") - F.lit(int(lookback_ms)))
    )
    w = Window.partitionBy("conv_id")
    ordered = w.orderBy(F.col("t_ms").asc(), F.col("touch_id").asc())
    ranked = j.select(
        "*",
        F.row_number().over(ordered).alias("rnk"),
        F.count(F.lit(1)).over(w).alias("k"),
    )
    k = F.col("k").cast("double")
    weight = (
        F.when(F.col("k") == 1, F.lit(1.0))
        .when(F.col("k") == 2, F.lit(0.5))
        .when(F.col("rnk") == 1, F.lit(0.4))
        .when(F.col("rnk") == F.col("k"), F.lit(0.4))
        .otherwise(F.lit(0.2) / (k - F.lit(2.0)))
    )
    quant = 1_000_000_000_000
    term = F.floor(
        F.col("c_value") * weight * F.lit(float(quant)) + F.lit(0.5)
    ).cast("decimal(38,0)")
    hour = F.expr("CAST((t_ms % 86400000) DIV 3600000 AS INT)")
    return (
        ranked.select(hour.alias("click_hour"), term.alias("term"))
        .groupBy("click_hour")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.round(
                F.sum("term").cast("double") / F.lit(float(quant)), 6
            ).alias("attributed_value"),
        )
    )


def seasonal_trend_anomalies(events: DataFrame) -> DataFrame:
    """STL-style robust decomposition of the daily count series per
    event type — seasonal (day-of-week mean), trend (Theil-Sen on the
    seasonally adjusted series), residual — with MAD-based outlier
    flags: |resid - median(resid)| > 3 * 1.4826 * MAD.  The composition
    answer to "was Tuesday actually anomalous, or is it just Tuesday?"
    that neither the z-score entry (no seasonality) nor the DOW entry
    (no trend) gives alone.

    Every stage is robust: the weekday seasonal is the per-(type, dow)
    MEDIAN (a mean would let one spike lift its whole weekday and
    shadow-flag the spike's siblings), the trend is Theil-Sen, the gate
    is MAD.  Exactness chain (every float op single and order-free):
    all medians are exact percentile() interpolations over identical
    doubles; adjusted = count - median (one subtract); residual =
    adj - (slope*day + intercept), literal op order mirrored in the
    oracle."""
    # CTE-reuse (VERDICT r6 #7: this plan carried 147 exchanges, all
    # re-derivations of these tiny calendar-domain frames): pin the daily
    # series once — the ONE data-sized pass — and every multiply-read
    # derivative after it; each is |types| x |days| rows.
    daily = (
        _daily_counts(events)
        .withColumn("dow", F.pmod(F.col("day"), F.lit(7)).cast("int"))
        .transform(pin)
    )
    dowm = daily.groupBy("event_type", "dow").agg(
        F.percentile(F.col("n_events").cast("double"), F.lit(0.5)).alias(
            "dow_mean"
        )
    )
    adj = (
        daily.join(broadcast(dowm), ["event_type", "dow"])
        .select(
            "event_type",
            "day",
            "n_events",
            (F.col("n_events").cast("double") - F.col("dow_mean")).alias("adj"),
        )
        .transform(pin)
    )
    a, bb = [adj.alias(s) for s in ("a", "b")]
    slopes = (
        a.join(bb, "event_type")
        .filter(F.col("a.day") < F.col("b.day"))
        .select(
            "event_type",
            (
                (F.col("b.adj") - F.col("a.adj"))
                / (F.col("b.day") - F.col("a.day")).cast("double")
            ).alias("slope"),
        )
    )
    med = slopes.groupBy("event_type").agg(
        F.percentile("slope", F.lit(0.5)).alias("slope")
    )
    resid = (
        adj.join(broadcast(med), "event_type")
        .select(
            "event_type",
            "day",
            "n_events",
            "adj",
            "slope",
            (
                F.col("adj")
                - (F.col("slope") * F.col("day").cast("double"))
            ).alias("detr_pre"),
        )
        .transform(pin)
    )
    icpt = resid.groupBy("event_type").agg(
        F.percentile("detr_pre", F.lit(0.5)).alias("icpt")
    )
    r2 = (
        resid.join(broadcast(icpt), "event_type")
        .select(
            "event_type",
            "day",
            "n_events",
            (F.col("detr_pre") - F.col("icpt")).alias("resid"),
        )
        .transform(pin)
    )
    mstats = r2.groupBy("event_type").agg(
        F.percentile("resid", F.lit(0.5)).alias("med_r")
    )
    r3 = (
        r2.join(broadcast(mstats), "event_type")
        .withColumn("dev", F.abs(F.col("resid") - F.col("med_r")))
        .transform(pin)
    )
    mad = r3.groupBy("event_type").agg(
        F.percentile("dev", F.lit(0.5)).alias("mad")
    )
    return (
        r3.join(broadcast(mad), "event_type")
        .select(
            "event_type",
            "day",
            "n_events",
            F.round("resid", 6).alias("resid"),
            (F.col("dev") > F.lit(3.0) * F.lit(1.4826) * F.col("mad")).alias(
                "anomaly"
            ),
        )
    )


def churn_label_features(
    events: DataFrame, feature_weeks: int = 3
) -> DataFrame:
    """The standard churn-model training frame: per user active in the
    feature window (first `feature_weeks` weeks of the corpus), weekly
    activity counts, type diversity, purchase count, and exact decayed
    spend — with the LABEL (churned = zero events after the feature
    window).  Featurization + label generation as one plan: the step
    between raw telemetry and any churn model, and the shape every
    label-leakage audit runs on (features read only the feature window;
    the label reads only the holdout window).

    One pass: conditional aggregation against the broadcast corpus min
    day; value sums ride DECIMAL(28,6)."""
    min_day = events.agg(
        F.floor(F.min(F.unix_millis("ts")) / F.lit(86_400_000))
        .cast("long")
        .alias("min_day")
    )
    day = F.floor(F.unix_millis("ts") / F.lit(86_400_000)).cast("long")
    rel_week = F.floor((day - F.col("min_day")) / F.lit(7)).cast("int")
    in_feat = rel_week < feature_weeks
    base = events.crossJoin(broadcast(min_day)).select(
        "user_id",
        "event_type",
        "value",
        rel_week.alias("rel_week"),
        in_feat.alias("in_feat"),
    )
    agg = base.groupBy("user_id").agg(
        *[
            F.sum(F.when(F.col("rel_week") == w, 1).otherwise(0))
            .cast("long")
            .alias(f"n_events_w{w + 1}")
            for w in range(feature_weeks)
        ],
        F.count_distinct(F.when(F.col("in_feat"), F.col("event_type")))
        .cast("long")
        .alias("n_types"),
        F.sum(
            F.when(
                F.col("in_feat") & (F.col("event_type") == "purchase"), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_purchases"),
        F.sum(
            F.when(F.col("in_feat"), F.col("value"))
            .otherwise(F.lit(0.0))
            .cast("decimal(28,6)")
        )
        .cast("double")
        .alias("feat_value"),
        F.sum(F.when(~F.col("in_feat"), 1).otherwise(0))
        .cast("long")
        .alias("n_after"),
    )
    feat_cols = [f"n_events_w{w + 1}" for w in range(feature_weeks)]
    return (
        agg.filter(
            sum(F.col(c) for c in feat_cols) > 0
        )  # population: active in the feature window
        .select(
            "user_id",
            *feat_cols,
            "n_types",
            "n_purchases",
            F.round("feat_value", 6).alias("feat_value"),
            (F.col("n_after") == 0).alias("churned"),
        )
    )


def conversion_latency_quantiles(
    events: DataFrame,
    touch_type: str = "click",
    convert_type: str = "purchase",
    lookback_ms: int = 7 * 86_400_000,
) -> DataFrame:
    """Click-to-purchase latency distribution by purchase day-of-week:
    for each conversion, latency to the user's LAST preceding touch in
    the lookback window (the as-of pairing), then exact p50/p90/p99
    quantiles per weekday — the funnel-health number product teams
    watch (a latency distribution stretching out precedes a conversion
    drop).  One user_id hash join, one max-per-conversion aggregation,
    exact percentile interpolation over integer millisecond latencies."""
    t = F.unix_millis("ts")
    touches = events.filter(F.col("event_type") == touch_type).select(
        F.col("user_id"), t.alias("t_ms")
    )
    convs = events.filter(F.col("event_type") == convert_type).select(
        F.col("user_id"),
        F.col("event_id").alias("conv_id"),
        t.alias("c_ms"),
    )
    paired = (
        convs.join(touches, "user_id")
        .filter(
            (F.col("t_ms") < F.col("c_ms"))
            & (F.col("t_ms") >= F.col("c_ms") - F.lit(int(lookback_ms)))
        )
        .groupBy("conv_id", "c_ms")
        .agg(F.max("t_ms").alias("last_touch_ms"))
        .select(
            F.expr("CAST((c_ms % 604800000) DIV 86400000 AS INT)").alias("dow"),
            (F.col("c_ms") - F.col("last_touch_ms"))
            .cast("double")
            .alias("latency_ms"),
        )
    )
    return paired.groupBy("dow").agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        F.round(F.percentile("latency_ms", F.lit(0.5)), 6).alias("p50_ms"),
        F.round(F.percentile("latency_ms", F.lit(0.9)), 6).alias("p90_ms"),
        F.round(F.percentile("latency_ms", F.lit(0.99)), 6).alias("p99_ms"),
    )
