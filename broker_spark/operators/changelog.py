"""Changelog / warehouse-maintenance operators: SCD2 interval builds and
CDC (change-data-capture) log application.

These are the table-maintenance shapes a training-data pipeline needs
around its relational store: collapsing an append-only attribute log into
slowly-changing-dimension (type 2) effective-dated rows, and replaying an
ordered upsert/delete changelog into current-state.  Reference parity:
the reference's storage layer materializes current state from an
append-only message log per (stream, partition) the same way
(`/root/reference/src/storage/` bucket accumulation); SCD2/CDC are the
standard warehouse formulations of that replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def scd2_intervals(
    log: DataFrame,
    key_col: str = "user_id",
    attr_col: str = "event_type",
    ts_col: str = "ts",
    tie_col: str = "event_id",
) -> DataFrame:
    """Slowly-changing-dimension type-2 build: collapse an append-only
    per-key attribute log into effective-dated rows — one row per
    maximal run of equal `attr_col` values, with ``effective_from`` /
    ``effective_to`` (next run's start, NULL while current) and an
    ``is_current`` flag.

    Gaps-and-islands via two per-key windows: a lag() change marker, a
    running sum to number the runs, then one aggregation.  All windows
    partition by the key, so state per task is one key's history — no
    global sort, no skew beyond the hottest single key.  Determinism:
    ties on `ts_col` break on `tie_col` (a total order per key).
    """
    order = [F.col(ts_col), F.col(tie_col)]
    w = Window.partitionBy(key_col).orderBy(*order)
    marked = log.select(key_col, attr_col, ts_col, tie_col).withColumn(
        "chg",
        F.when(
            F.lag(attr_col).over(w).isNull()
            | (F.lag(attr_col).over(w) != F.col(attr_col)),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    runs = marked.withColumn("run_id", F.sum("chg").over(w))
    grouped = runs.groupBy(key_col, "run_id", attr_col).agg(
        F.min(ts_col).alias("effective_from"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )
    w_runs = Window.partitionBy(key_col).orderBy("run_id")
    return grouped.select(
        F.col(key_col),
        F.col(attr_col),
        "effective_from",
        F.lead("effective_from").over(w_runs).alias("effective_to"),
        F.lead("effective_from").over(w_runs).isNull().alias("is_current"),
        "n_events",
    )


def cdc_apply_final_state(
    changelog: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tie_col: str = "event_id",
    op_col: str = "op",
    value_col: str = "value",
) -> DataFrame:
    """Apply an ordered CDC changelog (``op`` in {'upsert','delete'}) to
    produce final current-state: one row per key whose LAST operation is
    an upsert, carrying that operation's value; keys whose last op is a
    delete are absent.

    One per-key window (row_number desc over the (ts, tie) total order)
    plus a filter — the keyed-log replay at the heart of merge-on-read
    table formats, expressed so the only shuffle is the window's hash
    partition on the key.  At 100 TB the same plan holds: state per task
    is one key's tail, and a compaction would simply checkpoint the
    window's output.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), F.col(tie_col).desc()
    )
    last = (
        changelog.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .filter(F.col(op_col) == "upsert")
    )
    n_ops = changelog.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_ops")
    )
    return (
        last.join(n_ops, key_col)
        .select(
            F.col(key_col),
            F.col(ts_col).alias("updated_at"),
            F.round(F.col(value_col), 6).alias("value"),
            "n_ops",
        )
    )
