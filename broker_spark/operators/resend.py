"""Resend query family: requestLast / requestFrom / requestRange.

This is the reference's core read path (`src/storage/Storage.ts:101-435`),
re-expressed declaratively so Catalyst picks the physical strategy:

- requestLast  -> orderBy desc + limit => TakeOrderedAndProject (the Spark
  analog of the reference's newest-first bucket walk + `LIMIT ?`,
  src/storage/Storage.ts:140-181, with early termination for free from
  limit pushdown + parquet min/max stats).
- requestFrom / requestRange -> a single boolean predicate replaces the
  reference's 2-3 separate CQL scans merged with `merge2`
  (src/storage/Storage.ts:292-330, 368-410).

Ordering contract: `(ts, sequence_no, publisher_id, msg_chain_id)` ascending
(src/storage/Storage.ts:111; golden ordering asserted in
test/integration/storage/Storage.test.ts:180-229).

Scale notes: every function filters on `stream_id`, `partition` and (via
`bucket_range_predicate`) the derived `bucket` partition column, so on a
partitioned table the scan prunes to exactly the directories a 100 TB table
would need to touch; predicates on `ts`/`sequence_no` additionally push
down to parquet row-group min/max stats.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from broker_spark.schema import (
    DEFAULT_BUCKET_MS,
    MAX_SEQUENCE_NUMBER_VALUE,
    MIN_SEQUENCE_NUMBER_VALUE,
    ORDERING_COLUMNS,
    bucket_range_predicate,
    millis_ts,
)

# Reference clamps resend-last at 10k — src/storage/Storage.ts:18,102-105
MAX_RESEND_LAST = 10_000


def _bucket_pruning(df: DataFrame, from_ms, to_ms, bucket_ms: int) -> Column:
    """Partition pruning on the derived `bucket` column — semantically
    redundant with the ts predicate (bucket = f(ts)), but it's what lets
    Catalyst skip directories on a partitioned table.  Skipped when the
    frame has no bucket column (e.g. in-memory test frames)."""
    if "bucket" not in df.columns:
        return F.lit(True)
    return bucket_range_predicate(from_ms, to_ms, bucket_ms)


def _stream_partition_predicate(stream_id: str, partition: int) -> Column:
    """F1: every query constrains stream and partition
    (src/storage/Storage.ts:109-110)."""
    return (F.col("stream_id") == F.lit(stream_id)) & (
        F.col("partition") == F.lit(partition)
    )


def _publisher_predicate(publisher_id: str | None, msg_chain_id: str | None) -> Column:
    """Optional per-publisher / per-msgChain narrowing
    (src/storage/Storage.ts:295-298: `publisher_id = ? AND msg_chain_id = ?`)."""
    pred = F.lit(True)
    if publisher_id is not None:
        pred = pred & (F.col("publisher_id") == F.lit(publisher_id))
    if msg_chain_id is not None:
        pred = pred & (F.col("msg_chain_id") == F.lit(msg_chain_id))
    return pred


def message_ref_lower_bound(from_ms: int, from_seq: int) -> Column:
    """F4 composite lower bound: `(ts = f AND seq >= fs) OR (ts > f)`.

    The reference runs this as two CQL queries merged in order
    (src/storage/Storage.ts:292-330); one boolean expression suffices and
    still pushes down to parquet as `ts >= f` plus a residual.
    """
    ts, f = F.col("ts"), millis_ts(from_ms)
    return (ts > f) | ((ts == f) & (F.col("sequence_no") >= F.lit(from_seq)))


def message_ref_upper_bound(to_ms: int, to_seq: int) -> Column:
    """F5 composite upper bound: `(ts = t AND seq <= ts2) OR (ts < t)`
    (src/storage/Storage.ts:371-376, third disjunct)."""
    ts, t = F.col("ts"), millis_ts(to_ms)
    return (ts < t) | ((ts == t) & (F.col("sequence_no") <= F.lit(to_seq)))


def ordered(df: DataFrame) -> DataFrame:
    """Apply the total-order contract (T3)."""
    return df.orderBy(*[F.col(c).asc() for c in ORDERING_COLUMNS])


def request_last(
    df: DataFrame,
    stream_id: str,
    partition: int,
    n: int,
    bucket_ms: int = DEFAULT_BUCKET_MS,
) -> DataFrame:
    """T1 requestLast: the last `n` messages in `(ts, sequence_no)` order,
    returned ascending (src/storage/Storage.ts:101-194; desc query at
    109-112, reverse at 130).  `n` clamps at MAX_RESEND_LAST (T2,
    src/storage/Storage.ts:18,102-105).

    Physical plan: TakeOrderedAndProject — each partition produces its local
    top-K, the driver merges; no full sort, no full shuffle.
    """
    n = max(0, min(n, MAX_RESEND_LAST))
    if n == 0:
        return ordered(df.filter(F.lit(False)))
    filtered = df.filter(_stream_partition_predicate(stream_id, partition))
    last_n = filtered.orderBy(
        F.col("ts").desc(),
        F.col("sequence_no").desc(),
        F.col("publisher_id").desc(),
        F.col("msg_chain_id").desc(),
    ).limit(n)
    return ordered(last_n)


def request_from(
    df: DataFrame,
    stream_id: str,
    partition: int,
    from_ms: int,
    from_seq: int = MIN_SEQUENCE_NUMBER_VALUE,
    publisher_id: str | None = None,
    msg_chain_id: str | None = None,
    bucket_ms: int = DEFAULT_BUCKET_MS,
) -> DataFrame:
    """requestFrom: everything at/after a message ref, optionally narrowed to
    one publisher+msgChain (src/storage/Storage.ts:229-330)."""
    pred = (
        _stream_partition_predicate(stream_id, partition)
        & _bucket_pruning(df, from_ms, None, bucket_ms)
        & message_ref_lower_bound(from_ms, from_seq)
        & _publisher_predicate(publisher_id, msg_chain_id)
    )
    return ordered(df.filter(pred))


def request_range(
    df: DataFrame,
    stream_id: str,
    partition: int,
    from_ms: int,
    from_seq: int,
    to_ms: int,
    to_seq: int = MAX_SEQUENCE_NUMBER_VALUE,
    publisher_id: str | None = None,
    msg_chain_id: str | None = None,
    bucket_ms: int = DEFAULT_BUCKET_MS,
) -> DataFrame:
    """requestRange: 3-way composite range
    `(ts=f & seq>=fs) U (f<ts<t) U (ts=t & seq<=ts2)` plus optional
    publisher/msgChain equality (src/storage/Storage.ts:332-410; CQL at
    371-376).  One scan, one boolean expression — the reference's three
    merged result streams (`merge2`, T5) are unnecessary on Spark.
    """
    pred = (
        _stream_partition_predicate(stream_id, partition)
        & _bucket_pruning(df, from_ms, to_ms, bucket_ms)
        & message_ref_lower_bound(from_ms, from_seq)
        & message_ref_upper_bound(to_ms, to_seq)
        & _publisher_predicate(publisher_id, msg_chain_id)
    )
    return ordered(df.filter(pred))
