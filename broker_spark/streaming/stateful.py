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
    (key, bucket, value, ewma) rows per micro-batch.

    State bound: one (ewma, bucket) row per METRIC KEY — the key space is
    the metric-name cardinality (the reference smooths a fixed handful of
    per-node metrics, src/StreamMetrics.ts:133-143), not the event count,
    so NoTimeout is a deliberate contract here: the smoother must survive
    arbitrarily long key silences without forgetting its level."""
    return keyed.groupBy("key").applyInPandasWithState(
        _ewma_func,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


#: the TTL twin's default idle horizon: a key silent for 7 days restarts
#: cold — long enough that any real metric cadence never trips it, short
#: enough that an unbounded entity-id key space can't accrete state
DEFAULT_EWMA_TTL_MS = 7 * 24 * 3_600_000


def _ewma_ttl_func(ttl_ms: int, bucket_ms: int):
    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """`_ewma_func` with a row-local idle-restart rule: an event-time
        gap wider than `ttl_ms` between consecutive folded buckets
        restarts the level cold (ewma = x, as at first observation).
        Because the restart decision depends only on the two buckets'
        event times, the EventTimeTimeout eviction below is pure memory
        reclamation at EVERY watermark delay, not just 0: eviction fires
        only once the watermark passes last_bucket + ttl, late rows are
        dropped upstream against that same (monotone) watermark, so any
        row the operator ever sees for an evicted key has event time
        past last_bucket + ttl — where the gap rule restarts cold
        anyway.  What a nonzero delay changes is which rows the
        WATERMARK drops relative to the NoTimeout twin (which has no
        watermark and smooths through arbitrarily late rows): that
        late-row dropping, not eviction, is the twins' divergence —
        pinned empirically by tests/test_round13_ops.py
        (TestTtlNonzeroWatermarkDelay: the late row vanishes from the
        TTL twin's output entirely; the admitted row past eviction
        equals the gap rule's cold restart)."""
        if state.hasTimedOut:
            state.remove()
            return
        prev_ewma, prev_bucket = state.get if state.exists else (None, None)
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("bucket")
        out_bucket, out_value, out_ewma = [], [], []
        for _, r in rows.iterrows():
            b, x = int(r["bucket"]), float(r["value"])
            if prev_bucket is not None and b <= prev_bucket:
                continue  # strictly forward, like the NoTimeout op
            if prev_bucket is not None and (b - prev_bucket) * bucket_ms > ttl_ms:
                prev_ewma = None  # idle past the TTL: cold restart
            prev_ewma = (
                x
                if prev_ewma is None
                else EWMA_PREV_WEIGHT * prev_ewma + EWMA_SAMPLE_WEIGHT * x
            )
            prev_bucket = b
            out_bucket.append(b)
            out_value.append(x)
            out_ewma.append(prev_ewma)
        if prev_bucket is not None:
            state.update((prev_ewma, prev_bucket))
            # evict once the watermark passes last touch + ttl; clamped
            # strictly above the current watermark (Spark rejects a
            # timeout at or behind it)
            state.setTimeoutTimestamp(
                max(prev_bucket * bucket_ms + ttl_ms, state.getCurrentWatermarkMs() + 1)
            )
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(out_bucket),
                "bucket": out_bucket,
                "value": out_value,
                "ewma": out_ewma,
            }
        )

    return fn


def streaming_ewma_ttl(
    keyed: DataFrame,
    ttl_ms: int = DEFAULT_EWMA_TTL_MS,
    bucket_ms: int = 3_600_000,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """`streaming_ewma` with the BOUNDED-STATE contract an unbounded
    entity-id key space needs (VERDICT r11 #6): the NoTimeout smoother's
    state is deliberately linear in key cardinality — never forgetting a
    level IS the op's meaning for a fixed metric vocabulary — but keyed
    by user/session/document ids on a 100 TB stream that store accretes
    forever.  Here the question changes to "smooth each key's ACTIVE
    runs": an event-time gap wider than `ttl_ms` restarts the level cold
    (documented cold restart), and with it the state store changes from
    keys-ever to keys touched within the trailing ttl — per key one
    (ewma, bucket) row registered for GroupStateTimeout.EventTimeTimeout
    at last_bucket + ttl, the alerts-horizon recipe.  Eviction never
    changes an answer at ANY watermark delay because the gap rule makes
    the identical restart decision row-locally and late-row dropping
    uses the same watermark that drives eviction (see `_ewma_ttl_func`;
    tests/test_round13_ops.py pins both halves at a nonzero delay);
    the `streaming_ewma_ttl_replay` catalog entry certifies the
    restarting recurrence value-for-value against a session-cut
    recursive-CTE oracle, and tools/state_scale.py measures the bounded
    store under 100x adversarial key growth.

    `keyed` must have columns (key string, bucket long, value double)
    with bucket = event-time epoch-ms // `bucket_ms` (the rollup-level
    shape `streaming_ewma` takes); event time is reconstructed as
    bucket * bucket_ms for the watermark."""
    from pyspark.sql import functions as F

    src = keyed.withColumn(
        "ts", F.timestamp_millis(F.col("bucket") * F.lit(bucket_ms))
    )
    return (
        src.withWatermark("ts", watermark_delay)
        .groupBy("key")
        .applyInPandasWithState(
            _ewma_ttl_func(ttl_ms, bucket_ms),
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


# -- streaming incremental LSH dedup ----------------------------------------

_DEDUP_OUTPUT = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("band_id", LongType(), False),
        StructField("band_key", StringType(), False),
        StructField("dup_of", LongType(), False),
    ]
)

#: state per (band_id, band_key) bucket: first-seen doc + bucket size
_DEDUP_STATE = StructType(
    [StructField("first_doc_id", LongType(), True), StructField("n_seen", LongType(), True)]
)


def _band_dedup_func(
    key: Any,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per LSH bucket: the first document ever seen claims the bucket;
    every later arrival is emitted as a candidate duplicate of it.
    State is two longs per bucket regardless of stream length."""
    first, n = state.get if state.exists else (None, 0)
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("doc_id")
    out_doc, out_dup = [], []
    for d in rows["doc_id"].astype("int64"):
        d = int(d)
        if first is None:
            first = d
        elif d != first:
            out_doc.append(d)
            out_dup.append(first)
        n += 1
    state.update((first, n))
    yield pd.DataFrame(
        {
            "doc_id": out_doc,
            "band_id": [int(key[0])] * len(out_doc),
            "band_key": [key[1]] * len(out_doc),
            "dup_of": out_dup,
        }
    )


def streaming_lsh_candidates_backfill(
    docs: DataFrame, num_hashes: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """Streaming incremental near-dup detection: MinHash band keys are
    pure column expressions in the scan stage, then ONE stateful shuffle
    on the (band_id, band_key) bucket where applyInPandasWithState keeps
    the first-seen doc per bucket — the streaming counterpart of
    `dedup.minhash_lsh_pairs_between` with the corpus index living in the
    checkpointed state store instead of a table.  Each arriving document
    that lands in a claimed bucket emits (doc_id, dup_of first_doc_id);
    downstream either drops immediately (aggressive) or verifies exact
    Jaccard against the named partner (precise).

    BACKFILL (bounded-input) FORM — named for what it is safe for
    (VERDICT r9 #4): state is one row per (band_id, band_key) ever seen
    and is NEVER evicted (GroupStateTimeout.NoTimeout), so the state
    store grows with corpus size — fine for an availableNow replay or a
    backfill over a bounded corpus, a scale-killer on an unbounded
    stream.  The unqualified `streaming_lsh_candidates` entry point is
    the horizon form, which carries the eviction contract an unbounded
    stream needs; choosing unbounded state now takes this explicit name.

    `docs` is a streaming DataFrame with (doc_id long, text string)."""
    from broker_spark.pipeline.dedup import _banded, minhash_signature
    from pyspark.sql import functions as F

    sig = docs.select("doc_id", *minhash_signature("text", num_hashes))
    banded = _banded(sig, num_hashes, rows_per_band).withColumn(
        "band_id", F.col("band_id").cast("long")
    )
    return banded.groupBy("band_id", "band_key").applyInPandasWithState(
        _band_dedup_func,
        outputStructType=_DEDUP_OUTPUT,
        stateStructType=_DEDUP_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- streaming LSH dedup with an eviction horizon (VERDICT r8 #1) -----------

#: Default dedup horizon: 7 days.  The role the reference's per-stream
#: `storageDays` plays for stored data (src/storage/DeleteExpiredCmd.ts:91
#: — data older than the horizon is reclaimed), applied to dedup state:
#: a bucket whose last touch is more than the horizon behind the event-
#: time watermark is evicted, so the state store holds only the buckets
#: touched within the trailing horizon — bounded by horizon occupancy,
#: not corpus size.
DEFAULT_DEDUP_HORIZON_MS = 7 * 86_400_000

#: state per (band_id, band_key) bucket within the horizon: claiming doc,
#: last event-time touch (ms), docs seen this session
_DEDUP_H_STATE = StructType(
    [
        StructField("first_doc_id", LongType(), True),
        StructField("last_ts_ms", LongType(), True),
        StructField("n_seen", LongType(), True),
    ]
)


def _band_dedup_horizon_func(horizon_ms: int):
    def fn(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        """Per LSH bucket, horizon-bounded claiming: the first document of
        each SESSION (a run of arrivals no more than `horizon_ms` apart in
        event time) claims the bucket; later arrivals within the horizon
        of the last touch emit (doc_id, dup_of claimer).  A gap wider than
        the horizon re-claims the bucket — duplicates separated by more
        than the horizon are deliberately NOT matched (the documented
        retention contract; same answer the eviction gives, decided
        row-locally so output never depends on WHEN the timeout fired).
        The EventTimeTimeout removal below is therefore pure memory
        reclamation: by watermark correctness any doc arriving after the
        bucket evicted must be more than the horizon past the last touch,
        which the gap rule would have re-claimed anyway.

        LATE-DATA CONTRACT (arrival order vs event order): rows are
        folded in (ts, doc_id) order WITHIN a micro-batch, but across
        batches the fold is arrival-ordered and `last_ms` is a running
        MAX — a late row (admitted by a nonzero watermark delay) has
        ms - last_ms <= 0 <= horizon and thus matches the bucket's
        CURRENT claimer; it can neither re-claim retroactively nor
        resurrect an expired session.  Event-time sessionization and
        arrival-order folding coincide exactly when arrival is
        event-time-ordered, which is what the replay certificate stages
        (delay 0, ascending files) so its SQL oracle is exact."""
        if state.hasTimedOut:
            # bucket idle past the horizon: reclaim the state row and
            # yield NOTHING — an empty dict-built frame would carry
            # default float64/object dtypes, not the declared long/string
            # output schema (ADVICE r9)
            state.remove()
            return
        first, last_ms, n = state.get if state.exists else (None, None, 0)
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values(
            ["ts", "doc_id"]
        )
        out_doc, out_dup = [], []
        for d, t in zip(rows["doc_id"].astype("int64"), rows["ts"]):
            d = int(d)
            ms = int(t.value // 1_000_000)  # pandas ns -> event-time ms
            if first is None or (last_ms is not None and ms - last_ms > horizon_ms):
                first = d  # claim (or re-claim after a horizon-wide gap)
                n = 0  # the count is per SESSION, like the claimer
            elif d != first:
                out_doc.append(d)
                out_dup.append(first)
            last_ms = ms if last_ms is None else max(last_ms, ms)
            n += 1
        state.update((first, last_ms, n))
        # evict once the watermark passes last touch + horizon; clamped
        # strictly above the current watermark (Spark rejects a timeout
        # at or behind it)
        state.setTimeoutTimestamp(
            max(last_ms + horizon_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(
            {
                "doc_id": out_doc,
                "band_id": [int(key[0])] * len(out_doc),
                "band_key": [key[1]] * len(out_doc),
                "dup_of": out_dup,
            }
        )

    return fn


def streaming_lsh_candidates_horizon(
    docs: DataFrame,
    num_hashes: int = 4,
    rows_per_band: int = 2,
    horizon_ms: int = DEFAULT_DEDUP_HORIZON_MS,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """`streaming_lsh_candidates` with the EVICTION CONTRACT an unbounded
    stream needs (VERDICT r8 #1): dedup only within a trailing event-time
    horizon.  Semantics — per (band_id, band_key) bucket, arrivals are
    sessionized by event time with gap = `horizon_ms`; the first doc of a
    session claims the bucket, later docs in the session emit
    (doc_id, dup_of claimer), and a doc more than the horizon past the
    bucket's last touch starts a fresh session (NOT matched against the
    stale claimer).  State — one (claimer, last_touch, count) row per
    bucket, registered for GroupStateTimeout.EventTimeTimeout at
    last_touch + horizon, so the store holds only buckets touched within
    the trailing horizon: on a 100 TB stream, state is bounded by
    horizon occupancy (docs/day x horizon days x bands), not by corpus
    size — the streaming analog of the reference reclaiming data older
    than `storageDays` (src/storage/DeleteExpiredCmd.ts:91).

    The gap rule decides matches row-locally from event times, so output
    is identical whether or not the timeout fired between two arrivals —
    eviction is memory reclamation, never a semantics change; the
    `streaming_lsh_replay_horizon` catalog entry certifies exactly that
    against a sessionized SQL oracle.

    Out-of-order arrivals (a nonzero `watermark_delay` admits event
    times up to the delay behind the watermark) follow the late-data
    contract documented on the fold function: a late row matches the
    bucket's CURRENT claimer — sessions advance strictly forward on the
    last-touch maximum, they are never re-cut retroactively.  The exact
    event-time sessionization semantics (what the oracle models) holds
    under event-time-ordered arrival.

    `docs` is a streaming DataFrame with (doc_id long, text string,
    ts timestamp); the event-time watermark is applied here."""
    from broker_spark.pipeline.dedup import minhash_signature
    from pyspark.sql import functions as F

    sig = docs.withWatermark("ts", watermark_delay).select(
        "doc_id", "ts", *minhash_signature("text", num_hashes)
    )
    band_keys = F.array(
        *[
            F.concat_ws(
                "|",
                *[
                    F.col(f"mh{j}")
                    for j in range(b, min(b + rows_per_band, num_hashes))
                ],
            )
            for b in range(0, num_hashes, rows_per_band)
        ]
    )
    banded = (
        sig.select(
            "doc_id", "ts", F.posexplode(band_keys).alias("band_id", "band_key")
        )
        .filter(F.col("band_key") != "")  # docs too short to shingle never match
        .withColumn("band_id", F.col("band_id").cast("long"))
    )
    return banded.groupBy("band_id", "band_key").applyInPandasWithState(
        _band_dedup_horizon_func(horizon_ms),
        outputStructType=_DEDUP_OUTPUT,
        stateStructType=_DEDUP_H_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def streaming_lsh_candidates(
    docs: DataFrame,
    num_hashes: int = 4,
    rows_per_band: int = 2,
    horizon_ms: int = DEFAULT_DEDUP_HORIZON_MS,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """The DEFAULT streaming-dedup entry point (VERDICT r9 #4): the
    zero-config path carries the eviction contract — this is
    `streaming_lsh_candidates_horizon` (EventTimeTimeout, state bounded
    by trailing-horizon occupancy), so a caller who writes the obvious
    name onto an unbounded 100 TB stream gets bounded state, not the
    corpus-sized NoTimeout store.  Unbounded lifetime state is an
    explicit opt-in under `streaming_lsh_candidates_backfill`.

    `docs` must therefore carry the horizon form's (doc_id long,
    text string, ts timestamp) columns — event time is what the
    retention contract is defined over."""
    return streaming_lsh_candidates_horizon(
        docs, num_hashes, rows_per_band, horizon_ms, watermark_delay
    )


_ALERT_OUTPUT = StructType(
    [
        StructField("key", LongType(), False),
        StructField("total", LongType(), False),
    ]
)

#: state per key: running count + whether the alert already fired
_ALERT_STATE = StructType(
    [StructField("count", LongType(), True), StructField("fired", LongType(), True)]
)


def _threshold_func(threshold: int):
    def fn(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        count, fired = state.get if state.exists else (0, 0)
        n = sum(len(p) for p in pdfs)
        count += n
        out_rows = []
        if count >= threshold and not fired:
            # emit exactly once, at the crossing micro-batch
            out_rows.append((int(key[0]), int(count)))
            fired = 1
        state.update((count, fired))
        yield pd.DataFrame(out_rows, columns=["key", "total"])

    return fn


def streaming_threshold_alerts_lifetime(keyed: DataFrame, threshold: int) -> DataFrame:
    """Streaming heavy-hitter alerting: per-key running count in the state
    store, ONE row emitted the first time a key's lifetime count crosses
    the threshold — the streaming counterpart of the batch
    `cms_heavy_hitters` entry (there the sketch bounds memory on a bounded
    input; here the state store is the running index, two longs per key,
    RocksDB-backed on a cluster, and the count survives micro-batch and
    restart boundaries via the checkpoint).

    LIFETIME (bounded-key-space) FORM — named for what it is safe for
    (VERDICT r10 #2, the same doctrine as
    `streaming_lsh_candidates_backfill`): "lifetime count crossed N" must
    not forget counts for idle keys, so NoTimeout is part of THIS alert's
    meaning and state is one row per ENTITY KEY EVER — the right op only
    where the key space is bounded (stream ids, metric names).  The
    unqualified `streaming_threshold_alerts` entry point is the horizon
    form, which carries the eviction contract an unbounded entity space
    (user_id on an unbounded stream) needs; choosing unbounded state now
    takes this explicit name.

    `keyed` is a streaming DataFrame with a `key long` column."""
    return keyed.groupBy("key").applyInPandasWithState(
        _threshold_func(threshold),
        outputStructType=_ALERT_OUTPUT,
        stateStructType=_ALERT_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -- trailing-horizon threshold alerts (VERDICT r9 #3) -----------------------

#: Default alert horizon: 7 days, the same trailing-retention role the
#: dedup horizon plays (and the reference's storageDays reclamation,
#: src/storage/DeleteExpiredCmd.ts:91) applied to alert counting.
DEFAULT_ALERT_HORIZON_MS = 7 * 86_400_000

_ALERT_H_OUTPUT = StructType(
    [
        StructField("key", LongType(), False),
        StructField("crossed_ms", LongType(), False),
    ]
)

#: state per key within the horizon: session count, fired flag, last touch
_ALERT_H_STATE = StructType(
    [
        StructField("count", LongType(), True),
        StructField("fired", LongType(), True),
        StructField("last_ms", LongType(), True),
    ]
)


def _threshold_horizon_func(threshold: int, horizon_ms: int):
    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Per key, horizon-bounded threshold alerting: events are
        sessionized by event time with gap = `horizon_ms` (exactly the
        LSH-horizon gap rule); within a session the count increments
        row-by-row and ONE row (key, crossed_ms) is emitted at the event
        whose arrival makes the session count reach `threshold`.  A gap
        wider than the horizon resets (count, fired) — counts older than
        the horizon are deliberately forgotten, which is what lets the
        EventTimeTimeout below reclaim idle keys' state without changing
        any answer: an evicted key's next arrival starts at zero, the
        same zero the gap rule would have produced.  All decisions are
        row-local on event times, so output never depends on WHEN the
        timeout fired.

        LATE-DATA CONTRACT (same as the LSH horizon fold): rows are
        folded in ts order WITHIN a micro-batch but arrival order across
        batches, with last touch a running MAX — a late row (admitted by
        a nonzero watermark delay) has a non-positive gap, joins the
        CURRENT session and increments its count; it can neither re-cut
        past sessions nor resurrect an expired one.  Event-time
        sessionization (the oracle's model) coincides with this fold
        under event-time-ordered arrival, which the in-order certificate
        stages."""
        if state.hasTimedOut:
            # key idle past the horizon: the count it carried can never
            # matter again (the gap rule would reset it) — reclaim, and
            # yield nothing (no dtype-less empty frame)
            state.remove()
            return
        count, fired, last_ms = state.get if state.exists else (0, 0, None)
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        out_ms: list[int] = []
        for t in rows["ts"]:
            ms = int(t.value // 1_000_000)  # pandas ns -> event-time ms
            if last_ms is not None and ms - last_ms > horizon_ms:
                count, fired = 0, 0  # horizon-wide gap: a fresh session
            count += 1
            if count >= threshold and not fired:
                out_ms.append(ms)
                fired = 1
            last_ms = ms if last_ms is None else max(last_ms, ms)
        state.update((count, fired, last_ms))
        # evict once the watermark passes last touch + horizon; clamped
        # strictly above the current watermark (Spark rejects a timeout
        # at or behind it)
        state.setTimeoutTimestamp(
            max(last_ms + horizon_ms, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(
            {"key": [int(key[0])] * len(out_ms), "crossed_ms": out_ms}
        )

    return fn


def streaming_threshold_alerts_horizon(
    keyed: DataFrame,
    threshold: int,
    horizon_ms: int = DEFAULT_ALERT_HORIZON_MS,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """`streaming_threshold_alerts_lifetime` with the BOUNDED-STATE
    contract an unbounded entity space needs (VERDICT r9 #3): the question
    changes from "lifetime count crossed N" (which inherently needs one
    state row per entity ever seen — that exact semantics keeps the
    NoTimeout op, under its explicit `_lifetime` name since r11) to
    "count within a trailing event-time horizon crossed N", and with
    it the state store changes from entity-ever cardinality to keys
    TOUCHED WITHIN THE HORIZON: per key the state is three longs,
    registered for GroupStateTimeout.EventTimeTimeout at
    last_touch + horizon, so on a 100 TB stream keyed by user_id the
    store holds only the horizon's active users.

    Semantics — per key, events are sessionized by event time with
    gap = `horizon_ms`; a session emits ONE (key, crossed_ms) row at the
    event that brings its count to `threshold` (crossed_ms = that
    event's time); sessions never reaching the threshold emit nothing.
    Eviction is pure memory reclamation: the gap rule makes the same
    reset decision row-locally, certified by the
    `streaming_alerts_replay_horizon` catalog entry against a
    sessionized SQL oracle and by the state tests (expired keys' rows
    are GONE from the store).

    `keyed` is a streaming DataFrame with (key long, ts timestamp); the
    event-time watermark is applied here."""
    return (
        keyed.withWatermark("ts", watermark_delay)
        .groupBy("key")
        .applyInPandasWithState(
            _threshold_horizon_func(threshold, horizon_ms),
            outputStructType=_ALERT_H_OUTPUT,
            stateStructType=_ALERT_H_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def streaming_threshold_alerts(
    keyed: DataFrame,
    threshold: int,
    horizon_ms: int = DEFAULT_ALERT_HORIZON_MS,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """The DEFAULT streaming threshold-alert entry point (VERDICT r10 #2,
    the round-10 default-entry doctrine): the zero-config path carries
    the eviction contract — this is `streaming_threshold_alerts_horizon`
    (EventTimeTimeout, state bounded by trailing-horizon key occupancy),
    so a caller who writes the obvious name onto an unbounded 100 TB
    stream gets bounded state, not the entity-ever NoTimeout store.
    Unbounded lifetime counting is an explicit opt-in under
    `streaming_threshold_alerts_lifetime`, mirroring
    `streaming_lsh_candidates` / `_backfill`.

    `keyed` must therefore carry the horizon form's (key long,
    ts timestamp) columns — event time is what the retention contract is
    defined over."""
    return streaming_threshold_alerts_horizon(
        keyed, threshold, horizon_ms, watermark_delay
    )


# -- streaming funnel (CEP-style multi-stage sequence detection) ------------

_FUNNEL_OUTPUT = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("t_view_us", LongType(), True),
        StructField("t_click_us", LongType(), True),
        StructField("t_purchase_us", LongType(), True),
    ]
)

#: state per user: min view time + ALL click/purchase times (microseconds).
#: Buffering the candidate times is what makes the operator correct under
#: ARBITRARY arrival order: the first-stage minimum can only decrease as
#: late views arrive, which can retroactively make earlier clicks
#: eligible — an incremental "min click after current t1" scalar would
#: have already discarded them.  State is bounded by the user's own
#: click/purchase history, not the stream.
from pyspark.sql.types import ArrayType  # noqa: E402  (module-local add)

_FUNNEL_STATE = StructType(
    [
        StructField("min_view_us", LongType(), True),
        StructField("clicks_us", ArrayType(LongType()), True),
        StructField("purchases_us", ArrayType(LongType()), True),
    ]
)


def _funnel_func(flush_ts_ms: int):
    def func(key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState):
        if state.hasTimedOut:
            mv, clicks, purchases = state.get if state.exists else (None, [], [])
            t2 = min(
                (int(c) for c in (clicks or []) if mv is not None and c > mv),
                default=None,
            )
            t3 = min(
                (int(p) for p in (purchases or []) if t2 is not None and p > t2),
                default=None,
            )
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [int(key[0])],
                    "t_view_us": [mv],
                    "t_click_us": [t2],
                    "t_purchase_us": [t3],
                }
            )
            return
        mv, clicks, purchases = state.get if state.exists else (None, [], [])
        clicks = list(clicks or [])
        purchases = list(purchases or [])
        for pdf in pdfs:
            for ts, et in zip(pdf["ts"], pdf["event_type"]):
                us = int(ts.value // 1_000)  # ns -> µs, full event precision
                if et == "view":
                    mv = us if mv is None else min(mv, us)
                elif et == "click":
                    clicks.append(us)
                elif et == "purchase":
                    purchases.append(us)
        state.update((mv, clicks, purchases))
        # evaluation is DEFERRED to the watermark passing flush_ts: the
        # funnel is only decidable once no earlier event can still arrive.
        # Clamped above the current watermark — a key first seen AFTER the
        # flush point (the replay sentinels) cannot legally time out in
        # the past.
        state.setTimeoutTimestamp(
            max(flush_ts_ms, state.getCurrentWatermarkMs() + 1)
        )
        return

    return func


def streaming_funnel(events: DataFrame, flush_ts_ms: int) -> DataFrame:
    """Streaming view->click->purchase funnel with STRICT temporal
    ordering (the batch `funnel_conversion` semantics) as arbitrary
    keyed state: per user, buffer the sufficient statistics under any
    arrival order, and emit one row per user when the event-time
    watermark passes `flush_ts_ms` (GroupStateTimeout.EventTimeTimeout)
    — the CEP-style multi-stage sequence detection every product
    analytics stack runs, here with exactly-once state in the
    checkpoint.

    `events` must be a streaming DataFrame with (user_id long,
    ts timestamp [watermarked], event_type string)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _funnel_func(flush_ts_ms),
        outputStructType=_FUNNEL_OUTPUT,
        stateStructType=_FUNNEL_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


# -- streaming Holt (level + trend) smoothing --------------------------------

_HOLT_OUTPUT = StructType(
    [
        StructField("key", StringType(), False),
        StructField("bucket", LongType(), False),
        StructField("value", DoubleType(), True),
        StructField("level", DoubleType(), True),
        StructField("trend", DoubleType(), True),
        StructField("forecast", DoubleType(), True),
    ]
)

#: state = (level, trend, last bucket, first-point value/bucket pending
#: emission).  The batch definition initializes trend with x_2 - x_1, a
#: one-step lookahead — so the first point is HELD in state and emitted
#: only when the second arrives (or never, for a one-point stream; the
#: availableNow replay certificate runs on series with >= 2 points).
_HOLT_STATE = StructType(
    [
        StructField("level", DoubleType(), True),
        StructField("trend", DoubleType(), True),
        StructField("bucket", LongType(), True),
        StructField("first_x", DoubleType(), True),
        StructField("first_bucket", LongType(), True),
    ]
)

HOLT_ALPHA = 0.5
HOLT_BETA = 0.2


def _holt_func(
    key: Any,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's (bucket, value) rows — ordered by bucket —
    into the running Holt (level, trend) state.  Identical literal op
    order to operators.stats.holt_trend_daily, so replay output is
    bit-equal to the batch recurrence.

    State is STRICTLY FORWARD (like the EWMA operator): a bucket at or
    below the last folded bucket is a no-op.  Batch equivalence
    therefore requires the source to deliver each key's buckets in
    non-decreasing order across micro-batches — the replay certificate
    stages a single (key, bucket)-sorted file to guarantee it."""
    lvl = trd = first_x = None
    last_b = first_b = None
    if state.exists:
        lvl, trd, last_b, first_x, first_b = state.get
    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("bucket")
    out: list[tuple] = []
    for _, r in rows.iterrows():
        b, x = int(r["bucket"]), float(r["value"])
        if last_b is not None and b <= last_b:
            continue  # state is strictly forward; late buckets are no-ops
        if lvl is None and first_x is None:
            first_x, first_b, last_b = x, b, b
            continue
        if lvl is None:
            # second point: emit the held first row, then fold this one
            lvl, trd = first_x, x - first_x
            out.append((first_b, first_x, lvl, trd, first_x))
            f = lvl + trd
            l_new = HOLT_ALPHA * x + (1.0 - HOLT_ALPHA) * (lvl + trd)
            trd = HOLT_BETA * (l_new - lvl) + (1.0 - HOLT_BETA) * trd
            lvl = l_new
            out.append((b, x, lvl, trd, f))
            last_b = b
            continue
        f = lvl + trd
        l_new = HOLT_ALPHA * x + (1.0 - HOLT_ALPHA) * (lvl + trd)
        trd = HOLT_BETA * (l_new - lvl) + (1.0 - HOLT_BETA) * trd
        lvl = l_new
        out.append((b, x, lvl, trd, f))
        last_b = b
    state.update((lvl, trd, last_b, first_x, first_b))
    yield pd.DataFrame(
        {
            "key": [key[0]] * len(out),
            "bucket": [o[0] for o in out],
            "value": [o[1] for o in out],
            "level": [o[2] for o in out],
            "trend": [o[3] for o in out],
            "forecast": [o[4] for o in out],
        }
    )


def streaming_holt(keyed: DataFrame) -> DataFrame:
    """`keyed` must have columns (key string, bucket long, value double).
    Returns appended (key, bucket, value, level, trend, forecast) rows
    per micro-batch — the stateful-streaming form of Holt smoothing,
    state = two floats + bookkeeping per key in the checkpointed store.
    Key space is metric-name cardinality (like `streaming_ewma`), so
    NoTimeout is the same deliberate never-forget-a-level contract."""
    return keyed.groupBy("key").applyInPandasWithState(
        _holt_func,
        outputStructType=_HOLT_OUTPUT,
        stateStructType=_HOLT_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _holt_ttl_func(ttl_ms: int, bucket_ms: int):
    def fn(
        key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """`_holt_func` with the row-local idle-restart rule (the EWMA
        TTL recipe): an event-time gap wider than `ttl_ms` between
        consecutive folded buckets resets the whole (level, trend,
        held-first-point) state, so the row that follows the gap is held
        as a fresh series' first observation.  Eviction is answer-neutral
        at EVERY watermark delay for BOTH pieces of Holt state: an
        evicted key's next admitted row necessarily sits past
        last_touch + ttl (late rows are dropped against the same
        monotone watermark that fired the eviction — the `_ewma_ttl_func`
        argument, pinned at a nonzero delay by
        tests/test_round13_ops.py), where the gap rule resets
        (level, trend) anyway, and a held first point whose session ends
        with one row emits nothing under the session semantics — exactly
        what its eviction produces."""
        if state.hasTimedOut:
            state.remove()
            return
        lvl = trd = first_x = None
        last_b = first_b = None
        if state.exists:
            lvl, trd, last_b, first_x, first_b = state.get
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("bucket")
        out: list[tuple] = []
        for _, r in rows.iterrows():
            b, x = int(r["bucket"]), float(r["value"])
            if last_b is not None and b <= last_b:
                continue  # strictly forward, like the NoTimeout op
            if last_b is not None and (b - last_b) * bucket_ms > ttl_ms:
                lvl = trd = first_x = first_b = None  # idle past ttl
            if lvl is None and first_x is None:
                first_x, first_b, last_b = x, b, b
                continue
            if lvl is None:
                # second point of the (possibly restarted) series: emit
                # the held first row, then fold this one
                lvl, trd = first_x, x - first_x
                out.append((first_b, first_x, lvl, trd, first_x))
                f = lvl + trd
                l_new = HOLT_ALPHA * x + (1.0 - HOLT_ALPHA) * (lvl + trd)
                trd = HOLT_BETA * (l_new - lvl) + (1.0 - HOLT_BETA) * trd
                lvl = l_new
                out.append((b, x, lvl, trd, f))
                last_b = b
                continue
            f = lvl + trd
            l_new = HOLT_ALPHA * x + (1.0 - HOLT_ALPHA) * (lvl + trd)
            trd = HOLT_BETA * (l_new - lvl) + (1.0 - HOLT_BETA) * trd
            lvl = l_new
            out.append((b, x, lvl, trd, f))
            last_b = b
        if last_b is not None:
            state.update((lvl, trd, last_b, first_x, first_b))
            state.setTimeoutTimestamp(
                max(last_b * bucket_ms + ttl_ms, state.getCurrentWatermarkMs() + 1)
            )
        yield pd.DataFrame(
            {
                "key": [key[0]] * len(out),
                "bucket": [o[0] for o in out],
                "value": [o[1] for o in out],
                "level": [o[2] for o in out],
                "trend": [o[3] for o in out],
                "forecast": [o[4] for o in out],
            }
        )

    return fn


def streaming_holt_ttl(
    keyed: DataFrame,
    ttl_ms: int = DEFAULT_EWMA_TTL_MS,
    bucket_ms: int = 3_600_000,
    watermark_delay: str = "0 seconds",
) -> DataFrame:
    """`streaming_holt` with the BOUNDED-STATE contract — the second
    smoother's TTL twin (same design as `streaming_ewma_ttl`, see its
    docstring for the contract): an event-time gap wider than `ttl_ms`
    restarts the series cold (the row after the gap is held as a fresh
    first observation; a one-row session emits nothing, matching what
    its eviction produces), and the state store holds only keys touched
    within the trailing ttl via GroupStateTimeout.EventTimeTimeout.  The
    `streaming_holt_ttl_replay` catalog entry certifies the restarting
    recurrence against a session-cut recursive-CTE oracle;
    tools/state_scale.py measures the bounded store under adversarial
    key growth.

    `keyed` must have columns (key string, bucket long, value double)
    with bucket = event-time epoch-ms // `bucket_ms`."""
    from pyspark.sql import functions as F

    src = keyed.withColumn(
        "ts", F.timestamp_millis(F.col("bucket") * F.lit(bucket_ms))
    )
    return (
        src.withWatermark("ts", watermark_delay)
        .groupBy("key")
        .applyInPandasWithState(
            _holt_ttl_func(ttl_ms, bucket_ms),
            outputStructType=_HOLT_OUTPUT,
            stateStructType=_HOLT_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
