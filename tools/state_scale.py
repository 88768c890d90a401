"""Streaming state-store growth certification (VERDICT r8 #5 for the
LSH horizon; extended per VERDICT r9 #2/#3 to every stateful op that
carries a bound contract): replay 1x / 10x / 100x staged streams and
record `stateOperators` metrics (rows, memory) from the
StreamingQueryProgress, asserting that occupancy tracks the op's STATED
MODEL, not corpus size.  Each op's guard FAILS (exit 1) if the measured
state violates its model:

- lsh      streaming_lsh_candidates_horizon — final bucket rows within
           the two-sided watermark-horizon model (the r9 certification);
           corpus replicated cross-copy-DISJOINT in text and contiguous
           in time, so buckets-ever grows ~kx while occupancy stays flat.
- alerts   streaming_threshold_alerts_horizon — same two-sided horizon
           model over per-user last touches; the events corpus is
           replicated with DISJOINT user spaces back-to-back in time
           (the unbounded-entity-space shape the op exists for), so
           keys-ever grows kx while horizon-active keys stay flat.
- funnel   streaming_funnel — SKEWED-USER corpus (kx the events, SAME
           150 users, back-to-back in time): peak state is one row per
           user regardless of event volume, and the final store is EMPTY
           (every user flushed once the watermark passes the flush
           point).  Guard: n_users <= peak <= n_users + sentinels and
           final == 0.
- cdc      the foreachBatch CDC upsert (catalog.py
           q_streaming_cdc_upsert_replay's merge, same recipe): state is
           a keyed parquet TABLE, not the state store — rows == distinct
           keys ever, by design (an upsert table IS the keyed dataset).
           Skewed-user corpus: the changelog grows kx while the table
           stays at 150 rows.  Guard: table rows == distinct keys.
- trailing streaming_trailing_distinct_replay's chained windowed aggs —
           native stateful windows evicted by the watermark: on a
           kx-LONGER stream (same users, time-extended) the final
           level-1 state holds only (24h-window, user) pairs whose
           window is still open at the final watermark.  Guard (final
           only, two-sided like lsh): strict <= final_l1 <= upper;
           level-2's open hour windows reported and bounded by upper_l2.
- ewma /   streaming_ewma / streaming_holt (VERDICT r10 #4 — the last
  holt     NoTimeout ops without a measured bound): the contract is
           "state == METRIC-KEY cardinality, never event volume", so
           each run measures BOTH shapes from the same key formula
           (event_type#user_id): SKEW (same users repeat kx — volume
           grows kx, keys constant, state must stay flat) and
           ADVERSARIAL (disjoint user spaces — key cardinality itself
           grows kx, state grows exactly with it: the documented
           linear-in-keys boundary of the NoTimeout contract).  Guard:
           final state rows == distinct keys ever AND zero evictions,
           in both shapes.

Construction notes: every corpus is laid out CONTIGUOUSLY in event time
(copies back-to-back) and staged as `--batches` in-order files (the
replay-certificate recipe), so delay-0 watermarks advance across
micro-batches and EventTimeTimeout evictions actually fire mid-replay.
Peak rows are still availableNow-inflated (one trigger ingests hundreds
of hours of event time a live stream's cadence never would) — the
certified number is the FINAL occupancy; peaks are reported for context.

Usage: python tools/state_scale.py [--op lsh alerts funnel cdc trailing]
                                   [--copies 1 10 100] [--batches 8]
Prints a markdown fragment per op for BENCH_SCALE.md; exits 1 on any
model violation.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from broker_spark.session import get_spark
from broker_spark.streaming import stateful

SRC = "/root/testdata/sf0.01/documents.parquet"
EV_SRC = "/root/testdata/sf0.01/events.parquet"
HOUR_MS = 3_600_000
BASE_MS = 1_704_067_200_000


def _suffix_tokens(col, i: int):
    if i == 0:
        return col
    return F.array_join(
        F.transform(F.split(col, " "), lambda w: F.concat(w, F.lit(f"_c{i}"))),
        " ",
    )


def build_corpus(spark, copies: int):
    """kx documents, cross-copy-disjoint text, contiguous doc_id/time."""
    base = spark.read.parquet(SRC).select("doc_id", "text")
    n = base.count()
    parts = [
        base.select(
            (F.col("doc_id") + F.lit(i * n)).alias("doc_id"),
            _suffix_tokens(F.col("text"), i).alias("text"),
        )
        for i in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "ts",
        F.timestamp_millis(F.lit(BASE_MS) + F.col("doc_id") * F.lit(HOUR_MS)),
    ), n * copies


def build_events(spark, copies: int, disjoint_users: bool):
    """kx events laid back-to-back in event time.  `disjoint_users`
    offsets each copy's user space (entity cardinality grows kx — the
    alerts shape); otherwise the SAME users repeat kx (the skewed-user
    funnel/cdc shape)."""
    from broker_spark.tables import load

    base = load(spark, os.path.dirname(EV_SRC), "events").select(
        "user_id", "ts", "event_id", "event_type", "value"
    )
    n_ev = base.count()
    lo, hi, u_hi = base.agg(
        F.min(F.unix_millis("ts")),
        F.max(F.unix_millis("ts")),
        F.max("user_id"),
    ).collect()[0]
    span = hi - lo + HOUR_MS
    parts = [
        base.select(
            (
                F.col("user_id") + F.lit(i * (u_hi + 1))
                if disjoint_users
                else F.col("user_id")
            ).alias("user_id"),
            F.timestamp_millis(F.unix_millis("ts") + F.lit(i * span)).alias("ts"),
            (F.col("event_id") + F.lit(i * n_ev)).alias("event_id"),
            "event_type",
            "value",
        )
        for i in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out, lo, hi + (copies - 1) * span


def _stage_by_time(df, lo_ms: int, hi_ms: int, batches: int, dest: str):
    """In-order staging, one time-slice file per trigger."""
    from broker_spark.plans.catalog import _stage_ordered_batches

    step = (hi_ms - lo_ms) // batches + 1
    _stage_ordered_batches(
        df,
        F.least(
            F.floor((F.unix_millis("ts") - F.lit(lo_ms)) / F.lit(step)),
            F.lit(batches - 1),
        ),
        batches,
        dest,
    )
    return step


def _drain_progress(q):
    removed, peak, final, mem = 0, [], [], 0
    n_ops = 0
    for p in q.recentProgress:
        ops = p["stateOperators"] or []
        n_ops = max(n_ops, len(ops))
        for j, so in enumerate(ops):
            while len(peak) <= j:
                peak.append(0)
                final.append(0)
            removed += so["numRowsRemoved"] or 0
            peak[j] = max(peak[j], so["numRowsTotal"] or 0)
            if so["numRowsTotal"] is not None:
                final[j] = so["numRowsTotal"]
            mem = max(mem, so.get("memoryUsedBytes") or 0)
    return removed, peak, final, mem


def _replay(spark, stream_df, tmp: str, timeout: int = 2400):
    t0 = time.perf_counter()
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", f"{tmp}/sink")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(timeout):
        import contextlib

        with contextlib.suppress(Exception):  # never mask the timeout
            q.stop()
        raise RuntimeError("replay did not terminate")
    return q, round(time.perf_counter() - t0, 1)


# ---------------------------------------------------------------------------
# lsh (the r9 certification, unchanged model)
# ---------------------------------------------------------------------------


def banded_touches(spark, docs):
    """Batch-side (band, last_touch) frame — the horizon model's input."""
    from broker_spark.pipeline.dedup import _banded, minhash_signatures

    b = _banded(minhash_signatures(docs.select("doc_id", "text")), 4, 2)
    return (
        b.join(docs.select("doc_id", "ts"), "doc_id")
        .groupBy("band_id", "band_key")
        .agg(F.max(F.unix_millis("ts")).alias("last_ms"))
    )


def run_lsh(spark, copies: int, batches: int, horizon_ms: int):
    docs, n_docs = build_corpus(spark, copies)
    docs = docs.localCheckpoint()
    tmp = tempfile.mkdtemp(prefix=f"state_scale_x{copies}_")
    max_id = n_docs - 1
    step = max_id // batches + 1
    from broker_spark.plans.catalog import _stage_ordered_batches

    _stage_ordered_batches(
        docs,
        F.least(F.floor(F.col("doc_id") / F.lit(step)), F.lit(batches - 1)),
        batches,
        f"{tmp}/in",
    )
    src = (
        spark.readStream.schema("doc_id long, text string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/in")
    )
    q, wall = _replay(
        spark, stateful.streaming_lsh_candidates_horizon(src, horizon_ms=horizon_ms), tmp
    )
    removed, peak, final, mem = _drain_progress(q)

    # horizon model, two-sided: a bucket CANNOT be evicted while
    # last_touch + horizon >= watermark, and the last trigger that can
    # process timeouts has seen at most the full stream's watermark — so
    #   strict  = #{last + h >= wm_final}      (must all survive)
    #   upper   = #{last + h >= wm_pre_final}  (timeouts the final pass
    #             may not have reached; wm as of the second-to-last file)
    # and the guard is strict <= final <= upper.  Empirically availableNow
    # runs a terminal timeout pass at wm_final, so final == strict.
    touches = banded_touches(spark, docs).localCheckpoint()
    buckets_ever = touches.count()
    wm_final = BASE_MS + (n_docs - 1) * HOUR_MS
    wm_pre_final = BASE_MS + ((batches - 1) * step - 1) * HOUR_MS
    model_strict = touches.filter(
        F.col("last_ms") + F.lit(horizon_ms) >= F.lit(wm_final)
    ).count()
    model_upper = touches.filter(
        F.col("last_ms") + F.lit(horizon_ms) >= F.lit(wm_pre_final)
    ).count()
    shutil.rmtree(tmp, ignore_errors=True)
    ok = model_strict <= final[0] <= model_upper
    return {
        "copies": copies,
        "docs": n_docs,
        "buckets_ever": buckets_ever,
        "peak_rows": peak[0],
        "final_rows": final[0],
        "removed_rows": removed,
        "model_alive": model_strict,
        "model_upper": model_upper,
        "mem_peak_bytes": mem,
        "wall_s": wall,
        "ok": ok,
    }


# ---------------------------------------------------------------------------
# alerts (VERDICT r9 #3): horizon-active users vs users-ever
# ---------------------------------------------------------------------------


def run_alerts(spark, copies: int, batches: int, horizon_ms: int):
    ev, lo, hi = build_events(spark, copies, disjoint_users=True)
    keyed = ev.select(F.col("user_id").alias("key"), "ts").localCheckpoint()
    tmp = tempfile.mkdtemp(prefix=f"state_alerts_x{copies}_")
    step = _stage_by_time(keyed, lo, hi, batches, f"{tmp}/in")
    src = (
        spark.readStream.schema("key long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/in")
    )
    q, wall = _replay(
        spark,
        stateful.streaming_threshold_alerts_horizon(
            src, threshold=8, horizon_ms=horizon_ms
        ),
        tmp,
    )
    removed, peak, final, mem = _drain_progress(q)

    # same two-sided model as lsh, over per-key last touches
    touches = (
        keyed.groupBy("key").agg(F.max(F.unix_millis("ts")).alias("last_ms"))
    ).localCheckpoint()
    keys_ever = touches.count()
    wm_final = hi
    wm_pre_final = lo + (batches - 1) * step - 1
    model_strict = touches.filter(
        F.col("last_ms") + F.lit(horizon_ms) >= F.lit(wm_final)
    ).count()
    model_upper = touches.filter(
        F.col("last_ms") + F.lit(horizon_ms) >= F.lit(wm_pre_final)
    ).count()
    shutil.rmtree(tmp, ignore_errors=True)
    ok = model_strict <= final[0] <= model_upper
    return {
        "copies": copies,
        "events": ev.count(),
        "keys_ever": keys_ever,
        "peak_rows": peak[0],
        "final_rows": final[0],
        "removed_rows": removed,
        "model_alive": model_strict,
        "model_upper": model_upper,
        "mem_peak_bytes": mem,
        "wall_s": wall,
        "ok": ok,
    }


# ---------------------------------------------------------------------------
# funnel (VERDICT r9 #2): per-user state flat under event-volume skew
# ---------------------------------------------------------------------------


def run_funnel(spark, copies: int, batches: int):
    ev, lo, hi = build_events(spark, copies, disjoint_users=False)
    ev = ev.select("user_id", "ts", "event_type").localCheckpoint()
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    flush_ms = hi + HOUR_MS
    # two sentinel rows past the flush point: the first carries the
    # watermark past flush (timeouts fire against the PREVIOUS batch's
    # watermark), the second's batch flushes everyone — including, by the
    # terminal availableNow timeout pass, the sentinels themselves
    import datetime as dt_mod

    def _t(ms):
        return dt_mod.datetime.fromtimestamp(
            ms / 1000.0, tz=dt_mod.timezone.utc
        ).replace(tzinfo=None)

    sent = spark.createDataFrame(
        [(-1, _t(flush_ms + 2 * HOUR_MS), "view"), (-2, _t(flush_ms + 3 * HOUR_MS), "view")],
        "user_id long, ts timestamp, event_type string",
    )
    tmp = tempfile.mkdtemp(prefix=f"state_funnel_x{copies}_")
    # data files 0..batches-1, sentinels in two trailing files
    step = (hi - lo) // batches + 1
    staged = ev.withColumn(
        "_b",
        F.least(F.floor((F.unix_millis("ts") - F.lit(lo)) / F.lit(step)), F.lit(batches - 1)),
    ).unionByName(
        sent.withColumn(
            "_b", (F.lit(batches) + (F.col("user_id") == -2).cast("long"))
        )
    )
    from broker_spark.plans.catalog import _stage_ordered_batches

    _stage_ordered_batches(
        staged.select("user_id", "ts", "event_type", "_b"),
        F.col("_b"),
        batches + 2,
        f"{tmp}/in",
    )
    src = (
        spark.readStream.schema("user_id long, ts timestamp, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/in")
        .withWatermark("ts", "0 seconds")
    )
    q, wall = _replay(spark, stateful.streaming_funnel(src, flush_ms), tmp)
    removed, peak, final, mem = _drain_progress(q)
    shutil.rmtree(tmp, ignore_errors=True)
    # model: one state row per user (+2 sentinels) at peak; empty store
    # after the flush — the funnel's memory is USER cardinality, never
    # event volume
    ok = (n_users <= peak[0] <= n_users + 2) and final[0] == 0
    return {
        "copies": copies,
        "events": n_events,
        "users": n_users,
        "peak_rows": peak[0],
        "final_rows": final[0],
        "removed_rows": removed,
        "model_peak": n_users,
        "mem_peak_bytes": mem,
        "wall_s": wall,
        "ok": ok,
    }


# ---------------------------------------------------------------------------
# cdc (VERDICT r9 #2): the foreachBatch upsert table holds keys, not log
# ---------------------------------------------------------------------------


def run_cdc(spark, copies: int, batches: int):
    ev, lo, hi = build_events(spark, copies, disjoint_users=False)
    log = ev.select(
        "user_id",
        "ts",
        "event_id",
        "value",
        F.when(F.col("event_type") == "error", F.lit("delete"))
        .otherwise(F.lit("upsert"))
        .alias("op"),
    ).localCheckpoint()
    n_rows = log.count()
    n_keys = log.select("user_id").distinct().count()
    tmp = tempfile.mkdtemp(prefix=f"state_cdc_x{copies}_")
    _stage_by_time(log, lo, hi, batches, f"{tmp}/in")
    state, hwm_path = f"{tmp}/state", f"{tmp}/applied_batch"

    # the exact merge recipe of catalog.q_streaming_cdc_upsert_replay
    # (read state, union batch winners, keep max-(ts, event_id) per key,
    # atomic swap, batch-id high-water mark)
    def _merge_batch(batch, batch_id):
        if os.path.exists(hwm_path):
            with open(hwm_path) as f:
                if batch_id <= int(f.read().strip()):
                    return
        sess = batch.sparkSession
        winner = F.max_by(
            F.struct("ts", "event_id", "value", "op"), F.struct("ts", "event_id")
        )
        merged = batch.groupBy("user_id").agg(
            winner.alias("w"), F.count(F.lit(1)).cast("long").alias("n_ops")
        )
        if os.path.exists(state):
            cur = sess.read.parquet(state).select(
                "user_id",
                F.struct("ts", "event_id", "value", "op").alias("w"),
                "n_ops",
            )
            merged = (
                cur.unionByName(merged)
                .groupBy("user_id")
                .agg(
                    F.max_by("w", F.struct("w.ts", "w.event_id")).alias("w"),
                    F.sum("n_ops").cast("long").alias("n_ops"),
                )
            )
        out = merged.select(
            "user_id", "w.ts", "w.event_id", "w.value", "w.op", "n_ops"
        )
        nxt = f"{tmp}/state_next"
        out.write.mode("overwrite").parquet(nxt)
        shutil.rmtree(state, ignore_errors=True)
        os.rename(nxt, state)
        with open(hwm_path, "w") as f:
            f.write(str(batch_id))

    stream = (
        spark.readStream.schema(
            "user_id bigint, ts timestamp, event_id bigint, value double, op string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/in")
    )
    t0 = time.perf_counter()
    q = (
        stream.writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", f"{tmp}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(2400):
        import contextlib

        with contextlib.suppress(Exception):
            q.stop()
        raise RuntimeError("cdc replay did not terminate")
    wall = round(time.perf_counter() - t0, 1)
    table_rows = spark.read.parquet(state).count()
    shutil.rmtree(tmp, ignore_errors=True)
    ok = table_rows == n_keys
    return {
        "copies": copies,
        "changelog_rows": n_rows,
        "keys": n_keys,
        "table_rows": table_rows,
        "model_rows": n_keys,
        "wall_s": wall,
        "ok": ok,
    }


# ---------------------------------------------------------------------------
# trailing (VERDICT r9 #2): chained windowed aggs evicted by watermark
# ---------------------------------------------------------------------------


def run_trailing(spark, copies: int, batches: int):
    ev, lo, hi = build_events(spark, copies, disjoint_users=False)
    ev = ev.select("ts", "user_id").localCheckpoint()
    n_events = ev.count()
    tmp = tempfile.mkdtemp(prefix=f"state_trail_x{copies}_")
    step = _stage_by_time(ev, lo, hi, batches, f"{tmp}/in")
    src = (
        spark.readStream.schema("ts timestamp, user_id long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/in")
    )
    # the chained shape of catalog.q_streaming_trailing_distinct_replay:
    # level 1 dedups (24h-sliding-window, user), level 2 counts per hop
    pairs = (
        src.withWatermark("ts", "0 seconds")
        .groupBy(F.window("ts", "86400 seconds", "3600 seconds").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    counts = pairs.groupBy(F.window(F.col("w"), "3600 seconds").alias("w2")).agg(
        F.count(F.lit(1)).cast("long").alias("n_users")
    )
    q, wall = _replay(spark, counts, tmp, timeout=3600)
    removed, peak, final, mem = _drain_progress(q)
    shutil.rmtree(tmp, ignore_errors=True)

    # model for level-1 (the (window, user)-pair store, the big one): a
    # pair's window is [start, start+24h) and the store must hold exactly
    # the pairs with data whose window is OPEN (end > watermark) — strict
    # at wm_final = hi, upper at the second-to-last file's watermark.
    # Hop-expand batch-side: each (user, event-hour h) contributes window
    # starts h-23..h.
    hours = ev.select(
        (F.floor(F.unix_millis("ts") / F.lit(HOUR_MS))).alias("h"), "user_id"
    ).distinct()
    pairs_model = (
        hours.select(
            F.explode(F.sequence(F.col("h") - 23, F.col("h"))).alias("w_start_h"),
            "user_id",
        )
        .distinct()
        .localCheckpoint()
    )
    pairs_ever = pairs_model.count()
    wm_final_h = hi / HOUR_MS
    wm_pre_h = (lo + (batches - 1) * step - 1) / HOUR_MS
    strict_l1 = pairs_model.filter(F.col("w_start_h") + 24 > F.lit(wm_final_h)).count()
    upper_l1 = pairs_model.filter(F.col("w_start_h") + 24 > F.lit(wm_pre_h)).count()
    # level-2 state is one row per open hop window of window-END times;
    # its watermark lags level 1 by one batch, so bound it by the hops
    # carried by upper_l1's window ends (loose, reported not modelled)
    n_ops = len(final)
    # stateOperators order: [level-2 (downstream agg), level-1] in Spark's
    # plan traversal; identify the pair store as the LARGER peak
    big = max(range(n_ops), key=lambda j: peak[j]) if n_ops else 0
    small = 1 - big if n_ops == 2 else big
    ok = strict_l1 <= final[big] <= upper_l1
    return {
        "copies": copies,
        "events": n_events,
        "pairs_ever": pairs_ever,
        "peak_rows_l1": peak[big] if n_ops else 0,
        "final_rows_l1": final[big] if n_ops else 0,
        "model_alive_l1": strict_l1,
        "model_upper_l1": upper_l1,
        "peak_rows_l2": peak[small] if n_ops == 2 else None,
        "final_rows_l2": final[small] if n_ops == 2 else None,
        "removed_rows": removed,
        "mem_peak_bytes": mem,
        "wall_s": wall,
        "ok": ok,
    }


# ---------------------------------------------------------------------------
# ewma / holt (VERDICT r10 #4): state == key cardinality, never volume
# ---------------------------------------------------------------------------


def run_smoother(spark, copies: int, batches: int, op: str = "ewma"):
    """Certify the per-key smoothers' NoTimeout contract on both its
    designed shape and its adversarial boundary (see module docstring)."""
    fn = stateful.streaming_ewma if op == "ewma" else stateful.streaming_holt
    from broker_spark.plans.catalog import _stage_ordered_batches

    out = {"copies": copies, "ok": True, "wall_s": 0.0}
    for shape, disjoint in (("skew", False), ("adv", True)):
        ev, _lo, _hi = build_events(spark, copies, disjoint_users=disjoint)
        n_events = ev.count()
        # one deterministic (key, bucket, value) row per metric-key and
        # hour — the smoothers' input shape (a windowed rollup level)
        keyed = (
            ev.select(
                F.concat(
                    F.col("event_type"), F.lit("#"), F.col("user_id").cast("string")
                ).alias("key"),
                F.floor(F.unix_millis("ts") / F.lit(HOUR_MS)).cast("long").alias(
                    "bucket"
                ),
                "value",
            )
            .groupBy("key", "bucket")
            .agg(F.avg("value").alias("value"))
        ).localCheckpoint()
        n_keys = keyed.select("key").distinct().count()
        tmp = tempfile.mkdtemp(prefix=f"state_{op}_{shape}_x{copies}_")
        # strictly-forward contract: stage in bucket order so each key's
        # buckets are non-decreasing across micro-batches
        bmin, bmax = keyed.agg(F.min("bucket"), F.max("bucket")).collect()[0]
        step = (bmax - bmin) // batches + 1
        _stage_ordered_batches(
            keyed,
            F.least(
                F.floor((F.col("bucket") - F.lit(bmin)) / F.lit(step)),
                F.lit(batches - 1),
            ),
            batches,
            f"{tmp}/in",
        )
        src = (
            spark.readStream.schema("key string, bucket long, value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{tmp}/in")
        )
        q, wall = _replay(spark, fn(src), tmp)
        removed, peak, final, mem = _drain_progress(q)
        shutil.rmtree(tmp, ignore_errors=True)
        # the model: one state row per metric key ever, zero evictions —
        # volume-scaling must not move it (skew), key-scaling moves it
        # 1:1 (adv)
        ok = final[0] == n_keys and removed == 0 and peak[0] == n_keys
        out.update(
            {
                f"events_{shape}": n_events,
                f"keys_{shape}": n_keys,
                f"peak_{shape}": peak[0],
                f"final_{shape}": final[0],
                f"removed_{shape}": removed,
                f"mem_{shape}": mem,
            }
        )
        out["ok"] = out["ok"] and ok
        out["wall_s"] += wall
    out["wall_s"] = round(out["wall_s"], 1)
    return out


def run_smoother_ttl(spark, copies: int, batches: int, ttl_ms: int, op: str = "ewma"):
    """Certify the TTL'd smoother twins' BOUNDED contract (VERDICT r11
    #6) on the adversarial shape the NoTimeout smoothers are linear in:
    disjoint per-copy key spaces laid back-to-back in event time, so
    keys-ever grows kx while only the trailing ttl's active keys may
    hold state.  Two-sided model over per-key last touches, exactly the
    alerts/lsh guard: strict = keys alive at the final watermark,
    upper = keys alive at the pre-final watermark (the one the last
    batch's timeout pass actually used).  Both twins share one model:
    each evicts at last_bucket + ttl regardless of what the state
    carries (a level, or Holt's (level, trend, held-first-point))."""
    from broker_spark.plans.catalog import _stage_ordered_batches

    fn = stateful.streaming_ewma_ttl if op == "ewma" else stateful.streaming_holt_ttl
    ev, _lo, _hi = build_events(spark, copies, disjoint_users=True)
    n_events = ev.count()
    keyed = (
        ev.select(
            F.concat(
                F.col("event_type"), F.lit("#"), F.col("user_id").cast("string")
            ).alias("key"),
            F.floor(F.unix_millis("ts") / F.lit(HOUR_MS)).cast("long").alias("bucket"),
            "value",
        )
        .groupBy("key", "bucket")
        .agg(F.avg("value").alias("value"))
    ).localCheckpoint()
    n_keys = keyed.select("key").distinct().count()
    tmp = tempfile.mkdtemp(prefix=f"state_{op}_ttl_x{copies}_")
    bmin, bmax = keyed.agg(F.min("bucket"), F.max("bucket")).collect()[0]
    step = (bmax - bmin) // batches + 1
    _stage_ordered_batches(
        keyed,
        F.least(
            F.floor((F.col("bucket") - F.lit(bmin)) / F.lit(step)),
            F.lit(batches - 1),
        ),
        batches,
        f"{tmp}/in",
    )
    src = (
        spark.readStream.schema("key string, bucket long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp}/in")
    )
    q, wall = _replay(spark, fn(src, ttl_ms=ttl_ms), tmp)
    removed, peak, final, mem = _drain_progress(q)
    touches = (
        keyed.groupBy("key").agg((F.max("bucket") * F.lit(HOUR_MS)).alias("last_ms"))
    ).localCheckpoint()
    wm_final = bmax * HOUR_MS
    wm_pre_final = (bmin + (batches - 1) * step) * HOUR_MS - 1
    model_strict = touches.filter(
        F.col("last_ms") + F.lit(ttl_ms) >= F.lit(wm_final)
    ).count()
    model_upper = touches.filter(
        F.col("last_ms") + F.lit(ttl_ms) >= F.lit(wm_pre_final)
    ).count()
    shutil.rmtree(tmp, ignore_errors=True)
    ok = model_strict <= final[0] <= model_upper
    return {
        "copies": copies,
        "events": n_events,
        "keys_ever": n_keys,
        "peak_rows": peak[0],
        "final_rows": final[0],
        "removed_rows": removed,
        "model_alive": model_strict,
        "model_upper": model_upper,
        "mem_peak_bytes": mem,
        "wall_s": wall,
        "ok": ok,
    }


def _smoother_table(op: str):
    return (
        lambda spark, copies, batches: run_smoother(spark, copies, batches, op),
        "| scale | skew: events | keys | final rows (model: keys) "
        "| adversarial: events | keys | final rows (model: keys) | evicted |",
        lambda r: f"| x{r['copies']} | {r['events_skew']:,} | {r['keys_skew']:,} "
        f"| {r['final_skew']:,} | {r['events_adv']:,} | {r['keys_adv']:,} "
        f"| {r['final_adv']:,} | {r['removed_skew'] + r['removed_adv']:,} |",
    )


def _smoother_ttl_table(op: str):
    return (
        lambda spark, copies, batches, ttl_ms: run_smoother_ttl(
            spark, copies, batches, ttl_ms, op
        ),
        "| scale | events | keys ever (NoTimeout state) | peak state rows "
        "| final state rows | ttl model | evicted |",
        lambda r: f"| x{r['copies']} | {r['events']:,} | {r['keys_ever']:,} "
        f"| {r['peak_rows']:,} | {r['final_rows']:,} "
        f"| {r['model_alive']:,} | {r['removed_rows']:,} |",
    )


TABLES = {
    "ewma": _smoother_table("ewma"),
    "holt": _smoother_table("holt"),
    "ewma_ttl": _smoother_ttl_table("ewma"),
    "holt_ttl": _smoother_ttl_table("holt"),
    "lsh": (
        run_lsh,
        "| scale | docs | buckets ever (NoTimeout state) | peak state rows "
        "| final state rows | horizon model | evicted |",
        lambda r: f"| x{r['copies']} | {r['docs']:,} | {r['buckets_ever']:,} "
        f"| {r['peak_rows']:,} | {r['final_rows']:,} "
        f"| {r['model_alive']:,} | {r['removed_rows']:,} |",
    ),
    "alerts": (
        run_alerts,
        "| scale | events | keys ever (NoTimeout state) | peak state rows "
        "| final state rows | horizon model | evicted |",
        lambda r: f"| x{r['copies']} | {r['events']:,} | {r['keys_ever']:,} "
        f"| {r['peak_rows']:,} | {r['final_rows']:,} "
        f"| {r['model_alive']:,} | {r['removed_rows']:,} |",
    ),
    "funnel": (
        run_funnel,
        "| scale | events | users | peak state rows (model: users) "
        "| final state rows (model: 0) | flushed |",
        lambda r: f"| x{r['copies']} | {r['events']:,} | {r['users']:,} "
        f"| {r['peak_rows']:,} | {r['final_rows']:,} | {r['removed_rows']:,} |",
    ),
    "cdc": (
        run_cdc,
        "| scale | changelog rows | distinct keys | state-table rows "
        "(model: keys) |",
        lambda r: f"| x{r['copies']} | {r['changelog_rows']:,} | {r['keys']:,} "
        f"| {r['table_rows']:,} |",
    ),
    "trailing": (
        run_trailing,
        "| scale | events | (window,user) pairs ever | peak L1 rows "
        "| final L1 rows | open-window model | final L2 rows |",
        lambda r: f"| x{r['copies']} | {r['events']:,} | {r['pairs_ever']:,} "
        f"| {r['peak_rows_l1']:,} | {r['final_rows_l1']:,} "
        f"| {r['model_alive_l1']:,} | {r['final_rows_l2']} |",
    ),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--op", nargs="+", default=["lsh"], choices=sorted(TABLES), help="ops to certify"
    )
    ap.add_argument("--copies", type=int, nargs="+", default=[1, 10, 100])
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument(
        "--horizon-hours", type=int, default=168, help="7-day default dedup horizon"
    )
    ap.add_argument(
        "--alert-horizon-hours", type=int, default=12,
        help="the alerts certificate's 12 h horizon",
    )
    args = ap.parse_args()
    spark = get_spark(app_name="state-scale")
    spark.sparkContext.setLogLevel("ERROR")

    failed = False
    for op in args.op:
        fn, header, fmt = TABLES[op]
        if op == "lsh":
            rows = [
                fn(spark, k, args.batches, args.horizon_hours * HOUR_MS)
                for k in args.copies
            ]
        elif op in ("alerts", "ewma_ttl", "holt_ttl"):
            rows = [
                fn(spark, k, args.batches, args.alert_horizon_hours * HOUR_MS)
                for k in args.copies
            ]
        else:
            rows = [fn(spark, k, args.batches) for k in args.copies]
        print(f"\n### {op}")
        print(header)
        print("|" + "---|" * (header.count("|") - 1))
        for r in rows:
            print(fmt(r))
            if not r["ok"]:
                failed = True
                print(f"FAIL {op} x{r['copies']}: {json.dumps(r)}", file=sys.stderr)
        print(f"\nRaw {op}:", json.dumps(rows))
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
