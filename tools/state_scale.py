"""Streaming state-store growth certification (VERDICT r8 #5): certify
the horizon-bounded LSH dedup's state the way batch slopes are certified
— replay 1x / 10x / 100x staged streams and record `stateOperators`
metrics (rows, memory) from the StreamingQueryProgress, asserting that
occupancy tracks DISTINCT KEYS WITHIN THE HORIZON, not corpus size.

Construction: the sf0.01 documents table is replicated cross-copy
DISJOINT (every token suffixed `_c{i}`, the bench_scale.py recipe, so
each copy contributes its OWN band buckets) and laid out CONTIGUOUSLY in
event time (ts = doc_id hours, copies back-to-back) — a kx corpus is a
kx-longer stream at the same per-hour document density.  Buckets-ever
therefore grows ~kx while the trailing-horizon occupancy stays flat:
exactly the contract `streaming_lsh_candidates_horizon` makes for a
100 TB stream, vs the NoTimeout form whose state IS buckets-ever.

The guard: with delay-0 watermarks and in-order staging, a bucket
survives the replay iff its last touch is within the horizon of the
watermark at the FINAL batch's timeout processing (= max event time
through the second-to-last file).  That model is computed exactly
batch-side; the tool FAILS (exit 1) if the final state-store row count
exceeds it.

Usage: python tools/state_scale.py [--copies 10 100] [--batches 8]
Prints a markdown fragment for BENCH_SCALE.md.
"""

from __future__ import annotations

import argparse
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


def banded_touches(spark, docs):
    """Batch-side (band, last_touch) frame — the horizon model's input."""
    from broker_spark.pipeline.dedup import _banded, minhash_signatures

    b = _banded(minhash_signatures(docs.select("doc_id", "text")), 4, 2)
    return (
        b.join(docs.select("doc_id", "ts"), "doc_id")
        .groupBy("band_id", "band_key")
        .agg(F.max(F.unix_millis("ts")).alias("last_ms"))
    )


def run_scale(spark, copies: int, batches: int, horizon_ms: int):
    docs, n_docs = build_corpus(spark, copies)
    docs = docs.localCheckpoint()
    tmp = tempfile.mkdtemp(prefix=f"state_scale_x{copies}_")
    # in-order staging, one file per trigger (the replay-certificate recipe)
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
    t0 = time.perf_counter()
    q = (
        stateful.streaming_lsh_candidates_horizon(src, horizon_ms=horizon_ms)
        .writeStream.format("parquet")
        .option("path", f"{tmp}/sink")
        .option("checkpointLocation", f"{tmp}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if not q.awaitTermination(1200):
        import contextlib

        with contextlib.suppress(Exception):  # never mask the timeout
            q.stop()
        raise RuntimeError(f"x{copies} replay did not terminate")
    wall = round(time.perf_counter() - t0, 1)

    removed, peak, final, mem = 0, 0, 0, 0
    for p in q.recentProgress:
        for so in p["stateOperators"] or []:
            removed += so["numRowsRemoved"] or 0
            peak = max(peak, so["numRowsTotal"] or 0)
            if so["numRowsTotal"] is not None:  # 0 is a real final count
                final = so["numRowsTotal"]
            mem = max(mem, so.get("memoryUsedBytes") or 0)

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
    return {
        "copies": copies,
        "docs": n_docs,
        "buckets_ever": buckets_ever,
        "peak_rows": peak,
        "final_rows": final,
        "removed_rows": removed,
        "model_alive": model_strict,
        "model_upper": model_upper,
        "mem_peak_bytes": mem,
        "wall_s": wall,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, nargs="+", default=[1, 10, 100])
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument(
        "--horizon-hours", type=int, default=168, help="7-day default horizon"
    )
    args = ap.parse_args()
    spark = get_spark(app_name="state-scale")
    spark.sparkContext.setLogLevel("ERROR")
    horizon_ms = args.horizon_hours * HOUR_MS

    rows = [run_scale(spark, k, args.batches, horizon_ms) for k in args.copies]

    print(
        "| scale | docs | buckets ever (NoTimeout state) | peak state rows "
        "| final state rows | horizon model | evicted |"
    )
    print("|---|---|---|---|---|---|---|")
    failed = False
    for r in rows:
        print(
            f"| x{r['copies']} | {r['docs']:,} | {r['buckets_ever']:,} "
            f"| {r['peak_rows']:,} | {r['final_rows']:,} "
            f"| {r['model_alive']:,} | {r['removed_rows']:,} |"
        )
        if not (r["model_alive"] <= r["final_rows"] <= r["model_upper"]):
            failed = True
            print(
                f"FAIL x{r['copies']}: final state {r['final_rows']} outside "
                f"the horizon model [{r['model_alive']}, {r['model_upper']}]",
                file=sys.stderr,
            )
    import json

    print("\nRaw:", json.dumps(rows))
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
