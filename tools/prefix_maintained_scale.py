"""Maintained prefix-filter index: fixed-batch wall vs corpus growth
(VERDICT r11 #2's done-criterion).

The recomputing `prefix_filter_jaccard_pairs_between` pays the CORPUS
every call (tokenize + df + prefix-rank the stored side per batch), so
its wall grows with the corpus even when the batch is constant.  The
maintained form pays the corpus once at `build_prefix_filter_index` and
each batch query touches: the batch's own tokenize/rank (constant), one
join against the bucketed postings (shuffle-free on the stored side; the
stored side contributes a columnar three-column SCAN, the one
corpus-proportional term left), and candidate-scoped verification.

This tool times, at corpus x1/x10/x100 (the cross-copy-DISJOINT
replication of tools/bench_scale.py — organic growth, not clone storms)
with the SAME sf0.1 batch (doc_id % 5 == 0) every time:

- build: one-time index build wall (the amortized cost);
- maintained: best-of-N batch query against the index;
- recomputed: best-of-N `prefix_filter_jaccard_pairs_between` — the
  contrast whose wall tracks the corpus;

and asserts maintained == recomputed rows at every scale (the exactness
certificate riding along with the measurement).

Usage: python tools/prefix_maintained_scale.py [--copies 1 10 100]
                                               [--runs 2] [--threshold 0.5]
Prints a markdown fragment for BENCH_SCALE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from broker_spark.pipeline import dedup
from broker_spark.session import get_spark
from tools.bench_scale import build

OFFSET = 10_000_000  # tools/bench_scale doc_id shift per copy


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, nargs="+", default=[1, 10, 100])
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--threshold", type=float, default=0.5)
    args = ap.parse_args()

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="broker-spark-prefix-maintained-scale")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    rows = []
    for k in args.copies:
        sf = src if k == 1 else os.path.join(REPO, ".scale", f"sf0.1x{k}")
        if k != 1 and not os.path.isdir(os.path.join(sf, "documents.parquet")):
            build(spark, src, sf, k)
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        # the FIXED batch: the base corpus's %5==0 slice, identical at
        # every scale; the corpus is everything else (base %5!=0 plus all
        # replicated copies)
        is_batch = (F.col("doc_id") % 5 == 0) & (F.col("doc_id") < OFFSET)
        batch = docs.filter(is_batch)
        corpus = docs.filter(~is_batch)
        n_corpus = corpus.count()

        name = f"pfx_scale_x{k}"
        t0 = time.perf_counter()
        dedup.build_prefix_filter_index(corpus, name, args.threshold)
        t_build = round(time.perf_counter() - t0, 3)

        t_maint, n_maint = float("inf"), 0
        for _ in range(args.runs):
            t0 = time.perf_counter()
            n_maint = dedup.prefix_filter_jaccard_pairs_maintained(
                spark, batch, name, args.threshold
            ).count()
            t_maint = min(t_maint, round(time.perf_counter() - t0, 3))

        t_rec, n_rec = float("inf"), 0
        for _ in range(args.runs):
            t0 = time.perf_counter()
            n_rec = dedup.prefix_filter_jaccard_pairs_between(
                batch, corpus, args.threshold
            ).count()
            t_rec = min(t_rec, round(time.perf_counter() - t0, 3))

        assert n_maint == n_rec, (k, n_maint, n_rec)
        rows.append(
            {
                "copies": k,
                "corpus_docs": n_corpus,
                "build_s": t_build,
                "maintained_s": t_maint,
                "recomputed_s": t_rec,
                "pairs": n_maint,
            }
        )

    base = rows[0]
    print(
        "| corpus | docs | build (once) s | maintained batch query s (ratio) "
        "| recomputed s (ratio) | pairs (== recomputed) |"
    )
    print("|---|---|---|---|---|---|")
    for r in rows:
        rm = r["maintained_s"] / max(base["maintained_s"], 1e-9)
        rr = r["recomputed_s"] / max(base["recomputed_s"], 1e-9)
        print(
            f"| x{r['copies']} | {r['corpus_docs']:,} | {r['build_s']} "
            f"| {r['maintained_s']} ({rm:.1f}x) | {r['recomputed_s']} ({rr:.1f}x) "
            f"| {r['pairs']} |"
        )
    print()
    print("Raw:", json.dumps(rows))


if __name__ == "__main__":
    main()
