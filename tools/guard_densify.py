"""Densification-guard experiment (VERDICT r7 #5): show the stop-bucket
cap breaking the duplication coupling that the FAIR replication in
tools/bench_scale.py deliberately avoids.

bench_scale's replicas are cross-copy DISJOINT (suffixed tokens), so LSH
bucket sizes are scale-invariant there and both the guarded and unguarded
census grow with the corpus — that axis measures operator slope, not the
guard.  The failure mode the guard exists for is the opposite workload:
VERBATIM duplication (mirror dumps, boilerplate, re-crawls), where every
copy of a document lands in the SAME band buckets, bucket size grows with
the duplication factor k, and the unguarded within-bucket pair expansion
goes C(k*b, 2) — quadratic in k — while the guarded form stays capped at
C(8, 2) per bucket.

This tool builds .scale/dense_sf0.1x{k} (documents replicated VERBATIM,
doc_ids shifted to stay unique — text collisions are the point) and times
unguarded vs guarded census/estimator at 1x and kx.

Usage: python tools/guard_densify.py [--copies 10] [--runs 2]
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

from broker_spark.plans.catalog import CATALOG
from broker_spark.session import get_spark

OFFSET = 10_000_000

ENTRIES = [
    "dedup_graph_triangles",
    "dedup_graph_triangles_guarded",
    "minhash_estimate_error",
    "minhash_estimate_error_guarded",
]


def build_dense(spark, src: str, dst: str, copies: int) -> None:
    os.makedirs(dst, exist_ok=True)
    base = spark.read.parquet(os.path.join(src, "documents.parquet"))
    parts = [
        base.withColumn("doc_id", F.col("doc_id") + F.lit(i * OFFSET))
        for i in range(copies)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.write.mode("overwrite").parquet(os.path.join(dst, "documents.parquet"))


def time_one(spark, name: str, sf_dir: str, runs: int) -> tuple[float, int]:
    best, n = float("inf"), 0
    for _ in range(runs):
        t0 = time.perf_counter()
        n = CATALOG[name].fn(spark, sf_dir).count()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3), n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--entries", nargs="+", default=ENTRIES,
        help="catalog entries to time (default: the r8 minhash four)",
    )
    args = ap.parse_args()

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dst = os.path.join(REPO, ".scale", f"dense_sf0.1x{args.copies}")
    spark = get_spark(app_name="broker-spark-guard-densify")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(os.path.join(dst, "documents.parquet")):
        build_dense(spark, src, dst, args.copies)
    spark.range(1).count()

    base, dense, rows_base, rows_dense = {}, {}, {}, {}
    for name in args.entries:
        base[name], rows_base[name] = time_one(spark, name, src, args.runs)
    for name in args.entries:
        dense[name], rows_dense[name] = time_one(spark, name, dst, args.runs)

    # The real pipeline shape: exact-hash dedup removes verbatim copies
    # BEFORE LSH ever runs, so the guarded candidate generator sees only
    # the organic corpus — the "guarded rows -> 0 under total k-way
    # duplication" corner never occurs in composition.
    from broker_spark.pipeline import dedup as _dedup

    t0 = time.perf_counter()
    deduped = _dedup.exact_dedup(
        spark.read.parquet(os.path.join(dst, "documents.parquet"))
    )
    n_pipeline = _dedup.minhash_lsh_pairs(deduped, max_bucket_size=8).count()
    t_pipeline = round(time.perf_counter() - t0, 3)
    # baseline: the same composition on the 1x corpus (the base corpus
    # carries its own organic exact duplicates, so the fair comparison is
    # exact_dedup(1x) -> guarded LSH, which the kx pipeline must equal
    # exactly — verbatim replication adds nothing exact dedup can't remove)
    n_base_guarded = _dedup.minhash_lsh_pairs(
        _dedup.exact_dedup(
            spark.read.parquet(os.path.join(src, "documents.parquet"))
        ),
        max_bucket_size=8,
    ).count()

    print(
        f"| query | t(sf0.1) s | t(verbatim x{args.copies}) s | ratio "
        "| result rows 1x -> kx |"
    )
    print("|---|---|---|---|---|")
    for name in args.entries:
        r = dense[name] / base[name] if base[name] else float("inf")
        print(
            f"| {name} | {base[name]} | {dense[name]} | {r:.1f}x "
            f"| {rows_base[name]} -> {rows_dense[name]} |"
        )
    print()
    print(
        f"Pipeline (exact_dedup -> guarded LSH on verbatim x{args.copies}): "
        f"{n_pipeline} candidate pairs in {t_pipeline} s "
        f"(exact_dedup -> guarded LSH on the 1x corpus: {n_base_guarded} — "
        "MUST be equal: exact dedup keeps min doc_id, and every verbatim "
        "copy shares its original's text)"
    )
    assert n_pipeline == n_base_guarded, (n_pipeline, n_base_guarded)
    print()
    print(
        "Raw: "
        + json.dumps(
            {
                "base": base,
                "dense": dense,
                "rows_base": rows_base,
                "rows_dense": rows_dense,
                "pipeline_pairs": n_pipeline,
                "pipeline_sec": t_pipeline,
                "base_guarded_pairs": n_base_guarded,
                "copies": args.copies,
            }
        )
    )


if __name__ == "__main__":
    main()
