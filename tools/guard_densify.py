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


def run_between(spark, src: str, dst: str, copies: int, runs: int) -> None:
    """VERDICT r11 #4: the clone-storm measurement for the INCREMENTAL
    prefix join.  Verbatim replication with shifted doc_ids sprays each
    clone family across BOTH sides of the %7 new/corpus split (the
    re-crawl-meets-archive shape), so every clone's prefix tokens land in
    the same postings on both sides and the uncapped candidate join's
    fan-out goes |pn posting| x |pc posting| — quadratic in the clone
    factor.  Times the uncapped form against the corpus-side cap alone
    (max_posting_size, the default one-sided doctrine) and both caps
    (+ max_new_posting_size), at 1x and kx."""
    from broker_spark.pipeline import dedup as _dedup

    CAP = 8  # the LSH stop-bucket recipe's bound: C(8,2) pairs per token

    def split(sf):
        docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
        return (
            docs.filter(F.col("doc_id") % 7 == 0),
            docs.filter(F.col("doc_id") % 7 != 0),
        )

    forms = {
        "uncapped": {},
        f"corpus cap {CAP}": {"max_posting_size": CAP},
        f"both caps {CAP}": {"max_posting_size": CAP, "max_new_posting_size": CAP},
    }
    results = {}
    for label, kw in forms.items():
        for tag, sf in (("base", src), ("dense", dst)):
            new, corpus = split(sf)
            best, n = float("inf"), 0
            for _ in range(runs):
                t0 = time.perf_counter()
                n = _dedup.prefix_filter_jaccard_pairs_between(
                    new, corpus, threshold=0.5, **kw
                ).count()
                best = min(best, round(time.perf_counter() - t0, 3))
            results[(label, tag)] = (best, n)

    print(
        f"| prefix_filter_jaccard_pairs_between | t(sf0.1) s "
        f"| t(verbatim x{copies}) s | ratio | pairs 1x -> kx |"
    )
    print("|---|---|---|---|---|")
    for label in forms:
        b, nb = results[(label, "base")]
        d, nd = results[(label, "dense")]
        r = d / b if b else float("inf")
        print(f"| {label} | {b} | {d} | {r:.1f}x | {nb} -> {nd} |")
    print()
    print(
        "Raw between:",
        json.dumps({f"{l}/{t}": v for (l, t), v in results.items()}),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--entries", nargs="+", default=ENTRIES,
        help="catalog entries to time (default: the r8 minhash four)",
    )
    ap.add_argument(
        "--between", action="store_true",
        help="clone-storm measurement for the incremental prefix join "
        "(VERDICT r11 #4) instead of the catalog entries",
    )
    args = ap.parse_args()

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dst = os.path.join(REPO, ".scale", f"dense_sf0.1x{args.copies}")
    spark = get_spark(app_name="broker-spark-guard-densify")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(os.path.join(dst, "documents.parquet")):
        build_dense(spark, src, dst, args.copies)
    spark.range(1).count()

    if args.between:
        run_between(spark, src, dst, args.copies, args.runs)
        return

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
