"""Stage-by-stage wall profile of prefix_filter_jaccard_pairs_maintained
at a grown corpus — identifies WHICH stored-table scan carries the
corpus-proportional residual (BENCH_SCALE round-12: 4.4x at 100x) before
building the file-pruning lever (VERDICT r12 #1).

Usage: python tools/profile_maintained.py [--copies 100] [--threshold 0.5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F

from broker_spark.pipeline import dedup
from broker_spark.pipeline.dedup import (
    _drop_hot_postings,
    _prefix_index_tables,
    _rank_batch_under_epoch,
    _settle,
    _spread,
    pin,
    word_shingles,
)
from broker_spark.session import get_spark

OFFSET = 10_000_000


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    print(f"  {label:42s} {dt:8.3f} s   -> {out}")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=100)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="profile-maintained")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()

    k = args.copies
    sf = src if k == 1 else os.path.join(REPO, ".scale", f"sf0.1x{k}")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    is_batch = (F.col("doc_id") % 5 == 0) & (F.col("doc_id") < OFFSET)
    batch = docs.filter(is_batch)
    corpus = docs.filter(~is_batch)

    name = f"pfx_scale_x{k}"
    t_names = _prefix_index_tables(name)
    df_name, post_name, tok_name = t_names.df, t_names.postings, t_names.tokens
    if args.rebuild or not spark.catalog.tableExists(post_name):
        t0 = time.perf_counter()
        dedup.build_prefix_filter_index(corpus, name, args.threshold)
        print(f"build: {time.perf_counter() - t0:.1f} s")

    print("stored table sizes:")
    for nm in (df_name, post_name, tok_name):
        t(f"count {nm}", lambda nm=nm: spark.table(nm).count())

    print("end-to-end (2 runs):")
    for _ in range(2):
        t(
            "maintained e2e",
            lambda: dedup.prefix_filter_jaccard_pairs_maintained(
                spark, batch, name, args.threshold
            ).count(),
        )

    print("stages:")
    epoch_df = spark.table(df_name).drop("tok_range")
    pc = spark.table(post_name).drop("tok_range")
    tall = spark.table(tok_name)
    n_new = t("batch count", batch.count)
    tn = _spread(batch, n_rows=n_new).select(
        "doc_id",
        F.explode(
            F.array_distinct(word_shingles(F.col("text"), dedup.DEFAULT_SHINGLE))
        ).alias("tok"),
    )
    tn = _settle(tn, n_new).transform(pin)
    t("tokenize batch (tn count)", tn.count)
    t("batch distinct prefix-side tokens", lambda: tn.select("tok").distinct().count())
    pn = _rank_batch_under_epoch(tn, epoch_df, args.threshold)
    t("rank under epoch (pn count)", pn.count)
    t(
        "pn distinct toks",
        lambda: pn.select("tok").distinct().count(),
    )
    cand = (
        pn.alias("n")
        .join(pc.alias("c"), "tok")
        .filter(F.col("n.doc_id") != F.col("c.doc_id"))
        .filter(
            F.lit(args.threshold) * F.greatest("n.n_tok", "c.n_tok")
            <= F.least("n.n_tok", "c.n_tok")
        )
        .select(
            F.col("n.doc_id").alias("new_doc_id"),
            F.col("c.doc_id").alias("corpus_doc_id"),
            F.col("n.n_tok").alias("na"),
            F.col("c.n_tok").alias("nb"),
        )
        .distinct()
    )
    t("candidate join (cand count)", cand.count)
    cand_ids = cand.select(F.col("corpus_doc_id").alias("doc_id")).distinct()
    n_cand = t("distinct candidate corpus docs", cand_ids.count)
    tb = tall.join(cand_ids, "doc_id", "left_semi").select(
        F.col("doc_id").alias("corpus_doc_id"), "tok"
    )
    t("verify semi-join (tb count)", tb.count)
    ta = tn.select(F.col("doc_id").alias("new_doc_id"), "tok")
    common = (
        cand.join(ta, "new_doc_id")
        .join(tb, ["corpus_doc_id", "tok"])
        .groupBy("new_doc_id", "corpus_doc_id", "na", "nb")
        .agg(F.count(F.lit(1)).cast("long").alias("common"))
    )
    t("common count (verify)", common.count)
    _ = n_cand


if __name__ == "__main__":
    main()
