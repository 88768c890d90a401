"""Round-6 operator scale slopes: time the session's new entries at
sf0.1 and at the cross-copy-disjoint 10x replication (rebuilding
.scale/sf0.1x10 if absent via tools.bench_scale.build).

Usage: python tools/scale_r6.py [--copies 10] [--runs 2]
Prints a markdown table fragment to stdout (appended to BENCH_SCALE.md
by hand, per the per-session convention).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from broker_spark.session import get_spark
from tools.bench_scale import build, time_set

ENTRIES = [
    # session 1 (measured at 10x/100x in BENCH_SCALE.md already)
    "bpe_learn_merges",
    "bpe_vocab_after_merges",
    "record_linkage_pairs",
    "entity_resolution_names",
    "multitouch_attribution",
    "holt_trend_daily",
    "theil_sen_daily_trend",
    "seasonal_naive_mape",
]

#: sessions 2-4 (pass --sessions 2 to measure these instead)
ENTRIES_S2 = [
    "streaming_holt_replay",
    "seasonal_trend_anomalies",
    "link_prediction_adamic_adar",
    "heaps_vocab_growth",
    "matryoshka_recall",
    "layout_pruning_benefit",
    "k_anonymity_audit",
    "churn_label_features",
    "conversion_latency_quantiles",
    "bpe_fertility_by_lang",
]


#: round 7 (pass --sessions 3): the ADVICE backfill + the interval-merge
#: trailing distinct measured against the hop form it replaces (VERDICT
#: r6 #4: the hop form's 24x expansion was 45.9 s at 100x — the worst
#: shape in BENCH_SCALE; the interval form's target is <= ~10 s)
ENTRIES_S3 = [
    "layout_pruning_multidim",
    "events_trailing_distinct_users",
    "events_trailing_distinct_interval",
]


#: round 7, second batch (pass --sessions 4): the CTE-reuse-pass entries
#: (VERDICT r6 #7) re-measured AFTER the pinning rewrite, showing the
#: exchange cuts hold at replication scale
ENTRIES_S4 = [
    "seasonal_trend_anomalies",
    "dedup_graph_triangles",
    "curated_mix_manifest",
    "minhash_estimate_error",
]


#: round 8 (pass --sessions 5): (a) the reference's core resend/metadata
#: path measured at replication scale instead of the fixed-overhead-bound
#: sf0.1 numbers (VERDICT r7 #6), and (b) the densification-guarded twins
#: next to their unguarded forms — the guard's claim is that growth stops
#: tracking pair-graph density (12.6x/13.4x unguarded at 100x) and falls
#: back to data scale (VERDICT r7 #5).
ENTRIES_S5 = [
    "resend_last",
    "resend_from",
    "resend_range",
    "resend_range_publisher",
    "resend_last_global",
    "metadata_counts",
    "dedup_graph_triangles_guarded",
    "minhash_estimate_error_guarded",
]


#: round 10 (pass --sessions 6): the five most expensive r9 headline
#: queries re-measured at the CURRENT HEAD (VERDICT r9 #5 — some of
#: their committed slopes date to r7 measurements of earlier plans).
ENTRIES_S6 = [
    "dedup_components_incremental",
    "layout_pruning_multidim",
    "link_prediction_adamic_adar",
    "dedup_prefix_filter_pairs",
    "ann_rp_lsh_topk",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sessions", type=int, default=1)
    ap.add_argument(
        "--entries", nargs="+", default=None,
        help="explicit entry names (overrides --sessions)",
    )
    args = ap.parse_args()
    entries = args.entries or {
        1: ENTRIES,
        2: ENTRIES_S2,
        3: ENTRIES_S3,
        4: ENTRIES_S4,
        5: ENTRIES_S5,
        6: ENTRIES_S6,
    }[args.sessions]

    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    dst = os.path.join(REPO, ".scale", f"sf0.1x{args.copies}")
    spark = get_spark(app_name="broker-spark-scale-r6")
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.isdir(os.path.join(dst, "documents.parquet")):
        build(spark, src, dst, args.copies)

    spark.range(1).count()
    base = time_set(spark, src, args.runs, copies=1, entries=entries)
    scaled = time_set(spark, dst, args.runs, copies=args.copies, entries=entries)

    print(f"| query | t(sf0.1) s | t({args.copies}x) s | ratio | verdict |")
    print("|---|---|---|---|---|")
    for name in entries:
        r = scaled[name] / base[name] if base[name] else float("inf")
        verdict = (
            "SUPER-LINEAR — inspect"
            if r > 1.5 * args.copies
            else ("~linear" if r > 0.5 * args.copies else "sub-linear (overhead-bound)")
        )
        print(f"| {name} | {base[name]} | {scaled[name]} | {r:.1f}x | {verdict} |")
    print()
    print(
        "Raw: "
        + json.dumps({"base": base, "scaled": scaled, "copies": args.copies})
    )


if __name__ == "__main__":
    main()
