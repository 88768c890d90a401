"""Time a subset of catalog entries with bench.py's exact methodology,
optionally under Spark conf overrides — the A/B loop for optimization
experiments (guide §1: measure, change one thing, re-measure).

Usage:
  python tools/bench_subset.py [--sf DIR] [--runs N] [--conf k=v ...] \
      [--noop] entry1 [entry2 ...]

--conf overrides are applied at session build (new session per process,
so run one configuration per invocation).  --noop times the noop sink
(guide §1.4: computes every column, no count-side pruning) instead of
the bench's historical `.count()` action; the default stays `.count()`
so numbers are comparable with committed BENCH_DETAIL records.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    runs = 3
    confs: dict[str, str] = {}
    noop = False
    names: list[str] = []
    i = 0
    while i < len(args):
        a = args[i]
        if a == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif a == "--runs":
            runs = int(args[i + 1])
            i += 2
        elif a == "--conf":
            k, v = args[i + 1].split("=", 1)
            confs[k] = v
            i += 2
        elif a == "--noop":
            noop = True
            i += 1
        else:
            names.append(a)
            i += 1

    from broker_spark.plans.catalog import CATALOG
    from broker_spark.session import get_spark
    from broker_spark.tables import TABLE_NAMES, load

    spark = get_spark(app_name="bench_subset", extra_conf=confs)
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    spark.createDataFrame([(1, 1.0)], "k int, v double").groupBy("k").applyInPandas(
        lambda pdf: pdf, "k int, v double"
    ).count()
    for t in TABLE_NAMES:
        _ = load(spark, sf_dir, t).limit(1).count()

    import bench

    def action(df):
        if noop:
            df.write.format("noop").mode("overwrite").save()
            return -1
        return df.count()

    out: dict[str, dict] = {}
    for name in names:
        fn = CATALOG[name].fn
        spark.sparkContext.setJobDescription(f"bench_subset:{name}")
        samples: list[float] = []
        n = 0
        while len(samples) < runs or (
            min(samples) < bench.SUB_SECOND and len(samples) < bench.MAX_RUNS
        ):
            t0 = time.perf_counter()
            n = action(fn(spark, sf_dir))
            samples.append(time.perf_counter() - t0)
        samples.sort()
        out[name] = {"best": round(samples[0], 3),
                     "samples": [round(s, 3) for s in samples], "rows": n}
        print(f"# {name}: {samples[0]:.3f}s rows={n} runs={[round(s,3) for s in samples]}",
              file=sys.stderr)
        spark.sparkContext.setJobDescription(None)
    total = round(sum(v["best"] for v in out.values()), 3)
    print(json.dumps({"total_best": total, "conf": confs, "noop": noop,
                      "queries": {k: v["best"] for k, v in out.items()}}))


if __name__ == "__main__":
    main()
