"""Split one entry's wall time into its driver-side components:

  build  — the Python fn(spark, sf_dir) call: Py4J round-trips +
           unresolved-plan construction
  plan   — forcing queryExecution().executedPlan(): Catalyst analysis,
           optimization and physical planning (pre-AQE)
  exec   — .count() on a FRESH frame (build+plan+execute, the bench's
           timed unit) minus the two above = scheduling + execution

Usage: python tools/residue.py [--sf DIR] [--runs N] entry1 [entry2 ...]

Each component is reported as the best of N fresh constructions, so the
numbers compose: the bench's per-run cost ~= build + plan + exec_resid.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    runs = 3
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--sf":
            sf_dir = args[i + 1]
            i += 2
        elif args[i] == "--runs":
            runs = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1

    from broker_spark.plans.catalog import CATALOG
    from broker_spark.session import get_spark
    from broker_spark.tables import TABLE_NAMES, load

    spark = get_spark(app_name="residue")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).count()
    for t in TABLE_NAMES:
        load(spark, sf_dir, t).limit(1).count()

    for name in names:
        fn = CATALOG[name].fn
        builds, plans, totals = [], [], []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            plans.append(t2 - t1)
            # fresh frame for the bench-identical timed unit
            t3 = time.perf_counter()
            fn(spark, sf_dir).count()
            totals.append(time.perf_counter() - t3)
        b, p, tot = min(builds), min(plans), min(totals)
        print(
            f"{name}: total={tot:.3f} build={b:.3f} plan={p:.3f} "
            f"exec~={tot - b - p:.3f}"
        )


if __name__ == "__main__":
    main()
