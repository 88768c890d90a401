"""Per-entry job profile: run one catalog entry and attribute its wall
time to the Spark jobs it launched, via the local UI REST API.

Usage: python tools/qprofile.py entry1 [entry2 ...] [--sf /root/testdata/sf0.1]

For each entry prints one line per Spark job (duration, stage/task
counts, the job group description) plus the non-job residue (driver-side
planning, Py4J round-trips, collect deserialization) — the direct answer
to "where do this query's seconds go", which per-query best-of-N totals
can't see.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from broker_spark.plans.catalog import CATALOG
from broker_spark.session import get_spark


def _api(base: str, path: str):
    with urllib.request.urlopen(f"{base}/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("entries", nargs="+", help="catalog entry names to profile")
    ap.add_argument("--sf", default="/root/testdata/sf0.1", dest="sf_dir")
    ns = ap.parse_args()
    args, sf_dir = ns.entries, ns.sf_dir

    spark = get_spark(app_name="qprofile", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    # warm up session infrastructure the way bench.py does
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    for name in args:
        fn = CATALOG[name].fn
        # one untimed warm run (JVM/codegen/file-listing warm, matches
        # bench best-of-N steady state)
        fn(spark, sf_dir).count()
        jobs_before = {j["jobId"] for j in _api(base, f"applications/{app_id}/jobs")}
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        wall = time.perf_counter() - t0
        time.sleep(0.3)
        jobs = [
            j
            for j in _api(base, f"applications/{app_id}/jobs")
            if j["jobId"] not in jobs_before
        ]
        jobs.sort(key=lambda j: j["jobId"])
        job_total = 0.0
        print(f"\n=== {name}  wall={wall:.3f}s  rows={n}  n_jobs={len(jobs)}")
        for j in jobs:
            if not j.get("submissionTime") or not j.get("completionTime"):
                # failed, or not finalized despite the settle sleep — flag
                # it and keep profiling instead of killing the whole run
                print(
                    f"  job {j['jobId']:>4}  <no completionTime: "
                    f"status={j.get('status')}>  skipped"
                )
                continue
            t_sub = time.mktime(
                time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            ) + float(j["submissionTime"][20:23]) / 1000
            t_end = time.mktime(
                time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            ) + float(j["completionTime"][20:23]) / 1000
            dur = t_end - t_sub
            job_total += dur
            desc = (j.get("description") or j.get("name") or "")[:90]
            print(
                f"  job {j['jobId']:>4}  {dur:6.3f}s  stages={len(j['stageIds']):>2} "
                f"tasks={j['numTasks']:>4}  {desc}"
            )
        print(f"  jobs-sum={job_total:.3f}s  residue={wall - job_total:.3f}s")


if __name__ == "__main__":
    main()
