"""Compaction job: rewrite (closed) log partitions with right-sized files.

    python -m broker_spark.jobs.compact --path /data/log \
        [--predicate "bucket < 475000"] [--max-records-per-file 500000]

Run on past buckets only (`--predicate`) so it never races the live
writer; see storage.writer.compact_partitions for semantics.
"""

from __future__ import annotations

import argparse

from broker_spark.session import get_spark
from broker_spark.storage.writer import compact_partitions


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--path", required=True)
    p.add_argument("--predicate", default=None)
    p.add_argument("--max-records-per-file", type=int, default=500_000)
    args = p.parse_args(argv)
    spark = get_spark(app_name="compact")
    compact_partitions(spark, args.path, args.predicate, args.max_records_per_file)
    print(f"compacted {args.path}" + (f" where {args.predicate}" if args.predicate else ""))


if __name__ == "__main__":
    main()
