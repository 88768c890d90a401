"""Spot-check a subset of catalog entries against their DuckDB oracles.

Usage: python tools/check_entries.py [--sf SF_DIR] name [name ...]

Same value-level comparison as tools/selfcheck.py (order-insensitive,
floats at 6 dp), but only for the named entries — the fast loop for
verifying a new or changed entry at sf0.001 and sf0.01 before committing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from broker_spark.plans.catalog import CATALOG
from broker_spark.session import get_spark
from broker_spark.tables import TABLE_NAMES
from tools.selfcheck import norm


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    # accept --sf anywhere (an --sf AFTER the names used to be treated
    # as two entry names: the real entries silently checked at the
    # DEFAULT sf and the flag itself errored as an unknown entry)
    if "--sf" in args:
        i = args.index("--sf")
        if i + 1 >= len(args):
            print("usage: check_entries.py [--sf SF_DIR] name [name ...]")
            sys.exit(2)
        sf_dir = args[i + 1]
        del args[i : i + 2]
    names = args
    unknown = [n for n in names if n not in CATALOG]
    if unknown:
        print(f"unknown entries: {unknown}")
        sys.exit(2)
    spark = get_spark(app_name="check_entries")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    n_bad = 0
    for name in names:
        entry = CATALOG[name]
        t0 = time.perf_counter()
        try:
            df = entry.fn(spark, sf_dir)
            cols = sorted(df.columns)
            sp = sorted(tuple(norm(r[c]) for c in cols) for r in df.collect())
            if entry.sql is None:
                print(f"{name}: rows_only rows={len(sp)} "
                      f"({time.perf_counter() - t0:.1f}s)")
                continue
            opdf = con.execute(entry.sql).df()
            ocols = sorted(opdf.columns)
            if ocols != cols:
                n_bad += 1
                print(f"{name}: SCHEMA MISMATCH spark={cols} oracle={ocols}")
                continue
            od = sorted(
                tuple(norm(v) for v in rec)
                for rec in opdf[cols].itertuples(index=False, name=None)
            )
            if sp == od:
                print(f"{name}: ok rows={len(sp)} "
                      f"({time.perf_counter() - t0:.1f}s)")
            else:
                n_bad += 1
                print(f"{name}: VALUE MISMATCH spark_rows={len(sp)} "
                      f"oracle_rows={len(od)}")
                only_sp = [r for r in sp if r not in set(od)][:3]
                only_od = [r for r in od if r not in set(sp)][:3]
                for r in only_sp:
                    print(f"  spark-only: {r}")
                for r in only_od:
                    print(f"  oracle-only: {r}")
        except Exception as exc:  # noqa: BLE001 — per-entry isolation
            n_bad += 1
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
