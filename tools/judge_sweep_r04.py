"""Judge's independent full-catalog oracle sweep for round 4.

Same method as tools/selfcheck.py (value-level, order-insensitive, floats
rounded to 6 dp, DuckDB oracle at sf0.01) but run by the judge session and
written to JUDGE_SWEEP_r04.json.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

from broker_spark.plans.catalog import CATALOG, _audit_order
from broker_spark.session import get_spark
from broker_spark.tables import TABLE_NAMES
from tools.selfcheck import norm


def main() -> None:
    sf_dir = "/root/testdata/sf0.01"
    spark = get_spark(app_name="judge-sweep-r04")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    results: dict[str, dict] = {}
    for name in _audit_order():
        entry = CATALOG[name]
        t0 = time.perf_counter()
        try:
            df = entry.fn(spark, sf_dir)
            cols = sorted(df.columns)
            rows = df.collect()
            sp = sorted(tuple(norm(r[c]) for c in cols) for r in rows)
            if entry.sql is None:
                results[name] = {
                    "mode": "rows_only",
                    "rows": len(sp),
                    "ok": len(sp) > 0,
                    "sec": round(time.perf_counter() - t0, 2),
                }
            else:
                opdf = con.execute(entry.sql).df()
                ocols = sorted(c for c in opdf.columns)
                od = (
                    sorted(
                        tuple(norm(v) for v in rec)
                        for rec in opdf[cols].itertuples(index=False, name=None)
                    )
                    if ocols == cols
                    else None
                )
                ok = ocols == cols and sp == od
                results[name] = {
                    "mode": "oracle",
                    "rows": len(sp),
                    "oracle_rows": len(opdf),
                    "schema_match": ocols == cols,
                    "values_match": ok,
                    "ok": ok,
                    "sec": round(time.perf_counter() - t0, 2),
                }
        except Exception as exc:  # noqa: BLE001 — per-entry isolation
            results[name] = {
                "mode": "error",
                "ok": False,
                "err": f"{type(exc).__name__}: {exc}"[:500],
                "sec": round(time.perf_counter() - t0, 2),
            }
        flag = "ok" if results[name]["ok"] else "FAIL"
        print(f"# {name}: {flag} ({results[name]['sec']}s)", file=sys.stderr)

    n_ok = sum(1 for r in results.values() if r["ok"])
    summary = {
        "round": "04",
        "scope": "judge independent full-catalog sweep",
        "sf_dir": sf_dir,
        "total": len(results),
        "ok": n_ok,
        "oracle_checked": sum(1 for r in results.values() if r["mode"] == "oracle"),
        "rows_only": sum(1 for r in results.values() if r["mode"] == "rows_only"),
        "results": results,
    }
    with open("/root/repo/JUDGE_SWEEP_r04.json", "w") as f:
        json.dump(summary, f, indent=1)
    print(f"{n_ok}/{len(results)} ok -> JUDGE_SWEEP_r04.json")


if __name__ == "__main__":
    main()
