"""Full-catalog correctness sweep: runs EVERY catalog entry at sf0.01
against its DuckDB oracle (value-level, order-insensitive, floats rounded
to 6 dp) and writes SELFCHECK_r{N}.json — the committed, reproducible
record of the claim "all N entries verified", covering the entries the
driver's 50-entry snapshot doesn't reach.

Usage: python tools/selfcheck.py [round_no] [sf_dir]
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


def norm(v):
    """Canonicalize to a STRING so tuples sort across engines: pandas
    returns Timestamps/numpy scalars/None where Spark returns
    date/datetime/python scalars — stringify identically on both sides."""
    import datetime as dt

    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "\x00null"
    if type(v).__name__ == "NaTType":  # pandas missing timestamp
        return "\x00null"
    if hasattr(v, "item"):  # numpy scalar
        v = v.item()
    if isinstance(v, bool):
        return "T" if v else "F"
    if isinstance(v, float):
        return f"{v:.6f}"
    if isinstance(v, int):
        return f"i{v}"
    if isinstance(v, dt.datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, dt.date):
        return dt.datetime(v.year, v.month, v.day).isoformat(
            sep=" ", timespec="microseconds"
        )
    if type(v).__name__ == "Timestamp":  # pandas
        return v.to_pydatetime().isoformat(sep=" ", timespec="microseconds")
    return str(v)


def main() -> None:
    round_no = sys.argv[1] if len(sys.argv) > 1 else "03"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="selfcheck")
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
                od = sorted(
                    tuple(norm(v) for v in rec)
                    for rec in opdf[cols].itertuples(index=False, name=None)
                ) if ocols == cols else None
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
        "round": round_no,
        "sf_dir": sf_dir,
        "total": len(results),
        "ok": n_ok,
        "oracle_checked": sum(1 for r in results.values() if r["mode"] == "oracle"),
        "rows_only": sum(1 for r in results.values() if r["mode"] == "rows_only"),
        "results": results,
    }
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        f"SELFCHECK_r{round_no}.json",
    )
    with open(out, "w") as f:
        json.dump(summary, f, indent=1)
    print(f"{n_ok}/{len(results)} ok -> {out}")


if __name__ == "__main__":
    main()
