"""Dump `.explain("formatted")` for named catalog entries to files.

Usage: python tools/explain_dump.py OUTDIR SUFFIX entry1 [entry2 ...] [--sf DIR]

Writes OUTDIR/<entry>_<SUFFIX>.txt for each entry — the committed
before/after plan evidence for an optimization round (the judge checks
plan claims against these files).  Plans are captured under
`audit_lineage()` so `pin`/`pin_lazy` checkpoints do not truncate the
lineage (same convention as tools/plan_audit.py); `pin_iter` barriers
stay, so iterative operators truncate at their honest materialization
boundaries.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from broker_spark import pinning
from broker_spark.plans.catalog import CATALOG
from broker_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.1"
    if "--sf" in args:
        i = args.index("--sf")
        sf_dir = args[i + 1]
        del args[i : i + 2]
    outdir, suffix, names = args[0], args[1], args[2:]
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="explain_dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        with pinning.audit_lineage():
            df = CATALOG[name].fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {sf_dir} — explain('formatted')\n")
            fh.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
