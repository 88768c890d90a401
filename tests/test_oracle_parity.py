"""Replicates the driver's t2 correctness gate locally: for every catalog
entry with an oracle, run the Spark query AND the DuckDB SQL on the same
parquet tables and compare row count, column names, and (order-insensitive)
values — at sf0.001 for speed; the driver runs sf0.01."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

from broker_spark.plans.catalog import CATALOG
from broker_spark.tables import TABLE_NAMES
from tests.conftest import SF_SMALL

ORACLE_NAMES = [n for n, e in CATALOG.items() if e.sql is not None]


def _duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out.columns = [c.lower() for c in out.columns]
    out = out.reindex(sorted(out.columns), axis=1)
    for c in out.columns:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]").astype(str)
        elif s.dtype == object:
            out[c] = s.map(
                lambda v: f"{float(v):.9g}"
                if isinstance(v, float) or str(type(v)).endswith("Decimal'>")
                else str(v)
            )
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.map(lambda v: "nan" if v is None or math.isnan(v) else f"{v:.9g}")
        else:
            out[c] = s.astype("string")
    return out.sort_values(list(out.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", ORACLE_NAMES)
def test_oracle_parity(spark, name):
    entry = CATALOG[name]
    sdf = entry.fn(spark, SF_SMALL).toPandas()
    odf = _duck(SF_SMALL, entry.sql)
    assert len(sdf) == len(odf), f"{name}: rows spark={len(sdf)} oracle={len(odf)}"
    assert sorted(c.lower() for c in sdf.columns) == sorted(
        c.lower() for c in odf.columns
    ), f"{name}: columns differ: {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    cs, co = _canon(sdf), _canon(odf)
    if not cs.equals(co):
        diff = (cs != co).any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch\nspark:\n{cs[diff].head(5)}\noracle:\n{co[diff].head(5)}"
        )


#: Entries whose fn writes shared state through a session-conf toggle or
#: a saveAsTable — run OUTSIDE the thread pool below so a concurrent
#: entry can never observe the writer's temporary conf
#: (storage/writer.py's partitionOverwriteMode window) or a half-written
#: warehouse table.
_SEQUENTIAL_SIDE_EFFECTS = {
    "log_roundtrip_resend",
    "dedup_prefix_filter_maintained",
    "dedup_prefix_index_drift",
    "bucketed_join_order_revenue",
}


def test_catalog_entries_nonempty(spark):
    """Every catalog query must return >= 1 row at sf0.001 (except pair
    finders, which may legitimately be empty but must still run).

    Entries are independent, so the counts run from a small driver
    thread pool (guide §2.6: actions are only sequential because driver
    code calls them sequentially) — this test was 304 s of the suite's
    wall sequential.  Side-effecting entries run first, alone."""
    from concurrent.futures import ThreadPoolExecutor

    may_be_empty = {"dedup_minhash_pairs", "dedup_ngram_jaccard"}

    def one(item):
        name, entry = item
        return name, entry.fn(spark, SF_SMALL).count()

    results = [
        one((n, CATALOG[n])) for n in _SEQUENTIAL_SIDE_EFFECTS if n in CATALOG
    ]
    rest = [(n, e) for n, e in CATALOG.items() if n not in _SEQUENTIAL_SIDE_EFFECTS]
    with ThreadPoolExecutor(max_workers=8) as pool:
        results += list(pool.map(one, rest))
    assert len(results) == len(CATALOG)
    for name, n in results:
        if name not in may_be_empty:
            assert n > 0, f"{name} returned 0 rows"
