"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship resend-range query on sf0.001;
`queries()` / `oracle_sql()` expose the full operator catalog from
broker_spark.plans.catalog — each Spark DataFrame query paired with the
ANSI-SQL DuckDB oracle the driver cross-checks it against.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from broker_spark.plans import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: resend-range over the events stream at sf0.001 —
    scan → composite (ts, seq) range predicate → total order (SURVEY §7)."""
    return catalog.CATALOG["resend_range"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
