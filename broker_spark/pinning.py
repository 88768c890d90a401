"""Toggleable lineage pinning for multiply-read DataFrames.

Operators pin a frame that downstream code reads more than once with
``pin(df)`` instead of calling ``df.localCheckpoint()`` directly.  At
run time the two are identical (eager local checkpoint: one execution,
boundaries and sampled partitionings frozen — the oracle-parity rule).
Under ``audit_lineage()`` pinning becomes a no-op, so plan-audit tooling
(tools/plan_audit.py) sees the FULL logical lineage instead of a
``Scan ExistingRDD`` stub above every checkpoint — without the toggle,
an audited plan silently covers only the post-checkpoint tail while
claiming whole-pipeline plan discipline.
"""

from __future__ import annotations

import contextlib
from collections.abc import Iterator

from pyspark.sql import DataFrame

_DISABLED = False


def pin(df: DataFrame, eager: bool = True) -> DataFrame:
    """localCheckpoint `df` — unless lineage auditing disabled pinning,
    in which case the frame passes through lazily.  `eager=False` defers
    the checkpoint to the first action (the repeated-read pinning still
    holds from then on) — use it when the frame may never be executed
    (e.g. a branch the caller might discard)."""
    if _DISABLED:
        return df
    return df.localCheckpoint(eager=eager)


def pin_lazy(df: DataFrame) -> DataFrame:
    """`pin(df, eager=False)` in `.transform(...)`-friendly form."""
    return pin(df, eager=False)


@contextlib.contextmanager
def audit_lineage() -> Iterator[None]:
    """Context manager for plan-audit tooling: pin() becomes identity so
    explain/executedPlan expose the pre-checkpoint lineage.  Never use
    around real query execution — multi-read frames would re-execute per
    reader, and sampled partitionings (repartitionByRange) could differ
    between readers."""
    global _DISABLED
    prev = _DISABLED
    _DISABLED = True
    try:
        yield
    finally:
        _DISABLED = prev
