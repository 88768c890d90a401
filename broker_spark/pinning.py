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

Two kinds of pin, by what the checkpoint protects:

- ``pin`` / ``pin_lazy`` — plan hygiene for the RETURNED lazy plan (a
  frame several downstream readers share).  Nothing executes while the
  entry function runs, so stripping these under ``audit_lineage()`` is
  free: the audit just plans a wider tree.
- ``pin_iter`` — a materialization barrier INSIDE a driver-side
  iteration (CC contraction rounds, BPE merge loop, PageRank setup):
  the function itself runs actions against the pinned frame while it is
  being constructed.  Stripping such a pin would make every internal
  action re-execute the compounded lineage of all previous rounds
  (star-CC roughly doubles per round) — so ``pin_iter`` IGNORES the
  audit toggle and always checkpoints.  Audited plans for these
  operators therefore truncate at the iteration barriers; that is the
  honest readout, since the pre-barrier stages already executed by the
  time the returned plan exists.

The toggle is per-thread (``threading.local``): an ``audit_lineage()``
block on one thread can never strip pins from a query concurrently
built or executed on another thread.
"""

from __future__ import annotations

import contextlib
import threading
from collections.abc import Iterator

from pyspark.sql import DataFrame

_STATE = threading.local()


def _disabled() -> bool:
    return getattr(_STATE, "disabled", False)


def pin(df: DataFrame, eager: bool = True) -> DataFrame:
    """localCheckpoint `df` — unless lineage auditing disabled pinning,
    in which case the frame passes through lazily.  `eager=False` defers
    the checkpoint to the first action (the repeated-read pinning still
    holds from then on) — use it when the frame may never be executed
    (e.g. a branch the caller might discard).

    Use ONLY for frames whose repeated readers are all in the returned
    lazy plan.  If the calling function itself runs actions over the
    frame (iteration, convergence probes, argmax collects), use
    ``pin_iter`` instead so audits cannot un-pin an executing loop."""
    if _disabled():
        return df
    return df.localCheckpoint(eager=eager)


def pin_lazy(df: DataFrame) -> DataFrame:
    """`pin(df, eager=False)` in `.transform(...)`-friendly form."""
    return pin(df, eager=False)


def pin_iter(df: DataFrame, eager: bool = True) -> DataFrame:
    """localCheckpoint `df` UNCONDITIONALLY — the audit toggle does not
    apply.  For frames that the constructing function itself executes
    (per-round convergence probes, per-merge argmax collects): without
    the barrier each internal action would re-run the compounded lineage
    of every previous round, and sampled partitionings could differ
    between the action and the returned plan."""
    return df.localCheckpoint(eager=eager)


def pin_iter_lazy(df: DataFrame) -> DataFrame:
    """`pin_iter(df, eager=False)` in `.transform(...)`-friendly form."""
    return pin_iter(df, eager=False)


@contextlib.contextmanager
def audit_lineage() -> Iterator[None]:
    """Context manager for plan-audit tooling: pin()/pin_lazy() become
    identity on THIS thread so explain/executedPlan expose the
    pre-checkpoint lineage (``pin_iter`` barriers stay).  Never use
    around real query execution — multi-read frames would re-execute per
    reader, and sampled partitionings (repartitionByRange) could differ
    between readers."""
    prev = _disabled()
    _STATE.disabled = True
    try:
        yield
    finally:
        _STATE.disabled = prev
