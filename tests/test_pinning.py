"""Pinning-toggle semantics (ADVICE r7): the audit toggle strips only
returned-plan pins, never iteration barriers, and is thread-local."""

from __future__ import annotations

import threading

from broker_spark import pinning


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _is_checkpointed(df) -> bool:
    # a localCheckpoint replaces the lineage with a Scan ExistingRDD stub
    return "ExistingRDD" in _plan(df)


def test_pin_strips_under_audit(spark):
    base = spark.range(10).selectExpr("id", "id * 2 AS v")
    with pinning.audit_lineage():
        audited = pinning.pin(base)
    assert not _is_checkpointed(audited)
    assert _is_checkpointed(pinning.pin(base))


def test_pin_iter_survives_audit(spark):
    """pin_iter guards frames the constructing function itself executes —
    the audit toggle must NOT strip it, or every internal action would
    re-run the compounded lineage of all previous iterations."""
    base = spark.range(10).selectExpr("id", "id * 3 AS v")
    with pinning.audit_lineage():
        pinned = pinning.pin_iter(base)
        assert _is_checkpointed(pinned)
        lazy = pinning.pin_iter_lazy(base)
        lazy.count()  # lazy checkpoint materializes on first action
        assert _is_checkpointed(lazy)


def test_audit_toggle_is_thread_local(spark):
    """A concurrent query built on another thread keeps its pins while
    this thread audits — otherwise it would silently run unpinned,
    reintroducing repartitionByRange-resample nondeterminism."""
    base = spark.range(10).selectExpr("id")
    results: dict[str, bool] = {}

    def worker():
        results["worker_pinned"] = _is_checkpointed(pinning.pin(base))

    with pinning.audit_lineage():
        t = threading.Thread(target=worker)
        t.start()
        t.join()
        results["audit_stripped"] = not _is_checkpointed(pinning.pin(base))
    assert results == {"worker_pinned": True, "audit_stripped": True}


def test_audit_toggle_restores_after_exception(spark):
    base = spark.range(5)
    try:
        with pinning.audit_lineage():
            raise ValueError("boom")
    except ValueError:
        pass
    assert _is_checkpointed(pinning.pin(base))
