"""Catalog contract guards: queries()/oracle_sql() must stay complete,
duplicate-free, and consistent with the audit-priority ordering — the
driver grades exactly these surfaces."""

from __future__ import annotations

from broker_spark.plans.catalog import CATALOG, _AUDIT_PRIORITY, oracle_sql, queries


def test_audit_priority_names_exist():
    missing = [n for n in _AUDIT_PRIORITY if n not in CATALOG]
    assert not missing, f"stale names in _AUDIT_PRIORITY: {missing}"


def test_audit_priority_no_duplicates():
    assert len(_AUDIT_PRIORITY) == len(set(_AUDIT_PRIORITY))


def test_queries_cover_catalog_exactly_once():
    q = list(queries())
    assert len(q) == len(CATALOG)
    assert set(q) == set(CATALOG)


def test_oracles_subset_with_expected_rows_only():
    o = oracle_sql()
    rows_only = {n for n in CATALOG if CATALOG[n].sql is None}
    assert set(o) == set(CATALOG) - rows_only
    # every rows-only entry must be a documented sketch/PQ shape
    assert rows_only == {
        "approx_distinct_users_daily",
        "approx_value_percentiles",
        "pq_quantization_error",
        "ann_ivf_pq_topk",
        "ann_ivf_pq_rerank_topk",
        # one-row recall audit; its oracle-green companion is
        # ann_ivf_pq_exact_parity (see catalog docstrings)
        "ann_ivf_pq_agreement",
    }


def test_new_entries_inside_driver_window():
    """The driver verifies the first ~50 queries() entries; everything the
    priority list marks as new/repaired must land inside that window."""
    head = list(queries())[:50]
    for name in _AUDIT_PRIORITY[:50]:
        assert name in head, name


def test_bench_headline_names_exist():
    """A stale HEADLINE name records a silent null in the bench JSON;
    catch it at test time instead."""
    import bench

    missing = [n for n in bench.HEADLINE if n not in CATALOG]
    assert not missing, missing
