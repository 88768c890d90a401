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


def _repo_root():
    import os

    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _round_dirs():
    """Current-round artifacts live at repo root; historical rounds are
    archived under records/ (VERDICT r6 #8)."""
    import os

    root = _repo_root()
    dirs = [root]
    rec = os.path.join(root, "records")
    if os.path.isdir(rec):
        dirs.append(rec)
    return dirs


def _round_file(prefix: str, n: int):
    import os

    for d in _round_dirs():
        p = os.path.join(d, f"{prefix}_r{n:02d}.json")
        if os.path.exists(p):
            return p
    return None


def _latest_round_file(prefix: str):
    """(round_no, path) of the newest `{prefix}_r{NN}.json` at repo root
    or under records/."""
    import os
    import re

    best = None
    for d in _round_dirs():
        for f in os.listdir(d):
            m = re.fullmatch(rf"{prefix}_r(\d+)\.json", f)
            if m:
                n = int(m.group(1))
                if best is None or n > best[0]:
                    best = (n, os.path.join(d, f))
    return best


def test_bench_partitions_catalog_exactly():
    """Registered == benched-or-accounted-for (VERDICT r6 #2): every
    catalog entry must be consciously placed in exactly one of HEADLINE /
    COMPARISON / NOT_BENCHED, so an entry can never ship outside the
    bench surface unnoticed the way layout_pruning_multidim did."""
    import bench

    placed = bench.HEADLINE + bench.COMPARISON + bench.NOT_BENCHED
    assert len(placed) == len(set(placed)), "entry placed twice"
    assert set(placed) == set(CATALOG), {
        "unplaced": sorted(set(CATALOG) - set(placed)),
        "stale": sorted(set(placed) - set(CATALOG)),
    }


def test_latest_selfcheck_covers_catalog():
    """Registered == swept (VERDICT r6 #2): the newest committed
    SELFCHECK_r{N}.json must cover the registered catalog exactly — an
    entry added after the closing sweep fails this test until the sweep
    is re-run, so 'all entries verified' artifacts can't overstate."""
    import json

    latest = _latest_round_file("SELFCHECK")
    assert latest is not None, "no SELFCHECK_r*.json committed"
    swept = set(json.load(open(latest[1]))["results"])
    assert swept == set(CATALOG), {
        "registered_but_never_swept": sorted(set(CATALOG) - swept),
        "swept_but_unregistered": sorted(swept - set(CATALOG)),
    }


def test_no_round_closes_without_driver_artifacts():
    """Fail loudly on missing round records (VERDICT r6 #5): for every
    round up to the newest CORRECTNESS file, both CORRECTNESS_r{NN}.json
    and BENCH_r{NN}.json must exist and parse with a non-null payload.
    Round 5 is the documented historical gap (the r5 driver snapshot
    never ran; VERDICT r6 'What's wrong' #2) — waived, never repeated."""
    import json
    import os

    waived = {5}
    # rounds 2/3 predate the compact final-line protocol: the driver's
    # 2000-char tail capture truncated the detail JSON, so their committed
    # records carry parsed=null with the real numbers in the tail text —
    # historical, documented, never to repeat (bench.py now prints a
    # <500-byte final line exactly so `parsed` can't be null again)
    parsed_null_waived = {2, 3}
    latest = _latest_round_file("CORRECTNESS")
    assert latest is not None
    for n in range(1, latest[0] + 1):
        if n in waived:
            continue
        for prefix in ("CORRECTNESS", "BENCH"):
            path = _round_file(prefix, n)
            assert path is not None, f"round {n} closed without {prefix}_r{n:02d}.json"
            payload = json.load(open(path))
            assert payload, f"{path} parsed empty/null"
            if prefix == "BENCH" and n not in parsed_null_waived:
                parsed = payload.get("parsed")
                assert isinstance(parsed, dict) and parsed.get(
                    "value"
                ) is not None, f"{path} has parsed=null (driver tail capture broke)"
