"""Hypothesis property tests for the session-2 operators: the triangle
census, z-order keys, the deterministic HLL, weighted sampling, KS, and
compaction planning are each checked against independent pure-Python
references on randomized inputs — degenerate shapes (empty graphs,
single-point distributions, all-equal weights) included by construction."""

from __future__ import annotations

import hashlib
import itertools
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from broker_spark.pipeline import dedup, sketch, text
from broker_spark.storage.layout import zorder_key
from broker_spark.storage.writer import plan_compaction_groups

SET = settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))


# -- triangle census ---------------------------------------------------------

edge_lists = st.lists(
    st.tuples(st.integers(0, 9), st.integers(0, 9)),
    min_size=0,
    max_size=25,
)


@SET
@given(edge_lists)
def test_triangle_census_matches_bruteforce(spark, raw_edges):
    edges = {(min(a, b), max(a, b)) for a, b in raw_edges if a != b}
    pairs = spark.createDataFrame(
        list(raw_edges) or [(0, 0)], "doc_a long, doc_b long"
    )
    row = dedup.triangle_stats(pairs).collect()[0]
    nodes = {n for e in edges for n in e}
    deg = {n: sum(1 for e in edges if n in e) for n in nodes}
    tri = sum(
        1
        for a, b, c in itertools.combinations(sorted(nodes), 3)
        if (a, b) in edges and (a, c) in edges and (b, c) in edges
    )
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    assert row["n_edges"] == len(edges)
    assert row["n_triangles"] == tri
    assert row["n_wedges"] == wedges
    expect_cc = round(3.0 * tri / wedges, 6) if wedges else 0.0
    assert abs(row["clustering_coeff"] - expect_cc) < 1e-9


# -- z-order -----------------------------------------------------------------

points = st.lists(
    st.tuples(st.integers(0, 1023), st.integers(0, 1023)), min_size=1, max_size=30
)


@SET
@given(points)
def test_zorder_key_bijective_and_matches_reference(spark, pts):
    def ref(x, y):
        z = 0
        for i in range(10):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    df = spark.createDataFrame(list(set(pts)), "x long, y long")
    rows = df.select(
        "x", "y", zorder_key(F.col("x"), F.col("y"), 10).alias("z")
    ).collect()
    for r in rows:
        assert r["z"] == ref(r["x"], r["y"])
    # bijectivity on the domain: distinct points -> distinct keys
    assert len({r["z"] for r in rows}) == len(rows)


# -- deterministic HLL -------------------------------------------------------

key_sets = st.sets(st.integers(0, 10_000), min_size=1, max_size=300)


@SET
@given(key_sets)
def test_hll_matches_pure_python_on_random_key_sets(spark, keys):
    def ref(ks):
        regs = [0] * sketch.HLL_M
        for k in ks:
            h = hashlib.md5(str(k).encode()).hexdigest()
            b = int(h[:3], 16)
            v = int(h[3:15], 16)
            rho = (
                sketch.HLL_SUM_SCALE
                if v == 0
                else sketch.HLL_SUM_SCALE - v.bit_length()
            )
            regs[b] = max(regs[b], rho)
        s = sum(1 << (sketch.HLL_SUM_SCALE - m) for m in regs)
        raw = sketch.HLL_RAW_NUMERATOR / float(s)
        zeros = regs.count(0)
        if raw <= sketch.HLL_SMALL_RANGE and zeros > 0:
            return sketch.HLL_M * math.log(sketch.HLL_M / zeros)
        return raw

    df = spark.createDataFrame([(k,) for k in keys], "user_id long").withColumn(
        "g", F.lit(1)
    )
    row = sketch.hll_estimate(df, "user_id", ["g"]).collect()[0]
    assert abs(row["hll_estimate"] - ref(keys)) < 1e-9


# -- weighted sampling -------------------------------------------------------

weight_rows = st.lists(
    st.tuples(st.integers(0, 500), st.integers(0, 10_000)),
    min_size=1,
    max_size=40,
    unique_by=lambda t: t[0],
)


@SET
@given(weight_rows)
def test_weighted_sample_selects_topk_by_aes_key(spark, rows):
    def key(doc_id, w):
        u = (
            int(hashlib.md5(str(doc_id).encode()).hexdigest()[:12], 16) + 1.0
        ) / float(1 << 48)
        return u ** (1.0 / max(float(w), 1.0))

    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    got = text.weighted_sample(df, k=5, keep_cols=()).collect()
    expect = sorted(((key(i, w), i) for i, w in rows), key=lambda t: (-t[0], t[1]))[:5]
    assert [r["doc_id"] for r in got] == [i for _, i in expect]


# -- two-sample KS -----------------------------------------------------------

ks_samples = st.tuples(
    st.lists(st.integers(0, 30), min_size=1, max_size=40),
    st.lists(st.integers(0, 30), min_size=1, max_size=40),
)


@SET
@given(ks_samples)
def test_ks_matches_bruteforce_reference(spark, samples):
    from broker_spark.operators.stats import ks_two_sample

    a, b = samples
    rows = [(v, "A") for v in a] + [(v, "B") for v in b]
    df = spark.createDataFrame(rows, "v long, grp string")
    row = ks_two_sample(df, "v", "grp", "A").collect()[0]
    vals = sorted(set(a) | set(b))
    gaps = [
        (
            abs(
                sum(1 for x in a if x <= v) / len(a)
                - sum(1 for x in b if x <= v) / len(b)
            ),
            v,
        )
        for v in vals
    ]
    best = max(g for g, _ in gaps)
    at = min(v for g, v in gaps if g == best)
    assert abs(row["ks_stat"] - round(best, 6)) < 1e-9
    assert row["ks_at"] == at
    assert (row["n_a"], row["n_b"]) == (len(a), len(b))


# -- compaction planning -----------------------------------------------------

bucket_counts = st.lists(st.integers(1, 50), min_size=1, max_size=30)


@SET
@given(bucket_counts)
def test_compaction_groups_match_floor_cumsum_reference(spark, counts):
    target = 60
    rows = [("s", 0, i, n) for i, n in enumerate(counts)]
    df = spark.createDataFrame(
        rows, "stream_id string, partition int, bucket long, n_records long"
    )
    got = {
        r["bucket"]: r["group_id"]
        for r in plan_compaction_groups(
            df, ["stream_id", "partition"], "bucket", "n_records", target
        ).collect()
    }
    run = 0
    for i, n in enumerate(counts):
        assert got[i] == run // target
        run += n
