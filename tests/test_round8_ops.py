"""Round-8 properties: deterministic out-of-order replay staging, the
order-defined EWMA / LSH-first-seen late-data contracts against pure-Python
references, and the densification-guard subset/census invariants."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from broker_spark.pipeline import dedup
from tests.conftest import SF_SMALL


def test_stage_ordered_batches_files_and_mtimes(spark, tmp_path):
    """One file per non-empty batch, mtimes strictly ascending in batch
    order, and the union of files is exactly the input rows."""
    from broker_spark.plans.catalog import _stage_ordered_batches

    df = spark.range(100).selectExpr("id", "id * 7 AS v")
    dest = str(tmp_path / "in")
    _stage_ordered_batches(df, F.col("id") % 4, 4, dest)
    files = sorted(os.listdir(dest))
    assert files == [f"batch{i:02d}.parquet" for i in range(4)]
    mtimes = [os.path.getmtime(os.path.join(dest, f)) for f in files]
    assert all(a < b for a, b in zip(mtimes, mtimes[1:]))
    back = spark.read.parquet(dest)
    assert sorted(r["id"] for r in back.collect()) == list(range(100))
    # each file holds exactly its residue class
    for i, f in enumerate(files):
        ids = [r["id"] for r in spark.read.parquet(os.path.join(dest, f)).collect()]
        assert ids and all(x % 4 == i for x in ids)


def _ewma_reference(rows: list[tuple[str, int, float]]) -> dict:
    """Pure-Python fold of the documented late-data contract: rows arrive
    ordered by (bucket % 4, bucket) per key; a bucket <= the running max
    is a no-op; kept rows fold 0.8*prev + 0.2*x."""
    out: dict[tuple[str, int], tuple[float, float]] = {}
    by_key: dict[str, list[tuple[int, float]]] = {}
    for k, b, v in rows:
        by_key.setdefault(k, []).append((b, v))
    for k, pairs in by_key.items():
        prev_e, prev_b = None, None
        for b, v in sorted(pairs, key=lambda p: (p[0] % 4, p[0])):
            if prev_b is not None and b <= prev_b:
                continue
            prev_e = v if prev_e is None else 0.8 * prev_e + 0.2 * v
            prev_b = b
            out[(k, b)] = (v, prev_e)
    return out


def test_shuffled_ewma_matches_pure_python_contract(spark, tmp_path):
    """End-to-end: a synthetic keyed series staged with the deterministic
    batch schedule, replayed through the state store, equals the
    pure-Python arrival-order fold — including which buckets were
    DROPPED as late."""
    from broker_spark.plans.catalog import _stage_ordered_batches
    from broker_spark.streaming import stateful

    rows = [
        ("a", b, float(10 + b)) for b in range(12)
    ] + [("b", b, float(100 - 3 * b)) for b in (0, 2, 3, 5, 8, 9, 11)]
    df = spark.createDataFrame(rows, "key string, bucket long, value double")
    dest = str(tmp_path / "in")
    _stage_ordered_batches(df, F.col("bucket") % 4, 4, dest)
    src = (
        spark.readStream.schema("key string, bucket long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(dest)
    )
    q = (
        stateful.streaming_ewma(src)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    got = {
        (r["key"], r["bucket"]): (round(r["value"], 6), round(r["ewma"], 6))
        for r in spark.read.parquet(str(tmp_path / "sink")).collect()
    }
    want = {
        k: (round(v, 6), round(e, 6))
        for k, (v, e) in _ewma_reference(rows).items()
    }
    assert got == want
    # the contract genuinely drops something under this schedule
    assert len(got) < len(rows)


def test_shuffled_lsh_claimer_is_batch_order_min(spark, tmp_path):
    """The bucket claimer under the deterministic schedule is the doc
    minimizing (doc_id % 4, doc_id) — NOT the plain min doc_id — and
    every other member emits exactly one row against it."""
    from broker_spark.plans.catalog import _stage_ordered_batches
    from broker_spark.streaming import stateful

    texts = {
        # four docs sharing identical text -> identical signatures ->
        # same buckets in both bands
        1: "alpha beta gamma delta epsilon zeta eta theta",
        2: "alpha beta gamma delta epsilon zeta eta theta",
        5: "alpha beta gamma delta epsilon zeta eta theta",
        7: "alpha beta gamma delta epsilon zeta eta theta",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    dest = str(tmp_path / "in")
    _stage_ordered_batches(df, F.col("doc_id") % 4, 4, dest)
    src = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(dest)
    )
    q = (
        stateful.streaming_lsh_candidates_backfill(src)
        .writeStream.format("parquet")
        .option("path", str(tmp_path / "sink"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "sink")).collect()
    # batches: doc 1 and doc 5 share batch 1 (5 % 4 == 1), doc 2 is batch
    # 2, doc 7 is batch 3.  Batch 1 arrives first, sorted by doc_id, so
    # doc 1 claims every band's bucket; 5/2/7 each emit one row against it.
    assert out, "identical docs must collide in every band"
    assert all(r["dup_of"] == 1 for r in out)
    per_band: dict[int, set] = {}
    for r in out:
        per_band.setdefault(r["band_id"], set()).add(r["doc_id"])
    for band, members in per_band.items():
        assert members == {2, 5, 7}, (band, members)


def test_guarded_pairs_are_subset(spark):
    """The stop-bucket guard can only REMOVE candidate pairs, and the
    guarded estimator certificate scores exactly the guarded pairs."""
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    unguarded = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(docs).collect()
    }
    guarded = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(docs, max_bucket_size=8).collect()
    }
    assert guarded <= unguarded
    err = dedup.minhash_estimate_error(docs, max_bucket_size=8).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in err} == guarded


def test_guarded_triangle_census_matches_pure_python(spark):
    """triangle_stats over the guarded pair graph equals a brute-force
    census of the collected edge list."""
    from itertools import combinations

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(docs, max_bucket_size=8)
    edges = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    adj: dict = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n_edges = len(edges)
    n_wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    n_tri = sum(
        1
        for a, b in edges
        for _ in adj[a] & adj[b]
    ) // 3
    row = dedup.triangle_stats(pairs).collect()[0]
    assert (row["n_edges"], row["n_wedges"], row["n_triangles"]) == (
        n_edges,
        n_wedges,
        n_tri,
    )
    expected_cc = round(3.0 * n_tri / n_wedges, 6) if n_wedges else 0.0
    assert row["clustering_coeff"] == expected_cc
