"""Round-4 operators: CMS heavy hitters (one-sided error + exactness),
hourly gap fill (grid density + carry-forward), hard-negative mining
(label disjointness), MinHash estimator certificate (error bounds), and
the per-source cap sample (determinism + cap)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from broker_spark.operators.rollup import hourly_gap_fill
from broker_spark.pipeline import ann, dedup, sketch

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------


def _keyed(spark, counts: dict[str, int]):
    rows = [(k,) for k, n in counts.items() for _ in range(n)]
    return spark.createDataFrame(rows, "k string")


def test_cms_never_underestimates(spark):
    counts = {"a": 7, "b": 1, "c": 40, "d": 3}
    df = _keyed(spark, counts)
    est = {
        r["k"]: r["cms_estimate"]
        for r in sketch.cms_estimates(
            df.select("k").distinct(), sketch.cms_build(df, "k"), "k"
        ).collect()
    }
    assert set(est) == set(counts)
    for k, true_n in counts.items():
        assert est[k] >= true_n  # CMS error is one-sided


def test_cms_heavy_hitters_exact(spark):
    counts = {"a": 10, "b": 2, "c": 10, "d": 9, "e": 25}
    out = {
        r["k"]: r["n_events"]
        for r in sketch.cms_heavy_hitters(_keyed(spark, counts), "k", threshold=10).collect()
    }
    # exact confirm removes any sketch overestimate: result is exactly
    # the keys whose TRUE count clears the threshold, with true counts
    assert out == {"a": 10, "c": 10, "e": 25}


def test_cms_tiny_width_still_exact(spark):
    # adversarial: width 2 forces heavy collisions -> big overestimates;
    # the exact confirm must still produce the true heavy-hitter set
    counts = {f"k{i}": 3 for i in range(20)} | {"hot": 50}
    out = sketch.cms_heavy_hitters(
        _keyed(spark, counts), "k", threshold=20, width=2
    ).collect()
    assert {(r["k"], r["n_events"]) for r in out} == {("hot", 50)}


# ---------------------------------------------------------------------------
# hourly gap fill
# ---------------------------------------------------------------------------


def test_gap_fill_dense_grid_and_carry_forward(spark):
    rows = [
        (1, "2024-01-01 00:10:00", 10.0),
        (1, "2024-01-01 00:50:00", 30.0),  # hour 0 avg = 20
        (1, "2024-01-01 03:05:00", 7.0),  # hours 1-2 missing
        (2, "2024-01-05 12:00:00", 1.0),  # single-hour user
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts string, value double").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = {
        (r["user_id"], str(r["hour"])): (r["n_events"], r["filled_value"])
        for r in hourly_gap_fill(ev).collect()
    }
    # user 1: exactly 4 grid hours (00..03), gaps carried forward
    u1 = sorted(k for k in out if k[0] == 1)
    assert len(u1) == 4
    assert out[(1, "2024-01-01 00:00:00")] == (2, 20.0)
    assert out[(1, "2024-01-01 01:00:00")] == (0, 20.0)  # carried
    assert out[(1, "2024-01-01 02:00:00")] == (0, 20.0)  # carried
    assert out[(1, "2024-01-01 03:00:00")] == (1, 7.0)
    # user 2: one hour, no padding beyond its own span
    assert [k for k in out if k[0] == 2] == [(2, "2024-01-05 12:00:00")]


def test_gap_fill_no_gaps_is_identity_shape(spark):
    rows = [(5, f"2024-02-01 0{h}:30:00", float(h)) for h in range(4)]
    ev = spark.createDataFrame(rows, "user_id long, ts string, value double").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    out = hourly_gap_fill(ev).collect()
    assert len(out) == 4
    assert all(r["n_events"] == 1 for r in out)


# ---------------------------------------------------------------------------
# hard negatives
# ---------------------------------------------------------------------------


def test_hard_negatives_exclude_own_label(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    out = ann.hard_negative_topk(emb, emb.filter(F.col("vec_id") < 5), k=3).collect()
    assert out, "expected some negatives"
    for r in out:
        assert labels[r["cand_id"]] != labels[r["query_id"]]
        assert r["cand_label"] == labels[r["cand_id"]]
        assert 1 <= r["rank"] <= 3


def test_hard_negatives_are_topk_among_other_labels(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    # rank-1 negative must dominate every other different-label candidate
    top = ann.hard_negative_topk(emb, emb.filter(F.col("vec_id") == 0), k=1).collect()
    assert len(top) == 1
    brute = ann.brute_force_topk(emb, emb.filter(F.col("vec_id") == 0), k=2000).collect()
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    best_other = max(
        (r for r in brute if labels[r["cand_id"]] != labels[0]),
        key=lambda r: (r["cosine"], -r["cand_id"]),
    )
    assert top[0]["cand_id"] == best_other["cand_id"]


# ---------------------------------------------------------------------------
# minhash estimator certificate
# ---------------------------------------------------------------------------


def test_minhash_estimate_error_bounds(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # the r4 certificate was written against the unguarded census — keep
    # that intent explicit now the guard defaults on (ADVICE r9): both
    # sides opt out, so the one-row-per-pair invariant is census-wide
    out = dedup.minhash_estimate_error(docs, max_bucket_size=None).collect()
    assert out, "expected candidate pairs at sf0.001"
    pairs = dedup.minhash_lsh_pairs(docs, max_bucket_size=None).count()
    assert len(out) == pairs  # one certificate row per candidate pair
    for r in out:
        assert 0.0 <= r["est_jaccard"] <= 1.0
        assert 0.0 <= r["jaccard"] <= 1.0
        assert abs(abs(r["est_jaccard"] - r["jaccard"]) - r["abs_err"]) < 1e-9
        # an LSH candidate survived a band collision: at least one of the
        # 4 signature components must agree
        assert r["est_jaccard"] >= 0.25


# ---------------------------------------------------------------------------
# domain cap sample
# ---------------------------------------------------------------------------


def test_domain_cap_is_deterministic_and_capped(spark):
    from broker_spark.plans.catalog import CATALOG

    a = CATALOG["domain_cap_sample"].fn(spark, SF).collect()
    b = CATALOG["domain_cap_sample"].fn(spark, SF).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    per_source: dict[str, int] = {}
    for r in a:
        per_source[r["source"]] = per_source.get(r["source"], 0) + 1
    assert all(n <= 10 for n in per_source.values())


# ---------------------------------------------------------------------------
# streaming threshold alerts
# ---------------------------------------------------------------------------


class TestStreamingThresholdAlerts:
    def test_alert_fires_once_across_microbatches(self, spark, tmp_path):
        """Counts accumulate in the state store across micro-batches; the
        alert fires exactly once, at the crossing batch, with the lifetime
        total at that moment."""
        from broker_spark.streaming import stateful

        src = tmp_path / "ev-src"
        sink = str(tmp_path / "ev-sink")
        ckpt = str(tmp_path / "ev-ckpt")
        src.mkdir()

        def run_batch():
            source = spark.readStream.schema("key long").parquet(str(src))
            q = (
                stateful.streaming_threshold_alerts_lifetime(source, threshold=5)
                .writeStream.format("parquet")
                .option("path", sink)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
            return sorted(
                (r["key"], r["total"]) for r in spark.read.parquet(sink).collect()
            )

        # batch 1: key 1 x3, key 2 x5 -> only key 2 crosses
        spark.createDataFrame([(1,)] * 3 + [(2,)] * 5, "key long").write.mode(
            "append"
        ).parquet(str(src))
        assert run_batch() == [(2, 5)]

        # batch 2: key 1 x3 (lifetime 6 -> crosses), key 2 x2 (no re-fire)
        spark.createDataFrame([(1,)] * 3 + [(2,)] * 2, "key long").write.mode(
            "append"
        ).parquet(str(src))
        assert run_batch() == [(1, 6), (2, 5)]


# ---------------------------------------------------------------------------
# tf-idf cosine pairs / vocab coverage / bigram LM / graph degrees
# ---------------------------------------------------------------------------


def test_tfidf_cosine_pairs_finds_near_dups(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    out = dedup  # noqa: F841  (imported at module top; silence linters)
    from broker_spark.pipeline import text as text_ops

    pairs = text_ops.tfidf_cosine_pairs(docs, threshold=0.3).collect()
    assert pairs, "expected near-dup pairs at sf0.001"
    for r in pairs:
        assert 0.3 <= r["cosine"] <= 1.0
        assert r["doc_a"] < r["doc_b"]
    # symmetric sanity: identical docs would be cosine 1; the fixture's
    # near-dup families should score far above the candidate background
    assert max(r["cosine"] for r in pairs) > 0.8


def test_vocab_coverage_bounds_and_monotonicity(spark):
    from broker_spark.pipeline import text as text_ops

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    cov10 = {r["lang"]: r["coverage"] for r in text_ops.vocab_coverage(docs, 10).collect()}
    cov31 = {r["lang"]: r["coverage"] for r in text_ops.vocab_coverage(docs, 31).collect()}
    for lang, c in cov10.items():
        assert 0.0 < c <= 1.0
        assert cov31[lang] >= c  # widening the vocab can't reduce coverage
    # 31 covers the entire fixture vocabulary
    assert all(c == 1.0 for c in cov31.values())


def test_bigram_logprob_flags_shuffled_text(spark):
    """A doc whose tokens are globally common but locally scrambled must
    score worse (higher NLL) under the bigram model than docs that follow
    the corpus's dominant bigram pattern — the separation the unigram
    model cannot see (all these docs share ONE unigram distribution)."""
    from broker_spark.pipeline import text as text_ops

    coherent = " ".join(["a b"] * 10)       # bigrams: 'a b' and 'b a' only
    scrambled = " ".join(["a"] * 10 + ["b"] * 10)  # 'a a' / 'b b' runs
    rows = [(i, coherent) for i in range(20)] + [(99, scrambled)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    scores = {
        r["doc_id"]: r["mean_bigram_nll"]
        for r in text_ops.bigram_logprob_score(docs).collect()
    }
    assert scores[99] > scores[0]
    # every coherent doc scores identically (same text)
    assert len({scores[i] for i in range(20)}) == 1


def test_dedup_graph_degree_mass_equals_pair_endpoints(spark):
    from broker_spark.plans.catalog import CATALOG

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    # GUARDED intent, stated explicitly (ADVICE r9): the degree histogram
    # entry builds on the default-guarded pair graph, so the edge count it
    # must balance is the guarded one
    pairs = dedup.minhash_lsh_pairs(
        docs, max_bucket_size=dedup.DEFAULT_MAX_BUCKET_SIZE
    ).count()
    hist = CATALOG["dedup_graph_degrees"].fn(spark, SF).collect()
    # sum(degree * n_docs) counts each edge twice
    assert sum(r["degree"] * r["n_docs"] for r in hist) == 2 * pairs


# ---------------------------------------------------------------------------
# sign-LSH (random projection) ANN
# ---------------------------------------------------------------------------


def test_rp_planes_deterministic_and_rademacher(spark):
    a = ann.rp_planes(4, 4, 64)
    b = ann.rp_planes(4, 4, 64)
    assert a == b  # seedless determinism
    flat = [c for t in a for p in t for c in p]
    assert set(flat) == {1.0, -1.0}
    # roughly balanced signs (md5 bytes are uniform)
    assert 0.35 < sum(1 for c in flat if c > 0) / len(flat) < 0.65


def test_rp_lsh_candidates_subset_of_bruteforce_order(spark):
    """Every sign-LSH result must be a true cosine ranking over its own
    candidate set: rank-1 beats rank-2 etc., and recall@5 vs exact brute
    force should be well above chance for angle-clustered fixtures."""
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    planes = ann.rp_planes(4, 4, 64)
    out = ann.rp_lsh_topk(emb, emb.filter(F.col("vec_id") < 10), planes, k=5).collect()
    assert out
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
        cosines = [r["cosine"] for r in rows]
        assert cosines == sorted(cosines, reverse=True)
    exact = ann.brute_force_topk(emb, emb.filter(F.col("vec_id") < 10), k=5).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["cand_id"])
    hits = sum(
        1
        for r in out
        if r["cand_id"] in exact_sets.get(r["query_id"], set())
    )
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total > 0.2  # far above the ~5/2000 chance rate


# ---------------------------------------------------------------------------
# distributed PCA (power iteration)
# ---------------------------------------------------------------------------


def test_pca_component_is_unit_norm_and_dominant(spark):
    import numpy as np

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    out = ann.pca_top_component(emb, dim=64, iters=30).collect()
    assert len(out) == 64
    v = np.array([r["loading"] for r in sorted(out, key=lambda r: r["dim_index"])])
    eig = out[0]["eigenvalue"]
    assert abs(np.linalg.norm(v) - 1.0) < 1e-4  # unit loadings (rounded)
    # Rayleigh quotient of the dominant direction must beat every single
    # coordinate axis's variance
    m = np.stack([r["embedding"] for r in emb.select("embedding").collect()]).astype(float)
    c = np.cov(m, rowvar=False, bias=True)
    assert eig >= c.diagonal().max() - 1e-6
    # and must match numpy's top eigenvalue closely after 30 iterations
    top = np.linalg.eigvalsh(c).max()
    assert eig <= top + 1e-6
    assert eig / top > 0.98
