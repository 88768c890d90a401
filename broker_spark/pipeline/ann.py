"""Similarity search over an embedding column (`array<float>`).

- brute_force_topk: exact cosine top-k — broadcast the (small) query set
  against the full corpus; per-row arithmetic is JVM `zip_with`/`aggregate`
  on doubles, no shuffle except the final per-query top-k
  (TakeOrderedAndProject via window row_number).
- grid_lsh_buckets / grid_lsh_topk: the scale path — quantize leading
  dimensions into a grid cell id, shuffle once on the cell key, and only
  compare vectors sharing a cell (IVF-style candidate pruning).

All math is done in double precision with deterministic left-to-right
folds so results are reproducible and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from broker_spark.pinning import pin, pin_lazy
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def lit_vector(values: list[float]) -> Column:
    """Constant array<double> literal in O(1) Py4J round-trips: the
    values are JSON-encoded once on the driver and parsed by from_json,
    which the optimizer constant-folds to a plain Literal — the EXECUTED
    plan is identical to an `array(lit, lit, ...)` tree, but building
    that tree element-by-element costs one Py4J round-trip per element
    (measured: 2048 element literals ≈ 1.1 s of pure plan-build latency
    inside every timed run; this form is ~12x cheaper to build and
    byte-identical in results — doubles roundtrip exactly through JSON
    shortest-repr)."""
    import json as _json

    return F.from_json(F.lit(_json.dumps([float(v) for v in values])), "array<double>")


def lit_matrix(rows: list[list[float]]) -> Column:
    """`lit_vector` for a constant array<array<double>> (see there)."""
    import json as _json

    return F.from_json(
        F.lit(_json.dumps([[float(v) for v in r] for r in rows])),
        "array<array<double>>",
    )


def _core_width(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition a broadcast-crossJoin's corpus side to core width
    ONLY when its scan yields fewer splits (guide §2.5): a single-row-group
    parquet corpus arrives as ONE split, so the cosine arithmetic — the
    entry's entire compute — would run serial.  When the scan already
    feeds >= core-width units of data (the 100 TB case, estimated from
    input file bytes — tables.est_scan_splits) the repartition would be a
    pure extra shuffle of id+vector bytes, so it is skipped (ADVICE r13;
    same width guard as dedup._spread)."""
    from broker_spark.tables import est_scan_splits

    sc = df.sparkSession.sparkContext
    if est_scan_splits(df) >= sc.defaultParallelism:
        return df
    return df.repartition(sc.defaultParallelism, key)


def _as_double_sql(arr: str) -> str:
    return f"transform({arr}, v -> CAST(v AS DOUBLE))"


def dot_sql(a: str, b: str) -> str:
    """SQL fragment form of `dot` — IDENTICAL analyzed expression, built
    in ONE Py4J round-trip via F.expr instead of ~10 higher-order-function
    constructions at ~60 ms of gateway latency per cosine (measured r14;
    the lit_vector recipe, applied to the expression tree itself).  The
    0.0D literal is the DOUBLE zero `F.lit(0.0)` builds (a bare 0.0
    would parse as DECIMAL and change the fold arithmetic)."""
    return (
        f"aggregate(zip_with({_as_double_sql(a)}, {_as_double_sql(b)}, "
        f"(x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
    )


def norm_sql(a: str) -> str:
    return f"sqrt(aggregate({_as_double_sql(a)}, 0.0D, (acc, x) -> acc + x * x))"


def cosine_sql(a: str, b: str) -> str:
    return f"({dot_sql(a, b)} / ({norm_sql(a)} * {norm_sql(b)}))"


def dot(a: Column | str, b: Column | str) -> Column:
    """Left-to-right fold of the elementwise product, in double.  String
    args are SQL fragments routed through `dot_sql` (one Py4J call,
    value-identical — pinned by tests/test_round14_opt.py)."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(dot_sql(a, b))
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    if isinstance(a, str):
        return F.expr(norm_sql(a))
    return F.sqrt(F.aggregate(_as_double(a), F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column | str, b: Column | str) -> Column:
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(cosine_sql(a, b))
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast-cross-join queries x corpus, score,
    take per-query top-k (ties broken by candidate id ascending).

    At 100 TB the corpus side stays partition-parallel: the broadcast is
    only the query set; the window is partitioned by query id so each
    query's top-k reduces independently.
    """
    q = broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
        )
    )
    # Core-width corpus side (guide §2.5, r13): a single-row-group
    # parquet corpus arrives as ONE scan split, so the broadcast
    # crossJoin's cosine arithmetic — the entry's entire compute — ran
    # serial.  _core_width skips the shuffle once the scan is wide.
    c = _core_width(
        embeddings.select(
            F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cand_vec")
        ),
        "cand_id",
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            cosine("query_vec", "cand_vec").alias("cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", F.round(F.col("cos_raw"), 6).alias("cosine"))
    )


def grid_cell(vec: Column, dims: int = 2, width: float = 0.5) -> Column:
    """Quantization LSH: cell id from the first `dims` coordinates,
    `floor(x_i / width)` concatenated.  Deterministic, data-independent,
    and a pure column expression."""
    parts = [
        F.floor(F.element_at(_as_double(vec), i + 1) / F.lit(width)).cast("string")
        for i in range(dims)
    ]
    return F.concat_ws(",", *parts)


def grid_lsh_buckets(
    embeddings: DataFrame,
    dims: int = 2,
    width: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucket histogram — the partition layout a bucketed ANN search would
    shuffle on (one shuffle, key = cell)."""
    return (
        embeddings.select(grid_cell(F.col(vec_col), dims, width).alias("cell"), F.col(id_col))
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n_vectors"), F.min(id_col).alias("min_vec_id"))
    )


def _cells(
    embeddings: DataFrame, dims: int, width: float, id_col: str, vec_col: str
) -> DataFrame:
    return embeddings.select(
        F.col(id_col), F.col(vec_col), grid_cell(F.col(vec_col), dims, width).alias("cell")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.35,
    dims: int = 2,
    width: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup pairs, grid-bucketed: candidates must
    share a quantization cell (near-identical vectors always do — their
    leading coordinates agree), then exact cosine >= threshold.

    Execution: ONE shuffle of the vectors by cell key, then a per-cell
    numpy similarity matrix inside applyInPandas (Arrow in, BLAS flops,
    Arrow out) — the pair rows that survive the threshold are the only
    rows materialized.  A joined-then-scored plan instead materializes
    every candidate pair through interpreted array expressions; measured
    ~40x slower at sf0.1.

    Sizing rule (measured at 100x, see BENCH_SCALE.md): `dims` must grow
    with the corpus — roughly one extra quantized dimension per 10x —
    or cell populations grow linearly and the hottest cell's per-cell
    work (and Arrow group) grows with them; the fixed default is sized
    for the fixture, exactly as nlist=10 is for the IVF entries."""
    import numpy as np
    import pandas as pd

    def _score_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cosine": []}).astype(
                {"vec_a": "int64", "vec_b": "int64", "cosine": "float64"}
            )
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
        norms = np.sqrt((m * m).sum(axis=1))
        ids = pdf[id_col].to_numpy()
        n = len(pdf)
        # row-blocked upper triangle: peak memory one (block x n) sims
        # matrix (~32 MB), not the full (n x n) — hot cells at corpus
        # scale would otherwise OOM the python worker
        block = max(1, 4_000_000 // n)
        out_a, out_b, out_c = [], [], []
        jj = np.arange(n)[None, :]
        for s in range(0, n, block):
            b = min(block, n - s)
            sims = (m[s : s + b] @ m.T) / np.outer(norms[s : s + b], norms)
            cos = np.round(sims, 6)
            keep = (jj > (s + np.arange(b))[:, None]) & (cos >= threshold)
            ra, cb_ = np.nonzero(keep)
            out_a.append(ids[s + ra])
            out_b.append(ids[cb_])
            out_c.append(cos[ra, cb_])
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a) if out_a else np.array([], "int64"),
                "vec_b": np.concatenate(out_b) if out_b else np.array([], "int64"),
                "cosine": np.concatenate(out_c) if out_c else np.array([], "float64"),
            }
        )

    return (
        _cells(embeddings, dims, width, id_col, vec_col)
        .groupBy("cell")
        .applyInPandas(_score_cell, "vec_a long, vec_b long, cosine double")
    )


def _self_topk_arrays(ids, m, k):
    """Row-blocked all-pairs-within-cell top-k (self excluded): peak
    memory is one (block x n) sims matrix (~32 MB), never the full
    (n x n) — hot cells at corpus scale would otherwise OOM the python
    worker.  Stable argsort on candidates pre-sorted by id keeps the
    (cosine desc, cand_id asc) tie order exact."""
    import numpy as np

    n = len(ids)
    norms = np.sqrt((m * m).sum(axis=1))
    kk = min(k, n - 1)
    block = max(1, 4_000_000 // n)
    oq, oc, orr, os_ = [], [], [], []
    for s in range(0, n, block):
        b = min(block, n - s)
        sims = (m[s : s + b] @ m.T) / np.outer(norms[s : s + b], norms)
        sims[np.arange(b), s + np.arange(b)] = -np.inf
        order = np.argsort(-sims, axis=1, kind="stable")[:, :kk]
        qi = np.repeat(np.arange(b), kk)
        ci = order.ravel()
        oq.append(ids[s + qi])
        oc.append(ids[ci])
        orr.append(np.tile(np.arange(1, kk + 1), b))
        os_.append(sims[qi, ci])
    import numpy as _np
    return (
        _np.concatenate(oq),
        _np.concatenate(oc),
        _np.concatenate(orr).astype("int32"),
        _np.concatenate(os_),
    )


def _block_topk_arrays(q, c, id_col: str, vec_col: str, k: int):
    """Per-query top-(k+1) of the q x c cosine block, ordered
    (cosine desc, cand_id asc).  Emitting only each block's top-(k+1) is
    lossless for any downstream global top-k merge: an item outside a
    block's top-(k+1) has >= k+1 strictly-better items in the global
    candidate set too (the block's candidates are a subset of the global
    set), so it can never reach global rank <= k even after one
    self-pair is excluded.  Cuts the Arrow transfer + shuffle from
    O(q*c) pair rows to O(q*k) — the difference between 25M and 100k
    rows per cell at sf0.1.

    Tie-exactness: candidates are sorted by id and the per-row argsort is
    stable, so equal cosines rank by cand_id ascending — identical to the
    global rank's ordering, which keeps the emitted superset exact even
    when near-identical vectors produce equal scores."""
    import numpy as np

    c = c.sort_values(id_col).reset_index(drop=True)
    qm = np.stack(q[vec_col].to_numpy()).astype("float64")
    cm = np.stack(c[vec_col].to_numpy()).astype("float64")
    qn = np.sqrt((qm * qm).sum(axis=1))
    cn = np.sqrt((cm * cm).sum(axis=1))
    take = min(k + 1, len(c))
    qids = q[id_col].to_numpy()
    cids = c[id_col].to_numpy()
    # block the query side: peak memory is one (block x nc) sims matrix
    # (~32 MB at the cap below) instead of the full (nq x nc) — on big
    # probe lists the unblocked matmul is the same OOM shape the 100x
    # scale run caught in the ADC kernel
    block = max(1, 4_000_000 // max(1, len(c)))
    out_q, out_c, out_s = [], [], []
    for s in range(0, len(qm), block):
        sims = (qm[s : s + block] @ cm.T) / np.outer(qn[s : s + block], cn)
        order = np.argsort(-sims, axis=1, kind="stable")[:, :take]
        qi = np.repeat(np.arange(sims.shape[0]), take)
        ci = order.ravel()
        out_q.append(qids[s : s + block][qi])
        out_c.append(cids[ci])
        out_s.append(sims[qi, ci])
    qid = np.concatenate(out_q)
    cid = np.concatenate(out_c)
    sim = np.concatenate(out_s)
    keep = qid != cid
    return qid[keep], cid[keep], sim[keep]


def grid_lsh_topk_multiprobe(
    embeddings: DataFrame,
    k: int = 5,
    dims: int = 2,
    width: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-probe grid top-k: each vector QUERIES its home cell plus all
    adjacent cells (3^dims probes) while remaining a CANDIDATE only in its
    home cell — recovering the neighbors that single-cell probing loses at
    cell boundaries, at 3^dims x the query-side shuffle (candidate side,
    the big one, is unreplicated).

    Per-cell scoring stays a numpy matrix (queries x candidates) in
    applyInPandas; pairs seen from multiple probes dedup in the final
    per-query rank."""
    import itertools

    import numpy as np
    import pandas as pd

    coords = [
        F.floor(F.element_at(_as_double(F.col(vec_col)), i + 1) / F.lit(width)).cast("long")
        for i in range(dims)
    ]
    probe_cells = F.array(
        *[
            F.concat_ws(",", *[(c + off).cast("string") for c, off in zip(coords, offs)])
            for offs in itertools.product((-1, 0, 1), repeat=dims)
        ]
    )
    home = F.concat_ws(",", *[c.cast("string") for c in coords])
    queries = embeddings.select(
        F.col(id_col), F.col(vec_col), F.explode(probe_cells).alias("cell"),
        F.lit(1).alias("is_query"),
    )
    cands = embeddings.select(
        F.col(id_col), F.col(vec_col), home.alias("cell"), F.lit(0).alias("is_query")
    )
    both = queries.unionByName(cands)

    def _score_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": [], "cand_id": [], "cos_raw": []}).astype(
            {"query_id": "int64", "cand_id": "int64", "cos_raw": "float64"}
        )
        q = pdf[pdf["is_query"] == 1]
        c = pdf[pdf["is_query"] == 0]
        if q.empty or c.empty:
            return empty
        qid, cid, cos = _block_topk_arrays(q, c, id_col, vec_col, k)
        return pd.DataFrame({"query_id": qid, "cand_id": cid, "cos_raw": cos})

    scored = both.groupBy("cell").applyInPandas(
        _score_cell, "query_id long, cand_id long, cos_raw double"
    )
    # a pair probed from several cells scores identically -> max() dedups
    deduped = scored.groupBy("query_id", "cand_id").agg(F.max("cos_raw").alias("cos_raw"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("cand_id").asc())
    return (
        deduped.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", F.round("cos_raw", 6).alias("cosine"))
    )


def ivf_topk_by_assignment(
    embeddings: DataFrame,
    k: int = 5,
    cell_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k over a given coarse assignment column (a cluster id /
    centroid assignment — here the corpus ships one; in production train
    pyspark.ml KMeans and `transform` to produce it).  Candidates are
    restricted to the query's inverted list: one shuffle on the
    assignment, per-list numpy scoring."""
    import numpy as np
    import pandas as pd

    def _topk_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"query_id": [], "cand_id": [], "rank": [], "cosine": []}
        ).astype({"query_id": "int64", "cand_id": "int64", "rank": "int32", "cosine": "float64"})
        n = len(pdf)
        if n < 2:
            return empty
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
        ids = pdf[id_col].to_numpy()
        qid, cid, rank, cos = _self_topk_arrays(ids, m, k)
        return pd.DataFrame(
            {
                "query_id": qid,
                "cand_id": cid,
                "rank": rank,
                "cosine": np.round(cos, 6),
            }
        )

    return (
        embeddings.select(F.col(id_col), F.col(vec_col), F.col(cell_col).alias("_cell"))
        .groupBy("_cell")
        .applyInPandas(_topk_cell, "query_id long, cand_id long, rank int, cosine double")
    )


def quantize_int8(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Symmetric int8 quantization per vector: scale = max|x| / 127,
    code_i = floor(x_i / scale + 0.5) — 4x storage compression for the
    embedding column, the standard pre-index shrink at corpus scale.

    floor(x + 0.5) instead of round(): engines disagree on round()'s tie
    rule (HALF_UP vs half-even — the q1 lesson), while floor on identical
    IEEE doubles is bit-deterministic everywhere.  All column expressions;
    codes serialize to a string so the result is hashable cross-engine."""
    v = _as_double(F.col(vec_col))
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = max_abs / F.lit(127.0)
    codes = F.transform(v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int"))
    return embeddings.select(
        F.col(id_col),
        F.round(scale, 6).alias("scale"),
        F.size(v).alias("n_dims"),
        F.concat_ws(",", F.transform(codes, lambda c: c.cast("string"))).alias(
            "codes"
        ),
    )


def int8_quant_error_stats(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Reconstruction-error table for the symmetric int8 quantizer: per
    vector, quantize -> dequantize (code_i * scale) -> max absolute error
    and relative L2 error — the accuracy half of the compression
    trade-off, EXACT and oracle-checkable (unlike the engine-internal PQ
    distortion sketch, this arithmetic is pure column expressions both
    engines replay identically).

    The scale denominator is floored at 1e-12 (identically in the
    oracle) so an all-zero vector yields zero error instead of an ANSI
    divide-by-zero failure.  One scan, no shuffle."""
    v = _as_double(F.col(vec_col))
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.greatest(max_abs / F.lit(127.0), F.lit(1e-12))
    deq = F.transform(
        v, lambda x: F.floor(x / scale + F.lit(0.5)).cast("double") * scale
    )
    err = F.zip_with(v, deq, lambda a, b: F.abs(a - b))
    sum_sq = lambda arr: F.aggregate(  # noqa: E731 — left-to-right fold
        arr, F.lit(0.0), lambda acc, x: acc + x * x
    )
    return embeddings.select(
        F.col(id_col),
        F.round(scale, 6).alias("scale"),
        F.round(F.array_max(err), 6).alias("max_abs_err"),
        F.round(F.sqrt(sum_sq(err) / sum_sq(v)), 6).alias("rel_l2_err"),
    )


def _stride_sample(e: DataFrame, n: int, k: int) -> list:
    """Every-(n//k)-th row of the (_id, _v) projection in _id order — the
    deterministic spread init shared by the coarse and PQ quantizers,
    computed DISTRIBUTED.  The old form ranked the whole projection under
    a global ``Window.orderBy("_id")`` — a single-partition sort that
    would bottleneck the init alone at corpus scale.  Same selected rows,
    no single-partition exchange: range-partition by _id (partitions are
    ordered; boundaries come from Spark's deterministic per-partition-seed
    sample of the persisted projection), rank within each partition, then
    shift each partition's ranks by the cumulative row count of the
    partitions before it — the offsets come from one
    one-row-per-partition collect, and the rank stage's widest exchange
    is the range partitioning itself."""
    stride = max(n // k, 1)
    n_part = e.sparkSession.sparkContext.defaultParallelism
    # persisted because BOTH jobs below (the per-partition counts and the
    # rank+filter) read it — without the pin each would re-pay the range
    # exchange from scratch (measured ~0.25 s of the init's fixture-scale
    # cost; at corpus scale it halves the init's shuffle volume)
    ranged = (
        e.repartitionByRange(n_part, "_id")
        .withColumn("_p", F.spark_partition_id())
        .persist()
    )
    # try/finally: if either collect dies mid-job (OOM, cancellation) the
    # persisted projection must not leak in the cache for the session
    try:
        counts = {
            r["_p"]: r["n"]
            for r in ranged.groupBy("_p").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        offs, acc = [], 0
        for p in range(n_part):
            offs.append(acc)
            acc += counts.get(p, 0)
        off_arr = F.expr(f"array({', '.join(f'{o}L' for o in offs)})")
        w = Window.partitionBy("_p").orderBy("_id")
        return (
            ranged.withColumn(
                "_rn", F.row_number().over(w) + F.element_at(off_arr, F.col("_p") + 1)
            )
            .filter((F.col("_rn") - 1) % stride == 0)
            .orderBy("_rn")
            .limit(k)
            .select("_v")
            .collect()
        )
    finally:
        ranged.unpersist()


def kmeans_train(
    embeddings: DataFrame,
    n_clusters: int = 10,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prepared=None,
) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd's k-means for the trained-IVF coarse quantizer.

    Everything is reproducible (and therefore oracle-checkable):
    - init: every (n // k)-th vector in id order — a deterministic spread
      sample computed DISTRIBUTED (range-partition + per-partition ranks
      shifted by collected offsets; no global-window single-partition
      sort anywhere in the init);
    - assignment: argmin squared L2 in double with left-to-right folds,
      ties broken by smallest centroid index;
    - update: per-dimension mean rounded to 6 decimals, so both engines
      agree bit-for-bit despite different partial-sum orders.

    `iters` counts ASSIGNMENTS: iters=2 means assign -> update -> (caller
    assigns again with the returned centroids).  The per-iteration driver
    collect is k x dim rounded means — a few KB; the heavy work (assignment
    over the corpus) stays fully distributed, matching how pyspark.ml's
    KMeans reduces per-iteration stats to the driver.
    """
    # 3+ sequential jobs (count, init, per-iter stats) re-scan the (_id,
    # _v) projection; persist it so each job reads the in-memory columnar
    # copy instead of re-listing + re-decoding parquet.  `prepared` lets a
    # caller training several quantizers (coarse + PQ) share ONE persisted
    # copy and count — (e, n), caller owns the unpersist.
    own = prepared is None
    if own:
        e = embeddings.select(
            F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v")
        ).persist()
        n = e.count()
    else:
        e, n = prepared
    init = _stride_sample(e, n, n_clusters)
    centroids = [(j, [float(x) for x in row["_v"]]) for j, row in enumerate(init)]
    for _ in range(iters - 1):
        assigned = e.withColumn(
            "cluster",
            F.element_at(_probe_clusters_udf(centroids, 1)(F.col("_v")), 1),
        )
        means = (
            assigned.select("cluster", F.posexplode("_v").alias("i", "x"))
            .groupBy("cluster", "i")
            .agg(F.round(F.avg("x"), 6).alias("m"))
            .collect()
        )
        by_j: dict[int, dict[int, float]] = {}
        for r in means:
            by_j.setdefault(r["cluster"], {})[r["i"]] = r["m"]
        centroids = [
            (j, [dims[i] for i in sorted(dims)]) for j, dims in sorted(by_j.items())
        ]
    if own:
        e.unpersist()
    return centroids


def assign_cluster(vec: Column, centroids: list[tuple[int, list[float]]]) -> Column:
    """Argmin squared-L2 assignment as a pure column expression: one
    (distance, index) struct per centroid, array_min picks the smallest
    distance with index tie-break — all JVM built-ins, broadcast-free
    (centroids are literals in the plan)."""
    v = _as_double(vec)
    structs = [
        F.struct(
            F.aggregate(
                F.zip_with(
                    v,
                    lit_vector(cv),
                    lambda a, b: (a - b) * (a - b),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            F.lit(j).alias("j"),
        )
        for j, cv in centroids
    ]
    return F.array_min(F.array(*structs))["j"]


def _probe_clusters_udf(centroids: list[tuple[int, list[float]]], nprobe: int):
    """Arrow-vectorized nprobe-nearest-centroid selection (stable argsort
    on squared L2, ties to the smallest centroid index — the same order as
    the `assign_cluster` struct sort).  One numpy broadcast per batch
    replaces an interpreted 10x64 Catalyst fold per row, measured ~2.5x
    on the trained-IVF end-to-end; with nprobe=1 it is the assignment."""
    import numpy as np
    import pandas as pd

    cmat = np.asarray([cv for _, cv in sorted(centroids)], dtype="float64")
    order = [j for j, _ in sorted(centroids)]
    jmap = np.asarray(order, dtype="int32")
    k, dim = cmat.shape
    # row-block the (rows x k x dim) broadcast-difference intermediate to
    # ~32 MB of scratch: at production nlist (k grows with the corpus — the
    # 100x run uses k=1000) an unblocked 10k-row Arrow batch would
    # materialize 5+ GB PER WORKER and thrash every executor.  Blocking
    # over rows keeps each (row, centroid) distance bit-identical.
    block = max(1, 4_000_000 // max(1, k * dim))

    def _probes(vs):
        vm = np.stack(vs.to_numpy()).astype("float64")
        tops = []
        for s in range(0, len(vm), block):
            d = ((vm[s : s + block, None, :] - cmat[None, :, :]) ** 2).sum(axis=2)
            tops.append(np.argsort(d, axis=1, kind="stable")[:, :nprobe])
        top = np.concatenate(tops) if tops else np.empty((0, nprobe), "int64")
        return pd.Series(list(jmap[top]))

    return F.pandas_udf(_probes, "array<int>")


def trained_ivf_topk(
    embeddings: DataFrame,
    n_clusters: int = 10,
    iters: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache_key: str | None = None,
) -> DataFrame:
    """Trained-IVF top-k: deterministic k-means coarse quantizer, then
    inverted-list search (one shuffle on the learned cluster id, per-list
    numpy scoring) — the production shape where pyspark.ml KMeans supplies
    the assignment column for ivf_topk_by_assignment."""
    centroids = _cached_kmeans(
        embeddings, n_clusters, iters, id_col, vec_col, cache_key
    )
    assigned = embeddings.withColumn(
        "cluster",
        F.element_at(_probe_clusters_udf(centroids, 1)(_as_double(F.col(vec_col))), 1),
    )
    return ivf_topk_by_assignment(
        assigned, k=k, cell_col="cluster", id_col=id_col, vec_col=vec_col
    )


def multiprobe_trained_ivf_topk(
    embeddings: DataFrame,
    n_clusters: int = 10,
    nprobe: int = 8,
    iters: int = 2,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache_key: str | None = None,
) -> DataFrame:
    """Trained-IVF with multi-probe: each query searches its `nprobe`
    nearest inverted lists (standard IVF nprobe), the candidate side stays
    unreplicated — the same query-side-only replication shape as the
    multiprobe grid.

    Recall scales with the probed candidate fraction; on corpora with real
    cluster structure a few probes recover near-exact results, while on
    structureless (uniform) embeddings recall ~= nprobe/n_clusters by
    construction — measured 0.95 at nprobe=8/10 on the synthetic fixture
    whose neighbors are uniformly spread across clusters.

    Per-list scoring is a numpy (queries-probing x members) matrix in
    applyInPandas after ONE shuffle on the cluster id — the same
    Arrow-vectorized shape as the multiprobe grid; a JVM-side per-pair
    cosine fold was measured 18x slower (interpreted higher-order
    functions don't codegen)."""
    import numpy as np
    import pandas as pd

    centroids = _cached_kmeans(
        embeddings, n_clusters, iters, id_col, vec_col, cache_key
    )
    v = _as_double(F.col(vec_col))
    # ONE probe-UDF pass: probes[0] is the assignment (stable argsort), so
    # the query side (all nprobe probes) and the candidate side (home list)
    # both derive from the same scanned+probed projection; materializing it
    # halves the pandas-UDF scans vs probing each branch separately.
    # localCheckpoint rather than persist: the returned frame is lazy, so
    # there is no in-function point to unpersist — checkpoint blocks are
    # reclaimed by the ContextCleaner once the result is GC'd, while a
    # persist would pin a CacheManager entry for the whole session.
    probed = embeddings.select(
        F.col(id_col),
        F.col(vec_col),
        _probe_clusters_udf(centroids, nprobe)(v).alias("_probes"),
    ).transform(pin)
    queries = probed.select(
        F.col(id_col),
        F.col(vec_col),
        F.explode("_probes").alias("cluster"),
        F.lit(1).alias("is_query"),
    )
    cands = probed.select(
        F.col(id_col),
        F.col(vec_col),
        F.element_at("_probes", 1).alias("cluster"),
        F.lit(0).alias("is_query"),
    )
    both = queries.unionByName(cands)

    def _score_list(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": [], "cand_id": [], "cos_raw": []}).astype(
            {"query_id": "int64", "cand_id": "int64", "cos_raw": "float64"}
        )
        q = pdf[pdf["is_query"] == 1]
        c = pdf[pdf["is_query"] == 0]
        if q.empty or c.empty:
            return empty
        qid, cid, cos = _block_topk_arrays(q, c, id_col, vec_col, k)
        return pd.DataFrame({"query_id": qid, "cand_id": cid, "cos_raw": cos})

    scored = both.groupBy("cluster").applyInPandas(
        _score_list, "query_id long, cand_id long, cos_raw double"
    )
    # each pair meets exactly once (one home list per candidate, distinct
    # probes), so no dedup pass is needed before the per-query rank
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", F.round("cos_raw", 6).alias("cosine"))
    )


def grid_lsh_topk(
    embeddings: DataFrame,
    k: int = 5,
    dims: int = 2,
    width: float = 0.5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: candidates limited to same-cell
    vectors.  One shuffle on the cell key; recall depends on (dims,
    width).  Per-cell scoring is a numpy similarity matrix in
    applyInPandas; ties rank by (cosine desc, cand_id asc) like
    brute_force_topk."""
    import numpy as np
    import pandas as pd

    def _topk_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        empty = pd.DataFrame(
            {"query_id": [], "cand_id": [], "rank": [], "cosine": []}
        ).astype({"query_id": "int64", "cand_id": "int64", "rank": "int32", "cosine": "float64"})
        if n < 2:
            return empty
        pdf = pdf.sort_values(id_col).reset_index(drop=True)  # cand_id asc tie-break
        m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
        ids = pdf[id_col].to_numpy()
        qid, cid, rank, cos = _self_topk_arrays(ids, m, k)
        return pd.DataFrame(
            {
                "query_id": qid,
                "cand_id": cid,
                "rank": rank,
                "cosine": np.round(cos, 6),
            }
        )

    return (
        _cells(embeddings, dims, width, id_col, vec_col)
        .groupBy("cell")
        .applyInPandas(_topk_cell, "query_id long, cand_id long, rank int, cosine double")
    )


def label_centroids(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    scale: int = 1_000_000,
) -> DataFrame:
    """Per-label mean embedding (class centroids) — the seed table for
    IVF training, centroid-based classification, and cluster-balance
    audits.  Components are quantized to integer micro-units with the
    engine-portable floor(x*scale + 0.5) rounding and serialized to a
    comma-joined string so the result hashes identically across engines.

    Shape: posexplode to (label, pos, val), one hash-agg on (label, pos)
    with map-side partials, then a tiny per-label regroup — the classic
    scalable mean-vector plan (never collect_list over raw vectors)."""
    ex = embeddings.select(
        label_col, F.posexplode(_as_double(F.col(vec_col))).alias("pos", "val")
    )
    per_dim = ex.groupBy(label_col, "pos").agg(
        F.floor(F.avg("val") * scale + F.lit(0.5)).cast("long").alias("q"),
        F.count(F.lit(1)).alias("n"),
    )
    return per_dim.groupBy(label_col).agg(
        F.max("n").cast("long").alias("n_vecs"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "q"))),
                lambda s: s.q.cast("string"),
            ),
            ",",
        ).alias("centroid_q6"),
    )


# -- product quantization (IVF-PQ, the 100 TB ANN memory shape) --------------


def _pq_codebooks_array(codebooks):
    """codebooks[m][c] -> numpy (M, K, d_sub) float64."""
    import numpy as np

    return np.asarray(codebooks, dtype="float64")


def pq_train(
    embeddings: DataFrame,
    m_sub: int = 8,
    k_cent: int = 16,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prepared=None,
    cache_key: str | None = None,
) -> list:
    """Deterministic product-quantization codebooks: the vector space is
    split into `m_sub` contiguous subspaces and each gets its own
    `k_cent`-centroid quantizer — 64 float32 dims compress to 8 bytes
    (16x), which is what lets a 100 TB corpus's index live in executor
    memory.

    All subspaces train TOGETHER in one distributed pass per iteration
    (one pandas-UDF assignment producing all M codes, one posexplode
    hash-agg producing all M*K*d_sub means) — not M sequential k-means.
    Same determinism contract as kmeans_train (stride init, stable
    argmin ties to the lower code, means rounded to 6 decimals).

    `cache_key` opts into the `_TRAIN_CACHE` memo exactly like the IVF
    wrappers (index BUILD happens once; queries reuse the codebooks) —
    training is seedless and deterministic for a given input, so a hit
    returns bit-identical codebooks.

    Returns codebooks[m][c] = list of d_sub floats."""
    import numpy as np

    key = (
        (cache_key, "pq", m_sub, k_cent, iters, id_col, vec_col)
        if cache_key is not None
        else None
    )
    if key is not None and key in _TRAIN_CACHE:
        return _TRAIN_CACHE[key]
    own = prepared is None
    if own:
        e = embeddings.select(
            F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v")
        ).persist()
        n = e.count()
    else:
        e, n = prepared
    dim = len(e.select("_v").head()["_v"])
    if dim % m_sub:
        raise ValueError(f"dim {dim} not divisible by m_sub {m_sub}")
    d_sub = dim // m_sub
    init = _stride_sample(e, n, k_cent)
    codebooks = [
        [list(row["_v"][m * d_sub : (m + 1) * d_sub]) for row in init]
        for m in range(m_sub)
    ]
    for _ in range(iters - 1):
        codes = _pq_assign_udf(codebooks)(F.col("_v"))
        assigned = e.withColumn("_codes", codes)
        means = (
            assigned.select("_codes", F.posexplode("_v").alias("i", "x"))
            .withColumn("m", (F.col("i") / d_sub).cast("int"))
            .withColumn("c", F.element_at("_codes", F.col("m") + 1))
            .groupBy("m", "c", "i")
            .agg(F.round(F.avg("x"), 6).alias("mv"))
            .collect()
        )
        by_mc: dict = {}
        for r in means:
            by_mc.setdefault((r["m"], r["c"]), {})[r["i"]] = r["mv"]
        for (m, c), dims in by_mc.items():
            codebooks[m][c] = [dims[i] for i in sorted(dims)]
    if own:
        e.unpersist()
    if key is not None:
        _TRAIN_CACHE[key] = codebooks
    return codebooks


def _pq_assign_udf(codebooks):
    """Arrow-vectorized PQ encoding: all M sub-assignments in one numpy
    broadcast per batch; returns array<int> of M codes (stable ties to
    the lower code, matching kmeans_train)."""
    import numpy as np
    import pandas as pd

    cb = _pq_codebooks_array(codebooks)  # (M, K, d)
    m_sub, k_cent, d_sub = cb.shape

    # same ~32 MB row-blocking as _probe_clusters_udf: the (rows, M, K, d)
    # intermediate is rows x 128 KB at (M=8, K=256, d=8) — 1.3 GB per
    # unblocked 10k-row Arrow batch, per worker
    block = max(1, 4_000_000 // max(1, m_sub * k_cent * d_sub))

    def _assign(vs):
        vm = np.stack(vs.to_numpy()).astype("float64")
        parts = []
        for s in range(0, len(vm), block):
            sub = vm[s : s + block].reshape(-1, m_sub, d_sub)
            d2 = ((sub[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
            parts.append(d2.argmin(axis=2).astype("int32"))  # ties -> lowest
        codes = (
            np.concatenate(parts) if parts else np.empty((0, m_sub), "int32")
        )
        return pd.Series(list(codes))

    return F.pandas_udf(_assign, "array<int>")


def pq_encode(
    embeddings: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>, recon_err double): the PQ code word per
    vector plus its squared reconstruction error — the compression
    accounting an index build reports."""
    import numpy as np
    import pandas as pd

    cb = _pq_codebooks_array(codebooks)
    m_sub, k_cent, d_sub = cb.shape

    # row-blocked like _pq_assign_udf: bounds the (rows, M, K, d) scratch
    block = max(1, 4_000_000 // max(1, m_sub * k_cent * d_sub))

    def _encode(vs):
        vm = np.stack(vs.to_numpy()).astype("float64")
        code_parts, err_parts = [], []
        for s in range(0, len(vm), block):
            sub = vm[s : s + block].reshape(-1, m_sub, d_sub)
            d2 = ((sub[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
            codes = d2.argmin(axis=2)
            err = np.take_along_axis(d2, codes[:, :, None], axis=2)[:, :, 0].sum(
                axis=1
            )
            code_parts.append(codes)
            err_parts.append(err)
        codes = (
            np.concatenate(code_parts) if code_parts else np.empty((0, m_sub), "int64")
        )
        err = np.concatenate(err_parts) if err_parts else np.empty((0,), "float64")
        return pd.DataFrame(
            {"codes": list(codes.astype("int32")), "recon_err": np.round(err, 6)}
        )

    out = F.pandas_udf(_encode, "codes array<int>, recon_err double")
    v = _as_double(F.col(vec_col))
    return embeddings.select(
        F.col(id_col), out(v).alias("_pq")
    ).select(id_col, F.col("_pq.codes").alias("codes"), F.col("_pq.recon_err").alias("recon_err"))


#: One-time index-build results keyed by (cache_key, params).  Real ANN
#: systems split INDEX BUILD (train once, store codebooks) from QUERY
#: (reuse them); without this every query call re-paid two Lloyd
#: trainings, which dominated the entry's wall time (bench 2.3 s, and
#: 14.2x in the 10x scale run — pure build cost).  Safe to memoize:
#: kmeans_train/pq_train are seedless and deterministic for a given
#: input, so a cache hit returns bit-identical quantizers.  Keyed by the
#: caller-supplied cache_key (e.g. the sf_dir) — pass None to retrain.
_TRAIN_CACHE: dict = {}


def _cached_kmeans(embeddings, n_clusters, iters, id_col, vec_col, cache_key):
    key = (
        (cache_key, "kmeans", n_clusters, iters, id_col, vec_col)
        if cache_key is not None
        else None
    )
    if key is not None and key in _TRAIN_CACHE:
        return _TRAIN_CACHE[key]
    centroids = kmeans_train(embeddings, n_clusters, iters, id_col, vec_col)
    if key is not None:
        _TRAIN_CACHE[key] = centroids
    return centroids


def ivf_pq_topk(
    embeddings: DataFrame,
    n_clusters: int = 10,
    nprobe: int = 8,
    m_sub: int = 8,
    k_cent: int = 16,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache_key: str | None = None,
) -> DataFrame:
    """IVF-PQ top-k — the full 100 TB ANN shape: a coarse quantizer routes
    each query to its `nprobe` nearest inverted lists, and within a list
    candidates are scored by asymmetric distance computation (ADC): the
    query builds an (M x K) lookup table of exact subspace distances to
    the codebooks once, and each candidate's distance is M table lookups
    summed over its 8-byte code — no candidate vector is ever read.

    At scale only the codes (16x smaller than the vectors) shuffle to the
    probe lists; the exact vectors stay in the scan stage of the query
    side.  Approximation is the ADC quantization error; recall is pinned
    by tests/test_pq.py against exact brute force.  Rows-only entry: the
    unrolled two-level training would dwarf any SQL oracle.

    Returns (query_id, cand_id, rank, adc_dist)."""
    import numpy as np
    import pandas as pd

    key = (
        (cache_key, "ivfpq", n_clusters, m_sub, k_cent, id_col, vec_col)
        if cache_key is not None
        else None
    )
    if key is not None and key in _TRAIN_CACHE:
        coarse, codebooks = _TRAIN_CACHE[key]
    else:
        # both quantizers train from the same persisted projection: one
        # scan, one count, shared in-memory copy (kmeans + PQ would
        # otherwise each pay their own)
        e = embeddings.select(
            F.col(id_col).alias("_id"), _as_double(F.col(vec_col)).alias("_v")
        ).persist()
        prepared = (e, e.count())
        coarse = kmeans_train(embeddings, n_clusters, 2, id_col, vec_col, prepared)
        codebooks = pq_train(embeddings, m_sub, k_cent, 2, id_col, vec_col, prepared)
        e.unpersist()
        if key is not None:
            _TRAIN_CACHE[key] = (coarse, codebooks)
    cb = _pq_codebooks_array(codebooks)
    m_count, k_count, d_sub = cb.shape

    v = _as_double(F.col(vec_col))
    codes_df = pq_encode(embeddings, codebooks, id_col, vec_col).select(
        F.col(id_col), "codes"
    )
    home = embeddings.select(
        F.col(id_col),
        F.element_at(_probe_clusters_udf(coarse, 1)(v), 1).alias("cluster"),
    )
    cands = codes_df.join(home, id_col).select(
        F.col(id_col), F.col("codes"), F.col("cluster"), F.lit(None).cast("array<double>").alias("qv")
    )
    queries = embeddings.select(
        F.col(id_col),
        F.lit(None).cast("array<int>").alias("codes"),
        F.explode(_probe_clusters_udf(coarse, nprobe)(v)).alias("cluster"),
        v.alias("qv"),
    )
    both = queries.unionByName(cands)

    def _adc_list(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"query_id": [], "cand_id": [], "adc": []}).astype(
            {"query_id": "int64", "cand_id": "int64", "adc": "float64"}
        )
        q = pdf[pdf["qv"].notna()]
        c = pdf[pdf["qv"].isna()].sort_values(id_col).reset_index(drop=True)
        if q.empty or c.empty:
            return empty
        qm = np.stack(q["qv"].to_numpy()).astype("float64")  # (nq, dim)
        codes = np.stack(c["codes"].to_numpy()).astype("int64")  # (nc, M)
        qids = q[id_col].to_numpy()
        cids = c[id_col].to_numpy()
        take = min(k + 1, len(c))
        # Block the query side and accumulate the ADC matrix one subspace
        # at a time: peak memory is two (block x nc) doubles (~32 MB at
        # the cap below).  The unblocked fancy-index gather materialized a
        # (nq x M x nc) intermediate — 189 GiB in the 100x scale run, the
        # exact OOM this harness exists to catch.
        block = max(1, 4_000_000 // max(1, len(c)))
        out_q, out_c, out_d = [], [], []
        for s in range(0, len(qm), block):
            qb = qm[s : s + block]
            qsub = qb.reshape(len(qb), m_count, d_sub)
            # LUT[q, m, k] = ||q_sub[m] - cb[m, k]||^2
            lut = ((qsub[:, :, None, :] - cb[None, :, :, :]) ** 2).sum(axis=3)
            adc = np.zeros((len(qb), len(codes)))
            for m in range(m_count):
                adc += lut[:, m, codes[:, m]]
            order = np.argsort(adc, axis=1, kind="stable")[:, :take]
            qi = np.repeat(np.arange(len(qb)), take)
            ci = order.ravel()
            out_q.append(qids[s : s + block][qi])
            out_c.append(cids[ci])
            out_d.append(adc[qi, ci])
        qid = np.concatenate(out_q)
        cid = np.concatenate(out_c)
        dist = np.concatenate(out_d)
        keep = qid != cid
        return pd.DataFrame(
            {"query_id": qid[keep], "cand_id": cid[keep], "adc": dist[keep]}
        )

    scored = both.groupBy("cluster").applyInPandas(
        _adc_list, "query_id long, cand_id long, adc double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc").asc(), F.col("cand_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", F.round("adc", 6).alias("adc_dist"))
    )


def exact_l2_topk(
    embeddings: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact squared-L2 top-k over all query x candidate pairs (self
    excluded) — the ground truth the IVF-PQ stack is measured against,
    in the same metric the rerank stage scores (squared euclidean, no
    sqrt).  Same broadcast-cross-join shape as `brute_force_topk`: the
    query side broadcasts, the corpus side stays partition-parallel,
    per-query top-k reduces independently under the window.

    Returns (query_id, cand_id, rank, l2_dist)."""
    v = _as_double(F.col(vec_col))
    q = broadcast(
        embeddings.select(F.col(id_col).alias("query_id"), v.alias("_qv"))
    )
    c = embeddings.select(F.col(id_col).alias("cand_id"), v.alias("_cv"))
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            F.aggregate(
                F.zip_with(F.col("_qv"), F.col("_cv"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("l2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("l2").asc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", F.round("l2", 6).alias("l2_dist"))
    )


def ivf_pq_agreement(
    embeddings: DataFrame,
    n_clusters: int = 10,
    nprobe: int = 8,
    m_sub: int = 8,
    k_cent: int = 16,
    k: int = 5,
    shortlist: int = 200,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache_key: str | None = None,
) -> DataFrame:
    """Driver-visible recall audit for the IVF-PQ + rerank stack at its
    production parameters: joins the approximate top-k against the exact
    squared-L2 top-k IN SPARK and reduces to one summary row —
    (n_queries, k, shortlist, n_exact, n_agree, recall).

    The recall claim pytest pins (tests/test_pq.py) becomes a queryable
    number instead of a test constant.  The exact side and the agreement
    arithmetic are SQL-expressible; the PQ side is not (deterministic
    two-level quantizer training), so the entry is rows-only — its
    oracle-green companion is `ann_ivf_pq_exact_parity`, which runs the
    same PQ code path in the full-probe/full-shortlist regime where its
    output must equal exact brute force and hash-checks it against
    DuckDB."""
    pq = ivf_pq_rerank_topk(
        embeddings, n_clusters, nprobe, m_sub, k_cent, k, shortlist, id_col, vec_col,
        cache_key=cache_key,
    ).select("query_id", "cand_id", F.lit(1).alias("_hit"))
    exact = exact_l2_topk(embeddings, k, id_col, vec_col)
    return (
        exact.join(pq, ["query_id", "cand_id"], "left")
        .agg(
            F.countDistinct("query_id").cast("long").alias("n_queries"),
            F.count(F.lit(1)).cast("long").alias("n_exact"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_agree"),
        )
        .select(
            "n_queries",
            F.lit(k).cast("int").alias("k"),
            F.lit(shortlist).cast("int").alias("shortlist"),
            "n_exact",
            "n_agree",
            F.round(F.col("n_agree") / F.col("n_exact"), 4).alias("recall"),
        )
    )


def ivf_pq_rerank_topk(
    embeddings: DataFrame,
    n_clusters: int = 10,
    nprobe: int = 8,
    m_sub: int = 8,
    k_cent: int = 16,
    k: int = 5,
    shortlist: int = 200,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache_key: str | None = None,
) -> DataFrame:
    """IVF-PQ with exact re-rank — the DiskANN-style two-stage read: the
    8-byte-code ADC pass produces a `shortlist`-sized candidate set per
    query (memory-resident index, no vectors touched), then ONLY the
    shortlisted candidates' exact vectors are fetched and re-scored.

    At 100 TB that second stage reads `shortlist` vectors per query from
    the vector store instead of a full list scan — the join on cand_id is
    the selective fetch.  Recovers the recall that raw ADC loses to
    quantization (on the uniform fixture: 0.20 -> 0.92 at shortlist=200,
    approaching the 0.95 nprobe routing ceiling).  Returns (query_id, cand_id, rank, l2_dist)."""
    shortlisted = ivf_pq_topk(
        embeddings, n_clusters, nprobe, m_sub, k_cent, shortlist, id_col, vec_col,
        cache_key=cache_key,
    ).select("query_id", "cand_id")
    v = _as_double(F.col(vec_col))
    qv = embeddings.select(F.col(id_col).alias("query_id"), v.alias("_qv"))
    cv = embeddings.select(F.col(id_col).alias("cand_id"), v.alias("_cv"))
    exact = (
        shortlisted.join(qv, "query_id")
        .join(cv, "cand_id")
        .withColumn(
            "l2",
            F.aggregate(
                F.zip_with(F.col("_qv"), F.col("_cv"), lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("l2").asc(), F.col("cand_id").asc())
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", F.round("l2", 6).alias("l2_dist"))
    )


def hard_negative_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Contrastive-training hard-negative mining: for each query vector,
    the top-k most-similar candidates with a DIFFERENT label — the
    highest-loss negatives for a contrastive/triplet objective, which is
    the standard embedding-model training-data prep step.

    Same physical shape as brute_force_topk (broadcast query side,
    partition-parallel corpus side, per-query window top-k); the label
    inequality is a pre-window filter so mismatched-label pairs never
    reach the sort.  Swap the corpus scan for the IVF/PQ index path at
    production scale — the label filter composes with any candidate
    generator.
    """
    q = broadcast(
        queries.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("query_vec"),
            F.col(label_col).alias("query_label"),
        )
    )
    # core-width corpus side — same single-scan-split rationale as
    # brute_force_topk (guide §2.5, r13); skipped once the scan is wide
    c = _core_width(
        embeddings.select(
            F.col(id_col).alias("cand_id"),
            F.col(vec_col).alias("cand_vec"),
            F.col(label_col).alias("cand_label"),
        ),
        "cand_id",
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("cand_label") != F.col("query_label"))
        .select(
            "query_id",
            "cand_id",
            "cand_label",
            cosine("query_vec", "cand_vec").alias("cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "cand_id",
            "cand_label",
            "rank",
            F.round(F.col("cos_raw"), 6).alias("cosine"),
        )
    )


def rp_planes(tables: int = 2, planes: int = 8, dim: int = 64) -> list[list[list[float]]]:
    """Deterministic ±1 random-projection hyperplanes: coefficient sign
    from one md5 byte per (table, plane, dim) coordinate — engine-portable
    (the SQL oracle inlines the SAME literals), seedless, and reproducible
    across runs.  Rademacher (±1) projections satisfy the same
    Johnson-Lindenstrauss bounds as Gaussian ones (Achlioptas 2001)."""
    import hashlib

    return [
        [
            [
                1.0 if hashlib.md5(f"rp:{t}:{p}:{i}".encode()).digest()[0] % 2 == 0 else -1.0
                for i in range(dim)
            ]
            for p in range(planes)
        ]
        for t in range(tables)
    ]


def rp_lsh_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    planes: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-LSH (SimHash-for-ANN) top-k: each hash table buckets vectors
    by the SIGN PATTERN of `planes` random projections; candidates are
    vectors sharing a bucket with the query in ANY table; exact cosine
    re-ranks the candidate set.

    The second standard LSH family next to the grid index: grid cells
    partition by leading coordinates (data-dependent density), sign-LSH
    partitions by angle (matches cosine similarity directly) and its
    bucket population is load-balanced by construction for centered data.

    Shape: ONE narrow (id, table, bucket) projection per side — every
    table's bucket is computed in a single scan pass and posexploded,
    not one union branch per table — ONE equi-join on (table, bucket),
    distinct pairs, exact-cosine window top-k over candidates only:
    candidate generation never compares vectors, and the join key
    cardinality (tables x 2^planes) controls the recall/cost trade-off.

    All of a table's plane dots run in one F.aggregate pass over the
    vector with an (planes x dim) literal matrix and an array
    accumulator: ~8x fewer higher-order-function nodes than a
    dot-per-plane expression, which cut Catalyst planning + codegen from
    4.3 s to 2.4 s warm at sf0.1 (and is the same executor work)."""
    def bucket(vec: str, table: int) -> Column:
        # ONE F.expr parse instead of ~600 Py4J round-trips of nested
        # higher-order-function construction (measured r14: the four
        # bucket trees were 0.6-1.0 s of pure gateway latency per bench
        # run).  The SQL is the exact analyzed tree the Python builders
        # produced: same literal matrix (from_json constant-folds), same
        # fold order, same sign rule; 0.0D is the DOUBLE literal
        # F.lit(0.0) built.  Value identity pinned by
        # tests/test_round14_opt.py.
        import json as _json

        mat_json = _json.dumps([[float(v) for v in r] for r in planes[table]])
        nplanes, dim = len(planes[table]), len(planes[table][0])
        dots = (
            f"aggregate(sequence(1, {dim}), array_repeat(0.0D, {nplanes}), "
            f"(acc, i) -> zip_with(acc, "
            f"transform(from_json('{mat_json}', 'array<array<double>>'), "
            f"prow -> element_at(prow, i) * CAST(element_at({vec}, i) AS DOUBLE)), "
            f"(a, b) -> a + b))"
        )
        return F.expr(
            f"array_join(transform({dots}, "
            f"d -> CASE WHEN d >= 0 THEN '1' ELSE '0' END), '')"
        )

    def bucketed(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.posexplode(
                F.array(*[bucket(vec_col, t) for t in range(len(planes))])
            ).alias("t", "bucket"),
        )

    qb = bucketed(queries, "query")
    cb = bucketed(embeddings, "cand")
    cand = (
        qb.join(cb, ["t", "bucket"])
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id")
        .distinct()
    )
    qv = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    cv = embeddings.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv"))
    scored = (
        cand.join(broadcast(qv), "query_id")
        .join(cv, "cand_id")
        .select(
            "query_id",
            "cand_id",
            cosine("qv", "cv").alias("cos_raw"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("cand_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "rank", F.round("cos_raw", 6).alias("cosine"))
    )


def pca_top_component(
    embeddings: DataFrame,
    dim: int,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed PCA, top principal component by power iteration.

    The DISTRIBUTED work is the single Gram pass: each partition reduces
    to a (dim x dim) partial X^T X plus per-dim sums and a count inside
    mapInPandas (Arrow in, one BLAS syrk, constant-size out), and ONE
    shuffle of (partitions x dim^2) cells sums the partials — input rows
    never shuffle.  The covariance C = (G - s s^T / n) / n is then a
    dim^2-cell table (bounded, ~32 KB at dim=64), so the `iters` power
    steps run on the driver in numpy — the same bounded-driver-traffic
    contract as the k-means/PQ codebook collects documented in this
    module.

    Determinism: v0 = 1/sqrt(dim) (seedless), fixed iteration count (no
    convergence test), sign fixed so the first nonzero loading is
    positive — bit-for-bit reproducible and SQL-expressible (the oracle
    unrolls the same `iters` steps as CTEs).

    Returns (dim_index 1-based, loading, eigenvalue) — eigenvalue is the
    Rayleigh quotient v^T C v, the variance explained by the component.
    """
    import numpy as np
    import pandas as pd

    def _partial_gram(batches):
        g = np.zeros((dim, dim))
        s = np.zeros(dim)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype("float64")
            g += m.T @ m
            s += m.sum(axis=0)
            n += len(m)
        ii, jj = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
        yield pd.DataFrame(
            {
                "i": ii.ravel() + 1,
                "j": jj.ravel() + 1,
                "g": g.ravel(),
                "s_i": np.repeat(s, dim),
                "n": np.full(dim * dim, n, dtype="int64"),
            }
        )

    cells = (
        embeddings.select(vec_col)
        .mapInPandas(_partial_gram, "i long, j long, g double, s_i double, n long")
        .groupBy("i", "j")
        .agg(
            F.sum("g").alias("g"),
            F.sum("s_i").alias("s_i"),
            F.sum("n").alias("n"),
        )
        .collect()
    )
    n = cells[0]["n"]
    g = np.zeros((dim, dim))
    s = np.zeros(dim)
    for r in cells:
        g[r["i"] - 1, r["j"] - 1] = r["g"]
        s[r["i"] - 1] = r["s_i"]  # every (i, j) row carries the full s[i]
    cov = (g - np.outer(s, s) / n) / n
    v = np.full(dim, 1.0 / np.sqrt(dim))
    for _ in range(iters):
        w = cov @ v
        v = w / np.sqrt((w * w).sum())
    nz = np.nonzero(np.round(v, 9))[0]
    if len(nz) and v[nz[0]] < 0:
        v = -v
    eig = float(v @ cov @ v)
    spark = embeddings.sparkSession
    out = pd.DataFrame(
        {
            "dim_index": np.arange(1, dim + 1),
            "loading": np.round(v, 6),
            "eigenvalue": np.round(np.full(dim, eig), 6),
        }
    )
    return spark.createDataFrame(out)


def recall_vs_nprobe(
    embeddings: DataFrame,
    n_clusters: int = 10,
    nprobes: tuple = (1, 2, 4, 8),
    k: int = 5,
    max_query_id: int = 100,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache_key: str | None = None,
) -> DataFrame:
    """The IVF recall/cost curve, oracle-checkable end to end: mean
    recall@k of trained-IVF search vs exact cosine top-k for several
    nprobe settings, over a fixed query sample.  This is the table an
    index operator reads to pick nprobe — and unlike the PQ recall audit
    (rows-only), every stage here (k-means, probe ranking, candidate
    topk, exact topk, agreement arithmetic) has an exact SQL twin.

    Shape: ONE candidate-scoring pass with the probe rank attached (a
    candidate pair exists iff the candidate's single home cluster is
    among the query's ranked probes, so no dedup is needed); each nprobe
    tier is a filter + window over that shared frame.  The exact side is
    the documented bounded audit cross-join: |queries| x corpus, the same
    shape as `ann_bruteforce_topk`.  Recall arithmetic is integer-exact
    (n_agree / (n_queries * k))."""
    centroids = _cached_kmeans(
        embeddings, n_clusters, iters, id_col, vec_col, cache_key
    )
    max_np = max(nprobes)
    v = _as_double(F.col(vec_col))
    queries = embeddings.filter(F.col(id_col) < max_query_id)
    qp = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.posexplode(_probe_clusters_udf(centroids, max_np)(v)).alias(
            "_p0", "cluster"
        ),
    ).select(
        "query_id", "qv", "cluster", (F.col("_p0") + 1).cast("int").alias("probe_rank")
    )
    cands = embeddings.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("cv"),
        F.element_at(_probe_clusters_udf(centroids, 1)(v), 1).alias("cluster"),
    )
    scored = (
        qp.join(cands, "cluster")
        .filter(F.col("query_id") != F.col("cand_id"))
        .select(
            "query_id",
            "cand_id",
            "probe_rank",
            cosine("qv", "cv").alias("cos"),
        )
        # materialize ONCE: each nprobe tier filters + windows this frame,
        # and without the checkpoint Spark re-executes the probe UDF +
        # cluster join + cosine per tier (4x the scoring work);
        # localCheckpoint (not persist) so the blocks are GC-reclaimed
        # with the result rather than pinned in the session cache
        .transform(pin)
    )
    ivf_parts = []
    for np_ in nprobes:
        w = Window.partitionBy("query_id").orderBy(
            F.col("cos").desc(), F.col("cand_id").asc()
        )
        ivf_parts.append(
            scored.filter(F.col("probe_rank") <= np_)
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= k)
            .select(F.lit(np_).cast("int").alias("nprobe"), "query_id", "cand_id")
        )
    ivf = ivf_parts[0]
    for p in ivf_parts[1:]:
        ivf = ivf.unionByName(p)

    ex = (
        broadcast(queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")))
        .crossJoin(embeddings.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cv")))
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", cosine("qv", "cv").alias("cos"))
    )
    wex = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("cand_id").asc()
    )
    exact = (
        ex.withColumn("rk", F.row_number().over(wex))
        .filter(F.col("rk") <= k)
        .select("query_id", "cand_id")
    )
    n_q = queries.count()
    agree = ivf.join(exact, ["query_id", "cand_id"]).groupBy("nprobe").agg(
        F.count(F.lit(1)).cast("long").alias("n_agree")
    )
    # LEFT-join agreement counts against the full requested tier list so a
    # tier with zero agreeing pairs reports recall=0 instead of vanishing
    # (the catalog oracle mirrors this with a VALUES left join).
    tiers = embeddings.sparkSession.createDataFrame(
        [(int(n),) for n in nprobes], "nprobe int"
    )
    full = broadcast(tiers).join(agree, "nprobe", "left").select(
        "nprobe", F.coalesce(F.col("n_agree"), F.lit(0)).cast("long").alias("n_agree")
    )
    return full.select(
        "nprobe",
        F.lit(n_q).cast("long").alias("n_queries"),
        F.lit(k).cast("int").alias("k"),
        "n_agree",
        F.round(
            F.col("n_agree").cast("double") / F.lit(float(n_q * k)), 6
        ).alias("recall"),
    )


def centroid_silhouette(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = 1_000_000,
) -> DataFrame:
    """Simplified silhouette (Hruschka et al.: centroid-based, the O(n*k)
    variant of the O(n^2) classic) per label: for each point, a = L2
    distance to its OWN label centroid, b = min distance to any OTHER
    centroid, s = (b - a)/max(a, b).  avg(s) near 1 = tight separated
    clusters; s < 0 = the point sits closer to a foreign centroid
    (misassigned).  The cluster-quality gate run after any
    labeling/clustering step, before the labels feed curation.

    Scale shape: centroids come from the posexplode hash-agg
    (`label_centroids`' plan) quantized to integer micro-units — the
    quantized k x dim table is tiny and broadcasts, so the scoring pass
    is scan + k-fan-out, no shuffle of vectors.  Cross-engine: distances
    fold left-to-right over the array (F.aggregate ≡ list_sum), inputs
    are the exact quantized centroids, and per-point s rounds at 6 dp
    before the DECIMAL group sum."""
    ex = embeddings.select(
        label_col, F.posexplode(_as_double(F.col(vec_col))).alias("pos", "val")
    )
    per_dim = ex.groupBy(label_col, "pos").agg(
        F.floor(F.avg("val") * scale + F.lit(0.5)).cast("long").alias("q")
    )
    cent = per_dim.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "q"))),
            lambda s: s.q.cast("double") / F.lit(float(scale)),
        ).alias("carr")
    ).select(F.col(label_col).alias("clab"), "carr")
    pts = embeddings.select(
        id_col,
        F.col(label_col).alias("own"),
        _as_double(F.col(vec_col)).alias("v"),
    )
    dist = F.sqrt(
        F.aggregate(
            F.zip_with("v", "carr", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    d = pts.crossJoin(broadcast(cent)).select(
        id_col, "own", "clab", dist.alias("dist")
    )
    pp = d.groupBy(id_col, "own").agg(
        F.min(F.when(F.col("clab") == F.col("own"), F.col("dist"))).alias("a"),
        F.min(F.when(F.col("clab") != F.col("own"), F.col("dist"))).alias("b"),
    )
    s = F.round(
        F.try_divide(F.col("b") - F.col("a"), F.greatest("a", "b")), 6
    )
    return (
        pp.select(F.col("own").alias(label_col), s.alias("sil"))
        .groupBy(label_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.round(
                F.sum(F.col("sil").cast("decimal(28,12)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_silhouette"),
            F.sum(F.when(F.col("sil") < 0, 1).otherwise(0))
            .cast("long")
            .alias("n_misassigned"),
        )
    )


def matryoshka_recall(
    embeddings: DataFrame,
    dims: tuple[int, ...] = (4, 8, 16),
    k: int = 10,
    n_queries: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Matryoshka-truncation quality curve: for each prefix dimension d,
    run exact cosine top-k with vectors TRUNCATED to their first d
    components and report the per-query overlap with the full-dimension
    top-k — the measurement that decides how short a nested
    (Matryoshka-style) embedding can be cut for cheap first-stage
    retrieval before full-dimension re-rank.

    Scale shape: ONE full-dimension `brute_force_topk` pass plus ONE
    fused queries x corpus pass that scores every truncation tier —
    each candidate row explodes into len(dims) (tier, cosine) rows and a
    single window over (dim, query_id) takes every tier's top-k in one
    shuffle (guide §1.2/§2.4: the per-tier form re-scanned the corpus
    and paid a window exchange per tier; the fused form moves the same
    bytes once).  Per-tier arithmetic is unchanged — each tier's score
    is the same `cosine(slice(v, 1, d), slice(v, 1, d))` left-to-right
    fold, so values are bit-identical to the per-tier passes.  recall =
    overlap/k is an exact integer ratio."""
    # one materialization, 2 readers per tier (overlap join + query
    # grid): without the checkpoint each tier re-runs the full-dimension
    # queries x corpus scoring DAG — same multi-reader pattern as the
    # incremental-CC base labeling
    full = (
        brute_force_topk(
            embeddings,
            embeddings.filter(F.col(id_col) < n_queries),
            k=k,
            id_col=id_col,
            vec_col=vec_col,
        )
        .select("query_id", "cand_id")
        # EAGER pin: the per-tier overlap joins and the query-grid join
        # consume this frame through independent BroadcastExchange
        # futures; lazily pinned they race and re-run the full-dimension
        # queries x corpus scoring DAG per future (qprofile r13).
        .transform(pin)
    )
    all_q = full.select("query_id").distinct()
    q = broadcast(
        embeddings.filter(F.col(id_col) < n_queries).select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
        )
    )
    c = _core_width(
        embeddings.select(
            F.col(id_col).alias("cand_id"), F.col(vec_col).alias("cand_vec")
        ),
        "cand_id",
    )
    # every tier's score in one corpus pass: per candidate row, an array
    # of (dim, cosine-over-prefix) structs — the cosine expression per
    # tier is IDENTICAL to slicing first and scoring full (same
    # left-to-right fold over the same d elements)
    tier_scores = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(d).cast("int").alias("dim"),
                    cosine(
                        f"slice(query_vec, 1, {d})",
                        f"slice(cand_vec, 1, {d})",
                    ).alias("cos_raw"),
                )
                for d in dims
            ]
        )
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("cand_id"))
        .select("query_id", "cand_id", tier_scores.alias("t"))
        .select(
            "query_id", "cand_id", F.col("t.dim").alias("dim"),
            F.col("t.cos_raw").alias("cos_raw"),
        )
    )
    w = Window.partitionBy("dim", "query_id").orderBy(
        F.col("cos_raw").desc(), F.col("cand_id").asc()
    )
    tier_topk = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("dim", "query_id", "cand_id")
    )
    hits = (
        tier_topk.join(full, ["query_id", "cand_id"])
        .groupBy("dim", "query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
    grid = all_q.crossJoin(
        F.broadcast(
            embeddings.sparkSession.range(1).select(
                F.explode(
                    F.array(*[F.lit(d).cast("int") for d in dims])
                ).alias("dim")
            )
        )
    )
    return grid.join(hits, ["dim", "query_id"], "left").select(
        "dim",
        "query_id",
        F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
        F.round(
            F.coalesce("n_overlap", F.lit(0)).cast("double") / F.lit(float(k)),
            6,
        ).alias("recall"),
    )
