"""Table profiling: per-column completeness / cardinality / range audit.

The reference exposes per-bucket record/byte metadata as its operational
"what is in this store" surface (src/plugins/storage/Bucket.ts getters,
src/plugins/storage/BucketManager.ts bucket accounting); a training-data
pipeline needs the same answer per COLUMN before any filter/dedup stage —
null rates decide imputation vs drop, distinct counts decide broadcast
vs shuffle joins, min/max bounds feed partition-pruning predicates.

Spark-first: ONE aggregation pass computes every column's statistics
(count/nulls/distinct/min/max as native-type aggregates), then the single
result row is exploded into one row per column JVM-side — no per-column
scans, no collect.  Catalyst compiles the multi-distinct aggregate into a
single Expand + partial-agg plan, so the input is still read exactly once.

At 100 TB: the scan is the whole cost and it is one scan; the shuffle
carries only the expanded partial aggregates (rows x n_cols, with
map-side combine), and the explode runs on a 1-row frame.  Swap
`count_distinct` for `approx_count_distinct` when a 2% cardinality
estimate is acceptable and the Expand multiplier matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from broker_spark.pinning import pin, pin_lazy
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One row per column: n_rows, n_nulls, n_distinct (exact, nulls
    excluded), min/max rendered as strings (computed on the native type,
    cast after aggregation so numeric columns order numerically)."""
    cols = columns or df.columns
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"{c}__nulls"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
            F.min(F.col(c)).cast("string").alias(f"{c}__min"),
            F.max(F.col(c)).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column_name"),
                F.col("n_rows").alias("n_rows"),
                F.col(f"{c}__nulls").alias("n_nulls"),
                F.col(f"{c}__distinct").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_value"),
                F.col(f"{c}__max").alias("max_value"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(per_col).alias("r")).select("r.*")


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level reconciliation between two table snapshots: classify
    every key as added / removed / changed / unchanged — the primitive
    behind "what did this crawl refresh actually do to the corpus" and
    CDC-style snapshot auditing.

    Each side collapses its compare columns to ONE md5 fingerprint
    before the join, so the full-outer join shuffles keys + 32-byte
    hashes, never the payload — at 100 TB the diff moves fingerprint
    metadata, not documents.  The fingerprint is md5 of the row's JSON
    encoding (nulls kept): JSON escaping is injective, so NULL vs
    empty-string and separator-straddling values can never collide the
    way a plain delimiter concat would.  Returns key_cols +
    change_type."""
    def fp(df: DataFrame, alias: str) -> DataFrame:
        h = F.md5(
            F.to_json(
                F.struct(*[F.col(c) for c in compare_cols]),
                {"ignoreNullFields": "false"},
            )
        )
        return df.select(*key_cols, h.alias(alias))

    j = fp(old, "_h_old").join(fp(new, "_h_new"), key_cols, "full_outer")
    change = (
        F.when(F.col("_h_old").isNull(), "added")
        .when(F.col("_h_new").isNull(), "removed")
        .when(F.col("_h_old") != F.col("_h_new"), "changed")
        .otherwise("unchanged")
    )
    return j.select(*key_cols, change.alias("change_type"))


def table_fingerprint(
    df: DataFrame,
    group_col: str,
    id_col: str,
    content_col: str,
) -> DataFrame:
    """Order-independent integrity fingerprint per group + a grand-total
    row: n_rows and a commutative digest (SUM of the first 48 bits of
    each row's md5, exact in the DECIMAL domain).

    Addition is commutative and associative, so the digest is identical
    regardless of partitioning, task order, or merge tree — the property
    that lets two 100 TB replicas (or a table before/after a migration)
    be compared by shipping ONE row per group instead of re-sorting
    either side.  48 bits per row keeps the sum exact in DECIMAL(38,0)
    out to ~10^24 rows.  The id|content concat is injective because the
    id is numeric (cannot contain the separator), and it NULL-PROPAGATES
    (F.concat, not concat_ws): a NULL-content row hashes to NULL and is
    skipped by the SUM in BOTH engines identically — with concat_ws,
    Spark would hash md5(id) while a `||`-based oracle drops the row, a
    silent cross-engine divergence.  n_rows still counts every row, so
    a content column going NULL shows up as n_rows != digest coverage.
    Spark's ROLLUP produces the per-group rows and the grand total in
    one pass; the total row is labeled via GROUPING(), so a literal
    NULL group value surfaces as '(null)' instead of colliding with
    'ALL'."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit("|"),
                           F.col(content_col))),
            1,
            12,
        ),
        16,
        10,
    ).cast("decimal(38,0)")
    return (
        df.withColumn("_h", h)
        .rollup(group_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("_h").cast("decimal(38,0)").alias("digest"),
            F.grouping(group_col).alias("_g"),
        )
        .select(
            F.when(F.col("_g") == 1, F.lit("ALL"))
            .otherwise(F.coalesce(F.col(group_col), F.lit("(null)")))
            .alias(group_col),
            "n_rows",
            # string, not numeric: the digest exceeds float64's exact-
            # integer range, and any consumer that round-trips through
            # doubles (pandas, JSON) would corrupt it silently
            F.col("digest").cast("string").alias("digest"),
        )
    )


def key_skew_stats(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Shuffle-planning skew audit: for each candidate shuffle/join key,
    the key-frequency profile that decides whether that key needs
    salting or AQE skew handling — n_keys, max/avg per-key count, the
    skew factor (max_count / avg_count, i.e. how much the hottest
    partition-of-one-key exceeds the mean), and the hottest key itself.

    This is the measurement behind `salted_stream_totals`' design note:
    salting is only justified when skew_factor is large, and at 100 TB
    you cannot eyeball that — one per-key agg per candidate (map-side
    combined, output bounded by the key domain) answers it.  avg and the
    factor are exact BIGINT ratios, so both engines compute identical
    doubles.  The hottest key rides the same single agg via
    min_by(key, (-cnt, key)) — no second pass, no single-partition
    window over the key domain.  One row per audited key column."""
    parts = []
    for c in key_cols:
        per = df.groupBy(F.col(c).cast("string").alias("k")).agg(
            F.count(F.lit(1)).cast("long").alias("cnt")
        )
        # min_by on (-cnt, key): max count, then the SMALLEST key among
        # ties — deterministic without a second pass over `per`.
        parts.append(
            per.agg(
                F.lit(c).alias("key_col"),
                F.sum("cnt").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.max("cnt").cast("long").alias("max_count"),
                F.min_by("k", F.struct(-F.col("cnt"), F.col("k"))).alias(
                    "top_key"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "key_col",
        "n_rows",
        "n_keys",
        "max_count",
        F.round(
            F.col("n_rows").cast("double") / F.col("n_keys").cast("double"), 6
        ).alias("avg_count"),
        F.round(
            (F.col("max_count") * F.col("n_keys")).cast("double")
            / F.col("n_rows").cast("double"),
            6,
        ).alias("skew_factor"),
        "top_key",
    )


def referential_integrity(
    child: DataFrame,
    parent: DataFrame,
    fk_col: str,
    pk_col: str,
    relationship: str,
) -> DataFrame:
    """One relationship's referential-integrity audit row: child row
    count, distinct FK values, orphaned rows (FK with no matching PK —
    NULL FKs count as orphans: a fact row that cannot join its dimension
    is broken regardless of why).

    The orphan probe is a LEFT ANTI join on the key — at 100 TB that is
    one shuffle of (fk) against the parent's (pk), with the child side
    pre-collapsed to distinct keys + counts so the join moves the KEY
    DOMAIN, not the fact table.  Run before any join-heavy pipeline:
    silent FK rot turns inner joins into row loss."""
    per_fk = child.groupBy(F.col(fk_col).alias("_fk")).agg(
        F.count(F.lit(1)).cast("long").alias("_n")
    )
    orphan_keys = per_fk.join(
        parent.select(F.col(pk_col).alias("_fk")).distinct(), "_fk", "left_anti"
    )
    tot = per_fk.agg(
        # coalesce like the orphan sum below: an empty child must audit
        # as n_rows=0, not NULL
        F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    orph = orphan_keys.agg(
        F.coalesce(F.sum("_n"), F.lit(0)).cast("long").alias("n_orphan_rows"),
        F.count(F.lit(1)).cast("long").alias("n_orphan_keys"),
    )
    return tot.crossJoin(orph).select(
        F.lit(relationship).alias("relationship"),
        "n_rows",
        "n_keys",
        "n_orphan_rows",
        "n_orphan_keys",
    )


def layout_pruning_benefit(
    events: DataFrame,
    rows_per_file: int = 250,
    probe_mod: int = 10,
) -> DataFrame:
    """Measured data-layout payoff: simulate writing the events table in
    two physical orders — ARRIVAL (event_id) vs CLUSTERED (user_id, ts)
    — into fixed-size files, then count how many files a min/max-pruned
    reader must scan for a set of per-user probes.  The number the
    zorder/compaction entries' design arguments turn into: clustering
    pays exactly (scan_fraction_arrival / scan_fraction_clustered).

    Everything is exact and engine-parity-safe: file ids come from a
    deterministic total order (tie-broken by event_id), pruning is an
    integer [min,max] containment test, fractions are single integer
    divisions.  At 100 TB rows_per_file becomes the real file size and
    the same query audits the actual manifest instead of a simulation.

    The global rank is DISTRIBUTED, not a corpus-wide single-task
    window: range-repartition on the order key, row_number within each
    range partition, plus broadcast cumulative partition offsets — the
    standard two-pass exact ranking.  The result is the same global
    rank whatever boundaries the range sampler picks.

    The per-layout scalars are hoisted OUT of the branches (guide §1.2 /
    §2.4): rank is a permutation of 1..n, so every layout's file ids are
    exactly 0..(n-1) DIV rows_per_file — n_files = (n-1) DIV rows_per_file
    + 1 needs ONE count of the input, not a per-layout aggregate over the
    manifest; n_probes is likewise one count of the shared probe frame.
    That leaves `files` with a SINGLE reader (the pruning crossJoin), so
    the per-branch eager checkpoint — a separate job per layout whose
    only purpose was to serve n_files and the crossJoin without
    re-ranking — is gone, and each branch runs as one uninterrupted
    query (r13 qprofile: the entry's job count was dominated by these
    scalar-future jobs).
    """
    probes = (
        events.select((F.col("user_id") % probe_mod == 0).alias("p"), "user_id")
        .filter("p")
        .select("user_id")
        .distinct()
        # EAGER pin: read twice (each branch's pruning crossJoin arrives
        # as an independent broadcast-build job that would re-scan
        # events) plus the one driver-side n_probes count below.
        .transform(pin)
    )
    n_rows = events.count()
    n_files_lit = (n_rows - 1) // int(rows_per_file) + 1 if n_rows else 0
    n_probes_lit = probes.count()

    def _ranked(order):
        part = (
            events.select("event_id", "user_id", "ts")
            .repartitionByRange(32, *order)
            .withColumn("pid", F.spark_partition_id())
        )
        w_local = Window.partitionBy("pid").orderBy(*order)
        # materialize ONCE: the offsets pass and the join pass must see
        # the same range boundaries — the range partitioner samples per
        # execution, so two lazy executions could disagree on pid
        # assignment and corrupt the reconstructed global rank
        t = part.withColumn("rn_local", F.row_number().over(w_local)).transform(pin_lazy)
        counts = t.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
        w_off = Window.orderBy("pid").rowsBetween(
            Window.unboundedPreceding, -1
        )  # tiny frame: one row per partition
        offsets = counts.withColumn(
            "offset", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
        ).select("pid", "offset")
        return t.join(broadcast(offsets), "pid").withColumn(
            "rn", F.col("rn_local") + F.col("offset")
        )

    out = None
    for layout, order in (
        ("arrival", [F.col("event_id")]),
        ("clustered", [F.col("user_id"), F.col("ts"), F.col("event_id")]),
    ):
        files = (
            _ranked(order)
            .withColumn(
                # Integer DIV, not double /: double quotients leave the
                # exact domain once rn > ~2^52/rows_per_file, silently
                # breaking parity with the oracle's `//` (ADVICE r6).
                "file_id", F.expr(f"(rn - 1) DIV {int(rows_per_file)}")
            )
            .groupBy("file_id")
            .agg(
                F.min("user_id").alias("u_min"),
                F.max("user_id").alias("u_max"),
            )
            # single reader (the pruning crossJoin below) — no pin: the
            # two-pass rank executes exactly once inside that reader's
            # own query (n_files/n_probes are driver-side literals now)
        )
        row = (
            files.crossJoin(broadcast(probes))
            .filter(
                (F.col("user_id") >= F.col("u_min"))
                & (F.col("user_id") <= F.col("u_max"))
            )
            .agg(F.count(F.lit(1)).cast("long").alias("files_scanned"))
            .select(
                F.lit(layout).alias("layout"),
                F.lit(n_files_lit).cast("long").alias("n_files"),
                F.lit(n_probes_lit).cast("long").alias("n_probes"),
                "files_scanned",
                F.round(
                    F.col("files_scanned").cast("double")
                    / F.lit(n_files_lit * n_probes_lit).cast("double"),
                    6,
                ).alias("scan_fraction"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out


def k_anonymity_audit(
    events: DataFrame, k_threshold: int = 5, hour_bucket: int = 4
) -> DataFrame:
    """k-anonymity audit over the release-shaped quasi-identifier cells
    (event_type, day-of-week, 4-hour bucket): k = DISTINCT users per
    cell.  A cell with k below the threshold re-identifies its users if
    the table is released grouped by those attributes — the standard
    pre-release privacy gate that complements the PII redaction entry
    (redaction hides values; k-anonymity catches identifying
    COMBINATIONS).  One hash aggregation; suppress = the action bit."""
    dow = F.pmod(
        F.floor(F.unix_millis("ts") / F.lit(86_400_000)), F.lit(7)
    ).cast("int")
    h4 = F.expr(
        f"CAST((unix_millis(ts) % 86400000) DIV {hour_bucket * 3_600_000} AS INT)"
    )
    return (
        events.select(
            "event_type", dow.alias("dow"), h4.alias("hour_bucket"), "user_id"
        )
        .groupBy("event_type", "dow", "hour_bucket")
        .agg(
            F.count_distinct("user_id").cast("long").alias("k_users"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
        )
        .withColumn("suppress", F.col("k_users") < k_threshold)
    )


def layout_pruning_multidim(
    events: DataFrame, rows_per_file: int = 250
) -> DataFrame:
    """The two-dimensional sequel to `layout_pruning_benefit`: THREE
    physical orders — user-clustered, time-clustered, and Z-ORDER
    (Morton interleave of user and hour buckets) — measured against TWO
    probe workloads (per-user equality scans, per-day time-range scans)
    over simulated fixed-size file manifests with min/max stats on both
    columns.

    The number every lakehouse OPTIMIZE decision needs: a linear sort
    prunes ONE dimension perfectly and the other not at all; z-order
    pays a little on each to serve both.  Same distributed two-pass
    rank as `layout_pruning_benefit`; the Morton key is the pure-column
    `storage.layout.zorder_key` (bit-identical SQL mirror).

    Branch shape (guide §1.2/§2.4, r13): the three per-layout scalars
    (n_files, np_u, np_t) come from ONE aggregation over the pinned base
    — rank is a permutation of 1..n, so n_files = (n-1) DIV rows_per_file
    + 1 for every layout — and the two probe workloads are fused into a
    single crossJoin against a kind-tagged probe frame under a unified
    half-open interval test (for integers, u_min <= p <= u_max is
    exactly fmin < p+1 AND fmax >= p, the same shape as the day-range
    overlap).  `files` then has a single reader, so the per-layout eager
    checkpoint and the six per-layout scalar broadcast futures are gone:
    each layout branch is one uninterrupted query."""
    from broker_spark.storage.layout import zorder_key

    t_ms = F.unix_millis("ts")
    base = (
        events.select(
            "event_id",
            "user_id",
            t_ms.alias("t_ms"),
            # 8-bit bucket domains ALIGNED on both axes (user % 256,
            # 4-hour buckets 0..185): interleaving degenerates toward the
            # wider axis when one domain under-fills its bits — measured:
            # 10-bit user/hour keys gave 62%/19% scan fractions, the
            # aligned 8-bit keys give the balanced ~31%/36%
            F.pmod(F.col("user_id"), F.lit(256)).cast("long").alias("ux"),
            F.expr("CAST((unix_millis(ts) % 2678400000) DIV 14400000 AS BIGINT)")
            .alias("tx"),
        )
        .withColumn("zkey", zorder_key(F.col("ux"), F.col("tx"), 8))
        # EAGER pin (guide §2.4/§5): base has FIVE independent readers —
        # the two probe frames arrive at the branch aggregates as
        # BroadcastExchange futures, and each layout branch's
        # repartitionByRange map stage is a separate query stage.  None
        # of those stages depends on another, so under a lazy checkpoint
        # they launch concurrently and EACH recomputes the events
        # projection before any of them lands the cached blocks (measured
        # via tools/qprofile.py job attribution, r13).  Eager = one
        # materialization, every reader hits the checkpoint.
        .transform(pin)
    )
    day_ms = 86_400_000
    # ONE scalar pass over the pinned base replaces the per-layout
    # n_files aggregate and the per-layout np_u/np_t broadcast futures:
    # np_u/np_t are the probe-frame cardinalities (count of distinct
    # non-null values == count of the distinct probe rows), n_files is
    # the permutation identity above.
    _n, np_u, np_t = (
        base.agg(
            F.count(F.lit(1)),
            F.count_distinct(
                F.when(F.col("user_id") % 10 == 0, F.col("user_id"))
            ),
            F.count_distinct(
                F.floor(F.col("t_ms") / F.lit(day_ms)).cast("long")
            ),
        )
        .collect()[0]
    )
    n_files_lit = (_n - 1) // int(rows_per_file) + 1 if _n else 0
    # kind-tagged probe frame: each probe is the half-open interval
    # [plo, phi) its workload scans — a user equality probe is
    # [user_id, user_id + 1), a day probe is [day*ms, (day+1)*ms) — and
    # each file row is tested against the axis its kind names.
    probes_u = (
        base.select("user_id")
        .filter(F.col("user_id") % 10 == 0)
        .distinct()
        .select(
            F.lit("u").alias("kind"),
            F.col("user_id").alias("plo"),
            (F.col("user_id") + F.lit(1)).alias("phi"),
        )
    )
    probes_t = (
        base.select(
            F.floor(F.col("t_ms") / F.lit(day_ms)).cast("long").alias("pday")
        )
        .distinct()
        .select(
            F.lit("t").alias("kind"),
            (F.col("pday") * F.lit(day_ms)).alias("plo"),
            ((F.col("pday") + F.lit(1)) * F.lit(day_ms)).alias("phi"),
        )
    )
    probes = probes_u.unionByName(probes_t)

    def _ranked(order):
        part = base.repartitionByRange(32, *order).withColumn(
            "pid", F.spark_partition_id()
        )
        w_local = Window.partitionBy("pid").orderBy(*order)
        t = part.withColumn("rn_local", F.row_number().over(w_local)).transform(pin_lazy)
        counts = t.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
        w_off = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
        offsets = counts.withColumn(
            "offset", F.coalesce(F.sum("cnt").over(w_off), F.lit(0))
        ).select("pid", "offset")
        return t.join(broadcast(offsets), "pid").withColumn(
            "rn", F.col("rn_local") + F.col("offset")
        )

    out = None
    for layout, order in (
        ("by_user", [F.col("user_id"), F.col("t_ms"), F.col("event_id")]),
        ("by_time", [F.col("t_ms"), F.col("event_id")]),
        ("zorder", [F.col("zkey"), F.col("event_id")]),
    ):
        files = (
            _ranked(order)
            .withColumn(
                # Integer DIV, not double /: double quotients leave the
                # exact domain once rn > ~2^52/rows_per_file, silently
                # breaking parity with the oracle's `//` (ADVICE r6).
                "file_id", F.expr(f"(rn - 1) DIV {int(rows_per_file)}")
            )
            .groupBy("file_id")
            .agg(
                F.min("user_id").alias("u_min"),
                F.max("user_id").alias("u_max"),
                F.min("t_ms").alias("t_min"),
                F.max("t_ms").alias("t_max"),
            )
            # single reader (the fused pruning crossJoin below) — no
            # pin: the two-pass rank executes exactly once inside that
            # reader's own query
        )
        fmin = F.when(F.col("kind") == "u", F.col("u_min")).otherwise(
            F.col("t_min")
        )
        fmax = F.when(F.col("kind") == "u", F.col("u_max")).otherwise(
            F.col("t_max")
        )
        row = (
            files.crossJoin(broadcast(probes))
            .filter((fmin < F.col("phi")) & (fmax >= F.col("plo")))
            .agg(
                F.count(F.when(F.col("kind") == "u", 1))
                .cast("long")
                .alias("s_user"),
                F.count(F.when(F.col("kind") == "t", 1))
                .cast("long")
                .alias("s_time"),
            )
            .select(
                F.lit(layout).alias("layout"),
                F.lit(n_files_lit).cast("long").alias("n_files"),
                F.round(
                    F.col("s_user").cast("double")
                    / F.lit(n_files_lit * np_u).cast("double"),
                    6,
                ).alias("user_scan_fraction"),
                F.round(
                    F.col("s_time").cast("double")
                    / F.lit(n_files_lit * np_t).cast("double"),
                    6,
                ).alias("time_scan_fraction"),
            )
        )
        out = row if out is None else out.unionByName(row)
    return out
