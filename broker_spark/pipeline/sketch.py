"""Count-min sketch: fixed-memory frequency estimation + exact-confirmed
heavy hitters.

Pattern (same as the Bloom decontamination operator in text.py): a sketch
whose size is INDEPENDENT of key cardinality prunes the candidate set, then
an exact pass over the survivors removes the sketch's one-sided error — so
the emitted result is EXACT and oracle-checkable, while the scale story
(bounded memory per executor, no giant exact group-by retained) is real.

At 100 TB: the sketch build is one groupBy over (depth x width) cells —
map-side partial aggregation compresses each input partition to at most
depth*width rows before the shuffle, so shuffle volume is O(partitions *
depth * width), not O(rows).  The estimate pass shuffles only DISTINCT keys
(orders of magnitude below event rows), and the exact confirm counts only
candidate keys via semi-join.

CMS guarantee: estimate >= true count (never under), so thresholding the
estimate has NO false negatives — the exact confirm can only shrink the
candidate set, never miss a true heavy hitter.  Property-tested in
tests/test_round4_ops.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

DEFAULT_DEPTH = 3
DEFAULT_WIDTH = 1024

# -- deterministic HyperLogLog ------------------------------------------------
#: 2^12 registers — ~1.6% standard error; register index = first 3 md5 hex
#: chars, rank input = the next 12 (48 bits).
HLL_P = 12
HLL_M = 1 << HLL_P
HLL_RANK_BITS = 48
#: rho ranges over [0, 49] (0 = empty register), so scaling the indicator
#: sum by 2^49 makes every term 2^(49 - rho) an exact BIGINT power of two.
HLL_SUM_SCALE = HLL_RANK_BITS + 1
#: alpha_m * m^2 * 2^49 for the raw estimate E = NUMERATOR / S where
#: S = sum_j 2^(49 - M_j) is held as an EXACT BIGINT (every term is an
#: integer power of two), so cross-engine float divergence is impossible
#: until the one final division.  Flajolet et al., "HyperLogLog" (2007).
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_RAW_NUMERATOR = HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_SUM_SCALE)
#: below 2.5m the raw estimator biases high -> linear counting on the
#: empty-register count.
HLL_SMALL_RANGE = 2.5 * HLL_M


def hll_register_rho(key: Column) -> tuple[Column, Column]:
    """(register, rho) for one key — the shared expression pair behind
    the batch AND streaming HLL paths (and the thing the DuckDB oracle
    replays verbatim): register = first 12 md5 bits, rank rho =
    leading-zeros-plus-one of the next 48.  bit_length(v) == length of
    the binary string with leading zeros dropped (conv base-2 drops
    them); rho = 48 - bit_length + 1."""
    h = F.md5(key.cast("string"))
    bucket = F.conv(F.substring(h, 1, 3), 16, 10).cast("int")
    vhex = F.substring(h, 4, 12)
    v = F.conv(vhex, 16, 10).cast("long")
    rho = F.when(v == 0, F.lit(HLL_RANK_BITS + 1)).otherwise(
        F.lit(HLL_RANK_BITS + 1) - F.length(F.conv(vhex, 16, 2))
    )
    return bucket, rho


def hll_register_maxes(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """Per (group, register): max rank.  This is THE data pass — one
    groupBy with map-side partial max, shuffle volume <= partitions x
    groups x m rows no matter how many input rows."""
    bucket, rho = hll_register_rho(F.col(key_col))
    return (
        df.select(*group_cols, bucket.alias("register"), rho.alias("rho"))
        .groupBy(*group_cols, "register")
        .agg(F.max("rho").cast("int").alias("m"))
    )


def hll_estimate_from_maxes(
    maxes: DataFrame, groups: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Finish the estimate from a (group, register, m) register table —
    shared by the batch path and the streaming replay (whose register
    maxes come out of a streaming aggregation's state store).  `groups`
    supplies the full group list so groups whose registers are all empty
    still estimate (as 0-ish via linear counting)."""
    spark = maxes.sparkSession
    grid = groups.crossJoin(
        broadcast(
            spark.range(HLL_M).select(F.col("id").cast("int").alias("register"))
        )
    )
    full = grid.join(maxes, [*group_cols, "register"], "left").withColumn(
        "m0", F.coalesce(F.col("m"), F.lit(0))
    )
    per_group = full.groupBy(*group_cols).agg(
        F.sum(F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLL_SUM_SCALE} - m0)"))
        .cast("long")
        .alias("power_sum"),
        F.sum(F.when(F.col("m0") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_empty_registers"),
    )
    raw = F.lit(HLL_RAW_NUMERATOR) / F.col("power_sum").cast("double")
    est = F.when(
        (raw <= F.lit(HLL_SMALL_RANGE)) & (F.col("n_empty_registers") > 0),
        F.lit(float(HLL_M))
        * F.log(F.lit(float(HLL_M)) / F.col("n_empty_registers").cast("double")),
    ).otherwise(raw)
    return per_group.select(
        *group_cols, "n_empty_registers", est.alias("hll_estimate")
    )


def hll_estimate(
    df: DataFrame, key_col: str, group_cols: list[str]
) -> DataFrame:
    """Deterministic HLL distinct estimate per group, value-reproducible
    across engines (same md5-derived registers, exact-integer power sum,
    one final division): group_cols..., n_empty_registers, hll_estimate.

    Empty registers contribute 2^49 to the sum (rho 0), so the full m-row
    register grid is materialized per group — a broadcast fan-out of
    m=4096 rows per group, trivial beside the data pass."""
    maxes = hll_register_maxes(df, key_col, group_cols)
    # every group with any key has >= 1 non-empty register (rho >= 1
    # always), so the group list is derivable from the metadata-sized
    # register table — no second scan of df
    return hll_estimate_from_maxes(
        maxes, maxes.select(*group_cols).distinct(), group_cols
    )


def _cms_cell(key: Column, row: int, width: int) -> Column:
    """Row `row`'s counter index for `key`: xxhash64 seeded by the row id
    (JVM-side, no UDF), folded into [0, width)."""
    return F.pmod(F.xxhash64(key, F.lit(row)), F.lit(width)).cast("int")


def cms_build(
    df: DataFrame, key_col: str, depth: int = DEFAULT_DEPTH, width: int = DEFAULT_WIDTH
) -> DataFrame:
    """Build the sketch as a (row, col, cnt) DataFrame of depth*width cells.

    posexplode fans each input row into `depth` cell hits; the groupBy's
    map-side combine collapses them before the single shuffle."""
    cells = F.array(*[_cms_cell(F.col(key_col), r, width) for r in range(depth)])
    return (
        df.select(F.posexplode(cells).alias("row", "col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimates(
    keys: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """Point-query the sketch for each key: min over the key's `depth`
    counters.  The sketch side is depth*width rows — broadcast it; the
    probe is then a map-side hash join, one shuffle on key for the min."""
    cells = F.array(*[_cms_cell(F.col(key_col), r, width) for r in range(depth)])
    probes = keys.select(key_col, F.posexplode(cells).alias("row", "col"))
    return (
        probes.join(broadcast(sketch), ["row", "col"])
        .groupBy(key_col)
        .agg(F.min("cnt").alias("cms_estimate"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = DEFAULT_DEPTH,
    width: int = DEFAULT_WIDTH,
) -> DataFrame:
    """EXACT heavy hitters (count >= threshold), CMS-pruned.

    1. sketch build: one bounded-size groupBy;
    2. candidates: distinct keys whose CMS estimate clears the threshold
       (superset of the truth — CMS never underestimates);
    3. exact confirm: count only rows belonging to candidate keys
       (broadcast semi-join), filter by the true count.
    """
    sketch = cms_build(df, key_col, depth, width)
    distinct_keys = df.select(key_col).distinct()
    candidates = cms_estimates(distinct_keys, sketch, key_col, depth, width).filter(
        F.col("cms_estimate") >= threshold
    )
    confirmed = (
        df.join(broadcast(candidates.select(key_col)), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n_events"))
        .filter(F.col("n_events") >= threshold)
    )
    return confirmed
