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
