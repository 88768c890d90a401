"""Multi-dimensional data layout: z-order (Morton) clustering keys.

The log layout in writer.py clusters one dimension (the composite ts/seq
key inside a (stream, partition, bucket) directory — mirroring the
reference's Cassandra clustering order, src/storage/Storage.ts:109-111).
Queries that slice on TWO dimensions at once (a user cohort over a time
range; a stream subset over a ts window) get pruning on only one of them
from any linear sort.  Z-ordering interleaves the bits of both dimensions
into one sort key, so files sorted by it are locality-preserving in BOTH:
every file touches a small rectangle of (x, y) space and parquet min/max
stats prune on either predicate.

Spark-first: the key is a pure column expression (shifts/masks folded by
codegen — no UDF), so "re-layout a table" is
``df.repartitionByRange(n, zorder_key(...)).sortWithinPartitions(...)``:
one range shuffle, the same cost as any global sort, after which both
dimensions prune.  This is the standard lakehouse OPTIMIZE ZORDER BY
design, expressed with nothing but built-ins.

At 100 TB: re-layout is the expensive, occasional job (one shuffle of the
table); the payoff is per-query — scans with predicates on either
dimension read O(selectivity) files instead of O(all).  `zorder_tiles`
is the cheap audit that proves the locality (per-tile bounding boxes are
tight after layout, arbitrary before).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(x: Column, y: Column, bits: int = 10) -> Column:
    """Interleave the low `bits` of two non-negative integer columns into
    a 2*bits Morton key: z = ... y1 x1 y0 x0.  Pure JVM bit arithmetic."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z.bitwiseOR(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
            .bitwiseOR(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        )
    return z


def zorder_key_sql(x: str, y: str, bits: int = 10) -> str:
    """The DuckDB-SQL mirror of `zorder_key` — generated from the same
    loop so both engines compute bit-identical keys."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def zorder_tiles(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 10,
    tile_shift: int = 8,
) -> DataFrame:
    """Layout audit: group rows by coarse z-tile (z >> tile_shift) and
    report each tile's population and (x, y) bounding box.  After a
    z-order re-layout each tile — i.e. each run of consecutive files —
    covers a tight rectangle, which is exactly what makes min/max
    pruning effective on both dimensions."""
    z = zorder_key(x, y, bits)
    return (
        df.select(
            F.shiftright(z, tile_shift).alias("tile"),
            x.alias("x"),
            y.alias("y"),
        )
        .groupBy("tile")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("x_min"),
            F.max("x").alias("x_max"),
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
        )
    )
