"""Keyed partitioner with bit-exact parity to the reference (W9).

Semantics (reference src/helpers/partition.ts:3-17):
- partition_count == 1 -> 0 (fast path)
- key present          -> abs(int32_le(md5(key))) % partition_count
- key absent           -> uniform random partition

Golden vectors: keys `key-0`..`key-99` with count=10 must produce
`[6, 7, 4, 4, 9, 1, 8, 0, 6, 6, ...]` (test/unit/Partitioner.test.ts:19-27).

Two implementations:
- `partition_for_key`: driver-side scalar (ingest gateway path).
- `keyed_partition`: a Column expression built ONLY from JVM built-ins
  (md5 -> first 4 hex bytes reversed -> int32 -> abs -> pmod), so the hot
  ingest path stays inside whole-stage codegen — no Python UDF.
"""

from __future__ import annotations

import hashlib
import random
import struct

from pyspark.sql import Column
from pyspark.sql import functions as F


def partition_for_key(partition_count: int, partition_key: str | None) -> int:
    """Driver-side scalar partitioner, bit-exact with the reference."""
    if not partition_count:
        raise ValueError("partitionCount is falsey!")
    if partition_count == 1:
        return 0
    if partition_key:
        digest = hashlib.md5(partition_key.encode("utf-8")).digest()
        (int_hash,) = struct.unpack("<i", digest[:4])
        return abs(int_hash) % partition_count
    return random.randrange(partition_count)


def _int32_le_of_md5(key: Column) -> Column:
    """First 4 bytes of md5(key) read as a little-endian signed int32.

    md5() yields a hex string; byte i is hex chars [2i, 2i+2).  Reversing
    the first four bytes gives the LE reading; conv(hex,16,10) parses it as
    unsigned, and subtracting 2^32 when the sign bit is set recovers the
    signed value — all JVM-side built-ins, codegen-friendly.
    """
    h = F.md5(key)
    le_hex = F.concat(
        F.substring(h, 7, 2), F.substring(h, 5, 2), F.substring(h, 3, 2), F.substring(h, 1, 2)
    )
    unsigned = F.conv(le_hex, 16, 10).cast("long")
    return F.when(
        unsigned >= F.lit(2_147_483_648), unsigned - F.lit(4_294_967_296)
    ).otherwise(unsigned)


def keyed_partition(key: Column, partition_count: int) -> Column:
    """Column-expression partitioner: abs(int32_le(md5(key))) % count.

    NULL / empty keys fall back to a random partition (reference behavior
    for missing keys, src/helpers/partition.ts:14-16) via rand() — not
    deterministic, matching the reference.
    """
    if not partition_count:
        raise ValueError("partitionCount is falsey!")
    if partition_count == 1:
        return F.lit(0)
    hashed = F.abs(_int32_le_of_md5(key)) % F.lit(partition_count)
    random_part = F.floor(F.rand() * partition_count).cast("int")
    has_key = key.isNotNull() & (key != F.lit(""))
    return F.when(has_key, hashed.cast("int")).otherwise(random_part)
