"""Skew-mitigation helpers: salted two-stage aggregation.

AQE's skew-join splitting handles joins; skewed *aggregation* keys (one
stream-partition carrying most of the traffic — the norm in pub-sub) still
funnel into a single reducer.  Salting splits each hot key across
`n_salts` reducers and merges the partials — the classic two-stage
pattern, wrapped so call sites stay declarative.

The merged result is identical to the unsalted aggregation for the
algebraic aggregates supported here (count / sum / min / max — their
partials compose); avg must be derived as sum/count by the caller.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: supported aggregate -> (stage-1 partial, stage-2 merge of the partial)
_MERGES = {
    "count": (lambda c: F.count(c), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "min": (lambda c: F.min(c), F.min),
    "max": (lambda c: F.max(c), F.max),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage aggregation: groupBy(keys + salt) partials, then
    groupBy(keys) merge.

    `aggs` maps output column name -> (agg_name, column), e.g.
    ``{"records": ("count", F.lit(1)), "bytes": ("sum", F.octet_length("content"))}``.

    Stage 1 spreads each key over `n_salts` reducers (uniform random salt —
    no key analysis needed); stage 2 merges n_salts partial rows per key,
    which is negligible.  Map-side partial aggregation still applies within
    each salt, so the total shuffled volume matches the unsalted plan.
    """
    for name, (kind, _) in aggs.items():
        if kind not in _MERGES:
            raise ValueError(f"unsupported agg '{kind}' for '{name}' (use {sorted(_MERGES)})")
    salt = F.floor(F.rand() * n_salts).cast("int").alias("_salt")
    stage1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(
        *[_MERGES[kind][0](col).alias(f"_p_{name}") for name, (kind, col) in aggs.items()]
    )
    return stage1.groupBy(*keys).agg(
        *[
            _MERGES[kind][1](F.col(f"_p_{name}")).alias(name)
            for name, (kind, _) in aggs.items()
        ]
    )
