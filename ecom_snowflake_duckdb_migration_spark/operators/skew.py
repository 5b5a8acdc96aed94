"""Explicit skew mitigation: salted joins and salted aggregations.

AQE's skew-join handling (on in the session factory) splits oversized
post-shuffle partitions automatically, but it only acts on sort-merge/hash
join stages it can measure. These operators are the explicit lever for the
cases AQE cannot fix: a pathologically hot GROUP BY key whose single
reducer becomes the straggler, and joins where the hot key's rows must be
spread BEFORE the shuffle.

Salting a decomposable computation never changes its result: aggregation
runs as partial-per-(key, salt) then merge-per-key, and a join replicates
the non-skewed side across all salt values so every (skewed-row, match)
pair still meets exactly once.

Scale notes: `salts` multiplies the replicated side's shuffle volume — use
just enough to flatten the hottest key (hot-row-count / target-partition
rows). The salt assignment uses a row-id hash, spreading even rows that
are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SALT = "__salt"

# (partial fn, merge fn) per decomposable aggregate
_DECOMPOSABLE = {
    "sum": (F.sum, F.sum),
    "count": (lambda c: F.count(c), F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def _with_salt(df: DataFrame, salts: int) -> DataFrame:
    # row-id hash, not rand(): deterministic under retries of the same
    # partition layout, and spreads bit-identical rows too.
    return df.withColumn(
        _SALT, F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salts))
    )


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: list[tuple[str, str, str]],
    salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation over hot keys: ``aggs`` is a list of
    ``(column, fn, alias)`` with fn in sum/count/min/max (the decomposable
    set). Phase 1 aggregates per (keys, salt) — the hot key's rows spread
    over ``salts`` reducers — phase 2 merges per keys."""
    partials = []
    merges = []
    for col, fn, alias in aggs:
        if fn not in _DECOMPOSABLE:
            raise ValueError(f"{fn} is not decomposable; salting would change it")
        part_fn, merge_fn = _DECOMPOSABLE[fn]
        tmp = f"__p_{alias}"
        partials.append(part_fn(F.col(col)).alias(tmp))
        merges.append(merge_fn(F.col(tmp)).alias(alias))
    return (
        _with_salt(df, salts)
        .groupBy(*keys, _SALT)
        .agg(*partials)
        .groupBy(*keys)
        .agg(*merges)
    )


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: list[str],
    how: str = "inner",
    salts: int = 16,
) -> DataFrame:
    """Join where ``skewed`` carries hot join keys: each skewed row gets one
    salt; ``other`` is replicated across all ``salts`` values, so the hot
    key's probe rows land on ``salts`` different reducers instead of one.
    Equi-join keys only (``on`` column names shared by both sides)."""
    s = _with_salt(skewed, salts)
    o = other.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)).cast("array<bigint>"))
    )
    return s.join(o, [*on, _SALT], how).drop(_SALT)
