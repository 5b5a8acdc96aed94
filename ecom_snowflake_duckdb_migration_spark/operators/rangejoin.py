"""Range join: points matched to enclosing [start, end] intervals.

Spark has no interval-join operator; the naive formulation is a theta
join, which Spark plans as a nested-loop — quadratic and unusable at
scale. This is the standard banding rewrite: both sides are bucketed into
fixed-width time bins (intervals explode into one row per bin they
overlap), the join becomes an EQUI join on (equi_keys..., bin), and the
exact range predicate filters the candidates. Each (point, interval)
candidate pair meets exactly once — the interval copy in the point's bin
is unique — so no dedup pass is needed.

Choosing ``bin_width``: fan-out per interval is ``len/width + 1`` and
candidate selectivity is ``width``-proportional; set it near the typical
interval length (intervals much longer than the width just replicate more;
much shorter, and bins admit more false candidates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    equi_keys: list[str] | None = None,
    bin_width_seconds: int = 86_400,
    how: str = "inner",
) -> DataFrame:
    """Join every point to the interval rows with
    ``start_ts <= point_ts <= end_ts`` (and equal ``equi_keys`` when
    given), via the banded equi-join. Returns points' columns + intervals'
    columns (equi keys deduplicated)."""
    keys = list(equi_keys or [])
    w = F.lit(bin_width_seconds)
    p = points.withColumn(
        "__bin", (F.unix_timestamp(F.col(point_ts)) / w).cast("long")
    ).alias("__p")
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_ts)) / w).cast("long"),
                (F.unix_timestamp(F.col(end_ts)) / w).cast("long"),
            )
        ),
    ).alias("__i")
    # The range predicate lives IN the join condition, not a post-join
    # filter: an outer join's NULL-extended rows would be discarded by any
    # later filter over interval columns, silently turning how="left" into
    # inner. Catalyst still extracts the equality conjuncts (keys + bin) as
    # hash-join keys; the range conjuncts evaluate per candidate pair.
    cond = F.col("__p.__bin") == F.col("__i.__bin")
    for k in keys:
        cond = cond & (F.col(f"__p.{k}") == F.col(f"__i.{k}"))
    cond = cond & (F.col(f"__p.{point_ts}") >= F.col(f"__i.{start_ts}"))
    cond = cond & (F.col(f"__p.{point_ts}") <= F.col(f"__i.{end_ts}"))
    joined = p.join(i, cond, how)
    out = [F.col(f"__p.{c}").alias(c) for c in points.columns] + [
        F.col(f"__i.{c}").alias(c) for c in intervals.columns if c not in set(keys)
    ]
    return joined.select(*out)
