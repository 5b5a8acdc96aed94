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
    w = F.lit(bin_width_seconds)
    p = points.withColumn(
        "__bin", (F.unix_timestamp(F.col(point_ts)) / w).cast("long")
    )
    i = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start_ts)) / w).cast("long"),
                (F.unix_timestamp(F.col(end_ts)) / w).cast("long"),
            )
        ),
    )
    on = [*(equi_keys or []), "__bin"]
    joined = p.join(i, on, how).filter(
        (F.col(point_ts) >= F.col(start_ts)) & (F.col(point_ts) <= F.col(end_ts))
    )
    return joined.drop("__bin")
