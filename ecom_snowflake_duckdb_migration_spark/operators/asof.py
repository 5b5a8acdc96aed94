"""As-of join: match each left row to the most recent right row at or
before its timestamp, per key — the standard event-enrichment join
(DuckDB/kdb `ASOF JOIN`; Spark has no built-in).

Implementation is the distributed union trick, NOT a per-key loop: tag
both inputs, union them, and take ``last_value(payload) IGNORE NULLS``
over (key) ordered by (ts, right-before-left-at-ties). One shuffle on the
key, one partition-local sort — the same cost envelope as any window over
the combined stream, so it scales exactly like the inputs.

Tie rule: a right row with ts equal to the left row's ts DOES match
(at-or-before), mirroring DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``.
Right-side (key, ts) duplicates should be pre-deduped by the caller to
make the payload deterministic (q57 keeps the max payload per instant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: str = "value",
    out_col: str | None = None,
) -> DataFrame:
    """LEFT as-of join: every left row, plus ``out_col`` = the payload of
    the latest right row with ``right_ts <= left_ts`` for the same key
    (NULL when no such row exists)."""
    out_col = out_col or f"asof_{payload}"
    left_cols = left.columns
    l = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__is_left", F.lit(1))
        .withColumn("__payload", F.lit(None).cast(right.schema[payload].dataType))
    )
    r = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.col(payload).alias("__payload"),
    )
    for c in left_cols:
        if c != key:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l.select(key, "__ts", "__is_left", "__payload", *[c for c in left_cols if c != key]).unionByName(
        r.select(key, "__ts", "__is_left", "__payload", *[c for c in left_cols if c != key])
    )
    # right rows sort BEFORE left rows at equal ts, so an equal-ts right row
    # is already visible to the left row's frame (at-or-before semantics)
    w = (
        Window.partitionBy(key)
        .orderBy(F.col("__ts"), F.col("__is_left"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("__match", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
        .select(*left_cols, F.col("__match").alias(out_col))
    )
