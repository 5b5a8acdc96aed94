"""Data-layout optimization: Z-order (Morton) clustering for multi-dim pruning.

The 100 TB problem: parquet row-group min/max stats prune scans only along
the sort order. A table range-sorted by `user_id` answers user filters with
few row groups but scans everything for a `ts` filter. Z-ordering interleaves
the bits of several columns into one key and range-clusters by it, so row
groups become axis-aligned hyper-rectangles: a predicate on ANY of the
z-columns admits only ~n^((d-1)/d) of the row groups instead of all of them.
This is the layout behind Delta/Iceberg OPTIMIZE ZORDER, built here from
Spark primitives: compute key -> repartitionByRange -> sortWithinPartitions
-> write (one range shuffle, the same cost as any global sort write).

Bit interleaving uses the classic magic-number spread (4 mask-shift steps
for 16->32 bits) — pure integer &, |, << that DuckDB evaluates identically,
so z-keys are oracle-checkable like every other operator here.

Column domains are first rank-normalized to [0, 2^bits) by the caller or
via :func:`quantize_minmax` (linear min-max quantization — adequate for
near-uniform keys; heavily skewed columns should be pre-ranked, e.g.
``percent_rank`` — noted per the published guidance on z-value skew).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (mask, shift) steps spreading the low 16 bits of a long so one empty bit
# separates each data bit: after the pipeline, bit i sits at position 2i.
_SPREAD16 = (
    (0x00FF00FF, 8),
    (0x0F0F0F0F, 4),
    (0x33333333, 2),
    (0x55555555, 1),
)


def spread16_sql(expr: str) -> str:
    """Engine-neutral SQL for the 16-bit Morton spread of ``expr``.

    Emits only `&`, `|`, `<<` on BIGINT — valid Spark SQL and DuckDB SQL.
    """
    x = f"(CAST({expr} AS BIGINT) & 65535)"
    for mask, shift in _SPREAD16:
        x = f"((({x} | ({x} << {shift}))) & {mask})"
    return x


def zorder_key_sql(a_expr: str, b_expr: str) -> str:
    """SQL for the 32-bit Morton key of two 16-bit quantized columns."""
    return f"({spread16_sql(a_expr)} | ({spread16_sql(b_expr)} << 1))"


def quantize_minmax_sql(
    expr: str, lo: str | int, hi: str | int, bits: int = 16, div_op: str = "DIV"
) -> str:
    """Linear quantization of an integer column to [0, 2^bits); SQL text.

    Integer arithmetic only (scaled multiply + integer divide), so both
    engines agree exactly. ``lo``/``hi`` may be SQL expressions (e.g. a
    min/max CTE's columns) so the range never needs hard-coding per scale
    factor. ``div_op``: Spark spells integer division ``DIV``, DuckDB
    ``//`` — the one dialect difference in the whole pipeline.
    """
    buckets = 1 << bits
    return (
        f"(CASE WHEN ({hi}) <= ({lo}) THEN 0 ELSE "
        f"((CAST({expr} AS BIGINT) - ({lo})) * {buckets}"
        f" {div_op} (({hi}) - ({lo}) + 1)) END)"
    )


def zorder_key(a_expr: str, b_expr: str) -> Column:
    """Morton key Column of two already-quantized (16-bit) SQL expressions.

    Takes SQL fragments rather than Columns: the spread pipeline needs
    variable shift amounts, which the Column API's ``shiftleft`` does not
    accept — the expr form keeps the whole key inside one codegen'd
    projection either way.
    """
    return F.expr(zorder_key_sql(a_expr, b_expr))


def cluster_by_zorder(
    df: DataFrame,
    a_expr: str,
    b_expr: str,
    a_range: tuple[int, int],
    b_range: tuple[int, int],
    num_partitions: int,
) -> DataFrame:
    """Cluster rows by the z-key of two integer columns.

    One range shuffle on the computed key + in-partition sort; drop the key
    before handing to a writer. At 1000 executors the range partitioner
    samples the key like any repartitionByRange — no driver bottleneck.
    """
    qa = quantize_minmax_sql(a_expr, a_range[0], a_range[1])
    qb = quantize_minmax_sql(b_expr, b_range[0], b_range[1])
    keyed = df.withColumn("_zkey", F.expr(zorder_key_sql(qa, qb)))
    return (
        keyed.repartitionByRange(num_partitions, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )


def rowgroups_admitting(parquet_path: str, column: str, lo, hi) -> tuple[int, int]:
    """(admitting, total) row groups for a [lo, hi] predicate, from footer
    min/max stats — the same decision a scan's row-group pruning makes.
    Used by tests/benchmarks to quantify a layout's pruning power without
    timing noise."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = (
        [parquet_path]
        if os.path.isfile(parquet_path)
        else sorted(
            glob.glob(os.path.join(parquet_path, "*.parquet"))
            + glob.glob(os.path.join(parquet_path, "**", "*.parquet"))
        )
    )
    admit = total = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[column]
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            total += 1
            if st is None or st.min is None:
                admit += 1
            elif not (st.max < lo or st.min > hi):
                admit += 1
    return admit, total
