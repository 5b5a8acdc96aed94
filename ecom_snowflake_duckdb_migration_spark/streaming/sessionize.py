"""Session windows and custom stateful operators.

The reference's `interactions` table carries ``session_id`` precomputed by
its generator (src/pipeline/0_generate_historic_synthetic_data.py:242-272) —
a real engine must be able to DERIVE sessions from raw event times. Two
mechanisms:

- ``sessionize``: Spark-native ``session_window`` (gap-based merging) — the
  same expression works in batch and in Structured Streaming (with a
  watermark bounding state). Boundary semantics: windows are half-open
  ``[first_event, last_event + gap)``; an event exactly ``gap`` after the
  previous one starts a NEW session.
- ``running_counts_stateful``: an ``applyInPandasWithState`` custom stateful
  operator (arbitrary per-key state across micro-batches) for logic
  session_window cannot express — here the canonical running-aggregate
  shape: per-key totals that survive micro-batch boundaries.

Scale notes: session_window state is evicted once the watermark passes a
session's close; applyInPandasWithState state lives per key group in the
state store — keep keys bounded (users, not events) and set timeouts in
production jobs.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def sessionize(
    df: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_cols: list[str] | None = None,
    aggs: list[Column] | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """Gap-based session aggregation. Batch by default; pass ``watermark``
    when ``df`` is a stream (bounds session state)."""
    key_cols = key_cols or ["user_id"]
    if watermark is not None:
        df = df.withWatermark(ts_col, watermark)
    aggs = aggs or [
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("total_value"),
    ]
    agged = df.groupBy(F.session_window(ts_col, gap).alias("w"), *key_cols).agg(*aggs)
    # project the caller's actual agg output names, not a hardcoded tuple
    agg_names = [c for c in agged.columns if c != "w" and c not in key_cols]
    return agged.select(
        *key_cols,
        F.col("w.start").alias("session_start"),
        F.col("w.end").alias("session_end"),
        *agg_names,
    )


_COUNT_STATE_SCHEMA = StructType([StructField("total", LongType())])
_COUNT_OUT_SCHEMA = StructType(
    [StructField("key", StringType()), StructField("total", LongType())]
)


def running_counts_stateful(stream: DataFrame, key_col: str) -> DataFrame:
    """Custom stateful operator: per-key running event count across
    micro-batches via applyInPandasWithState. Emits the updated total for
    every key seen in each batch."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen = sum(len(pdf) for pdf in pdfs)
        (total,) = state.get if state.exists else (0,)
        total += seen
        state.update((total,))
        yield pd.DataFrame({"key": [str(key[0])], "total": [total]})

    return (
        stream.withColumn("key", F.col(key_col).cast("string"))
        .groupBy("key")
        .applyInPandasWithState(
            update,
            outputStructType=_COUNT_OUT_SCHEMA,
            stateStructType=_COUNT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
