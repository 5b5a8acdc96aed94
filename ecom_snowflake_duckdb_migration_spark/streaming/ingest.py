"""Structured Streaming operators.

The reference is strictly micro-batch (SURVEY §2.9): a daily Airflow schedule
re-runs generate → ingest → transform. These operators are the streaming
re-expression of its two natural streaming analogues:
- the 30-day delta feed + PK upsert (S8,
  src/pipeline/ingest_latest_synthetic_data.py:536-575) →
  ``foreachBatch`` + delete+insert upsert;
- the event table grouped by day (ecom_marts/sales/fct_product_interactions.sql:6-14,
  fct_customer_activity.sql:9-24) → watermarked tumbling-window aggregation.

Scale notes: watermarks bound the state store (late events beyond the
watermark are dropped, state for closed windows is evicted); the windowed agg
shuffles once on (key, window); ``dropDuplicatesWithinWatermark`` is the
streaming equivalent of the ingest-side PK dedup (A11) with bounded state
(plain ``dropDuplicates`` would pin per-key state forever — see
``dedup_stream``). All aggregates here are incremental (count/sum/approx) — exact
COUNT(DISTINCT) is not incrementally computable with bounded state, so the
streaming variant substitutes ``approx_count_distinct`` (documented
divergence from the batch model; the batch path stays exact).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from ..sources.upsert import upsert_parquet


def read_event_stream(
    spark: SparkSession,
    source_dir: str,
    schema: StructType,
    format: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based event stream: each file dropped into ``source_dir`` is a
    micro-batch (the streaming version of the reference's daily S3 drop)."""
    reader = spark.readStream.format(format).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(source_dir)


def dedup_stream(df: DataFrame, keys: list[str], ts_col: str, lateness: str) -> DataFrame:
    """Streaming A11: drop duplicate keys within the watermark horizon.

    Uses ``dropDuplicatesWithinWatermark`` (Spark 3.5+), NOT plain
    ``dropDuplicates``: with a key set that excludes the event-time column,
    ``dropDuplicates`` retains per-key state FOREVER (the watermark evicts
    dedup state only when the event-time column is itself a dedup key) —
    an unbounded state store at 100 TB/day. The WithinWatermark variant
    evicts each key once the watermark passes its event time, giving the
    documented bounded-state contract; the semantic trade is that a
    duplicate arriving after the horizon is emitted again (exactly the
    at-least-once window every bounded exact-dedup must accept)."""
    return df.withWatermark(ts_col, lateness).dropDuplicatesWithinWatermark(keys)


def windowed_event_counts(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_size: str = "1 day",
    lateness: str = "1 hour",
    distinct_col: str | None = None,
) -> DataFrame:
    """Watermarked tumbling-window aggregation (the streaming
    fct_product_interactions): counts + sum per (window, key), with an
    optional approximate distinct over ``distinct_col``."""
    aggs = [
        F.count(F.lit(1)).alias("events"),
        F.sum("value").alias("total_value"),
    ]
    if distinct_col is not None:
        aggs.append(F.approx_count_distinct(distinct_col).alias("approx_distinct"))
    return (
        df.withWatermark(ts_col, lateness)
        .groupBy(F.window(ts_col, window_size).alias("w"), F.col(key_col))
        .agg(*aggs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            *[c for c in ("events", "total_value", "approx_distinct") if distinct_col or c != "approx_distinct"],
        )
    )


def upsert_stream_sink(
    df: DataFrame,
    target_path: str,
    keys: list[str],
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """S8 as a streaming sink: every micro-batch is delete+insert-upserted
    into the parquet target via foreachBatch (Delta MERGE drop-in at scale).
    Returns the started StreamingQuery."""

    def _apply(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        upsert_parquet(batch.sparkSession, target_path, batch, keys)

    writer = df.writeStream.foreachBatch(_apply).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def foreach_batch_pipeline(
    df: DataFrame,
    fn: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    trigger_available_now: bool = True,
):
    """Generic foreachBatch runner: apply any batch transform (e.g. a model
    layer refresh) per micro-batch — the reference's Airflow task body."""
    writer = df.writeStream.foreachBatch(fn).option("checkpointLocation", checkpoint_dir)
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
