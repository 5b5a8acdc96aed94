"""Streaming joins: stream-stream interval join and stream-static enrichment.

The attribution building block a 100 TB event pipeline needs: join each
purchase to the clicks the same user made within a preceding window,
continuously, with bounded state.

Scale posture (the two things that make this survive at scale):
- **Watermarks bound the state.** Both sides carry a watermark; the join
  condition's time interval tells Spark exactly how long a row can still
  find a partner, so click/purchase state is evicted the moment the
  watermark passes `ts + window + lateness`. Without the interval bound a
  stream-stream inner join would buffer forever.
- **The join is a key-partitioned symmetric hash join**: both sides shuffle
  on `user_id`, so state and matching are local per partition — the same
  horizontal-scaling story as every batch join here.

Stream-static: the static side is re-read per micro-batch (dims change
between batches are picked up) and joined with the usual batch planner —
broadcast under the size gates, no state at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_purchases_to_clicks(
    clicks: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "30 minutes",
    lateness: str = "10 minutes",
) -> DataFrame:
    """Stream-stream interval join: purchases ⋈ same-user clicks that
    happened in [purchase_ts - window, purchase_ts].

    Inputs are streaming DataFrames with ``user_id``, ``event_id``, ``ts``.
    Output: one row per (purchase, matching click) with the click->purchase
    latency in seconds — the raw material for last-touch or multi-touch
    attribution downstream.
    """
    c = (
        clicks.withWatermark("ts", lateness)
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
    )
    p = (
        purchases.withWatermark("ts", lateness)
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
            F.col("value").alias("purchase_value"),
        )
    )
    return p.join(
        c,
        F.expr(
            f"""
            p_user_id = c_user_id AND
            click_ts <= purchase_ts AND
            click_ts >= purchase_ts - INTERVAL {attribution_window}
            """
        ),
        "inner",
    ).select(
        F.col("p_user_id").alias("user_id"),
        "purchase_id",
        "click_id",
        "purchase_ts",
        "click_ts",
        "purchase_value",
        (F.unix_timestamp("purchase_ts") - F.unix_timestamp("click_ts")).alias(
            "latency_s"
        ),
    )


def enrich_stream_with_dim(
    stream: DataFrame, dim: DataFrame, stream_key: str, dim_key: str
) -> DataFrame:
    """Stream-static LEFT join: per-micro-batch dimension enrichment.

    The static side goes through the normal batch planner every trigger
    (broadcast under the session threshold), so dim updates between batches
    are visible and no streaming state is kept.
    """
    return stream.join(dim, stream[stream_key] == dim[dim_key], "left")
