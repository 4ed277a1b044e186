"""Watermarked stream-stream join: view→purchase conversion attribution.

The canonical stream-stream pattern Spark supports natively: an INNER
join between two event streams on an equi-key plus an event-time range,
with BOTH sides watermarked so the join state is evictable. Here: a
purchase converts a view when the same user purchased within
``attribution_window`` AFTER the view.

State-bound reasoning (what makes this run forever at 100 TB/day):
- each side buffers only rows younger than (watermark + window) in state,
  keyed by user — eviction is driven by event time, not memory pressure;
- the time-range predicate is what LETS the engine derive those eviction
  bounds; an unconstrained stream-stream join would require unbounded
  state and Spark rejects it in append mode;
- output is append-mode: a match is emitted once, when the watermark
  proves no earlier-timestamped match can still arrive.

The builder is stream/batch agnostic (``withWatermark`` is a no-op on
batch inputs), so tests assert batch==streaming parity on the same
events file.

Reference tie-in: the reference is a daily batch DAG with no streaming
surface (`/root/reference/composer/sales_etl_dag.py:36-47`); this module
is part of the engine's Structured-Streaming extension alongside
sessionize/dedup_stream/stateful.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_conversions(
    views: DataFrame,
    purchases: DataFrame,
    attribution_window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """(user_id, view_id, purchase_id, lag_seconds) for every purchase
    within ``attribution_window`` after a view by the same user.
    Half-open: a purchase at exactly view_ts matches; at exactly
    view_ts + window it does not."""
    # Watermarks demand TIMESTAMP (ltz); parquet event time often arrives
    # NTZ. The session runs UTC, so the cast is value-preserving.
    views = views.withColumn("ts", F.col("ts").cast("timestamp"))
    purchases = purchases.withColumn("ts", F.col("ts").cast("timestamp"))
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    p = purchases.withWatermark("ts", watermark).select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    joined = v.join(
        p,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (
            F.col("purchase_ts")
            < F.col("view_ts") + F.expr(f"interval {attribution_window}")
        ),
    )
    return joined.select(
        "user_id",
        "view_id",
        "purchase_id",
        (
            F.unix_timestamp("purchase_ts") - F.unix_timestamp("view_ts")
        ).alias("lag_seconds"),
    )
