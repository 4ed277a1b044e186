"""Sessionization — gap-based session windows over the events stream.

Batch and streaming share one implementation: Spark's native
``session_window(ts, gap)`` (dynamic, state-store-backed in streaming;
plain aggregation in batch). The DuckDB oracle expresses the same
semantics relationally (lag → gap flag → running sum → group), which
doubles as the spec: a session is a maximal run of events per user where
consecutive gaps are <= ``gap``.

For custom state beyond what session_window can express, the escape hatch
is ``applyInPandasWithState`` (streaming/stateful.py); prefer the native
operator — JVM state store, watermark-driven eviction, no Python workers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sessionize(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Per-user sessions: (user_id, session start/end, n_events,
    sum_value). Works on batch or streaming input (streaming needs the
    watermark so closed sessions can be finalized and state evicted)."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_start"
            ),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias(
                "session_end"
            ),
            "n_events",
            "sum_value",
        )
    )
