"""Streaming deduplication — exactly-once ingestion for a 100 TB stream.

The batch dedup family (`operators/dedup.py`) answers "which documents in
this corpus are duplicates"; the streaming question is different: "this
event/document was RETRANSMITTED (at-least-once delivery, producer
retries) — emit it exactly once". The idiomatic Spark answer is
``dropDuplicatesWithinWatermark``: state is keyed by the dedup key and
EVICTED once the watermark passes, so state size is bounded by
(key cardinality within the watermark window), not by stream history —
the property that makes it run forever at scale. Plain streaming
``dropDuplicates`` without an event-time key would grow state without
bound; that is the trap this module exists to avoid.

The same function works on a batch DataFrame (watermark is a no-op
concept there) via ``dropDuplicates``, so batch==streaming parity is
testable (tests/test_streaming.py).

Reference tie-in: the reference's pipeline dedups ids within a bundle
(`dataflow/dataflow_transform.py:67-74`); retransmission-safe streaming
ingestion is its unbounded-input generalization.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_stream_exact(
    records: DataFrame,
    key_cols: Sequence[str] = ("event_id",),
    time_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Emit the first arrival per ``key_cols``; suppress re-deliveries that
    arrive within ``watermark`` of the first. Keys older than the watermark
    are forgotten (bounded state); a duplicate arriving later than the
    watermark window is emitted again — that is the documented
    at-most-once-per-window contract of watermarked dedup, and the
    watermark should be sized to the producer's maximum retry horizon.

    On a batch frame this is plain ``dropDuplicates`` over the keys (the
    whole input is one "window").
    """
    keys = list(key_cols)
    if records.isStreaming:
        return records.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
            keys
        )
    return records.dropDuplicates(keys)


def dedup_stream_content(
    docs: DataFrame,
    text_col: str = "text",
    time_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Content-keyed variant: exactly-once by md5(text) instead of an
    explicit id — the streaming twin of ``operators.dedup.exact_dup_pairs``
    keying. The hash column is computed map-side and dropped after the
    dedup, so only the 32-char key ever sits in the state store (not the
    document body)."""
    keyed = docs.withColumn("_content_k", F.md5(F.col(text_col)))
    out = dedup_stream_exact(
        keyed, key_cols=("_content_k",), time_col=time_col, watermark=watermark
    )
    return out.drop("_content_k")
