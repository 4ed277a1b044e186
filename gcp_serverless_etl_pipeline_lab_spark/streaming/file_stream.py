"""S4 (streaming form) — file-arrival micro-batch via Structured Streaming.

The reference's daily-scheduled sensor + non-overlapping runs
(`composer/sales_etl_dag.py:36-48`, ``max_active_runs=1``) is a
file-arrival micro-batch pattern; the idiomatic Spark equivalent is a file
source with ``trigger(availableNow=True)`` — one implementation of the
transform, two triggers (SURVEY.md §2.9).

Also provides the watermarked tumbling-window aggregate over the ``events``
table, the canonical stateful-streaming operator a 100 TB pipeline needs
(late data bounded by the watermark, state keyed by window × event_type).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..operators.transform import finalize_clean, finalize_errors
from ..operators.validate import annotate
from ..sources.text_csv import LINE_ID_COL

RAW_LINE_SCHEMA = T.StructType([T.StructField("value", T.StringType())])


def run_available_now(
    spark: SparkSession,
    input_dir: str,
    warehouse_path: str,
    dead_letter_path: str,
    checkpoint_dir: str,
) -> None:
    """Watch ``input_dir`` for text files, run the sales-ETL transform on
    whatever has arrived, then stop (availableNow). Re-running picks up only
    new files via the checkpoint — the exactly-once version of the
    reference's daily sensor loop.

    END-TO-END exactly-once, not just source-side: each micro-batch writes
    to its own ``epoch=<id>`` directory with overwrite semantics. A plain
    ``mode("append")`` sink is only at-least-once — a crash between the
    append and the checkpoint commit replays the batch on restart and
    duplicates its rows — while epoch_id is stable across replays
    (foreachBatch contract), so re-running the same batch overwrites the
    same directory instead of appending a second copy. Readers see the
    epoch as an ordinary partition column via directory discovery.

    Streaming caveat: a per-micro-batch monotonic id stands in for global
    file order, so first-wins dedup is deterministic within a micro-batch
    (matching the reference's bundle-local semantics,
    `dataflow/dataflow_transform.py:67-74`).
    """

    def process_batch(batch_df: DataFrame, epoch_id: int) -> None:
        raw = batch_df.withColumn(LINE_ID_COL, F.monotonically_increasing_id())
        annotated = annotate(raw).persist()
        finalize_clean(annotated).write.mode("overwrite").parquet(
            f"{warehouse_path}/epoch={epoch_id}"
        )
        finalize_errors(annotated).write.mode("overwrite").json(
            f"{dead_letter_path}/epoch={epoch_id}"
        )
        annotated.unpersist()

    stream = spark.readStream.format("text").schema(RAW_LINE_SCHEMA).load(input_dir)
    (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window count/sum per event_type with a watermark bound on
    late data. Works on both a streaming and a batch ``events`` DataFrame
    (batch ignores the watermark) — the same plan the oracle checks."""
    df = events
    if df.isStreaming:
        df = df.withWatermark("ts", watermark)
    return (
        df.groupBy(F.window("ts", window_duration).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )
