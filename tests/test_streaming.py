"""Structured Streaming tests: availableNow ETL micro-batch (the S4 sensor
equivalent), streaming==batch parity for windowed aggregates and
sessionization, and the spark.sql surface."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from conftest import SF_SMOKE
from gcp_serverless_etl_pipeline_lab_spark.sources.tables import load_table, register_views
from gcp_serverless_etl_pipeline_lab_spark.streaming.file_stream import (
    run_available_now,
    windowed_event_counts,
)
from gcp_serverless_etl_pipeline_lab_spark.streaming.sessionize import sessionize

FILE1 = """id,product,price,quantity,sale_date
1,Widget,9.99,2,2024-01-05
2,Gadget,twenty,1,2024-01-06
3,Gizmo,5.00,3,2024/01/07
"""

FILE2 = """4,Doodad,2.50,4,2024-01-08
5,,1.00,1,2024-01-09
"""


def test_available_now_incremental(spark, tmp_path):
    """availableNow picks up only new files across runs (checkpointed) —
    the exactly-once version of the reference's daily sensor loop."""
    inp = tmp_path / "in"
    inp.mkdir()
    wh = str(tmp_path / "warehouse")
    dl = str(tmp_path / "dead")
    ck = str(tmp_path / "ckpt")

    (inp / "f1.csv").write_text(FILE1)
    run_available_now(spark, str(inp), wh, dl, ck)
    clean1 = spark.read.parquet(wh)
    assert sorted(r["id"] for r in clean1.collect()) == ["1", "3"]
    errors1 = spark.read.json(dl)
    assert errors1.count() == 1  # 'twenty' price

    (inp / "f2.csv").write_text(FILE2)
    run_available_now(spark, str(inp), wh, dl, ck)
    clean2 = spark.read.parquet(wh)
    # only the new clean row appended; old rows not reprocessed
    assert sorted(r["id"] for r in clean2.collect()) == ["1", "3", "4"]
    assert spark.read.json(dl).count() == 2  # + missing product


def _run_stream_complete(spark, builder, events_file, tmp_path):
    # The streaming file source needs a DIRECTORY; link the single parquet
    # into one. Schema: raw parquet schema (ts as nanosecond long under
    # the nanosAsLong conf) + the loader's shared conversion.
    from gcp_serverless_etl_pipeline_lab_spark.sources.tables import convert_nanos_ts

    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    os.symlink(events_file, src_dir / "part-0.parquet")
    raw_schema = spark.read.parquet(events_file).schema
    stream = convert_nanos_ts(
        spark.readStream.schema(raw_schema).parquet(str(src_dir))
    )
    out = builder(stream)
    name = "t_" + os.urandom(4).hex()
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    batch_events = load_table(spark, SF_SMOKE, "events")
    batch = windowed_event_counts(batch_events).orderBy("window_start", "event_type")
    streamed = _run_stream_complete(
        spark,
        lambda s: windowed_event_counts(s),
        os.path.join(SF_SMOKE, "events.parquet"),
        tmp_path,
    ).orderBy("window_start", "event_type")
    assert [r.asDict() for r in batch.collect()] == [
        r.asDict() for r in streamed.collect()
    ]


def test_streaming_sessionize_matches_batch(spark, tmp_path):
    batch_events = load_table(spark, SF_SMOKE, "events")
    batch = sessionize(batch_events).orderBy("user_id", "session_start")
    streamed = _run_stream_complete(
        spark,
        lambda s: sessionize(s),
        os.path.join(SF_SMOKE, "events.parquet"),
        tmp_path,
    ).orderBy("user_id", "session_start")
    assert [r.asDict() for r in batch.collect()] == [
        r.asDict() for r in streamed.collect()
    ]


def test_stateful_running_totals(spark, tmp_path):
    """applyInPandasWithState accumulates across micro-batches: two files
    arriving in separate availableNow runs must produce cumulative totals
    in the second run's output."""
    from gcp_serverless_etl_pipeline_lab_spark.streaming.stateful import (
        running_user_totals,
    )
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("value", DoubleType()),
        ]
    )
    src = tmp_path / "src"
    src.mkdir()
    ck = str(tmp_path / "ck")
    out_dir = str(tmp_path / "out")

    def run_batch(rows, run_id):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

        def sink(batch_df, epoch_id):
            batch_df.withColumn("run_id", F.lit(run_id)).write.mode(
                "append"
            ).parquet(out_dir)

        q = (
            running_user_totals(spark.readStream.schema(schema).parquet(str(src)))
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        rows_out = (
            spark.read.parquet(out_dir).filter(F.col("run_id") == run_id).collect()
        )
        return {r["user_id"]: (r["n_events"], r["sum_value"]) for r in rows_out}

    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    out1 = run_batch([(1, t, 10.0), (1, t, 5.0), (2, t, 1.0)], 1)
    assert out1 == {1: (2, 15.0), 2: (1, 1.0)}
    out2 = run_batch([(1, t, 2.5), (3, t, 7.0)], 2)
    # user 1 cumulative across batches; user 3 new; user 2 not re-emitted
    assert out2 == {1: (3, 17.5), 3: (1, 7.0)}

    # Batch-parity: the converged streaming state (latest emit per user
    # across all runs) must equal the native batch twin on the full input
    # — the contract behind the a0_stream_user_totals harness oracle.
    from gcp_serverless_etl_pipeline_lab_spark.streaming.stateful import (
        running_user_totals_batch,
    )

    final = {**out1, **out2}
    batch_twin = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in running_user_totals_batch(spark.read.parquet(str(src))).collect()
    }
    assert batch_twin == final


def test_spark_sql_surface(spark):
    """The engine exposes the warehouse as temp views for ad-hoc SQL
    (entry point 3 in SURVEY.md §3.3); SQL and DataFrame plans agree."""
    register_views(spark, SF_SMOKE)
    sql = spark.sql(
        """
        SELECT l_returnflag, ROUND(SUM(l_extendedprice * l_quantity), 2) AS revenue
        FROM lineitem GROUP BY l_returnflag ORDER BY revenue DESC, l_returnflag
        """
    ).collect()
    df = (
        load_table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_returnflag")
        .collect()
    )
    assert [r.asDict() for r in sql] == [r.asDict() for r in df]


def test_streaming_dedup_exactly_once(spark, tmp_path):
    """At-least-once delivery (every event delivered twice, via two copies
    of the same file) → dropDuplicatesWithinWatermark emits each event_id
    exactly once, matching the batch twin."""
    from gcp_serverless_etl_pipeline_lab_spark.sources.tables import convert_nanos_ts
    from gcp_serverless_etl_pipeline_lab_spark.streaming.dedup_stream import (
        dedup_stream_exact,
    )

    events_file = os.path.join(SF_SMOKE, "events.parquet")
    src_dir = tmp_path / "dup_src"
    src_dir.mkdir()
    os.symlink(events_file, src_dir / "copy1.parquet")
    os.symlink(events_file, src_dir / "copy2.parquet")

    raw_schema = spark.read.parquet(events_file).schema
    stream = convert_nanos_ts(
        spark.readStream.schema(raw_schema).parquet(str(src_dir))
    )
    out = dedup_stream_exact(stream)
    name = "t_" + os.urandom(4).hex()
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table(name)

    batch = load_table(spark, SF_SMOKE, "events")
    assert streamed.count() == batch.select("event_id").distinct().count()
    # every id exactly once, and the id SET matches the batch twin
    assert streamed.groupBy("event_id").count().filter("count > 1").count() == 0
    sdf = {r.event_id for r in streamed.select("event_id").collect()}
    bdf = {r.event_id for r in batch.select("event_id").collect()}
    assert sdf == bdf


def test_batch_dedup_content_twin(spark):
    """Batch path of the content-keyed streaming dedup: one survivor per
    distinct md5(text)."""
    from gcp_serverless_etl_pipeline_lab_spark.streaming.dedup_stream import (
        dedup_stream_content,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    doubled = docs.unionAll(docs)
    out = dedup_stream_content(doubled)
    assert out.count() == docs.select(F.md5("text")).distinct().count()
    assert "_content_k" not in out.columns


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Watermarked view->purchase attribution: append-mode stream-stream
    inner join equals the same builder run on batch inputs."""
    from gcp_serverless_etl_pipeline_lab_spark.sources.tables import convert_nanos_ts
    from gcp_serverless_etl_pipeline_lab_spark.streaming.join_stream import (
        attribute_conversions,
    )

    events_file = os.path.join(SF_SMOKE, "events.parquet")
    batch_events = load_table(spark, SF_SMOKE, "events")
    batch = attribute_conversions(
        batch_events.filter(F.col("event_type") == "view"),
        batch_events.filter(F.col("event_type") == "purchase"),
    ).orderBy("user_id", "view_id", "purchase_id")

    src_dir = tmp_path / "ss_src"
    src_dir.mkdir()
    os.symlink(events_file, src_dir / "part-0.parquet")
    raw_schema = spark.read.parquet(events_file).schema

    def stream():
        return convert_nanos_ts(
            spark.readStream.schema(raw_schema).parquet(str(src_dir))
        )

    out = attribute_conversions(
        stream().filter(F.col("event_type") == "view"),
        stream().filter(F.col("event_type") == "purchase"),
    )
    name = "t_" + os.urandom(4).hex()
    q = (
        out.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = spark.table(name).orderBy("user_id", "view_id", "purchase_id")

    b_rows = [r.asDict() for r in batch.collect()]
    s_rows = [r.asDict() for r in streamed.collect()]
    assert len(b_rows) > 0
    assert b_rows == s_rows


def test_watermark_drops_late_events_across_restarts(spark, tmp_path):
    """Append-mode windowed counts with a 10-min watermark: a window is
    emitted once the watermark passes its end, and an event arriving
    LATER than the watermark (in a subsequent availableNow run, via the
    checkpointed watermark) must not resurrect or change it."""
    import datetime as dt

    from gcp_serverless_etl_pipeline_lab_spark.streaming.file_stream import (
        windowed_event_counts,
    )

    src = tmp_path / "wm_src"
    src.mkdir()
    out_dir = str(tmp_path / "wm_out")
    ck = str(tmp_path / "wm_ck")
    schema = "ts timestamp, event_type string, value double"

    def write_batch(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src / name))

    def run_once():
        stream = (
            spark.readStream.schema(
                spark.read.parquet(str(src) + "/*").schema
            ).option("recursiveFileLookup", "true").parquet(str(src))
        )
        q = (
            windowed_event_counts(stream, "30 minutes", "10 minutes")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    t = lambda s: dt.datetime.fromisoformat(f"2024-01-01 {s}")
    # Run 1: two events in the 09:00 window, one at 10:05 that pushes the
    # watermark to 09:55 > 09:30 -> the 09:00 window finalizes (count 2).
    write_batch(
        [(t("09:05:00"), "view", 1.0), (t("09:10:00"), "view", 1.0),
         (t("10:05:00"), "view", 1.0)],
        "b1",
    )
    run_once()
    rows1 = {
        (r.window_start, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert ("2024-01-01 09:00:00", 2) in rows1

    # Run 2: a LATE 09:15 event (behind the checkpointed watermark) plus
    # an 11:05 event that finalizes the 10:00 window. The late event must
    # not produce another 09:00-window row.
    write_batch([(t("09:15:00"), "view", 1.0), (t("11:05:00"), "view", 1.0)], "b2")
    run_once()
    rows2 = sorted(
        (r.window_start, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
        if r.window_start.startswith("2024-01-01 09")
    )
    assert rows2 == [("2024-01-01 09:00:00", 2)]  # unchanged, no resurrection
    rows10 = [
        (r.window_start, r.n_events)
        for r in spark.read.parquet(out_dir).collect()
        if r.window_start.startswith("2024-01-01 10")
    ]
    assert rows10 == [("2024-01-01 10:00:00", 1)]


def test_stream_stream_left_outer_emits_null_on_watermark(spark, tmp_path):
    """LEFT OUTER stream-stream join: a view with no purchase in the
    attribution window must eventually emit with NULL purchase columns —
    but only once the watermark proves no match can still arrive."""
    import datetime as dt

    src = tmp_path / "lo_src"
    src.mkdir()
    ck = str(tmp_path / "lo_ck")
    out_dir = str(tmp_path / "lo_out")
    schema = "event_id long, ts timestamp, user_id long, event_type string"

    def write_batch(rows, name):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src / name))

    def run_once():
        stream = spark.readStream.schema(
            spark.read.parquet(str(src) + "/*").schema
        ).option("recursiveFileLookup", "true").parquet(str(src))
        v = (
            stream.filter(F.col("event_type") == "view")
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "10 minutes")
            .select("user_id", F.col("event_id").alias("view_id"),
                    F.col("ts").alias("view_ts"))
        )
        p = (
            stream.filter(F.col("event_type") == "purchase")
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "10 minutes")
            .select(F.col("user_id").alias("p_user_id"),
                    F.col("event_id").alias("purchase_id"),
                    F.col("ts").alias("purchase_ts"))
        )
        joined = v.join(
            p,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("purchase_ts") >= F.col("view_ts"))
            & (F.col("purchase_ts") < F.col("view_ts") + F.expr("interval 30 minutes")),
            "left_outer",
        ).select("user_id", "view_id", "purchase_id")
        q = (
            joined.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    t = lambda s: dt.datetime.fromisoformat(f"2024-01-01 {s}")
    # user 1: view with a purchase inside the window; user 2: view with
    # none. A late clock-advancing event pushes the watermark far enough
    # to close both join windows.
    write_batch(
        [(1, t("09:00:00"), 1, "view"), (2, t("09:10:00"), 1, "purchase"),
         (3, t("09:00:00"), 2, "view")],
        "b1",
    )
    run_once()
    # BOTH sides must advance (the join uses the min watermark across
    # inputs), and the outer-null flush happens in a batch AFTER the
    # watermark commit — hence two more micro-batches.
    write_batch(
        [(9, t("11:00:00"), 99, "view"), (10, t("11:00:00"), 98, "purchase")],
        "b2",
    )
    run_once()
    write_batch(
        [(11, t("12:00:00"), 99, "view"), (12, t("12:00:00"), 98, "purchase")],
        "b3",
    )
    run_once()
    rows = {
        (r.user_id, r.view_id, r.purchase_id)
        for r in spark.read.parquet(out_dir).collect()
    }
    assert (1, 1, 2) in rows            # matched pair
    assert (2, 3, None) in rows         # unmatched view emitted with NULL


def test_available_now_sink_idempotent_on_replay(spark, tmp_path):
    """Crash-replay model: a checkpoint that never committed (here: a
    fresh checkpoint dir) replays the batch with the SAME epoch id — the
    per-epoch overwrite sink must converge to the same rows instead of
    appending a duplicate copy (a plain append sink would double every
    row under this replay)."""
    inp = tmp_path / "in"
    inp.mkdir()
    wh = str(tmp_path / "warehouse")
    dl = str(tmp_path / "dead")

    (inp / "f1.csv").write_text(FILE1)
    run_available_now(spark, str(inp), wh, dl, str(tmp_path / "ck1"))
    rows1 = sorted(r["id"] for r in spark.read.parquet(wh).collect())
    n_err1 = spark.read.json(dl).count()

    # replay from scratch: fresh checkpoint, same sinks
    run_available_now(spark, str(inp), wh, dl, str(tmp_path / "ck2"))
    assert sorted(r["id"] for r in spark.read.parquet(wh).collect()) == rows1
    assert spark.read.json(dl).count() == n_err1
