"""Edge semantics of the round-4 operators that the oracle queries can't
isolate: interval boundary rules, LOCF leading gaps, stratified allowlist."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gcp_serverless_etl_pipeline_lab_spark.operators.rangejoin import (
    interval_bucket_join,
)
from gcp_serverless_etl_pipeline_lab_spark.operators.sampling import (
    stratified_sample,
)
from gcp_serverless_etl_pipeline_lab_spark.operators.timeseries import gapfill_locf


def _ts(s):
    return dt.datetime.fromisoformat(s)


def test_interval_join_half_open_boundaries(spark):
    events = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00")),  # == start: in
         (2, _ts("2024-01-01 11:59:59")),  # inside: in
         (3, _ts("2024-01-01 12:00:00")),  # == end: OUT (half-open)
         (4, _ts("2024-01-01 09:59:59"))],  # before: out
        "event_id long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(100, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 12:00:00"))],
        "interval_id long, start timestamp, end timestamp",
    )
    out = interval_bucket_join(events, iv, bucket_unit="hour")
    assert sorted(r.event_id for r in out.collect()) == [1, 2]


def test_interval_join_event_in_two_overlapping_windows(spark):
    events = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:30:00"))], "event_id long, ts timestamp"
    )
    iv = spark.createDataFrame(
        [(100, _ts("2024-01-01 10:00:00"), _ts("2024-01-01 11:00:00")),
         (200, _ts("2024-01-01 09:00:00"), _ts("2024-01-01 11:00:00"))],
        "interval_id long, start timestamp, end timestamp",
    )
    out = interval_bucket_join(events, iv, bucket_unit="hour")
    assert sorted(r.interval_id for r in out.collect()) == [100, 200]


def test_gapfill_leading_gap_stays_null_and_carry_works(spark):
    events = spark.createDataFrame(
        [("a", _ts("2024-01-01 02:15:00"), 10.0),
         ("a", _ts("2024-01-01 04:45:00"), 20.0),
         ("b", _ts("2024-01-01 00:30:00"), 5.0)],
        "event_type string, ts timestamp, value double",
    )
    out = gapfill_locf(events, bucket="1 hour").orderBy("key", "bucket_start")
    rows = [(r.key, r.bucket_start.hour, r.n_events, r.v_filled, r.was_gap)
            for r in out.collect()]
    # Spine spans 00:00..04:00 for BOTH keys (global bounds).
    assert rows == [
        ("a", 0, 0, None, True),    # leading gap: no carry source yet
        ("a", 1, 0, None, True),
        ("a", 2, 1, 10.0, False),
        ("a", 3, 0, 10.0, True),    # carried forward
        ("a", 4, 1, 20.0, False),
        ("b", 0, 1, 5.0, False),
        ("b", 1, 0, 5.0, True),
        ("b", 2, 0, 5.0, True),
        ("b", 3, 0, 5.0, True),
        ("b", 4, 0, 5.0, True),
    ]


def test_stratified_sample_allowlist_and_rate_zero(spark):
    df = spark.createDataFrame(
        [(i, "A" if i % 2 == 0 else "X") for i in range(200)],
        "k long, s string",
    )
    out = stratified_sample(df, "s", {"A": 1.0, "B": 0.5}, "CAST(k AS STRING)")
    got = out.select("s").distinct().collect()
    assert [r.s for r in got] == ["A"]          # X has no rate -> dropped
    assert out.count() == 100                    # rate 1.0 keeps every A row
    assert stratified_sample(df, "s", {"A": 0.0}, "CAST(k AS STRING)").count() == 0


def test_merge_upsert_row_level_conflict(spark):
    """Row-level last-wins semantics (the harness query only checks the
    aggregate): v2 beats v1 beats base on the same key; untouched keys
    keep base values."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    base = spark.createDataFrame(
        [(1, "base", 0), (2, "base", 0), (3, "base", 0)], "k long, v string, ver int"
    )
    u1 = spark.createDataFrame([(1, "v1", 1), (2, "v1", 1)], "k long, v string, ver int")
    u2 = spark.createDataFrame([(1, "v2", 2)], "k long, v string, ver int")
    allv = base.unionAll(u1).unionAll(u2)
    w = Window.partitionBy("k").orderBy(F.desc("ver"))
    merged = (
        allv.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("k", "v")
    )
    assert {(r.k, r.v) for r in merged.collect()} == {(1, "v2"), (2, "v1"), (3, "base")}


def test_rolling_range_frame_includes_peers_and_bounds(spark):
    """RANGE frame on epoch-µs: an event exactly 1 h older is inside the
    frame (inclusive bound); 1 h + 1 µs older is outside; same-µs peers
    are all included (range frames include ordering peers)."""
    import datetime as dt

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0 - dt.timedelta(hours=1, microseconds=1), 1.0),  # outside
        (2, t0 - dt.timedelta(hours=1), 1.0),                  # boundary: inside
        (3, t0, 1.0),
        (4, t0, 1.0),                                          # peer of 3
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    w = (
        Window.partitionBy(F.lit(1))
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    out = {r.event_id: r.n for r in df.select(
        "event_id", F.count(F.lit(1)).over(w).alias("n")).collect()}
    # events 3 & 4 share an ordering value -> both see {2,3,4}; event 2
    # sees {1? no — 1 is 1µs beyond} -> {2}; event 1 sees itself.
    assert out == {1: 1, 2: 2, 3: 3, 4: 3}
