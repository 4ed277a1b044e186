"""gapfill_locf null contract (ADVICE round 7): rows with a NULL ts or a
NULL key are ignored up front, so a null-ts-only key and the NULL key
itself contribute ZERO output rows — on real null-bearing input, which the
generated fixtures never produce (that's why the oracle gate alone can't
see this; the operator filter and the oracle WHERE clause are kept in
lockstep in harness/events.py)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from gcp_serverless_etl_pipeline_lab_spark.operators.timeseries import gapfill_locf


def _ts(h: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, h, 0, 0)


def _events(spark):
    rows = [
        # normal key: observations at 00 and 03 -> grid 00..03, gaps 01/02
        ("a", _ts(0), 10.0),
        ("a", _ts(3), 30.0),
        # key whose EVERY event has a null ts: must vanish entirely
        ("nullts", None, 99.0),
        ("nullts", None, 98.0),
        # NULL key with valid timestamps: must vanish entirely
        (None, _ts(1), 77.0),
        # second normal key inside the same bounds
        ("b", _ts(1), 20.0),
    ]
    return spark.createDataFrame(
        rows, "event_type string, ts timestamp, value double"
    )


def test_null_ts_and_null_key_rows_are_ignored(spark):
    out = gapfill_locf(_events(spark), bucket="1 hour").collect()
    keys = {r.key for r in out}
    assert keys == {"a", "b"}, keys
    # bounds come from surviving rows only: 00:00 .. 03:00 -> 4 cells/key
    by_key = {}
    for r in out:
        by_key.setdefault(r.key, []).append(r)
    assert len(by_key["a"]) == 4 and len(by_key["b"]) == 4
    a = {r.bucket_start.hour: r for r in by_key["a"]}
    assert [a[h].was_gap for h in range(4)] == [False, True, True, False]
    assert [a[h].v_filled for h in range(4)] == [10.0, 10.0, 10.0, 30.0]
    # 'b' observed only at 01: leading gap at 00 stays NULL, LOCF after
    b = {r.bucket_start.hour: r for r in by_key["b"]}
    assert b[0].v_filled is None and b[0].was_gap
    assert [b[h].v_filled for h in range(1, 4)] == [20.0, 20.0, 20.0]


def test_all_null_input_produces_empty_grid(spark):
    df = spark.createDataFrame(
        [("k", None, 1.0), (None, dt.datetime(2024, 1, 1), 2.0)],
        "event_type string, ts timestamp, value double",
    )
    assert gapfill_locf(df).count() == 0


def test_bounds_unaffected_by_null_rows(spark):
    # a null-ts event on an otherwise-observed key must not perturb the
    # key's runs or the global bounds
    clean = _events(spark).filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    with_nulls = gapfill_locf(_events(spark)).collect()
    without = gapfill_locf(clean).collect()
    assert sorted(map(tuple, with_nulls)) == sorted(map(tuple, without))


def test_long_runs_segment_identically(spark):
    """Bounded-run segmentation (ADVICE round 7): a run far longer than
    max_run_buckets — here a 2-observation key with a ~500-bucket gap at
    '1 minute' granularity, split every 7 buckets — must produce the
    EXACT same grid as the unsegmented default, including the leading-gap
    run of a late-starting key (segmented through the same path)."""
    ev = spark.createDataFrame(
        [
            ("a", dt.datetime(2024, 1, 1, 0, 0, 30), 10.0),
            ("a", dt.datetime(2024, 1, 1, 8, 20, 15), 20.0),
            ("b", dt.datetime(2024, 1, 1, 6, 1, 0), 5.0),
        ],
        "event_type string, ts timestamp, value double",
    )
    default = gapfill_locf(ev, bucket="1 minute").collect()
    tiny_seg = gapfill_locf(ev, bucket="1 minute", max_run_buckets=7).collect()
    assert sorted(map(tuple, default)) == sorted(map(tuple, tiny_seg))
    # grid spans 00:00..08:20 for both keys = 501 cells each
    assert len(default) == 2 * 501


def test_gapfill_grid_is_timezone_independent(spark):
    """ADVICE r8: the bucket width was derived from unix_micros(epoch +
    interval), whose epoch LITERAL parses in session-local time — in a
    non-UTC session the width picked up the zone offset and the segment
    grid misaligned. The width is now a difference of two micros (the
    parse offset cancels), so the grid must be identical under any
    session timezone."""
    # max_run_buckets=2 forces the 3-cell gap run into MULTIPLE segments
    # — the path where a wrong width misplaces seg_lo/seg_hi (a short run
    # fits one segment for any width and hides the bug).
    def run():
        return sorted(
            map(
                tuple,
                gapfill_locf(
                    _events(spark), bucket="1 hour", max_run_buckets=2
                ).collect(),
            )
        )

    tz_key = "spark.sql.session.timeZone"
    prev = spark.conf.get(tz_key)
    utc_rows = run()
    try:
        spark.conf.set(tz_key, "Asia/Tokyo")
        est_rows = run()
    finally:
        spark.conf.set(tz_key, prev)
    assert est_rows == utc_rows
    # and the segmented grid itself is the full 4-cell-per-key grid
    assert len(utc_rows) == 8
