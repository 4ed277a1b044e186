"""Bucketed interval (range-containment) join.

Joining events to time intervals (``start <= ts < end``) is a
non-equi join: naively expressed, Spark plans it as
BroadcastNestedLoopJoin (fine only while intervals broadcast) or a
cartesian product (never fine). The scalable spelling turns it into an
EQUI-join on a time bucket:

1. each interval explodes to the buckets it overlaps —
   ``sequence(trunc(start), trunc(end), step)``; an interval spanning
   B buckets costs B rows, so pick the bucket width near the typical
   interval length;
2. each event computes its single bucket key map-side;
3. a hash equi-join on the bucket key meets every (event, interval)
   pair that COULD overlap, and the exact predicate filters down to
   true containment.

At 100 TB this is one hash shuffle of events by bucket (intervals are
usually orders of magnitude smaller, and AQE broadcast-joins them when
they fit anyway); no nested loop, no cross product. A bucket holding a
disproportionate share of events (flash-sale hour) is plain equi-join
skew — AQE skew-join splits it, or salt the bucket key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_bucket_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_unit: str = "hour",
) -> DataFrame:
    """Rows of ``events`` × matching ``intervals`` with
    ``start <= ts < end`` (half-open), via a bucket equi-join.

    ``intervals`` must carry ``start_col``/``end_col`` timestamps; all
    its other columns are preserved on the output next to the event
    columns.
    """
    b = intervals.withColumn(
        "_bkt",
        F.explode(
            F.expr(
                f"sequence(date_trunc('{bucket_unit}', {start_col}),"
                f" date_trunc('{bucket_unit}', {end_col}),"
                f" interval 1 {bucket_unit})"
            )
        ),
    )
    e = events.withColumn("_bkt", F.date_trunc(bucket_unit, F.col(ts_col)))
    return (
        e.join(b, "_bkt")
        .filter(
            (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
        )
        .drop("_bkt")
    )
