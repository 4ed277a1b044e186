"""Time-series regularization: bucket spine generation, gap-fill, LOCF.

Event streams arrive irregular; downstream consumers (rate monitors,
training-curriculum schedulers, feature stores) want a REGULAR grid — one
row per (key, bucket) even when nothing happened, with carried-forward
values. Three steps, all declarative:

1. bucket aggregate: groupBy(key, window(ts, bucket)) — one shuffle of
   the (already small) aggregate, the only corpus-wide work;
2. spine: distinct keys × sequence(min_bucket, max_bucket, interval) —
   the bounds come from ONE tiny global aggregate that broadcasts into a
   cross join; the spine rows are generated, never scanned;
3. LOCF: last(value, ignorenulls=True) over (partition by key order by
   bucket rows unbounded preceding..current) — leading gaps (before a
   key's first observation) stay NULL by design.

Scale notes (100 TB):
- The window in step 3 partitions by key over the SPINE (keys × buckets),
  not the raw events — for a year of hourly buckets that's 8.7k rows per
  key regardless of event volume, so the sort inside each partition is
  trivial; the heavy data only ever passes through the step-1 hash
  aggregate (map-side partial).
- A key whose full spine is still too long to sort in one task (decades
  of seconds-granularity buckets) would segment the spine by coarse epoch
  first and carry the last value across segment boundaries with a second,
  tiny join — not needed at any tested scale; noted for parity with the
  segment trick in operators/packing.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_locf(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    bucket: str = "1 hour",
    cents_avg: bool = False,
) -> DataFrame:
    """Regular per-key bucket grid with gap rows and LOCF-filled values.

    Returns (key, bucket_start timestamp, n_events, v_filled, was_gap):
    ``v_filled`` is the bucket's ROUND(avg(value), 2), carried forward
    over empty buckets; NULL before the key's first observed bucket.
    Rounding happens BEFORE the carry so both engines propagate identical
    doubles.

    ``cents_avg=True`` changes the value column to INTEGER CENTS
    (``v`` = round(sum(round(value*100))/count) as bigint) for
    cross-engine determinism. Two separate traps motivate it, both
    observed at sf0.01: (1) a double Σ is reduction-order-dependent in
    its last ulp, so engines can disagree on which side of a .xx5
    boundary an avg lands — integer sums are exact; (2) even on an
    IDENTICAL double, ROUND(x, 2) differs between engines when x's
    shortest decimal repr sits on the boundary but its binary value is
    below it (Spark rounds BigDecimal.valueOf(x) — the shortest REPR —
    while DuckDB rounds the binary value: 33.244999…996 prints "33.245",
    Spark says 33.25, DuckDB 33.24). Scale-0 rounding has no such case:
    every half-integer is exactly representable, so no other double
    PRINTS as one. Same family of tricks as the integer-cents running
    sum in window_running_analytics.
    """
    if cents_avg:
        avg_expr = F.round(
            F.sum(F.round(F.col(value_col) * 100).cast("long"))
            / F.count(F.lit(1)).cast("double")
        ).cast("long")
    else:
        avg_expr = F.round(F.avg(value_col), 2)
    hourly = (
        events.groupBy(
            F.col(key_col).alias("key"),
            F.window(F.col(ts_col), bucket).alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            avg_expr.alias("v"),
        )
        .select("key", F.col("w.start").alias("bucket_start"), "n_events", "v")
    )
    # Spine bounds come from the AGGREGATED bucket starts, not from
    # truncating raw ts: window(ts, bucket) starts are epoch-aligned to
    # the bucket width, so min/max of w.start aligns with the left-join
    # key for ANY bucket ('1 day', '15 minutes', ...), where a hard-coded
    # date_trunc('hour', ...) only aligned for buckets dividing an hour.
    bounds = hourly.agg(
        F.min("bucket_start").alias("lo"),
        F.max("bucket_start").alias("hi"),
    )
    keys = events.select(F.col(key_col).alias("key")).distinct()
    spine = keys.crossJoin(F.broadcast(bounds)).select(
        "key",
        F.explode(
            F.expr(f"sequence(lo, hi, interval {bucket})")
        ).alias("bucket_start"),
    )
    joined = spine.join(hourly, ["key", "bucket_start"], "left")
    carry = Window.partitionBy("key").orderBy("bucket_start").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        "key",
        "bucket_start",
        F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
        F.last("v", ignorenulls=True).over(carry).alias("v_filled"),
        F.col("v").isNull().alias("was_gap"),
    )
