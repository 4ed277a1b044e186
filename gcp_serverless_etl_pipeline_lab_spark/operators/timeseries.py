"""Time-series regularization: bucket spine generation, gap-fill, LOCF.

Event streams arrive irregular; downstream consumers (rate monitors,
training-curriculum schedulers, feature stores) want a REGULAR grid — one
row per (key, bucket) even when nothing happened, with carried-forward
values. Three steps, all declarative:

1. bucket aggregate: groupBy(key, window(ts, bucket)) — one shuffle of
   the (already small) aggregate, the only corpus-wide work;
2. LOCF + run bounds over the OBSERVED buckets only: last(value,
   ignorenulls=True) and lead(bucket) over (partition by key order by
   bucket) — the window sorts observed buckets, never the full grid;
3. gap generation by run-length explode: each observed bucket owns the
   half-open run [bucket, next_bucket) and emits
   sequence(bucket, next-1, interval) rows carrying its filled value —
   grid rows are GENERATED in the window task, never shuffled. Leading
   gaps (before a key's first observation) come from one tiny per-key
   min-bucket aggregate crossed with the broadcast global bounds, and
   stay NULL by design.

Scale notes (100 TB):
- Shuffle volume is proportional to OBSERVED (key, bucket) cells, not to
  keys × buckets. A sparse grid (the common case — sf0.1 events are ~9%
  dense at hourly granularity) never materializes, joins, or sorts its
  empty cells; they are exploded into existence after the window and
  flow straight to the consumer. An earlier revision built the full
  spine first and shuffled it through a left join plus a window — that
  measured 12.8× wall at 10× data (SCALE_STRESS.json round 6) purely
  from moving empty cells; this formulation is the fix.
- The per-key window sort is bounded by the key's observed buckets, and
  no single generated row ever materializes more than
  ``max_run_buckets`` grid cells: a run longer than that is first split
  into bounded segments (explode over segment ordinals, then the
  per-segment sequence) — same chunking trick as operators/packing.py —
  so one sparse key with two observations decades apart at fine
  granularity concentrates nothing (and stays clear of Spark's 2^31
  sequence-length cap).
- Null handling is an explicit CONTRACT, enforced by an up-front filter
  (not an accident of window/join null semantics): rows with a NULL
  timestamp OR a NULL key are ignored, so a key whose every event has a
  NULL ts — and the NULL key itself — contributes no output rows. The
  DuckDB oracle (harness/events.py) applies the identical WHERE clause,
  so the contract holds on both sides of the correctness gate
  (tests/test_timeseries_nulls.py pins it on real null-bearing input).
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
    max_run_buckets: int = 32768,
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
    # Contract: null-ts and null-key rows carry no information for a
    # regular grid — drop them BEFORE aggregating. Without this filter a
    # NULL key would become a real LOCF-filled group (the oracle's join
    # on key never matches NULL, so it would emit all-gap rows instead)
    # and null-ts rows would form a null-window group silently excluded
    # from key discovery — both latent hash divergences (ADVICE round 7).
    events = events.filter(
        F.col(ts_col).isNotNull() & F.col(key_col).isNotNull()
    )
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
    v_type = dict(hourly.dtypes)["v"]
    ordered = Window.partitionBy("key").orderBy("bucket_start")
    carry = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # Each observed bucket owns the run [bucket_start, next_bs) and emits
    # one output row per grid cell in it, all carrying its LOCF value; the
    # last run per key extends to the global hi bound.
    runs_obs = (
        hourly.select(
            "key",
            F.col("bucket_start").alias("obs_bs"),
            "n_events",
            "v",
            F.last("v", ignorenulls=True).over(carry).alias("v_filled"),
            F.lead("bucket_start").over(ordered).alias("next_bs"),
        )
        .crossJoin(F.broadcast(bounds))
        .select(
            "key",
            F.col("obs_bs").alias("run_lo"),
            F.expr(f"coalesce(next_bs - interval {bucket}, hi)").alias("run_hi"),
            "obs_bs",
            "n_events",
            "v",
            "v_filled",
        )
    )
    # Leading gaps: grid cells from the global lo up to (excluding) each
    # key's first observed bucket — a tiny per-key aggregate, broadcast
    # bounds, generated rows. obs_bs is NULL, so the shared projection's
    # bucket_start == obs_bs test is never true: n_events=0, was_gap=true,
    # v_filled NULL — by construction, not by a separate literal branch.
    runs_lead = (
        hourly.groupBy("key")
        .agg(F.min("bucket_start").alias("first_bs"))
        .crossJoin(F.broadcast(bounds))
        .where(F.col("first_bs") > F.col("lo"))
        .select(
            "key",
            F.col("lo").alias("run_lo"),
            F.expr(f"first_bs - interval {bucket}").alias("run_hi"),
            F.lit(None).cast("timestamp").alias("obs_bs"),
            F.lit(None).cast("long").alias("n_events"),
            F.lit(None).cast(v_type).alias("v"),
            F.lit(None).cast(v_type).alias("v_filled"),
        )
    )
    # Bounded-run segmentation: a run spanning more than max_run_buckets
    # grid cells is split into ceil(len/max) segments BEFORE the sequence
    # explode, so no generated array exceeds max_run_buckets elements —
    # one sparse key with a decades-long gap at fine granularity becomes
    # many bounded rows instead of one giant one (and Spark's ~2^31
    # sequence cap is unreachable). Both explodes run in the same task —
    # segment ordinals are generated, never shuffled. The bucket width in
    # microseconds is a constant-folded literal (window() accepts only
    # fixed day-time widths, down to sub-second — hence micros, not
    # seconds); run bounds are window()-aligned, so the division is
    # exact. Computed as a DIFFERENCE of two micros so the width is
    # timezone-independent: day-time interval addition is absolute-time,
    # so the session zone's parse offset cancels — a bare
    # unix_micros(epoch_literal + interval) is only the width when the
    # session zone is UTC, and gapfill_locf is public API usable from
    # any session.
    _t0 = "timestamp'1970-01-02 00:00:00'"
    width_us = F.expr(
        f"unix_micros({_t0} + interval {bucket}) - unix_micros({_t0})"
    )
    seg = max_run_buckets
    n_seg = (
        F.floor(
            (F.unix_micros("run_hi") - F.unix_micros("run_lo"))
            / (width_us * F.lit(seg))
        )
        + 1
    )
    segmented = (
        runs_obs.unionByName(runs_lead)
        .select(
            "key",
            "run_lo",
            "run_hi",
            "obs_bs",
            "n_events",
            "v",
            "v_filled",
            F.explode(F.sequence(F.lit(0).cast("long"), n_seg - 1)).alias("seg_i"),
        )
        .select(
            "key",
            "obs_bs",
            "n_events",
            "v",
            "v_filled",
            F.timestamp_micros(
                F.unix_micros("run_lo") + F.col("seg_i") * seg * width_us
            ).alias("seg_lo"),
            F.least(
                F.col("run_hi"),
                F.timestamp_micros(
                    F.unix_micros("run_lo")
                    + ((F.col("seg_i") + 1) * seg - 1) * width_us
                ),
            ).alias("seg_hi"),
        )
    )
    return segmented.select(
        "key",
        F.explode(
            F.expr(f"sequence(seg_lo, seg_hi, interval {bucket})")
        ).alias("bucket_start"),
        "obs_bs",
        "n_events",
        "v",
        "v_filled",
    ).select(
        "key",
        "bucket_start",
        F.when(F.col("bucket_start") == F.col("obs_bs"), F.col("n_events"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_events"),
        F.col("v_filled").alias("v_filled"),
        F.when(F.col("bucket_start") == F.col("obs_bs"), F.col("v").isNull())
        .otherwise(F.lit(True))
        .alias("was_gap"),
    )
