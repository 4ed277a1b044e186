"""Event-stream harness queries: windowed/sessionized aggregation, gap-fill
+ LOCF, rolling time-range windows, JSON property extraction, funnels,
conversion attribution, cohort retention, SCD2 dimension history (full and
incremental), count-min-sketch heavy hitters, and PSI drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import h60_duck
from ..operators.scd2 import scd2_history
from ..operators.sketchfreq import cms_heavy_hitters
from ..streaming.file_stream import windowed_event_counts
from ._registry import _t, register

@register(
    "events_windowed_agg",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY window_start, event_type
    ORDER BY window_start, event_type
    """,
)
def events_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate — the batch plan of the streaming
    operator in streaming.file_stream (same builder)."""
    return windowed_event_counts(_t(spark, sf_dir, "events"), "1 hour").orderBy(
        "window_start", "event_type"
    )

@register(
    "events_sessionization",
    """
    WITH lagd AS (
      SELECT user_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      FROM events
    ),
    flags AS (
      SELECT *, CASE WHEN prev IS NULL
                       OR epoch_us(ts) - epoch_us(prev) >= 1800000000
                     THEN 1 ELSE 0 END AS ns
      FROM lagd
    ),
    sess AS (
      SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flags
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
               AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions via Spark's native session_window (the oracle
    spells the same semantics with lag/cumsum: new session iff the gap to
    the previous event is >= 30 min, exact in microseconds; session end is
    last event + gap)."""
    from ..streaming.sessionize import sessionize

    return sessionize(_t(spark, sf_dir, "events"), gap="30 minutes").orderBy(
        "user_id", "session_start"
    )

# ---------------------------------------------------------------------------
# Time-series gap-fill + LOCF
# ---------------------------------------------------------------------------
#
# Events are thinned to event_id % 7 == 0 so ~2/3 of the hourly buckets
# are genuinely empty (1241 of 3600 filled at sf0.01) — the spine and the
# carry both do real work. Bounds come from the THINNED stream on both
# sides.


@register(
    "events_gapfill_locf",
    """
    WITH f AS (
      SELECT event_type, ts, value FROM events
      WHERE event_id % 7 = 0 AND ts IS NOT NULL AND event_type IS NOT NULL
    ),
    hourly AS (
      SELECT event_type AS key, date_trunc('hour', ts) AS h,
             COUNT(*) AS n,
             CAST(ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
                        / COUNT(*)) AS BIGINT) AS v
      FROM f GROUP BY 1, 2
    ),
    bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM f
    ),
    keys AS (SELECT DISTINCT event_type AS key FROM f),
    spine AS (
      SELECT key, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM keys CROSS JOIN bounds
    ),
    j AS (
      SELECT s.key, s.h, COALESCE(hourly.n, 0) AS n_events, hourly.v AS v
      FROM spine s
      LEFT JOIN hourly ON hourly.key = s.key AND hourly.h = s.h
    )
    SELECT key, strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket_start, n_events,
           COALESCE(last_value(v IGNORE NULLS) OVER (
             PARTITION BY key ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             CAST(-1 AS BIGINT)) AS v_filled_cents,
           v IS NULL AS was_gap
    FROM j
    ORDER BY key, bucket_start
    """,
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.timeseries import gapfill_locf

    thinned = _t(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    out = gapfill_locf(thinned, key_col="event_type", bucket="1 hour", cents_avg=True)
    # Leading gaps (before a key's first bucket) are semantically NULL;
    # the harness emits them as -1 so the oracle channel never carries a
    # nullable numeric (pandas lowers SQL NULL to NaN).
    return out.select(
        "key",
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        "n_events",
        F.coalesce(F.col("v_filled"), F.lit(-1).cast("long")).alias("v_filled_cents"),
        "was_gap",
    ).orderBy("key", "bucket_start")

# ---------------------------------------------------------------------------
# Conversion attribution (batch twin of the stream-stream join)
# ---------------------------------------------------------------------------


@register(
    "conversion_attribution",
    """
    WITH v AS (
      SELECT user_id, event_id AS view_id, ts AS vts
      FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, event_id AS purchase_id, ts AS pts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT v.user_id AS user_id, view_id, purchase_id,
           CAST(date_diff('second', vts, pts) AS BIGINT) AS lag_seconds
    FROM v JOIN p ON v.user_id = p.user_id
     AND pts >= vts AND pts < vts + INTERVAL 1 HOUR
    ORDER BY v.user_id, view_id, purchase_id
    """,
)
def conversion_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch run of streaming/join_stream.attribute_conversions — the
    SAME builder that runs as a watermarked append-mode stream-stream
    join (parity test in tests/test_streaming.py), oracle-gated here on
    its batch output."""
    from ..streaming.join_stream import attribute_conversions

    ev = _t(spark, sf_dir, "events")
    return attribute_conversions(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
    ).orderBy("user_id", "view_id", "purchase_id")


# ---------------------------------------------------------------------------
# Rolling time-RANGE window (distinct from the rows-frame window family)
# ---------------------------------------------------------------------------


@register(
    "events_rolling_1h",
    """
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           COUNT(*) OVER w AS rolling_n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT)
             AS rolling_sum_cents
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY epoch_us(ts)
      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
)
def events_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 1-hour count/sum — a RANGE frame over event time,
    not a rows frame: the window covers whatever number of events fell in
    the trailing hour. Frames are bounded by ordering on epoch
    MICROSECONDS on both engines (a seconds-granularity ordering would
    disagree with the oracle on sub-second boundary events). Values in
    integer cents (see operators/timeseries.py for the double-rounding
    rationale). One shuffle by user_id; each partition sorts its own
    events — the same layout a 1000-executor run wants."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.count(F.lit(1)).over(w).alias("rolling_n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).over(w).alias("rolling_sum_cents"),
    ).orderBy("user_id", "event_id")

# ---------------------------------------------------------------------------
# Semi-structured JSON property extraction over the event stream
# ---------------------------------------------------------------------------


@register(
    "events_props_json",
    """
    SELECT event_type,
           COUNT(*) AS n,
           MIN(CAST(props->>'k' AS BIGINT)) AS min_k,
           MAX(CAST(props->>'k' AS BIGINT)) AS max_k,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(DISTINCT CAST(props->>'k' AS BIGINT)) AS n_distinct_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction in the hot path: get_json_object stays
    JVM-side (no UDF) and evaluates map-side during the scan; only the
    extracted bigint rides the aggregation shuffle. At 100 TB prefer
    from_json with an explicit schema once fields stabilize (single parse
    for many fields vs one parse per get_json_object call)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
            F.sum(k).alias("sum_k"),
            F.count_distinct(k).alias("n_distinct_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Ordered-funnel analysis: signup -> view -> purchase
# ---------------------------------------------------------------------------


@register(
    "funnel_signup_view_purchase",
    """
    WITH s AS (
      SELECT user_id, MIN(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    v AS (
      SELECT e.user_id, MIN(e.ts) AS v_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'view' AND e.ts >= s.s_ts
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= v.v_ts
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s) AS n_signup,
           (SELECT COUNT(*) FROM v) AS n_view_after_signup,
           (SELECT COUNT(*) FROM p) AS n_purchase_after_view
    """,
)
def funnel_signup_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel: users whose first signup precedes a
    view precedes a purchase. Each stage is one filtered aggregation
    joined to the previous stage's (user, first_ts) — stage tables shrink
    monotonically, so at scale each join is a broadcast of survivors
    against the event scan. The funnel-step predicate (ts >= previous
    stage's first ts) evaluates map-side."""
    ev = _t(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(v.agg(F.count(F.lit(1)).alias("n_view_after_signup")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after_view")))
    )

# ---------------------------------------------------------------------------
# Cohort retention (weekly offsets)
# ---------------------------------------------------------------------------


@register(
    "cohort_retention_weekly",
    """
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    cohort AS (
      SELECT user_id, MIN(d) AS c FROM activity GROUP BY user_id
    ),
    offsets AS (
      SELECT cohort.user_id, c, date_diff('day', c, d) AS off
      FROM activity JOIN cohort ON activity.user_id = cohort.user_id
    )
    SELECT strftime(c, '%Y-%m-%d') AS cohort_date, off AS day_offset,
           COUNT(DISTINCT user_id) AS n_active
    FROM offsets
    WHERE off IN (0, 7, 14, 21, 28)
    GROUP BY c, off
    ORDER BY cohort_date, day_offset
    """,
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention: users grouped by first-activity date,
    counted again at weekly offsets. Two aggregations (distinct activity
    days; per-user cohort) and one join — the cohort table is per-user
    (small relative to events) and broadcastable at scale; offsets
    evaluate map-side."""
    ev = _t(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("d").alias("c"))
    offsets = activity.join(cohort, "user_id").select(
        "user_id", "c", F.datediff("d", "c").alias("day_offset")
    )
    return (
        offsets.filter(F.col("day_offset").isin([0, 7, 14, 21, 28]))
        .groupBy(
            F.date_format("c", "yyyy-MM-dd").alias("cohort_date"), "day_offset"
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
        .withColumn("day_offset", F.col("day_offset").cast("long"))
        .orderBy("cohort_date", "day_offset")
    )

# ---------------------------------------------------------------------------
# Stateful-streaming batch twin — streaming/stateful.py
# ---------------------------------------------------------------------------


@register(
    "a0_stream_user_totals",
    """
    SELECT user_id, COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY user_id ORDER BY user_id
    """,
)
def a0_stream_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of streaming/stateful.running_user_totals — the totals
    the applyInPandasWithState stream's state converges to after all
    events; streaming==batch parity is asserted in tests/test_streaming.py
    (the stateful operator itself can't execute on a batch DataFrame)."""
    from ..streaming.stateful import running_user_totals_batch

    return running_user_totals_batch(_t(spark, sf_dir, "events")).orderBy("user_id")

# ---------------------------------------------------------------------------
# SCD2 dimension history — operators/scd2.py
# ---------------------------------------------------------------------------


@register(
    "a0b_scd2_user_history",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev IS NULL OR event_type <> prev
    ),
    intervals AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
             CAST(ROW_NUMBER() OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER)
               AS version_n
      FROM changes
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_versions,
           MIN(valid_from) AS first_from,
           MAX(CASE WHEN valid_to IS NULL THEN valid_from END) AS current_from,
           MAX(CASE WHEN valid_to IS NULL THEN state END) AS current_state,
           CAST(SUM(CASE WHEN valid_to IS NOT NULL THEN
             epoch_us(valid_to) - epoch_us(valid_from)
             ELSE 0 END) AS BIGINT) AS closed_us
    FROM intervals
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def a0b_scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 per-user state history from the events change log, reported
    as one row per user (version count, current state, total closed-
    interval dwell time) so the result stays compact at any SF while the
    hash still covers every interval boundary. The builder
    (operators/scd2.py) compresses consecutive duplicate states and
    closes each interval with the next change's timestamp — single
    shuffle, both windows share one Exchange+Sort (asserted in
    tests/test_plans_round5b.py)."""
    hist = scd2_history(
        _t(spark, sf_dir, "events"),
        key_col="user_id",
        state_col="event_type",
        ts_col="ts",
        tiebreak_col="event_id",
    )
    return (
        hist.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_versions"),
            F.min("valid_from").alias("first_from"),
            F.max(F.when(F.col("is_current"), F.col("valid_from"))).alias(
                "current_from"
            ),
            F.max(F.when(F.col("is_current"), F.col("state"))).alias(
                "current_state"
            ),
            F.sum(
                F.when(
                    F.col("valid_to").isNotNull(),
                    F.unix_micros("valid_to") - F.unix_micros("valid_from"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("closed_us"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Count-min-sketch heavy hitters — operators/sketchfreq.py
# ---------------------------------------------------------------------------

_CMS_D, _CMS_W, _CMS_TOP = 4, 1024, 20


def _cms_bucket_duck(row: int) -> str:
    hashed = h60_duck(f"'{row}:' || k")
    return f"{hashed} % {_CMS_W}"


@register(
    "a0b_cms_heavy_hitters",
    f"""
    WITH keys AS (
      SELECT CAST(user_id AS VARCHAR) AS k FROM events
    ),
    cells_raw AS (
      SELECT k, UNNEST([{", ".join(
          f"struct_pack(hrow := {r}, bucket := {_cms_bucket_duck(r)})"
          for r in range(_CMS_D)
      )}]) AS c
      FROM keys
    ),
    cells AS (
      SELECT k, c.hrow AS hrow, c.bucket AS bucket FROM cells_raw
    ),
    sketch AS (
      SELECT hrow, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM cells GROUP BY 1, 2
    ),
    exact AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS exact FROM keys GROUP BY k
    ),
    probes_raw AS (
      SELECT k, UNNEST([{", ".join(
          f"struct_pack(hrow := {r}, bucket := {_cms_bucket_duck(r)})"
          for r in range(_CMS_D)
      )}]) AS c
      FROM exact
    ),
    probes AS (
      SELECT k, c.hrow AS hrow, c.bucket AS bucket FROM probes_raw
    ),
    est AS (
      SELECT p.k, CAST(MIN(s.cnt) AS BIGINT) AS est
      FROM probes p JOIN sketch s
        ON s.hrow = p.hrow AND s.bucket = p.bucket
      GROUP BY p.k
    )
    SELECT e.k, e.est, x.exact, e.est - x.exact AS overcount
    FROM est e JOIN exact x USING (k)
    ORDER BY e.est DESC, e.k
    LIMIT {_CMS_TOP}
    """,
)
def a0b_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over events.user_id: d=4 × w=1024
    counters, estimates = min over rows of the addressed counter, top-20
    by estimate with the exact count and overcount alongside. The sketch
    build's shuffle is bounded at d·w rows per input partition (map-side
    partial agg); the estimate lookup broadcasts the 4096-cell sketch.
    The oracle replays the identical MD5-salted bucketing, so every
    counter — including collisions — matches value-for-value."""
    return cms_heavy_hitters(
        _t(spark, sf_dir, "events"),
        "user_id",
        depth=_CMS_D,
        width=_CMS_W,
        top_n=_CMS_TOP,
    )

# ---------------------------------------------------------------------------
# Incremental SCD2 apply — append-only CDC batch vs full recompute
# ---------------------------------------------------------------------------


@register(
    "a0b_scd2_incremental_apply",
    # full-recompute oracle: identical to a0b_scd2_user_history's — the
    # point of the query is that incremental apply CONVERGES to it
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev IS NULL OR event_type <> prev
    ),
    intervals AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
             CAST(ROW_NUMBER() OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER)
               AS version_n
      FROM changes
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_versions,
           CAST(MAX(version_n) AS INTEGER) AS max_version,
           MIN(valid_from) AS first_from,
           MAX(CASE WHEN valid_to IS NULL THEN state END) AS current_state,
           CAST(SUM(CASE WHEN valid_to IS NOT NULL THEN
             epoch_us(valid_to) - epoch_us(valid_from)
             ELSE 0 END) AS BIGINT) AS closed_us
    FROM intervals
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def a0b_scd2_incremental_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-CDC shape: SCD2 history built from events BEFORE 2024-01-20,
    then the remaining days applied as an append-only delta batch via
    operators/scd2.scd2_apply_append (affected keys recomputed from
    open-interval + delta only; untouched keys anti-join through). The
    oracle is a FULL recompute over all events — matching it value-for-
    value (including rebased version numbers) proves incremental apply
    converges to the batch rebuild."""
    from ..operators.scd2 import scd2_apply_append

    ev = _t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-20").cast("timestamp")
    base = scd2_history(
        ev.filter(F.col("ts") < cutoff),
        key_col="user_id",
        state_col="event_type",
        ts_col="ts",
        tiebreak_col="event_id",
    )
    updated = scd2_apply_append(
        base,
        ev.filter(F.col("ts") >= cutoff),
        key_col="user_id",
        state_col="event_type",
        ts_col="ts",
        tiebreak_col="event_id",
    )
    return (
        updated.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_versions"),
            F.max("version_n").cast("int").alias("max_version"),
            F.min("valid_from").alias("first_from"),
            F.max(F.when(F.col("is_current"), F.col("state"))).alias(
                "current_state"
            ),
            F.sum(
                F.when(
                    F.col("valid_to").isNotNull(),
                    F.unix_micros("valid_to") - F.unix_micros("valid_from"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("closed_us"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Distribution drift (PSI) — operators/drift.py
# ---------------------------------------------------------------------------


@register(
    "a0b_drift_price_psi",
    """
    WITH ref AS (
      SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket
      FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    ),
    cur AS (
      SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    ),
    a AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) n_ref FROM ref GROUP BY bucket),
    b AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) n_cur FROM cur GROUP BY bucket),
    j AS (
      SELECT COALESCE(a.bucket, b.bucket) AS bucket,
             COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
      FROM a FULL OUTER JOIN b ON a.bucket = b.bucket
    ),
    t AS (
      SELECT CAST(SUM(n_ref) AS BIGINT) tot_ref,
             CAST(SUM(n_cur) AS BIGINT) tot_cur,
             CAST(COUNT(*) AS BIGINT) k
      FROM j
    ),
    scored AS (
      SELECT j.bucket, j.n_ref, j.n_cur,
             (j.n_ref + 1) * 1000000 // (t.tot_ref + t.k) AS p_ref_ppm,
             (j.n_cur + 1) * 1000000 // (t.tot_cur + t.k) AS p_cur_ppm,
             CAST(FLOOR(ln(j.n_cur + 1) * 1000000) AS BIGINT)
               + CAST(FLOOR(ln(t.tot_ref + t.k) * 1000000) AS BIGINT)
               - CAST(FLOOR(ln(j.n_ref + 1) * 1000000) AS BIGINT)
               - CAST(FLOOR(ln(t.tot_cur + t.k) * 1000000) AS BIGINT)
               AS logratio_micro
      FROM j CROSS JOIN t
    )
    SELECT bucket, n_ref, n_cur,
           CAST(p_ref_ppm AS BIGINT) AS p_ref_ppm,
           CAST(p_cur_ppm AS BIGINT) AS p_cur_ppm,
           logratio_micro,
           CAST((p_cur_ppm - p_ref_ppm) * logratio_micro AS BIGINT)
             AS psi_contrib_pico
    FROM scored
    ORDER BY bucket
    """,
)
def a0b_drift_price_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI-style distribution drift of order value: 1998+ orders vs the
    pre-1998 reference window, 50k-wide price buckets. Integer-exact
    machinery (operators/drift.py): ppm probabilities via integer
    division, micro-nat log-ratios via the per-distinct-count ilog floor,
    pico-scale PSI contributions as exact BIGINT products — sum/1e12 is
    the classic PSI. Laplace add-one keeps one-sided buckets finite."""
    from ..operators.drift import drift_report

    orders = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    return drift_report(
        orders.filter(F.col("o_orderdate") < cutoff),
        orders.filter(F.col("o_orderdate") >= cutoff),
        F.floor(F.col("o_totalprice") / 50000).cast("bigint"),
    ).orderBy("bucket")
