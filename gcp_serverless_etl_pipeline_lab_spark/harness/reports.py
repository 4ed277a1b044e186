"""Aggregate-report harness queries: the reference's SQL analytics surface
(A1-A7 validation/summary/revenue reports), statistical aggregates (A8),
sketch-based approximate aggregates with honest tolerance-gate oracles,
one-pass table profiling, and the declarative data-quality report.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ._registry import _t, register

# ---------------------------------------------------------------------------
# A1–A7 — the reference's SQL analytics surface on the shared tables
# ---------------------------------------------------------------------------


@register(
    "a1_validation_aggregate",
    """
    SELECT COUNT(*) AS total_rows,
           COUNT(DISTINCT o_orderkey) AS unique_ids,
           CAST(SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS positive_rows
    FROM orders
    """,
)
def a1_validation_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.countDistinct("o_orderkey").alias("unique_ids"),
        F.sum(F.when(F.col("o_totalprice") > 0, 1).otherwise(0)).alias("positive_rows"),
    )


@register(
    "a2_having_gate",
    """
    SELECT * FROM (
      SELECT COUNT(*) AS total_rows,
             COUNT(DISTINCT o_orderkey) AS unique_ids,
             CAST(SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS positive_rows
      FROM orders
    ) WHERE total_rows > 0 AND unique_ids = total_rows AND positive_rows = total_rows
    """,
)
def a2_having_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    agg = a1_validation_aggregate(spark, sf_dir)
    return agg.filter(
        (F.col("total_rows") > 0)
        & (F.col("unique_ids") == F.col("total_rows"))
        & (F.col("positive_rows") == F.col("total_rows"))
    )


@register(
    "a4_summary_report",
    """
    SELECT COUNT(*) AS total_sales,
           ROUND(SUM(l_extendedprice * l_quantity), 2) AS total_revenue,
           ROUND(AVG(l_extendedprice * l_quantity), 2) AS avg_sale_value,
           COUNT(DISTINCT l_partkey) AS unique_products,
           strftime(MAX(l_shipdate), '%Y-%m-%d') AS latest_sale_date
    FROM lineitem
    """,
)
def a4_summary_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    total = F.col("l_extendedprice") * F.col("l_quantity")
    return _t(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("total_sales"),
        F.round(F.sum(total), 2).alias("total_revenue"),
        F.round(F.avg(total), 2).alias("avg_sale_value"),
        F.countDistinct("l_partkey").alias("unique_products"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("latest_sale_date"),
    )


@register(
    "a5_revenue_by_flag",
    """
    SELECT l_returnflag, ROUND(SUM(l_extendedprice * l_quantity), 2) AS revenue
    FROM lineitem GROUP BY l_returnflag ORDER BY revenue DESC, l_returnflag
    """,
)
def a5_revenue_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_returnflag")
    )


@register(
    "a5_revenue_by_product",
    """
    SELECT p_name AS product, ROUND(SUM(l_extendedprice * l_quantity), 2) AS revenue
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_name ORDER BY revenue DESC, product
    """,
)
def a5_revenue_by_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 against the dimension join: `part` is the small side → broadcast
    hash join, no shuffle of the fact table for the join itself."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_extendedprice", "l_quantity")
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy(F.col("p_name").alias("product"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "product")
    )


@register(
    "a6_demo_summary",
    """
    SELECT COUNT(*) AS total_rows,
           strftime(MAX(l_shipdate), '%Y-%m-%d') AS latest_sale,
           ROUND(SUM(l_extendedprice * l_quantity), 2) AS total_revenue
    FROM lineitem
    """,
)
def a6_demo_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("latest_sale"),
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2).alias("total_revenue"),
    )


@register(
    "a7_max_dates",
    """
    SELECT strftime(MAX(l_shipdate), '%Y-%m-%d') AS max_ship,
           strftime(MIN(l_shipdate), '%Y-%m-%d') AS min_ship
    FROM lineitem
    """,
)
def a7_max_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").agg(
        F.date_format(F.max("l_shipdate"), "yyyy-MM-dd").alias("max_ship"),
        F.date_format(F.min("l_shipdate"), "yyyy-MM-dd").alias("min_ship"),
    )

@register(
    "a8_stats_aggregates",
    """
    SELECT l_returnflag,
           ROUND(stddev_samp(l_extendedprice), 2) AS sd_price,
           ROUND(var_samp(l_quantity), 2) AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           ROUND(percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 2)
               AS p25_price,
           ROUND(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 2)
               AS median_price,
           ROUND(percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice), 2)
               AS p75_price,
           ROUND(skewness(l_quantity), 3) + 0.0 AS skew_qty,
           ROUND(kurtosis(l_quantity), 3) + 0.0 AS kurt_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def a8_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family. Moments (stddev/var/corr/covar/skew/
    kurtosis) are one streaming hash aggregate. Exact discrete percentiles
    are computed SORT-BASED: rank rows per group with a window, pick the
    value at ceil(p*n) — percentile_disc's definition (first value whose
    cume_dist >= p). Spark's native percentile_disc aggregate buffers every
    group's values in executor memory (ObjectHashAggregate), which OOMs at
    real scale; a window sort spills. (At 100 TB you would use
    approx_percentile and drop oracle-exactness.) skew/kurtosis rounded to
    3 — higher moments accumulate in engine-specific merge order and drift
    ~1e-5; +0.0 normalizes IEEE negative zero."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    moments = (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
            F.round(F.var_samp("l_quantity"), 2).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "covar_qty_price"
            ),
            (F.round(F.skewness("l_quantity"), 3) + 0.0).alias("skew_qty"),
            (F.round(F.kurtosis("l_quantity"), 3) + 0.0).alias("kurt_qty"),
        )
    )
    wq = Window.partitionBy("l_returnflag").orderBy("p")
    wn = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag", F.col("l_extendedprice").alias("p")
    ).select(
        "l_returnflag",
        "p",
        F.row_number().over(wq).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def _pick(frac: float, name: str):
        # ceil(p*n): exact for quarter fractions (no FP dust)
        return F.round(
            F.min(F.when(F.col("rn") == F.ceil(F.lit(frac) * F.col("n")), F.col("p"))),
            2,
        ).alias(name)

    pct = ranked.groupBy("l_returnflag").agg(
        _pick(0.25, "p25_price"),
        _pick(0.5, "median_price"),
        _pick(0.75, "p75_price"),
    )
    return (
        moments.join(F.broadcast(pct), "l_returnflag")
        .select(
            "l_returnflag",
            "sd_price",
            "var_qty",
            "corr_qty_price",
            "covar_qty_price",
            "p25_price",
            "median_price",
            "p75_price",
            "skew_qty",
            "kurt_qty",
        )
        .orderBy("l_returnflag")
    )

@register(
    "approx_distinct_users",
    """
    SELECT COUNT(DISTINCT user_id) AS exact_users,
           COUNT(*) AS n_events,
           TRUE AS approx_ok
    FROM events
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user count with an honest oracle contract.

    Sketch values are engine-specific (Spark HLL++ vs DuckDB's HLL give
    different estimates for the same data), so the cross-engine gate is:
    the EXACT count matches, and Spark's sketch lands within the
    configured rsd band of it (asserted as a boolean both engines emit).
    At 100 TB the sketch is the operative path — approx_count_distinct
    is a single map-side-combinable aggregate, while exact COUNT(DISTINCT)
    shuffles every distinct key; rsd=0.02 keeps the sketch ~4 KB/group.
    """
    ev = _t(spark, sf_dir, "events")
    agg = ev.agg(
        F.count_distinct(F.col("user_id")).alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
    )
    return agg.select(
        "exact_users",
        "n_events",
        (
            F.abs(F.col("_approx") - F.col("exact_users"))
            <= F.lit(0.05) * F.col("exact_users")
        ).alias("approx_ok"),
    )


# ---------------------------------------------------------------------------
# Declarative data-quality constraint report
# ---------------------------------------------------------------------------


@register(
    "dq_constraint_report",
    """
    SELECT constraint_name, checked, violations FROM (
      SELECT 'orders.o_custkey_not_null' AS constraint_name,
             (SELECT COUNT(*) FROM orders) AS checked,
             (SELECT CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              FROM orders) AS violations
      UNION ALL
      SELECT 'orders.o_orderkey_unique',
             (SELECT COUNT(*) FROM orders),
             (SELECT CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders)
      UNION ALL
      SELECT 'orders.totalprice_positive',
             (SELECT COUNT(*) FROM orders),
             (SELECT CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT)
              FROM orders)
      UNION ALL
      SELECT 'orders.o_orderstatus_domain',
             (SELECT COUNT(*) FROM orders),
             (SELECT CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) AS BIGINT)
              FROM orders)
      UNION ALL
      SELECT 'orders.lineitem_orderkey_referential',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
              LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
                ON l.l_orderkey = o.o_orderkey
              WHERE o.o_orderkey IS NULL)
    )
    ORDER BY constraint_name
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk constraint evaluation (operators/quality_checks.py): all
    single-table checks in ONE aggregation pass + unpivot, referential
    integrity as an anti-join of projected keys. Generalizes the
    reference's three hard-coded post-load checks."""
    from ..operators.quality_checks import constraint_report

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rep = constraint_report(
        o,
        not_null=["o_custkey"],
        unique=["o_orderkey"],
        predicates={"totalprice_positive": "o_totalprice > 0"},
        domains={"o_orderstatus": ["O", "F", "P"]},
        table="orders",
    )
    ref = constraint_report(
        li,
        referential={"lineitem_orderkey_referential": (o, "l_orderkey", "o_orderkey")},
        table="orders",
    )
    # The referential check is evaluated over lineitem but reported under
    # the orders suite (its checked column counts lineitem rows).
    return rep.unionAll(ref).orderBy("constraint_name")


# ---------------------------------------------------------------------------
# One-pass table profile (unpivoted per-column stats)
# ---------------------------------------------------------------------------


@register(
    "profile_orders_table",
    """
    SELECT column_name, n_null, n_distinct, min_s, max_s FROM (
      SELECT 'o_orderkey' AS column_name,
             CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             COUNT(DISTINCT o_orderkey) AS n_distinct,
             CAST(MIN(o_orderkey) AS VARCHAR) AS min_s,
             CAST(MAX(o_orderkey) AS VARCHAR) AS max_s
      FROM orders
      UNION ALL
      SELECT 'o_custkey',
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(DISTINCT o_custkey),
             CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus',
             CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(DISTINCT o_orderstatus),
             MIN(o_orderstatus), MAX(o_orderstatus)
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority',
             CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(DISTINCT o_orderpriority),
             MIN(o_orderpriority), MAX(o_orderpriority)
      FROM orders
      UNION ALL
      SELECT 'o_orderdate',
             CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(DISTINCT o_orderdate),
             strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S'),
             strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')
      FROM orders
      UNION ALL
      SELECT 'o_totalprice_cents',
             CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(DISTINCT CAST(ROUND(o_totalprice * 100) AS BIGINT)),
             CAST(MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS VARCHAR),
             CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS VARCHAR)
      FROM orders
    )
    ORDER BY column_name
    """,
)
def profile_orders_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile (null count, distinct count, min/max) in ONE
    aggregation pass + stack() unpivot — the schema-drift/data-audit
    primitive. Doubles profile as integer cents and timestamps as
    formatted strings so min/max stringification is engine-stable."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    row = o.agg(
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).cast("long").alias("nn0"),
        F.count_distinct("o_orderkey").alias("nd0"),
        F.min("o_orderkey").cast("string").alias("mn0"),
        F.max("o_orderkey").cast("string").alias("mx0"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).cast("long").alias("nn1"),
        F.count_distinct("o_custkey").alias("nd1"),
        F.min("o_custkey").cast("string").alias("mn1"),
        F.max("o_custkey").cast("string").alias("mx1"),
        F.sum(F.when(F.col("o_orderstatus").isNull(), 1).otherwise(0)).cast("long").alias("nn2"),
        F.count_distinct("o_orderstatus").alias("nd2"),
        F.min("o_orderstatus").alias("mn2"),
        F.max("o_orderstatus").alias("mx2"),
        F.sum(F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0)).cast("long").alias("nn3"),
        F.count_distinct("o_orderpriority").alias("nd3"),
        F.min("o_orderpriority").alias("mn3"),
        F.max("o_orderpriority").alias("mx3"),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)).cast("long").alias("nn4"),
        F.count_distinct("o_orderdate").alias("nd4"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("mn4"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("mx4"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)).cast("long").alias("nn5"),
        F.count_distinct(cents).alias("nd5"),
        F.min(cents).cast("string").alias("mn5"),
        F.max(cents).cast("string").alias("mx5"),
    )
    cols = [
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderpriority", "o_orderdate", "o_totalprice_cents",
    ]
    stack_args = ", ".join(
        f"'{c}', nn{i}, nd{i}, mn{i}, mx{i}" for i, c in enumerate(cols)
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack_args})"
            " AS (column_name, n_null, n_distinct, min_s, max_s)"
        )
    ).orderBy("column_name")

# ---------------------------------------------------------------------------
# Approximate percentiles with an honest tolerance gate
# ---------------------------------------------------------------------------


@register(
    "approx_percentile_gate",
    """
    WITH ranked AS (
      SELECT l_extendedprice AS p,
             row_number() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
             COUNT(*) OVER () AS n
      FROM lineitem
    )
    SELECT
      ROUND(MIN(CASE WHEN rn = (n + 1) // 2 THEN p END), 2) AS exact_p50,
      ROUND(MIN(CASE WHEN rn = (9 * n + 9) // 10 THEN p END), 2) AS exact_p90,
      ROUND(MIN(CASE WHEN rn = (99 * n + 99) // 100 THEN p END), 2) AS exact_p99,
      TRUE AS approx_ok
    FROM ranked
    """,
)
def approx_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (rank-pick with INTEGER index
    arithmetic — ceil(p*n) as (p_num*n + p_num) div p_den, no FP-dust
    disagreements) compared across engines, plus a boolean asserting
    Spark's approx_percentile lands within 1% of each. Same contract
    family as approx_distinct_users: the sketch value itself is
    engine-specific; its accuracy bound is what's verified. At 100 TB
    the sketch path is the operative one (single map-side-combinable
    pass vs a global sort)."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    ranked = li.select(
        F.col("l_extendedprice").alias("p"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    exact = ranked.agg(
        F.round(F.min(F.when(F.expr("rn = (n + 1) div 2"), F.col("p"))), 2).alias("exact_p50"),
        F.round(F.min(F.when(F.expr("rn = (9 * n + 9) div 10"), F.col("p"))), 2).alias("exact_p90"),
        F.round(F.min(F.when(F.expr("rn = (99 * n + 99) div 100"), F.col("p"))), 2).alias("exact_p99"),
    )
    approx = li.agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10_000).alias("ap")
    )
    return exact.crossJoin(F.broadcast(approx)).select(
        "exact_p50",
        "exact_p90",
        "exact_p99",
        (
            (F.abs(F.expr("ap[0]") - F.col("exact_p50")) <= 0.01 * F.col("exact_p50"))
            & (F.abs(F.expr("ap[1]") - F.col("exact_p90")) <= 0.01 * F.col("exact_p90"))
            & (F.abs(F.expr("ap[2]") - F.col("exact_p99")) <= 0.01 * F.col("exact_p99"))
        ).alias("approx_ok"),
    )
