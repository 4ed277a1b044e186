"""Distribution-drift report between two table snapshots (PSI-style).

The standard data-quality question for a recurring pipeline: did this
batch's distribution move against the reference window? Population-
stability-index machinery, kept INTEGER-EXACT like operators/lmscore.py:
probabilities in ppm via integer division, log-ratios in micro-nats via
the per-distinct-count ``ilog_micro`` floor (cross-engine-stable — see
lmscore's measured ln() ulp analysis), PSI contributions as exact BIGINT
products (pico-scale). Sum the ``psi_contrib_pico`` column and divide by
1e12 for the classic PSI number; > 0.2 is the usual alarm line.

Add-one smoothing on both counts keeps empty-on-one-side buckets finite
(the +1 also counts toward the denominators, standard Laplace form).

Scale: one groupBy per side (map-side partial), a full outer join on the
bucket key (bucket cardinality is bounded by construction — categories
or fixed-width bins), totals as 1-row broadcast crossJoins. Nothing in
the plan depends on row count beyond the two scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .lmscore import ilog_micro


def _bucket_counts(df: DataFrame, bucket: Column) -> DataFrame:
    return (
        df.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def drift_report(
    ref: DataFrame, cur: DataFrame, bucket_expr: Column
) -> DataFrame:
    """Per-bucket drift between ``ref`` and ``cur`` under the bucketing
    expression. Output per bucket: n_ref, n_cur, p_ref_ppm, p_cur_ppm
    (smoothed, integer ppm), logratio_micro (micro-nats, ln(p_cur/p_ref)),
    psi_contrib_pico = (p_cur_ppm - p_ref_ppm) * logratio_micro."""
    a = _bucket_counts(ref, bucket_expr).withColumnRenamed("n", "n_ref")
    b = _bucket_counts(cur, bucket_expr).withColumnRenamed("n", "n_cur")
    joined = (
        a.join(b, "bucket", "full_outer")
        .fillna({"n_ref": 0, "n_cur": 0})
    )
    n_buckets = joined.agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    totals = joined.agg(
        F.sum("n_ref").cast("bigint").alias("tot_ref"),
        F.sum("n_cur").cast("bigint").alias("tot_cur"),
    )
    out = joined.crossJoin(F.broadcast(totals)).crossJoin(F.broadcast(n_buckets))
    # Laplace: p = (n+1) / (tot+k)
    p_ref_ppm = F.expr("(n_ref + 1) * 1000000 div (tot_ref + k)")
    p_cur_ppm = F.expr("(n_cur + 1) * 1000000 div (tot_cur + k)")
    # ln(p_cur/p_ref) = ln(n_cur+1) + ln(tot_ref+k) - ln(n_ref+1) - ln(tot_cur+k)
    logratio = (
        ilog_micro(F.col("n_cur") + 1)
        + ilog_micro(F.col("tot_ref") + F.col("k"))
        - ilog_micro(F.col("n_ref") + 1)
        - ilog_micro(F.col("tot_cur") + F.col("k"))
    )
    return out.select(
        "bucket",
        "n_ref",
        "n_cur",
        p_ref_ppm.cast("bigint").alias("p_ref_ppm"),
        p_cur_ppm.cast("bigint").alias("p_cur_ppm"),
        logratio.cast("bigint").alias("logratio_micro"),
        (
            (p_cur_ppm.cast("bigint") - p_ref_ppm.cast("bigint"))
            * logratio.cast("bigint")
        )
        .cast("bigint")
        .alias("psi_contrib_pico"),
    )
