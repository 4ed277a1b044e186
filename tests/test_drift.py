"""Unit tests for the PSI drift report (operators/drift.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gcp_serverless_etl_pipeline_lab_spark.operators.drift import drift_report


def _ilog(n: int) -> int:
    return math.floor(math.log(n) * 1_000_000)


def test_hand_computed_psi(spark):
    ref = spark.createDataFrame([("a",)] * 6 + [("b",)] * 2, "c string")
    cur = spark.createDataFrame([("a",)] * 2 + [("c",)] * 2, "c string")
    out = {r["bucket"]: r for r in drift_report(ref, cur, F.col("c")).collect()}
    # k=3 buckets; tot_ref=8, tot_cur=4
    assert set(out) == {"a", "b", "c"}
    a = out["a"]
    assert (a["n_ref"], a["n_cur"]) == (6, 2)
    assert a["p_ref_ppm"] == (6 + 1) * 1_000_000 // (8 + 3)
    assert a["p_cur_ppm"] == (2 + 1) * 1_000_000 // (4 + 3)
    lr = _ilog(3) + _ilog(11) - _ilog(7) - _ilog(7)
    assert a["logratio_micro"] == lr
    assert a["psi_contrib_pico"] == (a["p_cur_ppm"] - a["p_ref_ppm"]) * lr
    # one-sided buckets stay finite via Laplace
    assert out["c"]["n_ref"] == 0 and out["c"]["n_cur"] == 2
    assert out["b"]["n_cur"] == 0 and out["b"]["n_ref"] == 2


def test_identical_distributions_near_zero_psi(spark):
    df = spark.createDataFrame([(i % 5,) for i in range(1000)], "c int")
    total = (
        drift_report(df, df, F.col("c"))
        .agg(F.sum("psi_contrib_pico"))
        .collect()[0][0]
    )
    # identical sides: log-ratio is 0 micro-nats in every bucket
    assert total == 0
