"""Bucketed-table join layout (sinks.write_bucketed): the co-location
contract must show up in the physical plan — no Exchange, and with
matching in-bucket sort no Sort either — and results must equal the
plain shuffled join."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from gcp_serverless_etl_pipeline_lab_spark.sinks import read_bucketed, write_bucketed
from gcp_serverless_etl_pipeline_lab_spark.sources.tables import load_table

from conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed(spark):
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    write_bucketed(o, "t_orders_b", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "t_lineitem_b",
        ["o_orderkey"],
        8,
        sort_cols=["o_orderkey"],
    )
    yield spark
    spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def _join(spark):
    # hint("merge"): at these fixture sizes Spark would broadcast the
    # orders side, which hides the layout being tested — at real scale
    # both sides are broadcast-ineligible and SMJ is what runs
    return (
        read_bucketed(spark, "t_orders_b")
        .hint("merge")
        .join(read_bucketed(spark, "t_lineitem_b"), "o_orderkey")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )
    )


def test_bucketed_join_no_exchange_no_sort_before_join(spark, bucketed):
    plan = _join(spark)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    tree = plan.split("\n\n")[0]
    join_part = tree.split("SortMergeJoin")[-1] if "SortMergeJoin" in tree else tree
    # the join consumes bucketed scans directly: the ONLY Exchange in the
    # whole plan is the final groupBy aggregation's
    assert tree.count("Exchange") == 1, tree
    # matching in-bucket sort: no Sort node below the join
    assert "Sort" not in join_part, tree


def test_bucketed_join_matches_shuffled_join(spark, bucketed):
    o = load_table(spark, SF_SMOKE, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity", "l_extendedprice"
    )
    expected = sorted(
        map(
            tuple,
            o.join(li, "o_orderkey")
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("l_extendedprice"), 2).alias("rev"),
            )
            .collect(),
        )
    )
    got = sorted(map(tuple, _join(spark).collect()))
    assert got == expected


def test_mismatched_bucket_count_warns_in_plan(spark, bucketed):
    # a table bucketed with a DIFFERENT count loses co-location: the plan
    # reintroduces an Exchange on at least one side
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_extendedprice"
    )
    write_bucketed(li, "t_lineitem_b4", ["o_orderkey"], 4)
    try:
        plan = (
            read_bucketed(spark, "t_orders_b")
            .join(read_bucketed(spark, "t_lineitem_b4"), "o_orderkey")
            ._jdf.queryExecution()
            .explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        )
        assert "Exchange" in plan.split("\n\n")[0]
    finally:
        spark.sql("DROP TABLE IF EXISTS t_lineitem_b4")
