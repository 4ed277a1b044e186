"""Physical-plan assertions for the round-4 operators: the plan shapes
argued in docstrings/BASELINE.md must actually materialize, so a
regression in Catalyst usage (lost broadcast, extra Generate pass,
nested-loop fallback) fails CI rather than only showing up in bench
drift."""

from __future__ import annotations

from conftest import SF_SMOKE
from gcp_serverless_etl_pipeline_lab_spark.harness import QUERIES


def _plan(spark, name):
    df = QUERIES[name].builder(spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_range_join_has_no_nested_loop_or_cartesian(spark):
    plan = _plan(spark, "range_join_bucketed")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_knn_graph_gets_window_group_limit_pushdown(spark):
    plan = _plan(spark, "knn_graph_blocked")
    assert "WindowGroupLimit" in plan  # top-k applied before the final shuffle


def test_bm25_single_generate_pass(spark):
    tree = _plan(spark, "bm25_keyword_search").split("\n\n")[0]
    assert tree.count("Generate") == 1  # df-as-window keeps one explode


def test_s1_scan_pushdown_still_holds(spark):
    plan = _plan(spark, "s1_scan_filter_project")
    assert "PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45" in plan


def test_stratified_sample_broadcasts_rates(spark):
    plan = _plan(spark, "sample_stratified")
    assert "BroadcastHashJoin" in plan
