"""Physical-plan assertions for the round-5 operators (same rationale as
test_plans_round4: the plan shapes the docstrings argue for must actually
materialize, so Catalyst regressions fail CI rather than bench drift)."""

from __future__ import annotations

from conftest import SF_SMOKE
from gcp_serverless_etl_pipeline_lab_spark.harness import QUERIES


def _plan(spark, name):
    df = QUERIES[name].builder(spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_seq_dedup_single_generate_and_partial_agg(spark):
    tree = _plan(spark, "a0_seq_dedup_spans").split("\n\n")[0]
    # one posexplode of window starts, no second Generate pass
    assert tree.count("Generate") == 1
    # first-wins via composite MIN -> hash aggregation, never a Window
    assert "Window" not in tree
    # span text joins back via broadcast (repeated spans are small)
    assert "BroadcastHashJoin" in tree


def test_domain_quota_gets_window_group_limit_pushdown(spark):
    tree = _plan(spark, "a0_domain_quota_sample").split("\n\n")[0]
    # quota cut applied on the map side BEFORE the by-domain shuffle and
    # again after — both WindowGroupLimit nodes present
    assert tree.count("WindowGroupLimit") == 2


def test_pii_redact_is_map_side_only(spark):
    tree = _plan(spark, "a0_pii_redact_stats").split("\n\n")[0]
    # scan -> project -> filter; the only Exchange is the final orderBy
    assert tree.count("Exchange") == 1
    assert "Window" not in tree and "Generate" not in tree
    assert "BatchEvalPython" not in tree  # no Python UDF in the hot path


def test_winnow_no_window_no_second_generate(spark):
    tree = _plan(spark, "a0_winnow_repeated_fps").split("\n\n")[0]
    # fingerprint selection is array-local: one explode of the selected
    # fingerprints; first-wins again via composite MIN, no Window node
    assert tree.count("Generate") == 1
    assert "Window" not in tree


def test_stream_totals_partial_aggregation(spark):
    tree = _plan(spark, "a0_stream_user_totals").split("\n\n")[0]
    # two-phase hash aggregate (map-side partial) around one Exchange
    assert tree.count("HashAggregate") == 2
