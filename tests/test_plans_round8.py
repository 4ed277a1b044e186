"""Physical-plan assertions for the round-8 queries: the scale claims
in the operator docstrings (map-side split assignment, single gram
shuffle for novelty) must be visible in the plan."""

from __future__ import annotations

from conftest import SF_SMOKE
from gcp_serverless_etl_pipeline_lab_spark.harness import QUERIES


def _plan(spark, name):
    df = QUERIES[name].builder(spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_split_assignment_is_map_side(spark):
    tree = _plan(spark, "a0d_train_split_report")
    head = tree.split("\n\n")[0]
    # one scan of documents; the split CASE evaluates during the scan —
    # the ONLY exchanges are the (split, lang) aggregate and the final
    # order; no join, no Python, nothing shuffles raw rows by key
    assert head.count("Scan parquet") == 1
    assert "Join" not in head
    assert "Python" not in tree
    assert head.count("Exchange") <= 2


def test_gram_novelty_single_gram_shuffle_partial_min(spark):
    tree = _plan(spark, "a0d_gram_novelty")
    head = tree.split("\n\n")[0]
    # the exploded gram frame crosses the wire ONCE: partial_min on the
    # map side of the gram aggregate (the Zipf head reduces before the
    # exchange), and no gram-level join-back anywhere — the only joins
    # run at doc granularity
    assert "partial_min" in tree
    assert "Python" not in tree
    # generator (the shingle explode) feeds exactly one aggregate chain;
    # a second Generate would mean the exploded frame is consumed twice
    assert head.count("Generate") == 1
