"""Physical-plan assertions for the round-6 queries: the scale claims in
the docstrings (single scan, zero Python, aggregate reuse, broadcast
survivors) must be visible in the plan."""

from __future__ import annotations

from conftest import SF_SMOKE
from gcp_serverless_etl_pipeline_lab_spark.harness import QUERIES


def _plan(spark, name):
    df = QUERIES[name].builder(spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_bpe_pretoken_one_scan_no_python(spark):
    tree = _plan(spark, "text_bpe_pretoken_stats")
    head = tree.split("\n\n")[0]
    # one vectorized pass over documents: single scan, no Python anywhere,
    # and only the groupBy(lang) + final-sort exchanges
    assert head.count("Scan parquet") == 1
    assert "Python" not in tree
    assert head.count("Exchange") <= 2


def test_q18_single_lineitem_scan_broadcast_survivors(spark):
    tree = _plan(spark, "a0b_tpch_q18_big_orders")
    head = tree.split("\n\n")[0]
    # the per-order aggregate serves gate AND output column: lineitem is
    # scanned exactly once (3 scans total = lineitem + orders + customer)
    assert head.count("Scan parquet") == 3
    # HAVING survivors and the customer dim both ride broadcast joins;
    # nothing falls back to a sort-merge join of the full fact table
    assert head.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in head
    assert "Python" not in tree


def test_dsir_no_python_no_cartesian(spark):
    tree = _plan(spark, "a0_dsir_importance_select")
    head = tree.split("\n\n")[0]
    # every stage is JVM-side; the only nested-loop joins are the 1-row
    # vocabulary broadcasts (bounded), never a data-sized cross product
    assert "Python" not in tree
    assert "CartesianProduct" not in head
    # hot-key routing rides broadcasts; the trained pass must not have
    # turned the count joins into plain shuffle joins of the full counts
    assert head.count("BroadcastHashJoin") + head.count(
        "BroadcastNestedLoopJoin"
    ) >= 4


def test_dsir_staged_aggregates_bound_corpus_scans(spark):
    """Round-8 plan contract for DSIR, updated for the round-16 staging
    GATE (stage=None persists the c12 aggregates only above the measured
    source-size crossover — OPTIMIZATION_r16.md). The STAGED spelling
    must still bound distinct document scans via cached aggregates (the
    unstaged two-pass plan had 24); the round-6/7 docstring bet that
    ReuseExchange would collapse the repeated subtrees stays pinned as
    never firing. The smoke corpus sits BELOW the gate, so the registered
    query's auto plan must carry no cache at this size."""
    import re

    from pyspark.sql import functions as F

    from gcp_serverless_etl_pipeline_lab_spark.operators.lmscore import (
        dsir_importance_micro,
    )
    from gcp_serverless_etl_pipeline_lab_spark.sources.tables import load_table

    # the gate: below the crossover the registered query recomputes — no
    # cache in its plan. Checked FIRST: building the staged spelling
    # below persists the c12 aggregates, and Spark's CacheManager
    # substitutes cached plans into any LATER identical subtree.
    auto_tree = _plan(spark, "a0_dsir_importance_select")
    assert "InMemoryTableScan" not in auto_tree

    docs = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "lang", "text"
    )
    staged = dsir_importance_micro(
        docs, docs.filter(F.col("lang") == "en"), hot_threshold=1000, stage=True
    )
    tree = staged._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # the staged c12 tables appear as cached scans
    assert "InMemoryTableScan" in tree
    # distinct physical scan NODES (the formatted plan repeats a node id
    # at every reference; count ids, not occurrences)
    scan_ids = set(re.findall(r"\((\d+)\) Scan parquet", tree))
    assert len(scan_ids) <= 6, f"document re-scans crept back: {len(scan_ids)}"
    assert "ReusedExchange" not in tree  # the bet that never fired
    # release the staged caches so later tests' dsir plans are unpolluted
    spark.catalog.clearCache()
