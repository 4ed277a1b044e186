"""Plan pins for the round-9 queries — the physical-plan properties the
operator docstrings claim (column pruning, materialized assignment, no
stray shuffles) asserted on `.executedPlan`, so a regression in plan
shape fails before it costs wall-clock at scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_serverless_etl_pipeline_lab_spark.harness import QUERIES
from gcp_serverless_etl_pipeline_lab_spark.sources.tables import load_table

from conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_temperature_mixture_prunes_text_column(spark):
    """The mixture report touches only (doc_id, source): the documents
    scans must NOT read the text column (at 100 TB the text is ~all the
    bytes), and the membership thresholds are constant-folded literals
    — no join materializes the rate table."""
    df = QUERIES["a0f_temperature_mixture"].builder(spark, SF_SMOKE)
    plan = _plan(df)
    assert "text" not in plan, "mixture plan reads the text column"
    assert "BroadcastNestedLoop" not in plan


def test_knn_graph_auto_routed_plan_has_materialized_assignment(spark):
    """The routed graph evaluates the centroid-distance machinery ONCE
    (eager localCheckpoint): the final query plan must consume the
    materialized assignment (ExistingRDD scans), with ZERO residual
    distance-sort expressions — if array_sort reappears, both join
    branches are re-evaluating the k x dim fold per row again."""
    from gcp_serverless_etl_pipeline_lab_spark.operators.similarity import (
        knn_graph_auto,
    )

    emb = load_table(spark, SF_SMOKE, "embeddings")
    df = knn_graph_auto(emb, 64, k=3, route_threshold=0)
    plan = _plan(df)
    assert "ExistingRDD" in plan, "assignment not materialized"
    assert "array_sort" not in plan, "distance sort re-evaluated per branch"


def test_bpe_compression_report_broadcasts_word_counts(spark):
    """Per-doc token counts come from a BROADCAST join of the folded
    distinct-word table onto the exploded doc words — no shuffle of the
    word stream (the plan that beat the per-occurrence fold 3x)."""
    df = QUERIES["a0f_bpe_compression_report"].builder(spark, SF_SMOKE)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bpe_pair_count_aggregate_is_partial(spark):
    """One training round's pair count must partially aggregate map-side
    (the Zipf head of adjacent pairs reduces before the exchange)."""
    from gcp_serverless_etl_pipeline_lab_spark.operators.bpetrain import (
        _PAIRS,
        word_symbol_table,
    )

    words = word_symbol_table(
        load_table(spark, SF_SMOKE, "documents").select("text")
    )
    pairs = (
        words.select("cnt", F.explode(F.expr(_PAIRS)).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("w"))
    )
    plan = _plan(pairs)
    assert plan.count("HashAggregate") >= 2, "no map-side partial aggregate"
