"""Plan pins for the round-15 additions — the phrase-constrained hybrid
must keep BOTH legs' partition pruning under the phrase semi-join
(term buckets on postings AND positions, cells on vectors), and the
batch phrase probe must read the positions artifact ONCE per
generation for the whole batch, not once per phrase."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from gcp_serverless_etl_pipeline_lab_spark.operators import annindex, lexindex
from gcp_serverless_etl_pipeline_lab_spark.sources.tables import load_table

from conftest import SF_SMOKE

EMB_DIM = 64
TERMS = ["join", "filter", "vector"]


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_hybrid_phrase_keeps_both_legs_pruned(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    lex = str(tmp_path / "lex")
    ann = str(tmp_path / "ann")
    lexindex.build_lexical_index(docs, lex, positions=True)
    annindex.build_ann_index(
        emb, ann, EMB_DIM, cells=8, iters=2, sample_rate=1.0
    )
    q = emb.filter(F.col("vec_id") == 7)
    df = lexindex.hybrid_topk_rrf_from_index(
        spark, lex, ann, TERMS, q, k=10, phrase=["window", "join"]
    )
    plan = _plan(df)
    # every parquet leg stays partition-pruned: postings + positions on
    # tb, vectors on cell
    assert len(re.findall(r"PartitionFilters: \[[^\]]*tb#", plan)) >= 2, (
        "phrase-constrained hybrid lost term-bucket pruning on a lex leg"
    )
    assert "PartitionFilters: [cell#" in plan, (
        "phrase-constrained hybrid lost ANN cell pruning"
    )
    assert "PushedFilters: [In(term" in plan, (
        "term predicates no longer pushed under the phrase semi-join"
    )


def test_batch_phrase_probe_scans_positions_once_per_generation(
    spark, tmp_path
):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    idx = str(tmp_path / "lex")
    lexindex.build_lexical_index(
        docs.filter(F.col("doc_id") % 2 == 0), idx, positions=True
    )
    assert lexindex.append_lexical_index(
        spark, docs.filter(F.col("doc_id") % 2 == 1), idx, "odd"
    ) is True
    phrases = spark.createDataFrame(
        [(0, "window join"), (1, "the filter"), (2, "join join")],
        "query_id bigint, phrase string",
    )
    df = lexindex.phrase_matching_docs_batch(spark, idx, phrases)
    plan = _plan(df)
    # positions is the ONLY per-corpus artifact in the plan: one scan
    # per generation for the whole batch (2 gens here), NOT per phrase
    # (3 phrases x 2 gens = 6 would mean the batch re-scans per phrase)
    n_scans = len(re.findall(r"PartitionFilters: \[[^\]]*tb#", plan))
    assert n_scans == 2, (
        f"batch phrase probe has {n_scans} positions scans; expected one "
        "per generation (2)"
    )
    assert "PushedFilters: [In(term" in plan


def test_batch_phrase_probe_keeps_bucket_pruning(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    idx = str(tmp_path / "lex")
    lexindex.build_lexical_index(docs, idx, positions=True)
    phrases = spark.createDataFrame(
        [(0, "window join")], "query_id bigint, phrase string"
    )
    df = lexindex.phrase_matching_docs_batch(spark, idx, phrases)
    plan = _plan(df)
    assert re.search(r"PartitionFilters: \[[^\]]*tb#", plan), (
        "batch phrase probe lost the term-bucket partition filter"
    )


def test_proximity_probe_keeps_term_bucket_pruning(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    idx = str(tmp_path / "lex")
    lexindex.build_lexical_index(docs, idx, positions=True)
    df = lexindex.proximity_matching_docs(spark, idx, TERMS, window=8)
    plan = _plan(df)
    assert re.search(r"PartitionFilters: \[[^\]]*tb#", plan), (
        "proximity probe lost the term-bucket partition filter"
    )
    assert "PushedFilters: [In(term" in plan
    # positions only — the postings' tf column must not be scanned
    assert "tf#" not in plan
