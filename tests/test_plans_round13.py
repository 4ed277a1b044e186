"""Plan pins for the round-13 additions — metadata-filtered retrieval
must keep both legs' partition pruning (term buckets on the postings,
cells on the vectors): the allowed-set filter is a semi-join on the
candidate stream, never a reason to widen the scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_serverless_etl_pipeline_lab_spark.operators import annindex, lexindex
from gcp_serverless_etl_pipeline_lab_spark.sources.tables import load_table

from conftest import SF_SMOKE

EMB_DIM = 64
TERMS = ["join", "filter", "vector"]


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filtered_bm25_keeps_term_bucket_pruning(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    idx = str(tmp_path / "lex")
    lexindex.build_lexical_index(docs, idx)
    allowed = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    df = lexindex.bm25_topk_from_index(
        spark, idx, TERMS, k=10, filter_ids=allowed
    )
    plan = _plan(df)
    # scan identity via the partition-filter column, not the file path —
    # plan toString elides long paths under pytest's tmp dirs
    assert "PartitionFilters: [tb#" in plan, (
        "filtered BM25 probe lost the term-bucket partition filter"
    )
    assert "PushedFilters: [In(term" in plan, (
        "term predicate no longer pushed to the postings scan"
    )


def test_filtered_ann_keeps_cell_pruning(spark, tmp_path):
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    idx = str(tmp_path / "ann")
    annindex.build_ann_index(
        emb, idx, EMB_DIM, cells=8, iters=2, sample_rate=1.0
    )
    allowed = emb.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("doc_id")
    )
    queries = emb.filter(F.col("vec_id") == 7)
    df = annindex.query_ann_index(
        spark, queries, idx, k=5, nprobe=2, filter_ids=allowed
    )
    plan = _plan(df)
    assert "PartitionFilters: [cell#" in plan, (
        "filtered ANN probe lost the cell partition filter"
    )


def test_vec_membership_probe_prunes_buckets_and_skips_vectors(spark, tmp_path):
    """The ANN membership probe must read the veclist pruned to the
    asked ids' vb buckets and never touch the embedding-carrying
    vectors/ (cell partitioning prunes nothing for an id lookup)."""
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    idx = str(tmp_path / "ann")
    annindex.build_ann_index(
        emb, idx, EMB_DIM, cells=8, iters=2, sample_rate=1.0
    )
    # multiples of 128 land in vb=0 only — a one-value partition list
    asked = spark.range(0, 512, 128).select(F.col("id").alias("vec_id"))
    df = annindex.indexed_vec_ids(spark, idx, asked)
    plan = _plan(df)
    import re

    assert re.search(r"PartitionFilters: \[[^\]]*vb#", plan), (
        "membership probe lost the vec-bucket partition filter"
    )
    assert "embedding" not in plan and "cell#" not in plan, (
        "membership probe touches the vectors artifact"
    )
