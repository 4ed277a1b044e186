"""Persisted IVF index (operators/annindex.py): build-once-query-many
parity with the per-invocation ivf_trained_topk, cell partition pruning,
and vacuum of orphaned text-index generations (operators/incremental.py
vacuum_index)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from gcp_serverless_etl_pipeline_lab_spark.operators import annindex, similarity
from gcp_serverless_etl_pipeline_lab_spark.sources.tables import load_table

from conftest import SF_SMOKE


def _corpus_queries(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    return emb, emb.filter(F.col("vec_id") < 10)


def test_stored_index_matches_per_invocation_ivf(spark, tmp_path):
    corpus, queries = _corpus_queries(spark)
    idx = str(tmp_path / "ann")
    annindex.build_ann_index(corpus, idx, 64, cells=8, iters=2, sample_rate=1.0)
    got = sorted(
        map(
            tuple,
            annindex.query_ann_index(spark, queries, idx, k=5, nprobe=2).collect(),
        )
    )
    _, model = annindex.load_ann_model(idx)
    want = sorted(
        map(
            tuple,
            similarity.ivf_trained_topk(
                corpus, queries, 64, k=5, nprobe=2, model=model
            ).collect(),
        )
    )
    assert got == want and got


def test_query_scan_prunes_to_probed_cells(spark, tmp_path):
    """A single query probes nprobe cells; the stored-vector scan must
    carry a partition filter on exactly those cells."""
    corpus, queries = _corpus_queries(spark)
    idx = str(tmp_path / "ann")
    annindex.build_ann_index(corpus, idx, 64, cells=8, iters=2, sample_rate=1.0)
    one = queries.orderBy("vec_id").limit(1)
    df = annindex.query_ann_index(spark, one, idx, k=5, nprobe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cell" in plan
    assert df.count() == 5


def test_model_roundtrips_exactly(spark, tmp_path):
    corpus, _ = _corpus_queries(spark)
    idx = str(tmp_path / "ann")
    model = similarity.kmeans_centroids(corpus, 64, k=8, iters=2, sample_rate=1.0)
    annindex.build_ann_index(corpus, idx, 64, model=model)
    dim, loaded = annindex.load_ann_model(idx)
    assert dim == 64 and loaded == model


def test_vacuum_index_sweeps_only_stale_orphans(spark, tmp_path):
    from gcp_serverless_etl_pipeline_lab_spark.operators import incremental

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    idx = str(tmp_path / "tidx")
    incremental.build_base_index(docs, idx, max_df=1000)
    # orphan: a crashed append's generation, never committed
    incremental._write_generation(
        idx,
        7,
        hashes=docs.limit(1).select(F.md5("text").alias("k")),
        grams=spark.createDataFrame([], incremental._GRAMS_SCHEMA),
        sizes=spark.createDataFrame([], incremental._SIZES_SCHEMA),
        gramdf=spark.createDataFrame([], incremental._GRAMDF_SCHEMA),
        capped=spark.createDataFrame([], incremental._CAPPED_SCHEMA),
    )
    # fresh orphan survives (could be an in-flight append)
    assert incremental.vacuum_index(idx, min_age_seconds=3600) == []
    # age it past the horizon -> swept, across every artifact
    for artifact in ("hashes", "grams", "sizes", "gramdf", "capped"):
        d = os.path.join(idx, artifact, "gen=7")
        for r, _, fs in os.walk(d):
            for f in fs:
                os.utime(os.path.join(r, f), (1, 1))
        os.utime(d, (1, 1))
    swept = incremental.vacuum_index(idx, min_age_seconds=3600)
    assert swept == sorted(
        f"{a}/gen=7" for a in ("hashes", "grams", "sizes", "gramdf", "capped")
    )
    # committed generation untouched; probes still work
    assert os.path.isdir(os.path.join(idx, "grams", "gen=0"))
    probe = docs.limit(5).select((F.col("doc_id") + 1).alias("doc_id"), "text")
    assert incremental.classify_batch_vs_index(spark, probe, idx).count() == 5


def test_ann_append_matches_rebuild_with_pinned_model(spark, tmp_path):
    corpus, queries = _corpus_queries(spark)
    base = corpus.filter(F.col("vec_id") % 2 == 0)
    inc = corpus.filter(F.col("vec_id") % 2 == 1)
    appended = str(tmp_path / "app")
    annindex.build_ann_index(base, appended, 64, cells=8, iters=2, sample_rate=1.0)
    assert annindex.append_ann_index(spark, inc, appended, "odd") is True
    # rebuild over the FULL corpus with the SAME pinned model
    _, model = annindex.load_ann_model(appended)
    rebuilt = str(tmp_path / "reb")
    annindex.build_ann_index(corpus, rebuilt, 64, model=model)
    got = sorted(
        map(tuple, annindex.query_ann_index(spark, queries, appended, 5, 2).collect())
    )
    want = sorted(
        map(tuple, annindex.query_ann_index(spark, queries, rebuilt, 5, 2).collect())
    )
    assert got == want and got
    # idempotent replay; empty increment is a no-op
    assert annindex.append_ann_index(spark, inc, appended, "odd") is False
    assert (
        annindex.append_ann_index(
            spark, inc.filter(F.lit(False)), appended, "empty"
        )
        is False
    )


def test_ann_orphaned_generation_is_invisible(spark, tmp_path):
    corpus, queries = _corpus_queries(spark)
    idx = str(tmp_path / "ann")
    annindex.build_ann_index(corpus, idx, 64, cells=8, iters=2, sample_rate=1.0)
    before = sorted(
        map(tuple, annindex.query_ann_index(spark, queries, idx, 5, 2).collect())
    )
    # crashed append: generation written, manifest never flipped
    _, model = annindex.load_ann_model(idx)
    ghost = corpus.select((F.col("vec_id") + 900_000).alias("vec_id"), "embedding")
    annindex._write_vectors_gen(ghost, idx, 1, model)
    after = sorted(
        map(tuple, annindex.query_ann_index(spark, queries, idx, 5, 2).collect())
    )
    assert after == before, "orphaned generation leaked into query results"


def test_streamed_ann_search_matches_batch_and_is_incremental(spark, tmp_path):
    """streaming/ann_stream.run_ann_search: per-micro-batch top-k against
    the stored index == the batch query_ann_index on the same queries;
    checkpointed pickup ranks ONLY newly arrived files; idle re-run adds
    nothing."""
    from gcp_serverless_etl_pipeline_lab_spark.sinks import read_warehouse
    from gcp_serverless_etl_pipeline_lab_spark.streaming.ann_stream import (
        run_ann_search,
    )

    corpus, _ = _corpus_queries(spark)
    idx = str(tmp_path / "ann")
    annindex.build_ann_index(corpus, idx, 64, cells=8, iters=2, sample_rate=1.0)

    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def _queries(lo, hi):
        return corpus.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).select(
            "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding")
        )

    q1 = _queries(0, 6)
    q1.coalesce(1).write.mode("append").parquet(inbox)
    run_ann_search(spark, inbox, idx, out, ckpt, k=5, nprobe=2)
    got1 = read_warehouse(spark, out)
    want1 = annindex.query_ann_index(spark, q1, idx, k=5, nprobe=2)
    assert sorted(map(tuple, got1.collect())) == sorted(map(tuple, want1.collect()))

    q2 = _queries(6, 12)
    q2.coalesce(1).write.mode("append").parquet(inbox)
    run_ann_search(spark, inbox, idx, out, ckpt, k=5, nprobe=2)
    got2 = read_warehouse(spark, out)
    want2 = annindex.query_ann_index(
        spark, q1.unionAll(q2), idx, k=5, nprobe=2
    )
    assert sorted(map(tuple, got2.collect())) == sorted(map(tuple, want2.collect()))

    run_ann_search(spark, inbox, idx, out, ckpt, k=5, nprobe=2)  # idle
    assert read_warehouse(spark, out).count() == got2.count()
