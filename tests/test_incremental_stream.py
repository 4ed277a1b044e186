"""Streaming incremental dedup (streaming/dedup_stream.run_incremental_classify):
per-micro-batch probe of the persisted base index, exactly-once epoch
sink, checkpointed file pickup. Composes the round-8 pieces — base index,
epoch-overwrite sink, unified read_warehouse — into the nightly-increment
operating mode."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_serverless_etl_pipeline_lab_spark.operators import incremental
from gcp_serverless_etl_pipeline_lab_spark.sinks import read_warehouse
from gcp_serverless_etl_pipeline_lab_spark.sources.tables import load_table
from gcp_serverless_etl_pipeline_lab_spark.streaming.dedup_stream import (
    run_incremental_classify,
)

from conftest import SF_SMOKE

MAX_DF = 1000


def _base(spark):
    return load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")


def _night(base, mod, offset):
    """One synthetic nightly batch: every ``mod``-th doc re-submitted with
    shifted ids — a mix of exact dups (unchanged text) and fresh docs
    (token-reversed)."""
    resub = base.filter(F.col("doc_id") % mod == 0).select(
        (F.col("doc_id") + offset).alias("doc_id"), "text"
    )
    fresh = base.filter(F.col("doc_id") % mod == 1).select(
        (F.col("doc_id") + offset + 1_000_000).alias("doc_id"),
        F.array_join(F.reverse(F.split(F.col("text"), " ", -1)), " ").alias("text"),
    )
    return resub.unionAll(fresh)


def test_streamed_classify_matches_batch_and_is_incremental(spark, tmp_path):
    base = _base(spark)
    idx = str(tmp_path / "idx")
    incremental.build_base_index(base, idx, max_df=MAX_DF)

    inbox = str(tmp_path / "inbox")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # night 1: one batch file arrives
    night1 = _night(base, 5, 3_000_000)
    night1.coalesce(1).write.mode("append").parquet(inbox)
    run_incremental_classify(spark, inbox, idx, out, ckpt)
    got1 = read_warehouse(spark, out)
    want1 = incremental.classify_batch_vs_index(spark, night1, idx)
    assert sorted(map(tuple, got1.collect())) == sorted(map(tuple, want1.collect()))

    # night 2: a second file arrives; the checkpoint must classify ONLY it
    night2 = _night(base, 7, 6_000_000)
    night2.coalesce(1).write.mode("append").parquet(inbox)
    run_incremental_classify(spark, inbox, idx, out, ckpt)
    got2 = read_warehouse(spark, out)
    want2 = incremental.classify_batch_vs_index(
        spark, night1.unionAll(night2), idx
    )
    assert sorted(map(tuple, got2.collect())) == sorted(map(tuple, want2.collect()))
    # both categories present across the accumulated epochs
    cats = {r.category for r in got2.select("category").distinct().collect()}
    assert "exact_dup" in cats and "new" in cats

    # idle re-run: no new files -> no new rows, no duplicated epochs
    run_incremental_classify(spark, inbox, idx, out, ckpt)
    got3 = read_warehouse(spark, out)
    assert got3.count() == got2.count()
