"""Compaction execution (operators/compaction.py): plan invariants, data
parity, and the actual file-count reduction."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_serverless_etl_pipeline_lab_spark.operators.compaction import (
    compact_execute,
    list_part_files,
    plan_groups,
    read_compacted,
)
from gcp_serverless_etl_pipeline_lab_spark.sources.tables import load_table

from conftest import SF_SMOKE


def test_plan_groups_cumulative_rule():
    files = [(f"f{i:02d}", 100) for i in range(10)]
    plan = plan_groups(files, target_bytes=250)
    # cumsum-before // 250: 0,100,200 -> 0; 300..400 -> 1; ...
    assert [plan[f"f{i:02d}"] for i in range(10)] == [
        0, 0, 0, 1, 1, 2, 2, 2, 3, 3,
    ]
    # each group's bytes are bounded by target + max input file (the rule
    # packs by starting offset, so a group holds every file whose
    # cumulative start falls in its band)
    totals: dict = {}
    for (f, sz) in files:
        totals[plan[f]] = totals.get(plan[f], 0) + sz
    max_file = max(sz for _, sz in files)
    for b in totals.values():
        assert b < 250 + max_file
    # groups are contiguous 0..N-1
    assert sorted(totals) == list(range(len(totals)))


def test_compact_execute_parity_and_reduction(spark, tmp_path):
    src = str(tmp_path / "small")
    dst = str(tmp_path / "big")
    docs = load_table(spark, SF_SMOKE, "documents")
    docs.repartition(32).write.parquet(src)
    before = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("doc_id", "text")).alias("h"),
    ).collect()[0]
    stats = compact_execute(spark, src, dst, target_bytes=1 << 20)
    assert stats["files_before"] == 32
    assert stats["files_after"] < stats["files_before"]
    assert stats["files_after"] == len(list_part_files(dst))
    after = read_compacted(spark, dst).select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.xxhash64("doc_id", "text")).alias("h"),
    ).collect()[0]
    # row-level content identical (order-insensitive content hash)
    assert (before["n"], before["h"]) == (after["n"], after["h"])
    # columns preserved (layout column dropped on read)
    assert set(read_compacted(spark, dst).columns) == set(docs.columns)


def test_compact_one_file_per_group(spark, tmp_path):
    src = str(tmp_path / "small")
    dst = str(tmp_path / "big")
    load_table(spark, SF_SMOKE, "documents").repartition(16).write.parquet(src)
    files = list_part_files(src)
    target = sum(sz for _, sz in files) // 3 + 1
    stats = compact_execute(spark, src, dst, target_bytes=target)
    # one output file per planned group
    assert stats["files_after"] == stats["groups"]


def test_compact_execute_space_in_path(spark, tmp_path):
    """Regression: input_file_name() percent-encodes the file URI
    (space -> %20), so the plan's file->group map must use the identical
    encoding. Before the as_uri() fix the inner join matched nothing for
    any encodable path and compaction silently emitted ZERO rows."""
    src = str(tmp_path / "dir with space" / "small")
    dst = str(tmp_path / "out")
    docs = load_table(spark, SF_SMOKE, "documents")
    docs.repartition(8).write.parquet(src)
    stats = compact_execute(spark, src, dst, target_bytes=1 << 20)
    assert stats["files_before"] == 8
    assert read_compacted(spark, dst).count() == docs.count()


def test_compact_empty_source_raises(spark, tmp_path):
    import pytest

    (tmp_path / "empty").mkdir()
    with pytest.raises(FileNotFoundError):
        compact_execute(spark, str(tmp_path / "empty"), str(tmp_path / "out"))
