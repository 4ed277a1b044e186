"""Atomic truncate-overwrite commit protocol (sinks.write_warehouse).

BigQuery's WRITE_TRUNCATE replaces the table atomically; the plain Spark
``mode('overwrite')`` has a delete-then-write window. These tests pin the
version-and-flip protocol: a committed snapshot is immutable, the
``_CURRENT`` pointer flip is the commit point, and a writer that dies
after materializing files but BEFORE the flip leaves every reader on the
previous complete snapshot.
"""

from __future__ import annotations

import os

from gcp_serverless_etl_pipeline_lab_spark.sinks import (
    read_warehouse,
    write_warehouse,
)


def _df(spark, ids, tag):
    return spark.createDataFrame([(i, tag) for i in ids], "id bigint, tag string")


def test_overwrite_replaces_and_reads_latest(spark, tmp_path):
    path = str(tmp_path / "wh")
    write_warehouse(_df(spark, [1, 2, 3], "a"), path)
    write_warehouse(_df(spark, [7, 8], "b"), path)
    got = read_warehouse(spark, path).collect()
    assert sorted(r["id"] for r in got) == [7, 8]
    assert {r["tag"] for r in got} == {"b"}


def test_killed_writer_leaves_previous_version_readable(spark, tmp_path):
    """Simulate a writer dying mid-overwrite: a partial v=1 snapshot
    exists on disk but the pointer was never flipped. Readers must still
    see the complete v=0 table — the whole point of version-and-flip."""
    path = str(tmp_path / "wh")
    write_warehouse(_df(spark, [1, 2, 3], "a"), path)
    # partial new version: directory + a garbage half-written file, no flip
    partial = os.path.join(path, "v=1")
    os.makedirs(partial)
    with open(os.path.join(partial, "part-00000.parquet"), "wb") as fh:
        fh.write(b"\x00\x01 not a parquet footer")
    got = read_warehouse(spark, path).collect()
    assert sorted(r["id"] for r in got) == [1, 2, 3]
    # recovery: the next successful write supersedes the orphan and commits
    write_warehouse(_df(spark, [9], "c"), path)
    assert [r["id"] for r in read_warehouse(spark, path).collect()] == [9]


def test_version_pruning_keeps_newest(spark, tmp_path):
    path = str(tmp_path / "wh")
    for i in range(4):
        write_warehouse(_df(spark, [i], f"t{i}"), path, keep_versions=2)
    kept = sorted(d for d in os.listdir(path) if d.startswith("v="))
    assert len(kept) == 2
    assert [r["id"] for r in read_warehouse(spark, path).collect()] == [3]


def test_partitioned_atomic_write_prunes_at_read(spark, tmp_path):
    path = str(tmp_path / "whp")
    df = spark.createDataFrame(
        [(1, 1996), (2, 1997), (3, 1997)], "id bigint, year int"
    )
    write_warehouse(df, path, partition_by=["year"])
    got = read_warehouse(spark, path).filter("year = 1997")
    assert sorted(r["id"] for r in got.collect()) == [2, 3]
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan


def test_legacy_flat_layout_still_reads(spark, tmp_path):
    path = str(tmp_path / "flat")
    write_warehouse(_df(spark, [5, 6], "x"), path, atomic=False)
    assert not os.path.exists(os.path.join(path, "_CURRENT"))
    assert sorted(r["id"] for r in read_warehouse(spark, path).collect()) == [5, 6]


def test_pointer_flip_is_commit_point(spark, tmp_path):
    """Readers that resolved the pointer before a new commit keep a
    complete snapshot (keep_versions >= 2 retains their files)."""
    path = str(tmp_path / "wh")
    write_warehouse(_df(spark, [1], "a"), path)
    old = read_warehouse(spark, path)  # plan resolved against v=0
    write_warehouse(_df(spark, [2], "b"), path, keep_versions=2)
    # the pre-commit reader still scans its complete snapshot
    assert [r["id"] for r in old.collect()] == [1]
    assert [r["id"] for r in read_warehouse(spark, path).collect()] == [2]
