"""Unit tests for count-min-sketch frequency estimation
(operators/sketchfreq.py): CMS invariants, not just value parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_serverless_etl_pipeline_lab_spark.operators.sketchfreq import (
    cms_estimates,
    cms_heavy_hitters,
    cms_sketch,
)


def _corpus(spark):
    # 3 heavy keys + 50 singletons
    rows = (
        [("hot-a",)] * 300
        + [("hot-b",)] * 200
        + [("hot-c",)] * 100
        + [(f"tail-{i}",) for i in range(50)]
    )
    return spark.createDataFrame(rows, "k string")


def test_sketch_mass_conservation(spark):
    df = _corpus(spark)
    sk = cms_sketch(df, "k", depth=4, width=256).collect()
    n = df.count()
    # every hash row's counters sum to the total stream length
    per_row = {}
    for cell in sk:
        per_row[cell["hrow"]] = per_row.get(cell["hrow"], 0) + cell["cnt"]
    assert per_row == {r: n for r in range(4)}


def test_estimates_never_undercount(spark):
    df = _corpus(spark)
    sk = cms_sketch(df, "k", depth=4, width=64)  # narrow -> forced collisions
    exact = df.groupBy("k").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimates(exact.select("k"), sk, "k", depth=4, width=64)
    joined = est.join(exact, est.k == exact.k).collect()
    assert len(joined) == 53
    assert all(r["est"] >= r["exact"] for r in joined)


def test_heavy_hitters_rank_and_exactness(spark):
    out = cms_heavy_hitters(_corpus(spark), "k", depth=4, width=1024, top_n=3).collect()
    assert [r["k"] for r in out] == ["hot-a", "hot-b", "hot-c"]
    # wide sketch, tiny key set -> no collisions, estimates exact
    assert [(r["exact"], r["overcount"]) for r in out] == [
        (300, 0),
        (200, 0),
        (100, 0),
    ]


def test_deterministic_across_partitionings(spark):
    df = _corpus(spark)
    a = sorted(map(tuple, cms_sketch(df.repartition(1), "k").collect()))
    b = sorted(map(tuple, cms_sketch(df.repartition(17), "k").collect()))
    assert a == b


def test_estimates_external_absent_key_is_zero(spark):
    """A candidate key absent from the stream must estimate as 0 (or a
    collision-bounded overcount) and must NOT vanish from the output —
    the left-join-with-coalesce contract for external candidate lists."""
    df = _corpus(spark)
    sk = cms_sketch(df, "k", depth=4, width=4096)
    cands = spark.createDataFrame(
        [("hot-a",), ("never-seen-1",), ("never-seen-2",)], "k string"
    )
    got = {r["k"]: r["est"] for r in cms_estimates(cands, sk, "k", depth=4, width=4096).collect()}
    assert set(got) == {"hot-a", "never-seen-1", "never-seen-2"}
    assert got["hot-a"] >= 300
    # width 4096 over ~53 distinct keys: some min cell is empty w.h.p.
    assert got["never-seen-1"] == 0
    assert got["never-seen-2"] == 0
