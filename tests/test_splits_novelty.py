"""assign_splits (deterministic corpus partition) and gram_novelty
(first-occurrence gram scoring) — the two round-8 curriculum operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_serverless_etl_pipeline_lab_spark.operators.dedup import gram_novelty
from gcp_serverless_etl_pipeline_lab_spark.operators.sampling import assign_splits


def _docs(spark, n=2000):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.concat(F.lit("d"), F.col("id")).alias("text")
    )


def test_assign_splits_total_and_proportional(spark):
    tagged = assign_splits(
        _docs(spark), "CAST(doc_id AS STRING)", {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    counts = {r["split"]: r["n"] for r in tagged.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == 2000  # a partition: every row, once
    assert 0.75 <= counts["train"] / 2000 <= 0.85
    assert 0.06 <= counts["val"] / 2000 <= 0.14
    assert 0.06 <= counts["test"] / 2000 <= 0.14


def test_assign_splits_stable_across_resharding(spark):
    """Membership must be a pure function of row identity — re-sharding
    the input (the thing df.randomSplit is sensitive to) cannot move a
    single row between splits."""
    d = _docs(spark, 500)
    a = {(r.doc_id, r.split) for r in assign_splits(d, "CAST(doc_id AS STRING)", {"train": 0.9, "test": 0.1}).collect()}
    b = {(r.doc_id, r.split) for r in assign_splits(d.repartition(17), "CAST(doc_id AS STRING)", {"train": 0.9, "test": 0.1}).collect()}
    assert a == b


def test_assign_splits_salt_decorrelates(spark):
    d = _docs(spark, 1000)
    frac = {"a": 0.5, "b": 0.5}
    s1 = {r.doc_id: r.split for r in assign_splits(d, "CAST(doc_id AS STRING)", frac, salt="s1").collect()}
    s2 = {r.doc_id: r.split for r in assign_splits(d, "CAST(doc_id AS STRING)", frac, salt="s2").collect()}
    moved = sum(1 for k in s1 if s1[k] != s2[k])
    assert 300 < moved < 700  # independent coin flips, not a re-label


def test_assign_splits_rejects_bad_fractions(spark):
    with pytest.raises(ValueError):
        assign_splits(_docs(spark, 10), "CAST(doc_id AS STRING)", {"a": 0.5, "b": 0.3})


def test_gram_novelty_hand_computed(spark):
    """doc 0: all grams new (novelty 1). doc 1: exact clone of doc 0
    (novelty 0). doc 2: partial recombination — shares 'a b c'/'b c d'
    with doc 0, contributes 'c d x'/'d x y'/'x y z' first (5 distinct
    grams, 3 novel). doc 3: too short for a 3-gram — no output row."""
    docs = spark.createDataFrame(
        [
            (0, "a b c d"),
            (1, "a b c d"),
            (2, "a b c d x y z"),
            (3, "a b"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_grams, r.n_novel, r.novelty) for r in gram_novelty(docs).collect()}
    assert got == {
        0: (2, 2, 1.0),
        1: (2, 0, 0.0),
        2: (5, 3, 0.6),
    }
    assert 3 not in got


def test_select_survivors_policies(spark):
    """Highest score wins; ties to min doc_id; unscored members rank -1;
    an all-unscored cluster falls back to min-id."""
    from gcp_serverless_etl_pipeline_lab_spark.operators.cluster import (
        select_survivors,
    )

    members = spark.createDataFrame(
        [
            (1, 10, 3), (1, 11, 3), (1, 12, 3),   # scored cluster
            (2, 20, 2), (2, 21, 2),               # tie on score
            (3, 30, 2), (3, 31, 2),               # 31 scored, 30 not
            (4, 40, 2), (4, 41, 2),               # nobody scored
        ],
        "cluster_id long, doc_id long, n_members long",
    )
    scores = spark.createDataFrame(
        [(10, 0.2), (11, 0.9), (12, 0.5), (20, 0.7), (21, 0.7), (31, 0.1)],
        "doc_id long, novelty double",
    )
    got = {r.cluster_id: (r.survivor_id, r.survivor_score)
           for r in select_survivors(members, scores).collect()}
    assert got == {1: (11, 0.9), 2: (20, 0.7), 3: (31, 0.1), 4: (40, -1.0)}
