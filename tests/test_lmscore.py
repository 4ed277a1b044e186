"""Unit tests for bigram LM scoring (operators/lmscore.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from gcp_serverless_etl_pipeline_lab_spark.operators.lmscore import (
    doc_logprob_micro,
    ilog_micro,
)


def _ilog(n: int) -> int:
    return math.floor(math.log(n) * 1_000_000)


def test_hand_computed_scores(spark):
    # corpus: "a b a b" and "a b c"
    # bigrams: d1: (a,b)x2? no — "a b a b" -> (a,b),(b,a),(a,b) => (a,b) k=2, (b,a) k=1
    #          d2: (a,b),(b,c)
    # c12: (a,b)=3, (b,a)=1, (b,c)=1 ; c1: a=3, b=2 ; V={a,b,c}=3
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id bigint, text string"
    )
    out = {r["doc_id"]: r for r in doc_logprob_micro(docs).collect()}
    s1 = 2 * (_ilog(3 + 1) - _ilog(3 + 3)) + 1 * (_ilog(1 + 1) - _ilog(2 + 3))
    s2 = (
        1 * (_ilog(3 + 1) - _ilog(3 + 3))
        + 1 * (_ilog(1 + 1) - _ilog(2 + 3))
    )
    assert out[1]["n_bigrams"] == 3 and out[1]["score_micro"] == s1
    assert out[2]["n_bigrams"] == 2 and out[2]["score_micro"] == s2
    assert out[1]["neg_avg_micro"] == (-s1) // 3
    assert out[2]["neg_avg_micro"] == (-s2) // 2


def test_short_docs_excluded(spark):
    docs = spark.createDataFrame(
        [(1, "solo"), (2, ""), (3, "x y")], "doc_id bigint, text string"
    )
    out = doc_logprob_micro(docs).collect()
    assert [r["doc_id"] for r in out] == [3]


def test_hybrid_threshold_invariance(spark):
    # the hot/cold split must not change any value: threshold 1 (all hot,
    # all broadcast) vs huge (all cold, all shuffled) vs mixed
    docs = spark.createDataFrame(
        [(i, "the quick fox " * (i % 3 + 1) + "jumps") for i in range(12)],
        "doc_id bigint, text string",
    )
    outs = [
        sorted(map(tuple, doc_logprob_micro(docs, hot_threshold=t).collect()))
        for t in (1, 5, 10**9)
    ]
    assert outs[0] == outs[1] == outs[2]


def test_hot_leg_is_broadcast(spark):
    docs = spark.createDataFrame(
        [(i, "a b c d e") for i in range(4)], "doc_id bigint, text string"
    )
    df = doc_logprob_micro(docs, hot_threshold=2)
    tree = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    ).split("\n\n")[0]
    assert "BroadcastHashJoin" in tree  # heavy hitters ride the broadcast leg
    assert "BatchEvalPython" not in tree  # pure JVM expressions


def test_ilog_micro_matches_python(spark):
    vals = spark.range(1, 2000).select(
        F.col("id"), ilog_micro(F.col("id")).alias("il")
    )
    for r in vals.collect():
        assert r["il"] == _ilog(r["id"])
