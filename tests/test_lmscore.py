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


def test_model_scoring_unseen_bigrams(spark):
    """doc_logprob_micro_model: stats from train, left-join smoothing on
    score-side bigrams the model never saw."""
    from gcp_serverless_etl_pipeline_lab_spark.operators.lmscore import (
        doc_logprob_micro_model,
    )

    # train: "a b a b" -> c12: (a,b)=2, (b,a)=1 ; c1: a=2, b=1 ; V={a,b}=2
    train = spark.createDataFrame([(1, "a b a b")], "doc_id bigint, text string")
    # score doc "a b x": (a,b) seen, (b,x) unseen bigram with SEEN head b,
    # score doc "x y":   (x,y) unseen bigram with UNSEEN head x
    score = spark.createDataFrame(
        [(10, "a b x"), (11, "x y")], "doc_id bigint, text string"
    )
    out = {
        r["doc_id"]: r for r in doc_logprob_micro_model(train, score).collect()
    }
    s10 = (_ilog(2 + 1) - _ilog(2 + 2)) + (_ilog(0 + 1) - _ilog(1 + 2))
    s11 = _ilog(0 + 1) - _ilog(0 + 2)
    assert out[10]["n_bigrams"] == 2 and out[10]["score_micro"] == s10
    assert out[11]["n_bigrams"] == 1 and out[11]["score_micro"] == s11


def test_model_scoring_matches_same_corpus_variant(spark):
    """Training on the scored corpus itself must reproduce
    doc_logprob_micro exactly (the left joins all hit)."""
    from gcp_serverless_etl_pipeline_lab_spark.operators.lmscore import (
        doc_logprob_micro_model,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c"), (3, "c c a")],
        "doc_id bigint, text string",
    )
    base = {r["doc_id"]: r["score_micro"] for r in doc_logprob_micro(docs).collect()}
    model = {
        r["doc_id"]: r["score_micro"]
        for r in doc_logprob_micro_model(docs, docs).collect()
    }
    assert base == model


def test_dsir_importance_prefers_target_like_docs(spark):
    from gcp_serverless_etl_pipeline_lab_spark.operators.lmscore import (
        dsir_importance_micro,
    )

    rows = [
        (1, "en", "the cat sat on the mat"),
        (2, "en", "the dog sat on the rug"),
        (3, "en", "the cat and the dog sat"),
        (4, "de", "der hund sitzt auf dem teppich"),
        (5, "de", "die katze sitzt auf der matte"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    imp = {
        r["doc_id"]: r["importance_micro"]
        for r in dsir_importance_micro(
            docs.select("doc_id", "text"),
            docs.filter(F.col("lang") == "en").select("doc_id", "text"),
        ).collect()
    }
    # every English doc must outrank every German doc under the en-target model
    assert min(imp[1], imp[2], imp[3]) > max(imp[4], imp[5])
