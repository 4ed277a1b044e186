"""Property-based tests (hypothesis) for the trained-model bigram-LM
scorer and DSIR importance: the Spark plans must match an independent
pure-Python re-implementation of the integer micro-nat math on random
corpora — including bigrams/heads the model never saw and random hot
thresholds that flip rows between the broadcast and shuffle legs of the
hybrid joins."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import HealthCheck, given, settings, strategies as st

from gcp_serverless_etl_pipeline_lab_spark.operators.lmscore import (
    doc_logprob_micro_model,
    dsir_importance_micro,
)

SLOW = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

# tiny alphabet → plenty of shared and unshared bigrams across docs
_WORD = st.sampled_from(["a", "b", "c", "dd", "e"])
_DOC = st.lists(_WORD, min_size=0, max_size=8).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=8)


def _ilog(n: int) -> int:
    return math.floor(math.log(n) * 1_000_000)


def _ref_model_scores(train: list[str], score: list[str]) -> dict[int, tuple]:
    """Pure-Python reference: add-one-smoothed bigram LM trained on
    ``train``, scoring each ≥2-token doc of ``score``."""
    c12: Counter = Counter()
    c1: Counter = Counter()
    vocab: set = set()
    for text in train:
        t = text.split(" ")
        if len(t) < 2:
            continue
        for w1, w2 in zip(t, t[1:]):
            c12[(w1, w2)] += 1
            c1[w1] += 1
            vocab.add(w1)
            vocab.add(w2)
    v = max(len(vocab), 1)  # engine clamps: empty model scores 0, not ln(0)
    out = {}
    for i, text in enumerate(score):
        t = text.split(" ")
        if len(t) < 2:
            continue
        s = 0
        for w1, w2 in zip(t, t[1:]):
            s += _ilog(c12[(w1, w2)] + 1) - _ilog(c1[w1] + v)
        out[i] = (len(t) - 1, s)
    return out


@SLOW
@given(train=_CORPUS, score=_CORPUS, hot=st.sampled_from([1, 2, 1000]))
def test_model_scores_match_python_reference(spark, train, score, hot):
    # hot=1 forces EVERYTHING through the broadcast leg, hot=2 splits,
    # hot=1000 forces everything through the shuffle leg — the three
    # routing regimes of _hybrid_left_join must agree exactly.
    score_df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(score)], "doc_id bigint, text string"
    )
    train_df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(train)], "doc_id bigint, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["score_micro"])
        for r in doc_logprob_micro_model(
            train_df, score_df, hot_threshold=hot
        ).collect()
    }
    assert got == _ref_model_scores(train, score)


@SLOW
@given(corpus=_CORPUS, mask=st.integers(min_value=2, max_value=4))
def test_dsir_importance_matches_python_reference(spark, corpus, mask):
    target = [t for i, t in enumerate(corpus) if i % mask == 0]
    docs = spark.createDataFrame(
        [(i, s) for i, s in enumerate(corpus)], "doc_id bigint, text string"
    )
    tgt = docs.filter((docs.doc_id % mask) == 0)
    got = {
        r["doc_id"]: r["importance_micro"]
        for r in dsir_importance_micro(docs, tgt).collect()
    }
    t_ref = _ref_model_scores(target, corpus)
    r_ref = _ref_model_scores(corpus, corpus)
    want = {i: t_ref[i][1] - r_ref[i][1] for i in t_ref}
    assert got == want
