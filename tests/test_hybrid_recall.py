"""Recall contract for SERVED hybrid retrieval (round-12 verdict task 5).

The ``a0h`` oracles pin the IMPLEMENTATION of
``lexindex.hybrid_topk_rrf_from_index`` (the DuckDB mirror routes the
same IVF cells, so hash parity proves the code, not retrieval quality).
This module pins the QUALITY: overlap@10 between the index-served
fusion and the brute-force scan spelling (``retrieval.hybrid_topk_rrf``
— exact BM25 leg + exact cosine leg) must clear a stated floor, the way
tests/test_ann_recall.py floors the raw ANN strategies.

Measured on /root/testdata/sf0.01 (IVF cells=8, depth=50, k=10,
full-corpus k-means — this module's own fixtures; per-query values for
qid 3 / 7 / 11) and on the scale-stress corpus (SCALE_STRESS.json
``hybrid_batch`` rows, sampled-model IVF sample_rate=0.1, nprobe=3,
5 term+vector queries):

| corpus             | config             | overlap@10        |
|--------------------|--------------------|-------------------|
| sf0.01 (CI, below) | nprobe=2 (a0h cfg) | 0.9/0.8/0.6 = 0.77|
| sf0.01 (CI, below) | nprobe=3 (default) | 0.9/0.8/0.7 = 0.80|
| sf0.01             | nprobe=4           | 0.9/0.8/0.8 = 0.83|
| stress x1 (sf0.1)  | nprobe=3, sampled  | 0.68              |
| stress x3          | nprobe=3, sampled  | 0.84              |
| stress x10         | nprobe=3, sampled  | 0.90              |

The CI floor asserts the SERVING default (nprobe=3) at mean >= 0.75;
the a0h oracles keep pinning nprobe=2 exactly (their DuckDB mirror
routes the same cells, so that parity is hash-exact regardless of the
recall level).

The BM25 leg is exact by construction (postings probe == token scan,
pinned in test_lexindex.py), so fused overlap is gated by IVF recall
alone — any decay means the probed cells stopped covering the true
top-``depth``, which is exactly what ``ann_drift_report`` exists to
flag EARLY (the drifted-corpus test: the flag fires while overlap still
holds, because drifted vectors cluster into cells the drifted queries
also probe; the flag is a leading indicator, not a post-mortem).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_serverless_etl_pipeline_lab_spark.harness._corpora import EMB_DIM
from gcp_serverless_etl_pipeline_lab_spark.harness.similarity import (
    _IVF_K,
    _sim_queries,
)
from gcp_serverless_etl_pipeline_lab_spark.operators import (
    annindex,
    lexindex,
    retrieval,
)
from gcp_serverless_etl_pipeline_lab_spark.sources.tables import load_table

from conftest import SF_ORACLE

DEPTH = 50
K = 10
NPROBE = 3  # the serving default; the a0h oracle config (nprobe=2) reads 0.77
# distinct term sets so the lexical legs differ per query
QUERIES = [
    (3, ["filter", "vector"]),
    (7, ["join", "filter", "vector"]),
    (11, ["join", "vector"]),
]


def _ids(df) -> set:
    return {r["doc_id"] for r in df.select("doc_id").collect()}


def _overlap(spark, lex, ann, docs, emb, qid, terms, auto_escalate=True) -> float:
    served = lexindex.hybrid_topk_rrf_from_index(
        spark,
        lex,
        ann,
        terms,
        emb.filter(F.col("vec_id") == qid).select("vec_id", "embedding"),
        k=K,
        depth=DEPTH,
        nprobe=NPROBE,
        auto_escalate=auto_escalate,
    )
    brute = retrieval.hybrid_topk_rrf(
        docs, emb, terms, qid, EMB_DIM, k=K, depth=DEPTH
    )
    truth = _ids(brute)
    return len(_ids(served) & truth) / len(truth)


@pytest.fixture(scope="module")
def corpus(spark):
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    emb, _ = _sim_queries(spark, SF_ORACLE)
    return docs, emb.select("vec_id", "embedding")


@pytest.fixture(scope="module")
def indexes(spark, corpus, tmp_path_factory):
    docs, emb = corpus
    root = tmp_path_factory.mktemp("hybrid_recall")
    lex, ann = str(root / "lex"), str(root / "ann")
    lexindex.build_lexical_index(docs, lex)
    annindex.build_ann_index(
        emb, ann, EMB_DIM, cells=_IVF_K, iters=2, sample_rate=1.0
    )
    return lex, ann


def test_served_hybrid_overlap_floor(spark, corpus, indexes):
    docs, emb = corpus
    lex, ann = indexes
    vals = [
        _overlap(spark, lex, ann, docs, emb, qid, terms)
        for qid, terms in QUERIES
    ]
    mean = sum(vals) / len(vals)
    assert mean >= 0.75, f"served-hybrid overlap@10 {vals} mean {mean:.2f} < 0.75"


def test_sampled_model_floor_via_escalation(spark, corpus, tmp_path):
    """Round-13 task 1: the SAMPLED-model serving path must also clear
    the 0.75 floor. A sample_rate=0.1 quantizer's noisier centroids
    measured 0.68 overlap@10 at nprobe=3 on the stress corpus
    (SCALE_STRESS.json hybrid_batch, round 12) with nothing in the
    serving path aware — now the manifest records training coverage and
    serving auto-escalates nprobe x2 for low-coverage models. The floor
    here asserts the DEFAULT serving path on a sampled index; the
    escalated probe must also never do worse than the pinned one."""
    docs, emb = corpus
    lex, ann = str(tmp_path / "lex"), str(tmp_path / "ann")
    lexindex.build_lexical_index(docs, lex)
    annindex.build_ann_index(
        emb, ann, EMB_DIM, cells=_IVF_K, iters=2, sample_rate=0.1
    )
    rep = annindex.ann_drift_report(ann)
    assert rep["low_training_coverage"] is True, rep
    esc = [
        _overlap(spark, lex, ann, docs, emb, qid, terms)
        for qid, terms in QUERIES
    ]
    pinned = [
        _overlap(spark, lex, ann, docs, emb, qid, terms, auto_escalate=False)
        for qid, terms in QUERIES
    ]
    m_esc, m_pin = sum(esc) / len(esc), sum(pinned) / len(pinned)
    assert m_esc >= 0.75, (
        f"sampled-model served overlap {esc} mean {m_esc:.2f} < 0.75 "
        f"even with escalation (pinned read {m_pin:.2f})"
    )
    assert m_esc >= m_pin, (esc, pinned)


def test_drift_flag_fires_before_overlap_decays(spark, corpus, tmp_path):
    """The leading-indicator contract: append an increment whose vectors
    sit far from every centroid (a distribution shift). The drift flag
    MUST fire on the append's own recorded msd — even though overlap for
    shifted queries has not yet visibly decayed (the shifted mass lands
    in one stale cell that shifted queries also probe first). Rebuild
    clears the flag and overlap stays above the floor under the re-fit
    model."""
    docs, emb = corpus
    lex, ann = str(tmp_path / "lex"), str(tmp_path / "ann")
    shifted_docs = docs.select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"), "text"
    )
    shifted = emb.select(
        (F.col("vec_id") + 5_000_000).alias("vec_id"),
        F.expr("transform(embedding, x -> x + 3.0D)").alias("embedding"),
    )
    lexindex.build_lexical_index(docs, lex)
    annindex.build_ann_index(
        emb, ann, EMB_DIM, cells=_IVF_K, iters=2, sample_rate=1.0
    )
    assert not annindex.ann_drift_report(ann)["rebuild_recommended"]
    lexindex.append_lexical_index(spark, shifted_docs, lex, "night1")
    annindex.append_ann_index(spark, shifted, ann, increment_id="night1")
    # 1) the flag fires on the append itself — no probe needed
    rep = annindex.ann_drift_report(ann)
    assert rep["rebuild_recommended"] is True, rep
    # 2) ... BEFORE overlap visibly decays: a shifted query against the
    # merged corpus still clears the floor under the stale model
    merged_docs = docs.unionByName(shifted_docs)
    merged_emb = emb.unionByName(shifted)
    qid, terms = QUERIES[1]
    pre = _overlap(
        spark, lex, ann, merged_docs, merged_emb, qid + 5_000_000, terms
    )
    assert pre >= 0.6, f"pre-rebuild shifted-query overlap {pre:.2f}"
    # 3) rebuild resets the baseline, clears the flag, and the re-fit
    # model keeps (or restores) the floor
    annindex.rebuild_ann_index(spark, ann, sample_rate=1.0)
    rep2 = annindex.ann_drift_report(ann)
    assert rep2["rebuild_recommended"] is False, rep2
    post = _overlap(
        spark, lex, ann, merged_docs, merged_emb, qid + 5_000_000, terms
    )
    assert post >= 0.8, f"post-rebuild shifted-query overlap {post:.2f}"
