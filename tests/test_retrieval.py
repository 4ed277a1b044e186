"""bm25_topk edge cases the harness query can't hit."""

from __future__ import annotations

from gcp_serverless_etl_pipeline_lab_spark.operators.retrieval import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_absent_term_contributes_nothing(spark):
    docs = _docs(spark, [(1, "alpha beta"), (2, "alpha alpha beta")])
    out = bm25_topk(docs, ["alpha", "zzz_not_there"], k=10).collect()
    assert [r.doc_id for r in out] and all(r.n_terms == 1 for r in out)


def test_no_match_returns_empty(spark):
    out = bm25_topk(_docs(spark, [(1, "alpha")]), ["missing"], k=5)
    assert out.count() == 0


def test_tf_and_length_normalization_rank(spark):
    # Same tf, shorter doc wins; higher tf wins over longer doc at equal dl.
    docs = _docs(
        spark,
        [
            (1, "hit filler filler filler filler filler filler filler"),
            (2, "hit filler"),
            (3, "hit hit filler filler filler filler filler filler"),
        ],
    )
    out = bm25_topk(docs, ["hit"], k=3).collect()
    assert [r.doc_id for r in out] == [2, 3, 1]
    assert out[0].score > out[1].score > out[2].score


def test_k_cut_and_tiebreak(spark):
    # Four identical docs — identical scores; doc_id breaks ties, k cuts.
    docs = _docs(spark, [(i, "hit pad") for i in (4, 2, 9, 7)])
    out = bm25_topk(docs, ["hit"], k=3).collect()
    assert [r.doc_id for r in out] == [2, 4, 7]
