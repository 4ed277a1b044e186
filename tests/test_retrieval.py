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


def test_hybrid_rrf_fuses_both_legs_exactly(spark):
    """hybrid_topk_rrf == a Python re-fusion of its two legs: ranks come
    from bm25_topk and the exact dot-product ordering, the query doc is
    excluded from the vector leg only, missing legs contribute 0, and
    the fused score is bit-recomputable (1/(60+r) sums)."""
    from gcp_serverless_etl_pipeline_lab_spark.operators.retrieval import (
        hybrid_topk_rrf,
    )

    docs = _docs(
        spark,
        [
            (0, "query doc about join and filter"),
            (1, "join join filter heavy lexical match"),
            (2, "nothing lexical here at all"),
            (3, "join appears once"),
            (4, "filter filter filter"),
        ],
    )
    emb = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0]),  # orthogonal to the query
            (2, [0.9, 0.1, 0.0]),  # strongest vector match
            (3, [0.5, 0.5, 0.0]),
            (4, [0.1, 0.0, 0.9]),
        ],
        "vec_id long, embedding array<float>",
    )
    terms = ["join", "filter"]
    out = hybrid_topk_rrf(docs, emb, terms, query_id=0, dim=3, k=10).collect()

    lex_rank = {
        r.doc_id: i + 1
        for i, r in enumerate(bm25_topk(docs, terms, k=50).collect())
    }
    import math

    vecs = {r.vec_id: r.embedding for r in emb.collect()}
    q = vecs[0]
    dots = sorted(
        (
            (-round(sum(a * b for a, b in zip(q, v)), 4), vid)
            for vid, v in vecs.items()
            if vid != 0
        ),
    )
    vec_rank = {vid: i + 1 for i, (_, vid) in enumerate(dots)}
    want = {}
    for d in set(lex_rank) | set(vec_rank):
        s = 0.0
        if d in lex_rank:
            s += 1.0 / (60 + lex_rank[d])
        if d in vec_rank:
            s += 1.0 / (60 + vec_rank[d])
        want[d] = round(s, 6)
    got = {r.doc_id: r.rrf_score for r in out}
    assert got == {d: want[d] for d in got}
    assert [r.doc_id for r in out] == sorted(
        want, key=lambda d: (-want[d], d)
    )[: len(out)]
    by_id = {r.doc_id: r for r in out}
    # the query doc is lexically rankable but never a vector neighbor
    assert by_id[0].ann_rank is None and by_id[0].bm25_rank is not None
    # doc 2 has no query term: vector-only membership, null lexical rank
    assert by_id[2].bm25_rank is None and by_id[2].ann_rank == 1
