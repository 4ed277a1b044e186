"""Exact-phrase retrieval from the positional lexical index (round-14
verdict task 4): positions artifact at build/append/fold, adjacency
vote aggregate, repeated-word phrases, delete masking, and the
positions=False guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from gcp_serverless_etl_pipeline_lab_spark.operators import lexindex
from gcp_serverless_etl_pipeline_lab_spark.sources.tables import load_table

from conftest import SF_SMOKE

PHRASE = ["window", "join"]


def _docs(spark):
    return load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")


def _scan_phrase(spark, docs, terms, k=10):
    """Independent scan-side truth: tokenize fresh, same adjacency."""
    toks = docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.posexplode(F.split("text", " ", -1)).alias("pos", "term"),
    ).filter(F.col("term") != "")
    slots = spark.createDataFrame(
        [(i, t) for i, t in enumerate(terms)], "slot int, term string"
    )
    votes = toks.join(slots, "term").select(
        "doc_id", "slot", (F.col("pos") - F.col("slot")).alias("start")
    )
    occ = (
        votes.groupBy("doc_id", "start")
        .agg(F.countDistinct("slot").alias("ns"))
        .filter(F.col("ns") == len(terms))
    )
    return (
        occ.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .orderBy(F.col("n_hits").desc(), "doc_id")
        .limit(k)
    )


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_phrase_probe_equals_scan_through_append(spark, tmp_path):
    docs = _docs(spark)
    idx = str(tmp_path / "lex")
    lexindex.build_lexical_index(
        docs.filter(F.col("doc_id") % 2 == 0), idx, positions=True
    )
    assert lexindex.append_lexical_index(
        spark, docs.filter(F.col("doc_id") % 2 == 1), idx, "odd"
    ) is True
    got = _rows(lexindex.phrase_topk_from_index(spark, idx, PHRASE, k=10))
    want = _rows(_scan_phrase(spark, docs, PHRASE, k=10))
    assert got == want and got
    # string form accepted too
    got2 = _rows(
        lexindex.phrase_topk_from_index(spark, idx, " ".join(PHRASE), k=10)
    )
    assert got2 == got


def test_phrase_repeated_word_and_overlaps(spark, tmp_path):
    """'a a' inside 'a a a' = TWO overlapping occurrences — substring
    replace-counting finds one; the position votes find both."""
    docs = spark.createDataFrame(
        [
            (1, "a a a"),
            (2, "a b a a"),
            (3, "b a b a"),
            (4, "a a b a a b a a"),
        ],
        "doc_id bigint, text string",
    )
    idx = str(tmp_path / "lex")
    lexindex.build_lexical_index(docs, idx, positions=True)
    got = _rows(lexindex.phrase_topk_from_index(spark, idx, ["a", "a"], k=10))
    assert got == [(4, 3), (1, 2), (2, 1)]
    # a 3-slot phrase with a repeat — only doc 4 has 'a a b' ('a b a a'
    # would need a token past its end)
    got3 = _rows(
        lexindex.phrase_topk_from_index(spark, idx, ["a", "a", "b"], k=10)
    )
    assert got3 == [(4, 2)]


def test_phrase_requires_positions(spark, tmp_path):
    docs = _docs(spark)
    idx = str(tmp_path / "lex")
    lexindex.build_lexical_index(docs, idx)
    with pytest.raises(ValueError, match="positions=True"):
        lexindex.phrase_topk_from_index(spark, idx, PHRASE)


def test_phrase_maintained_through_nightly(spark, tmp_path):
    """A positional index fed by the unified nightly loop keeps serving
    phrases: the nightly append honors the manifest's positions flag, so
    docs ingested through run_nightly are phrase-searchable (and a
    nightly-ingested DELETE stops their phrases matching)."""
    import os

    from gcp_serverless_etl_pipeline_lab_spark.streaming.nightly import (
        run_nightly,
    )

    docs = _docs(spark)
    idx = str(tmp_path / "lex")
    inbox = str(tmp_path / "inbox")
    deletes = str(tmp_path / "deletes")
    lexindex.build_lexical_index(
        docs.filter(F.col("doc_id") % 2 == 0), idx, positions=True
    )
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(inbox, "epoch=1"))
    r = run_nightly(spark, inbox, lex_index_path=idx)
    assert r["appended_lex"] == ["epoch=1"]
    got = _rows(lexindex.phrase_topk_from_index(spark, idx, PHRASE, k=10))
    want = _rows(_scan_phrase(spark, docs, PHRASE, k=10))
    assert got == want and got
    # a nightly delete removes the doc's phrases too
    victim = [got[0][0]]
    spark.createDataFrame([(v,) for v in victim], "doc_id bigint").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(deletes, "take=1"))
    r2 = run_nightly(spark, inbox, lex_index_path=idx, deletes_dir=deletes)
    assert r2["applied_deletes"] == ["take=1"]
    got2 = _rows(lexindex.phrase_topk_from_index(spark, idx, PHRASE, k=10))
    want2 = _rows(
        _scan_phrase(
            spark, docs.filter(~F.col("doc_id").isin(victim)), PHRASE, k=10
        )
    )
    assert got2 == want2 and victim[0] not in {d for d, _ in got2}


def test_phrase_respects_deletes_and_fold(spark, tmp_path):
    docs = _docs(spark)
    idx = str(tmp_path / "lex")
    lexindex.build_lexical_index(
        docs.filter(F.col("doc_id") % 2 == 0), idx, positions=True
    )
    assert lexindex.append_lexical_index(
        spark, docs.filter(F.col("doc_id") % 2 == 1), idx, "odd"
    ) is True
    doomed = docs.filter(F.col("doc_id") % 5 == 0).select("doc_id")
    assert lexindex.delete_from_lexical_index(spark, doomed, idx, "take") is True
    survivors = docs.filter(F.col("doc_id") % 5 != 0)
    want = _rows(_scan_phrase(spark, survivors, PHRASE, k=10))
    got = _rows(lexindex.phrase_topk_from_index(spark, idx, PHRASE, k=10))
    assert got == want and got
    # physical application: the fold rewrites positions minus tombstones
    gen = lexindex.compact_lexical_index(spark, idx)
    assert os.path.isdir(os.path.join(idx, "positions", f"gen={gen}"))
    got2 = _rows(lexindex.phrase_topk_from_index(spark, idx, PHRASE, k=10))
    assert got2 == want
    # ...and the folded positions physically exclude the deleted docs
    folded = spark.read.parquet(os.path.join(idx, "positions", f"gen={gen}"))
    left = {r["doc_id"] for r in folded.select("doc_id").distinct().collect()}
    assert not left & {r["doc_id"] for r in doomed.collect()}


def test_phrase_batch_equals_single(spark, tmp_path):
    """Round-15 verdict task 5: B phrases in one positional pass must
    answer exactly as B single-phrase probes — including a repeated-word
    phrase, whose slots must each be satisfied at their own offset."""
    docs = _docs(spark)
    idx = str(tmp_path / "lex")
    lexindex.build_lexical_index(
        docs.filter(F.col("doc_id") % 2 == 0), idx, positions=True
    )
    assert lexindex.append_lexical_index(
        spark, docs.filter(F.col("doc_id") % 2 == 1), idx, "odd"
    ) is True
    phrases = [(0, "window join"), (1, "the filter"), (2, "join join")]
    pf = spark.createDataFrame(phrases, "query_id bigint, phrase string")
    batch = {
        (r["query_id"], r["doc_id"], r["n_hits"])
        for r in lexindex.phrase_matching_docs_batch(spark, idx, pf).collect()
    }
    single = set()
    for qid, ph in phrases:
        for r in lexindex.phrase_matching_docs(spark, idx, ph).collect():
            single.add((qid, r["doc_id"], r["n_hits"]))
    assert batch == single and batch


def test_phrase_batch_respects_deletes(spark, tmp_path):
    docs = _docs(spark)
    idx = str(tmp_path / "lex")
    lexindex.build_lexical_index(docs, idx, positions=True)
    match_ids = sorted(
        r["doc_id"]
        for r in lexindex.phrase_matching_docs(spark, idx, PHRASE).collect()
    )
    assert match_ids
    vid = match_ids[0]
    ids = spark.createDataFrame([(vid,)], "doc_id bigint")
    assert lexindex.delete_from_lexical_index(spark, ids, idx, "take") is True
    pf = spark.createDataFrame(
        [(0, " ".join(PHRASE))], "query_id bigint, phrase string"
    )
    got = {
        r["doc_id"]
        for r in lexindex.phrase_matching_docs_batch(spark, idx, pf).collect()
    }
    assert vid not in got and got == set(match_ids) - {vid}


def test_hybrid_phrase_batch_equals_single(spark, tmp_path):
    """Phrase-constrained hybrid serving (round-15 verdict task 1):
    batch spelling == per-query single spelling, and the single
    spelling == manual composition through filter_ids."""
    from gcp_serverless_etl_pipeline_lab_spark.operators import annindex

    docs = _docs(spark)
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    lex = str(tmp_path / "lex")
    ann = str(tmp_path / "ann")
    lexindex.build_lexical_index(docs, lex, positions=True)
    annindex.build_ann_index(
        emb, ann, 64, cells=8, iters=2, sample_rate=1.0
    )
    queries = {3: ["filter", "vector"], 7: ["join", "filter", "vector"]}
    phrase = " ".join(PHRASE)
    # single == manual composition
    q7 = emb.filter(F.col("vec_id") == 7)
    got = _rows(
        lexindex.hybrid_topk_rrf_from_index(
            spark, lex, ann, queries[7], q7, k=10, phrase=phrase
        )
    )
    allowed = lexindex.phrase_matching_docs(spark, lex, phrase).select("doc_id")
    want = _rows(
        lexindex.hybrid_topk_rrf_from_index(
            spark, lex, ann, queries[7], q7, k=10, filter_ids=allowed
        )
    )
    assert got == want and got
    # batch == per-query single
    qt = spark.createDataFrame(
        [(qid, t) for qid, ts in queries.items() for t in ts],
        "query_id bigint, term string",
    )
    qv = emb.filter(F.col("vec_id").isin(list(queries)))
    qp = spark.createDataFrame(
        [(qid, phrase) for qid in queries], "query_id bigint, phrase string"
    )
    brows = {
        tuple(r)
        for r in lexindex.hybrid_topk_rrf_batch(
            spark, lex, ann, qt, qv, k=10, query_phrases=qp
        ).collect()
    }
    srows = set()
    for qid, terms in queries.items():
        qq = emb.filter(F.col("vec_id") == qid)
        for r in lexindex.hybrid_topk_rrf_from_index(
            spark, lex, ann, terms, qq, k=10, phrase=phrase
        ).collect():
            srows.add((qid,) + tuple(r))
    assert brows == srows and brows
    # a partially-phrased batch is rejected loudly
    import pytest

    with pytest.raises(ValueError, match="query_phrases"):
        lexindex.hybrid_topk_rrf_batch(
            spark, lex, ann, qt, qv, k=10,
            query_phrases=spark.createDataFrame(
                [(3, phrase)], "query_id bigint, phrase string"
            ),
        ).count()


def test_proximity_matching_semantics_and_deletes(spark, tmp_path):
    """Proximity search (round 15): all terms within a token window,
    order-free; window=1 degenerates to single-position (impossible for
    2 distinct terms); deleted docs are masked; requires positions."""
    docs = spark.createDataFrame(
        [
            (1, "a x x b"),          # a..b span 4
            (2, "b a"),              # span 2, order-free
            (3, "a x x x x x x x b"),  # span 9 — outside window 4 and 8
            (4, "a b x a x x b"),    # two qualifying anchors at w=4
            (5, "a a a"),            # never (no b)
        ],
        "doc_id bigint, text string",
    )
    idx = str(tmp_path / "lex")
    lexindex.build_lexical_index(docs, idx, positions=True)
    got4 = {
        (r["doc_id"], r["n_hits"])
        for r in lexindex.proximity_matching_docs(
            spark, idx, ["a", "b"], window=4
        ).collect()
    }
    # doc 1: anchor at pos0 (a, window [0,3] holds b@3) = 1 hit
    # doc 2: anchor at b@0 covers a@1 = 1 hit (order-free)
    # doc 4: tokens a0 b1 a3 b6 — anchors: a0 [0,3] has b1; b1 [1,4] has
    # a3; a3 [3,6] has b6 = 3 hits
    assert got4 == {(1, 1), (2, 1), (4, 3)}
    got1 = lexindex.proximity_matching_docs(spark, idx, ["a", "b"], window=1)
    assert got1.count() == 0
    # phrase-consistency: a window-2 proximity hit for adjacent pairs
    got2 = {
        r["doc_id"]
        for r in lexindex.proximity_matching_docs(
            spark, idx, ["a", "b"], window=2
        ).collect()
    }
    assert got2 == {2, 4}
    # deletes mask
    assert lexindex.delete_from_lexical_index(
        spark, spark.createDataFrame([(4,)], "doc_id bigint"), idx, "take"
    ) is True
    got4b = {
        r["doc_id"]
        for r in lexindex.proximity_matching_docs(
            spark, idx, ["a", "b"], window=4
        ).collect()
    }
    assert got4b == {1, 2}
    import pytest

    with pytest.raises(ValueError, match="window"):
        lexindex.proximity_matching_docs(spark, idx, ["a", "b"], window=0)
    plain = str(tmp_path / "plain")
    lexindex.build_lexical_index(docs, plain)
    with pytest.raises(ValueError, match="positions=True"):
        lexindex.proximity_matching_docs(spark, plain, ["a", "b"]).count()


def test_proximity_composes_as_filter_ids(spark, tmp_path):
    """The proximity set composes into indexed BM25 exactly like the
    phrase set — proximity-constrained relevance ranking."""
    docs = _docs(spark)
    idx = str(tmp_path / "lex")
    lexindex.build_lexical_index(docs, idx, positions=True)
    terms = ["join", "filter", "vector"]
    prox = lexindex.proximity_matching_docs(spark, idx, terms, window=8)
    allowed = {r["doc_id"] for r in prox.collect()}
    assert allowed
    out = lexindex.bm25_topk_from_index(
        spark, idx, terms, k=10, filter_ids=prox.select("doc_id")
    )
    got = [tuple(r) for r in out.collect()]
    assert got and all(doc in allowed for doc, _, _ in got)


def test_hybrid_proximity_equals_composition_and_ands_with_phrase(
    spark, tmp_path
):
    """near_terms on the hybrid == manual proximity-set composition; a
    phrase and a proximity constraint AND together."""
    from gcp_serverless_etl_pipeline_lab_spark.operators import annindex

    docs = _docs(spark)
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    lex = str(tmp_path / "lex")
    ann = str(tmp_path / "ann")
    lexindex.build_lexical_index(docs, lex, positions=True)
    annindex.build_ann_index(emb, ann, 64, cells=8, iters=2, sample_rate=1.0)
    terms = ["join", "filter", "vector"]
    q7 = emb.filter(F.col("vec_id") == 7)
    got = _rows(
        lexindex.hybrid_topk_rrf_from_index(
            spark, lex, ann, terms, q7, k=10, near_terms=terms, near_window=8
        )
    )
    allowed = lexindex.proximity_matching_docs(
        spark, lex, terms, window=8
    ).select("doc_id")
    want = _rows(
        lexindex.hybrid_topk_rrf_from_index(
            spark, lex, ann, terms, q7, k=10, filter_ids=allowed
        )
    )
    assert got == want and got
    # phrase AND proximity: both constraints applied
    both = _rows(
        lexindex.hybrid_topk_rrf_from_index(
            spark, lex, ann, terms, q7, k=10,
            phrase=PHRASE, near_terms=terms, near_window=8,
        )
    )
    pm = lexindex.phrase_matching_docs(spark, lex, PHRASE).select("doc_id")
    manual = _rows(
        lexindex.hybrid_topk_rrf_from_index(
            spark, lex, ann, terms, q7, k=10,
            filter_ids=pm.join(allowed, "doc_id", "left_semi"),
        )
    )
    assert both == manual


def test_proximity_batch_equals_single_and_hybrid_near_batch(spark, tmp_path):
    """Batch proximity == per-query single; query_near_terms through the
    batch hybrid == per-query near_terms singles; partial coverage
    rejected."""
    from gcp_serverless_etl_pipeline_lab_spark.operators import annindex

    docs = _docs(spark)
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", "embedding"
    )
    lex = str(tmp_path / "lex")
    ann = str(tmp_path / "ann")
    lexindex.build_lexical_index(docs, lex, positions=True)
    annindex.build_ann_index(emb, ann, 64, cells=8, iters=2, sample_rate=1.0)
    near = {3: ["filter", "vector"], 7: ["join", "filter", "vector"]}
    qt_near = spark.createDataFrame(
        [(qid, t) for qid, ts in near.items() for t in ts],
        "query_id bigint, term string",
    )
    batch = {
        tuple(r)
        for r in lexindex.proximity_matching_docs_batch(
            spark, lex, qt_near, window=6
        ).collect()
    }
    single = set()
    for qid, ts in near.items():
        for r in lexindex.proximity_matching_docs(
            spark, lex, ts, window=6
        ).collect():
            single.add((qid, r["doc_id"], r["n_hits"]))
    assert batch == single and batch
    # hybrid batch with query_near_terms == per-query single with near_terms
    qt = spark.createDataFrame(
        [(qid, t) for qid, ts in near.items() for t in ts],
        "query_id bigint, term string",
    )
    qv = emb.filter(F.col("vec_id").isin(list(near)))
    brows = {
        tuple(r)
        for r in lexindex.hybrid_topk_rrf_batch(
            spark, lex, ann, qt, qv, k=10,
            query_near_terms=qt_near, near_window=6,
        ).collect()
    }
    srows = set()
    for qid, ts in near.items():
        qq = emb.filter(F.col("vec_id") == qid)
        for r in lexindex.hybrid_topk_rrf_from_index(
            spark, lex, ann, ts, qq, k=10, near_terms=ts, near_window=6
        ).collect():
            srows.add((qid,) + tuple(r))
    assert brows == srows and brows
    import pytest

    with pytest.raises(ValueError, match="query_near_terms"):
        lexindex.hybrid_topk_rrf_batch(
            spark, lex, ann, qt, qv, k=10,
            query_near_terms=spark.createDataFrame(
                [(3, "filter")], "query_id bigint, term string"
            ),
        ).count()
