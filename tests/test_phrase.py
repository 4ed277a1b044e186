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
