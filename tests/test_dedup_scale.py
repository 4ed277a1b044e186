"""Scale-robustness property tests for the dedup operators: the
document-frequency cap must bound the shingle self-join on a hot-shingle
corpus without disturbing exact results when it is a no-op."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_serverless_etl_pipeline_lab_spark.operators import dedup


def _hot_corpus(spark, n=40):
    """Every doc shares one hot 3-gram ('common hot shingle'); the rest of
    each doc is unique. Docs 900/901 are true near-dups of each other."""
    rows = [
        (i, f"common hot shingle u{i} v{i} w{i} x{i} y{i} z{i}")
        for i in range(n)
    ]
    near = "common hot shingle alpha beta gamma delta epsilon zeta eta theta"
    rows.append((900, near))
    rows.append((901, near + " iota"))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _grams(corpus):
    sh = dedup._with_shingles(corpus)
    return sh.select("doc_id", F.explode("shingles").alias("g"))


def _pair_count(grams):
    a, b = grams.alias("a"), grams.alias("b")
    return a.join(
        b, (F.col("a.g") == F.col("b.g")) & (F.col("a.doc_id") < F.col("b.doc_id"))
    ).count()


def test_df_cap_bounds_hot_shingle_join(spark):
    corpus = _hot_corpus(spark, n=40)
    grams = _grams(corpus)
    uncapped = _pair_count(grams)
    capped = _pair_count(dedup.cap_document_frequency(grams, max_df=10))
    # hot gram alone contributes C(42,2) = 861 pair rows; docs 900/901 share
    # 6 more non-hot grams
    assert uncapped >= 861
    # with the cap only genuinely-shared rare grams survive (900/901's)
    assert capped <= 10
    assert capped < uncapped


def test_df_cap_keeps_true_near_dups(spark):
    corpus = _hot_corpus(spark, n=40)
    pairs = dedup.ngram_jaccard_pairs(corpus, threshold=0.5, max_df=10).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in pairs] == [(900, 901)]


def test_df_cap_noop_matches_uncapped(spark):
    corpus = _hot_corpus(spark, n=15)
    base = dedup.ngram_jaccard_pairs(corpus, threshold=0.5).collect()
    high_k = dedup.ngram_jaccard_pairs(corpus, threshold=0.5, max_df=100_000).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, high_k))
