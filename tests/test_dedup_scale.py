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


def _unit(vec):
    n = sum(x * x for x in vec) ** 0.5
    return [x / n for x in vec]


def _skewed_vectors(spark, dim=16, hot=200, cold_labels=4, cold_each=10, seed=7):
    """One hot label holding `hot` well-spread unit vectors (50%+ of the
    corpus) plus a few small labels. Three engineered near-dup pairs inside
    the hot label."""
    import random

    rng = random.Random(seed)
    rows = []
    for i in range(hot):
        rows.append((i, 0, _unit([rng.gauss(0, 1) for _ in range(dim)])))
    for lb in range(1, cold_labels + 1):
        for j in range(cold_each):
            rows.append(
                (1000 * lb + j, lb, _unit([rng.gauss(0, 1) for _ in range(dim)]))
            )
    # near-dups: tiny perturbation of three hot vectors
    for k, base_id in enumerate((3, 50, 150)):
        base = rows[base_id][2]
        pert = _unit([x + (0.001 if i == 0 else 0.0) for i, x in enumerate(base)])
        rows.append((5000 + k, 0, pert))
    return (
        spark.createDataFrame(
            rows, "vec_id long, label long, embedding array<double>"
        ),
        [(3, 5000), (50, 5001), (150, 5002)],
    )


def test_cosine_skewed_block_candidates_subquadratic(spark):
    """One label holds 50%+ of the corpus; LSH sub-bucketing must keep the
    candidate join far below |block|² (~3.5% collision for unrelated
    vectors)."""
    vectors, _ = _skewed_vectors(spark)
    n_hot = 203
    quad = n_hot * (n_hot - 1) // 2  # 20503 all-pairs in the hot block
    cand = dedup.cosine_candidate_pairs(vectors, dim=16).count()
    assert cand < quad / 10, f"candidates {cand} not sub-quadratic vs {quad}"


def test_cosine_skewed_block_matches_lsh_blocked_allpairs(spark):
    """Engine == (all-pairs-within-label ∩ hamming(bucket) <= 1) — the
    deterministic predicate the oracle mirrors — and the engineered
    near-dup pairs (θ ≈ 0.001 rad, per-plane split prob θ/π ≈ 3e-4) are
    all recalled."""
    from gcp_serverless_etl_pipeline_lab_spark.operators.similarity import (
        _bucket_expr,
    )

    vectors, expected = _skewed_vectors(spark)
    got = dedup.embedding_cosine_pairs(vectors, dim=16, threshold=0.99)
    pairs = sorted((r["id_a"], r["id_b"]) for r in got.collect())
    vb = vectors.withColumn("bkt", F.expr(_bucket_expr("embedding", 16)))
    a = vb.select(
        F.col("vec_id").alias("id_a"), "label",
        F.col("embedding").alias("ea"), F.col("bkt").alias("ba"),
    )
    b = vb.select(
        F.col("vec_id").alias("id_b"), "label",
        F.col("embedding").alias("eb"), F.col("bkt").alias("bb"),
    )
    dot = F.expr(
        "round(aggregate(sequence(1, 16), CAST(0 AS DOUBLE), (acc, i) -> "
        "acc + element_at(ea, i) * element_at(eb, i)), 4)"
    )
    ref = (
        a.join(b, "label")
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(F.expr("bit_count(CAST(ba AS BIGINT) ^ CAST(bb AS BIGINT)) <= 1"))
        .withColumn("cos", dot)
        .filter(F.col("cos") >= 0.99)
        .select("id_a", "id_b")
        .collect()
    )
    assert pairs == sorted((r["id_a"], r["id_b"]) for r in ref)
    for p in expected:
        assert p in pairs


def test_df_cap_noop_matches_uncapped(spark):
    corpus = _hot_corpus(spark, n=15)
    base = dedup.ngram_jaccard_pairs(corpus, threshold=0.5).collect()
    high_k = dedup.ngram_jaccard_pairs(corpus, threshold=0.5, max_df=100_000).collect()
    assert sorted(map(tuple, base)) == sorted(map(tuple, high_k))
