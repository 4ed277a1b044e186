"""Approximate-nearest-neighbor similarity search over an embedding column.

Three strategies over (vec_id, embedding array<float>, label):

- brute_force_topk : broadcast the (small) query set, score every corpus
  vector map-side, rank per query. The exact baseline; scales linearly in
  corpus size and is the right plan whenever |queries| is small — at
  100 TB the corpus never shuffles, only (query, score) pairs do.
- ivf_topk         : restrict scoring to the query's coarse cell (label
  column as the IVF assignment; production = k-means centroids + nprobe).
- lsh_topk         : sign-random-projection LSH — 8 deterministic
  hyperplanes derived from the shared 60-bit hash, bucket = 8 sign bits;
  score only vectors in the query's bucket.

All scoring is built-in array expressions (`aggregate` over `sequence`) —
JVM-side, no Python. Cosine == dot product because input vectors are
unit-norm (asserted in tests).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NUM_PLANES = 8
PLANE_MOD = 2001
PLANE_SHIFT = 1000


@lru_cache(maxsize=8)
def _plane_weights(dim: int) -> tuple[tuple[int, ...], ...]:
    """Deterministic hyperplane weights w(h, i) = h60('lsh|h|i') % 2001
    - 1000, computed ONCE driver-side with hashlib (bit-identical to the
    engine/oracle h60 primitive) and embedded as literals — instead of
    re-hashing 8×dim strings per row inside the projection expression."""
    planes = []
    for h in range(NUM_PLANES):
        row = []
        for i in range(1, dim + 1):
            hx = hashlib.md5(f"lsh|{h}|{i}".encode()).hexdigest()[:15]
            row.append(int(hx, 16) % PLANE_MOD - PLANE_SHIFT)
        planes.append(tuple(row))
    return tuple(planes)


def _dot(a: str, b: str, dim: int) -> F.Column:
    return F.expr(
        f"aggregate(sequence(1, {dim}), CAST(0 AS DOUBLE), (acc, i) -> "
        f"acc + CAST(element_at({a}, i) AS DOUBLE) * CAST(element_at({b}, i) AS DOUBLE))"
    )


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("score_raw"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "neighbor_id", F.round("score_raw", 4).alias("score")
        )
        .orderBy("query_id", "rank")
    )


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (dot on unit vectors)."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score_raw", _dot("qe", "ce", dim))
    )
    return _rank_topk(scored, k)


def ivf_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5) -> DataFrame:
    """Top-k restricted to the query's coarse cell (nprobe=1)."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("label"), F.col("embedding").alias("qe")
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label"),
        F.col("embedding").alias("ce"),
    )
    scored = (
        c.join(F.broadcast(q), "label")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score_raw", _dot("qe", "ce", dim))
    )
    return _rank_topk(scored, k)


def _bucket_expr(vec: str, dim: int) -> str:
    """8-bit sign-LSH bucket id. Hyperplane weights come from the
    cross-dialect hash — w(h, i) = h60('lsh|h|i') % 2001 - 1000 — so the
    DuckDB oracle regenerates the identical planes from the hash while the
    engine embeds them as literal arrays (no per-row hashing)."""
    bits = []
    for h, plane in enumerate(_plane_weights(dim)):
        lits = ", ".join(f"{w}D" for w in plane)
        proj = (
            f"aggregate(zip_with(array({lits}), {vec}, "
            f"(w, x) -> w * CAST(x AS DOUBLE)), "
            f"CAST(0 AS DOUBLE), (a, y) -> a + y)"
        )
        bits.append(f"IF({proj} >= 0, {1 << h}, 0)")
    return " + ".join(bits)


def lsh_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing the query's
    sign-LSH bucket (may return < k rows — that's the accuracy/cost trade;
    recall is measured against brute force in tests)."""
    # coalesce sentinel: see operators.dedup._nn — keeps the implicit
    # isnotnull(bucket) join predicate from re-materializing the whole
    # 512-hash projection as a pushed-down scan filter.
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    ).withColumn("bucket", F.coalesce(F.expr(_bucket_expr("qe", dim)), F.lit(-1)))
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    ).withColumn("bucket", F.coalesce(F.expr(_bucket_expr("ce", dim)), F.lit(-1)))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score_raw", _dot("qe", "ce", dim))
    )
    return _rank_topk(scored, k)
