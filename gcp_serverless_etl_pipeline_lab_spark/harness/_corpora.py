"""Shared synthetic dup-corpus builders (Spark + DuckDB twins).

The test tables contain no duplicates, so the dedup/cluster harness
queries synthesize them deterministically: every 7th doc gets an exact
copy (+1_000_000 id) and every 11th a near-copy with the first word
dropped (+2_000_000 id). The DuckDB side rebuilds the identical corpus so
detector output is verified value-for-value. Lives in its own module
(not the dedup module) so any harness module can import it without touching
the registration import cycle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup

EMB_DIM = 64


def _doc_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    # parallelize=True: documents is small (5 k rows at sf0.1, under the
    # auto threshold) but the per-row shingle/signature work downstream is
    # heavy, so a 32-way spread of the single-row-group scan pays for
    # itself many times over.
    from ..sources.tables import load_table

    d = load_table(spark, sf_dir, "documents", parallelize=True).select(
        "doc_id", "text"
    )
    exact = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    near = d.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
    )
    return d.unionAll(exact).unionAll(near)


_DOC_CORPUS_DUCK = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 2000000, substr(text, strpos(text, ' ') + 1)
  FROM documents WHERE doc_id % 11 = 0
)"""


def _vec_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
    base = emb.select(
        "vec_id", "label", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding")
    )
    pert0 = emb.filter(F.col("vec_id") % 13 == 0).select(
        "vec_id",
        "label",
        F.expr(
            f"transform(sequence(1, {EMB_DIM}), i -> "
            "CAST(element_at(embedding, i) AS DOUBLE) + IF(i = 1, 0.05D, 0D))"
        ).alias("p"),
    )
    # Norm materialized behind a barrier — inlined into the transform
    # lambda it would be re-evaluated per element (dedup._barrier).
    pert = dedup._barrier(
        pert0.withColumn(
            "nrm",
            F.expr("sqrt(aggregate(p, CAST(0 AS DOUBLE), (a, y) -> a + y * y))"),
        )
    ).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        "label",
        F.expr("transform(p, x -> x / nrm)").alias("embedding"),
    )
    return base.unionAll(pert)


_VEC_CORPUS_DUCK = f"""
vbase AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
vpert0 AS (
  SELECT vec_id, label,
         list_transform(range(1, {EMB_DIM + 1}),
           i -> e[i] + CASE WHEN i = 1 THEN 0.05 ELSE 0 END) AS p
  FROM vbase WHERE vec_id % 13 = 0
),
vcorpus AS (
  SELECT vec_id, label, e FROM vbase
  UNION ALL
  SELECT vec_id + 1000000, label,
         list_transform(p, x -> x / sqrt(list_sum(list_transform(p, y -> y * y))))
  FROM vpert0
)"""
