"""Incremental-batch deduplication: a NEW batch against an EXISTING base.

The daily shape of a 100 TB corpus: the base is already deduped; each
increment must answer "which of these new documents are (exact or near)
duplicates OF THE BASE" without re-running corpus×corpus detection.

- exact: one left-semi join of the batch's md5 against the base's md5 —
  at scale the base side is a pre-materialized hash column (store it at
  ingest; it never changes), so the increment pays one shuffle of the
  BATCH plus a scan of base hashes.
- near: CROSS n-gram Jaccard — gram lists built per side, equi-joined on
  the gram, pair-counted, verified against both sides' set sizes. Only
  new×base pairs exist by construction (no base×base re-detection). The
  document-frequency cap applies to the BASE gram table (the side whose
  boilerplate would otherwise fan out); error mode is false-negative
  only, same contract as dedup.ngram_jaccard_pairs.

At 100 TB the base gram table is the big side: bucket/partition it by
gram at ingest and the increment's join co-locates; the batch side is
small enough that AQE usually broadcasts it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _with_shingles, cap_document_frequency


def exact_dups_vs_base(batch: DataFrame, base: DataFrame) -> DataFrame:
    """Batch rows whose full text already exists in base (by md5)."""
    b = batch.select("doc_id", F.md5("text").alias("k"))
    base_k = base.select(F.md5("text").alias("k"))
    return b.join(base_k, "k", "left_semi").select("doc_id")


def near_dups_vs_base(
    batch: DataFrame,
    base: DataFrame,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """(doc_id, base_id, jaccard) for batch docs whose word-3-gram
    Jaccard vs some base doc clears ``threshold``."""
    sh_new = _with_shingles(batch)
    sh_base = _with_shingles(base)
    g_new = sh_new.select(
        F.col("doc_id").alias("new_id"), F.explode("shingles").alias("g")
    )
    g_base = sh_base.select(
        F.col("doc_id").alias("base_id"), F.explode("shingles").alias("g")
    )
    if max_df is not None:
        g_base = cap_document_frequency(
            g_base.withColumnRenamed("base_id", "doc_id"), max_df
        ).withColumnRenamed("doc_id", "base_id")
    inter = (
        g_new.join(g_base, "g")
        .groupBy("new_id", "base_id")
        .agg(F.count(F.lit(1)).alias("i"))
    )
    sz_new = sh_new.select(
        F.col("doc_id").alias("new_id"), F.size("shingles").alias("sz_n")
    )
    sz_base = sh_base.select(
        F.col("doc_id").alias("base_id"), F.size("shingles").alias("sz_b")
    )
    return (
        inter.join(sz_new, "new_id")
        .join(sz_base, "base_id")
        .withColumn(
            "jaccard",
            F.round(
                F.col("i").cast("double")
                / (F.col("sz_n") + F.col("sz_b") - F.col("i")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("new_id").alias("doc_id"), "base_id", "jaccard")
    )


def classify_batch(
    batch: DataFrame,
    base: DataFrame,
    threshold: float = 0.8,
    max_df: int | None = 10_000,
) -> DataFrame:
    """Every batch row tagged: 'exact_dup' | 'near_dup' | 'new'.

    ``max_df`` defaults ON (10_000) like dedup.ngram_jaccard_pairs — pass
    ``None`` only for an uncapped exact baseline on bounded corpora.

    Exact wins over near (an exact dup is trivially also a near dup);
    near means "no byte-identical base doc, but a Jaccard match".
    """
    exact = exact_dups_vs_base(batch, base).withColumn("_e", F.lit(1))
    near = (
        near_dups_vs_base(batch, base, threshold, max_df)
        .select("doc_id")
        .distinct()
        .withColumn("_n", F.lit(1))
    )
    return (
        batch.select("doc_id")
        .join(exact, "doc_id", "left")
        .join(near, "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("_e").isNotNull(), F.lit("exact_dup"))
            .when(F.col("_n").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("new"))
            .alias("category"),
        )
    )
