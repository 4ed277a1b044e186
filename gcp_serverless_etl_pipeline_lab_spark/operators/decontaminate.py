"""Benchmark decontamination: flag training documents that share n-gram
shingles with an evaluation/benchmark set — the standard pre-training
hygiene step (eval answers leaking into training data inflate benchmark
scores, so contaminated docs are dropped or audited before training).

Plan shape: both sides shingle map-side with the same word n-grams as the
dedup family; the EVAL side (benchmarks are small — thousands of docs
against billions of training docs) reduces to a DISTINCT gram set that
broadcasts; the training corpus then anti-probes it with a broadcast hash
join and aggregates per-doc hit counts — the 100 TB training side never
shuffles its text, only (doc_id, hit) pairs reach the count.

min_shared tunes precision: 1 flags any single shared shingle (high
recall, flags boilerplate), higher values require a real overlapping
span. n-gram order n trades the same way (longer shingles = more
specific).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_ngrams_sql


def _grams(docs: DataFrame, n: int) -> DataFrame:
    # Round-15 note: an exchange barrier before the n-gram lambda (the
    # dedup._with_shingles discipline) was BUILT and MEASURED here and
    # REJECTED — A/B at sf0.1 showed the barrier-free spelling equal or
    # faster (8.6 vs 9.6 s first pass, 6.9 s re-run): Spark 4's
    # CollapseProject cost check already declines to inline the split()
    # into the lambda in this shape, so the extra repartition only added
    # two corpus-sized exchanges. Kept barrier-free.
    toked = docs.select(
        "doc_id", F.expr("split(text, ' ', -1)").alias("t")
    ).select("doc_id", F.expr(word_ngrams_sql("t", n)).alias("sh"))
    return toked.select("doc_id", F.explode("sh").alias("g"))


def contamination_report(
    train: DataFrame,
    evalset: DataFrame,
    n: int = 5,
    min_shared: int = 3,
) -> DataFrame:
    """(doc_id, text) train × (doc_id, text) eval → one row per
    contaminated train doc: (doc_id, n_shared) where n_shared is the
    number of DISTINCT n-gram shingles the doc shares with the union of
    all eval docs, kept when >= min_shared.

    Operator order matters at scale: the broadcast probe runs FIRST on the
    raw gram stream (map-side, no shuffle) and only the surviving hit rows
    are distinct-ed — so the one shuffle carries |matches|, not the full
    corpus gram stream. distinct(matches) == matches(distinct), so
    semantics are unchanged (and the oracle is order-free SQL). Local
    sf0.1 wall-clock is unchanged by this ordering (map-side shingle
    generation dominates there); the win is shuffle BYTES, which is the
    binding constraint on a real cluster, where the match rate is tiny."""
    eval_grams = evalset.select(
        F.expr("split(text, ' ', -1)").alias("t")
    ).select(F.explode(F.expr(word_ngrams_sql("t", n))).alias("g")).distinct()
    hits = _grams(train, n).join(F.broadcast(eval_grams), "g").distinct()
    return (
        hits.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
        .orderBy("doc_id")
    )
