"""Bigram language-model scoring — the classic perplexity quality filter.

An n-gram LM trained on the corpus itself scores each document's average
token log-probability; documents that score far below the corpus norm are
boilerplate/garble candidates, far above are likely duplicates of the
training mass. This is the standard cheap stand-in for model-based
perplexity filtering in LLM data pipelines.

Numeric design — integer-exact on purpose: Spark's and DuckDB's ``ln``
disagree in the last ulp on ~5% of inputs (measured), so a
floating-point score would make oracle hash-compares flaky. Instead each
log is quantized to integer micro-nats via ``floor(1e6 * ln(n))`` where
``n`` is an integer COUNT — the floor can only disagree across engines
if ``1e6*ln(n)`` lands within ~1e-9 of an integer, a per-DISTINCT-count
risk (~1e-9 each), not a per-token one. Everything downstream (sums,
averages via integer division) is exact BIGINT arithmetic, so engine and
oracle match bit-for-bit.

Add-one smoothing: score(w1 w2) = ilog(c(w1,w2) + 1) - ilog(c(w1·) + V),
with c(w1·) = bigram-head count and V = corpus vocabulary size.

Scale design: the two count joins are keyed by bigram/head, and natural
text is Zipfian — 'the'-headed bigrams alone would melt one reducer. The
join is therefore hybrid hot/cold: heads (or bigrams) with count >=
``hot_threshold`` form a tiny heavy-hitter table that is BROADCAST, the
Zipf tail joins by shuffle; the union preserves exact counts. The
per-doc bigram list is pre-aggregated with a multiplicity column before
either join, so a 1000-repeat span costs one joined row, not 1000.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LOG_SCALE = 1_000_000  # micro-nats


def ilog_micro(n: Column) -> Column:
    """floor(1e6 * ln(n)) as BIGINT — the cross-engine-stable log."""
    return F.floor(F.log(n.cast("double")) * LOG_SCALE).cast("bigint")


def _doc_bigrams(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(doc, w1, w2, k) with k = within-doc multiplicity — one Generate,
    multiplicity folded before any join so repeated spans don't multiply
    join rows."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("t"),
    ).filter(F.size("t") >= 2)
    pairs = toks.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(0, size(t) - 2), i -> struct(t[i] AS w1, t[i + 1] AS w2))")
        ).alias("b"),
    ).select("doc_id", F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2"))
    return pairs.groupBy("doc_id", "w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("k")
    )


def _hybrid_join(
    fact: DataFrame,
    counts: DataFrame,
    keys: list[str],
    cnt_col: str,
    hot_threshold: int,
) -> DataFrame:
    """fact ⋈ counts on ``keys`` with Zipf-head protection: rows of
    ``counts`` at or above ``hot_threshold`` are broadcast (heavy hitters
    are few by definition — at most N/threshold of them), the tail joins
    by shuffle, and the two legs union. Exact — every fact row matches in
    exactly one leg."""
    hot = counts.filter(F.col(cnt_col) >= hot_threshold)
    cold = counts.filter(F.col(cnt_col) < hot_threshold)
    return fact.join(F.broadcast(hot), keys, "inner").unionByName(
        fact.join(cold, keys, "inner")
    )


def doc_logprob_micro(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hot_threshold: int = 1000,
) -> DataFrame:
    """Per-document add-one-smoothed bigram log-probability in exact
    micro-nats: ``score_micro = Σ ilog(c12+1) - ilog(c1+V)`` over the
    doc's bigrams, plus ``n_bigrams`` and the integer average
    ``neg_avg_micro = -score_micro / n_bigrams`` (micro-nats per token,
    positive = surprisal; integer division, exact)."""
    bg = _doc_bigrams(docs, text_col, id_col)

    # corpus statistics (trained on the same corpus being scored)
    c12 = bg.groupBy("w1", "w2").agg(F.sum("k").cast("bigint").alias("c12"))
    c1 = bg.groupBy("w1").agg(F.sum("k").cast("bigint").alias("c1"))
    vocab = (
        bg.select(F.col("w1").alias("w"))
        .unionByName(bg.select(F.col("w2").alias("w")))
        .agg(F.count_distinct("w").alias("v"))
    )

    scored = _hybrid_join(bg, c12, ["w1", "w2"], "c12", hot_threshold)
    scored = _hybrid_join(scored, c1, ["w1"], "c1", hot_threshold)
    scored = scored.crossJoin(F.broadcast(vocab))

    per_doc = (
        scored.withColumn(
            "lp",
            F.col("k")
            * (
                ilog_micro(F.col("c12") + 1)
                - ilog_micro(F.col("c1") + F.col("v"))
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("bigint").alias("n_bigrams"),
            F.sum("lp").cast("bigint").alias("score_micro"),
        )
    )
    # integer division (both operands positive) — exact in engine and oracle
    return per_doc.withColumn(
        "neg_avg_micro", F.expr("(-score_micro) div n_bigrams").cast("bigint")
    )


def _hybrid_left_join(
    fact: DataFrame,
    counts: DataFrame,
    keys: list[str],
    cnt_col: str,
    hot_threshold: int,
) -> DataFrame:
    """LEFT-join variant of ``_hybrid_join`` for scoring against a model
    trained on a DIFFERENT corpus (fact rows may have no counts row).
    Hot counts are broadcast first; only rows that MISSED the hot probe
    go through the shuffle join against the cold tail — so the fact rows
    carrying Zipf-head keys never reach a shuffle reducer, and rows
    missing from both legs keep a NULL ``cnt_col`` exactly once."""
    hot = counts.filter(F.col(cnt_col) >= hot_threshold)
    cold = counts.filter(F.col(cnt_col) < hot_threshold)
    pre = fact.join(F.broadcast(hot), keys, "left")
    hit = pre.filter(F.col(cnt_col).isNotNull())
    miss = pre.filter(F.col(cnt_col).isNull()).drop(cnt_col).join(
        cold, keys, "left"
    )
    return hit.unionByName(miss)


def doc_logprob_micro_model(
    train_docs: DataFrame,
    score_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hot_threshold: int = 1000,
) -> DataFrame:
    """``doc_logprob_micro`` with the model/corpus split: bigram stats
    (c12, head counts, vocabulary) come from ``train_docs``; every
    document of ``score_docs`` is scored under that model. Bigrams or
    heads unseen in training contribute ``ilog(1)=0`` / ``ilog(V)`` via
    the left joins + add-one smoothing — logs stay finite, arithmetic
    stays exact BIGINT."""
    bg_t = _doc_bigrams(train_docs, text_col, id_col)
    c12 = bg_t.groupBy("w1", "w2").agg(F.sum("k").cast("bigint").alias("c12"))
    c1 = bg_t.groupBy("w1").agg(F.sum("k").cast("bigint").alias("c1"))
    vocab = (
        bg_t.select(F.col("w1").alias("w"))
        .unionByName(bg_t.select(F.col("w2").alias("w")))
        .agg(F.count_distinct("w").alias("v"))
    )
    bg_s = _doc_bigrams(score_docs, text_col, id_col)
    scored = _hybrid_left_join(bg_s, c12, ["w1", "w2"], "c12", hot_threshold)
    scored = _hybrid_left_join(scored, c1, ["w1"], "c1", hot_threshold)
    scored = scored.crossJoin(F.broadcast(vocab))
    per_doc = (
        scored.withColumn(
            "lp",
            F.col("k")
            * (
                ilog_micro(F.coalesce(F.col("c12"), F.lit(0)) + 1)
                - ilog_micro(F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("bigint").alias("n_bigrams"),
            F.sum("lp").cast("bigint").alias("score_micro"),
        )
    )
    return per_doc.withColumn(
        "neg_avg_micro", F.expr("(-score_micro) div n_bigrams").cast("bigint")
    )


def dsir_importance_micro(
    docs: DataFrame,
    target_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hot_threshold: int = 1000,
) -> DataFrame:
    """DSIR-style importance scores (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — public method): per
    document, ``importance = log p_target(doc) - log p_raw(doc)`` with
    both sides the integer-exact add-one bigram LM. The target model is
    trained on ``target_docs`` (the in-domain sample), the raw model on
    the full ``docs`` corpus. High importance = looks like the target
    distribution relative to the corpus at large — the selection signal
    importance resampling draws against. Exact micro-nat integers, so
    the ranking is engine-reproducible."""
    t = doc_logprob_micro_model(
        target_docs, docs, text_col, id_col, hot_threshold
    ).select("doc_id", "n_bigrams", F.col("score_micro").alias("_st"))
    r = doc_logprob_micro(docs, text_col, id_col, hot_threshold).select(
        "doc_id", F.col("score_micro").alias("_sr")
    )
    return t.join(r, "doc_id").select(
        "doc_id",
        "n_bigrams",
        (F.col("_st") - F.col("_sr")).cast("bigint").alias("importance_micro"),
    )
