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


def _lm_stats(bg: DataFrame):
    """Bigram-LM sufficient statistics from a (doc, w1, w2, k) frame:
    bigram counts, head counts, and the 1-row vocabulary size. The
    vocabulary is clamped to >= 1 so a model trained on a corpus with NO
    bigrams stays finite: every add-one-smoothed bigram then scores
    ``ilog(0+1) - ilog(0+1) = 0`` — the uninformative model assigns 0,
    not NULL (found by tests/test_properties_lmscore.py: an unclamped
    empty model put ln(0) = NULL into every score)."""
    c12 = bg.groupBy("w1", "w2").agg(F.sum("k").cast("bigint").alias("c12"))
    # head counts and vocabulary are DERIVED from the bigram aggregate —
    # algebraically identical (c1(w) = Σ_w2 c12(w, w2); the distinct-word
    # set of bg equals that of c12) but re-aggregates the compact count
    # table instead of making two more passes over the full (doc, w1, w2)
    # frame: bg is consumed ONCE per stats build.
    c1 = c12.groupBy("w1").agg(F.sum("c12").cast("bigint").alias("c1"))
    vocab = (
        c12.select(F.col("w1").alias("w"))
        .unionByName(c12.select(F.col("w2").alias("w")))
        .agg(F.greatest(F.count_distinct("w"), F.lit(1)).alias("v"))
    )
    return c12, c1, vocab


def _score_bigrams(
    bg_s: DataFrame,
    c12: DataFrame,
    c1: DataFrame,
    vocab: DataFrame,
    hot_threshold: int,
    trained: bool,
    fact_c12: DataFrame | None = None,
    fact_c1: DataFrame | None = None,
) -> DataFrame:
    """Score a (doc, w1, w2, k) frame against LM stats; the shared core of
    the same-corpus and trained-model variants (their equivalence on a
    shared corpus is pinned in tests/test_lmscore.py).

    ``trained=False``: stats were built from ``bg_s`` itself, so every
    fact row has counts — the inner ``_hybrid_join`` applies, and its
    model-count hot split IS a fact-frequency split (same frame).

    ``trained=True``: fact rows may be absent from the stats, and —
    critically — the skew that melts a reducer lives on the FACT side,
    not the model side: a corpus-wide heavy-hitter bigram missing from
    the target model would sail past a model-count hot split straight
    into one shuffle reducer. The hot split is therefore keyed on FACT
    frequencies (``_hybrid_left_join``), and missing counts coalesce to
    0 for add-one smoothing. When the caller already aggregated the fact
    side (``fact_c12``/``fact_c1`` — e.g. DSIR's raw-model stats, built
    from the very frame being scored), those counts serve as the
    frequency source and no extra aggregation runs; occurrence sums
    upper-bound row counts, so the hot set can only widen, never miss."""
    if trained:
        hk12 = (
            fact_c12.filter(F.col("c12") >= hot_threshold).select("w1", "w2")
            if fact_c12 is not None
            else None
        )
        hk1 = (
            fact_c1.filter(F.col("c1") >= hot_threshold).select("w1")
            if fact_c1 is not None
            else None
        )
        scored = _hybrid_left_join(
            bg_s, c12, ["w1", "w2"], "c12", hot_threshold, hot_keys=hk12
        )
        scored = _hybrid_left_join(
            scored, c1, ["w1"], "c1", hot_threshold, hot_keys=hk1
        )
    else:
        scored = _hybrid_join(bg_s, c12, ["w1", "w2"], "c12", hot_threshold)
        scored = _hybrid_join(scored, c1, ["w1"], "c1", hot_threshold)
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
    # integer division (both operands positive) — exact in engine and oracle
    return per_doc.withColumn(
        "neg_avg_micro", F.expr("(-score_micro) div n_bigrams").cast("bigint")
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
    positive = surprisal; integer division, exact). Model trained on the
    same corpus being scored."""
    bg = _doc_bigrams(docs, text_col, id_col)
    c12, c1, vocab = _lm_stats(bg)
    return _score_bigrams(bg, c12, c1, vocab, hot_threshold, trained=False)


def _hybrid_left_join(
    fact: DataFrame,
    counts: DataFrame,
    keys: list[str],
    cnt_col: str,
    hot_threshold: int,
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """LEFT-join variant of ``_hybrid_join`` for scoring against a model
    trained on a DIFFERENT corpus (fact rows may have no counts row).

    The hot set is keyed on FACT-side frequency — the quantity that
    actually decides reducer load. (Keying on model counts is wrong here:
    a corpus-wide heavy hitter ABSENT from the model has no model count
    at all, and would land its entire fact row set on one shuffle
    reducer.) ``hot_keys`` lets a caller that already holds fact-side
    aggregates supply that set and skip the extra aggregation.

    Plan shape — deliberately SPLIT-FREE (a filter-into-two-legs union
    re-evaluates the whole upstream subtree per leg; with two chained
    joins that compounded to a measured 5x wall blowup):

    1. mark hot-key rows via a broadcast of the hot key set;
    2. attach hot rows' counts from a broadcast of ``counts`` restricted
       to hot keys (tiny: one row per hot key at most);
    3. REWRITE the marked rows' join key to a per-row sentinel before the
       single shuffle join against the full ``counts`` — mangled keys
       match nothing and hash uniformly, so the hot keys' row mass
       spreads across reducers instead of stacking on one;
    4. coalesce the broadcast-attached and shuffle-attached counts.

    Every fact row survives exactly once, with NULL ``cnt_col`` where the
    model is silent."""
    if hot_keys is None:
        hot_keys = (
            fact.groupBy(keys)
            .agg(F.count(F.lit(1)).alias("_kf"))
            .filter(F.col("_kf") >= hot_threshold)
            .select(keys)
        )
    hot_counts = counts.join(F.broadcast(hot_keys), keys, "left_semi")
    marked = fact.join(
        F.broadcast(hot_keys.withColumn("_hot", F.lit(True))), keys, "left"
    )
    with_hot = marked.join(
        F.broadcast(hot_counts.withColumnRenamed(cnt_col, "_cnt_b")),
        keys,
        "left",
    )
    # sentinel join key for hot rows: "\0<doc_id>" cannot collide with a
    # real token (corpus tokens never contain NUL) and is unique-ish per
    # doc, so the shuffle spreads instead of stacking
    k0 = keys[0]
    spread = with_hot.withColumn(
        "_jk",
        F.when(
            F.col("_hot").isNotNull(),
            F.concat(F.lit("\u0000"), F.col("doc_id").cast("string")),
        ).otherwise(F.col(k0)),
    )
    counts_r = counts.withColumnRenamed(k0, "_jk").withColumnRenamed(
        cnt_col, "_cnt_s"
    )
    join_keys = ["_jk"] + keys[1:]
    out = spread.join(counts_r, join_keys, "left")
    return (
        out.withColumn(cnt_col, F.coalesce(F.col("_cnt_b"), F.col("_cnt_s")))
        .drop("_hot", "_cnt_b", "_cnt_s", "_jk")
    )


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
    c12, c1, vocab = _lm_stats(_doc_bigrams(train_docs, text_col, id_col))
    bg_s = _doc_bigrams(score_docs, text_col, id_col)
    return _score_bigrams(bg_s, c12, c1, vocab, hot_threshold, trained=True)


def dsir_importance_micro(
    docs: DataFrame,
    target_docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hot_threshold: int = 1000,
    stage: bool | None = None,
) -> DataFrame:
    """DSIR-style importance scores (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling" — public method): per
    document, ``importance = log p_target(doc) - log p_raw(doc)`` with
    both sides the integer-exact add-one bigram LM. The target model is
    trained on ``target_docs`` (the in-domain sample), the raw model on
    the full ``docs`` corpus. High importance = looks like the target
    distribution relative to the corpus at large — the selection signal
    importance resampling draws against. Exact micro-nat integers, so
    the ranking is engine-reproducible.

    Plan shape (rebuilt in round 8 — the earlier two-pass composition
    leaned on a ReuseExchange bet that Catalyst canonically does NOT
    honor: the consumers aggregate differently above the shared bigram
    subtree, so their exchanges never canonicalize equal; measured 0
    ReusedExchange nodes). Three levers make the plan scale instead:

    1. FUSED scoring: the corpus bigram frame is joined against all four
       count tables (target c12/c1 via hybrid LEFT joins, raw c12/c1 via
       hybrid inner joins) and aggregated per doc ONCE — target score,
       raw score, and their difference come out of the same pass, so the
       fact side is consumed once, not twice, and the final
       score-vs-score join disappears.
    2. Head counts / vocabulary derived from the c12 aggregate
       (``_lm_stats``), so each bigram frame feeds exactly ONE corpus-
       wide aggregation.
    3. ``stage=True`` persists the two SMALL c12 count tables (not the
       full bigram frame) — every hot-key set, derived stat, and join
       side reads the compact aggregate instead of re-running
       tokenize→explode→groupBy per consumer. At 100 TB write these
       aggregates to parquet instead; persist is the single-job spelling
       of the same staging. ``stage=None`` (default, round 16) decides
       from the corpus's scan metadata; the crossover was MEASURED from
       both sides — at 0.7 MB of source (x1 stress / sf0.1) unstaged
       wins (4.59 vs 5.29 s x1; 4.29 vs 4.45 s mean at sf0.1,
       hash-identical), at 7.7 MB (x10 stress) staged wins (7.53 vs
       11.17 s) because the re-derivations grow with the corpus while
       the persist stays aggregate-sized — so the gate sits inside the
       bracket at 4 MB and every larger input stages.

    Net: the corpus text is tokenized twice (raw-stats build + fact
    pass), the target text once — independent of how many stats consume
    them. Plan pinned in tests/test_plans_round6.py; x10 stress 18.7 s →
    ~8 s, hash-identical."""
    if stage is None:
        from ..functions.scan_meta import source_bytes

        src = source_bytes(docs)
        stage = src is None or src >= 4 << 20
    bg = _doc_bigrams(docs, text_col, id_col)
    tgt_bg = _doc_bigrams(target_docs, text_col, id_col)
    tc12, tc1, tvocab = _lm_stats(tgt_bg)
    rc12, rc1, rvocab = _lm_stats(bg)
    if stage:
        from pyspark import StorageLevel

        tc12 = tc12.persist(StorageLevel.MEMORY_AND_DISK)
        rc12 = rc12.persist(StorageLevel.MEMORY_AND_DISK)
        # re-derive the dependent stats from the STAGED aggregates
        c1_of = lambda c12: c12.groupBy("w1").agg(  # noqa: E731
            F.sum("c12").cast("bigint").alias("c1")
        )
        v_of = lambda c12: (  # noqa: E731
            c12.select(F.col("w1").alias("w"))
            .unionByName(c12.select(F.col("w2").alias("w")))
            .agg(F.greatest(F.count_distinct("w"), F.lit(1)).alias("v"))
        )
        tc1, tvocab = c1_of(tc12), v_of(tc12)
        rc1, rvocab = c1_of(rc12), v_of(rc12)

    # hot-key sets from FACT-side frequencies (rc12/rc1 ARE the fact
    # aggregates — occurrence sums upper-bound row counts, so the hot set
    # can only widen, never miss; same contract as _hybrid_left_join)
    hk12 = rc12.filter(F.col("c12") >= hot_threshold).select("w1", "w2")
    hk1 = rc1.filter(F.col("c1") >= hot_threshold).select("w1")
    scored = _hybrid_left_join(
        bg,
        tc12.withColumnRenamed("c12", "c12t"),
        ["w1", "w2"],
        "c12t",
        hot_threshold,
        hot_keys=hk12,
    )
    scored = _hybrid_left_join(
        scored,
        tc1.withColumnRenamed("c1", "c1t"),
        ["w1"],
        "c1t",
        hot_threshold,
        hot_keys=hk1,
    )
    # raw counts come from the same corpus as the fact frame, so every
    # row matches and LEFT ≡ inner — but the split-free left-hybrid is
    # the one that does NOT re-evaluate the (already twice-joined)
    # upstream subtree per hot/cold leg the way _hybrid_join's two-leg
    # union would.
    scored = _hybrid_left_join(
        scored,
        rc12.withColumnRenamed("c12", "c12r"),
        ["w1", "w2"],
        "c12r",
        hot_threshold,
        hot_keys=hk12,
    )
    scored = _hybrid_left_join(
        scored,
        rc1.withColumnRenamed("c1", "c1r"),
        ["w1"],
        "c1r",
        hot_threshold,
        hot_keys=hk1,
    )
    scored = scored.crossJoin(
        F.broadcast(tvocab.withColumnRenamed("v", "vt"))
    ).crossJoin(F.broadcast(rvocab.withColumnRenamed("v", "vr")))
    per_doc = (
        scored.withColumn(
            "lp_t",
            F.col("k")
            * (
                ilog_micro(F.coalesce(F.col("c12t"), F.lit(0)) + 1)
                - ilog_micro(F.coalesce(F.col("c1t"), F.lit(0)) + F.col("vt"))
            ),
        )
        .withColumn(
            "lp_r",
            F.col("k")
            * (
                ilog_micro(F.coalesce(F.col("c12r"), F.lit(0)) + 1)
                - ilog_micro(F.coalesce(F.col("c1r"), F.lit(0)) + F.col("vr"))
            ),
        )
        .groupBy("doc_id")
        .agg(
            F.sum("k").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("lp_t") - F.col("lp_r")).cast("bigint").alias(
                "importance_micro"
            ),
        )
    )
    return per_doc
