"""Fuzzy string join — cross-table trigram-Jaccard similarity join with
prefix filtering (the PPJoin family's core idea).

Entity resolution's workhorse: match probe strings against a reference
table on character-trigram Jaccard >= tau WITHOUT the all-pairs product.
The dedup family (operators/dedup.py) handles self-similarity within one
corpus; this operator is the two-table join variant ("fuzzy lookup").

Prefix filtering, exactly: order every string's distinct trigrams by
global rarity (document frequency ascending, trigram as tiebreak — one
total order shared by both sides). If |J(A,B)| >= tau then
|A ∩ B| >= ceil(tau/(1+tau) * (|A|+|B|)) — so A and B MUST share at
least one trigram among each side's first L = n - ceil(tau*n) + 1
rarest trigrams. Blocking on prefixes alone is therefore LOSSLESS for
the threshold: candidates are pairs whose prefixes intersect; exact
Jaccard verification then filters false positives. Common trigrams
('th ', 'ing') sort LAST, so they rarely enter prefixes — the hot-block
problem of naive trigram blocking disappears by construction rather
than by a cap.

Scale design: the trigram-df table is vocabulary-bounded (≤ alphabet³ —
tiny), broadcast to rank prefixes. Candidate generation shuffles only
prefix rows (~(1-tau)·n per string); verification cost is
Σ_{candidates} |A| via an equi-join on (target, trigram), never a
cross product. Every step is built-in DataFrame ops; determinism from
the total (df, trigram) order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _qgram_rows(
    df: DataFrame, id_col: str, s_col: str, out_id: str, q: int
) -> DataFrame:
    """One row per (string id, DISTINCT q-gram); strings shorter than q
    chars drop out (no grams, can never clear a positive threshold).

    q is a tuning knob for the CORPUS, not the semantics: a small or
    repetitive alphabet (think generated text, product codes) makes every
    trigram common and blocking useless — measured on the sf0.1 synthetic
    corpus, the whole 30-char-prefix vocabulary is 375 trigrams (median
    df 116/5000 docs) but 1964 5-grams (median df 28), which cuts
    candidate pairs ~7x. Pick the smallest q whose grams are rare."""
    s = F.lower(F.col(s_col))
    grams = F.array_distinct(
        F.expr(
            f"transform(sequence(1, length(lower({s_col})) - {q - 1}),"
            f" i -> substring(lower({s_col}), i, {q}))"
        )
    )
    return (
        df.filter(F.length(s) >= q)
        .select(F.col(id_col).alias(out_id), F.explode(grams).alias("tg"))
    )


def _fuzzy_core(
    probes: DataFrame,
    targets: DataFrame,
    threshold: float,
    q: int,
) -> DataFrame:
    """The similarity join over (pid, _s) / (tid, _s) tables of DISTINCT
    strings. Candidate generation applies BOTH lossless PPJoin filters:

    - prefix filter: candidates must share a gram among each side's
      L = n - ceil(tau*n) + 1 rarest grams;
    - positional filter: for a shared prefix gram at ranks (i, j), total
      overlap is bounded by 1 + min(n_p - i, n_t - j) (one match so far
      plus everything after the matched positions). A pair survives only
      if its BEST shared prefix gram's bound reaches the threshold's
      minimum overlap ceil(tau/(1+tau)·(n_p+n_t)) — the earliest shared
      gram maximizes the bound, so max-over-shared-grams equals the
      classic first-match bound and pruning stays lossless. The epsilon
      inside the ceil guards float round-up over-pruning.

    The per-pair groupBy that evaluates the positional bound replaces the
    previous .distinct() — same shuffle, strictly fewer surviving pairs.

    Plan shape (one aggregation per side): each side's gram rows join the
    broadcast target-df table once and collapse into a SINGLE per-id
    sorted gram array ``_g`` (ascending (df, tg) — the shared rarity
    order). Set size, prefix rows (a slice-explode of ``_g``), and the
    verification gram array all derive from ``_g``, replacing the earlier
    window + per-side size aggregate + size join (measured 1.8x faster at
    the 10x stress scale, same output).
    """
    # global rarity order from the TARGET side (reference corpus);
    # grams unseen there get df=0 (rarest — they block nothing anyway,
    # since an unseen gram has no target partner).
    tg_t = _qgram_rows(targets, "tid", "_s", "tid", q)
    df_t = tg_t.groupBy("tg").agg(F.count(F.lit(1)).cast("bigint").alias("df"))

    def per_id(src: DataFrame, id_name: str) -> DataFrame:
        tg = _qgram_rows(src, id_name, "_s", id_name, q)
        return (
            tg.join(F.broadcast(df_t), "tg", "left")
            .fillna({"df": 0})
            .groupBy(id_name)
            .agg(F.sort_array(F.collect_list(F.struct("df", "tg"))).alias("_g"))
        )

    def prefix(per: DataFrame, id_name: str, n_name: str, rn_name: str) -> DataFrame:
        n = F.size("_g").cast("bigint")
        # L = n - ceil(tau*n) + 1
        L = (n - F.ceil(n * F.lit(threshold)) + 1).cast("int")
        return per.select(
            id_name,
            n.alias(n_name),
            F.posexplode(F.slice(F.expr("transform(_g, x -> x.tg)"), 1, L))
            .alias("_pos", "tg"),
        ).select(id_name, n_name, "tg", (F.col("_pos") + 1).alias(rn_name))

    P = per_id(probes, "pid")
    T = per_id(targets, "tid")

    ub = F.lit(1) + F.least(
        F.col("n_p") - F.col("_rn_p"), F.col("n_t") - F.col("_rn_t")
    )
    min_overlap = F.ceil(
        (F.col("n_p") + F.col("n_t")) * F.lit(threshold / (1.0 + threshold))
        - F.lit(1e-9)
    )
    cand = (
        prefix(P, "pid", "n_p", "_rn_p")
        .join(prefix(T, "tid", "n_t", "_rn_t"), "tg")
        .groupBy("pid", "tid", "n_p", "n_t")
        .agg(F.max(ub).alias("_ub"))
        .filter(F.col("_ub") >= min_overlap)
        # length filter: J(A,B) >= tau forces |B| in [tau|A|, |A|/tau];
        # prunes most false candidates before any per-pair work
        .filter(
            (F.col("n_t") >= F.ceil(F.col("n_p") * F.lit(threshold)))
            & (F.col("n_p") >= F.ceil(F.col("n_t") * F.lit(threshold)))
        )
        .select("pid", "tid", "n_p", "n_t")
    )

    # exact verification, ARRAY-LOCAL: ship each side's gram array once
    # per candidate pair and intersect in-task — two hash joins sized by
    # the candidate count, instead of a candidates×|A| exploded shuffle
    # join (measured 4x faster at sf0.1). array_intersect is order-
    # insensitive, so `_g` serves as-is.
    arr_p = P.select("pid", F.expr("transform(_g, x -> x.tg)").alias("g_p"))
    arr_t = T.select("tid", F.expr("transform(_g, x -> x.tg)").alias("g_t"))
    return (
        cand.join(arr_p, "pid")
        .join(arr_t, "tid")
        .withColumn(
            "n_inter",
            F.size(F.array_intersect("g_p", "g_t")).cast("bigint"),
        )
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("n_p") + F.col("n_t") - F.col("n_inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("pid", "tid", "n_p", "n_t", "n_inter", "jaccard")
    )


def fuzzy_string_join(
    probes: DataFrame,
    targets: DataFrame,
    probe_id: str,
    probe_col: str,
    target_id: str,
    target_col: str,
    threshold: float = 0.6,
    q: int = 3,
) -> DataFrame:
    """All (probe, target) pairs with q-gram Jaccard >= threshold
    (rounded to 4 decimals before comparing — the engine-wide oracle
    convention). Output: pid, tid, n_p, n_t, n_inter, jaccard.

    Identical (case-normalized) strings are collapsed before the join —
    every per-pair quantity depends only on the string value, so the
    expensive core runs once per DISTINCT string and the results fan
    back out to ids with two slim joins. On entity corpora (names,
    titles) duplication is the norm; on all-unique inputs the collapse
    costs two short-string groupBys."""
    p_ids = probes.select(
        F.col(probe_id).alias("_opid"), F.lower(F.col(probe_col)).alias("_s")
    )
    t_ids = targets.select(
        F.col(target_id).alias("_otid"), F.lower(F.col(target_col)).alias("_s")
    )
    p_rep = p_ids.groupBy("_s").agg(F.min("_opid").alias("pid"))
    t_rep = t_ids.groupBy("_s").agg(F.min("_otid").alias("tid"))
    core = _fuzzy_core(p_rep, t_rep, threshold, q)
    p_exp = p_ids.join(p_rep, "_s").select(
        F.col("pid").alias("_rep_p"), F.col("_opid")
    )
    t_exp = t_ids.join(t_rep, "_s").select(
        F.col("tid").alias("_rep_t"), F.col("_otid")
    )
    return (
        core.withColumnRenamed("pid", "_rep_p")
        .withColumnRenamed("tid", "_rep_t")
        .join(p_exp, "_rep_p")
        .join(t_exp, "_rep_t")
        .select(
            F.col("_opid").alias("pid"),
            F.col("_otid").alias("tid"),
            "n_p",
            "n_t",
            "n_inter",
            "jaccard",
        )
    )


def fuzzy_best_match(
    probes: DataFrame,
    targets: DataFrame,
    probe_id: str,
    probe_col: str,
    target_id: str,
    target_col: str,
    threshold: float = 0.6,
    q: int = 3,
) -> DataFrame:
    """Best match per probe: highest Jaccard, lowest target id on ties."""
    pairs = fuzzy_string_join(
        probes, targets, probe_id, probe_col, target_id, target_col, threshold, q
    )
    w = Window.partitionBy("pid").orderBy(F.desc("jaccard"), F.asc("tid"))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
