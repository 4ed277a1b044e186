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


def _trigram_rows(df: DataFrame, id_col: str, s_col: str, out_id: str) -> DataFrame:
    """One row per (string id, DISTINCT trigram); strings shorter than 3
    chars drop out (no trigrams, can never clear a positive threshold)."""
    s = F.lower(F.col(s_col))
    grams = F.array_distinct(
        F.expr(f"transform(sequence(1, length(lower({s_col})) - 2), i -> substring(lower({s_col}), i, 3))")
    )
    return (
        df.filter(F.length(s) >= 3)
        .select(F.col(id_col).alias(out_id), F.explode(grams).alias("tg"))
    )


def fuzzy_string_join(
    probes: DataFrame,
    targets: DataFrame,
    probe_id: str,
    probe_col: str,
    target_id: str,
    target_col: str,
    threshold: float = 0.6,
) -> DataFrame:
    """All (probe, target) pairs with trigram Jaccard >= threshold
    (rounded to 4 decimals before comparing — the engine-wide oracle
    convention). Output: pid, tid, n_p, n_t, n_inter, jaccard."""
    tg_p = _trigram_rows(probes, probe_id, probe_col, "pid")
    tg_t = _trigram_rows(targets, target_id, target_col, "tid")
    sz_p = tg_p.groupBy("pid").agg(F.count(F.lit(1)).cast("bigint").alias("n_p"))
    sz_t = tg_t.groupBy("tid").agg(F.count(F.lit(1)).cast("bigint").alias("n_t"))

    # global rarity order from the TARGET side (reference corpus);
    # trigrams unseen there get df=0 (rarest — they block nothing anyway,
    # since an unseen trigram has no target partner).
    df_t = tg_t.groupBy("tg").agg(F.count(F.lit(1)).cast("bigint").alias("df"))

    def prefix(tg: DataFrame, id_name: str, sz: DataFrame, n_name: str) -> DataFrame:
        ranked = (
            tg.join(F.broadcast(df_t), "tg", "left")
            .fillna({"df": 0})
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.partitionBy(id_name).orderBy("df", "tg")
                ),
            )
            .join(sz, id_name)
        )
        # L = n - ceil(tau*n) + 1
        L = F.col(n_name) - F.ceil(F.col(n_name) * F.lit(threshold)) + 1
        return ranked.filter(F.col("_rn") <= L).select(id_name, "tg")

    cand = (
        prefix(tg_p, "pid", sz_p, "n_p")
        .join(prefix(tg_t, "tid", sz_t, "n_t"), "tg")
        .select("pid", "tid")
        .distinct()
    )

    # exact verification: Σ|A| work, restricted to candidates
    inter = (
        cand.join(tg_p, "pid")
        .join(tg_t, ["tid", "tg"])
        .groupBy("pid", "tid")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_inter"))
    )
    return (
        inter.join(sz_p, "pid")
        .join(sz_t, "tid")
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


def fuzzy_best_match(
    probes: DataFrame,
    targets: DataFrame,
    probe_id: str,
    probe_col: str,
    target_id: str,
    target_col: str,
    threshold: float = 0.6,
) -> DataFrame:
    """Best match per probe: highest Jaccard, lowest target id on ties."""
    pairs = fuzzy_string_join(
        probes, targets, probe_id, probe_col, target_id, target_col, threshold
    )
    w = Window.partitionBy("pid").orderBy(F.desc("jaccard"), F.asc("tid"))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
