"""Deterministic sampling operators.

`sample_hash_bernoulli` (harness.corpus) established the engine's
sampling contract: membership is a pure function of row identity —
``h60(key) % denom < threshold`` — never of partition layout or RNG
state, so a 100 TB re-shard, a retry, or a different engine reproduces
the exact same sample. This module extends that contract to per-stratum
rates.

Design: the (stratum -> threshold) table is a tiny DataFrame joined with
``broadcast()`` — rates stay DATA (auditable, loggable, joinable against
a config table) instead of being baked into a when-cascade expression,
and the inner join doubles as an allowlist (strata without a configured
rate are dropped, matching the corpus-mixing semantics of
operators/mixing.py). The hash predicate still evaluates map-side during
the scan; the broadcast adds no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.local_frames import literal_frame

from ..functions.hashing import h60_sql

DENOM = 10_000  # rate resolution: 0.01%


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_sql: str,
) -> DataFrame:
    """Per-stratum deterministic hash-Bernoulli sample.

    ``rates`` maps stratum value -> sampling fraction (0..1, resolution
    1/DENOM). ``key_sql`` is a SQL expression for the row-identity string
    the membership hash is computed over. Rows whose stratum has no
    configured rate are DROPPED (allowlist semantics).
    """
    spark = df.sparkSession
    rate_rows = [(s, int(round(r * DENOM))) for s, r in sorted(rates.items())]
    rates_df = literal_frame(
        spark, f"{strata_col} string, _thresh int", rate_rows
    )
    return (
        df.join(F.broadcast(rates_df), strata_col)
        .filter(F.expr(h60_sql(key_sql)) % DENOM < F.col("_thresh"))
        .drop("_thresh")
    )


def score_weighted_sample(
    df: DataFrame,
    score_col: str,
    base_rate: float = 1.0,
    key_sql: str | None = None,
) -> DataFrame:
    """Soft quality filtering: keep each row with probability
    ``base_rate * clamp(score, 0, 1)`` — the continuous counterpart to a
    hard ``score >= t`` gate (a hard gate discards a 0.59 document as
    readily as a 0.05 one; soft sampling keeps quality mass proportional
    to the score, the standard recipe for quality-weighted corpus
    construction). Membership follows the engine's deterministic
    contract: ``h60(key) % DENOM < round(rate * DENOM)`` — a pure
    function of row identity and score, reproducible across engines,
    reshards, and retries. The per-row threshold is computed in the same
    integer domain as ``stratified_sample`` (resolution 1/DENOM) so the
    DuckDB oracle replays it bit-for-bit. Pure map-side: no shuffle, no
    sort, evaluated during the scan."""
    key = key_sql if key_sql is not None else "CAST(doc_id AS STRING)"
    rate = F.least(F.lit(1.0), F.greatest(F.lit(0.0), F.col(score_col))) * float(
        base_rate
    )
    thresh = F.round(rate * DENOM).cast("bigint")
    return df.filter(F.expr(h60_sql(key)) % DENOM < thresh)


def assign_splits(
    df: DataFrame,
    key_sql: str,
    fractions: dict[str, float],
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test partitioning: EVERY row lands in
    exactly one split, chosen by where ``h60(salt || '#' || key) % DENOM``
    falls among the cumulative fraction thresholds (insertion order of
    ``fractions``; they must sum to 1 within 1/DENOM).

    This is the complement of the sampling family above — a partition of
    the corpus, not a subset — and shares its reproducibility contract:
    membership is a pure function of row identity, so the same document
    lands in the same split on every engine, every reshard, every retry,
    and (critically for decontamination) a doc can never migrate from
    test into train when the corpus is re-processed. ``salt`` decorrelates
    this assignment from every other hash-keyed decision (sampling,
    sharding) made on the same key. Pure map-side: the CASE evaluates
    during the scan — no shuffle, no sort, no join.

    At 100 TB this replaces the common anti-pattern of
    ``df.randomSplit`` — whose membership depends on partition layout and
    seed plumbing — with a column expression any engine can replay."""
    total = sum(fractions.values())
    if abs(total - 1.0) > 1.0 / DENOM:
        raise ValueError(f"fractions must sum to 1, got {total}")
    bucket = F.expr(h60_sql(f"'{salt}' || '#' || ({key_sql})")) % DENOM
    expr = None
    cum = 0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        cum += int(round(frac * DENOM))
        cond = bucket < cum
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)
