"""Weighted corpus mixing: downsample each source to a target mixture
weight — the curation step that sets how much of each data source a
training run sees (web vs code vs books ratios and the like).

Sampling is the engine's deterministic hash-Bernoulli (the
``sample_hash_bernoulli`` primitive applied per source): keep a row iff
h60(key) % M < rate·M. Properties that matter at 100 TB:

- reproducible across runs, partitionings, and engines (the DuckDB oracle
  recomputes membership bit-for-bit) — a re-run of the mixture on
  resharded data keeps EXACTLY the same documents;
- map-side only — no shuffle, no per-partition RNG state, composes with
  any downstream operator;
- per-source rates are a broadcast-free literal CASE over the source
  column.

Rows whose source has no configured weight are DROPPED (weight 0) — a
mixture is an allowlist, and silently passing unknown sources through is
how a contaminated source sneaks into a training run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60_sql

MIX_MOD = 1_000_000


def mix_corpus(
    docs: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Keep each row with its source's probability; deterministic in the
    row key. Weights outside [0, 1] are rejected."""
    for src, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for {src!r} must be in [0, 1], got {w}")
    # integer thresholds computed ONCE driver-side: a float rate*M cast
    # inside the engine would truncate where another engine rounds
    # (0.3 * 1e6 = 299999.99999999994), silently shifting membership by
    # one bucket between engine and oracle.
    threshold = F.lit(0)
    for src, w in weights.items():
        threshold = F.when(
            F.col(source_col) == src, F.lit(int(round(w * MIX_MOD)))
        ).otherwise(threshold)
    bucket = F.expr(f"{h60_sql(f'CAST({key_col} AS STRING)')} % {MIX_MOD}")
    return docs.filter(bucket < threshold)


def temperature_mixture_rates(
    counts: dict[str, int], temperature: float = 0.5
) -> dict[str, float]:
    """Per-source keep-rates that reshape the corpus toward the
    temperature mixture ``p_i ∝ n_i^T`` (the multilingual resampling
    recipe of mT5 / XLM-R: T=1 keeps natural proportions, T→0 flattens
    toward uniform) by DOWNSAMPLING only: rate_i = (n_min/n_i)^(1-T),
    so the smallest source keeps everything and larger sources shed
    their excess. Expected kept counts are then ∝ n_i^T exactly.

    Rates are pre-rounded to the same 1e-6 grid ``mix_corpus``
    thresholds on, with half-up rounding — at T=0.5 the whole chain is
    division + sqrt + floor, all IEEE-correctly-rounded operations, so
    an independent engine recomputing from the same counts lands on
    bit-identical thresholds (the property the a0f oracle checks).
    Other temperatures use ``pow``, which can differ by an ulp across
    libm implementations — fine for training mixtures, not for
    bit-exact cross-engine verification."""
    import math

    if not 0.0 < temperature <= 1.0:
        raise ValueError(f"temperature must be in (0, 1], got {temperature}")
    if not counts:
        return {}
    if min(counts.values()) <= 0:
        raise ValueError("every source count must be positive")
    n_min = min(counts.values())
    out = {}
    for src, n in counts.items():
        if temperature == 0.5:
            rate = math.sqrt(n_min / n)
        else:
            rate = (n_min / n) ** (1.0 - temperature)
        out[src] = math.floor(rate * MIX_MOD + 0.5) / MIX_MOD
    return out


def mix_corpus_temperature(
    docs: DataFrame,
    temperature: float = 0.5,
    source_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Temperature-resample ``docs``: one per-source count aggregate
    (bounded driver gate — one row per source), rates from
    ``temperature_mixture_rates``, membership via the deterministic
    hash-Bernoulli of ``mix_corpus`` — reshard/retry-stable, map-side,
    engine-reproducible."""
    counts = {
        r[source_col]: r["n"]
        for r in docs.groupBy(source_col).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    return mix_corpus(
        docs,
        temperature_mixture_rates(counts, temperature),
        source_col,
        key_col,
    )
