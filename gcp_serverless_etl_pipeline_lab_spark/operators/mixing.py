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
