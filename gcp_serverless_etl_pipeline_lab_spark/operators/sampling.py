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
    rates_df = spark.createDataFrame(
        rate_rows, f"{strata_col} string, _thresh int"
    )
    return (
        df.join(F.broadcast(rates_df), strata_col)
        .filter(F.expr(h60_sql(key_sql)) % DENOM < F.col("_thresh"))
        .drop("_thresh")
    )
