"""Count-min-sketch frequency estimation and heavy-hitter reporting.

A CMS summarizes a 100 TB key stream in ``depth × width`` counters —
fixed memory regardless of key cardinality. The sketch build is a
single aggregation whose OUTPUT is bounded by d·w (4096 cells here),
so map-side partial aggregation collapses each input partition to at
most d·w rows before the shuffle: the exchange carries
O(partitions · d · w), never O(rows). That is the whole point vs an
exact per-key count, whose shuffle is distinct-key sized.

Hashing uses the cross-dialect 60-bit MD5 primitive
(functions/hashing.py) with the row index as a salt, so the DuckDB
oracle reproduces every counter exactly — the sketch is deterministic,
not sampled. CMS guarantees estimate >= true count (overcounts only),
which the harness query surfaces as an ``overcount`` column.

At production scale you would swap h60 for xxhash64 (same structure,
one line) and feed candidates from a sample or a prior round instead
of a distinct scan; the estimate join below is unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60


def _bucket(key_col: Column, row: int, width: int) -> Column:
    return F.pmod(h60(F.concat(F.lit(f"{row}:"), key_col)), F.lit(width))


def cms_sketch(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Build the sketch: one row per non-empty (hash_row, bucket) cell.

    Each input row contributes ``depth`` cells via an inline array
    explode (no join, no per-row Python); the groupBy's partial
    aggregate bounds the shuffle at d·w rows per input partition.
    """
    k = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(
                F.lit(r).alias("hrow"), _bucket(k, r, width).alias("bucket")
            )
            for r in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.hrow").alias("hrow"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def cms_estimates(
    candidates: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-query the sketch for each candidate key: est = min over
    hash rows of the addressed counter. The sketch is d·w rows — always
    broadcast; the candidate side never shuffles.

    The probe LEFT-joins the sketch and treats an absent cell as count 0:
    the sketch only stores non-empty cells, so a candidate key that never
    appeared in the stream addresses empty cells and must estimate as the
    CMS-correct 0 — an inner join would instead drop the key entirely (all
    cells empty) or return a collision-inflated min (some cells shared
    with real keys)."""
    k = F.col(key_col).cast("string")
    probes = candidates.select(
        k.alias("k"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("hrow"),
                        _bucket(k, r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
    ).select("k", F.col("c.hrow").alias("hrow"), F.col("c.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["hrow", "bucket"], "left")
        .select("k", F.coalesce(F.col("cnt"), F.lit(0)).alias("cnt"))
        .groupBy("k")
        .agg(F.min("cnt").cast("bigint").alias("est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    top_n: int = 20,
) -> DataFrame:
    """Top-``top_n`` keys by CMS estimate, with the exact count and the
    sketch's overcount for calibration. Candidates here are the distinct
    keys of the same corpus (exact side doubles as the verifier); at
    100 TB candidates come from a sample and the exact join is dropped.
    """
    exact = (
        df.select(F.col(key_col).cast("string").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact"))
    )
    sketch = cms_sketch(df, key_col, depth, width)
    est = cms_estimates(exact.select("k"), sketch, "k", depth, width)
    return (
        est.join(exact, "k")
        .select("k", "est", "exact", (F.col("est") - F.col("exact")).alias("overcount"))
        .orderBy(F.desc("est"), F.asc("k"))
        .limit(top_n)
    )
