"""Skew-mitigation utilities: salted joins.

AQE's skew-join handling (on in session.py) splits oversized SHUFFLE
partitions, which covers sort-merge joins it can observe. Salting is the
explicit, planner-independent version — needed when AQE can't help:
aggregation-feeding joins it won't split, broadcast-ineligible dims with
one pathological key, or deliberate pre-partitioning you want stable
across runs.

Mechanics: every row of the large side gets a salt in [0, n_salt); the
small side is replicated n_salt times (one copy per salt value); the
join key becomes (key, salt), so a key that previously landed on one
reducer now spreads over n_salt of them. Cost: the small side's shuffle
volume × n_salt — which is why the LARGE side must be the salted one and
the replicated side must be the small one.

The salt must distribute rows WITHIN a key — a salt derived from the key
alone would move the hot key around but never split it. It need not be
deterministic for correctness (it never reaches the output), but this
engine prefers reproducible plans, so the default salt hashes the large
side's ROW CONTENT (every column) — stable across recomputation,
retries, and partition-layout changes, unlike rand() or a
monotonically_increasing_id()-derived index. Fully duplicate hot-key
rows share a salt; that only matters in the degenerate corpus where the
hot key's rows are all byte-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``large ⋈ small`` on column ``on`` with the hot-key
    shuffle spread over ``n_salt`` reducers per key.

    ``how`` supports 'inner' and 'left' (left preserves unmatched large
    rows; the small side is replicated so no matches are lost). Output
    columns = large's columns + small's non-key columns, like a plain
    ``large.join(small, on, how)``.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_l = large.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in large.columns]), F.lit(n_salt)
        ).cast("int"),
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))).alias("_salt")
    salted_s = small.select("*", salts)
    out = salted_l.join(salted_s, [on, "_salt"], how)
    return out.drop("_salt")
