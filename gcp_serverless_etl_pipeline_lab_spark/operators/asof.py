"""As-of (backward) join — match each left row with the most recent right
row at or before its timestamp, per key.

Spark has no native ASOF JOIN; the naive spelling (equi-join on key +
`right.t <= left.t` range predicate + keep-latest window) materializes the
full per-key cross product before filtering. This operator uses the
scalable union-and-carry pattern instead:

    union both sides → one hash shuffle on key → per-key sort by (time,
    side) → `last(value, ignorenulls)` running window carries the latest
    right-side values forward → keep left rows.

Cost is one shuffle + sort of |L| + |R| rows — the same as a sort-merge
join — independent of temporal fan-out, which is what you want at 100 TB
(AQE handles skewed keys). Ties (right.t == left.t) match, i.e. the
comparison is `right.t <= left.t`.

Caller contract: at most one right row per (key, time) — pre-aggregate
otherwise (duplicates would carry an arbitrary winner). Right value columns
MAY be null: the carried payload is one struct per right row, so the output
tuple always comes from a single right row (never a column-wise mix of two
rows), and the inner-match test is "a right row existed", independent of
its values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    how: str = "inner",
) -> DataFrame:
    """Returns all `left` columns plus `right_values` from the as-of match.
    ``how='inner'`` drops unmatched left rows; ``'left'`` keeps them with
    nulls."""
    lcols = left.columns
    # Carry ALL right values as ONE struct so last(ignorenulls) picks the
    # whole tuple from a single right row — carrying columns independently
    # would let a null value column fall through to an older right row.
    r_struct_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in right_values]
    )
    l2 = left.select(
        F.col(left_key).alias("_k"),
        F.col(left_time).cast("timestamp").alias("_t"),
        F.lit(1).alias("_src"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(r_struct_type).alias("_r"),
    )
    r2 = right.select(
        F.col(right_key).alias("_k"),
        F.col(right_time).cast("timestamp").alias("_t"),
        F.lit(0).alias("_src"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        F.struct(*[F.col(c) for c in right_values]).alias("_r"),
    )
    u = l2.unionByName(r2)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_src")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = u.select(
        "_src",
        *lcols,
        F.last("_r", ignorenulls=True).over(w).alias("_r"),
    ).filter(F.col("_src") == 1)
    if how == "inner":
        carried = carried.filter(F.col("_r").isNotNull())
    return carried.select(
        *lcols, *[F.col(f"_r.{c}").alias(c) for c in right_values]
    )
