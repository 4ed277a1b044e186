"""SCD2 (slowly-changing-dimension type 2) history builder.

The reference warehouse is truncate-and-reload only
(`/root/reference/dataflow/dataflow_transform.py:157` WRITE_TRUNCATE) —
history is kept outside the table via GCS object versioning
(`terraform/main.tf:36-54`). This module supplies the in-table
alternative every real warehouse eventually needs: collapse a change
log into validity intervals per key, one row per distinct consecutive
state, with `valid_from` / `valid_to` / `is_current` / `version_n`.

Scale design: one shuffle, partitioned by the dimension key. Both
windows (`lag` for change detection, `lead` for interval close) share
the identical (partitionBy key, orderBy ts, tiebreak) spec, so Catalyst
plans a single Exchange + Sort and evaluates both functions in one
Window operator. Per-key row counts are change-log sized (bounded by
the key's update frequency, not corpus size), so no key can melt a
reducer the way a global `row_number` would.

Determinism: ties on the event timestamp are broken by `tiebreak_col`
(an id column), so the compressed history is stable across partition
layouts and retries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_history(
    changes: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Collapse a change log into SCD2 validity intervals.

    Consecutive rows with an unchanged ``state_col`` merge into one
    interval (the classic "only record real changes" rule). The final
    interval per key has ``valid_to`` NULL and ``is_current`` true.
    """
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    w = Window.partitionBy(key_col).orderBy(*order)
    # `_seen` (lag of a constant) is NULL exactly on each key's first row —
    # `lag(state) IS NULL` can't distinguish "no previous row" from "previous
    # state was NULL", which would split a run of NULL states into one
    # version per row.
    changed = (
        changes.withColumn("_prev", F.lag(state_col).over(w))
        .withColumn("_seen", F.lag(F.lit(1)).over(w))
        .filter(
            F.col("_seen").isNull()
            | ~F.col(state_col).eqNullSafe(F.col("_prev"))
        )
    )
    # Second window over the compressed rows: same partitioning/order, so
    # the compressed frame re-sorts locally without a fresh shuffle key.
    w2 = Window.partitionBy(key_col).orderBy(*order)
    return (
        changed.select(
            F.col(key_col),
            F.col(state_col).alias("state"),
            F.col(ts_col).alias("valid_from"),
            F.lead(ts_col).over(w2).alias("valid_to"),
            F.row_number().over(w2).alias("version_n"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )
