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
            # the tiebreak of the change row that OPENED the interval —
            # lets scd2_apply_append reconstruct an order-consistent
            # change row from an interval without the raw log
            F.col(tiebreak_col).alias("opened_by"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
    )


def scd2_apply_append(
    history: DataFrame,
    changes: DataFrame,
    key_col: str,
    state_col: str,
    ts_col: str,
    tiebreak_col: str,
    validate_contract: bool = False,
) -> DataFrame:
    """Incrementally apply an APPEND-ONLY change batch to an existing
    SCD2 history — the daily-CDC shape. Only the affected keys are
    recomputed; untouched keys pass through with zero work beyond an
    anti-join.

    Precondition (the append-only contract): every delta row's
    ``(ts, tiebreak)`` sorts STRICTLY AFTER its key's current
    ``(valid_from, opened_by)`` — strict ``ts > valid_from`` is the
    simple sufficient form. "At or after" is NOT enough: a delta row
    with ts equal to the open interval's valid_from but a tiebreak
    sorting before ``opened_by`` would re-compress in an order the
    original raw log never had (compression already discarded the
    duplicate rows at that timestamp that decide how the run splits)
    and silently diverge from a full rebuild. Under the strict contract
    this is EQUIVALENT to rebuilding from the full raw log — each
    affected key's open interval is reconstructed as a change row
    (state, valid_from, opened_by) and re-compressed together with the
    delta, so a delta row extending the current state merges into the
    open interval and a new state closes it; closed intervals are never
    touched. A late delta landing at-or-before the current interval
    needs raw-log reprocessing, which is exactly why real CDC pipelines
    reprocess the affected window instead of patching in place.

    ``validate_contract=True`` pays one extra aggregate over the
    (small, delta-keyed) open intervals and raises ``ValueError`` if
    any delta row violates the strict ordering — route such rows to a
    raw-log reprocess path instead.

    Scale: delta-keyed semi/anti joins (delta key sets are small and
    broadcastable by AQE); the recompute windows touch only
    (open intervals of affected keys + delta) rows."""
    delta_keys = changes.select(key_col).distinct()
    if validate_contract:
        current = history.filter(F.col("is_current")).select(
            key_col,
            F.col("valid_from").alias("_vf"),
            F.col("opened_by").alias("_ob"),
        )
        bad = (
            changes.join(current, key_col)
            .filter(
                (F.col(ts_col) < F.col("_vf"))
                | (
                    (F.col(ts_col) == F.col("_vf"))
                    & (F.col(tiebreak_col) <= F.col("_ob"))
                )
            )
            .limit(1)
            .count()
        )
        if bad:
            raise ValueError(
                "scd2_apply_append contract violation: a delta row's "
                f"({ts_col}, {tiebreak_col}) does not sort strictly after "
                "its key's current (valid_from, opened_by); reprocess the "
                "affected window from the raw log instead"
            )
    untouched = history.join(delta_keys, key_col, "left_anti")
    affected = history.join(delta_keys, key_col, "left_semi")
    closed = affected.filter(~F.col("is_current"))

    open_as_changes = affected.filter(F.col("is_current")).select(
        F.col(key_col),
        F.col("state").alias(state_col),
        F.col("valid_from").alias(ts_col),
        F.col("opened_by").alias(tiebreak_col),
    )
    delta_rows = changes.select(key_col, state_col, ts_col, tiebreak_col)
    recomputed = scd2_history(
        open_as_changes.unionByName(delta_rows),
        key_col,
        state_col,
        ts_col,
        tiebreak_col,
    )
    # re-base version numbers on top of the untouched closed prefix
    n_closed = closed.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("int").alias("_n_closed")
    )
    rebased = (
        recomputed.join(n_closed, key_col, "left")
        .fillna({"_n_closed": 0})
        .withColumn("version_n", F.col("version_n") + F.col("_n_closed"))
        .drop("_n_closed")
    )
    return untouched.unionByName(closed).unionByName(rebased)
