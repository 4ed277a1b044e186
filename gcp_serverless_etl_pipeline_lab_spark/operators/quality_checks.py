"""Declarative data-quality constraints over any table.

The reference hard-codes three post-load checks (non-empty, unique id,
total invariant — `/root/reference/composer/sales_etl_dag.py:60-76`,
re-expressed in plans/quality.py). This module generalizes them into a
constraint LIST evaluated in bulk — the Great-Expectations-lite surface
a warehouse needs: not-null, uniqueness, range/predicate, value domain,
and cross-table referential integrity.

Plan shape: all single-table constraints against one table share ONE
aggregation pass (a row of conditional sums), then unpivot to one row
per constraint; referential checks add one anti-join each (at 100 TB:
the anti-join shuffles child keys only — project the fk before joining;
a broadcast of the parent works when the parent's key set fits).
All counts are exact; emit-and-alert policy is the caller's concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def constraint_report(
    df: DataFrame,
    not_null: list[str] = (),
    unique: list[str] = (),
    predicates: dict[str, str] = None,
    domains: dict[str, list] = None,
    referential: dict[str, tuple[DataFrame, str, str]] = None,
    table: str = "table",
) -> DataFrame:
    """One row per constraint: (constraint_name, checked, violations).

    ``predicates`` maps name -> SQL boolean expr that every row MUST
    satisfy; ``domains`` maps column -> allowed values; ``referential``
    maps name -> (parent_df, fk_col, parent_key_col).
    """
    aggs = []
    names = []
    for c in not_null:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long"))
        names.append(f"{table}.{c}_not_null")
    for c in unique:
        aggs.append((F.count(F.lit(1)) - F.count_distinct(F.col(c))).cast("long"))
        names.append(f"{table}.{c}_unique")
    # A row violates a predicate/domain constraint unless the check is
    # strictly TRUE — so a NULL amount FAILS 'amount > 0' rather than
    # slipping through the three-valued-logic hole where ~NULL is NULL
    # and contributes 0 to the violation count.
    for name, pred in (predicates or {}).items():
        aggs.append(F.sum(F.when(F.expr(pred), 0).otherwise(1)).cast("long"))
        names.append(f"{table}.{name}")
    for c, allowed in (domains or {}).items():
        aggs.append(
            F.sum(F.when(F.col(c).isin(list(allowed)), 0).otherwise(1)).cast("long")
        )
        names.append(f"{table}.{c}_domain")

    checked = F.count(F.lit(1)).cast("long").alias("checked")
    out = None
    if names:
        row = df.agg(checked, *[a.alias(f"v{i}") for i, a in enumerate(aggs)])
        stack_args = ", ".join(f"'{n}', v{i}" for i, n in enumerate(names))
        out = row.select(
            F.expr(
                f"stack({len(names)}, {stack_args}) AS (constraint_name, violations)"
            ),
            "checked",
        ).select("constraint_name", "checked", "violations")

    for name, (parent, fk, pk) in (referential or {}).items():
        orphans = (
            df.select(F.col(fk))
            .join(parent.select(F.col(pk).alias(fk)), fk, "left_anti")
        )
        ref_row = df.agg(checked).crossJoin(
            orphans.agg(F.count(F.lit(1)).cast("long").alias("violations"))
        ).select(
            F.lit(f"{table}.{name}").alias("constraint_name"),
            "checked",
            "violations",
        )
        out = ref_row if out is None else out.unionAll(ref_row)
    if out is None:
        raise ValueError("constraint_report called with no constraints")
    return out.orderBy("constraint_name")
