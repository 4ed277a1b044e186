"""A1–A3 / Q1 — the data-quality validation aggregate and gate.

Reference SQL (`composer/sales_etl_dag.py:74-84`):

    SELECT COUNT(*) total_rows,
           COUNT(DISTINCT id) unique_ids,
           SUM(CASE WHEN total_sale = price * quantity THEN 1 ELSE 0 END)
               correct_totals
    FROM sales_data
    HAVING total_rows > 0 AND unique_ids = total_rows
       AND correct_totals = total_rows

Zero returned rows ⇒ the check fails (BigQueryCheckOperator semantics).
Catalyst plans HAVING-without-GROUP-BY as Filter-over-Aggregate natively;
the aggregate itself is partial+final hash agg, and the DISTINCT goes
through the built-in expand rewrite — nothing custom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class DataQualityError(RuntimeError):
    """Raised by the gate when the validation aggregate returns no rows."""


def validation_aggregate(clean: DataFrame) -> DataFrame:
    """A1+A3: global multi-measure aggregate with the row-level invariant."""
    return clean.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.countDistinct("id").alias("unique_ids"),
        F.sum(
            F.when(F.col("total_sale") == F.col("price") * F.col("quantity"), 1).otherwise(0)
        ).alias("correct_totals"),
    )


def gated_validation(clean: DataFrame) -> DataFrame:
    """A2: the HAVING filter over the global aggregate."""
    agg = validation_aggregate(clean)
    return agg.filter(
        (F.col("total_rows") > 0)
        & (F.col("unique_ids") == F.col("total_rows"))
        & (F.col("correct_totals") == F.col("total_rows"))
    )


def quality_gate(clean: DataFrame) -> None:
    """Q1: raise unless the gated aggregate returns a row
    (`composer/sales_etl_dag.py:72-86`)."""
    if gated_validation(clean).count() == 0:
        raise DataQualityError(
            "data quality gate failed: table empty, ids not unique, "
            "or total_sale != price * quantity"
        )
