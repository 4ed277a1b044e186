"""R10–R12 — derived column + single-pass clean/error fan-out.

The reference emits clean rows on the main output and error records on a
tagged side output in one pass (`dataflow/dataflow_transform.py:148`).
Spark batch has no native multi-sink-one-pass, so the idiomatic pattern is:
annotate once, persist the narrow intermediate, filter twice (SURVEY.md §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark import StorageLevel

from .validate import ERROR_COL
from ..sources.text_csv import LINE_COL, LINE_ID_COL

CLEAN_COLUMNS = ("id", "product", "price", "quantity", "sale_date", "total_sale")


def finalize_clean(annotated: DataFrame) -> DataFrame:
    """Project the clean 6-column schema, deriving ``total_sale`` (R10) and
    keeping ``sale_date`` as DateType (the sink schema declares DATE;
    `terraform/main.tf:95-99`)."""
    return (
        annotated.filter(F.col(ERROR_COL).isNull())
        .select(
            F.col("_id_raw").alias("id"),
            F.col("_product_clean").alias("product"),
            F.col("_price").alias("price"),
            F.col("_quantity").alias("quantity"),
            F.col("_sale_date").alias("sale_date"),
            (F.col("_price") * F.col("_quantity")).alias("total_sale"),
            F.col(LINE_ID_COL),
        )
        .sortWithinPartitions(LINE_ID_COL)
        .drop(LINE_ID_COL)
    )


def finalize_errors(annotated: DataFrame) -> DataFrame:
    """Error-record shape {error, row} (`dataflow_transform.py:55`)."""
    return annotated.filter(F.col(ERROR_COL).isNotNull()).select(
        F.col(ERROR_COL).alias("error"), F.col(LINE_COL).alias("row")
    )


def split_clean_errors(
    annotated: DataFrame, persist: bool = True
) -> tuple[DataFrame, DataFrame]:
    """One annotated pass → (clean, errors). ``persist=True`` caches the
    annotated intermediate so the two sinks don't rescan the source."""
    if persist:
        annotated = annotated.persist(StorageLevel.MEMORY_AND_DISK)
    return finalize_clean(annotated), finalize_errors(annotated)
