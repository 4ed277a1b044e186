"""A4–A7 — the reference's reporting queries.

- A4 summary report (`composer/sales_etl_dag.py:93-101`)
- A5 revenue-by-product (`README.md:99-104`)
- A6/A7 demo count/max/sum (`README.md:142-147`)

All rounding matches the reference's ROUND(x, 2); MAX over DATE (A7) is an
ordering aggregate on DateType.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def summary_report(clean: DataFrame) -> DataFrame:
    """A4: COUNT, ROUND(SUM,2), ROUND(AVG,2), COUNT DISTINCT, MAX(date)."""
    return clean.agg(
        F.count(F.lit(1)).alias("total_sales"),
        F.round(F.sum("total_sale"), 2).alias("total_revenue"),
        F.round(F.avg("total_sale"), 2).alias("avg_sale_value"),
        F.countDistinct("product").alias("unique_products"),
        F.max("sale_date").alias("latest_sale_date"),
    )


def revenue_by_product(clean: DataFrame) -> DataFrame:
    """A5+O1: group-by revenue report, descending. Partial (map-side) agg +
    one hash exchange on ``product``, then a global sort over the small
    post-agg cardinality — the plan Catalyst picks unaided."""
    return (
        clean.groupBy("product")
        .agg(F.round(F.sum("total_sale"), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "product")
    )


def demo_summary(clean: DataFrame) -> DataFrame:
    """A6: COUNT(*), MAX(sale_date), ROUND(SUM(total_sale),2)."""
    return clean.agg(
        F.count(F.lit(1)).alias("total_rows"),
        F.max("sale_date").alias("latest_sale"),
        F.round(F.sum("total_sale"), 2).alias("total_revenue"),
    )
