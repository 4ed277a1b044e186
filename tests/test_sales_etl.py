"""Golden end-to-end test for the sales ETL (FIXTURES.md §A.4): the messy
26-data-row fixture must partition into exactly 12 clean / 14 error rows
with the reference's error labels, values, and post-load invariants."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from conftest import MESSY_CSV
from gcp_serverless_etl_pipeline_lab_spark.operators.transform import split_clean_errors
from gcp_serverless_etl_pipeline_lab_spark.operators.validate import annotate
from gcp_serverless_etl_pipeline_lab_spark.pipeline import run_sales_etl
from gcp_serverless_etl_pipeline_lab_spark.plans.quality import (
    DataQualityError,
    quality_gate,
    validation_aggregate,
)
from gcp_serverless_etl_pipeline_lab_spark.plans.reports import (
    demo_summary,
    revenue_by_product,
    summary_report,
)
from gcp_serverless_etl_pipeline_lab_spark.sources.text_csv import read_raw_lines

GOLDEN_CLEAN = {
    # (id, product, price, quantity, sale_date iso, total_sale)
    ("1", "Laptop", 1299.99, 2, "2024-01-15", 2599.98),
    ("004", "Monitor", 449.0, 1, "2024-01-18", 449.0),
    ("7", "Webcam", 79.99, 3, "2024-01-21", 239.97),
    ("8", "Phone", 899.0, 1, "2024-01-22", 899.0),
    ("9", "Charger", 24.99, 6, "2024-01-23", 149.94),
    ("0010", "Speaker", 199.95, 2, "2024-01-24", 399.9),
    ("16", "Mousepad", 12.5, 1, "2024-01-30", 12.5),
    ("17", "Monitor Stand", 29.99, 1, "2024-01-31", 29.99),
    ("18", "USB Cable A to B", 5.0, 2, "2024-02-01", 10.0),
    ("19", "Phone Case", 15.99, 1, "2024-02-02", 15.99),
    ("21", "Webcam", 79.99, 2, "2024-02-04", 159.98),
    ("23", "Monitor", 449.0, 1, "2024-01-18", 449.0),
}

GOLDEN_ERROR_COUNTS = {
    "Invalid price or quantity": 3,
    "Missing required field": 4,
    "Invalid sale_date": 2,
    "Non-positive price or quantity": 2,
    "Duplicate id in this bundle": 2,
    "Non-numeric id": 1,
}


@pytest.fixture(scope="module")
def split(spark):
    clean, errors = split_clean_errors(annotate(read_raw_lines(spark, MESSY_CSV)))
    yield clean.cache(), errors.cache()


def test_golden_clean_partition(split):
    clean, _ = split
    rows = {
        (r.id, r.product, round(r.price, 2), r.quantity, r.sale_date.isoformat(), round(r.total_sale, 2))
        for r in clean.collect()
    }
    assert rows == GOLDEN_CLEAN


def test_golden_error_partition(split):
    _, errors = split
    counts = {r["error"]: r["n"] for r in errors.groupBy("error").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert counts == GOLDEN_ERROR_COUNTS
    assert sum(counts.values()) == 14


def test_error_rows_carry_raw_line(split):
    _, errors = split
    dup_rows = {r.row for r in errors.filter(F.col("error") == "Duplicate id in this bundle").collect()}
    assert dup_rows == {
        "8,Phone Duplicate,899.00,1,2024-01-22",
        "1,Laptop Pro,1499.99,1,2024-02-05",
    }


def test_clean_schema_types(split):
    clean, _ = split
    types = dict(clean.dtypes)
    assert types == {
        "id": "string",
        "product": "string",
        "price": "double",
        "quantity": "bigint",
        "sale_date": "date",
        "total_sale": "double",
    }


def test_quality_gate_and_invariants(spark, split):
    clean, _ = split
    agg = validation_aggregate(clean).collect()[0]
    assert agg.total_rows == 12
    assert agg.unique_ids == 12
    assert agg.correct_totals == 12
    quality_gate(clean)  # must not raise
    # gate must fail on a corrupted table (duplicate id)
    with pytest.raises(DataQualityError):
        quality_gate(clean.union(clean.limit(1)))


def test_summary_report(split):
    clean, _ = split
    row = summary_report(clean).collect()[0]
    assert row.total_sales == 12
    assert row.total_revenue == round(sum(r[5] for r in GOLDEN_CLEAN), 2)
    assert row.unique_products == len({r[1] for r in GOLDEN_CLEAN})
    assert row.latest_sale_date == dt.date(2024, 2, 4)


def test_revenue_by_product_ordering(split):
    clean, _ = split
    rows = revenue_by_product(clean).collect()
    revenues = [r.revenue for r in rows]
    assert revenues == sorted(revenues, reverse=True)
    assert rows[0].product == "Laptop" and rows[0].revenue == 2599.98
    # Two Monitor sales and two Webcam sales aggregate
    by_product = {r.product: r.revenue for r in rows}
    assert by_product["Monitor"] == 898.0
    assert by_product["Webcam"] == 399.95


def test_demo_summary(split):
    clean, _ = split
    row = demo_summary(clean).collect()[0]
    assert row.total_rows == 12 and row.latest_sale == dt.date(2024, 2, 4)


def test_full_pipeline_with_sinks(spark, tmp_path):
    result = run_sales_etl(
        spark,
        MESSY_CSV,
        warehouse_path=str(tmp_path / "warehouse"),
        dead_letter_path=str(tmp_path / "dead_letter"),
    )
    reread = spark.read.parquet(str(tmp_path / "warehouse"))
    assert reread.count() == 12
    dead = spark.read.json(str(tmp_path / "dead_letter"))
    assert dead.count() == 14
    assert set(dead.columns) == {"error", "row"}
    assert result.summary.collect()[0].total_sales == 12
