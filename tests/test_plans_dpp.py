"""Dynamic partition pruning through the partitioned warehouse layout.

At 100 TB the fact table is date-partitioned (sinks.write_warehouse
``partition_by``) and most queries join it against a small filtered
dimension. Static pruning (tests/test_plans_round5b.py) covers literal
predicates; this test pins the RUNTIME half: when the year filter lives on
the dimension side of a broadcast join, Catalyst must inject a
``dynamicpruningexpression`` into the fact scan's PartitionFilters so only
the dimension's surviving years are listed/read — without it, the join
scans every partition and discards rows after the fact.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE
from gcp_serverless_etl_pipeline_lab_spark.sinks import read_warehouse, write_warehouse
from gcp_serverless_etl_pipeline_lab_spark.sources.tables import load_table


def test_dynamic_partition_pruning_through_warehouse_join(spark, tmp_path):
    base = str(tmp_path / "wh")
    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    write_warehouse(orders, base, partition_by=["o_year"])

    fact = read_warehouse(spark, base)
    # Dimension carries the selective predicate — the years the fact scan
    # must prune to are only known at runtime, after the dim is evaluated.
    years = (
        spark.range(1990, 2010)
        .select(
            F.col("id").cast("int").alias("o_year"),
            (F.col("id") % 7).alias("tag"),
        )
        .filter(F.col("tag") == 0)
    )
    joined = fact.join(F.broadcast(years), "o_year").groupBy("tag").agg(
        F.count(F.lit(1)).alias("n")
    )

    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    scan_filters = [
        line for line in plan.split("\n") if "PartitionFilters" in line
    ]
    assert scan_filters, "fact scan lost its partitioned layout"
    assert any(
        "dynamicpruningexpression" in line for line in scan_filters
    ), f"no runtime pruning in fact scan: {scan_filters}"

    # and the values themselves are right: only years ≡ 0 (mod 7) survive
    rows = joined.collect()
    expected = (
        orders.filter((F.col("o_year") % 7 == 0))
        .filter(F.col("o_year").between(1990, 2009))
        .count()
    )
    assert rows and rows[0]["n"] == expected
