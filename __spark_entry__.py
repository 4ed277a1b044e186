"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query on sf0.001; ``queries()`` /
``oracle_sql()`` expose the harness registry
(gcp_serverless_etl_pipeline_lab_spark.harness) — one entry per implemented
operator from SURVEY.md §2 plus the training-data-pipeline extensions.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gcp_serverless_etl_pipeline_lab_spark.harness import QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: TPC-H Q1-style pricing summary on /root/testdata/sf0.001."""
    return QUERIES["q1_pricing_summary"].builder(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.builder for name, q in sorted(QUERIES.items())}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in sorted(QUERIES.items()) if q.oracle}
