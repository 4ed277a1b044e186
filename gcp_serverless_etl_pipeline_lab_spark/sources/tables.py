"""Parquet table loaders for the shared synthetic test data (TESTDATA.md).

Columnar scans get Catalyst predicate pushdown + column pruning for free;
every query builder selects only the columns it needs so ``ReadSchema`` in
the physical plan stays minimal.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    # TIMESTAMP(NANOS) columns arrive as raw nanosecond longs (see
    # session.RUNTIME_CONF); truncate to µs exactly like DuckDB/Arrow do.
    # Integer division — double division loses precision at ~1e18 ns.
    for col, dtype in df.dtypes:
        if col == "ts" and dtype == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the spark.sql surface."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
