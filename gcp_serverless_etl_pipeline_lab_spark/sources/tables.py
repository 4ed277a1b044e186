"""Parquet table loaders for the shared synthetic test data (TESTDATA.md).

Columnar scans get Catalyst predicate pushdown + column pruning for free;
every query builder selects only the columns it needs so ``ReadSchema`` in
the physical plan stays minimal.

Scan parallelism: parquet is splittable only at row-group granularity, and
the local test files are written as a SINGLE row group each — so without
intervention every scan (and all pre-shuffle work above it) runs on one
core regardless of split config. ``load_table`` therefore probes row-group
counts (cached) and round-robin-repartitions a big-enough table whose scan
parallelism falls below half the cores. On a real multi-file dataset
(row groups >= cores — any production 100 TB layout) the probe says no and
this is a zero-cost no-op; the explicit exchange only exists to rescue the
degenerate small-file case.
"""

from __future__ import annotations

import os
from functools import lru_cache

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

# Below this many rows a single-task scan is cheaper than any shuffle.
_MIN_ROWS_TO_PARALLELIZE = 50_000


@lru_cache(maxsize=256)
def _scan_units(path: str) -> tuple[int, int]:
    """(row_groups, rows) for a local parquet file; (big, big) on any
    failure so the caller leaves the scan alone."""
    try:
        import pyarrow.parquet as pq

        f = pq.ParquetFile(path)
        return f.num_row_groups, f.metadata.num_rows
    except Exception:
        return 1 << 30, 0


def convert_nanos_ts(df: DataFrame) -> DataFrame:
    """Normalize the event-time column to TIMESTAMP (ltz), whatever the
    parquet wrote:

    - TIMESTAMP(NANOS) arrives as raw nanosecond longs (see
      session.RUNTIME_CONF) → truncate to µs exactly like DuckDB/Arrow
      do. Integer division — double division loses precision at ~1e18 ns.
    - TIMESTAMP_NTZ (µs, how the driver-regenerated round-4 testdata is
      written) → cast to ltz. The session pins UTC, so the cast is
      value-preserving — and watermarks/streaming event time REQUIRE ltz
      (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE otherwise).

    Shared by the batch loader and streaming file sources."""
    for col, dtype in df.dtypes:
        if col == "ts" and dtype == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
        elif col == "ts" and dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def load_table(
    spark: SparkSession, sf_dir: str, name: str, parallelize: bool | None = None
) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = convert_nanos_ts(spark.read.parquet(path))
    if parallelize is None:
        cores = spark.sparkContext.defaultParallelism
        row_groups, rows = _scan_units(path)
        parallelize = row_groups < cores // 2 and rows >= _MIN_ROWS_TO_PARALLELIZE
    if parallelize:
        df = df.repartition(spark.sparkContext.defaultParallelism)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the spark.sql surface."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
