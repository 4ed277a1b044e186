"""S2/S3 — warehouse + dead-letter writers.

S2 mirrors ``WriteToBigQuery(..., WRITE_TRUNCATE, CREATE_IF_NEEDED)``
(`dataflow/dataflow_transform.py:152-160`): the writer owns the schema and
fully replaces the table each run → ``mode('overwrite')``. S3 persists the
error records the reference only logs/sketches
(`dataflow_transform.py:162-168`) → append-mode JSON dead-letter directory.

Scale note: both writers accept a ``partition_by`` so a 100 TB run can
partition the warehouse by date and prune at read time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_warehouse(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    fmt: str = "parquet",
) -> None:
    writer = df.write.mode("overwrite").format(fmt)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def write_dead_letter(errors: DataFrame, path: str) -> None:
    errors.write.mode("append").json(path)


def read_warehouse(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    return spark.read.format(fmt).load(path)
