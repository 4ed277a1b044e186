"""JSONL (newline-delimited JSON) source/sink — the lingua franca of
LLM training corpora.

Most published text datasets ship as ``*.jsonl[.gz]``; an engine claiming
the training-data-pipeline surface must ingest and emit them without a
side trip through another format. Spark's native ``json`` source IS the
right reader — schema-on-read with explicit schema (never inference on a
100 TB corpus: inference is a full extra pass), corrupt-record capture via
``PERMISSIVE`` + ``columnNameOfCorruptRecord`` (same dead-letter
philosophy as the CSV validation chain in operators/validate.py), and
predicate/column work happens AFTER parse, so keep JSONL for interchange
and convert to parquet (write_warehouse) for anything queried twice.

Scale notes:
- gzip JSONL is NOT splittable — one task per file; shard uploads to
  ~128-256 MB files upstream or pay single-task decompression. Plain or
  zstd-in-frames shards split fine.
- ``lines=True`` semantics only (one object per line); multi-line JSON
  arrays need a different (non-parallel) reader and do not belong in a
  corpus path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: StructType | str
) -> DataFrame:
    """Read newline-delimited JSON with an EXPLICIT schema; malformed
    lines land in ``_corrupt_record`` (PERMISSIVE) instead of killing the
    job — filter/route them like the CSV chain's error rows."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    schema = StructType(schema.fields).add(CORRUPT_COL, "string")
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, corrupt): clean rows drop the corrupt column; corrupt rows
    keep only the raw line for the dead-letter sink.

    The parsed frame is cached first: Spark refuses a query that
    references ONLY the internal corrupt-record column of a raw JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN), and the
    documented resolution is to materialize the parse once. That is also
    the right plan — an interchange read feeding two sinks should parse
    each line once, not once per branch. Call ``df.unpersist()`` when
    both branches are consumed; at 100 TB prefer parse → write parquet →
    split from the parquet copy so the cache never exceeds memory."""
    df = df.cache()
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    corrupt = df.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, corrupt


def write_jsonl(df: DataFrame, path: str, shards: int | None = None) -> None:
    """Emit newline-delimited JSON; ``shards`` repartitions so output file
    count (and size) is controlled — interchange consumers want ~128-256
    MB shards, not one file per upstream task."""
    out = df.repartition(shards) if shards else df
    out.write.mode("overwrite").json(path)
