"""RFC-4180 CSV source/sink — the standards-mode complement to
sources/text_csv.py.

The reference's pipeline DELIBERATELY uses naive ``split(',')`` semantics
(`/root/reference/dataflow/dataflow_transform.py:53` — quoted commas are
NOT respected, and the engine's text_csv.py reproduces that bit-for-bit
for parity, SURVEY.md §1.3). Real interchange needs the opposite: proper
quoting (fields containing commas/newlines/quotes wrapped in ``"``,
embedded quotes doubled), which Spark's native csv source implements.
This module pins the options that matter at scale and keeps the same
dead-letter discipline as the JSONL source.

Scale notes:
- ``multiLine=false`` (default) keeps the input splittable — a quoted
  embedded NEWLINE requires multiLine=true, which makes each file a
  single task; forbid embedded newlines upstream instead.
- Explicit schema always (inference is a full extra pass at 100 TB).
- PERMISSIVE + corrupt-record capture routes malformed lines to the
  dead-letter split instead of failing the job (mode=FAILFAST) or
  silently dropping them (mode=DROPMALFORMED).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from .jsonl import CORRUPT_COL, split_corrupt

__all__ = ["read_csv_rfc", "write_csv_rfc", "split_corrupt"]


def read_csv_rfc(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
) -> DataFrame:
    """RFC-4180 read: quote='"', escape='"' (doubled-quote escaping, the
    RFC spelling — Spark's default escape is backslash, which silently
    mis-parses RFC files). Malformed rows land in ``_corrupt_record``;
    route with split_corrupt() like the JSONL source."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    schema = StructType(schema.fields).add(CORRUPT_COL, "string")
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("quote", '"')
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def write_csv_rfc(
    df: DataFrame, path: str, header: bool = True, shards: int | None = None
) -> None:
    """RFC-4180 write: minimal quoting (only fields that need it), doubled
    embedded quotes, header row per shard."""
    out = df.repartition(shards) if shards else df
    (
        out.write.mode("overwrite")
        .option("header", header)
        .option("quote", '"')
        .option("escape", '"')
        .option("quoteAll", False)
        .csv(path)
    )
