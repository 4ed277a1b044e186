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

# Read-side null marker. With Spark's DEFAULT options both null and empty
# string are written as an empty field and read back as null — empty
# strings don't survive the round trip. The writer therefore quotes empty
# strings (emptyValue='""') so the file distinguishes them from nulls
# (unquoted empty), and the reader sets nullValue to this improbable
# sentinel, which flips univocity into "unquoted empty → null, quoted
# empty → ''" mode (verified empirically; the default nullValue='' maps
# both to null). Caveat: a raw data field byte-equal to the sentinel
# would read as null — it never appears in sane data.
_NULL_SENTINEL = "\\__SPARK_CSV_RFC_NULL__"


def read_csv_rfc(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    header: bool = True,
) -> DataFrame:
    """RFC-4180 read: quote='"', escape='"' (doubled-quote escaping, the
    RFC spelling — Spark's default escape is backslash, which silently
    mis-parses RFC files). Empty-string fields survive: a quoted ``""``
    reads as ``''`` and an unquoted empty field reads as null (see
    ``_NULL_SENTINEL``). Malformed rows land in ``_corrupt_record``;
    route with split_corrupt() like the JSONL source."""
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    schema = StructType(schema.fields).add(CORRUPT_COL, "string")
    return (
        spark.read.schema(schema)
        .option("header", header)
        .option("quote", '"')
        .option("escape", '"')
        .option("nullValue", _NULL_SENTINEL)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )


def write_csv_rfc(
    df: DataFrame, path: str, header: bool = True, shards: int | None = None
) -> None:
    """RFC-4180 write: minimal quoting (only fields that need it), doubled
    embedded quotes, header row per shard. Empty strings are written
    QUOTED (``""``) so they stay distinguishable from nulls (unquoted
    empty field) and round-trip through ``read_csv_rfc`` exactly."""
    out = df.repartition(shards) if shards else df
    (
        out.write.mode("overwrite")
        .option("header", header)
        .option("quote", '"')
        .option("escape", '"')
        .option("emptyValue", '""')
        .option("quoteAll", False)
        .csv(path)
    )
