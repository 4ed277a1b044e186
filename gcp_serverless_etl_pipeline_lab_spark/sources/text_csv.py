"""S1 — raw text-file scan with naive-split CSV semantics.

The reference reads the CSV line-by-line (`dataflow/dataflow_transform.py:147`)
and tokenizes with a plain ``split(',')`` + per-token ``strip()``
(`dataflow_transform.py:53`) — RFC-4180 quoting is deliberately NOT honored
(SURVEY.md §1.3). We therefore use ``spark.read.text`` (NOT
``spark.read.csv``) so quoted commas split the row exactly like the
reference, and attach a file-order line id for deterministic
first-occurrence-wins dedup downstream.

Scale note: ``monotonically_increasing_id`` is assigned per input split in
split order, so ids are monotone in file order for a text scan; no global
sort or shuffle is needed to establish arrival order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINE_COL = "value"
LINE_ID_COL = "_line_id"


def read_raw_lines(spark: SparkSession, path: str) -> DataFrame:
    """Scan a text file → DataFrame[value: string, _line_id: long]."""
    return spark.read.text(path).withColumn(LINE_ID_COL, F.monotonically_increasing_id())


def lines_from_strings(spark: SparkSession, lines: list[str]) -> DataFrame:
    """Test/ingest helper: build the same shape from in-memory lines,
    preserving list order as file order."""
    rows = [(line, i) for i, line in enumerate(lines)]
    return spark.createDataFrame(rows, f"{LINE_COL} string, {LINE_ID_COL} long")
