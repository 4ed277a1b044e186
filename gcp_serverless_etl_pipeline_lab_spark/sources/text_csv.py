"""S1 — raw text-file scan with naive-split CSV semantics.

The reference reads the CSV line-by-line (`dataflow/dataflow_transform.py:147`)
and tokenizes with a plain ``split(',')`` + per-token ``strip()``
(`dataflow_transform.py:53`) — RFC-4180 quoting is deliberately NOT honored
(SURVEY.md §1.3). We therefore use ``spark.read.text`` (NOT
``spark.read.csv``) so quoted commas split the row exactly like the
reference, and attach a file-order line id for deterministic
first-occurrence-wins dedup downstream.

Scale note: ``monotonically_increasing_id`` is assigned per input split in
split order, so ids are monotone in file order for a SINGLE-file text scan
— no shuffle needed to establish arrival order. For MULTI-file globs the
scan packs splits largest-first, so the raw id order follows file SIZE,
not file name: pass ``stable_multifile=True`` to get the deterministic
(lexicographic file name, line offset) order instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

LINE_COL = "value"
LINE_ID_COL = "_line_id"

# room for 2^40 lines per file under 2^23 files in one 63-bit id
_FILE_RANK_SHIFT = 40


def read_raw_lines(
    spark: SparkSession, path: str, stable_multifile: bool = False
) -> DataFrame:
    """Scan a text file → DataFrame[value: string, _line_id: long].

    Default: raw scan order (exact file order for a single input file —
    the reference's contract, one CSV per run). ``stable_multifile=True``
    makes ``_line_id`` a total order of (file name ASC, position in file)
    so first-wins dedup is deterministic across any glob:

    - per-file position is ``row_number`` over (file, split order) — exact
      because Spark's size-descending split sort is STABLE, so equal-size
      splits of one file keep offset order and the smaller tail split of a
      file sorts after its full splits;
    - file rank comes from one tiny distinct-file job, broadcast back;
    - cost is one shuffle partitioned BY FILE (bounded by the largest
      file, the standard contract for file-granular arrival order).
    """
    raw = spark.read.text(path)
    if not stable_multifile:
        return raw.withColumn(LINE_ID_COL, F.monotonically_increasing_id())
    df = raw.select(
        LINE_COL,
        F.input_file_name().alias("_file"),
        F.monotonically_increasing_id().alias("_mono"),
    )
    files = sorted(r["_file"] for r in df.select("_file").distinct().collect())
    ranks = spark.createDataFrame(
        [(f, i) for i, f in enumerate(files)], "_file string, _frank long"
    )
    within = F.row_number().over(Window.partitionBy("_file").orderBy("_mono"))
    return (
        df.join(F.broadcast(ranks), "_file")
        .withColumn(
            LINE_ID_COL,
            F.shiftleft(F.col("_frank"), _FILE_RANK_SHIFT) + within,
        )
        .select(LINE_COL, LINE_ID_COL)
    )


def lines_from_strings(spark: SparkSession, lines: list[str]) -> DataFrame:
    """Test/ingest helper: build the same shape from in-memory lines,
    preserving list order as file order."""
    rows = [(line, i) for i, line in enumerate(lines)]
    return spark.createDataFrame(rows, f"{LINE_COL} string, {LINE_ID_COL} long")
