"""Small-file compaction: plan AND execute.

The planning query (`compact_file_plan` in harness.storage) models the
metadata-scale group assignment; this module executes it against a real
parquet directory: list part files with sizes, assign each to a
cumulative-size output group, rewrite the dataset in ONE distributed job
so each group lands as one output file.

Scale design (the 100 TB warehouse-partition case):
- The LISTING is metadata-scale (one file-system/object-store list, no
  data read) and the group plan is a driver-side running sum over it —
  millions of entries, never rows.
- The REWRITE is one Spark job: read all inputs, tag each row with its
  source file (``input_file_name()``), broadcast-join the slim
  file→group map, ``repartition(n_groups, group)`` so every group's rows
  co-locate in one task, and write ``partitionBy(group)`` — exactly one
  file per group directory. Bytes move once; no driver loop over groups,
  no per-group job.
- ``target_bytes`` should be the cluster's preferred scan unit
  (~128-256 MB); the default here is tiny because tests compact
  kilobyte-scale fixtures.
- Row-level content is untouched — compaction is a pure re-layout, and
  ``compact_execute`` returns before/after file counts so callers can
  assert the reduction (oracled in the `compact_execute_verify` harness
  query; parity pinned in tests/test_compaction.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

GROUP_COL = "_compact_group"


def list_part_files(path: str, suffix: str = ".parquet") -> list[tuple[str, int]]:
    """(absolute file path, size bytes) for every data file under
    ``path``, in deterministic name order — the metadata listing the plan
    runs over. On an object store this is the inventory/LIST call."""
    out = []
    for root, _dirs, names in os.walk(path):
        for name in sorted(names):
            if name.endswith(suffix) and not name.startswith(("_", ".")):
                p = os.path.join(root, name)
                out.append((p, os.path.getsize(p)))
    out.sort()
    return out


def plan_groups(
    files: list[tuple[str, int]], target_bytes: int
) -> dict[str, int]:
    """file → output-group id by cumulative-size-before
    (floor(cumsum_before / target)), the same rule as the oracled
    planning query: each group's bytes land in [target, target + max
    input file), except the last. Pure metadata arithmetic."""
    plan: dict[str, int] = {}
    cum = 0
    for path, size in files:
        plan[path] = cum // target_bytes
        cum += size
    return plan


def compact_execute(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = 16_000,
) -> dict:
    """Rewrite the parquet dataset at ``src_path`` into ``dst_path`` with
    one file per planned size group (hive-partitioned by ``_compact_group``
    so the group structure is inspectable; read back with
    ``read_compacted``). Returns
    ``{"files_before", "files_after", "groups"}``."""
    import pathlib

    files = list_part_files(src_path)
    if not files:
        raise FileNotFoundError(f"no parquet part files under {src_path}")
    plan = plan_groups(files, target_bytes)
    n_groups = max(plan.values()) + 1
    # input_file_name() yields a PERCENT-ENCODED file: URI (a path with a
    # space reads back as %20); Path.as_uri() applies the identical
    # RFC-3986 encoding, so the map keys match byte-for-byte. A plain
    # f"file://{p}" concat does NOT — it joined to nothing for any path
    # with an encodable character, and the old inner join then silently
    # dropped every row of those files (regression pinned in
    # tests/test_compaction.py::test_compact_execute_space_in_path).
    map_rows = [(pathlib.Path(p).as_uri(), b) for p, b in plan.items()]
    fmap = spark.createDataFrame(map_rows, f"_f string, {GROUP_COL} int")
    df = spark.read.parquet(src_path).withColumn("_f", F.input_file_name())
    joined = df.join(F.broadcast(fmap), "_f", "left")
    # Belt-and-braces: compaction must move EVERY row, so an input file
    # the plan somehow doesn't cover is a hard error, never a silent drop.
    guarded = joined.withColumn(
        GROUP_COL,
        F.when(F.col(GROUP_COL).isNotNull(), F.col(GROUP_COL)).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("compact_execute: input file missing from plan: "),
                    F.col("_f"),
                )
            ).cast("int")
        ),
    )
    (
        guarded.drop("_f")
        .repartition(n_groups, F.col(GROUP_COL))
        .write.mode("overwrite")
        .partitionBy(GROUP_COL)
        .parquet(dst_path)
    )
    return {
        "files_before": len(files),
        "files_after": len(list_part_files(dst_path)),
        "groups": n_groups,
    }


def read_compacted(spark: SparkSession, dst_path: str) -> DataFrame:
    """Read a compacted dataset, dropping the layout-only group column."""
    return spark.read.parquet(dst_path).drop(GROUP_COL)
