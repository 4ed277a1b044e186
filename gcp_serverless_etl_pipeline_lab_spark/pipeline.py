"""Q5 — the orchestrated end-to-end run.

Reference DAG (`composer/sales_etl_dag.py:118-119`):
sensor → ETL → quality gate → summary report (+ alert on failure).
Here that's one driver function: wait-for-file (S4) → transform →
gate (Q1) → report (A4). The streaming variant of the same transform lives
in ``streaming.file_stream``.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from .operators.transform import split_clean_errors
from .operators.validate import annotate
from .plans.quality import quality_gate
from .plans.reports import summary_report
from .sinks import write_dead_letter, write_warehouse
from .sources.text_csv import read_raw_lines


def wait_for_file(path: str, poke_interval_s: float = 60, timeout_s: float = 3600) -> bool:
    """S4 file-arrival sensor (`composer/sales_etl_dag.py:42-48`):
    poke every ``poke_interval_s`` up to ``timeout_s``."""
    deadline = time.monotonic() + timeout_s
    while time.monotonic() < deadline:
        if os.path.exists(path):
            return True
        time.sleep(poke_interval_s)
    return False


@dataclass
class PipelineResult:
    clean: DataFrame
    errors: DataFrame
    summary: DataFrame


def run_sales_etl(
    spark: SparkSession,
    input_path: str,
    warehouse_path: str | None = None,
    dead_letter_path: str | None = None,
) -> PipelineResult:
    """The full reference pipeline: scan → validate/clean/derive →
    (warehouse, dead-letter) → quality gate → summary report."""
    raw = read_raw_lines(spark, input_path)
    clean, errors = split_clean_errors(annotate(raw))
    if warehouse_path:
        write_warehouse(clean, warehouse_path)
    if dead_letter_path:
        write_dead_letter(errors, dead_letter_path)
    quality_gate(clean)
    return PipelineResult(clean=clean, errors=errors, summary=summary_report(clean))
