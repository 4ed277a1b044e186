"""SparkSession factory.

Local test profile: ``local[$SPARK_GRAFT_CPUS]`` single-JVM. The same conf
keys are what we'd set cluster-side at 100 TB (AQE on, skew-join on,
shuffle partitions sized to the stage, UTC session TZ); only
``master``/``driver.memory`` are local-mode specific.

Spark 4 defaults ``spark.sql.ansi.enabled=true``; the reference's
validation semantics (null-on-failed-cast routing to a dead-letter channel,
`dataflow/dataflow_transform.py:77-100`) need lenient casts, so we pin it
off. ``ensure_oracle_conf`` applies the runtime-settable subset to an
externally provided session (e.g. the correctness driver's).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable SQLConf keys: safe to apply to an existing session.
RUNTIME_CONF: dict[str, str] = {
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Lenient multi-format date parsing (R8 needs yyyy/MM/dd fallback).
    "spark.sql.legacy.timeParserPolicy": "CORRECTED",
    # Spark 4 rejects TIMESTAMP(NANOS) parquet outright; read as long and
    # convert at the loader (sources.tables truncates ns → µs like DuckDB).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Round-15 optimization (guide §1.2/§7.2; measured, plan-diffed):
    # InferFiltersFromGenerate synthesizes `size(arr) > 0 AND
    # isnotnull(arr)` below every explode/posexplode and PushDownPredicates
    # then drives that filter through exchanges to the scan. Every
    # generator input in this engine is a COMPUTED array (n-gram shingles,
    # minhash bands, simhash bigrams, chunk slices...), so the inferred
    # filter re-materializes the whole array pipeline — with the split()
    # inlined per element — as a per-row scan filter: the n-gram explode
    # measured 4.4 s vs 1.1 s at sf0.1 (minhash full query 7.5 → 2.2 s),
    # re-enabling the rule restored the slowdown. The rule's only benefit
    # — dropping empty-array rows before a shuffle — saves bytes
    # proportional to empty-array frequency (~0 here) and costs CPU
    # proportional to EVERY row, at any scale; on stored-array columns a
    # scan-level isnotnull is all it could push, and none of our stored
    # array columns are nullable. Scale-independent, so excluded
    # everywhere, not just local.
    "spark.sql.optimizer.excludedRules": (
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    ),
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_session(
    app_name: str = "gcp-serverless-etl-pipeline-lab-spark",
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or reuse) a local session tuned for this machine."""
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in RUNTIME_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ensure_oracle_conf(spark)
    return spark


def ensure_oracle_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable conf to any session (ours or the driver's).

    Idempotent; called at the top of every public query builder so
    semantics don't depend on who constructed the session.
    """
    for k, v in RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # non-runtime key on some build; defaults are acceptable
    return spark
