"""JVM-literal local frames (round 16, guide §4/§5).

``spark.createDataFrame(rows, schema)`` over a small driver-side list
builds a Python-RDD-backed plan (``Scan ExistingRDD``): EVERY evaluation
re-pickles the rows through ``defaultParallelism`` Python-worker tasks,
and joins against such a frame fan into empty-task storms (a 1x1 join of
two measured 9-15 s in round 15; one noop evaluation measures ~0.28 s vs
~0.09 s for the identical literal plan at local[32]).

``literal_frame`` builds the same rows as a codegen'd JVM literal
projection over ``range(1)`` (``F.inline`` of an array of struct literals
for the multi-row case) — a LocalTableScan-class plan: one task, no
Python boundary, trivially broadcastable. It is the required spelling for
every SMALL driver-known frame on a query path: query-term lists, phrase
slots, file->group maps, sampling-rate tables, and eagerly-collected
1-row results handed back as DataFrames.

NOT for data-sized frames — the rows become part of the query plan, so
the same bound applies as to any literal list (hundreds of rows, not
millions). Data-scale input belongs in a real source (parquet) or, when
truly unavoidable, ``createDataFrame`` with Arrow.
"""

from __future__ import annotations

from collections.abc import Iterable, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def literal_frame(
    spark: SparkSession,
    schema: str | StructType,
    rows: Iterable[Sequence],
) -> DataFrame:
    """A DataFrame of driver-known ``rows`` with ``schema`` as a pure JVM
    literal plan (no Python-RDD scan). ``rows`` may be tuples/lists or
    pyspark ``Row`` objects whose values are ordered like ``schema``'s
    fields. Values must be plain Python scalars / lists / None; each is
    embedded with ``F.lit`` and cast to the declared field type."""
    st = StructType.fromDDL(schema) if isinstance(schema, str) else schema
    fields = [(f.name, f.dataType) for f in st.fields]
    rows = list(rows)
    if not rows:
        return spark.range(0).select(
            *[F.lit(None).cast(dt).alias(n) for n, dt in fields]
        )
    for row in rows:
        if len(row) != len(fields):
            raise ValueError(
                f"literal_frame: row arity {len(row)} != schema arity "
                f"{len(fields)}"
            )

    def _cells(row):
        return [
            F.lit(v).cast(dt).alias(n) for v, (n, dt) in zip(row, fields)
        ]

    if len(rows) == 1:
        return spark.range(1).select(*_cells(rows[0]))
    return spark.range(1).select(
        F.inline(F.array(*[F.struct(*_cells(r)) for r in rows]))
    )
