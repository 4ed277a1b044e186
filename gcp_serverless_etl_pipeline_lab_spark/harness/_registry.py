"""Registry core for the correctness harness.

``register(name, oracle)`` pairs a Spark DataFrame builder
``(spark, sf_dir) -> DataFrame`` with an equivalent DuckDB SQL oracle over
the same parquet tables; family modules in this package register their
queries on import (see ``harness/__init__.py`` for the determinism rules).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from ..session import ensure_oracle_conf
from ..sources.tables import load_table


@dataclass(frozen=True)
class Query:
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None -> driver runs the weaker rows-only check


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            ensure_oracle_conf(spark)
            return fn(spark, sf_dir)

        QUERIES[name] = Query(builder=wrapped, oracle=oracle)
        return wrapped

    return deco


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def query_names() -> list[str]:
    return sorted(QUERIES)
