"""Every registered query with an oracle must hash-match DuckDB at sf0.001
(fast) — the same comparison the driver runs at sf0.01."""

from __future__ import annotations

import pytest

from conftest import SF_SMOKE
from gcp_serverless_etl_pipeline_lab_spark.harness import QUERIES
from oracle_util import compare, run_oracle

ORACLED = sorted(name for name, q in QUERIES.items() if q.oracle)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, name):
    q = QUERIES[name]
    spark_df = q.builder(spark, SF_SMOKE)
    oracle_df = run_oracle(q.oracle, SF_SMOKE)
    ok, msg = compare(spark_df, oracle_df)
    assert ok, f"{name}: {msg}"


def test_all_queries_have_builders(spark):
    assert len(QUERIES) >= 15
