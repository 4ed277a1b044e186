"""The spark.sql surface (harness.sql) — SQL twin == DataFrame twin.

SURVEY §3.3 commits to exposing BOTH the DataFrame builders and a
spark.sql path; these tests pin that a user porting the reference's
literal SQL gets row-for-row the results of the DataFrame spelling, and
that Catalyst compiles both to the same execution strategy (broadcast
joins stay broadcast under AQE regardless of surface).
"""

from __future__ import annotations

from conftest import SF_SMOKE


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(str(r[c]) for c in cols) for r in df.collect())


def test_sql_q1_matches_dataframe_twin(spark):
    from gcp_serverless_etl_pipeline_lab_spark.harness import QUERIES

    sql_df = QUERIES["a0c_sql_q1_pricing"].builder(spark, SF_SMOKE)
    df_df = QUERIES["q1_pricing_summary"].builder(spark, SF_SMOKE)
    assert sorted(sql_df.columns) == sorted(df_df.columns)
    assert _rows(sql_df) == _rows(df_df)


def test_sql_topk_matches_dataframe_twin(spark):
    from gcp_serverless_etl_pipeline_lab_spark.harness import QUERIES

    sql_df = QUERIES["a0c_sql_topk_per_nation"].builder(spark, SF_SMOKE)
    df_df = QUERIES["window_topk_per_group"].builder(spark, SF_SMOKE)
    assert _rows(sql_df) == _rows(df_df)


def test_sql_semi_anti_matches_dataframe_twin(spark):
    from gcp_serverless_etl_pipeline_lab_spark.harness import QUERIES

    sql_df = QUERIES["a0c_sql_semi_anti"].builder(spark, SF_SMOKE)
    df_df = QUERIES["join_semi_anti"].builder(spark, SF_SMOKE)
    assert _rows(sql_df) == _rows(df_df)


def test_sql_exists_compiles_to_semi_join(spark):
    """Catalyst's RewritePredicateSubquery turns the correlated EXISTS
    into the same left-semi join the DataFrame twin spells explicitly —
    the SQL surface costs nothing in plan quality."""
    from gcp_serverless_etl_pipeline_lab_spark.harness import QUERIES

    sql_df = QUERIES["a0c_sql_semi_anti"].builder(spark, SF_SMOKE)
    plan = sql_df._jdf.queryExecution().optimizedPlan().toString()
    assert "ExistenceJoin" in plan or "LeftSemi" in plan
    assert "Exists" not in plan.replace("ExistenceJoin", "")


def test_sql_gate_passes_on_clean_load(spark):
    """The DAG's validation gate returns its 1-row aggregate on the
    deduplicated sales_data load (unique ids, exact total_sale) — the
    BigQueryCheckOperator "check passed" contract."""
    from gcp_serverless_etl_pipeline_lab_spark.harness import QUERIES

    rows = QUERIES["a0c_sql_validation_gate"].builder(spark, SF_SMOKE).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["total_records"] > 0
    assert r["unique_records"] == r["total_records"]
    assert r["correct_calculations"] == r["total_records"]
