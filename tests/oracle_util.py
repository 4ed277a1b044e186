"""Local mimic of the driver's DuckDB-oracle comparison: run the Spark
builder and the oracle SQL on the same sf dir, compare row count, column
names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb

from gcp_serverless_etl_pipeline_lab_spark.sources.tables import TABLES


def run_oracle(sql: str, sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con.sql(sql).df()


def _canon(value):
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        if value == 0.0:
            value = 0.0  # collapse IEEE -0.0 into +0.0
        s = f"{value:.9g}"
        # Keep integral floats distinguishable from ints ("1.0" vs "1") —
        # the driver's compare treats an int-typed Spark column vs a
        # float64 oracle column (DuckDB HUGEINT via pandas) as a mismatch,
        # so the local mirror must be at least that strict.
        if "." not in s and "e" not in s and "n" not in s:
            s += ".0"
        return s
    return str(value)


def canonical_rows(df, columns):
    cols = sorted(columns)
    out = []
    for row in df:
        out.append(tuple(_canon(row[c]) for c in cols))
    return sorted(out)


def compare(spark_df, oracle_df) -> tuple[bool, str]:
    s_cols = sorted(spark_df.columns)
    o_cols = sorted(oracle_df.columns)
    if s_cols != o_cols:
        return False, f"column mismatch: spark={s_cols} oracle={o_cols}"
    s_rows = canonical_rows([r.asDict() for r in spark_df.collect()], s_cols)
    o_rows = canonical_rows(oracle_df.to_dict("records"), o_cols)
    if len(s_rows) != len(o_rows):
        return False, f"row count mismatch: spark={len(s_rows)} oracle={len(o_rows)}"
    if s_rows != o_rows:
        diffs = [(a, b) for a, b in zip(s_rows, o_rows) if a != b][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
