"""Unit tests for the as-of backward join, focused on the struct-carry
semantics: the matched tuple must come from ONE right row even when some
right value columns are null (carrying columns independently would let a
null fall through to an older right row and mix two rows' values)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gcp_serverless_etl_pipeline_lab_spark.operators.asof import asof_join_backward


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_asof_null_value_column_does_not_mix_rows(spark):
    left = _mk(spark, [("k1", 10, "L")], "k string, t long, tag string")
    right = _mk(
        spark,
        [
            ("k1", 1, "old_v1", "old_v2"),
            ("k1", 5, "new_v1", None),  # latest match; v2 is genuinely null
        ],
        "k string, t long, v1 string, v2 string",
    )
    out = asof_join_backward(
        left, right, "k", "k", "t", "t", ["v1", "v2"], how="inner"
    ).collect()
    assert len(out) == 1
    r = out[0]
    # whole tuple from the t=5 row — v2 must NOT fall through to old_v2
    assert r["v1"] == "new_v1"
    assert r["v2"] is None


def test_asof_all_null_values_still_counts_as_inner_match(spark):
    left = _mk(spark, [("k1", 10, "L"), ("k2", 10, "M")], "k string, t long, tag string")
    right = _mk(spark, [("k1", 5, None, None)], "k string, t long, v1 string, v2 string")
    out = asof_join_backward(
        left, right, "k", "k", "t", "t", ["v1", "v2"], how="inner"
    ).collect()
    # k1 matched (a right row exists at-or-before, values just null);
    # k2 has no right row at all -> dropped by inner
    assert [r["tag"] for r in out] == ["L"]
    assert out[0]["v1"] is None and out[0]["v2"] is None


def test_asof_left_keeps_unmatched_with_nulls(spark):
    left = _mk(spark, [("k1", 1, "A"), ("k1", 7, "B")], "k string, t long, tag string")
    right = _mk(spark, [("k1", 3, "x", "y")], "k string, t long, v1 string, v2 string")
    out = {
        r["tag"]: (r["v1"], r["v2"])
        for r in asof_join_backward(
            left, right, "k", "k", "t", "t", ["v1", "v2"], how="left"
        ).collect()
    }
    assert out["A"] == (None, None)  # t=1 precedes every right row
    assert out["B"] == ("x", "y")


def test_asof_tie_matches_and_latest_wins(spark):
    left = _mk(spark, [("k1", 5, "T")], "k string, t long, tag string")
    right = _mk(
        spark,
        [("k1", 4, "earlier", "e2"), ("k1", 5, "tie", "t2")],
        "k string, t long, v1 string, v2 string",
    )
    out = asof_join_backward(
        left, right, "k", "k", "t", "t", ["v1", "v2"], how="inner"
    ).collect()
    assert len(out) == 1
    assert (out[0]["v1"], out[0]["v2"]) == ("tie", "t2")
