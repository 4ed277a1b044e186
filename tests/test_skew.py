"""salted_join == plain join, on data with one pathologically hot key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_serverless_etl_pipeline_lab_spark.operators.skew import salted_join


def _skewed(spark):
    # 5000 rows for key 1, a handful for keys 2..5, key 99 unmatched.
    rows = [(1, i) for i in range(5000)] + [(k, k * 10) for k in (2, 3, 4, 5)]
    rows += [(99, 0)]
    large = spark.createDataFrame(rows, "k long, payload long")
    small = spark.createDataFrame(
        [(1, "hot"), (2, "two"), (3, "three"), (5, "five")], "k long, name string"
    )
    return large, small


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_inner_matches_plain(spark):
    large, small = _skewed(spark)
    plain = large.join(small, "k")
    salted = salted_join(large, small, "k", n_salt=8)
    assert salted.columns == plain.columns
    assert _canon(salted) == _canon(plain)


def test_salted_left_matches_plain(spark):
    large, small = _skewed(spark)
    plain = large.join(small, "k", "left")
    salted = salted_join(large, small, "k", n_salt=8, how="left")
    assert _canon(salted) == _canon(plain)  # key 99 survives with NULL name


def test_salt_actually_splits_the_hot_key(spark):
    large, small = _skewed(spark)
    salted_l = large.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(8)).cast("int"),
    )
    n_buckets = (
        salted_l.filter(F.col("k") == 1).select("_salt").distinct().count()
    )
    assert n_buckets == 8  # 5000 rows of the hot key spread over all salts


def test_unsupported_how_raises(spark):
    large, small = _skewed(spark)
    with pytest.raises(ValueError):
        salted_join(large, small, "k", how="full")
