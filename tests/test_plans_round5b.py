"""Physical-plan assertions for the round-5b operators: the scale
arguments in the docstrings (broadcast dims, single-shuffle SCD2,
bounded CMS shuffle, partition pruning) must be visible in the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from conftest import SF_SMOKE
from gcp_serverless_etl_pipeline_lab_spark.harness import QUERIES


def _plan(spark, name):
    df = QUERIES[name].builder(spark, SF_SMOKE)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def _plan_of(df, spark):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_q5_broadcasts_dims_and_pushes_date_filter(spark):
    tree = _plan(spark, "a0b_tpch_q5_region_revenue")
    head = tree.split("\n\n")[0]
    # region and nation ride broadcast joins; the big joins stay shuffled
    assert head.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" in head or "ShuffledHashJoin" in head
    # the order-date range reaches the parquet scan as pushed filters
    assert "o_orderdate" in tree[tree.index("PushedFilters") :].split("\n")[0]


def test_scd2_single_exchange_two_windows(spark):
    from gcp_serverless_etl_pipeline_lab_spark.operators.scd2 import scd2_history
    from gcp_serverless_etl_pipeline_lab_spark.sources.tables import load_table

    hist = scd2_history(
        load_table(spark, SF_SMOKE, "events"),
        key_col="user_id",
        state_col="event_type",
        ts_col="ts",
        tiebreak_col="event_id",
    )
    head = _plan_of(hist, spark).split("\n\n")[0]
    # lag-window, filter, lead/row_number-window share ONE hash exchange
    assert head.count("Exchange") == 1
    assert head.count("Window") == 2


def test_cms_sketch_partial_agg_and_broadcast_lookup(spark):
    from gcp_serverless_etl_pipeline_lab_spark.operators.sketchfreq import (
        cms_estimates,
        cms_sketch,
    )
    from gcp_serverless_etl_pipeline_lab_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    sk = cms_sketch(ev, "user_id")
    head = _plan_of(sk, spark).split("\n\n")[0]
    # two-phase aggregate: each input partition collapses to <= d*w cells
    # BEFORE the exchange
    assert head.count("HashAggregate") == 2
    assert "BatchEvalPython" not in head
    est = cms_estimates(ev.select(F.col("user_id")).distinct(), sk, "user_id")
    est_head = _plan_of(est, spark).split("\n\n")[0]
    # the 4096-cell sketch is broadcast; candidates never shuffle for the join
    assert "BroadcastHashJoin" in est_head


def test_partitioned_warehouse_prunes_to_one_year(spark, tmp_path):
    from gcp_serverless_etl_pipeline_lab_spark.sinks import (
        read_warehouse,
        write_warehouse,
    )
    from gcp_serverless_etl_pipeline_lab_spark.sources.tables import load_table

    orders = load_table(spark, SF_SMOKE, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    path = str(tmp_path / "wh")
    write_warehouse(orders, path, partition_by=["o_year"])
    pruned = read_warehouse(spark, path).filter(F.col("o_year") == 1997)
    tree = _plan_of(pruned, spark)
    scan = tree[tree.index("Scan parquet") :]
    pf_line = scan[scan.index("PartitionFilters") :].split("\n")[0]
    assert "o_year" in pf_line
    # pruning is real: the scan reads exactly the one matching directory
    n_years = orders.select("o_year").distinct().count()
    assert n_years > 1
    assert pruned.select(F.countDistinct("o_year")).collect()[0][0] == 1


def test_q17_subquery_is_decorrelated(spark):
    tree = _plan(spark, "a0b_tpch_q17_small_qty")
    head = tree.split("\n\n")[0]
    # the correlated scalar subquery must become a per-part aggregate
    # joined back — never a nested-loop re-execution per outer row
    assert "BroadcastNestedLoopJoin" not in head
    assert "CartesianProduct" not in head
    assert head.count("HashAggregate") >= 2  # per-part avg + final group-by


def test_range_clustering_gives_disjoint_file_ranges(spark, tmp_path):
    """The z-order-lite layout recipe for file-skipping: repartitionByRange
    on the skip column + sortWithinPartitions before writing means each
    parquet file covers a narrow, non-overlapping value range — a reader
    filtering on that column can skip whole files via footer min/max
    stats. Verified from the data itself: per-file [min, max] intervals
    must not overlap."""
    from gcp_serverless_etl_pipeline_lab_spark.sources.tables import load_table

    orders = load_table(spark, SF_SMOKE, "orders")
    path = str(tmp_path / "clustered")
    (
        orders.repartitionByRange(8, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(path)
    )
    ranges = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("o_orderdate").alias("lo"), F.max("o_orderdate").alias("hi"))
        .collect()
    )
    assert len(ranges) > 1
    ivs = sorted((r["lo"], r["hi"]) for r in ranges)
    for (_, hi_prev), (lo_next, _) in zip(ivs, ivs[1:]):
        assert lo_next >= hi_prev  # boundary value may repeat; no interior overlap
    # contrast: an unclustered hash layout has (near-)full-range files
    path2 = str(tmp_path / "hashed")
    orders.repartition(8).write.mode("overwrite").parquet(path2)
    spans = (
        spark.read.parquet(path2)
        .groupBy(F.input_file_name())
        .agg((F.unix_date(F.to_date(F.max("o_orderdate")))
              - F.unix_date(F.to_date(F.min("o_orderdate")))).alias("span"))
        .collect()
    )
    full = max(r["span"] for r in spans)
    max_clustered = max(
        (iv[1] - iv[0]).days if hasattr(iv[1] - iv[0], "days") else 0
        for iv in ivs
    )
    assert max_clustered < full / 3  # clustered files are narrow slices
