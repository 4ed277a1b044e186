"""Engine-breadth queries beyond the reference's surface (SURVEY.md §2.12
gap list): pivot, CUBE grouping, the full window-function family,
explode/UDTF-style flattening, deterministic sampling, and array functions.

The reference implements none of these (its SQL surface stops at GROUP BY
+ HAVING, `composer/sales_etl_dag.py:90-110`); they are engine capabilities
a user migrating real workloads expects, so each is a first-class oracled
harness query. All are pure built-in-function plans (whole-stage codegen,
no Python in the hot path) and shuffle only on their natural keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.hashing import h60_duck, h60_sql
from .harness import _t, register

# ---------------------------------------------------------------------------
# Pivot — wide conditional aggregation
# ---------------------------------------------------------------------------


@register(
    "pivot_revenue",
    """
    SELECT l_linestatus,
           ROUND(SUM(CASE WHEN l_returnflag = 'A'
                 THEN l_extendedprice * (1 - l_discount) END), 2) AS rev_A,
           ROUND(SUM(CASE WHEN l_returnflag = 'N'
                 THEN l_extendedprice * (1 - l_discount) END), 2) AS rev_N,
           ROUND(SUM(CASE WHEN l_returnflag = 'R'
                 THEN l_extendedprice * (1 - l_discount) END), 2) AS rev_R
    FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus
    """,
)
def pivot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """groupBy().pivot() with EXPLICIT value list — at 100 TB an implicit
    pivot runs a blocking distinct-scan over the fact table just to learn
    the column set; pinning the values keeps it a single shuffle-free
    partial-agg + one exchange on the group key."""
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.withColumn(
            "rev", F.col("l_extendedprice") * (1 - F.col("l_discount"))
        )
        .groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("rev"), 2))
    )
    return out.select(
        "l_linestatus",
        F.col("A").alias("rev_A"),
        F.col("N").alias("rev_N"),
        F.col("R").alias("rev_R"),
    ).orderBy("l_linestatus")


# ---------------------------------------------------------------------------
# CUBE — all grouping-set combinations in one pass
# ---------------------------------------------------------------------------


@register(
    "cube_revenue",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY returnflag, linestatus
    """,
)
def cube_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(flag, status): one logical Expand node feeding a single hash
    aggregate — Catalyst plans one shuffle for all 4 grouping sets instead
    of a UNION ALL of 4 scans (4× less input read at scale). COALESCE maps
    the roll-up NULLs to 'ALL' (grouping columns are non-null in the data,
    so the sentinel is unambiguous)."""
    li = _t(spark, sf_dir, "lineitem").withColumn(
        "rev", F.col("l_extendedprice") * (1 - F.col("l_discount"))
    )
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("rev"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "revenue",
            "n",
        )
        .orderBy("returnflag", "linestatus")
    )


# ---------------------------------------------------------------------------
# Window-function family — running agg, lag/lead, ranks, one window spec
# ---------------------------------------------------------------------------


@register(
    "window_running_analytics",
    """
    WITH src AS (
      SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
             CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100)
                  AS BIGINT) AS rev_c
      FROM lineitem WHERE l_quantity >= 48
    )
    SELECT l_returnflag, l_orderkey, l_linenumber,
           ROW_NUMBER() OVER w AS rn,
           DENSE_RANK() OVER (PARTITION BY l_returnflag
                              ORDER BY CAST(l_quantity AS BIGINT)) AS qty_rank,
           CAST(SUM(rev_c) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS BIGINT) AS running_rev_cents,
           COALESCE(LAG(CAST(l_quantity AS BIGINT)) OVER w, -1) AS prev_qty,
           COALESCE(LEAD(CAST(l_quantity AS BIGINT)) OVER w, -1) AS next_qty
    FROM src
    WINDOW w AS (PARTITION BY l_returnflag
                 ORDER BY l_orderkey, l_linenumber, CAST(l_quantity AS BIGINT), rev_c)
    ORDER BY l_returnflag, l_orderkey, l_linenumber
    """,
)
def window_running_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole window family over ONE window spec (single sort-within-
    partition; Spark evaluates all five functions in one Window physical
    node — check .explain: a single Exchange on l_returnflag then one
    Sort). Ordering key (l_orderkey, l_linenumber) is unique, so running
    sums are deterministic and the FP accumulation order matches the
    oracle's. dense_rank uses its own ordering and costs a second Window
    node but reuses the same exchange."""
    li = _t(spark, sf_dir, "lineitem")
    src = li.filter(F.col("l_quantity") >= 48).select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("bigint").alias("qty"),
        # Integer-cents accumulator: windowed SUM(double) is association-
        # order-dependent (DuckDB segment-tree vs Spark sequential) and at
        # 1e7 magnitudes the error exceeds cent rounding; ROUND/decimal
        # casts also disagree at half-cent boundaries (JVM string-based
        # BigDecimal.valueOf vs bit-level). FLOOR(x*100) is a pure bit
        # operation — identical everywhere — and BIGINT sums are exact.
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100)
        .cast("bigint")
        .alias("rev_c"),
    )
    # (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
    # qty + rev tiebreakers make the ordering total, so lag/lead/running
    # sums are engine-independent (fully-identical rows remain tied, but
    # then either order yields identical output tuples).
    w = Window.partitionBy("l_returnflag").orderBy(
        "l_orderkey", "l_linenumber", "qty", "rev_c"
    )
    wrank = Window.partitionBy("l_returnflag").orderBy("qty")
    return src.select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.row_number().over(w).alias("rn"),
        F.dense_rank().over(wrank).alias("qty_rank"),
        F.sum("rev_c")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("running_rev_cents"),
        F.coalesce(F.lag("qty").over(w), F.lit(-1)).alias("prev_qty"),
        F.coalesce(F.lead("qty").over(w), F.lit(-1)).alias("next_qty"),
    ).orderBy("l_returnflag", "l_orderkey", "l_linenumber")


# ---------------------------------------------------------------------------
# Explode / UDTF-style flattening — word counts over documents
# ---------------------------------------------------------------------------


@register(
    "explode_word_counts",
    """
    SELECT word, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS docs
    FROM (
      SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
      FROM documents
    ) WHERE word <> ''
    GROUP BY word ORDER BY cnt DESC, word LIMIT 50
    """,
)
def explode_word_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral flatten (explode = built-in Generate node, the UDTF shape)
    then count + count-distinct per word. The distinct runs as a two-phase
    partial/merge aggregate on (word, doc_id) — no row ever leaves the
    executors until the final top-50, which is a TakeOrdered (no global
    sort materialization)."""
    d = _t(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), " ")).alias("word"),
    ).filter(F.col("word") != "")
    return (
        words.groupBy("word")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("doc_id").alias("docs"),
        )
        .orderBy(F.desc("cnt"), "word")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Deterministic sampling — hash-Bernoulli, reproducible across engines
# ---------------------------------------------------------------------------


@register(
    "sample_hash_bernoulli",
    f"""
    SELECT COUNT(*) AS n_sampled,
           ROUND(SUM(l_extendedprice), 2) AS sum_price,
           ROUND(AVG(l_quantity), 4) AS avg_qty,
           MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key
    FROM lineitem
    WHERE {h60_duck("l_orderkey || '#' || l_linenumber")} % 100 < 5
    """,
)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~5% Bernoulli sample keyed on hash(row identity) — unlike
    df.sample(), identical membership on every engine, every run, any
    partitioning (seeded sample() depends on partition layout, which a
    100 TB re-shard silently changes). The hash predicate evaluates
    map-side during the scan: no shuffle, no extra pass."""
    li = _t(spark, sf_dir, "lineitem")
    keyed = li.filter(
        F.expr(h60_sql("l_orderkey || '#' || l_linenumber")) % 100 < 5
    )
    return keyed.agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.min("l_orderkey").alias("min_key"),
        F.max("l_orderkey").alias("max_key"),
    )


# ---------------------------------------------------------------------------
# Array-function surface — higher-order functions over embeddings
# ---------------------------------------------------------------------------


@register(
    "array_functions_surface",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           ROUND(list_sum(list_transform(embedding[1:8],
                 x -> CAST(x AS DOUBLE))), 6) AS head_sum,
           ROUND(list_max(list_transform(embedding,
                 x -> CAST(x AS DOUBLE))), 6) AS max_elem,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           ROUND(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 6) AS sq_norm
    FROM embeddings WHERE vec_id % 97 = 0 ORDER BY vec_id
    """,
)
def array_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions (transform / filter / aggregate /
    slice / array_max) — all Catalyst expressions evaluated inside codegen
    over the Arrow-read array column; zero UDFs, zero explode-reassemble
    round trips (an explode+groupBy formulation would shuffle dim× the
    rows)."""
    emb = _t(spark, sf_dir, "embeddings")
    dbl = "transform(embedding, x -> CAST(x AS DOUBLE))"
    return (
        emb.filter(F.col("vec_id") % 97 == 0)
        .select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.round(
                F.expr(f"aggregate(slice({dbl}, 1, 8), 0D, (a, x) -> a + x)"),
                6,
            ).alias("head_sum"),
            F.round(F.expr(f"array_max({dbl})"), 6).alias("max_elem"),
            F.size(F.expr("filter(embedding, x -> x > 0)")).alias("n_pos"),
            F.round(
                F.expr(f"aggregate({dbl}, 0D, (a, x) -> a + x * x)"), 6
            ).alias("sq_norm"),
        )
        .orderBy("vec_id")
    )
