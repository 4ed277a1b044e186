"""Round-5 second batch: multi-join analytics, SCD2 history, CMS heavy
hitters, partition-pruned warehouse reads, salted hot-key joins.

Names are prefixed ``a0b_`` (sorting just after the ``a0_`` batch, still
well inside the driver correctness gate's 50-entry alphabetical window —
COVERAGE.md "Driver correctness-gate truncation").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.hashing import h60_duck
from .harness import _t, register
from .operators.scd2 import scd2_history
from .operators.sketchfreq import cms_heavy_hitters
from .operators.skew import salted_join

# ---------------------------------------------------------------------------
# TPC-H Q5-shaped six-table join — the join-planning breadth query
# ---------------------------------------------------------------------------


@register(
    "a0b_tpch_q5_region_revenue",
    """
    SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
)
def a0b_tpch_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: local-supplier revenue by nation for one region.

    Six-table join chain exercising the planner's mixed strategy: region
    and nation are explicitly broadcast (a few rows — the filter on
    r_name prunes nation to the region's members BEFORE the big join, so
    the fact-side rows for other regions never shuffle), supplier is
    small enough for AQE to broadcast on its own, and
    customer⋈orders⋈lineitem run as shuffle joins on their keys. The
    extra c_nationkey = s_nationkey equi-condition (the "local supplier"
    predicate) rides the supplier join as a post-join filter. The date
    filter is pushed to the orders parquet scan.
    """
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = _t(spark, sf_dir, "nation").join(
        F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
    ).select("n_nationkey", "n_name")
    orders = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1998-01-01")
    ).select("o_orderkey", "o_custkey")
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = _t(spark, sf_dir, "supplier").join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_nationkey", "n_name")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(li, li.l_orderkey == orders.o_orderkey)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
        .orderBy(F.desc("revenue"), "n_name")
    )


# ---------------------------------------------------------------------------
# SCD2 dimension history — operators/scd2.py
# ---------------------------------------------------------------------------


@register(
    "a0b_scd2_user_history",
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev IS NULL OR event_type <> prev
    ),
    intervals AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
             CAST(ROW_NUMBER() OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER)
               AS version_n
      FROM changes
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_versions,
           MIN(valid_from) AS first_from,
           MAX(CASE WHEN valid_to IS NULL THEN valid_from END) AS current_from,
           MAX(CASE WHEN valid_to IS NULL THEN state END) AS current_state,
           CAST(SUM(CASE WHEN valid_to IS NOT NULL THEN
             epoch_us(valid_to) - epoch_us(valid_from)
             ELSE 0 END) AS BIGINT) AS closed_us
    FROM intervals
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def a0b_scd2_user_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 per-user state history from the events change log, reported
    as one row per user (version count, current state, total closed-
    interval dwell time) so the result stays compact at any SF while the
    hash still covers every interval boundary. The builder
    (operators/scd2.py) compresses consecutive duplicate states and
    closes each interval with the next change's timestamp — single
    shuffle, both windows share one Exchange+Sort (asserted in
    tests/test_plans_round5b.py)."""
    hist = scd2_history(
        _t(spark, sf_dir, "events"),
        key_col="user_id",
        state_col="event_type",
        ts_col="ts",
        tiebreak_col="event_id",
    )
    return (
        hist.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_versions"),
            F.min("valid_from").alias("first_from"),
            F.max(F.when(F.col("is_current"), F.col("valid_from"))).alias(
                "current_from"
            ),
            F.max(F.when(F.col("is_current"), F.col("state"))).alias(
                "current_state"
            ),
            F.sum(
                F.when(
                    F.col("valid_to").isNotNull(),
                    F.unix_micros("valid_to") - F.unix_micros("valid_from"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("closed_us"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Count-min-sketch heavy hitters — operators/sketchfreq.py
# ---------------------------------------------------------------------------

_CMS_D, _CMS_W, _CMS_TOP = 4, 1024, 20


def _cms_bucket_duck(row: int) -> str:
    hashed = h60_duck(f"'{row}:' || k")
    return f"{hashed} % {_CMS_W}"


@register(
    "a0b_cms_heavy_hitters",
    f"""
    WITH keys AS (
      SELECT CAST(user_id AS VARCHAR) AS k FROM events
    ),
    cells_raw AS (
      SELECT k, UNNEST([{", ".join(
          f"struct_pack(hrow := {r}, bucket := {_cms_bucket_duck(r)})"
          for r in range(_CMS_D)
      )}]) AS c
      FROM keys
    ),
    cells AS (
      SELECT k, c.hrow AS hrow, c.bucket AS bucket FROM cells_raw
    ),
    sketch AS (
      SELECT hrow, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM cells GROUP BY 1, 2
    ),
    exact AS (
      SELECT k, CAST(COUNT(*) AS BIGINT) AS exact FROM keys GROUP BY k
    ),
    probes_raw AS (
      SELECT k, UNNEST([{", ".join(
          f"struct_pack(hrow := {r}, bucket := {_cms_bucket_duck(r)})"
          for r in range(_CMS_D)
      )}]) AS c
      FROM exact
    ),
    probes AS (
      SELECT k, c.hrow AS hrow, c.bucket AS bucket FROM probes_raw
    ),
    est AS (
      SELECT p.k, CAST(MIN(s.cnt) AS BIGINT) AS est
      FROM probes p JOIN sketch s
        ON s.hrow = p.hrow AND s.bucket = p.bucket
      GROUP BY p.k
    )
    SELECT e.k, e.est, x.exact, e.est - x.exact AS overcount
    FROM est e JOIN exact x USING (k)
    ORDER BY e.est DESC, e.k
    LIMIT {_CMS_TOP}
    """,
)
def a0b_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy hitters over events.user_id: d=4 × w=1024
    counters, estimates = min over rows of the addressed counter, top-20
    by estimate with the exact count and overcount alongside. The sketch
    build's shuffle is bounded at d·w rows per input partition (map-side
    partial agg); the estimate lookup broadcasts the 4096-cell sketch.
    The oracle replays the identical MD5-salted bucketing, so every
    counter — including collisions — matches value-for-value."""
    return cms_heavy_hitters(
        _t(spark, sf_dir, "events"),
        "user_id",
        depth=_CMS_D,
        width=_CMS_W,
        top_n=_CMS_TOP,
    )


# ---------------------------------------------------------------------------
# Bigram LM perplexity scoring — operators/lmscore.py
# ---------------------------------------------------------------------------


@register(
    "a0b_bigram_lm_scores",
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    occ AS (
      SELECT doc_id, t, UNNEST(range(0, len(t) - 1)) AS i FROM toks
    ),
    pairs AS (
      SELECT doc_id, t[CAST(i AS BIGINT) + 1] AS w1,
             t[CAST(i AS BIGINT) + 2] AS w2
      FROM occ
    ),
    bg AS (
      SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS k
      FROM pairs GROUP BY doc_id, w1, w2
    ),
    c12 AS (
      SELECT w1, w2, CAST(SUM(k) AS BIGINT) AS c12 FROM bg GROUP BY w1, w2
    ),
    c1 AS (
      SELECT w1, CAST(SUM(k) AS BIGINT) AS c1 FROM bg GROUP BY w1
    ),
    vcb AS (
      SELECT COUNT(DISTINCT w) AS v FROM (
        SELECT w1 AS w FROM bg UNION ALL SELECT w2 FROM bg
      )
    ),
    scored AS (
      SELECT bg.doc_id, bg.k, c12.c12, c1.c1, vcb.v
      FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vcb
    ),
    perdoc AS (
      SELECT doc_id, CAST(SUM(k) AS BIGINT) AS n_bigrams,
             CAST(SUM(k * (
               CAST(FLOOR(ln(c12 + 1) * 1000000) AS BIGINT)
               - CAST(FLOOR(ln(c1 + v) * 1000000) AS BIGINT)
             )) AS BIGINT) AS score_micro
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, n_bigrams, score_micro,
           CAST((-score_micro) // n_bigrams AS BIGINT) AS neg_avg_micro
    FROM perdoc ORDER BY doc_id
    """,
)
def a0b_bigram_lm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-style quality scoring: an add-one-smoothed bigram LM
    trained on the corpus scores every document's total and per-token
    log-probability in exact integer micro-nats (operators/lmscore.py —
    integer-exact so the last-ulp ln() divergence between engines can't
    flake the hash compare). The Zipf-skewed count joins run hybrid
    hot/cold: heavy-hitter bigrams/heads broadcast, the tail shuffles."""
    from .operators.lmscore import doc_logprob_micro

    return doc_logprob_micro(
        _t(spark, sf_dir, "documents"), hot_threshold=1000
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Partition-pruned warehouse read — sinks.write_warehouse(partition_by)
# ---------------------------------------------------------------------------


@register(
    "a0b_partitioned_prune_year",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS revenue
    FROM orders
    WHERE CAST(year(o_orderdate) AS INTEGER) = 1997
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def a0b_partitioned_prune_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by priority for one year, read THROUGH a year-partitioned
    warehouse layout: orders is written with
    sinks.write_warehouse(partition_by=['o_year']) and read back with a
    partition filter, so the scan lists exactly one o_year=… directory
    instead of the whole table (pruning asserted on the plan in
    tests/test_plans_round5b.py; this query proves the values survive
    the partitioned round-trip). The 100 TB warehouse pattern: date-
    partition the fact table at write time, prune at read time."""
    import shutil
    import tempfile

    from .sinks import read_warehouse, write_warehouse

    orders = _t(spark, sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate").cast("int")
    )
    base = tempfile.mkdtemp(prefix="part_wh_")
    try:
        write_warehouse(orders, base, partition_by=["o_year"])
        rows = (
            read_warehouse(spark, base)
            .filter(F.col("o_year") == 1997)
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            )
            .orderBy("o_orderpriority")
            .collect()
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        [(r["o_orderpriority"], r["n_orders"], r["revenue"]) for r in rows],
        "o_orderpriority string, n_orders bigint, revenue double",
    )


# ---------------------------------------------------------------------------
# Salted hot-key join — operators/skew.py as an end-to-end oracled query
# ---------------------------------------------------------------------------


@register(
    "a0b_salted_hot_join",
    """
    SELECT c.c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS revenue
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def a0b_salted_hot_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders⋈customer revenue by market segment THROUGH the salted-join
    utility (operators/skew.py, n_salt=8): the fact side's shuffle key
    becomes (custkey, content-hash salt) so a pathological hot customer
    spreads over 8 reducers; the dimension side replicates once per
    salt. Matching the plain-join oracle proves salting is
    result-invariant — same rows, same aggregate, independent of salt
    fan-out and partition layout."""
    orders = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        salted_join(orders, cust, on="c_custkey", n_salt=8)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
        .orderBy("c_mktsegment")
    )


# ---------------------------------------------------------------------------
# Correlated scalar subquery (TPC-H Q17 shape) — Catalyst decorrelation
# ---------------------------------------------------------------------------


@register(
    "a0b_tpch_q17_small_qty",
    """
    SELECT p.p_brand,
           CAST(COUNT(*) AS BIGINT) AS n_small,
           ROUND(SUM(l.l_extendedprice), 2) AS small_qty_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity < (
      SELECT 0.2 * AVG(l2.l_quantity) FROM lineitem l2
      WHERE l2.l_partkey = p.p_partkey
    )
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
)
def a0b_tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from line items whose quantity is below
    20% of their part's average — a correlated scalar subquery, exercised
    through the engine's spark.sql surface. Catalyst DECORRELATES it into
    a per-part aggregate joined back to the fact table (asserted in
    tests/test_plans_round5b.py: the plan is aggregates + equi-joins, no
    nested-loop re-execution per outer row — the only plan that survives
    at 100 TB)."""
    _t(spark, sf_dir, "lineitem").createOrReplaceTempView("q17_lineitem")
    _t(spark, sf_dir, "part").createOrReplaceTempView("q17_part")
    return spark.sql(
        """
        SELECT p.p_brand,
               CAST(COUNT(*) AS BIGINT) AS n_small,
               ROUND(SUM(l.l_extendedprice), 2) AS small_qty_revenue
        FROM q17_lineitem l JOIN q17_part p ON p.p_partkey = l.l_partkey
        WHERE l.l_quantity < (
          SELECT 0.2 * AVG(l2.l_quantity) FROM q17_lineitem l2
          WHERE l2.l_partkey = p.p_partkey
        )
        GROUP BY p.p_brand
        ORDER BY p.p_brand
        """
    )


# ---------------------------------------------------------------------------
# ORC interchange roundtrip — second columnar format through the sinks
# ---------------------------------------------------------------------------


@register(
    "a0b_orc_roundtrip",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_priorities,
           ROUND(SUM(o_totalprice), 2) AS sum_price,
           MAX(o_orderdate) AS max_date
    FROM orders
    """,
)
def a0b_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC warehouse roundtrip: write `orders` through
    sinks.write_warehouse(fmt='orc'), read it back with
    read_warehouse(fmt='orc'), and aggregate — matching the parquet-
    derived oracle proves rows, types (timestamp included), and values
    survive the second columnar format. ORC matters for interchange with
    Hive-era warehouses; predicate pushdown and column pruning work the
    same as parquet (Spark native reader)."""
    import shutil
    import tempfile

    from .sinks import read_warehouse, write_warehouse

    base = tempfile.mkdtemp(prefix="orc_rt_")
    try:
        write_warehouse(_t(spark, sf_dir, "orders"), base, fmt="orc")
        row = (
            read_warehouse(spark, base, fmt="orc")
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                F.count_distinct("o_orderpriority")
                .cast("bigint")
                .alias("n_priorities"),
                F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
                F.max("o_orderdate").alias("max_date"),
            )
            .collect()[0]
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        [(row["n_rows"], row["n_priorities"], row["sum_price"], row["max_date"])],
        "n_rows bigint, n_priorities bigint, sum_price double, max_date timestamp",
    )


# ---------------------------------------------------------------------------
# RFC-4180 CSV roundtrip — sources/csv_rfc.py (standards-mode CSV)
# ---------------------------------------------------------------------------


_TRICKY_DUCK = h60_duck("'v,' || chr(34) || text || chr(34) || ',x'")

@register(
    "a0b_csv_rfc_roundtrip",
    f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_clean,
           CAST(2 AS BIGINT) AS n_corrupt,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM({_TRICKY_DUCK} % 1000000007)
             AS BIGINT) AS tricky_hashsum
    FROM documents
    """,
)
def a0b_csv_rfc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC-4180 CSV roundtrip (sources/csv_rfc.py): every document's text
    is wrapped with embedded commas AND double quotes (`v,"…",x`), written
    as quoted CSV, re-read in standards mode, with two malformed lines
    dead-lettered. Matching the oracle — which recomputes the tricky
    string straight from parquet — proves the writer quotes and the
    reader unquotes EXACTLY (doubled-quote escaping round-trips), the one
    thing the reference's naive-split reader cannot do (SURVEY.md §1.3).
    The engine ships both semantics: text_csv.py for reference parity,
    csv_rfc.py for standards interchange."""
    import os
    import shutil
    import tempfile

    from .functions.hashing import h60
    from .sources.csv_rfc import read_csv_rfc, split_corrupt, write_csv_rfc

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(F.lit('v,"'), F.col("text"), F.lit('",x')).alias("tricky"),
        F.col("n_chars").cast("int").alias("n_chars"),
    )
    base = tempfile.mkdtemp(prefix="csv_rfc_")
    try:
        out_dir = os.path.join(base, "csv")
        write_csv_rfc(docs, out_dir, shards=4)
        # two malformed lines: unbalanced quote, wrong arity after parse
        with open(os.path.join(out_dir, "part-corrupt.csv"), "w") as fh:
            fh.write('doc_id,tricky,n_chars\n')
            fh.write('9000001,"unterminated quote,12\n')
            fh.write('9000002,"ok",notanint\n')
        back = read_csv_rfc(
            spark, out_dir, "doc_id bigint, tricky string, n_chars int"
        )
        clean, corrupt = split_corrupt(back)
        row = (
            clean.agg(
                F.count(F.lit(1)).alias("n_clean"),
                F.sum("n_chars").cast("bigint").alias("sum_chars"),
                F.sum(F.pmod(h60(F.col("tricky")), F.lit(1000000007)))
                .cast("bigint")
                .alias("tricky_hashsum"),
            )
            .crossJoin(corrupt.agg(F.count(F.lit(1)).alias("n_corrupt")))
            .collect()[0]
        )
        back.unpersist()
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return spark.createDataFrame(
        [
            (
                row["n_clean"],
                row["n_corrupt"],
                row["sum_chars"],
                row["tricky_hashsum"],
            )
        ],
        "n_clean bigint, n_corrupt bigint, sum_chars bigint, tricky_hashsum bigint",
    )


# ---------------------------------------------------------------------------
# Fuzzy string join (prefix-filtered trigram similarity) — operators/fuzzyjoin.py
# ---------------------------------------------------------------------------


@register(
    "a0b_fuzzy_name_join",
    """
    WITH tnames AS (
      SELECT doc_id AS tid, lower(substr(text, 1, 30)) AS s FROM documents
      WHERE length(substr(text, 1, 30)) >= 5
    ),
    pnames AS (
      -- probe = same prefix with the 28th character dropped (typo)
      SELECT doc_id AS pid,
             lower(substr(text, 1, 27) || substr(text, 29, 2)) AS s
      FROM documents
      WHERE doc_id % 3 = 0 AND length(substr(text, 1, 30)) >= 5
    ),
    tset AS (
      SELECT tid, list_distinct(list_transform(
               range(1, length(s) - 3), i -> substr(s, i, 5))) AS g
      FROM tnames WHERE length(s) >= 5
    ),
    pset AS (
      SELECT pid, list_distinct(list_transform(
               range(1, length(s) - 3), i -> substr(s, i, 5))) AS g
      FROM pnames WHERE length(s) >= 5
    ),
    pairs AS (
      SELECT p.pid, t.tid,
             CAST(len(p.g) AS BIGINT) AS n_p,
             CAST(len(t.g) AS BIGINT) AS n_t,
             CAST(len(list_intersect(p.g, t.g)) AS BIGINT) AS n_inter
      FROM pset p CROSS JOIN tset t
    ),
    scored AS (
      SELECT pid, tid, n_p, n_t, n_inter,
             ROUND(n_inter / (n_p + n_t - n_inter), 4) AS jaccard
      FROM pairs
      WHERE ROUND(n_inter / (n_p + n_t - n_inter), 4) >= 0.6
    )
    SELECT pid, tid, n_p, n_t, n_inter, jaccard
    FROM scored
    QUALIFY ROW_NUMBER() OVER (PARTITION BY pid ORDER BY jaccard DESC, tid) = 1
    ORDER BY pid
    """,
)
def a0b_fuzzy_name_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution: probe strings (30-char document prefixes with a
    deterministic one-character-deletion typo) fuzzy-matched against the
    corpus on 5-gram Jaccard >= 0.6 via the prefix-filtered similarity
    join (operators/fuzzyjoin.py — candidates only from each string's
    rarest grams, LOSSLESS for the threshold; never all-pairs), best
    match per probe. q=5 because this corpus's trigram vocabulary is
    tiny (375 grams — every trigram common, blocking useless; see the
    operator docstring). The oracle verifies against a brute-force
    all-pairs cross join, proving the prefix filter loses nothing."""
    from .operators.fuzzyjoin import fuzzy_best_match

    docs = _t(spark, sf_dir, "documents")
    targets = docs.select(
        F.col("doc_id").alias("t_id"),
        F.lower(F.substring("text", 1, 30)).alias("t_name"),
    ).filter(F.length("t_name") >= 5)
    probes = (
        docs.filter(F.col("doc_id") % 3 == 0)
        .select(
            F.col("doc_id").alias("p_id"),
            F.lower(
                F.concat(
                    F.substring("text", 1, 27), F.substring("text", 29, 2)
                )
            ).alias("p_name"),
        )
        .filter(F.length("p_name") >= 5)
    )
    return fuzzy_best_match(
        probes, targets, "p_id", "p_name", "t_id", "t_name", threshold=0.6, q=5
    ).select(
        F.col("pid"), F.col("tid"), "n_p", "n_t", "n_inter", "jaccard"
    ).orderBy("pid")


# ---------------------------------------------------------------------------
# Incremental SCD2 apply — append-only CDC batch vs full recompute
# ---------------------------------------------------------------------------


@register(
    "a0b_scd2_incremental_apply",
    # full-recompute oracle: identical to a0b_scd2_user_history's — the
    # point of the query is that incremental apply CONVERGES to it
    """
    WITH ordered AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      FROM events
    ),
    changes AS (
      SELECT user_id, event_type, ts, event_id FROM ordered
      WHERE prev IS NULL OR event_type <> prev
    ),
    intervals AS (
      SELECT user_id, event_type AS state, ts AS valid_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to,
             CAST(ROW_NUMBER() OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS INTEGER)
               AS version_n
      FROM changes
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_versions,
           CAST(MAX(version_n) AS INTEGER) AS max_version,
           MIN(valid_from) AS first_from,
           MAX(CASE WHEN valid_to IS NULL THEN state END) AS current_state,
           CAST(SUM(CASE WHEN valid_to IS NOT NULL THEN
             epoch_us(valid_to) - epoch_us(valid_from)
             ELSE 0 END) AS BIGINT) AS closed_us
    FROM intervals
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def a0b_scd2_incremental_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-CDC shape: SCD2 history built from events BEFORE 2024-01-20,
    then the remaining days applied as an append-only delta batch via
    operators/scd2.scd2_apply_append (affected keys recomputed from
    open-interval + delta only; untouched keys anti-join through). The
    oracle is a FULL recompute over all events — matching it value-for-
    value (including rebased version numbers) proves incremental apply
    converges to the batch rebuild."""
    from .operators.scd2 import scd2_apply_append

    ev = _t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-20").cast("timestamp")
    base = scd2_history(
        ev.filter(F.col("ts") < cutoff),
        key_col="user_id",
        state_col="event_type",
        ts_col="ts",
        tiebreak_col="event_id",
    )
    updated = scd2_apply_append(
        base,
        ev.filter(F.col("ts") >= cutoff),
        key_col="user_id",
        state_col="event_type",
        ts_col="ts",
        tiebreak_col="event_id",
    )
    return (
        updated.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_versions"),
            F.max("version_n").cast("int").alias("max_version"),
            F.min("valid_from").alias("first_from"),
            F.max(F.when(F.col("is_current"), F.col("state"))).alias(
                "current_state"
            ),
            F.sum(
                F.when(
                    F.col("valid_to").isNotNull(),
                    F.unix_micros("valid_to") - F.unix_micros("valid_from"),
                ).otherwise(F.lit(0))
            )
            .cast("bigint")
            .alias("closed_us"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Distribution drift (PSI) — operators/drift.py
# ---------------------------------------------------------------------------


@register(
    "a0b_drift_price_psi",
    """
    WITH ref AS (
      SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket
      FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01'
    ),
    cur AS (
      SELECT CAST(FLOOR(o_totalprice / 50000) AS BIGINT) AS bucket
      FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01'
    ),
    a AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) n_ref FROM ref GROUP BY bucket),
    b AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) n_cur FROM cur GROUP BY bucket),
    j AS (
      SELECT COALESCE(a.bucket, b.bucket) AS bucket,
             COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
      FROM a FULL OUTER JOIN b ON a.bucket = b.bucket
    ),
    t AS (
      SELECT CAST(SUM(n_ref) AS BIGINT) tot_ref,
             CAST(SUM(n_cur) AS BIGINT) tot_cur,
             CAST(COUNT(*) AS BIGINT) k
      FROM j
    ),
    scored AS (
      SELECT j.bucket, j.n_ref, j.n_cur,
             (j.n_ref + 1) * 1000000 // (t.tot_ref + t.k) AS p_ref_ppm,
             (j.n_cur + 1) * 1000000 // (t.tot_cur + t.k) AS p_cur_ppm,
             CAST(FLOOR(ln(j.n_cur + 1) * 1000000) AS BIGINT)
               + CAST(FLOOR(ln(t.tot_ref + t.k) * 1000000) AS BIGINT)
               - CAST(FLOOR(ln(j.n_ref + 1) * 1000000) AS BIGINT)
               - CAST(FLOOR(ln(t.tot_cur + t.k) * 1000000) AS BIGINT)
               AS logratio_micro
      FROM j CROSS JOIN t
    )
    SELECT bucket, n_ref, n_cur,
           CAST(p_ref_ppm AS BIGINT) AS p_ref_ppm,
           CAST(p_cur_ppm AS BIGINT) AS p_cur_ppm,
           logratio_micro,
           CAST((p_cur_ppm - p_ref_ppm) * logratio_micro AS BIGINT)
             AS psi_contrib_pico
    FROM scored
    ORDER BY bucket
    """,
)
def a0b_drift_price_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI-style distribution drift of order value: 1998+ orders vs the
    pre-1998 reference window, 50k-wide price buckets. Integer-exact
    machinery (operators/drift.py): ppm probabilities via integer
    division, micro-nat log-ratios via the per-distinct-count ilog floor,
    pico-scale PSI contributions as exact BIGINT products — sum/1e12 is
    the classic PSI. Laplace add-one keeps one-sided buckets finite."""
    from .operators.drift import drift_report

    orders = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01").cast("timestamp")
    return drift_report(
        orders.filter(F.col("o_orderdate") < cutoff),
        orders.filter(F.col("o_orderdate") >= cutoff),
        F.floor(F.col("o_totalprice") / 50000).cast("bigint"),
    ).orderBy("bucket")
