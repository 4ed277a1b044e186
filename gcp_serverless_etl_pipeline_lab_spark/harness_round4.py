"""Round-4 extension queries (harness registrations).

Adds the operators a production-scale training-data pipeline layers on
top of pair-wise dedup and ANN search:

- duplicate-CLUSTER resolution (connected components over dup-pair
  edges, transitive closure → one survivor per cluster);
- BM25 keyword retrieval (the lexical complement to the embedding ANN
  queries — inverted-index shape: posting lists from one explode, df/idf
  from one aggregation, scores from one join);
- time-series gap-fill + LOCF forward fill over the events table;
- stratified (per-group rate) deterministic sampling;
- sketch-based approximate distinct counting with an honest
  tolerance-gate oracle (the approximation is asserted within ±5% of the
  exact count — the exact value is what's compared across engines);
- bucketed interval/range join (no cross product: intervals explode to
  day buckets, events equi-join on the bucket, exact containment is a
  post-filter);
- blocked k-NN graph construction over the embedding corpus.

Every query has a DuckDB oracle; determinism rules follow harness.py
(identical aliases both sides, ROUND on doubles, total-order tiebreaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.hashing import h60_duck
from .functions.text import word_ngrams_duck
from .harness import _t, register
from .harness_corpus import _DOC_CORPUS_DUCK, _doc_corpus
from .operators import cluster
from .operators.dedup import exact_dup_pairs, ngram_jaccard_pairs

# ---------------------------------------------------------------------------
# Duplicate-cluster resolution: pairs -> connected components
# ---------------------------------------------------------------------------
#
# Edge set = exact-dup pairs ∪ n-gram-Jaccard pairs (>= 0.8). The union
# matters: sub-3-token documents have no 3-gram shingles and are invisible
# to Jaccard, but byte-identical copies of them still edge via md5. The
# oracle re-derives both pair sets with the same SQL as dedup_exact /
# dedup_ngram_jaccard, then closes them with a recursive CTE; min-doc_id
# is the deterministic cluster id on both sides.


@register(
    "dedup_cluster_resolve",
    f"""
    WITH RECURSIVE {_DOC_CORPUS_DUCK},
    keyed AS (SELECT doc_id, md5(text) AS k FROM corpus),
    kept AS (SELECT k, MIN(doc_id) AS kept_id FROM keyed GROUP BY k),
    epairs AS (
      SELECT kept_id AS doc_a, doc_id AS doc_b
      FROM keyed JOIN kept USING (k) WHERE doc_id <> kept_id
    ),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM corpus),
    sh AS (SELECT doc_id, {word_ngrams_duck("t", 3)} AS shingles FROM toks),
    grams AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    jpairs AS (
      SELECT doc_a, doc_b FROM (
        SELECT doc_a, doc_b,
               ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 4) AS jaccard
        FROM inter
        JOIN (SELECT doc_id, len(shingles) AS sz FROM sh) sa ON sa.doc_id = doc_a
        JOIN (SELECT doc_id, len(shingles) AS sz FROM sh) sb ON sb.doc_id = doc_b
      ) WHERE jaccard >= 0.8
    ),
    allp AS (SELECT * FROM epairs UNION SELECT * FROM jpairs),
    edges AS (
      SELECT doc_a AS src, doc_b AS dst FROM allp
      UNION
      SELECT doc_b, doc_a FROM allp
    ),
    reach(node, r) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT reach.node, e.dst FROM reach JOIN edges e ON e.src = reach.r
    ),
    cc AS (
      SELECT node AS doc_id, LEAST(node, MIN(r)) AS cluster_id
      FROM reach GROUP BY node
    ),
    sizes AS (SELECT cluster_id, COUNT(*) AS n_members FROM cc GROUP BY cluster_id)
    SELECT cluster_id, doc_id, n_members
    FROM cc JOIN sizes USING (cluster_id)
    ORDER BY cluster_id, doc_id
    """,
)
def dedup_cluster_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _doc_corpus(spark, sf_dir)
    edges = exact_dup_pairs(corpus, ordered=False).select(
        F.col("kept_id").alias("doc_a"), F.col("dropped_id").alias("doc_b")
    ).unionAll(
        ngram_jaccard_pairs(corpus, threshold=0.8, max_df=100_000, ordered=False).select(
            "doc_a", "doc_b"
        )
    )
    return cluster.resolve_clusters(edges)


# ---------------------------------------------------------------------------
# BM25 keyword retrieval
# ---------------------------------------------------------------------------

_BM25_TERMS = ("join", "filter", "vector")


@register(
    "bm25_keyword_search",
    f"""
    WITH dl AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks
      WHERE term IN {str(tuple(_BM25_TERMS))}
      GROUP BY doc_id, term
    ),
    dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term)
    SELECT doc_id, COUNT(*) AS n_terms,
           ROUND(SUM(
             ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
             * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
           ), 4) AS score
    FROM tf JOIN dfx USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
    GROUP BY doc_id
    ORDER BY score DESC, doc_id
    LIMIT 10
    """,
)
def bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for a fixed 3-term query over the documents table.

    The reference has no retrieval surface (its queries are aggregate
    reports, `/root/reference/composer/sales_etl_dag.py:60-88`); this is
    part of the beyond-reference training-data toolkit.
    """
    from .operators.retrieval import bm25_topk
    from .sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    return bm25_topk(docs, list(_BM25_TERMS), k=10)


# ---------------------------------------------------------------------------
# Time-series gap-fill + LOCF
# ---------------------------------------------------------------------------
#
# Events are thinned to event_id % 7 == 0 so ~2/3 of the hourly buckets
# are genuinely empty (1241 of 3600 filled at sf0.01) — the spine and the
# carry both do real work. Bounds come from the THINNED stream on both
# sides.


@register(
    "events_gapfill_locf",
    """
    WITH f AS (
      SELECT event_type, ts, value FROM events WHERE event_id % 7 = 0
    ),
    hourly AS (
      SELECT event_type AS key, date_trunc('hour', ts) AS h,
             COUNT(*) AS n,
             CAST(ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
                        / COUNT(*)) AS BIGINT) AS v
      FROM f GROUP BY 1, 2
    ),
    bounds AS (
      SELECT date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM f
    ),
    keys AS (SELECT DISTINCT event_type AS key FROM f),
    spine AS (
      SELECT key, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
      FROM keys CROSS JOIN bounds
    ),
    j AS (
      SELECT s.key, s.h, COALESCE(hourly.n, 0) AS n_events, hourly.v AS v
      FROM spine s
      LEFT JOIN hourly ON hourly.key = s.key AND hourly.h = s.h
    )
    SELECT key, strftime(h, '%Y-%m-%d %H:%M:%S') AS bucket_start, n_events,
           COALESCE(last_value(v IGNORE NULLS) OVER (
             PARTITION BY key ORDER BY h
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             CAST(-1 AS BIGINT)) AS v_filled_cents,
           v IS NULL AS was_gap
    FROM j
    ORDER BY key, bucket_start
    """,
)
def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.timeseries import gapfill_locf

    thinned = _t(spark, sf_dir, "events").filter(F.col("event_id") % 7 == 0)
    out = gapfill_locf(thinned, key_col="event_type", bucket="1 hour", cents_avg=True)
    # Leading gaps (before a key's first bucket) are semantically NULL;
    # the harness emits them as -1 so the oracle channel never carries a
    # nullable numeric (pandas lowers SQL NULL to NaN).
    return out.select(
        "key",
        F.date_format("bucket_start", "yyyy-MM-dd HH:mm:ss").alias("bucket_start"),
        "n_events",
        F.coalesce(F.col("v_filled"), F.lit(-1).cast("long")).alias("v_filled_cents"),
        "was_gap",
    ).orderBy("key", "bucket_start")


# ---------------------------------------------------------------------------
# Stratified deterministic sampling + sketch-based approximate distinct
# ---------------------------------------------------------------------------

_STRATA_RATES = {"A": 0.02, "N": 0.05, "R": 0.10}


@register(
    "sample_stratified",
    f"""
    WITH rates(l_returnflag, thresh) AS (VALUES ('A', 200), ('N', 500), ('R', 1000))
    SELECT l_returnflag, COUNT(*) AS n_sampled,
           ROUND(SUM(l_extendedprice), 2) AS sum_price,
           MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key
    FROM lineitem JOIN rates USING (l_returnflag)
    WHERE {h60_duck("l_orderkey || '#' || l_linenumber")} % 10000 < thresh
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum rates 2%/5%/10% by l_returnflag, identity-hash
    membership (reproducible across engines/partitionings — see
    operators/sampling.py)."""
    from .operators.sampling import stratified_sample

    li = _t(spark, sf_dir, "lineitem")
    sampled = stratified_sample(
        li, "l_returnflag", _STRATA_RATES, "l_orderkey || '#' || l_linenumber"
    )
    return (
        sampled.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
            F.min("l_orderkey").alias("min_key"),
            F.max("l_orderkey").alias("max_key"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "approx_distinct_users",
    """
    SELECT COUNT(DISTINCT user_id) AS exact_users,
           COUNT(*) AS n_events,
           TRUE AS approx_ok
    FROM events
    """,
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct-user count with an honest oracle contract.

    Sketch values are engine-specific (Spark HLL++ vs DuckDB's HLL give
    different estimates for the same data), so the cross-engine gate is:
    the EXACT count matches, and Spark's sketch lands within the
    configured rsd band of it (asserted as a boolean both engines emit).
    At 100 TB the sketch is the operative path — approx_count_distinct
    is a single map-side-combinable aggregate, while exact COUNT(DISTINCT)
    shuffles every distinct key; rsd=0.02 keeps the sketch ~4 KB/group.
    """
    ev = _t(spark, sf_dir, "events")
    agg = ev.agg(
        F.count_distinct(F.col("user_id")).alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("_approx"),
    )
    return agg.select(
        "exact_users",
        "n_events",
        (
            F.abs(F.col("_approx") - F.col("exact_users"))
            <= F.lit(0.05) * F.col("exact_users")
        ).alias("approx_ok"),
    )


# ---------------------------------------------------------------------------
# Bucketed interval/range join
# ---------------------------------------------------------------------------
#
# Intervals are carved from the event stream itself: every event with
# event_id % 499 == 0 anchors a window [ts, ts + (event_id % 3 + 1) hours).
# The join attributes every event (all types) to the windows containing
# it — the "what happened during each incident/campaign" shape.


@register(
    "range_join_bucketed",
    """
    WITH iv AS (
      SELECT event_id AS interval_id, ts AS start,
             ts + INTERVAL 1 HOUR * (event_id % 3 + 1) AS "end"
      FROM events WHERE event_id % 499 = 0
    )
    SELECT iv.interval_id, COUNT(*) AS n_events,
           COUNT(DISTINCT e.user_id) AS n_users,
           CAST(SUM(CAST(ROUND(e.value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
    FROM events e JOIN iv
      ON e.ts >= iv.start AND e.ts < iv."end"
    GROUP BY iv.interval_id
    ORDER BY iv.interval_id
    """,
)
def range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.rangejoin import interval_bucket_join

    ev = _t(spark, sf_dir, "events")
    iv = ev.filter(F.col("event_id") % 499 == 0).select(
        F.col("event_id").alias("interval_id"),
        F.col("ts").alias("start"),
        F.expr("ts + make_interval(0, 0, 0, 0, CAST(event_id % 3 + 1 AS INT), 0, 0)").alias("end"),
    )
    joined = interval_bucket_join(ev, iv, ts_col="ts", bucket_unit="hour")
    return (
        joined.groupBy("interval_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("sum_value_cents"),
        )
        .orderBy("interval_id")
    )


# ---------------------------------------------------------------------------
# k-NN graph over the embedding corpus
# ---------------------------------------------------------------------------


@register(
    "knn_graph_blocked",
    f"""
    WITH c AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    )
    SELECT query_id, rn AS rank, neighbor_id, ROUND(s, 4) AS score FROM (
      SELECT query_id, neighbor_id, s,
             row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rn
      FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i])) AS s
        FROM c a JOIN c b ON a.label = b.label AND a.vec_id <> b.vec_id
      )
    ) WHERE rn <= 3
    ORDER BY query_id, rank
    """,
)
def knn_graph_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.similarity import knn_graph_blocked as knn
    from .sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
    out = knn(emb, 64, k=3, block_col="label")
    return out.withColumn("rank", F.col("rank").cast("bigint"))


# ---------------------------------------------------------------------------
# Conversion attribution (batch twin of the stream-stream join)
# ---------------------------------------------------------------------------


@register(
    "conversion_attribution",
    """
    WITH v AS (
      SELECT user_id, event_id AS view_id, ts AS vts
      FROM events WHERE event_type = 'view'
    ),
    p AS (
      SELECT user_id, event_id AS purchase_id, ts AS pts
      FROM events WHERE event_type = 'purchase'
    )
    SELECT v.user_id AS user_id, view_id, purchase_id,
           CAST(date_diff('second', vts, pts) AS BIGINT) AS lag_seconds
    FROM v JOIN p ON v.user_id = p.user_id
     AND pts >= vts AND pts < vts + INTERVAL 1 HOUR
    ORDER BY v.user_id, view_id, purchase_id
    """,
)
def conversion_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch run of streaming/join_stream.attribute_conversions — the
    SAME builder that runs as a watermarked append-mode stream-stream
    join (parity test in tests/test_streaming.py), oracle-gated here on
    its batch output."""
    from .streaming.join_stream import attribute_conversions

    ev = _t(spark, sf_dir, "events")
    return attribute_conversions(
        ev.filter(F.col("event_type") == "view"),
        ev.filter(F.col("event_type") == "purchase"),
    ).orderBy("user_id", "view_id", "purchase_id")


# ---------------------------------------------------------------------------
# Rolling time-RANGE window (distinct from the rows-frame window family)
# ---------------------------------------------------------------------------


@register(
    "events_rolling_1h",
    """
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           COUNT(*) OVER w AS rolling_n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT)
             AS rolling_sum_cents
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY epoch_us(ts)
      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    ORDER BY user_id, event_id
    """,
)
def events_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 1-hour count/sum — a RANGE frame over event time,
    not a rows frame: the window covers whatever number of events fell in
    the trailing hour. Frames are bounded by ordering on epoch
    MICROSECONDS on both engines (a seconds-granularity ordering would
    disagree with the oracle on sub-second boundary events). Values in
    integer cents (see operators/timeseries.py for the double-rounding
    rationale). One shuffle by user_id; each partition sorts its own
    events — the same layout a 1000-executor run wants."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.count(F.lit(1)).over(w).alias("rolling_n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).over(w).alias("rolling_sum_cents"),
    ).orderBy("user_id", "event_id")


# ---------------------------------------------------------------------------
# CDC-style merge: last-writer-wins upsert without a table format
# ---------------------------------------------------------------------------
#
# Two synthetic update batches against orders (version 1 touches every
# 13th key, version 2 every 26th — so half the v1 keys CONFLICT and v2
# must win). The merge is the relational core of MERGE INTO: union the
# base with all update batches, keep the highest-version row per key.


@register(
    "merge_upsert_last_wins",
    """
    WITH base AS (
      SELECT o_orderkey AS k, o_orderstatus AS status,
             CAST(ROUND(o_totalprice * 100) AS BIGINT) AS price_cents,
             0 AS version
      FROM orders
    ),
    u1 AS (
      SELECT k, 'U1' AS status, price_cents + 10000, 1 FROM base WHERE k % 13 = 0
    ),
    u2 AS (
      SELECT k, 'U2' AS status, price_cents + 20000, 2 FROM base WHERE k % 26 = 0
    ),
    allv AS (
      SELECT * FROM base UNION ALL SELECT * FROM u1 UNION ALL SELECT * FROM u2
    ),
    merged AS (
      SELECT * FROM (
        SELECT k, status, price_cents,
               row_number() OVER (PARTITION BY k ORDER BY version DESC) AS rn
        FROM allv
      ) WHERE rn = 1
    )
    SELECT status, COUNT(*) AS n,
           CAST(SUM(price_cents) AS BIGINT) AS sum_price_cents
    FROM merged GROUP BY status ORDER BY status
    """,
)
def merge_upsert_last_wins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (upsert, last writer wins) as a pure
    DataFrame plan: union base + update batches, one window by key
    ordered by version desc, keep rank 1. At 100 TB this is ONE shuffle
    of base+updates by key — the same cost profile a format-native MERGE
    pays in its join — and it needs no table format. The versioned
    warehouse sink (sinks.py) provides the time-travel half of that
    story; together they bracket what delta-spark would give us (COVERAGE
    documents the skip)."""
    o = _t(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_cents"),
        F.lit(0).alias("version"),
    )
    u1 = base.filter(F.col("k") % 13 == 0).select(
        "k", F.lit("U1").alias("status"),
        (F.col("price_cents") + 10000).alias("price_cents"), F.lit(1).alias("version"),
    )
    u2 = base.filter(F.col("k") % 26 == 0).select(
        "k", F.lit("U2").alias("status"),
        (F.col("price_cents") + 20000).alias("price_cents"), F.lit(2).alias("version"),
    )
    allv = base.unionAll(u1).unionAll(u2)
    w = Window.partitionBy("k").orderBy(F.desc("version"))
    merged = (
        allv.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
    )
    return (
        merged.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("price_cents").alias("sum_price_cents"),
        )
        .orderBy("status")
    )


# ---------------------------------------------------------------------------
# Equal-frequency bucketing (ntile) of documents by length
# ---------------------------------------------------------------------------


@register(
    "doc_length_ntile_buckets",
    """
    WITH t AS (
      SELECT doc_id, n_chars,
             ntile(10) OVER (ORDER BY n_chars, doc_id) AS bucket
      FROM documents
    )
    SELECT bucket, COUNT(*) AS n_docs,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM t GROUP BY bucket ORDER BY bucket
    """,
)
def doc_length_ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency decile bucketing by document length — the
    curriculum/length-bucketed-batching primitive. ntile needs a TOTAL
    order (doc_id tiebreak) to be engine-deterministic. Note the global
    ORDER BY inside the window: a single-partition sort, fine for
    bucket-count ≪ corpus statistics but the 100 TB path is
    approx-quantile cutpoints (a8_stats_aggregates documents the same
    swap) — this query is the exact-semantics baseline."""
    d = _t(spark, sf_dir, "documents")
    t = d.select(
        "doc_id", "n_chars",
        F.ntile(10).over(Window.orderBy("n_chars", "doc_id")).alias("bucket"),
    )
    return (
        t.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# k-NN graph, LSH-candidate variant (the 100 TB spelling)
# ---------------------------------------------------------------------------

from .operators import similarity as _sim  # noqa: E402


@register(
    "knn_graph_lsh",
    f"""
    WITH c AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    vb AS (SELECT vec_id, label, e, {_sim.bucket_duck('e', 64)} AS bkt FROM c),
    cand AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i])) AS s
      FROM vb a JOIN vb b
        ON a.label = b.label AND a.vec_id <> b.vec_id
       AND bit_count(xor(CAST(a.bkt AS BIGINT), CAST(b.bkt AS BIGINT))) <= 1
    )
    SELECT query_id, rn AS rank, neighbor_id, ROUND(s, 4) AS score FROM (
      SELECT query_id, neighbor_id, s,
             row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rn
      FROM cand
    ) WHERE rn <= 3
    ORDER BY query_id, rank
    """,
)
def knn_graph_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
    out = _sim.knn_graph_lsh(emb, 64, k=3)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


# ---------------------------------------------------------------------------
# Semi-structured JSON property extraction over the event stream
# ---------------------------------------------------------------------------


@register(
    "events_props_json",
    """
    SELECT event_type,
           COUNT(*) AS n,
           MIN(CAST(props->>'k' AS BIGINT)) AS min_k,
           MAX(CAST(props->>'k' AS BIGINT)) AS max_k,
           CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(DISTINCT CAST(props->>'k' AS BIGINT)) AS n_distinct_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def events_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON property extraction in the hot path: get_json_object stays
    JVM-side (no UDF) and evaluates map-side during the scan; only the
    extracted bigint rides the aggregation shuffle. At 100 TB prefer
    from_json with an explicit schema once fields stabilize (single parse
    for many fields vs one parse per get_json_object call)."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(k).alias("min_k"),
            F.max(k).alias("max_k"),
            F.sum(k).alias("sum_k"),
            F.count_distinct(k).alias("n_distinct_k"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Ordered-funnel analysis: signup -> view -> purchase
# ---------------------------------------------------------------------------


@register(
    "funnel_signup_view_purchase",
    """
    WITH s AS (
      SELECT user_id, MIN(ts) AS s_ts FROM events
      WHERE event_type = 'signup' GROUP BY user_id
    ),
    v AS (
      SELECT e.user_id, MIN(e.ts) AS v_ts
      FROM events e JOIN s ON e.user_id = s.user_id
      WHERE e.event_type = 'view' AND e.ts >= s.s_ts
      GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= v.v_ts
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM s) AS n_signup,
           (SELECT COUNT(*) FROM v) AS n_view_after_signup,
           (SELECT COUNT(*) FROM p) AS n_purchase_after_view
    """,
)
def funnel_signup_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel: users whose first signup precedes a
    view precedes a purchase. Each stage is one filtered aggregation
    joined to the previous stage's (user, first_ts) — stage tables shrink
    monotonically, so at scale each join is a broadcast of survivors
    against the event scan. The funnel-step predicate (ts >= previous
    stage's first ts) evaluates map-side."""
    ev = _t(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") >= F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    return (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(v.agg(F.count(F.lit(1)).alias("n_view_after_signup")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after_view")))
    )


# ---------------------------------------------------------------------------
# Incremental-batch dedup: a new day's batch vs the existing base corpus
# ---------------------------------------------------------------------------
#
# Batch synthesis (mirrored in the oracle): every 5th base doc
# re-submitted byte-identical (+3M ids), every 9th with its first word
# dropped (+4M, near-dup), every 4th token-REVERSED (+5M — shares ~no
# 3-grams with the base: genuinely new).


@register(
    "dedup_incremental_batch",
    f"""
    WITH batch AS (
      SELECT doc_id + 3000000 AS doc_id, text FROM documents WHERE doc_id % 5 = 0
      UNION ALL
      SELECT doc_id + 4000000, substr(text, strpos(text, ' ') + 1)
      FROM documents WHERE doc_id % 9 = 0
      UNION ALL
      SELECT doc_id + 5000000,
             array_to_string(list_reverse(string_split(text, ' ')), ' ')
      FROM documents WHERE doc_id % 4 = 0
    ),
    exact AS (
      SELECT b.doc_id FROM batch b
      WHERE md5(b.text) IN (SELECT md5(text) FROM documents)
    ),
    tb AS (SELECT doc_id, string_split(text, ' ') AS t FROM batch),
    shb AS (SELECT doc_id AS new_id, {word_ngrams_duck("t", 3)} AS shingles FROM tb),
    tbase AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    shbase AS (SELECT doc_id AS base_id, {word_ngrams_duck("t", 3)} AS shingles FROM tbase),
    gn AS (SELECT new_id, unnest(shingles) AS g FROM shb),
    gb AS (SELECT base_id, unnest(shingles) AS g FROM shbase),
    inter AS (
      SELECT new_id, base_id, COUNT(*) AS i
      FROM gn JOIN gb USING (g) GROUP BY new_id, base_id
    ),
    near AS (
      SELECT DISTINCT new_id AS doc_id FROM (
        SELECT new_id, base_id,
               ROUND(CAST(i AS DOUBLE) /
               (sn.sz + sb2.sz - i), 4) AS jaccard
        FROM inter
        JOIN (SELECT new_id, len(shingles) AS sz FROM shb) sn USING (new_id)
        JOIN (SELECT base_id, len(shingles) AS sz FROM shbase) sb2 USING (base_id)
      ) WHERE jaccard >= 0.8
    )
    SELECT category, COUNT(*) AS n,
           MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
    FROM (
      SELECT b.doc_id,
             CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                  WHEN nr.doc_id IS NOT NULL THEN 'near_dup'
                  ELSE 'new' END AS category
      FROM batch b
      LEFT JOIN exact e ON e.doc_id = b.doc_id
      LEFT JOIN near nr ON nr.doc_id = b.doc_id
    )
    GROUP BY category
    ORDER BY category
    """,
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.incremental import classify_batch
    from .sources.tables import load_table

    base = load_table(spark, sf_dir, "documents", parallelize=True).select(
        "doc_id", "text"
    )
    resub = base.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + 3_000_000).alias("doc_id"), "text"
    )
    near = base.filter(F.col("doc_id") % 9 == 0).select(
        (F.col("doc_id") + 4_000_000).alias("doc_id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
    )
    fresh = base.filter(F.col("doc_id") % 4 == 0).select(
        (F.col("doc_id") + 5_000_000).alias("doc_id"),
        F.array_join(F.reverse(F.split(F.col("text"), " ", -1)), " ").alias("text"),
    )
    batch = resub.unionAll(near).unionAll(fresh)
    out = classify_batch(batch, base, threshold=0.8, max_df=100_000)
    return (
        out.groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("category")
    )


# ---------------------------------------------------------------------------
# PageRank over the kNN graph (fixed-point integer arithmetic)
# ---------------------------------------------------------------------------

_PR_SCALE = 10**12


def _pr_iter_duck(prev: str, k: int) -> str:
    return f"""
    r{k} AS (
      SELECT nd.node,
             CAST((SELECT (15 * {_PR_SCALE}) // (100 * n) FROM nn) +
                  COALESCE(fl.inflow, 0) AS BIGINT) AS rank_fp
      FROM nodes nd LEFT JOIN (
        SELECT e.dst AS node,
               CAST(SUM((85 * p.rank_fp) // (100 * od.od)) AS BIGINT) AS inflow
        FROM edges e
        JOIN {prev} p ON p.node = e.src
        JOIN od ON od.src = e.src
        GROUP BY e.dst) fl ON fl.node = nd.node
    )"""


@register(
    "graph_pagerank_knn",
    f"""
    WITH c AS (
      SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
      FROM embeddings
    ),
    scored AS (
      SELECT a.vec_id AS qa, b.vec_id AS nb,
             list_sum(list_transform(range(1, 65), i -> a.e[i] * b.e[i])) AS s
      FROM c a JOIN c b ON a.label = b.label AND a.vec_id <> b.vec_id
    ),
    edges AS (
      SELECT qa AS src, nb AS dst FROM (
        SELECT qa, nb, row_number() OVER (PARTITION BY qa ORDER BY s DESC, nb) AS rn
        FROM scored
      ) WHERE rn <= 3
    ),
    nodes AS (
      SELECT DISTINCT node FROM (
        SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)
    ),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    od AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
    r0 AS (
      SELECT node, CAST({_PR_SCALE} // n AS BIGINT) AS rank_fp
      FROM nodes CROSS JOIN nn
    ),
    {_pr_iter_duck("r0", 1)},
    {_pr_iter_duck("r1", 2)},
    {_pr_iter_duck("r2", 3)}
    SELECT node, rank_fp FROM r3
    ORDER BY rank_fp DESC, node
    LIMIT 20
    """,
)
def graph_pagerank_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 central vectors of the exact blocked kNN graph by 3-round
    fixed-point PageRank (operators/graphrank.py). Centrality over the
    neighbor graph = prototypicality; the tail end of the same ranking
    is an outlier signal. All arithmetic BIGINT, bit-identical across
    engines."""
    from .operators.graphrank import pagerank_fixed_point
    from .operators.similarity import knn_graph_blocked as knn
    from .sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
    edges = knn(emb, 64, k=3).select(
        F.col("query_id").alias("src"), F.col("neighbor_id").alias("dst")
    )
    ranks = pagerank_fixed_point(edges, iters=3)
    return ranks.orderBy(F.desc("rank_fp"), "node").limit(20)


# ---------------------------------------------------------------------------
# Declarative data-quality constraint report
# ---------------------------------------------------------------------------


@register(
    "dq_constraint_report",
    """
    SELECT constraint_name, checked, violations FROM (
      SELECT 'orders.o_custkey_not_null' AS constraint_name,
             (SELECT COUNT(*) FROM orders) AS checked,
             (SELECT CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
              FROM orders) AS violations
      UNION ALL
      SELECT 'orders.o_orderkey_unique',
             (SELECT COUNT(*) FROM orders),
             (SELECT CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders)
      UNION ALL
      SELECT 'orders.totalprice_positive',
             (SELECT COUNT(*) FROM orders),
             (SELECT CAST(SUM(CASE WHEN o_totalprice > 0 THEN 0 ELSE 1 END) AS BIGINT)
              FROM orders)
      UNION ALL
      SELECT 'orders.o_orderstatus_domain',
             (SELECT COUNT(*) FROM orders),
             (SELECT CAST(SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 0 ELSE 1 END) AS BIGINT)
              FROM orders)
      UNION ALL
      SELECT 'orders.lineitem_orderkey_referential',
             (SELECT COUNT(*) FROM lineitem),
             (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
              LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
                ON l.l_orderkey = o.o_orderkey
              WHERE o.o_orderkey IS NULL)
    )
    ORDER BY constraint_name
    """,
)
def dq_constraint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bulk constraint evaluation (operators/quality_checks.py): all
    single-table checks in ONE aggregation pass + unpivot, referential
    integrity as an anti-join of projected keys. Generalizes the
    reference's three hard-coded post-load checks."""
    from .operators.quality_checks import constraint_report

    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    rep = constraint_report(
        o,
        not_null=["o_custkey"],
        unique=["o_orderkey"],
        predicates={"totalprice_positive": "o_totalprice > 0"},
        domains={"o_orderstatus": ["O", "F", "P"]},
        table="orders",
    )
    ref = constraint_report(
        li,
        referential={"lineitem_orderkey_referential": (o, "l_orderkey", "o_orderkey")},
        table="orders",
    )
    # The referential check is evaluated over lineitem but reported under
    # the orders suite (its checked column counts lineitem rows).
    return rep.unionAll(ref).orderBy("constraint_name")


# ---------------------------------------------------------------------------
# One-pass table profile (unpivoted per-column stats)
# ---------------------------------------------------------------------------


@register(
    "profile_orders_table",
    """
    SELECT column_name, n_null, n_distinct, min_s, max_s FROM (
      SELECT 'o_orderkey' AS column_name,
             CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             COUNT(DISTINCT o_orderkey) AS n_distinct,
             CAST(MIN(o_orderkey) AS VARCHAR) AS min_s,
             CAST(MAX(o_orderkey) AS VARCHAR) AS max_s
      FROM orders
      UNION ALL
      SELECT 'o_custkey',
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(DISTINCT o_custkey),
             CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
      FROM orders
      UNION ALL
      SELECT 'o_orderstatus',
             CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(DISTINCT o_orderstatus),
             MIN(o_orderstatus), MAX(o_orderstatus)
      FROM orders
      UNION ALL
      SELECT 'o_orderpriority',
             CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(DISTINCT o_orderpriority),
             MIN(o_orderpriority), MAX(o_orderpriority)
      FROM orders
      UNION ALL
      SELECT 'o_orderdate',
             CAST(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(DISTINCT o_orderdate),
             strftime(MIN(o_orderdate), '%Y-%m-%d %H:%M:%S'),
             strftime(MAX(o_orderdate), '%Y-%m-%d %H:%M:%S')
      FROM orders
      UNION ALL
      SELECT 'o_totalprice_cents',
             CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(DISTINCT CAST(ROUND(o_totalprice * 100) AS BIGINT)),
             CAST(MIN(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS VARCHAR),
             CAST(MAX(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS VARCHAR)
      FROM orders
    )
    ORDER BY column_name
    """,
)
def profile_orders_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile (null count, distinct count, min/max) in ONE
    aggregation pass + stack() unpivot — the schema-drift/data-audit
    primitive. Doubles profile as integer cents and timestamps as
    formatted strings so min/max stringification is engine-stable."""
    o = _t(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    row = o.agg(
        F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).cast("long").alias("nn0"),
        F.count_distinct("o_orderkey").alias("nd0"),
        F.min("o_orderkey").cast("string").alias("mn0"),
        F.max("o_orderkey").cast("string").alias("mx0"),
        F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).cast("long").alias("nn1"),
        F.count_distinct("o_custkey").alias("nd1"),
        F.min("o_custkey").cast("string").alias("mn1"),
        F.max("o_custkey").cast("string").alias("mx1"),
        F.sum(F.when(F.col("o_orderstatus").isNull(), 1).otherwise(0)).cast("long").alias("nn2"),
        F.count_distinct("o_orderstatus").alias("nd2"),
        F.min("o_orderstatus").alias("mn2"),
        F.max("o_orderstatus").alias("mx2"),
        F.sum(F.when(F.col("o_orderpriority").isNull(), 1).otherwise(0)).cast("long").alias("nn3"),
        F.count_distinct("o_orderpriority").alias("nd3"),
        F.min("o_orderpriority").alias("mn3"),
        F.max("o_orderpriority").alias("mx3"),
        F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)).cast("long").alias("nn4"),
        F.count_distinct("o_orderdate").alias("nd4"),
        F.date_format(F.min("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("mn4"),
        F.date_format(F.max("o_orderdate"), "yyyy-MM-dd HH:mm:ss").alias("mx4"),
        F.sum(F.when(F.col("o_totalprice").isNull(), 1).otherwise(0)).cast("long").alias("nn5"),
        F.count_distinct(cents).alias("nd5"),
        F.min(cents).cast("string").alias("mn5"),
        F.max(cents).cast("string").alias("mx5"),
    )
    cols = [
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_orderpriority", "o_orderdate", "o_totalprice_cents",
    ]
    stack_args = ", ".join(
        f"'{c}', nn{i}, nd{i}, mn{i}, mx{i}" for i, c in enumerate(cols)
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack_args})"
            " AS (column_name, n_null, n_distinct, min_s, max_s)"
        )
    ).orderBy("column_name")


# ---------------------------------------------------------------------------
# Approximate percentiles with an honest tolerance gate
# ---------------------------------------------------------------------------


@register(
    "approx_percentile_gate",
    """
    WITH ranked AS (
      SELECT l_extendedprice AS p,
             row_number() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
             COUNT(*) OVER () AS n
      FROM lineitem
    )
    SELECT
      ROUND(MIN(CASE WHEN rn = (n + 1) // 2 THEN p END), 2) AS exact_p50,
      ROUND(MIN(CASE WHEN rn = (9 * n + 9) // 10 THEN p END), 2) AS exact_p90,
      ROUND(MIN(CASE WHEN rn = (99 * n + 99) // 100 THEN p END), 2) AS exact_p99,
      TRUE AS approx_ok
    FROM ranked
    """,
)
def approx_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact discrete percentiles (rank-pick with INTEGER index
    arithmetic — ceil(p*n) as (p_num*n + p_num) div p_den, no FP-dust
    disagreements) compared across engines, plus a boolean asserting
    Spark's approx_percentile lands within 1% of each. Same contract
    family as approx_distinct_users: the sketch value itself is
    engine-specific; its accuracy bound is what's verified. At 100 TB
    the sketch path is the operative one (single map-side-combinable
    pass vs a global sort)."""
    li = _t(spark, sf_dir, "lineitem")
    w = Window.orderBy("l_extendedprice", "l_orderkey", "l_linenumber")
    ranked = li.select(
        F.col("l_extendedprice").alias("p"),
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("n"),
    )
    exact = ranked.agg(
        F.round(F.min(F.when(F.expr("rn = (n + 1) div 2"), F.col("p"))), 2).alias("exact_p50"),
        F.round(F.min(F.when(F.expr("rn = (9 * n + 9) div 10"), F.col("p"))), 2).alias("exact_p90"),
        F.round(F.min(F.when(F.expr("rn = (99 * n + 99) div 100"), F.col("p"))), 2).alias("exact_p99"),
    )
    approx = li.agg(
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10_000).alias("ap")
    )
    return exact.crossJoin(F.broadcast(approx)).select(
        "exact_p50",
        "exact_p90",
        "exact_p99",
        (
            (F.abs(F.expr("ap[0]") - F.col("exact_p50")) <= 0.01 * F.col("exact_p50"))
            & (F.abs(F.expr("ap[1]") - F.col("exact_p90")) <= 0.01 * F.col("exact_p90"))
            & (F.abs(F.expr("ap[2]") - F.col("exact_p99")) <= 0.01 * F.col("exact_p99"))
        ).alias("approx_ok"),
    )


# ---------------------------------------------------------------------------
# Vocabulary building + OOV coverage
# ---------------------------------------------------------------------------


@register(
    "vocab_coverage_report",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    freq AS (SELECT term, COUNT(*) AS tf FROM toks GROUP BY term),
    vocab AS (
      SELECT term FROM (
        SELECT term, row_number() OVER (ORDER BY tf DESC, term) AS rn FROM freq
      ) WHERE rn <= 16
    ),
    flagged AS (
      SELECT t.doc_id, CASE WHEN v.term IS NOT NULL THEN 1 ELSE 0 END AS in_vocab
      FROM toks t LEFT JOIN vocab v ON v.term = t.term
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS total_tokens,
           CAST(SUM(in_vocab) AS BIGINT) AS covered_tokens,
           CAST(COUNT(*) - SUM(in_vocab) AS BIGINT) AS oov_tokens,
           COUNT(DISTINCT CASE WHEN in_vocab = 0 THEN doc_id END) AS docs_with_oov
    FROM flagged
    """,
)
def vocab_coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K frequency vocabulary (total tiebreak) + corpus coverage/OOV
    accounting — the tokenizer-budget planning primitive. The vocab is a
    TakeOrdered of the term-frequency aggregate (small by construction)
    broadcast back against the token stream; the corpus shuffles once
    for the frequency count and never again. K=16 here so the toy
    vocabulary covers a meaningful but partial token share; a real run
    uses K=2^15..2^17 with identical plan shape."""
    from .sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ", -1)).alias("term")
    )
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("tf"))
    vocab = (
        freq.orderBy(F.desc("tf"), "term").limit(16).select("term")
    )
    flagged = toks.join(
        F.broadcast(vocab.withColumn("_v", F.lit(1))), "term", "left"
    ).select("doc_id", F.coalesce(F.col("_v"), F.lit(0)).alias("in_vocab"))
    return flagged.agg(
        F.count(F.lit(1)).alias("total_tokens"),
        F.sum("in_vocab").cast("bigint").alias("covered_tokens"),
        (F.count(F.lit(1)) - F.sum("in_vocab")).cast("bigint").alias("oov_tokens"),
        F.count_distinct(
            F.when(F.col("in_vocab") == 0, F.col("doc_id"))
        ).alias("docs_with_oov"),
    )


# ---------------------------------------------------------------------------
# Small-file compaction planning
# ---------------------------------------------------------------------------


@register(
    "compact_file_plan",
    """
    WITH files AS (
      SELECT doc_id AS file_id, 1000 + (n_chars % 4000) AS size_b
      FROM documents
    ),
    planned AS (
      SELECT file_id, size_b,
             CAST(COALESCE(SUM(size_b) OVER (ORDER BY file_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // 16000 AS BIGINT) AS out_bucket
      FROM files
    )
    SELECT out_bucket, COUNT(*) AS n_files,
           CAST(SUM(size_b) AS BIGINT) AS bytes,
           MIN(file_id) AS first_file, MAX(file_id) AS last_file
    FROM planned GROUP BY out_bucket
    ORDER BY out_bucket
    """,
)
def compact_file_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction PLANNING: assign input files to ~16 KB
    output groups by cumulative-size-before (floor(cumsum_before /
    target)), so each group's bytes land in [target, target + max_file).
    The real 100 TB concern this models: a warehouse partition with
    millions of KB-files needs deterministic group assignment BEFORE the
    copy jobs run; the assignment is one running-sum window over the
    (file, size) listing — metadata-scale, not data-scale. File sizes
    here derive deterministically from documents so the oracle can
    replan them bit-for-bit."""
    from .sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    files = docs.select(
        F.col("doc_id").alias("file_id"),
        (F.lit(1000) + F.col("n_chars") % 4000).alias("size_b"),
    )
    w = Window.orderBy("file_id").rowsBetween(Window.unboundedPreceding, -1)
    planned = files.select(
        "file_id",
        "size_b",
        (F.coalesce(F.sum("size_b").over(w), F.lit(0)) / F.lit(16000))
        .cast("long")
        .alias("out_bucket"),
    )
    return (
        planned.groupBy("out_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("size_b").cast("bigint").alias("bytes"),
            F.min("file_id").alias("first_file"),
            F.max("file_id").alias("last_file"),
        )
        .orderBy("out_bucket")
    )


# ---------------------------------------------------------------------------
# Semantic dedup end-to-end: cosine pairs -> clusters -> survivors
# ---------------------------------------------------------------------------

from .harness_corpus import _VEC_CORPUS_DUCK, _vec_corpus  # noqa: E402
from .operators import dedup as _dedup  # noqa: E402


@register(
    "semantic_dedup_survivors",
    f"""
    WITH RECURSIVE {_VEC_CORPUS_DUCK},
    vb AS (SELECT vec_id, label, e, {_sim.bucket_duck('e', 64)} AS bkt FROM vcorpus),
    pairs AS (
      SELECT id_a, id_b FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               ROUND(list_sum(list_transform(range(1, 65),
                     i -> a.e[i] * b.e[i])), 4) AS cos
        FROM vb a JOIN vb b
          ON a.label = b.label AND a.vec_id < b.vec_id
         AND bit_count(xor(CAST(a.bkt AS BIGINT), CAST(b.bkt AS BIGINT))) <= 1
      ) WHERE cos >= 0.99
    ),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b, id_a FROM pairs
    ),
    reach(node, r) AS (
      SELECT src, dst FROM edges
      UNION
      SELECT reach.node, e2.dst FROM reach JOIN edges e2 ON e2.src = reach.r
    ),
    cc AS (
      SELECT node AS vec_id, LEAST(node, MIN(r)) AS cluster_id
      FROM reach GROUP BY node
    ),
    sizes AS (SELECT cluster_id, COUNT(*) AS n_members FROM cc GROUP BY cluster_id)
    SELECT cluster_id, vec_id, n_members,
           vec_id = cluster_id AS is_survivor
    FROM cc JOIN sizes USING (cluster_id)
    ORDER BY cluster_id, vec_id
    """,
)
def semantic_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDedup end-to-end: embedding-cosine near-dup pairs (label blocks
    + sign-LSH sub-buckets) closed into clusters by connected components;
    the min-id member survives, the rest drop. The composition the
    modern semantic-dedup recipe needs, with every stage individually
    oracled elsewhere (dedup_embedding_cosine, dedup_cluster_resolve)."""
    pairs = _dedup.embedding_cosine_pairs(_vec_corpus(spark, sf_dir), 64, 0.99)
    cc = cluster.resolve_clusters(
        pairs.select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
    )
    return cc.select(
        "cluster_id",
        F.col("doc_id").alias("vec_id"),
        "n_members",
        (F.col("doc_id") == F.col("cluster_id")).alias("is_survivor"),
    ).orderBy("cluster_id", "vec_id")


# ---------------------------------------------------------------------------
# Cohort retention (weekly offsets)
# ---------------------------------------------------------------------------


@register(
    "cohort_retention_weekly",
    """
    WITH activity AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    cohort AS (
      SELECT user_id, MIN(d) AS c FROM activity GROUP BY user_id
    ),
    offsets AS (
      SELECT cohort.user_id, c, date_diff('day', c, d) AS off
      FROM activity JOIN cohort ON activity.user_id = cohort.user_id
    )
    SELECT strftime(c, '%Y-%m-%d') AS cohort_date, off AS day_offset,
           COUNT(DISTINCT user_id) AS n_active
    FROM offsets
    WHERE off IN (0, 7, 14, 21, 28)
    GROUP BY c, off
    ORDER BY cohort_date, day_offset
    """,
)
def cohort_retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention: users grouped by first-activity date,
    counted again at weekly offsets. Two aggregations (distinct activity
    days; per-user cohort) and one join — the cohort table is per-user
    (small relative to events) and broadcastable at scale; offsets
    evaluate map-side."""
    ev = _t(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("d").alias("c"))
    offsets = activity.join(cohort, "user_id").select(
        "user_id", "c", F.datediff("d", "c").alias("day_offset")
    )
    return (
        offsets.filter(F.col("day_offset").isin([0, 7, 14, 21, 28]))
        .groupBy(
            F.date_format("c", "yyyy-MM-dd").alias("cohort_date"), "day_offset"
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
        .withColumn("day_offset", F.col("day_offset").cast("long"))
        .orderBy("cohort_date", "day_offset")
    )


# ---------------------------------------------------------------------------
# Small-file compaction EXECUTION (round 6 — compact_file_plan only plans)
# ---------------------------------------------------------------------------


@register(
    "compact_execute_verify",
    """
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           COUNT(DISTINCT doc_id) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           TRUE AS files_reduced
    FROM documents
    """,
)
def compact_execute_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Execute the compaction the planner only plans: materialize
    `documents` as MANY small parquet files (repartition 64), rewrite
    with operators.compaction.compact_execute (one distributed job, one
    output file per cumulative-size group), then RE-READ the compacted
    copy and aggregate. Matching the oracle — which aggregates the source
    table directly — proves the re-layout moved every row unchanged;
    ``files_reduced`` is computed from the actual before/after file
    counts, so a compaction that failed to reduce files mismatches the
    oracle's TRUE. The 1-row result is collected eagerly and the temp
    fixture deleted (same discipline as etl_roundtrip_sinks)."""
    import shutil
    import tempfile

    from .operators.compaction import compact_execute, read_compacted
    from .sources.tables import load_table

    base = tempfile.mkdtemp(prefix="compact_exec_")
    try:
        src = base + "/small_files"
        dst = base + "/compacted"
        load_table(spark, sf_dir, "documents").repartition(64).write.mode(
            "overwrite"
        ).parquet(src)
        stats = compact_execute(spark, src, dst, target_bytes=1 << 20)
        agg = read_compacted(spark, dst).agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
            F.lit(stats["files_after"] < stats["files_before"]).alias(
                "files_reduced"
            ),
        )
        rows = agg.collect()
        return spark.createDataFrame(rows, agg.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)
