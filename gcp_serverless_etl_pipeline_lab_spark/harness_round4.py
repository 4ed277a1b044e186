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
               CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) AS jaccard
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
