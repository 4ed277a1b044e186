"""Lexical retrieval: BM25 top-k keyword search over a document corpus.

The inverted-index complement to the embedding ANN operators
(`operators/similarity.py`) — a training-data pipeline uses both: lexical
search for targeted corpus probes (contamination hunts, boilerplate
audits), ANN for semantic ones.

Plan shape (all built-in expressions, zero UDFs, zero collects):

- document length comes from ``size(split(text))`` — a map-side
  projection, NOT an explode+groupBy (no shuffle for the length pass);
- term frequencies explode tokens but filter to the query terms FIRST —
  the filter sits directly on the generator output, so only matching
  tokens reach the (doc, term) aggregation. With q query terms the
  shuffle carries at most q rows per document, independent of document
  length;
- document frequency is a count-window OVER the tf table (partition by
  term), not a separate aggregate joined back — the join spelling made
  Catalyst recompute the whole explode pipeline a second time for the
  df branch (two Generate passes in the physical plan; the window
  spelling has one). The window's shuffle moves ≤ q rows per doc;
- corpus size and average length are one tiny aggregate, broadcast into
  the scoring join;
- top-k is a TakeOrdered on (score desc, doc_id) — no global sort.

At 100 TB none of this shuffles the corpus: the only corpus-wide work is
the token scan itself; everything aggregated is per-(doc,term) for terms
the query names.

Determinism: scores are ROUND(..., 4)-ed BEFORE ranking so both engines
rank identical values (double Σ of ln/div terms can differ in the last
ulp between engines with different reduction order).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    match_all_terms: bool = False,
) -> DataFrame:
    """Top-``k`` documents by BM25 over whitespace tokens.

    Returns (doc_id, n_terms, score): ``n_terms`` = distinct query terms
    the doc matched, ``score`` = BM25 with the +1 idf smoothing
    (ln(1 + (N - df + 0.5)/(df + 0.5))), rounded to 4 decimals.

    ``match_all_terms`` (round 13): conjunctive (AND) semantics — only
    docs matching EVERY distinct query term rank; scores are unchanged
    (same per-term sums), the candidate set narrows BEFORE top-k so the
    result fills to ``k`` from conjunctive matches. Default stays the
    standard BM25 OR semantics.
    """
    dl = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.split(F.col(text_col), " ", -1)).alias("dl"),
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), " ", -1)).alias("term"),
    )
    tf = (
        toks.filter(F.col("term").isin(list(terms)))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    tfdf = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term"))
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    norm = F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    out = (
        tfdf.join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.round(F.sum(idf * norm), 4).alias("score"),
        )
    )
    if match_all_terms:
        # n_terms counts DISTINCT matched query terms (tf rows are
        # per (doc, term)), so the conjunctive gate is one filter
        out = out.filter(F.col("n_terms") == len(set(terms)))
    return out.orderBy(F.col("score").desc(), F.col("doc_id")).limit(k)


def hybrid_topk_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    terms: list[str],
    query_id: int,
    dim: int,
    k: int = 10,
    depth: int = 50,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Hybrid retrieval: BM25 keyword ranking fused with embedding-cosine
    ranking by Reciprocal Rank Fusion (Cormack et al., SIGIR'09) — the
    standard RAG retrieval shape, where lexical search catches exact
    terminology the embedding smooths away and the embedding catches
    paraphrases the keywords miss.

    Both legs rank to ``depth``; RRF(doc) = Σ_legs 1/(rrf_k + rank),
    missing legs contributing 0. The fused score is two correctly-rounded
    divisions and one addition in a FIXED order, so an independent engine
    recomputing from the same ranks lands bit-identically (the same
    discipline as the dyadic mixture thresholds). Plan shape: the BM25
    leg is bm25_topk (corpus shuffles at most |terms| rows per doc); the
    vector leg broadcasts the single query vector and TakeOrders the dot
    products (no corpus shuffle); the fusion is a ``depth``-row full
    outer join — at 100 TB the fusion cost is independent of corpus size.

    The query document itself (``query_id``) is excluded from the vector
    leg (self-match carries no information) but may appear in the
    lexical leg — keyword queries are not document-relative.

    Returns (doc_id, bm25_rank, ann_rank, rrf_score) — top ``k`` by
    (rrf_score desc, doc_id); absent-leg ranks are NULL."""
    from .similarity import _dot

    w_lex = Window.orderBy(F.col("score").desc(), F.col("doc_id"))
    lex = (
        bm25_topk(docs, terms, k=depth, id_col=id_col, text_col=text_col)
        .withColumn("bm25_rank", F.row_number().over(w_lex))
        .select("doc_id", "bm25_rank")
    )
    q = embeddings.filter(F.col(vec_id_col) == query_id).select(
        F.col(vec_col).alias("qe")
    )
    w_vec = Window.orderBy(F.col("s").desc(), F.col("doc_id"))
    vec = (
        embeddings.filter(F.col(vec_id_col) != query_id)
        .crossJoin(F.broadcast(q))
        .select(
            F.col(vec_id_col).alias("doc_id"),
            F.round(_dot("qe", vec_col, dim), 4).alias("s"),
        )
        .orderBy(F.col("s").desc(), F.col("doc_id"))
        .limit(depth)
        .withColumn("ann_rank", F.row_number().over(w_vec))
        .select("doc_id", "ann_rank")
    )
    rrf = F.round(
        F.coalesce(1.0 / (F.lit(rrf_k) + F.col("bm25_rank")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("ann_rank")), F.lit(0.0)),
        6,
    )
    return (
        lex.join(vec, "doc_id", "full_outer")
        .select("doc_id", "bm25_rank", "ann_rank", rrf.alias("rrf_score"))
        .orderBy(F.col("rrf_score").desc(), F.col("doc_id"))
        .limit(k)
    )
