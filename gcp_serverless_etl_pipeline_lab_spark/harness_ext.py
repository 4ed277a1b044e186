"""Training-data-pipeline extension queries (harness registrations).

Covers the four extension families on top of the reference-parity surface:
deduplication (exact / n-gram Jaccard / MinHash-LSH / SimHash / embedding
cosine), similarity search (brute-force / IVF-cell / sign-LSH), text
analysis (token stats / language-ID / quality score / fingerprinting), and
multimodal binary-column plumbing (feature extract / frame sampling via
Arrow-batched mapInPandas).

Duplicate documents are SYNTHESIZED deterministically (the shared tables
contain none): every 7th doc gets an exact copy (+1_000_000 id) and every
11th a near-copy with the first word dropped (+2_000_000 id); every 13th
embedding gets a perturbed renormalized copy (+1_000_000 id). The DuckDB
oracle rebuilds the identical corpus, so detector output is verified
value-for-value — including the 60-bit MD5 hash primitive
(functions.hashing) that makes MinHash/SimHash/LSH reproducible across
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.hashing import h60_duck, h60_sql
from .functions.text import word_ngrams_duck
from .harness import _t, register
from .operators import dedup, multimodal, similarity

# ---------------------------------------------------------------------------
# Corpus synthesis (Spark + DuckDB twins)
# ---------------------------------------------------------------------------


# Shared with harness_round4 — see harness_corpus.py for the corpus
# synthesis contract (exact copies every 7th doc, near copies every 11th).
from .harness_corpus import (  # noqa: E402,F401
    EMB_DIM,
    _DOC_CORPUS_DUCK,
    _VEC_CORPUS_DUCK,
    _doc_corpus,
    _vec_corpus,
)


_TOKS_DUCK = "string_split(text, ' ')"
_SHINGLES_DUCK = word_ngrams_duck("t", 3)


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    f"""
    WITH {_DOC_CORPUS_DUCK},
    keyed AS (SELECT doc_id, md5(text) AS k FROM corpus),
    kept AS (SELECT k, MIN(doc_id) AS kept_id FROM keyed GROUP BY k)
    SELECT kept_id, doc_id AS dropped_id
    FROM keyed JOIN kept USING (k)
    WHERE doc_id <> kept_id
    ORDER BY kept_id, dropped_id
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dup_pairs(_doc_corpus(spark, sf_dir))


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH {_DOC_CORPUS_DUCK},
    toks AS (SELECT doc_id, {_TOKS_DUCK} AS t FROM corpus),
    sh AS (SELECT doc_id, {_SHINGLES_DUCK} AS shingles FROM toks),
    grams AS (SELECT doc_id, unnest(shingles) AS g FROM sh),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT doc_a, doc_b,
             ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 4) AS jaccard
      FROM inter
      JOIN (SELECT doc_id, len(shingles) AS sz FROM sh) sa ON sa.doc_id = doc_a
      JOIN (SELECT doc_id, len(shingles) AS sz FROM sh) sb ON sb.doc_id = doc_b
    ) WHERE jaccard >= 0.8
    ORDER BY doc_a, doc_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_df is the cluster-melt guard (see dedup.cap_document_frequency).
    # 100_000 exceeds the corpus size at every test SF, so the cap is a
    # provable no-op here and the exact-Jaccard oracle is unchanged; at
    # real scale pick ~1e4 (df above that carries no near-dup signal).
    return dedup.ngram_jaccard_pairs(
        _doc_corpus(spark, sf_dir), threshold=0.8, max_df=100_000
    )


_MH_BAND_HASH = h60_duck(
    "CAST(mh[b*4+1] AS VARCHAR) || ',' || CAST(mh[b*4+2] AS VARCHAR) || ',' || "
    "CAST(mh[b*4+3] AS VARCHAR) || ',' || CAST(mh[b*4+4] AS VARCHAR)"
)
_MH_P = dedup.MINHASH_PRIME
_MH_SIG_LIST = ", ".join(
    f"list_min(list_transform(hv, h -> ({a} * h + {b}) % {_MH_P}))"
    for a, b in dedup.minhash_params(16)
)


@register(
    "dedup_minhash_lsh",
    f"""
    WITH {_DOC_CORPUS_DUCK},
    toks AS (SELECT doc_id, {_TOKS_DUCK} AS t FROM corpus),
    sh AS (SELECT doc_id, {_SHINGLES_DUCK} AS shingles FROM toks),
    hs AS (
      SELECT doc_id, shingles,
             list_transform(shingles, g -> {h60_duck('g')} % {_MH_P}) AS hv
      FROM sh
    ),
    sig AS (
      SELECT doc_id, shingles, [{_MH_SIG_LIST}] AS mh
      FROM hs
    ),
    bands AS (SELECT doc_id, mh, unnest(range(0, 4)) AS b FROM sig),
    keyed AS (SELECT doc_id, b, {_MH_BAND_HASH} AS bk FROM bands),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b
      FROM keyed a JOIN keyed b2
        ON a.b = b2.b AND a.bk = b2.bk AND a.doc_id < b2.doc_id
    )
    SELECT doc_a, doc_b, jaccard FROM (
      SELECT doc_a, doc_b,
             ROUND(CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE) /
                   (len(x.shingles) + len(y.shingles)
                    - len(list_intersect(x.shingles, y.shingles))), 4) AS jaccard
      FROM cand JOIN sh x ON x.doc_id = doc_a JOIN sh y ON y.doc_id = doc_b
    ) WHERE jaccard >= 0.8
    ORDER BY doc_a, doc_b
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(_doc_corpus(spark, sf_dir))


_SIMHASH_TOKEN_HASH = h60_duck("g")


@register(
    "dedup_simhash",
    f"""
    WITH {_DOC_CORPUS_DUCK},
    toks AS (SELECT doc_id, {_TOKS_DUCK} AS t FROM corpus),
    bi AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, CASE WHEN len(t) >= 2 THEN len(t) ELSE 1 END),
               i -> t[i] || ' ' || t[i + 1])) AS grams
      FROM toks
    ),
    th AS (SELECT doc_id, list_transform(grams, g -> {_SIMHASH_TOKEN_HASH}) AS hs
           FROM bi WHERE len(grams) > 0),
    sig AS (
      SELECT doc_id,
             list_sum(list_transform(range(0, 60), b ->
               CASE WHEN list_sum(list_transform(hs, h ->
                      CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END)) >= 0
                    THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END)) AS sh
      FROM th
    ),
    keyed AS (
      SELECT doc_id, sh, j, (sh >> (j * 10)) & 1023 AS ck
      FROM (SELECT doc_id, sh, unnest(range(0, 6)) AS j FROM sig)
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, a.sh AS sha, b.doc_id AS doc_b, b.sh AS shb
      FROM keyed a JOIN keyed b
        ON a.j = b.j AND a.ck = b.ck AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, CAST(bit_count(xor(sha, shb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(sha, shb)) <= 5
    ORDER BY doc_a, doc_b
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = dedup.simhash_pairs(_doc_corpus(spark, sf_dir))
    return out.withColumn("hamming", F.col("hamming").cast("bigint"))


# moved to operators/similarity.bucket_duck so harness_round4 can share it
_bucket_duck = similarity.bucket_duck


@register(
    "dedup_embedding_cosine",
    # The engine sub-buckets each label block by deterministic sign-LSH and
    # probes hamming <= 1 (dedup.cosine_candidate_pairs); the oracle mirrors
    # that candidate predicate exactly — same pattern as minhash banding.
    f"""
    WITH {_VEC_CORPUS_DUCK},
    vb AS (SELECT vec_id, label, e, {_bucket_duck('e', EMB_DIM)} AS bkt FROM vcorpus),
    pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             ROUND(list_sum(list_transform(range(1, {EMB_DIM + 1}),
                   i -> a.e[i] * b.e[i])), 4) AS cos
      FROM vb a JOIN vb b
        ON a.label = b.label AND a.vec_id < b.vec_id
       AND bit_count(xor(CAST(a.bkt AS BIGINT), CAST(b.bkt AS BIGINT))) <= 1
    )
    SELECT id_a, id_b, cos FROM pairs WHERE cos >= 0.99
    ORDER BY id_a, id_b
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.embedding_cosine_pairs(_vec_corpus(spark, sf_dir), EMB_DIM, 0.99)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

_SIM_BASE_DUCK = """
c AS (
  SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
  FROM embeddings
),
q AS (SELECT vec_id AS query_id, label AS qlabel, e AS qe FROM c WHERE vec_id < 10)
"""


def _sim_rank_duck(scored_cte: str) -> str:
    return f"""
    SELECT query_id, rn AS rank, neighbor_id, ROUND(s, 4) AS score FROM (
      SELECT query_id, neighbor_id, s,
             row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rn
      FROM ({scored_cte})
    ) WHERE rn <= 5
    ORDER BY query_id, rank
    """


def _sim_queries(spark: SparkSession, sf_dir: str):
    from .sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
    return emb, emb.filter(F.col("vec_id") < 10)


@register(
    "sim_search_bruteforce",
    f"""
    WITH {_SIM_BASE_DUCK}
    {_sim_rank_duck(f'''
      SELECT q.query_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, {EMB_DIM + 1}), i -> qe[i] * c.e[i])) AS s
      FROM c, q WHERE c.vec_id <> q.query_id
    ''')}
    """,
)
def sim_search_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, queries = _sim_queries(spark, sf_dir)
    out = similarity.brute_force_topk(corpus, queries, EMB_DIM)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


@register(
    "sim_search_bruteforce_int8",
    # oracle mirrors the symmetric max-abs int8 quantization bit-for-bit:
    # qs = greatest(max|x|, 1e-30), q_i = round(x/qs*127)::tinyint, score
    # = sum (q_i*qs/127)*y_i in index order (operators/quantize.py).
    f"""
    WITH {_SIM_BASE_DUCK},
    cs AS (
      SELECT vec_id, e,
             GREATEST(list_max(list_transform(e, x -> abs(x))), 1e-30) AS qs
      FROM c
    ),
    cq AS (
      SELECT vec_id, qs,
             list_transform(e, x -> CAST(ROUND(x / qs * 127) AS TINYINT)) AS q8
      FROM cs
    )
    {_sim_rank_duck(f'''
      SELECT q.query_id, cq.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, {EMB_DIM + 1}),
               i -> (CAST(q8[i] AS DOUBLE) * qs / 127.0) * qe[i])) AS s
      FROM cq, q WHERE cq.vec_id <> q.query_id
    ''')}
    """,
)
def sim_search_bruteforce_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.quantize import brute_force_topk_int8

    corpus, queries = _sim_queries(spark, sf_dir)
    out = brute_force_topk_int8(corpus, queries, EMB_DIM)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


@register(
    "sim_search_ivf_label",
    f"""
    WITH {_SIM_BASE_DUCK}
    {_sim_rank_duck(f'''
      SELECT q.query_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, {EMB_DIM + 1}), i -> qe[i] * c.e[i])) AS s
      FROM c JOIN q ON c.label = q.qlabel AND c.vec_id <> q.query_id
    ''')}
    """,
)
def sim_search_ivf_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, queries = _sim_queries(spark, sf_dir)
    out = similarity.ivf_topk(corpus, queries, EMB_DIM)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


# --- trained IVF oracle: the DuckDB twin re-derives the identical k-means
# model (deterministic init, 2 Lloyd iterations, ROUND(avg, 6) centroids,
# dist-then-cell tie-break) — see similarity.kmeans_centroids for why the
# rounding makes the model bit-reproducible across engines.

_IVF_K = 8
_IVF_NPROBE = 2


def _ivf_dist_duck(vec: str, cent: str) -> str:
    return (
        f"list_sum(list_transform(range(1, {EMB_DIM + 1}), "
        f"j -> ({cent}[j] - {vec}[j]) * ({cent}[j] - {vec}[j])))"
    )


def _ivf_iter_duck(prev_cent: str, n: int) -> str:
    return f"""
    d{n} AS (
      SELECT c.vec_id, c.e, i.cell, {_ivf_dist_duck('c.e', 'i.ce')} AS dist
      FROM c CROSS JOIN {prev_cent} i
    ),
    a{n} AS (
      SELECT vec_id, e, cell FROM (
        SELECT vec_id, e, cell,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cell) AS rn
        FROM d{n}) WHERE rn = 1
    ),
    cent{n} AS (
      SELECT cell, list(v ORDER BY j) AS ce FROM (
        SELECT cell, j, ROUND(AVG(e[j]), 6) AS v
        FROM a{n}, range(1, {EMB_DIM + 1}) t(j)
        GROUP BY cell, j) GROUP BY cell
    )"""


@register(
    "sim_search_ivf_trained",
    f"""
    WITH {_SIM_BASE_DUCK},
    init AS (
      SELECT cell, e AS ce FROM (
        SELECT vec_id % {_IVF_K} AS cell, e,
               row_number() OVER (PARTITION BY vec_id % {_IVF_K} ORDER BY vec_id) AS rn
        FROM c) WHERE rn = 1
    ),
    {_ivf_iter_duck('init', 1)},
    {_ivf_iter_duck('cent1', 2)},
    fa AS (
      SELECT vec_id, e, cell FROM (
        SELECT c.vec_id, c.e, i.cell, {_ivf_dist_duck('c.e', 'i.ce')} AS dist,
               row_number() OVER (PARTITION BY c.vec_id
                                  ORDER BY {_ivf_dist_duck('c.e', 'i.ce')}, i.cell) AS rn
        FROM c CROSS JOIN cent2 i) WHERE rn = 1
    ),
    qp AS (
      SELECT query_id, qe, cell FROM (
        SELECT q.query_id, q.qe, i.cell,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {_ivf_dist_duck('q.qe', 'i.ce')}, i.cell) AS rn
        FROM q CROSS JOIN cent2 i) WHERE rn <= {_IVF_NPROBE}
    )
    {_sim_rank_duck(f'''
      SELECT qp.query_id, fa.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, {EMB_DIM + 1}), i -> qp.qe[i] * fa.e[i])) AS s
      FROM fa JOIN qp ON fa.cell = qp.cell AND fa.vec_id <> qp.query_id
    ''')}
    """,
)
def sim_search_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, queries = _sim_queries(spark, sf_dir)
    # sample_rate=1.0 pins the full-corpus-trained model the DuckDB
    # oracle re-derives in SQL (the operator's default is the scale-safe
    # 0.1 hash-Bernoulli sample)
    out = similarity.ivf_trained_topk(
        corpus,
        queries,
        EMB_DIM,
        cells=_IVF_K,
        iters=2,
        nprobe=_IVF_NPROBE,
        sample_rate=1.0,
    )
    return out.withColumn("rank", F.col("rank").cast("bigint"))


@register(
    "sim_search_lsh_bucketed",
    f"""
    WITH {_SIM_BASE_DUCK},
    cb AS (SELECT vec_id, e, {_bucket_duck('e', EMB_DIM)} AS bucket FROM c),
    qb AS (SELECT query_id, qe, {_bucket_duck('qe', EMB_DIM)} AS bucket FROM q)
    {_sim_rank_duck(f'''
      SELECT qb.query_id, cb.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, {EMB_DIM + 1}), i -> qb.qe[i] * cb.e[i])) AS s
      FROM cb JOIN qb ON cb.bucket = qb.bucket AND cb.vec_id <> qb.query_id
    ''')}
    """,
)
def sim_search_lsh_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, queries = _sim_queries(spark, sf_dir)
    out = similarity.lsh_topk(corpus, queries, EMB_DIM)
    return out.withColumn("rank", F.col("rank").cast("bigint"))


_MT_TABLES = 8
_MT_PLANES = 2  # narrow tables: this corpus's true top-k are FAR (scores
# ~0.3, θ/π ≈ 0.4); per-neighbor recall = 1 - (1 - 0.6^P)^L needs small P
# here. Near-dup corpora would use P=8-16 (see lsh_topk_multitable).


def _bucket_duck_table(vec: str, dim: int, table: int, planes: int) -> str:
    bits = []
    for h in range(planes):
        w = h60_duck(
            f"'mlsh|' || '{table}' || '|' || '{h}' || '|' || CAST(i AS VARCHAR)"
        )
        proj = (
            f"list_sum(list_transform(range(1, {dim + 1}), i -> "
            f"CAST(({w}) % {similarity.PLANE_MOD} - {similarity.PLANE_SHIFT} AS DOUBLE)"
            f" * {vec}[i]))"
        )
        bits.append(f"CASE WHEN {proj} >= 0 THEN {1 << h} ELSE 0 END")
    return " + ".join(bits)


_MT_CB = ", ".join(
    f"{_bucket_duck_table('e', EMB_DIM, t, _MT_PLANES)} AS b{t}"
    for t in range(_MT_TABLES)
)
_MT_QB = ", ".join(
    f"{_bucket_duck_table('qe', EMB_DIM, t, _MT_PLANES)} AS b{t}"
    for t in range(_MT_TABLES)
)
_MT_ANY = " OR ".join(f"cb.b{t} = qb.b{t}" for t in range(_MT_TABLES))


@register(
    "sim_search_lsh_multitable",
    # candidate iff the pair shares a bucket in ANY of the L tables — the
    # oracle mirrors the engine's deterministic multi-table predicate.
    f"""
    WITH {_SIM_BASE_DUCK},
    cb AS (SELECT vec_id, e, {_MT_CB} FROM c),
    qb AS (SELECT query_id, qe, {_MT_QB} FROM q)
    {_sim_rank_duck(f'''
      SELECT qb.query_id, cb.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, {EMB_DIM + 1}), i -> qb.qe[i] * cb.e[i])) AS s
      FROM cb JOIN qb ON ({_MT_ANY}) AND cb.vec_id <> qb.query_id
    ''')}
    """,
)
def sim_search_lsh_multitable(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, queries = _sim_queries(spark, sf_dir)
    out = similarity.lsh_topk_multitable(
        corpus, queries, EMB_DIM, tables=_MT_TABLES, planes_per_table=_MT_PLANES
    )
    return out.withColumn("rank", F.col("rank").cast("bigint"))


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "text_token_stats",
    """
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
           CAST(SUM(len(regexp_extract_all(text, '[a-z]+|[0-9]+'))) AS BIGINT)
               AS sum_alpha_tokens,
           ROUND(AVG(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                     / len(string_split(text, ' '))), 4) AS avg_distinct_ratio
    FROM documents GROUP BY lang ORDER BY lang
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = F.expr("split(text, ' ', -1)")
    return (
        d.select(
            "lang",
            F.size(toks).alias("nt"),
            F.size(F.expr("regexp_extract_all(text, '[a-z]+|[0-9]+', 0)")).alias("na"),
            F.size(F.array_distinct(toks)).alias("nd"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("sum_tokens"),
            F.sum("na").alias("sum_alpha_tokens"),
            F.round(F.avg(F.col("nd").cast("double") / F.col("nt")), 4).alias(
                "avg_distinct_ratio"
            ),
        )
        .orderBy("lang")
    )


_MARKERS_DUCK = {
    "en": "['the', 'a', 'of', 'and', 'to']",
    "de": "['der', 'die', 'das', 'und', 'ist']",
    "es": "['el', 'la', 'de', 'y', 'es']",
    "fr": "['le', 'la', 'et', 'de', 'est']",
}


@register(
    "text_lang_id",
    f"""
    WITH scored AS (
      SELECT lang,
             len(list_intersect(list_distinct(string_split(text, ' ')), {_MARKERS_DUCK['en']})) AS s_en,
             len(list_intersect(list_distinct(string_split(text, ' ')), {_MARKERS_DUCK['de']})) AS s_de,
             len(list_intersect(list_distinct(string_split(text, ' ')), {_MARKERS_DUCK['es']})) AS s_es,
             len(list_intersect(list_distinct(string_split(text, ' ')), {_MARKERS_DUCK['fr']})) AS s_fr
      FROM documents
    ),
    pred AS (
      SELECT lang,
             CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
                  WHEN s_de > 0 AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                  WHEN s_es > 0 AND s_es >= s_fr THEN 'es'
                  WHEN s_fr > 0 THEN 'fr'
                  ELSE 'und' END AS predicted
      FROM scored
    )
    SELECT lang, predicted, COUNT(*) AS n FROM pred
    GROUP BY lang, predicted ORDER BY lang, predicted
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = F.array_distinct(F.expr("split(text, ' ', -1)"))
    scores = {
        name: F.size(
            F.array_intersect(toks, F.array(*[F.lit(m) for m in markers]))
        ).alias(f"s_{name}")
        for name, markers in (
            ("en", ("the", "a", "of", "and", "to")),
            ("de", ("der", "die", "das", "und", "ist")),
            ("es", ("el", "la", "de", "y", "es")),
            ("fr", ("le", "la", "et", "de", "est")),
        )
    }
    scored = d.select("lang", *scores.values())
    predicted = (
        F.when(
            (F.col("s_en") > 0)
            & (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_fr")),
            "en",
        )
        .when(
            (F.col("s_de") > 0)
            & (F.col("s_de") >= F.col("s_es"))
            & (F.col("s_de") >= F.col("s_fr")),
            "de",
        )
        .when((F.col("s_es") > 0) & (F.col("s_es") >= F.col("s_fr")), "es")
        .when(F.col("s_fr") > 0, "fr")
        .otherwise("und")
    )
    return (
        scored.select("lang", predicted.alias("predicted"))
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "predicted")
    )


@register(
    "text_quality_score",
    """
    WITH feat AS (
      SELECT len(string_split(text, ' ')) AS nt,
             len(list_distinct(string_split(text, ' '))) AS nd,
             CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
               / len(string_split(text, ' ')) AS awl
      FROM documents
    ),
    scores AS (
      SELECT 0.4 * LEAST(1.0, nt / 50.0)
           + 0.4 * (CAST(nd AS DOUBLE) / nt)
           + 0.2 * LEAST(1.0, awl / 8.0) AS score
      FROM feat
    )
    SELECT CAST(FLOOR(score * 10) AS INTEGER) AS bucket,
           COUNT(*) AS n_docs,
           ROUND(AVG(score), 4) AS avg_score
    FROM scores GROUP BY bucket ORDER BY bucket
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _t(spark, sf_dir, "documents")
    toks = F.expr("split(text, ' ', -1)")
    nt = F.size(toks)
    nd = F.size(F.array_distinct(toks))
    awl = (F.length("text") - (nt - 1)).cast("double") / nt
    score = (
        0.4 * F.least(F.lit(1.0), nt / 50.0)
        + 0.4 * (nd.cast("double") / nt)
        + 0.2 * F.least(F.lit(1.0), awl / 8.0)
    )
    return (
        d.select(score.alias("score"))
        .select(F.floor(F.col("score") * 10).cast("int").alias("bucket"), "score")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("score"), 4).alias("avg_score"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Composed training-data prep pipeline (flagship composition)
# ---------------------------------------------------------------------------

_PREP_SCORE_DUCK = """
         0.4 * LEAST(1.0, len(string_split(text, ' ')) / 50.0)
       + 0.4 * (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                / len(string_split(text, ' ')))
       + 0.2 * LEAST(1.0,
           (CAST(length(text) - (len(string_split(text, ' ')) - 1) AS DOUBLE)
            / len(string_split(text, ' '))) / 8.0)"""

_PREP_LANG_DUCK = f"""
      CASE WHEN s_en > 0 AND s_en >= s_de AND s_en >= s_es AND s_en >= s_fr THEN 'en'
           WHEN s_de > 0 AND s_de >= s_es AND s_de >= s_fr THEN 'de'
           WHEN s_es > 0 AND s_es >= s_fr THEN 'es'
           WHEN s_fr > 0 THEN 'fr'
           ELSE 'und' END"""


@register(
    "prep_pipeline_summary",
    f"""
    WITH {_DOC_CORPUS_DUCK},
    feat AS (
      SELECT doc_id, text,
             len(string_split(text, ' ')) AS nt,
             {_PREP_SCORE_DUCK} AS score,
             len(list_intersect(list_distinct(string_split(text, ' ')), {_MARKERS_DUCK['en']})) AS s_en,
             len(list_intersect(list_distinct(string_split(text, ' ')), {_MARKERS_DUCK['de']})) AS s_de,
             len(list_intersect(list_distinct(string_split(text, ' ')), {_MARKERS_DUCK['es']})) AS s_es,
             len(list_intersect(list_distinct(string_split(text, ' ')), {_MARKERS_DUCK['fr']})) AS s_fr
      FROM corpus
    ),
    kept AS (
      SELECT doc_id, text, nt, score, {_PREP_LANG_DUCK} AS plang
      FROM feat WHERE nt >= 10 AND score >= 0.6
    ),
    firsts AS (
      SELECT md5(text) AS k, MIN(doc_id) AS doc_id FROM kept GROUP BY 1
    ),
    survivors AS (
      SELECT kept.* FROM kept
      JOIN firsts ON md5(kept.text) = firsts.k AND kept.doc_id = firsts.doc_id
    ),
    toks2 AS (SELECT doc_id, {_TOKS_DUCK} AS t FROM survivors),
    sh2 AS (SELECT doc_id, {_SHINGLES_DUCK} AS shingles FROM toks2),
    grams2 AS (SELECT doc_id, unnest(shingles) AS g FROM sh2),
    inter2 AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS i
      FROM grams2 a JOIN grams2 b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    dropids AS (
      SELECT DISTINCT doc_b AS doc_id FROM (
        SELECT doc_a, doc_b,
               ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 4) AS jaccard
        FROM inter2
        JOIN (SELECT doc_id, len(shingles) AS sz FROM sh2) sa ON sa.doc_id = doc_a
        JOIN (SELECT doc_id, len(shingles) AS sz FROM sh2) sb ON sb.doc_id = doc_b
      ) WHERE jaccard >= 0.8
    ),
    final AS (
      SELECT * FROM survivors
      WHERE doc_id NOT IN (SELECT doc_id FROM dropids)
    )
    SELECT plang, COUNT(*) AS n_docs,
           CAST(SUM(nt) AS BIGINT) AS sum_tokens,
           ROUND(AVG(score), 4) AS avg_score
    FROM final GROUP BY plang ORDER BY plang
    """,
)
def prep_pipeline_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed LLM-training-data prep pipeline, end to end in ONE
    declarative plan: per-doc quality/token/language features → quality
    gate (nt >= 10, score >= 0.6) → exact dedup (md5 groupBy, first-wins)
    → n-gram-Jaccard near-dup removal (drop the higher doc_id of each
    >= 0.8 pair) → per-language corpus summary. This is the "a user of the
    reference could run their whole prep flow here" query: every stage is
    an operator that also runs standalone (text_quality_score,
    text_lang_id, dedup_exact, dedup_ngram_jaccard).

    Scale shape: features and the gate are pure map-side expressions; the
    exact dedup is one hash shuffle on md5(text); the near-dup stage runs
    only on gate+dedup SURVIVORS (already a fraction of the corpus) via
    the same single-groupBy pair-explode plan as dedup_ngram_jaccard; the
    final rollup is a tiny per-language hash aggregate."""
    corpus = _doc_corpus(spark, sf_dir)
    toks = F.expr("split(text, ' ', -1)")
    toksd = F.array_distinct(toks)
    nt = F.size(toks)
    nd = F.size(toksd)
    awl = (F.length("text") - (nt - 1)).cast("double") / nt
    score = (
        0.4 * F.least(F.lit(1.0), nt / 50.0)
        + 0.4 * (nd.cast("double") / nt)
        + 0.2 * F.least(F.lit(1.0), awl / 8.0)
    )
    marker_scores = {
        name: F.size(
            F.array_intersect(toksd, F.array(*[F.lit(m) for m in markers]))
        ).alias(f"s_{name}")
        for name, markers in (
            ("en", ("the", "a", "of", "and", "to")),
            ("de", ("der", "die", "das", "und", "ist")),
            ("es", ("el", "la", "de", "y", "es")),
            ("fr", ("le", "la", "et", "de", "est")),
        )
    }
    feat = corpus.select(
        "doc_id",
        "text",
        nt.alias("nt"),
        score.alias("score"),
        *marker_scores.values(),
    )
    predicted = (
        F.when(
            (F.col("s_en") > 0)
            & (F.col("s_en") >= F.col("s_de"))
            & (F.col("s_en") >= F.col("s_es"))
            & (F.col("s_en") >= F.col("s_fr")),
            "en",
        )
        .when(
            (F.col("s_de") > 0)
            & (F.col("s_de") >= F.col("s_es"))
            & (F.col("s_de") >= F.col("s_fr")),
            "de",
        )
        .when((F.col("s_es") > 0) & (F.col("s_es") >= F.col("s_fr")), "es")
        .when(F.col("s_fr") > 0, "fr")
        .otherwise("und")
    )
    kept = feat.filter((F.col("nt") >= 10) & (F.col("score") >= 0.6)).select(
        "doc_id", "text", "nt", "score", predicted.alias("plang")
    )
    keyed = kept.withColumn("k", F.md5("text"))
    firsts = keyed.groupBy("k").agg(F.min("doc_id").alias("doc_id"))
    # Deliberately NO barrier/persist here although survivors feeds both
    # the near-dup subtree and the final aggregate: its lineage is
    # map-side expressions plus a semi-join whose exchange Catalyst
    # already reuses, so re-deriving it is cheaper than materializing an
    # extra full-text exchange (measured: a _barrier made the query 8.1 s
    # → 10.7 s at sf0.1).
    survivors = keyed.join(firsts, ["k", "doc_id"], "left_semi")
    pairs = dedup.ngram_jaccard_pairs(
        survivors.select("doc_id", "text"), threshold=0.8
    )
    drop = pairs.select(F.col("doc_b").alias("doc_id")).distinct()
    final = survivors.join(drop, "doc_id", "left_anti")
    return (
        final.groupBy("plang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").alias("sum_tokens"),
            F.round(F.avg("score"), 4).alias("avg_score"),
        )
        .orderBy("plang")
    )


# ---------------------------------------------------------------------------
# Weighted corpus mixing
# ---------------------------------------------------------------------------

# 4 weight tiers over the 20 synthetic sources; src15..src19 get no weight
# and must vanish (a mixture is an allowlist).
_MIX_WEIGHTS = {
    **{f"src{i}": 1.0 for i in range(0, 5)},
    **{f"src{i}": 0.5 for i in range(5, 10)},
    **{f"src{i}": 0.3 for i in range(10, 15)},
}
_MIX_THRESH_DUCK = "CASE " + " ".join(
    f"WHEN source = '{s}' THEN {int(round(w * 1_000_000))}"
    for s, w in _MIX_WEIGHTS.items()
) + " ELSE 0 END"


@register(
    "corpus_mixture_report",
    f"""
    WITH kept AS (
      SELECT source, text FROM documents
      WHERE ({h60_duck("CAST(doc_id AS VARCHAR)")}) % 1000000
            < {_MIX_THRESH_DUCK}
    )
    SELECT source, COUNT(*) AS n_kept,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens
    FROM kept GROUP BY source ORDER BY source
    """,
)
def corpus_mixture_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source kept counts/tokens after weighted mixing
    (operators/mixing.py): tiers 1.0/0.5/0.3 over src0..src14; unlisted
    sources dropped entirely."""
    from .operators.mixing import mix_corpus
    from .sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    mixed = mix_corpus(docs, _MIX_WEIGHTS)
    return (
        mixed.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum(F.size(F.expr("split(text, ' ', -1)"))).alias("sum_tokens"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Benchmark decontamination
# ---------------------------------------------------------------------------

_DECON_N = 5
_DECON_MIN = 3
_DECON_SHINGLES = word_ngrams_duck("t", _DECON_N)


@register(
    "decontamination_report",
    # eval set = every 97th base doc; train = the dup-synthesized corpus
    # minus the eval docs themselves. The synthesized exact/near copies of
    # eval docs are the planted contamination the report must find.
    f"""
    WITH {_DOC_CORPUS_DUCK},
    evalset AS (SELECT doc_id, text FROM documents WHERE doc_id % 97 = 0),
    train AS (
      SELECT doc_id, text FROM corpus
      WHERE doc_id NOT IN (SELECT doc_id FROM evalset)
    ),
    eg AS (
      SELECT DISTINCT unnest(sh) AS g FROM (
        SELECT {_DECON_SHINGLES} AS sh
        FROM (SELECT string_split(text, ' ') AS t FROM evalset)
      )
    ),
    tg AS (
      SELECT DISTINCT doc_id, unnest(sh) AS g FROM (
        SELECT doc_id, {_DECON_SHINGLES} AS sh
        FROM (SELECT doc_id, string_split(text, ' ') AS t FROM train)
      )
    )
    SELECT doc_id, COUNT(*) AS n_shared
    FROM tg JOIN eg USING (g)
    GROUP BY doc_id HAVING COUNT(*) >= {_DECON_MIN}
    ORDER BY doc_id
    """,
)
def decontamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval n-gram overlap check (operators/decontaminate.py): the
    dup-synthesized corpus is the training side, every 97th base document
    is the 'benchmark'; the planted exact/near copies of eval docs must be
    flagged."""
    from .operators.decontaminate import contamination_report
    from .sources.tables import load_table

    base = load_table(spark, sf_dir, "documents", parallelize=True).select(
        "doc_id", "text"
    )
    evalset = base.filter(F.col("doc_id") % 97 == 0)
    train = _doc_corpus(spark, sf_dir).join(
        evalset.select("doc_id"), "doc_id", "left_anti"
    )
    return contamination_report(train, evalset, n=_DECON_N, min_shared=_DECON_MIN)


# ---------------------------------------------------------------------------
# Document chunking
# ---------------------------------------------------------------------------

_CHUNK_MAX = 32
_CHUNK_OVERLAP = 8
_CHUNK_STRIDE = _CHUNK_MAX - _CHUNK_OVERLAP


@register(
    "doc_chunking",
    # per-row verification: every chunk's (doc, id, token count, md5 of the
    # chunk text) must match the oracle's slice arithmetic exactly.
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    base AS (
      SELECT doc_id, t,
             GREATEST(1, CAST(CEIL((len(t) - {_CHUNK_OVERLAP})
               / CAST({_CHUNK_STRIDE} AS DOUBLE)) AS BIGINT)) AS n_chunks
      FROM toks
    ),
    chunks AS (
      SELECT doc_id, unnest(range(0, n_chunks)) AS chunk_id, t FROM base
    )
    SELECT doc_id, chunk_id,
           CAST(len(list_slice(t, chunk_id * {_CHUNK_STRIDE} + 1,
                 chunk_id * {_CHUNK_STRIDE} + {_CHUNK_MAX})) AS BIGINT)
             AS chunk_tokens,
           md5(array_to_string(list_slice(t, chunk_id * {_CHUNK_STRIDE} + 1,
                 chunk_id * {_CHUNK_STRIDE} + {_CHUNK_MAX}), ' ')) AS chunk_md5
    FROM chunks ORDER BY doc_id, chunk_id
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking over `documents` — purely
    relational 1→N fan-out (operators/chunking.py); chunk text verified
    by md5 so the oracle compare stays light."""
    from .operators.chunking import chunk_documents
    from .sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    out = chunk_documents(docs, max_tokens=_CHUNK_MAX, overlap=_CHUNK_OVERLAP)
    return out.select(
        "doc_id",
        F.col("chunk_id").cast("bigint").alias("chunk_id"),
        F.col("chunk_tokens").cast("bigint").alias("chunk_tokens"),
        F.md5("chunk_text").alias("chunk_md5"),
    ).orderBy("doc_id", "chunk_id")


# ---------------------------------------------------------------------------
# Training-sequence packing
# ---------------------------------------------------------------------------

_PACK_L = 512
_PACK_SHARDS = 8


@register(
    "pack_training_sequences",
    # The oracle replays the per-shard greedy scan with a recursive CTE:
    # row rn+1's (seq_id, fill) is a CASE over row rn's — the exact
    # sequential semantics the engine's applyInPandas loop implements.
    f"""
    WITH RECURSIVE docs2 AS (
      SELECT doc_id, len(string_split(text, ' ')) AS nt,
             doc_id % {_PACK_SHARDS} AS shard,
             row_number() OVER (PARTITION BY doc_id % {_PACK_SHARDS}
                                ORDER BY doc_id) AS rn
      FROM documents
    ),
    packed AS (
      SELECT shard, rn, nt, CAST(0 AS BIGINT) AS seq_id, nt AS fill
      FROM docs2 WHERE rn = 1
      UNION ALL
      SELECT d.shard, d.rn, d.nt,
             CASE WHEN p.fill + d.nt > {_PACK_L} AND p.fill > 0
                  THEN p.seq_id + 1 ELSE p.seq_id END,
             CASE WHEN p.fill + d.nt > {_PACK_L} AND p.fill > 0
                  THEN d.nt ELSE p.fill + d.nt END
      FROM docs2 d JOIN packed p ON d.shard = p.shard AND d.rn = p.rn + 1
    ),
    per_seq AS (
      SELECT shard, seq_id, CAST(SUM(nt) AS BIGINT) AS seq_tokens
      FROM packed GROUP BY shard, seq_id
    )
    SELECT shard, COUNT(*) AS n_seqs,
           CAST(SUM(seq_tokens) AS BIGINT) AS sum_tokens,
           CAST(MIN(seq_tokens) AS BIGINT) AS min_fill,
           CAST(MAX(seq_tokens) AS BIGINT) AS max_fill,
           ROUND(AVG(seq_tokens), 2) AS avg_fill
    FROM per_seq GROUP BY shard ORDER BY shard
    """,
)
def pack_training_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy fixed-budget sequence packing over `documents` (the step
    between a deduped corpus and the training dataloader) — see
    operators/packing.py for semantics and the why-a-Pandas-UDF note."""
    from .operators.packing import pack_sequences, packing_summary
    from .sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    packed = pack_sequences(docs, max_tokens=_PACK_L, shards=_PACK_SHARDS)
    return packing_summary(packed).withColumn(
        "sum_tokens", F.col("sum_tokens").cast("bigint")
    ).withColumn("min_fill", F.col("min_fill").cast("bigint")).withColumn(
        "max_fill", F.col("max_fill").cast("bigint")
    )


@register(
    "text_repetition_score",
    # Gopher/C4-style repetition signals: duplicate word-bigram fraction
    # (array expression, map-side) and top-word dominance (one
    # (doc_id, word) shuffle). Histogram over dominance deciles.
    """
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    bi AS (
      SELECT doc_id,
             CASE WHEN len(t) < 2 THEN 0.0
                  ELSE 1.0 - CAST(len(list_distinct(
                         list_transform(range(1, len(t)),
                           i -> t[i] || ' ' || t[i + 1]))) AS DOUBLE)
                       / (len(t) - 1) END AS dup_bigram_frac,
             len(t) AS nt
      FROM toks
    ),
    wc AS (
      SELECT doc_id, COUNT(*) AS c
      FROM (SELECT doc_id, unnest(t) AS w FROM toks)
      GROUP BY doc_id, w
    ),
    topw AS (
      SELECT doc_id, CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_word_frac
      FROM wc GROUP BY doc_id
    )
    SELECT CAST(FLOOR(top_word_frac * 10) AS INTEGER) AS bucket,
           COUNT(*) AS n_docs,
           ROUND(AVG(dup_bigram_frac), 4) AS avg_dup_bigram_frac,
           ROUND(AVG(top_word_frac), 4) AS avg_top_word_frac
    FROM bi JOIN topw USING (doc_id)
    GROUP BY bucket ORDER BY bucket
    """,
)
def text_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-quality signals per document, bucketed: duplicate-bigram
    fraction (how much of the text is repeated word pairs) stays a pure
    array expression; top-word dominance (most frequent word's share)
    needs one (doc_id, word) shuffle. Both are standard repetitious-junk
    filters in LLM corpus curation; a gate would drop docs past a
    threshold — the histogram here makes both distributions oracle-visible."""
    from .sources.tables import load_table

    d = load_table(spark, sf_dir, "documents", parallelize=True)
    toks = d.select("doc_id", F.expr("split(text, ' ', -1)").alias("t"))
    bi = toks.select(
        "doc_id",
        F.expr(
            "CASE WHEN size(t) < 2 THEN 0.0D ELSE "
            "1.0D - CAST(size(array_distinct(transform(sequence(1, size(t) - 1), "
            "i -> concat(element_at(t, i), ' ', element_at(t, i + 1))))) AS DOUBLE)"
            " / (size(t) - 1) END"
        ).alias("dup_bigram_frac"),
    )
    topw = (
        toks.select("doc_id", F.explode("t").alias("w"))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg((F.max("c").cast("double") / F.sum("c")).alias("top_word_frac"))
    )
    return (
        bi.join(topw, "doc_id")
        .select(
            F.floor(F.col("top_word_frac") * 10).cast("int").alias("bucket"),
            "dup_bigram_frac",
            "top_word_frac",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("dup_bigram_frac"), 4).alias("avg_dup_bigram_frac"),
            F.round(F.avg("top_word_frac"), 4).alias("avg_top_word_frac"),
        )
        .orderBy("bucket")
    )


_FP_HASH_DUCK = h60_duck("substr(text, i, 5)")


@register(
    "text_fingerprint",
    f"""
    WITH {_DOC_CORPUS_DUCK},
    fp AS (
      SELECT doc_id,
             list_min(list_transform(
               range(1, CASE WHEN length(text) >= 5 THEN length(text) - 3 ELSE 1 END),
               i -> {_FP_HASH_DUCK})) AS fp
      FROM corpus
    )
    SELECT fp, COUNT(*) AS n_docs, MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
    FROM fp GROUP BY fp HAVING COUNT(*) > 1
    ORDER BY fp
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-lite content fingerprint: min 60-bit hash over character
    5-grams. (A production system uses a rolling Rabin-Karp hash — O(n)
    instead of O(n*w) — and keeps k mins per window; the declarative
    min-over-substring-hashes here has identical collision semantics for
    dedup grouping.)"""
    corpus = _doc_corpus(spark, sf_dir)
    fp = F.expr(
        "IF(length(text) >= 5, "
        "array_min(transform(sequence(1, length(text) - 4), i -> "
        + h60_sql("substring(text, i, 5)")
        + ")), CAST(NULL AS BIGINT))"
    )
    return (
        corpus.select("doc_id", fp.alias("fp"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
        .filter(F.col("n_docs") > 1)
        .orderBy("fp")
    )


@register(
    "a8_stats_aggregates",
    """
    SELECT l_returnflag,
           ROUND(stddev_samp(l_extendedprice), 2) AS sd_price,
           ROUND(var_samp(l_quantity), 2) AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           ROUND(percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice), 2)
               AS p25_price,
           ROUND(percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice), 2)
               AS median_price,
           ROUND(percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice), 2)
               AS p75_price,
           ROUND(skewness(l_quantity), 3) + 0.0 AS skew_qty,
           ROUND(kurtosis(l_quantity), 3) + 0.0 AS kurt_qty
    FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)
def a8_stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family. Moments (stddev/var/corr/covar/skew/
    kurtosis) are one streaming hash aggregate. Exact discrete percentiles
    are computed SORT-BASED: rank rows per group with a window, pick the
    value at ceil(p*n) — percentile_disc's definition (first value whose
    cume_dist >= p). Spark's native percentile_disc aggregate buffers every
    group's values in executor memory (ObjectHashAggregate), which OOMs at
    real scale; a window sort spills. (At 100 TB you would use
    approx_percentile and drop oracle-exactness.) skew/kurtosis rounded to
    3 — higher moments accumulate in engine-specific merge order and drift
    ~1e-5; +0.0 normalizes IEEE negative zero."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem")
    moments = (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
            F.round(F.var_samp("l_quantity"), 2).alias("var_qty"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "covar_qty_price"
            ),
            (F.round(F.skewness("l_quantity"), 3) + 0.0).alias("skew_qty"),
            (F.round(F.kurtosis("l_quantity"), 3) + 0.0).alias("kurt_qty"),
        )
    )
    wq = Window.partitionBy("l_returnflag").orderBy("p")
    wn = Window.partitionBy("l_returnflag")
    ranked = li.select(
        "l_returnflag", F.col("l_extendedprice").alias("p")
    ).select(
        "l_returnflag",
        "p",
        F.row_number().over(wq).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def _pick(frac: float, name: str):
        # ceil(p*n): exact for quarter fractions (no FP dust)
        return F.round(
            F.min(F.when(F.col("rn") == F.ceil(F.lit(frac) * F.col("n")), F.col("p"))),
            2,
        ).alias(name)

    pct = ranked.groupBy("l_returnflag").agg(
        _pick(0.25, "p25_price"),
        _pick(0.5, "median_price"),
        _pick(0.75, "p75_price"),
    )
    return (
        moments.join(F.broadcast(pct), "l_returnflag")
        .select(
            "l_returnflag",
            "sd_price",
            "var_qty",
            "corr_qty_price",
            "covar_qty_price",
            "p25_price",
            "median_price",
            "p75_price",
            "skew_qty",
            "kurt_qty",
        )
        .orderBy("l_returnflag")
    )


@register(
    "events_sessionization",
    """
    WITH lagd AS (
      SELECT user_id, ts, value,
             lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
      FROM events
    ),
    flags AS (
      SELECT *, CASE WHEN prev IS NULL
                       OR epoch_us(ts) - epoch_us(prev) >= 1800000000
                     THEN 1 ELSE 0 END AS ns
      FROM lagd
    ),
    sess AS (
      SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flags
    )
    SELECT user_id,
           strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(MAX(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
               AS session_end,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM sess GROUP BY user_id, sid
    ORDER BY user_id, session_start
    """,
)
def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions via Spark's native session_window (the oracle
    spells the same semantics with lag/cumsum: new session iff the gap to
    the previous event is >= 30 min, exact in microseconds; session end is
    last event + gap)."""
    from .streaming.sessionize import sessionize

    return sessionize(_t(spark, sf_dir, "events"), gap="30 minutes").orderBy(
        "user_id", "session_start"
    )


# ---------------------------------------------------------------------------
# Multimodal binary-column plumbing
# ---------------------------------------------------------------------------

_BYTE0_DUCK = "CAST(('0x' || substr(md5(text), 1, 2)) AS INTEGER)"
_CHECKSUM_DUCK = (
    "CAST(list_sum(list_transform(range(0, 16), "
    "i -> CAST(('0x' || substr(md5(text), 2 * i + 1, 2)) AS INTEGER))) "
    f"% {multimodal.CHECKSUM_MOD} AS INTEGER)"
)


@register(
    "mm_decode_features",
    f"""
    SELECT doc_id,
           16 AS n_bytes,
           {_BYTE0_DUCK} AS first_byte,
           {_CHECKSUM_DUCK} AS checksum,
           CAST(1 + doc_id % 64 AS INTEGER) AS width,
           CAST(1 + doc_id % 48 AS INTEGER) AS height
    FROM documents ORDER BY doc_id
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = multimodal.attach_fake_payload(_t(spark, sf_dir, "documents"))
    return multimodal.payload_features(media).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Engine breadth beyond the reference (§2.12 gap list): set ops, rollup,
# as-of join
# ---------------------------------------------------------------------------


@register(
    "setop_except_intersect",
    """
    WITH b AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
         o AS (SELECT DISTINCT o_custkey AS c_custkey FROM orders)
    SELECT 'building_no_orders' AS tag, c_custkey
    FROM (SELECT * FROM b EXCEPT SELECT * FROM o)
    UNION ALL
    SELECT 'building_with_orders' AS tag, c_custkey
    FROM (SELECT * FROM b INTERSECT SELECT * FROM o)
    ORDER BY tag, c_custkey
    """,
)
def setop_except_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey")
    ).distinct()
    no_orders = b.exceptAll(o).select(
        F.lit("building_no_orders").alias("tag"), "c_custkey"
    )
    with_orders = b.intersect(o).select(
        F.lit("building_with_orders").alias("tag"), "c_custkey"
    )
    return no_orders.unionAll(with_orders).orderBy("tag", "c_custkey")


@register(
    "rollup_revenue",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS flag,
           COALESCE(l_linestatus, 'ALL') AS status,
           ROUND(SUM(l_extendedprice * l_quantity), 2) AS revenue,
           COUNT(*) AS n
    FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY flag, status
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals via ROLLUP — Catalyst's Expand-based grouping
    sets; one pass over the fact table."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("flag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("status"),
            "revenue",
            "n",
        )
        .orderBy("flag", "status")
    )


@register(
    "asof_join_last_order",
    """
    WITH od AS (
      SELECT o_custkey, CAST(o_orderdate AS TIMESTAMP) AS t,
             MAX(o_orderkey) AS last_order
      FROM orders GROUP BY 1, 2
    )
    SELECT e.event_id, e.user_id, od.last_order,
           strftime(od.t, '%Y-%m-%d') AS order_date
    FROM events e ASOF JOIN od ON e.user_id = od.o_custkey AND e.ts >= od.t
    ORDER BY event_id
    """,
)
def asof_join_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event, the user's most recent order at or before the event
    time — operators.asof union-and-carry as-of join (DuckDB oracle uses
    its native ASOF JOIN). Orders are pre-deduped to one row per
    (custkey, date) per the operator contract."""
    from .operators.asof import asof_join_backward

    events = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    od = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("last_order"))
        .withColumn("order_date", F.date_format("o_orderdate", "yyyy-MM-dd"))
    )
    out = asof_join_backward(
        events,
        od,
        left_key="user_id",
        right_key="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_values=["last_order", "order_date"],
    )
    return out.select("event_id", "user_id", "last_order", "order_date").orderBy(
        "event_id"
    )


@register(
    "mm_frame_sample",
    f"""
    SELECT doc_id,
           CAST(j AS INTEGER) AS frame_idx,
           CAST(('0x' || substr(md5(text || '|' || CAST(j AS VARCHAR)), 1, 2))
                AS INTEGER) AS frame_first_byte
    FROM documents, (SELECT unnest([0, 3, 6]) AS j)
    ORDER BY doc_id, frame_idx
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    video = multimodal.attach_fake_frames(_t(spark, sf_dir, "documents"))
    return multimodal.sample_frames(video).orderBy("doc_id", "frame_idx")


@register(
    "knn_graph_ivf_cells",
    # Full-corpus kNN graph blocked by the TRAINED coarse quantizer: the
    # oracle re-derives the identical k-means model (init by residue
    # class, 2 rounded-mean iterations, min-cell tie-break) and self-joins
    # the full assignment within cells.
    f"""
    WITH {_SIM_BASE_DUCK},
    init AS (
      SELECT cell, e AS ce FROM (
        SELECT vec_id % {_IVF_K} AS cell, e,
               row_number() OVER (PARTITION BY vec_id % {_IVF_K} ORDER BY vec_id) AS rn
        FROM c) WHERE rn = 1
    ),
    {_ivf_iter_duck('init', 1)},
    {_ivf_iter_duck('cent1', 2)},
    fa AS (
      SELECT vec_id, e, cell FROM (
        SELECT c.vec_id, c.e, i.cell, {_ivf_dist_duck('c.e', 'i.ce')} AS dist,
               row_number() OVER (PARTITION BY c.vec_id
                                  ORDER BY {_ivf_dist_duck('c.e', 'i.ce')}, i.cell) AS rn
        FROM c CROSS JOIN cent2 i) WHERE rn = 1
    )
    SELECT query_id, rn AS rank, neighbor_id, ROUND(s, 4) AS score FROM (
      SELECT query_id, neighbor_id, s,
             row_number() OVER (PARTITION BY query_id ORDER BY s DESC, neighbor_id) AS rn
      FROM (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               list_sum(list_transform(range(1, {EMB_DIM + 1}),
                        i -> a.e[i] * b.e[i])) AS s
        FROM fa a JOIN fa b ON a.cell = b.cell AND a.vec_id <> b.vec_id
      )
    ) WHERE rn <= 3
    ORDER BY query_id, rank
    """,
)
def knn_graph_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN graph over TRAINED IVF cells — the principled approximate
    graph for corpora whose neighbors are weakly similar (where sign-LSH
    candidates collapse, see knn_graph_lsh): k-means cells are balanced
    by construction, so the within-cell self-join is bounded at ~n²/k
    pairs regardless of label skew, and geometrically-close vectors
    share a cell far more often than they share an 8-bit sign bucket.
    Recall vs the exact label-blocked graph is measured in
    tests/test_ann_recall.py."""
    corpus, _ = _sim_queries(spark, sf_dir)
    model = similarity.kmeans_centroids(
        corpus, EMB_DIM, k=_IVF_K, iters=2, sample_rate=1.0
    )
    assigned = similarity._assign_cell(
        corpus.select("vec_id", "embedding"), "embedding", model
    )
    out = similarity.knn_graph_blocked(assigned, EMB_DIM, k=3, block_col="cell")
    return out.withColumn("rank", F.col("rank").cast("bigint"))
