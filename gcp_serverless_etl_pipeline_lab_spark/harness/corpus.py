"""Corpus-curation harness queries: the composed training-data prep
pipeline, weighted corpus mixing, benchmark decontamination, document
chunking, training-sequence packing, deterministic (hash-Bernoulli and
stratified) sampling, PII redaction, and per-domain quota sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import h60_duck, h60_sql
from ..functions.text import word_ngrams_duck
from ..operators import dedup
from ._corpora import _DOC_CORPUS_DUCK, _doc_corpus
from ._registry import _t, register
from .dedup import _SHINGLES_DUCK, _TOKS_DUCK
from .text import _MARKERS_DUCK

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
    from ..operators.mixing import mix_corpus
    from ..sources.tables import load_table

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
    from ..operators.decontaminate import contamination_report
    from ..sources.tables import load_table

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
    from ..operators.chunking import chunk_documents
    from ..sources.tables import load_table

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
    from ..operators.packing import pack_sequences, packing_summary
    from ..sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    packed = pack_sequences(docs, max_tokens=_PACK_L, shards=_PACK_SHARDS)
    return packing_summary(packed).withColumn(
        "sum_tokens", F.col("sum_tokens").cast("bigint")
    ).withColumn("min_fill", F.col("min_fill").cast("bigint")).withColumn(
        "max_fill", F.col("max_fill").cast("bigint")
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
# Stratified deterministic sampling (per-group rates)
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
    from ..operators.sampling import stratified_sample

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

# ---------------------------------------------------------------------------
# PII redaction + per-domain quota sampling — operators/redact.py
# ---------------------------------------------------------------------------
#
# The synthetic corpus carries no real PII, so the query INJECTS a
# deterministic email/IP pair into every third document (mirrored in the
# oracle) and then redacts — the redaction mechanics, counts, and
# placeholder text are what's under test.


@register(
    "a0_pii_redact_stats",
    """
    WITH injected AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0 THEN
               text || ' contact u' || CAST(doc_id AS VARCHAR)
                    || '@example.com at 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                    || '.1 now'
             ELSE text END AS text
      FROM documents
    ),
    emailed AS (
      SELECT doc_id, text,
             len(regexp_extract_all(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
             regexp_replace(text,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                 '<EMAIL>', 'g') AS t1
      FROM injected
    ),
    red AS (
      SELECT doc_id, CAST(n_emails AS BIGINT) AS n_emails,
             CAST(len(regexp_extract_all(t1,
                 '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'))
               AS BIGINT) AS n_ips,
             regexp_replace(t1,
                 '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b',
                 '<IP>', 'g') AS text_redacted
      FROM emailed
    )
    SELECT doc_id, n_emails, n_ips, md5(text_redacted) AS redacted_md5
    FROM red WHERE n_emails > 0 OR n_ips > 0
    ORDER BY doc_id
    """,
)
def a0_pii_redact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email/IPv4 scrub over documents (operators/redact.py): inject a
    deterministic PII pair into every third doc, redact with the shared
    Java-regex/RE2-subset patterns, report per-doc match counts and the
    md5 of the redacted text. All map-side expressions — zero shuffle
    beyond the final sort."""
    from ..operators.redact import redact_pii

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact u"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com at 10.0."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit(".1 now"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return (
        redact_pii(docs)
        .filter((F.col("n_emails") > 0) | (F.col("n_ips") > 0))
        .select(
            "doc_id",
            "n_emails",
            "n_ips",
            F.md5("text_redacted").alias("redacted_md5"),
        )
        .orderBy("doc_id")
    )


@register(
    "a0_domain_quota_sample",
    f"""
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {h60_duck("CAST(doc_id AS VARCHAR)")}, doc_id
             ) AS quota_rank
      FROM documents
    )
    SELECT source, doc_id, CAST(quota_rank AS BIGINT) AS quota_rank
    FROM ranked WHERE quota_rank <= 25
    ORDER BY source, quota_rank
    """,
)
def a0_domain_quota_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota cap (operators/redact.py domain_quota_sample):
    keep <= 25 docs per source, selected by ascending 60-bit hash of the
    id — a stable pseudo-random draw that re-picks the same survivors on
    every run. The mixing-control op for web-scale corpora."""
    from ..operators.redact import domain_quota_sample

    return (
        domain_quota_sample(
            _t(spark, sf_dir, "documents"), quota=25
        )
        .select("source", "doc_id", F.col("quota_rank").cast("bigint").alias("quota_rank"))
        .orderBy("source", "quota_rank")
    )


# ---------------------------------------------------------------------------
# URL host/domain extraction — web-corpus curation rollup
# ---------------------------------------------------------------------------

from ..functions.text import (  # noqa: E402
    registrable_domain,
    registrable_domain_duck,
    url_host,
    url_host_duck,
)

# Deterministic URL synthesis (the documents table carries no URLs):
# scheme + optional userinfo (every 11th) + source-derived sub-host +
# one of three registrable domains + optional port (every 13th) + path +
# optional query (every 5th). The source label is sanitized to RFC-valid
# host characters on BOTH sides — Spark's parse_url returns NULL for
# RFC-invalid hosts (java.net.URI validation) where the oracle's RE2
# grammar would still extract one (functions.text.url_host_duck caveat).
_URL_DUCK = """
      'https://'
      || CASE WHEN doc_id % 11 = 0 THEN 'u' || CAST(doc_id % 97 AS VARCHAR) || '@' ELSE '' END
      || regexp_replace(source, '[^a-zA-Z0-9-]', '-', 'g') || '-' || CAST(doc_id % 37 AS VARCHAR)
      || '.example.'
      || CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END
      || CASE WHEN doc_id % 13 = 0 THEN ':8443' ELSE '' END
      || '/' || CAST(doc_id AS VARCHAR)
      || CASE WHEN doc_id % 5 = 0 THEN '?q=' || CAST(doc_id % 7 AS VARCHAR) ELSE '' END
"""


@register(
    "a0_url_domain_stats",
    f"""
    WITH u AS (
      SELECT doc_id, {_URL_DUCK} AS url FROM documents
    ),
    parsed AS (
      SELECT doc_id, url,
             {url_host_duck('url')} AS host,
             regexp_matches(url, '://[^/?#]*:[0-9]+') AS has_port,
             regexp_matches(url, '[?]') AS has_query,
             regexp_matches(url, '://[^/?#]*@') AS has_userinfo
      FROM u
    )
    SELECT {registrable_domain_duck('host')} AS domain,
           COUNT(*) AS n_docs,
           COUNT(DISTINCT host) AS n_hosts,
           CAST(SUM(CASE WHEN has_port THEN 1 ELSE 0 END) AS BIGINT) AS n_with_port,
           CAST(SUM(CASE WHEN has_query THEN 1 ELSE 0 END) AS BIGINT) AS n_with_query,
           CAST(SUM(CASE WHEN has_userinfo THEN 1 ELSE 0 END) AS BIGINT) AS n_with_userinfo
    FROM parsed GROUP BY domain ORDER BY domain
    """,
)
def a0_url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registrable-domain rollup over synthesized URLs — the web-corpus
    curation primitive behind domain mixing/quota decisions. Host comes
    from the JVM built-in ``parse_url`` (functions.text.url_host — codegen,
    no Python); port/query/userinfo presence from the same one scan. The
    DuckDB twin re-derives hosts with an RE2 component grammar, so the
    compare also pins parse_url's host semantics (userinfo and port
    stripped) cross-engine. Map-side until the per-domain aggregate."""
    d = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(F.lit("u"), (F.col("doc_id") % 97).cast("string"), F.lit("@")),
        ).otherwise(F.lit("")),
        F.regexp_replace("source", "[^a-zA-Z0-9-]", "-"),
        F.lit("-"),
        (F.col("doc_id") % 37).cast("string"),
        F.lit(".example."),
        F.when(F.col("doc_id") % 3 == 0, "com")
        .when(F.col("doc_id") % 3 == 1, "org")
        .otherwise("net"),
        F.when(F.col("doc_id") % 13 == 0, ":8443").otherwise(F.lit("")),
        F.lit("/"),
        F.col("doc_id").cast("string"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit("?q="), (F.col("doc_id") % 7).cast("string")),
        ).otherwise(F.lit("")),
    )
    parsed = d.select(
        url.alias("url"),
        url_host(url).alias("host"),
        F.coalesce(
            F.parse_url(url, F.lit("AUTHORITY")).rlike(":[0-9]+$"), F.lit(False)
        ).alias("has_port"),
        F.parse_url(url, F.lit("QUERY")).isNotNull().alias("has_query"),
        F.parse_url(url, F.lit("USERINFO")).isNotNull().alias("has_userinfo"),
    )
    return (
        parsed.groupBy(registrable_domain(F.col("host")).alias("domain"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("host").alias("n_hosts"),
            F.sum(F.when(F.col("has_port"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_with_port"),
            F.sum(F.when(F.col("has_query"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_with_query"),
            F.sum(F.when(F.col("has_userinfo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_with_userinfo"),
        )
        .orderBy("domain")
    )


# ---------------------------------------------------------------------------
# DSIR-style importance selection — target-vs-raw bigram-LM log-ratio
# ---------------------------------------------------------------------------


@register(
    "a0_dsir_importance_select",
    """
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    occ AS (SELECT doc_id, lang, t, UNNEST(range(0, len(t) - 1)) AS i FROM toks),
    pairs AS (
      SELECT doc_id, lang, t[CAST(i AS BIGINT) + 1] AS w1,
             t[CAST(i AS BIGINT) + 2] AS w2
      FROM occ
    ),
    bg AS (
      SELECT doc_id, lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS k
      FROM pairs GROUP BY doc_id, lang, w1, w2
    ),
    c12t AS (SELECT w1, w2, CAST(SUM(k) AS BIGINT) AS c FROM bg
             WHERE lang = 'en' GROUP BY w1, w2),
    c1t AS (SELECT w1, CAST(SUM(k) AS BIGINT) AS c FROM bg
            WHERE lang = 'en' GROUP BY w1),
    vt AS (SELECT COUNT(DISTINCT w) AS v FROM (
      SELECT w1 AS w FROM bg WHERE lang = 'en'
      UNION ALL SELECT w2 FROM bg WHERE lang = 'en')),
    c12r AS (SELECT w1, w2, CAST(SUM(k) AS BIGINT) AS c FROM bg GROUP BY w1, w2),
    c1r AS (SELECT w1, CAST(SUM(k) AS BIGINT) AS c FROM bg GROUP BY w1),
    vr AS (SELECT COUNT(DISTINCT w) AS v FROM (
      SELECT w1 AS w FROM bg UNION ALL SELECT w2 FROM bg)),
    scored AS (
      SELECT bg.doc_id, bg.lang, bg.k,
             CAST(FLOOR(ln(COALESCE(c12t.c, 0) + 1) * 1000000) AS BIGINT)
               - CAST(FLOOR(ln(COALESCE(c1t.c, 0) + vt.v) * 1000000) AS BIGINT)
               - CAST(FLOOR(ln(c12r.c + 1) * 1000000) AS BIGINT)
               + CAST(FLOOR(ln(c1r.c + vr.v) * 1000000) AS BIGINT) AS diff
      FROM bg
      LEFT JOIN c12t ON c12t.w1 = bg.w1 AND c12t.w2 = bg.w2
      LEFT JOIN c1t ON c1t.w1 = bg.w1
      JOIN c12r ON c12r.w1 = bg.w1 AND c12r.w2 = bg.w2
      JOIN c1r ON c1r.w1 = bg.w1
      CROSS JOIN vt CROSS JOIN vr
    ),
    perdoc AS (
      SELECT doc_id, MIN(lang) AS lang,
             CAST(SUM(k) AS BIGINT) AS n_bigrams,
             CAST(SUM(k * diff) AS BIGINT) AS importance_micro
      FROM scored GROUP BY doc_id
    )
    SELECT doc_id, lang, n_bigrams, importance_micro, CAST(rn AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (ORDER BY importance_micro DESC, doc_id) AS rn
      FROM perdoc
    ) WHERE rn <= 200
    ORDER BY rank
    """,
)
def a0_dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (operators/lmscore.dsir_importance_micro):
    target model = the corpus's 'en' documents, raw model = the whole
    corpus; importance = target-vs-raw bigram-LM log-ratio in exact
    micro-nats, top-200 selected with a total tiebreak. English documents
    should dominate the selection — the importance-resampling effect the
    method exists for, visible in the ``lang`` column. Selection is a
    TakeOrdered limit (no global sort materialization); the bounded
    200-row result then gets its rank from a single-partition window."""
    from pyspark.sql import Window

    from ..operators.lmscore import dsir_importance_micro

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    imp = dsir_importance_micro(
        docs, docs.filter(F.col("lang") == "en"), hot_threshold=1000
    )
    sel = (
        imp.join(docs.select("doc_id", "lang"), "doc_id")
        .orderBy(F.desc("importance_micro"), "doc_id")
        .limit(200)
    )
    w = Window.orderBy(F.desc("importance_micro"), "doc_id")
    return sel.withColumn("rank", F.row_number().over(w).cast("bigint")).select(
        "doc_id", "lang", "n_bigrams", "importance_micro", "rank"
    )


# ---------------------------------------------------------------------------
# Quality-weighted (soft) sampling — operators/sampling.score_weighted_sample
# ---------------------------------------------------------------------------


@register(
    "a0_quality_weighted_sample",
    f"""
    WITH scored AS (
      SELECT doc_id, lang, {_PREP_SCORE_DUCK} AS score FROM documents
    ),
    flagged AS (
      SELECT *,
             {h60_duck("CAST(doc_id AS VARCHAR)")} % 10000
               < CAST(ROUND(LEAST(1.0, GREATEST(0.0, score)) * 10000) AS BIGINT)
               AS kept
      FROM scored
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           ROUND(AVG(score), 4) AS avg_score_all,
           ROUND(AVG(CASE WHEN kept THEN score END), 4) AS avg_score_kept
    FROM flagged GROUP BY lang ORDER BY lang
    """,
)
def a0_quality_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft quality filtering (operators/sampling.score_weighted_sample):
    each document survives with probability equal to its quality score —
    the continuous counterpart to the prep pipeline's hard score gate,
    keeping quality MASS proportional instead of cliff-edged. Per-language
    report contrasts the kept sample's average score against the full
    corpus (the kept average must shift up). Deterministic: the per-row
    keep decision is the engine's identity-hash contract, replayed
    bit-for-bit by the oracle. Both aggregates are one pass each over the
    map-side-scored corpus; no shuffle before the per-language rollup."""
    from ..operators.sampling import score_weighted_sample

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
    scored = d.select("doc_id", "lang", score.alias("score"))
    kept = score_weighted_sample(scored, "score")
    all_agg = scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("score"), 4).alias("avg_score_all"),
    )
    kept_agg = kept.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.round(F.avg("score"), 4).alias("avg_score_kept"),
    )
    return (
        all_agg.join(kept_agg, "lang", "left")
        .select(
            "lang",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            "avg_score_all",
            "avg_score_kept",
        )
        .orderBy("lang")
    )

# ---------------------------------------------------------------------------
# Deterministic train/val/test split (partition, not sample)
# ---------------------------------------------------------------------------


@register(
    "a0d_train_split_report",
    f"""
    WITH b AS (
      SELECT lang, n_chars,
             {h60_duck("'split' || '#' || (CAST(doc_id AS VARCHAR))")} % 10000 AS bkt
      FROM documents
    )
    SELECT CASE WHEN bkt < 8000 THEN 'train'
                WHEN bkt < 9000 THEN 'val'
                ELSE 'test' END AS split,
           lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars
    FROM b GROUP BY 1, 2 ORDER BY 1, 2
    """,
)
def a0d_train_split_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """operators/sampling.assign_splits: every document deterministically
    assigned to exactly one of train(80%)/val(10%)/test(10%) by where
    h60('split' || '#' || doc_id) lands among the cumulative thresholds —
    a PARTITION of the corpus (the sampling family above draws subsets).
    Membership is a pure function of row identity: the same doc lands in
    the same split on every engine, every reshard, every retry, so a
    test document can never migrate into train on re-processing (the
    decontamination property df.randomSplit does not have). Map-side
    CASE during the scan; the report aggregates per (split, lang)."""
    from ..operators.sampling import assign_splits

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    tagged = assign_splits(
        docs,
        "CAST(doc_id AS STRING)",
        {"train": 0.8, "val": 0.1, "test": 0.1},
    )
    return (
        tagged.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .orderBy("split", "lang")
    )


def _temperature_mixture_report(
    spark: SparkSession, sf_dir: str, temperature: float | tuple[int, int]
) -> DataFrame:
    from ..operators.mixing import mix_corpus_temperature

    docs = _t(spark, sf_dir, "documents").select("doc_id", "source")
    totals = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n_total"))
    kept = (
        mix_corpus_temperature(docs, temperature=temperature)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        totals.join(kept, "source", "left")
        .select(
            "source",
            "n_total",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            F.round(
                F.coalesce("n_kept", F.lit(0)).cast("double") / F.col("n_total"),
                4,
            ).alias("kept_frac"),
        )
        .orderBy("source")
    )


@register(
    "a0f_temperature_mixture",
    # T=0.5 keeps the whole rate chain inside IEEE-correctly-rounded
    # operations (divide, sqrt, floor) so the oracle recomputes the
    # thresholds bit-identically from the same counts — the dyadic chain
    # of operators/mixing.dyadic_pow at exponent 1/2.
    f"""
    WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    mn AS (SELECT MIN(n) AS nmin FROM counts),
    thr AS (
      SELECT source, n,
             CAST(FLOOR(SQRT(CAST(nmin AS DOUBLE) / n) * 1000000 + 0.5) AS BIGINT) AS t
      FROM counts, mn
    ),
    kept AS (
      SELECT d.source, COUNT(*) AS n_kept
      FROM documents d JOIN thr USING (source)
      WHERE ({h60_duck("CAST(doc_id AS VARCHAR)")}) % 1000000 < thr.t
      GROUP BY d.source
    )
    SELECT thr.source, thr.n AS n_total,
           COALESCE(kept.n_kept, 0) AS n_kept,
           ROUND(CAST(COALESCE(kept.n_kept, 0) AS DOUBLE) / thr.n, 4) AS kept_frac
    FROM thr LEFT JOIN kept USING (source)
    ORDER BY thr.source
    """,
)
def a0f_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature resampling at T=0.5 (operators/mixing.
    mix_corpus_temperature): kept counts reshape toward p_i ∝ sqrt(n_i)
    — the mT5/XLM-R multilingual recipe — by downsampling only (the
    smallest source keeps everything), membership deterministic in
    doc_id. Report: per-source totals, kept counts, kept fraction."""
    return _temperature_mixture_report(spark, sf_dir, 0.5)


def _mixture_t75_oracle() -> str:
    # the oracle replays dyadic_pow's exact sqrt/multiply chain for
    # e = 1 - 0.75 = 1/4 — every step IEEE-correctly-rounded on both
    # engines, so the thresholds agree bit-for-bit (mixing.dyadic_pow_sql
    # generates the chain so oracle and engine can never drift apart)
    from ..operators.mixing import dyadic_pow_sql

    rate = dyadic_pow_sql("CAST(nmin AS DOUBLE) / n", 1, 2)
    return f"""
    WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    mn AS (SELECT MIN(n) AS nmin FROM counts),
    thr AS (
      SELECT source, n,
             CAST(FLOOR(({rate}) * 1000000 + 0.5) AS BIGINT) AS t
      FROM counts, mn
    ),
    kept AS (
      SELECT d.source, COUNT(*) AS n_kept
      FROM documents d JOIN thr USING (source)
      WHERE ({h60_duck("CAST(doc_id AS VARCHAR)")}) % 1000000 < thr.t
      GROUP BY d.source
    )
    SELECT thr.source, thr.n AS n_total,
           COALESCE(kept.n_kept, 0) AS n_kept,
           ROUND(CAST(COALESCE(kept.n_kept, 0) AS DOUBLE) / thr.n, 4) AS kept_frac
    FROM thr LEFT JOIN kept USING (source)
    ORDER BY thr.source
    """


def _mixture_t13_oracle() -> str:
    # NON-dyadic rational temperature (round 15 — closes the carried
    # exactness item): T = 1/3, exponent 1 - T = 2/3. No float pow on
    # either engine: the 1e-6-grid threshold t is the largest integer
    # with (2t-1)^3 * n^2 <= (2e6)^3 * nmin^2 — a pure-bigint inequality
    # the engine evaluates in Python int and the oracle replays here in
    # HUGEINT products, so agreement is by construction, not by two
    # libms happening to round alike.
    from ..operators.mixing import exact_rational_threshold_sql

    t_sub = exact_rational_threshold_sql("counts.n", "mn.nmin", 2, 3)
    return f"""
    WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
    mn AS (SELECT MIN(n) AS nmin FROM counts),
    thr AS (
      SELECT source, n, {t_sub} AS t
      FROM counts, mn
    ),
    kept AS (
      SELECT d.source, COUNT(*) AS n_kept
      FROM documents d JOIN thr USING (source)
      WHERE ({h60_duck("CAST(doc_id AS VARCHAR)")}) % 1000000 < thr.t
      GROUP BY d.source
    )
    SELECT thr.source, thr.n AS n_total,
           COALESCE(kept.n_kept, 0) AS n_kept,
           ROUND(CAST(COALESCE(kept.n_kept, 0) AS DOUBLE) / thr.n, 4) AS kept_frac
    FROM thr LEFT JOIN kept USING (source)
    ORDER BY thr.source
    """


@register("a0m_temperature_mixture_t13", _mixture_t13_oracle())
def a0m_temperature_mixture_t13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature resampling at a NON-dyadic rational temperature
    (round 15): T = 1/3 passed as the tuple ``(1, 3)`` routes
    ``temperature_mixture_rates`` through the pure-integer threshold
    (operators/mixing._exact_rational_threshold) — kept_i ∝ n_i^(1/3),
    flattening harder than the shipped T=0.5/0.75, with ZERO floating
    point in the rate computation on either engine. Completes the
    temperature family: any rational T in (0, 1] is now cross-engine
    hash-exact, dyadic or not."""
    return _temperature_mixture_report(spark, sf_dir, (1, 3))


@register("a0g_temperature_mixture_t75", _mixture_t75_oracle())
def a0g_temperature_mixture_t75(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature resampling at an ARBITRARY dyadic temperature
    (round-10 verdict task 4): T=0.75 keeps more of the big sources than
    T=0.5 (kept_i ∝ n_i^0.75). The exponent 1-T = 1/4 is dyadic, so
    mixing.dyadic_pow evaluates the rate as SQRT(SQRT(nmin/n)) — a fixed
    chain of correctly-rounded IEEE ops the oracle replays verbatim —
    making ANY T = 1 - k/2^m cross-engine hash-exact, not just the
    shipped 0.5."""
    return _temperature_mixture_report(spark, sf_dir, 0.75)
