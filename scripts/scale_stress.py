"""Scale-stress harness: measure dedup/ANN wall-clock growth at 1x/3x/10x
the sf0.1 corpus, with deliberately injected skew (round-2 verdict item 3).

Corpus construction (deterministic, multi-file parquet under
``.scale_data/`` — gitignored; results land in SCALE_STRESS.json +
BASELINE.md):

- documents xN: replica k offsets doc_id by k*10_000_000 and tags every
  WORD with an ``r{k}w`` prefix, so replicas share NO shingles — output
  pair structure replicates exactly N times (growth in true pairs is
  linear by construction, so any superlinear wall-clock is algorithmic).
  The per-replica corpus includes the same synthetic dups the harness
  uses (exact copy of every 7th doc, first-word-dropped copy of every
  11th).
- skewed shingle: 30% of docs get an UNtagged boilerplate sentence
  appended, shared across all replicas — its shingles' document frequency
  grows linearly with N (~18k at 10x) and cross-replica candidate pairs
  through them grow QUADRATICALLY (~1.6e8 at 10x). The df-cap
  (max_df=1000, firing at every scale) is what keeps n-gram Jaccard
  sub-quadratic; this is the designed melt-the-cluster input.
- embeddings xN: replica k offsets vec_id by k*10_000_000 and flips the
  sign of every dim where (dim_index + k) % 3 == 0. Sign flips preserve
  unit norm and preserve all WITHIN-replica cosines exactly (s_i^2 = 1),
  so near-dup pairs replicate N times, while cross-replica cosines drop
  far below threshold.
- skewed label: label := 99 wherever vec_id % 10 < 3 — one label owns 30%
  of all vectors at every scale (~6k vectors at 10x), stressing the
  sign-LSH sub-bucketing inside cosine dedup's label blocks.

Run:  python scripts/scale_stress.py            (all scales, ~5-10 min)
      python scripts/scale_stress.py --scales 1,3
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from gcp_serverless_etl_pipeline_lab_spark.operators import cluster, dedup, similarity  # noqa: E402
from gcp_serverless_etl_pipeline_lab_spark.session import get_session  # noqa: E402

BASE_SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DATA_DIR = os.path.join(REPO, ".scale_data")
EMB_DIM = 64
NGRAM_MAX_DF = 1000
BOILERPLATE = (
    " common boilerplate footer sentence shared across many documents"
    " in this synthetic corpus for skew stress"
)


def _doc_replica(d: DataFrame, k: int) -> DataFrame:
    base = d.select((F.col("doc_id") + k * 10_000_000).alias("doc_id"), "text")
    if k > 0:
        base = base.withColumn(
            "text",
            F.expr(
                f"array_join(transform(split(text, ' '), w -> concat('r{k}w', w)), ' ')"
            ),
        )
    # 30% of docs share the UNtagged boilerplate across replicas → one
    # shingle family whose df grows with N.
    return base.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 10 < 3, F.concat(F.col("text"), F.lit(BOILERPLATE))
        ).otherwise(F.col("text")),
    )


def _synth_dups(d: DataFrame) -> DataFrame:
    exact = d.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    near = d.filter(F.col("doc_id") % 11 == 0).select(
        (F.col("doc_id") + 2_000_000).alias("doc_id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
    )
    return d.unionAll(exact).unionAll(near)


def _emb_replica(e: DataFrame, k: int) -> DataFrame:
    out = e.select(
        (F.col("vec_id") + k * 10_000_000).alias("vec_id"),
        "label",
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("embedding"),
    )
    if k > 0:
        # Per-replica sign pattern from the BITS of k over dim%4 groups —
        # patterns are pairwise distinct for k < 16 (two replicas differing
        # in one bit of k differ in 16 of 64 signs → cross-replica cosine
        # ≤ 0.5), unlike a (i+k)%m scheme, which collides for k ≡ k' (mod m)
        # and silently creates exact cross-replica duplicates.
        flips = ", ".join(
            str((k >> (i % 4)) & 1) for i in range(EMB_DIM)
        )
        out = out.withColumn(
            "embedding",
            F.expr(
                f"zip_with(array({flips}), embedding, "
                "(f, x) -> IF(f = 1, -x, x))"
            ),
        )
    # near-dup synthesis (mirrors harness._corpora._vec_corpus): every 13th
    # vector gets a dim-1-perturbed renormalized copy at +1M — so true
    # cosine pairs exist and replicate exactly N times. Sign flips commute
    # with the perturbation structure within a replica.
    pert = (
        out.filter((F.col("vec_id") % 10_000_000) % 13 == 0)
        .withColumn(
            "p",
            F.expr(
                f"transform(sequence(1, {EMB_DIM}), i -> "
                "element_at(embedding, i) + IF(i = 1, 0.05D, 0D))"
            ),
        )
        .withColumn(
            "nrm",
            F.expr("sqrt(aggregate(p, CAST(0 AS DOUBLE), (a, y) -> a + y * y))"),
        )
        .select(
            (F.col("vec_id") + 1_000_000).alias("vec_id"),
            "label",
            F.expr("transform(p, x -> x / nrm)").alias("embedding"),
        )
    )
    out = out.unionAll(pert)
    # hot label: 30% of every replica lands in label 99
    return out.withColumn(
        "label",
        F.when(F.col("vec_id") % 10 < 3, F.lit(99)).otherwise(F.col("label")),
    )


def _event_replica(ev: DataFrame, k: int) -> DataFrame:
    """Replica k offsets event_id and user_id by k*10M (within-replica
    funnel/cohort/session structure replicates exactly), then routes 20%
    of events to ONE shared hot user (42) across ALL replicas — the
    power-user skew that stresses per-user aggregations and joins: the
    hot user's event count grows linearly with N while every other user
    stays constant-size."""
    out = ev.select(
        (F.col("event_id") + k * 10_000_000).alias("event_id"),
        (F.col("user_id") + k * 10_000_000).alias("user_id"),
        "event_type",
        "ts",
        "value",
        "props",
    )
    return out.withColumn(
        "user_id",
        F.when(F.col("event_id") % 5 == 0, F.lit(42)).otherwise(F.col("user_id")),
    )


def generate(spark: SparkSession, n: int) -> str:
    out = os.path.join(DATA_DIR, f"x{n}")
    # per-table: a corpus generated by an older revision (docs+embs only)
    # gains the events table without re-writing the others
    if not os.path.isdir(os.path.join(out, "documents")):
        d = spark.read.parquet(os.path.join(BASE_SF, "documents.parquet")).select(
            "doc_id", "text"
        )
        docs = None
        for k in range(n):
            dk = _synth_dups(_doc_replica(d, k))
            docs = dk if docs is None else docs.unionAll(dk)
        docs.repartition(4 * n).write.mode("overwrite").parquet(
            os.path.join(out, "documents")
        )
    if not os.path.isdir(os.path.join(out, "embeddings")):
        e = spark.read.parquet(os.path.join(BASE_SF, "embeddings.parquet"))
        embs = None
        for k in range(n):
            ek = _emb_replica(e, k)
            embs = ek if embs is None else embs.unionAll(ek)
        embs.repartition(2 * n).write.mode("overwrite").parquet(
            os.path.join(out, "embeddings")
        )
    if not os.path.isdir(os.path.join(out, "events")):
        ev_base = spark.read.parquet(os.path.join(BASE_SF, "events.parquet"))
        evs = None
        for k in range(n):
            vk = _event_replica(ev_base, k)
            evs = vk if evs is None else evs.unionAll(vk)
        evs.repartition(4 * n).write.mode("overwrite").parquet(
            os.path.join(out, "events")
        )
    return out


def _cohort_weekly(ev: DataFrame) -> DataFrame:
    # mirrors harness.events.cohort_retention_weekly on a raw events DF
    activity = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("d").alias("c"))
    offsets = activity.join(cohort, "user_id").select(
        "user_id", "c", F.datediff("d", "c").alias("day_offset")
    )
    return (
        offsets.filter(F.col("day_offset").isin([0, 7, 14, 21, 28]))
        .groupBy("c", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


def _funnel(ev: DataFrame) -> DataFrame:
    # mirrors harness.events.funnel_signup_view_purchase
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


def _ops(spark: SparkSession, path: str):
    from gcp_serverless_etl_pipeline_lab_spark.operators import (
        lmscore,
        retrieval,
        scd2,
        seqdedup,
        sketchfreq,
        timeseries,
    )

    docs = spark.read.parquet(os.path.join(path, "documents"))
    embs = spark.read.parquet(os.path.join(path, "embeddings"))
    events = spark.read.parquet(os.path.join(path, "events"))
    queries = embs.filter(F.col("vec_id") < 10)
    return {
        # Sequence-level dedup: the untagged boilerplate sentence (16
        # tokens, 30% of docs at every replica) is a HOT repeated span —
        # its occurrence list grows linearly with N, and the composite-MIN
        # first-wins aggregation must absorb it map-side (the design
        # argument in operators/seqdedup.py step 3, measured here).
        "seq_dedup_spans": lambda: seqdedup.repeated_spans(
            docs, w=16, stride=8, min_docs=2
        ),
        # BM25 with a HOT query term: 'boilerplate' appears in 30% of all
        # docs across every replica, so its posting list grows linearly
        # with N — the df/N/avgdl broadcast and map-side term filter must
        # keep growth linear (partial aggregation absorbs the hot term).
        "bm25_hot_term": lambda: retrieval.bm25_topk(
            docs, ["boilerplate", "footer", "common"], k=10
        ),
        # Cohort retention with the hot user owning 20%·N of events:
        # the (user, day) distinct and the per-user cohort agg both key on
        # composites or partial-aggregate, so no single reducer sees the
        # hot user's full event list.
        "cohort_retention_weekly": lambda: _cohort_weekly(events),
        # Three-stage funnel: per-stage per-user MIN aggregations and
        # survivor joins; hot user = hot probe key against 1-row build.
        "funnel_signup_view_purchase": lambda: _funnel(events),
        # Dense-key spine: per-USER hourly grid (users × 720 buckets grows
        # linearly with N; ~10.8M generated spine rows at x10); the LOCF
        # window sorts 720 rows per user regardless of event volume.
        "events_gapfill_locf_users": lambda: timeseries.gapfill_locf(
            events, key_col="user_id", bucket="1 hour", cents_avg=True
        ),
        # Bigram LM scoring under Zipf-head skew: the untagged boilerplate
        # bigrams appear in 30% of docs at EVERY replica, so their corpus
        # counts grow linearly with N — they must ride the hybrid join's
        # broadcast hot leg (operators/lmscore.py) or the (w1,w2) shuffle
        # develops a linearly-growing hot key.
        "bigram_lm_scores": lambda: lmscore.doc_logprob_micro(
            docs, hot_threshold=1000
        ),
        # SCD2 over the hot user: user 42 owns 20%·N of all events, so its
        # window partition grows linearly — the per-key sort is one task
        # but linear work; everything else partial-aggregates.
        "scd2_user_history": lambda: scd2.scd2_history(
            events,
            key_col="user_id",
            state_col="event_type",
            ts_col="ts",
            tiebreak_col="event_id",
        ),
        # CMS sketch build: shuffle bounded at d·w cells per partition by
        # map-side partial agg regardless of N — growth should track the
        # scan, not the key distribution (hot user 42 lands in 4 counters).
        "cms_heavy_hitters": lambda: sketchfreq.cms_heavy_hitters(
            events, "user_id", top_n=20
        ),
        # Prefix-filtered fuzzy join on ENTITY-SHAPED names: 20-char text
        # prefix + '#'-joined doc_id (entity names are distinct strings
        # whose id digits carry rare grams — the operator's contract), a
        # char dropped mid-name as the probe typo. Growth must track the
        # name count; the word-tagged doc replicas are NOT a valid input
        # here — they collapse the gram vocabulary to O(1) in corpus
        # size, where NO gram blocking can work and candidates go
        # quadratic (measured 19x at 10x; documented operator limit — use
        # the minhash/LSH dedup family for minimal-vocab corpora).
        "fuzzy_name_join": lambda: (
            lambda fj: fj.fuzzy_best_match(
                docs.filter(F.col("doc_id") % 3 == 0).select(
                    F.col("doc_id").alias("p_id"),
                    F.lower(
                        F.concat(
                            F.substring("text", 1, 9),
                            F.substring("text", 11, 10),
                            F.lit("#"),
                            F.reverse(F.col("doc_id").cast("string")),
                        )
                    ).alias("p_name"),
                ),
                docs.select(
                    F.col("doc_id").alias("t_id"),
                    F.lower(
                        F.concat(
                            F.substring("text", 1, 20),
                            F.lit("#"),
                            F.reverse(F.col("doc_id").cast("string")),
                        )
                    ).alias("t_name"),
                ),
                "p_id",
                "p_name",
                "t_id",
                "t_name",
                threshold=0.6,
                q=5,
            )
        )(
            __import__(
                "gcp_serverless_etl_pipeline_lab_spark.operators.fuzzyjoin",
                fromlist=["fuzzy_best_match"],
            )
        ),
    } | {
        "dedup_exact": lambda: dedup.exact_dup_pairs(docs),
        # Gram novelty: one gram shuffle with map-side MIN — the 30%
        # boilerplate makes its grams corpus-wide hot, exactly the Zipf
        # head partial aggregation must absorb before the exchange; the
        # per-doc join side grows linearly.
        "gram_novelty": lambda: dedup.gram_novelty(docs),
        "dedup_ngram_jaccard_capped": lambda: dedup.ngram_jaccard_pairs(
            docs, threshold=0.8, max_df=NGRAM_MAX_DF
        ),
        "dedup_minhash_lsh": lambda: dedup.minhash_lsh_pairs(docs),
        "dedup_simhash": lambda: dedup.simhash_pairs(docs),
        "dedup_embedding_cosine": lambda: dedup.embedding_cosine_pairs(
            embs, EMB_DIM, 0.99
        ),
        "ann_lsh_multitable": lambda: similarity.lsh_topk_multitable(
            embs, queries, EMB_DIM, tables=8, planes_per_table=2
        ),
        "ann_ivf_trained": lambda: similarity.ivf_trained_topk(
            embs, queries, EMB_DIM, cells=8, iters=2, nprobe=2
        ),
        # Cluster resolution consumes the capped ngram + exact pair sets;
        # growth should track the (linear) growth of the edge set, with a
        # constant number of CC rounds (components never span replicas).
        "dedup_cluster_resolve": lambda: cluster.resolve_clusters(
            dedup.exact_dup_pairs(docs, ordered=False)
            .select(
                F.col("kept_id").alias("doc_a"), F.col("dropped_id").alias("doc_b")
            )
            .unionAll(
                dedup.ngram_jaccard_pairs(
                    docs, threshold=0.8, max_df=NGRAM_MAX_DF, ordered=False
                ).select("doc_a", "doc_b")
            )
        ),
        # Exact block-local kNN: EXPECTED to go quadratic in the hot label
        # (30% of vectors share label 99) — the measured melt that
        # motivates the LSH variant below.
        "knn_graph_blocked": lambda: similarity.knn_graph_blocked(
            embs, EMB_DIM, k=3
        ),
        # LSH-candidate kNN at the shipped default (probe_hamming=3,
        # retrieval recall >= 0.5): candidate mass is ~37% of within-
        # block pairs, so with the corpus's FIXED 10-label x 256-bucket
        # blocking the growth curve is block-quadratic with a recall-
        # proportional constant. The scale answer for big corpora is
        # trained-IVF cells (knn_graph_ivf_cells: cell count grows with
        # n, growth ~1.1x above), not a wider LSH probe.
        "knn_graph_lsh": lambda: similarity.knn_graph_lsh(embs, EMB_DIM, k=3),
        # ...and the maximum-pruning near-dup config (probe_hamming=1,
        # ~3.9% candidate mass) tracked separately so both ends of the
        # documented recall-vs-cost trade keep a measured growth row.
        "knn_graph_lsh_p1": lambda: similarity.knn_graph_lsh(
            embs, EMB_DIM, k=3, probe_hamming=1
        ),
        # The size-routed graph FORCED onto its trained route (what big
        # corpora get): cell count grows with n (cells = n/cell_rows), so
        # per-vector candidates stay ~nprobe*cell_rows and total work is
        # linear — the designed answer to knn_graph_lsh's fixed-blocking
        # quadratic growth above. Cost includes k-means training on the
        # 10% hash sample each invocation (the operator's true cost).
        "knn_graph_auto_routed": lambda: similarity.knn_graph_auto(
            embs, EMB_DIM, k=3, route_threshold=0
        ),
        # Incremental dedup: every 5th doc of the grown corpus arrives as
        # a re-submission batch against the corpus itself — batch size
        # grows linearly with scale, base-side df-cap active.
        "dedup_incremental_batch": lambda: (
            lambda batch: __import__(
                "gcp_serverless_etl_pipeline_lab_spark.operators.incremental",
                fromlist=["classify_batch"],
            ).classify_batch(batch, docs, threshold=0.8, max_df=NGRAM_MAX_DF)
        )(
            docs.filter(F.col("doc_id") % 5 == 0).select(
                (F.col("doc_id") + 700_000_000).alias("doc_id"), "text"
            )
        ),
        # Index-probe incremental dedup: the SAME fixed batch (replica-0
        # docs, identical at every scale) probed against a base index
        # built ONCE per scale (untimed — that's the point: the build is
        # paid once per base snapshot, the probe is the nightly cost).
        # The flat-cost claim: probe wall should grow FAR slower than the
        # base (recompute grows with base size; the probe reads compact
        # postings and prunes to the batch's gram buckets).
        "dedup_incremental_index_probe": lambda: (
            lambda inc: inc.classify_batch_vs_index(
                spark,
                docs.filter(
                    (F.col("doc_id") % 5 == 0) & (F.col("doc_id") < 10_000_000)
                ).select((F.col("doc_id") + 700_000_000).alias("doc_id"), "text"),
                _ensure_incr_index(spark, path, docs),
                threshold=0.8,
            )
        )(
            __import__(
                "gcp_serverless_etl_pipeline_lab_spark.operators.incremental",
                fromlist=["classify_batch_vs_index"],
            )
        ),
        # SemDedup composition: cosine pairs (hot label + sub-buckets)
        # closed into clusters.
        "semantic_dedup_survivors": lambda: cluster.resolve_clusters(
            dedup.embedding_cosine_pairs(embs, EMB_DIM, 0.99).select(
                F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
            )
        ),
        # Quality-aware survivor selection (a0d_novelty_survivors, the
        # round-8 suite's heaviest query) at the REAL df-cap: exact+ngram
        # edge detection (cap firing on the injected boilerplate) + CC +
        # the one-gram-shuffle novelty scorer + one cluster-bounded
        # window. The added cost over dedup_cluster_resolve is the
        # novelty join + window — both keyed work that must grow with
        # the edge set, not quadratically.
        "novelty_survivors": lambda: cluster.select_survivors(
            cluster.resolve_clusters(
                dedup.exact_dup_pairs(docs, ordered=False)
                .select(
                    F.col("kept_id").alias("doc_a"),
                    F.col("dropped_id").alias("doc_b"),
                )
                .unionAll(
                    dedup.ngram_jaccard_pairs(
                        docs, threshold=0.8, max_df=NGRAM_MAX_DF, ordered=False
                    ).select("doc_a", "doc_b")
                )
            ),
            dedup.gram_novelty(docs),
            score_col="novelty",
        ),
        # DSIR importance: two bigram-LM scoring passes (target model =
        # every 4th doc). The 30%-boilerplate skew makes the boilerplate
        # bigrams corpus-wide heavy hitters whose counts grow linearly
        # with N — exactly the Zipf head the hybrid hot/cold join must
        # keep off the shuffle reducers.
        "dsir_importance": lambda: __import__(
            "gcp_serverless_etl_pipeline_lab_spark.operators.lmscore",
            fromlist=["dsir_importance_micro"],
        ).dsir_importance_micro(docs, docs.filter(F.col("doc_id") % 4 == 0)),
    }


def _ensure_incr_index(spark: SparkSession, scale_path: str, docs: DataFrame) -> str:
    """Build the persisted incremental-dedup base index for this scale's
    corpus if absent (build cost is deliberately OUTSIDE the timed probe —
    it is paid once per base snapshot, not per batch)."""
    idx = os.path.join(scale_path, "incr_index")
    if not os.path.exists(os.path.join(idx, "_MANIFEST.json")):
        from gcp_serverless_etl_pipeline_lab_spark.operators.incremental import (
            build_base_index,
        )

        t0 = time.time()
        build_base_index(docs, idx, max_df=NGRAM_MAX_DF)
        print(
            f"-- built incr index at {idx} in {time.time() - t0:.1f}s",
            file=sys.stderr,
        )
    return idx


def _stress_index_append(
    spark: SparkSession, path: str, n: int
) -> tuple[float, int]:
    """Append cost must track INCREMENT size, not base size: the base is
    FIXED at every scale (replica-0 docs, ~same corpus x1..x10) while the
    increment is half the scaled corpus (grows linearly with N). Each
    timed run appends into a fresh copy of the prebuilt base index (the
    copy is outside the timing; append mutates the index, so runs can't
    share one). Sub-linear growth vs N here means the nightly loop's
    append step scales with what arrived, not with what's accumulated."""
    import shutil
    import tempfile

    from gcp_serverless_etl_pipeline_lab_spark.operators.incremental import (
        append_to_index,
        build_base_index,
    )

    docs = spark.read.parquet(os.path.join(path, "documents"))
    base = docs.filter(F.col("doc_id") < 10_000_000)
    base_idx = os.path.join(path, "incr_base_fixed")
    if not os.path.exists(os.path.join(base_idx, "_MANIFEST.json")):
        t0 = time.time()
        build_base_index(base, base_idx, max_df=NGRAM_MAX_DF)
        print(
            f"-- built fixed base index at {base_idx} in {time.time() - t0:.1f}s",
            file=sys.stderr,
        )
    increment = docs.filter(F.col("doc_id") % 2 == 1).select(
        (F.col("doc_id") + 900_000_000).alias("doc_id"), "text"
    )
    out_rows = increment.count()
    elapsed = None
    for _ in range(2):
        work = tempfile.mkdtemp(prefix="incr_append_stress_")
        shutil.rmtree(work)
        shutil.copytree(base_idx, work)
        start = time.perf_counter()
        append_to_index(spark, increment, work, increment_id=f"x{n}")
        e = round(time.perf_counter() - start, 2)
        elapsed = e if elapsed is None else min(elapsed, e)
        shutil.rmtree(work, ignore_errors=True)
    return elapsed, out_rows


def _stress_bpe_train(spark: SparkSession, path: str, n: int) -> tuple[float, int]:
    """BPE training cost must track the DISTINCT-WORD table, which the
    replica word-prefixing grows linearly with N (r{k}w tags make every
    replica's vocabulary disjoint) — the worst realistic case; a real
    corpus's vocabulary grows sublinearly. 4 merges = 4 pair-count
    shuffles over the word table + 4 map-side folds."""
    from gcp_serverless_etl_pipeline_lab_spark.operators.bpetrain import (
        train_bpe_merges,
    )

    docs = spark.read.parquet(os.path.join(path, "documents"))
    elapsed = None
    merges = []
    for _ in range(2):
        start = time.perf_counter()
        merges = train_bpe_merges(docs, n_merges=4, min_pair_count=2)
        e = round(time.perf_counter() - start, 2)
        elapsed = e if elapsed is None else min(elapsed, e)
    return elapsed, len(merges)


def _stress_bpe_delta_merges(
    spark: SparkSession, path: str, n: int
) -> dict:
    """Deep BPE training (n_merges=256) with the DELTA pair-count rounds
    (round-10 verdict task 3) on a synthetic REAL vocabulary — the
    testdata corpora have ~31-46 distinct words, far too few to expose
    vocabulary-vs-touched-mass scaling, so the vocabulary here is
    100_000*n deterministic base-7-letter words (id -> conv base 7 ->
    a..g). Evidence recorded per scale:

    - sec / out_rows: clean uninstrumented delta run (the stress row);
    - early/late round means from an instrumented run: as merges
      specialize, the touched-word count collapses and the per-round
      wall follows it while the vocabulary stays constant — per-round
      cost tracks TOUCHED-WORD MASS, not vocabulary size;
    - full-recount per-round mean at the same vocabulary (32 rounds —
      every full round explodes the whole table, so its per-round cost
      is flat and vocabulary-bound)."""
    from gcp_serverless_etl_pipeline_lab_spark.operators.bpetrain import (
        train_bpe_merges,
    )

    vocab = 100_000 * n
    words = spark.range(vocab).select(
        F.expr(
            "translate(conv(CAST(id AS STRING), 10, 7), '0123456', 'abcdefg')"
        ).alias("text")
    )
    # per-round secs from round_stats exclude the instrumentation count
    # job (it runs after the round's wall is captured), so ONE run yields
    # both the clean total and the per-round shape
    stats: list[dict] = []
    merges = train_bpe_merges(
        words, n_merges=256, min_pair_count=1, round_stats=stats
    )
    early = [s for s in stats if 4 <= s["round"] <= 20]
    late = stats[-16:]

    fstats: list[dict] = []
    train_bpe_merges(
        words, n_merges=32, min_pair_count=1, incremental=False,
        round_stats=fstats,
    )

    def _mean(rows, key):
        return round(sum(r[key] for r in rows) / max(len(rows), 1), 3)

    return {
        "sec": round(sum(s["sec"] for s in stats), 2),
        "out_rows": len(merges),
        "vocab_words": vocab,
        "delta_early_round_sec": _mean(early, "sec"),
        "delta_late_round_sec": _mean(late, "sec"),
        "delta_early_touched_words": _mean(early, "touched_words"),
        "delta_late_touched_words": _mean(late, "touched_words"),
        "full_round_sec": _mean(fstats[3:], "sec"),
    }


def _stress_lexindex_query(spark: SparkSession, path: str, n: int) -> dict:
    """BM25 probe wall vs corpus size (round-11 verdict task 1): the
    lexical index is built once per scale (off-clock, cached like the
    dedup base index) and the SAME 3-term query probes it at every
    scale. The replica word-tagging makes replica-0 vocabulary terms'
    document frequency CONSTANT as the corpus grows — the targeted-probe
    case, where the matched-postings volume is flat and so must be the
    probe wall. The honest other side is also recorded: a query naming
    a boilerplate term (shared untagged across replicas, df ~ linear in
    N) pays for its own df growth — per-query cost tracks MATCHED
    POSTINGS, which is the design claim, not magic."""
    from gcp_serverless_etl_pipeline_lab_spark.operators.lexindex import (
        bm25_topk_from_index,
        build_lexical_index,
    )

    docs = spark.read.parquet(os.path.join(path, "documents"))
    idx = os.path.join(path, "lex_index")
    if not os.path.exists(os.path.join(idx, "_MANIFEST.json")):
        t0 = time.time()
        build_lexical_index(docs, idx)
        print(
            f"-- built lex index at {idx} in {time.time() - t0:.1f}s",
            file=sys.stderr,
        )

    def _probe(terms):
        best = None
        for _ in range(2):
            start = time.perf_counter()
            bm25_topk_from_index(spark, idx, terms, k=10).write.format(
                "noop"
            ).mode("overwrite").save()
            e = round(time.perf_counter() - start, 2)
            best = e if best is None else min(best, e)
        return best

    flat = _probe(["join", "filter", "vector"])  # replica-0 terms, df flat
    hot = _probe(["boilerplate", "footer", "shared"])  # df ~ linear in N
    return {"sec": flat, "out_rows": 10, "hot_term_probe_sec": hot}


def _deep_merge_table(depth: int) -> list[tuple[str, str, int]]:
    """A deterministic well-formed merge table over the base-7-letter
    vocabulary: for growing L, merge every length-L string's prefix with
    its last letter (prefixes are merged before they are referenced) —
    the apply path doesn't care how the table was trained, only how
    DEEP it is."""
    letters = "abcdefg"
    merges: list[tuple[str, str, int]] = []
    frontier = list(letters)
    while len(merges) < depth:
        nxt = []
        for s in frontier:
            for c in letters:
                merges.append((s, c, 1))
                nxt.append(s + c)
                if len(merges) >= depth:
                    return merges
        frontier = nxt
    return merges


def _stress_bpe_deep_apply(spark: SparkSession, path: str, n: int) -> dict:
    """Tokenization at REAL merge depth (round-11 verdict task 2): apply
    a 1024-merge table to the synthetic real-vocabulary corpus
    (20_000*n distinct words — moderated vs the delta-train stress's
    100k*n; see the inline comment). The join-back spelling (distinct-word
    fold + regroup) is the timed row; the chained per-occurrence
    spelling is probed at shallower depths on a FIXED 1000-word corpus —
    its cost there is pure plan analysis/codegen (data is negligible),
    and the superlinear growth of those numbers is the measured
    'unusable at 1024' evidence without hanging the harness."""
    from gcp_serverless_etl_pipeline_lab_spark.operators.bpetrain import (
        apply_bpe_merges,
    )

    # 20k*n distinct words (vs the delta-train stress's 100k*n): the
    # fold is deterministic CPU-bound work — vocab x merges interpreted
    # HOF steps — so one timed run at a moderated vocabulary carries the
    # same linearity signal at a fraction of the harness wall (a
    # min-of-2 at 100k*n measured 323 s PER RUN at x1, linear beyond)
    vocab = 20_000 * n
    words = spark.range(vocab).select(
        F.expr(
            "translate(conv(CAST(id AS STRING), 10, 7), '0123456', 'abcdefg')"
        ).alias("text")
    )
    deep = _deep_merge_table(1024)
    # The first call is this SESSION's first deep-HOF use (side ops are
    # not in the warmup set), so timing it records the true cold-start
    # tax of the nested-aggregate expression. Round-13 re-measurement:
    # the round-12 "85 s cold" did NOT reproduce on a quiet machine —
    # fresh-session cold measured 18.9 s full run vs 14.0 s immediately
    # after (≈5 s compile/codegen overhead), and the expression's
    # compile cost is DEPTH-INDEPENDENT (fresh-session cold at 64 vs
    # 1024 merges: 4.9 s vs 5.1 s on a 100-word table — the merge table
    # is broadcast DATA, not plan nodes, so there is nothing for a
    # segmented fold to bound; a chained 4x256 spelling measured warm-
    # identical, 3.9 vs 3.4 s). The 85 s reading was the round-12
    # ambient-load envelope, same as that round's 254.8 s bench total.
    start = time.perf_counter()
    out_rows = int(
        apply_bpe_merges(words, deep).agg(F.sum("n_tokens")).collect()[0][0]
    )
    cold = round(time.perf_counter() - start, 2)
    best = None
    for _ in range(2):
        start = time.perf_counter()
        apply_bpe_merges(words, deep).agg(F.sum("n_tokens")).collect()
        e = round(time.perf_counter() - start, 2)
        best = e if best is None else min(best, e)
    entry: dict = {
        "sec": best,
        "out_rows": out_rows,
        "merges": 1024,
        "vocab_words": vocab,
        "cold_first_run_sec": cold,
    }
    if n == 1:  # depth curve is scale-independent; measure once
        tiny = spark.range(1_000).select(
            F.expr(
                "translate(conv(CAST(id AS STRING), 10, 7), '0123456', 'abcdefg')"
            ).alias("text")
        )
        for depth in (32, 64, 128):
            start = time.perf_counter()
            try:
                apply_bpe_merges(
                    tiny, _deep_merge_table(depth), via_word_table=False
                ).agg(F.sum("n_tokens")).collect()
                entry[f"chained_tiny_{depth}_sec"] = round(
                    time.perf_counter() - start, 2
                )
            except Exception as exc:  # noqa: BLE001
                # the expected terminal failure mode of the chained
                # spelling at depth: the nested expression tree overflows
                # the JVM's serialization recursion before any data moves
                # — recorded, because THIS is the 'measured unusable'
                # evidence the join-back routing exists for
                msg = str(exc)
                if "StackOverflow" in msg:
                    msg = "StackOverflowError during task serialization"
                entry[f"chained_tiny_{depth}_sec"] = f"failed: {msg[:120]}"
                print(
                    f"-- chained depth {depth} failed (expected at real "
                    f"vocab depth): {msg[:200]}",
                    file=sys.stderr,
                )
                break  # deeper probes can only fail the same way
    return entry


def _stress_index_delete(spark: SparkSession, path: str, n: int) -> dict:
    """Delete cost + probe-after-delete overhead vs corpus size
    (round-13 deletes): a 1%-of-corpus takedown against the lexical
    index must cost a bounded membership probe + a delete-sized write —
    never a postings rewrite — so its wall should track the DELETE size,
    not the index; and the probe-side tombstone mask (an anti-join
    against a delete-sized broadcast frame) should add a small constant
    to the standard 3-term probe. Runs on a scratch COPY of the shared
    cached index (the other stress ops keep probing the original)."""
    import shutil

    from gcp_serverless_etl_pipeline_lab_spark.operators.lexindex import (
        bm25_topk_from_index,
        build_lexical_index,
        compact_lexical_index,
        delete_from_lexical_index,
    )

    docs = spark.read.parquet(os.path.join(path, "documents"))
    src = os.path.join(path, "lex_index")
    if not os.path.exists(os.path.join(src, "_MANIFEST.json")):
        build_lexical_index(docs, src)
    idx = os.path.join(path, "lex_index_delstress")
    shutil.rmtree(idx, ignore_errors=True)
    shutil.copytree(src, idx)

    def _probe():
        best = None
        for _ in range(2):
            start = time.perf_counter()
            bm25_topk_from_index(
                spark, idx, ["join", "filter", "vector"], k=10
            ).write.format("noop").mode("overwrite").save()
            e = round(time.perf_counter() - start, 2)
            best = e if best is None else min(best, e)
        return best

    pre = _probe()
    doomed = docs.filter(F.col("doc_id") % 100 == 0).select("doc_id")
    start = time.perf_counter()
    delete_from_lexical_index(spark, doomed, idx, increment_id="stress-del")
    del_sec = round(time.perf_counter() - start, 2)
    masked = _probe()
    # full fold applies the tombstone physically — probe returns to the
    # unmasked shape
    start = time.perf_counter()
    compact_lexical_index(spark, idx)
    fold_sec = round(time.perf_counter() - start, 2)
    post_fold = _probe()
    shutil.rmtree(idx, ignore_errors=True)
    return {
        "sec": del_sec,
        "out_rows": int(doomed.count()),
        "probe_pre_delete_sec": pre,
        "probe_masked_sec": masked,
        "apply_fold_sec": fold_sec,
        "probe_post_fold_sec": post_fold,
    }


def _stress_phrase_query(spark: SparkSession, path: str, n: int) -> dict:
    """Exact-phrase probe wall vs corpus size (round-14 verdict task 4):
    a POSITIONAL lexical index is built once per scale (off-clock,
    cached on disk) and the same 2-word phrase probes it at every scale.
    Same honest two-sided design as the BM25 stress row: the replica-0
    phrase ('window join' — untagged replica-0 vocabulary) has FLAT
    matched-positions volume as the corpus grows, so its probe wall must
    stay flat; the boilerplate phrase ('boilerplate footer' — the shared
    untagged footer, occurrences ~ linear in N) pays for its own
    occurrence growth — per-query cost tracks MATCHED POSITIONS, the
    design claim. Also recorded: the positional artifact's build cost
    and on-disk size next to the postings' (the opt-in price)."""
    from gcp_serverless_etl_pipeline_lab_spark.operators.lexindex import (
        build_lexical_index,
        phrase_topk_from_index,
    )

    docs = spark.read.parquet(os.path.join(path, "documents"))
    idx = os.path.join(path, "lex_index_pos")
    build_sec = None
    if not os.path.exists(os.path.join(idx, "_MANIFEST.json")):
        t0 = time.time()
        build_lexical_index(docs, idx, positions=True)
        build_sec = round(time.time() - t0, 1)
        print(
            f"-- built positional lex index at {idx} in {build_sec}s",
            file=sys.stderr,
        )

    def _du(sub):
        total = 0
        for r, _, fs in os.walk(os.path.join(idx, sub)):
            for f in fs:
                try:
                    total += os.path.getsize(os.path.join(r, f))
                except OSError:
                    pass
        return total

    def _probe(phrase):
        best = None
        for _ in range(2):
            start = time.perf_counter()
            phrase_topk_from_index(spark, idx, phrase, k=10).write.format(
                "noop"
            ).mode("overwrite").save()
            e = round(time.perf_counter() - start, 2)
            best = e if best is None else min(best, e)
        return best

    flat = _probe(["window", "join"])  # replica-0 phrase, occurrences flat
    hot = _probe(["boilerplate", "footer"])  # occurrences ~ linear in N

    # proximity probe (round 15): same two-sided design — replica-0
    # terms' matched positions stay flat as the corpus grows, so the
    # window aggregate must stay flat; cost tracks matched positions ×
    # window width, never corpus size
    def _probe_near(terms, w):
        from gcp_serverless_etl_pipeline_lab_spark.operators.lexindex import (
            proximity_matching_docs,
        )

        best = None
        for _ in range(2):
            start = time.perf_counter()
            proximity_matching_docs(
                spark, idx, terms, window=w
            ).write.format("noop").mode("overwrite").save()
            e = round(time.perf_counter() - start, 2)
            best = e if best is None else min(best, e)
        return best

    near_flat = _probe_near(["window", "join", "filter"], 8)
    entry = {
        "sec": flat,
        "out_rows": 10,
        "hot_phrase_probe_sec": hot,
        "proximity_probe_sec": near_flat,
        "positions_bytes": _du("positions"),
        "postings_bytes": _du("postings"),
    }
    if build_sec is not None:
        entry["positional_build_sec"] = build_sec
    return entry


def _stress_nightly_delete(spark: SparkSession, path: str, n: int) -> dict:
    """Takedown as a nightly stage (round-14 verdict tasks 1+3): three
    delete increments land in a deletes_dir and ONE ``run_nightly`` call
    applies them (no appends — the delete-heavy, append-quiet workload
    the tombstone-pressure trigger exists for). Measured per scale:

    - ``sec``: the whole delete-stage call (3 increments; must track
      DELETE size — each increment is 1/300 of the corpus — never index
      size);
    - ``probe_pre/masked``: the standard 3-term BM25 probe before the
      deletes and with 3 active tombstones (the mask union price);
    - ``pressure_fold_sec`` + ``probe_post_fold``: a second nightly with
      ``compact_tombstones_over=3`` (generation count is far below
      compact_every, so ONLY the pressure trigger can fire) — probe cost
      must return to the unmasked baseline;
    - ``merged_purged_rows``: the corpus-copy purge, scoped to the one
      merged child holding doomed rows (the blast-radius contract: the
      untouched child is never rewritten)."""
    import shutil

    from gcp_serverless_etl_pipeline_lab_spark.operators.lexindex import (
        bm25_topk_from_index,
        build_lexical_index,
    )
    from gcp_serverless_etl_pipeline_lab_spark.streaming.nightly import (
        run_nightly,
    )

    docs = spark.read.parquet(os.path.join(path, "documents"))
    src = os.path.join(path, "lex_index")
    if not os.path.exists(os.path.join(src, "_MANIFEST.json")):
        build_lexical_index(docs, src)
    idx = os.path.join(path, "lex_index_nightlydel")
    shutil.rmtree(idx, ignore_errors=True)
    shutil.copytree(src, idx)
    aux = os.path.join(path, "nightlydel_aux")
    shutil.rmtree(aux, ignore_errors=True)
    inbox = os.path.join(aux, "inbox")
    os.makedirs(inbox)
    merged = os.path.join(aux, "merged")
    deletes = os.path.join(aux, "deletes")
    # merged corpus in two children; all doomed ids live in child A —
    # the purge must leave child B untouched
    docs.filter(F.col("doc_id") % 8 == 0).write.mode("overwrite").parquet(
        os.path.join(merged, "child=a")
    )
    docs.filter(F.col("doc_id") % 8 != 0).write.mode("overwrite").parquet(
        os.path.join(merged, "child=b")
    )
    for i in range(3):
        docs.filter(F.col("doc_id") % 2400 == i * 800).select(
            "doc_id"
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(deletes, f"take={i}")
        )

    def _probe():
        best = None
        for _ in range(2):
            start = time.perf_counter()
            bm25_topk_from_index(
                spark, idx, ["join", "filter", "vector"], k=10
            ).write.format("noop").mode("overwrite").save()
            e = round(time.perf_counter() - start, 2)
            best = e if best is None else min(best, e)
        return best

    pre = _probe()
    b_mtime = os.path.getmtime(os.path.join(merged, "child=b"))
    start = time.perf_counter()
    r = run_nightly(
        spark, inbox, lex_index_path=idx, merged_dir=merged,
        deletes_dir=deletes,
    )
    stage_sec = round(time.perf_counter() - start, 2)
    assert len(r["applied_deletes"]) == 3, r
    assert os.path.getmtime(os.path.join(merged, "child=b")) == b_mtime, (
        "purge rewrote a child with no doomed rows"
    )
    masked = _probe()
    start = time.perf_counter()
    r2 = run_nightly(
        spark, inbox, lex_index_path=idx, merged_dir=merged,
        deletes_dir=deletes, compact_every=1000, compact_tombstones_over=3,
    )
    fold_sec = round(time.perf_counter() - start, 2)
    assert r2["compacted"]["lex"] is not None, r2
    post_fold = _probe()
    n_del = sum(
        spark.read.parquet(os.path.join(deletes, f"take={i}")).count()
        for i in range(3)
    )
    shutil.rmtree(idx, ignore_errors=True)
    shutil.rmtree(aux, ignore_errors=True)
    return {
        "sec": stage_sec,
        "out_rows": n_del,
        "probe_pre_delete_sec": pre,
        "probe_masked_3tombs_sec": masked,
        "pressure_fold_sec": fold_sec,
        "probe_post_fold_sec": post_fold,
        "merged_purged_rows": r["purged_merged_docs"],
    }


def _stress_hybrid_batch(spark: SparkSession, path: str, n: int) -> dict:
    """Batch hybrid retrieval wall vs BATCH SIZE at each corpus scale
    (round-12 verdict task 7), plus the served-vs-scan overlap@10 row
    (task 5's 1x/10x measured table). Both persisted indexes are built
    once per scale (off-clock, cached on disk like the dedup base
    index); the timed rows are ``hybrid_topk_rrf_batch`` at B =
    10/100/1000 queries — per-query cost must FLATTEN as B grows (the
    postings pruning, per-term df, and cell probes are shared across
    the batch), and the B=1000 row must not blow up with corpus size.
    Each query carries two corpus-sampled terms plus one shared common
    term, so lexical legs overlap partially — the df-shared case the
    batch spelling exists for."""
    from gcp_serverless_etl_pipeline_lab_spark.operators.annindex import (
        build_ann_index,
    )
    from gcp_serverless_etl_pipeline_lab_spark.operators.lexindex import (
        build_lexical_index,
        hybrid_topk_rrf_batch,
        hybrid_topk_rrf_from_index,
    )
    from gcp_serverless_etl_pipeline_lab_spark.operators.retrieval import (
        hybrid_topk_rrf,
    )

    docs = spark.read.parquet(os.path.join(path, "documents"))
    emb = spark.read.parquet(os.path.join(path, "embeddings")).select(
        "vec_id", "embedding"
    )
    lex = os.path.join(path, "lex_index")  # shared with _stress_lexindex_query
    if not os.path.exists(os.path.join(lex, "_MANIFEST.json")):
        t0 = time.time()
        build_lexical_index(docs, lex)
        print(
            f"-- built lex index at {lex} in {time.time() - t0:.1f}s",
            file=sys.stderr,
        )
    ann = os.path.join(path, "ann_index")
    man_path = os.path.join(ann, "_MANIFEST.json")
    stale = False
    if os.path.exists(man_path):
        # round-13 bumped the manifest (train_sample_rate drives the
        # serving-side nprobe escalation) — a cached pre-r13 index would
        # silently skip the escalation this stress now measures
        with open(man_path) as fh:
            stale = "train_sample_rate" not in json.load(fh)
    if stale:
        import shutil

        shutil.rmtree(ann, ignore_errors=True)
    if not os.path.exists(man_path):
        t0 = time.time()
        build_ann_index(emb, ann, EMB_DIM, cells=8, iters=2, sample_rate=0.1)
        print(
            f"-- built ann index at {ann} in {time.time() - t0:.1f}s",
            file=sys.stderr,
        )

    # deterministic query batch (off-clock): the 1000 lowest replica-0
    # vec_ids as vectors, two corpus-sampled terms + one shared common
    # term per query. The testdata corpus has a SMALL vocabulary (~46
    # untagged words at x1, r{k}w-tagged replicas multiply it at x3/x10
    # — the same fact the bpe_delta stress documents), so term picks
    # CYCLE the sampled vocabulary: heavy term sharing across the batch
    # is the realistic shape here, and exactly the df-shared case the
    # batch spelling amortizes
    vocab = [
        r["w"]
        for r in docs.select(F.explode(F.split("text", " ")).alias("w"))
        .filter((F.col("w") != "") & (F.length("w") >= 3))
        .distinct()
        .orderBy("w")
        .limit(2002)
        .collect()
    ]
    qrows = emb.orderBy("vec_id").limit(1000).collect()
    common = ("join", "filter", "vector")
    nv = len(vocab)
    pairs = [
        (int(r["vec_id"]), t)
        for i, r in enumerate(qrows)
        for t in (vocab[(2 * i) % nv], vocab[(2 * i + 1) % nv], common[i % 3])
    ]

    entry: dict = {}
    for B in (10, 100, 1000):
        qv = spark.createDataFrame(qrows[:B], emb.schema)
        qt = spark.createDataFrame(pairs[: 3 * B], "query_id bigint, term string")
        best = None
        out_rows = None
        for _ in range(2):
            start = time.perf_counter()
            got = hybrid_topk_rrf_batch(
                spark, lex, ann, qt, qv, k=10, depth=50, nprobe=3
            )
            out_rows = got.count()
            e = round(time.perf_counter() - start, 2)
            best = e if best is None else min(best, e)
        entry[f"batch{B}_sec"] = best
        entry[f"batch{B}_per_query_ms"] = round(1000.0 * best / B, 1)
        if B == 100:
            entry["sec"] = best
            entry["out_rows"] = out_rows
    # escalated vs pinned-nprobe cost on the B=100 batch: this index is
    # sample-trained (sample_rate=0.1), so default serving auto-escalates
    # nprobe 3->6 (round-13 task 1) — the batchB rows above already pay
    # that; this row records what the same batch costs WITHOUT the
    # escalation, so the recall repair's price is explicit
    qv = spark.createDataFrame(qrows[:100], emb.schema)
    qt = spark.createDataFrame(pairs[:300], "query_id bigint, term string")
    best = None
    for _ in range(2):
        start = time.perf_counter()
        hybrid_topk_rrf_batch(
            spark, lex, ann, qt, qv, k=10, depth=50, nprobe=3,
            auto_escalate=False,
        ).count()
        e = round(time.perf_counter() - start, 2)
        best = e if best is None else min(best, e)
    entry["batch100_noescalate_sec"] = best
    # metadata-filtered retrieval (round-13 task 2): the same B=100
    # batch with a 1/3-selectivity allowed set applied inside both legs
    # — the filter is a narrow-id semi-join on matched postings and
    # probed cells, so its cost must stay a small constant over the
    # unfiltered batch at every scale
    allowed = docs.filter(F.col("doc_id") % 3 == 0).select("doc_id")
    best = None
    for _ in range(2):
        start = time.perf_counter()
        hybrid_topk_rrf_batch(
            spark, lex, ann, qt, qv, k=10, depth=50, nprobe=3,
            filter_ids=allowed,
        ).count()
        e = round(time.perf_counter() - start, 2)
        best = e if best is None else min(best, e)
    entry["batch100_filtered_sec"] = best
    # served-vs-scan overlap@10 over 5 single queries — the recall row
    # backing tests/test_hybrid_recall.py's measured table (the scan
    # spelling is exact on both legs; its corpus-scan cost is exactly
    # what the indexes exist to avoid, paid here once per scale).
    # Measured twice: the serving default (escalated for this sampled
    # model) and the pinned nprobe=3 the round-12 gap was measured at.
    for key, esc in (
        ("overlap_at10_vs_scan", True),
        ("overlap_at10_noescalate", False),
    ):
        hits = 0
        for i in range(5):
            qid = int(qrows[i]["vec_id"])
            terms = [vocab[(2 * i) % nv], vocab[(2 * i + 1) % nv], common[i % 3]]
            served = {
                r["doc_id"]
                for r in hybrid_topk_rrf_from_index(
                    spark, lex, ann, terms,
                    spark.createDataFrame([qrows[i]], emb.schema),
                    k=10, depth=50, nprobe=3, auto_escalate=esc,
                ).collect()
            }
            truth = {
                r["doc_id"]
                for r in hybrid_topk_rrf(
                    docs, emb, terms, qid, EMB_DIM, k=10, depth=50
                ).collect()
            }
            hits += len(served & truth) / max(len(truth), 1)
        entry[key] = round(hits / 5, 3)
    return entry


def _stress_purge_blast(spark: SparkSession, path: str, n: int) -> dict:
    """Merged-corpus purge READ cost vs blast radius (round-15 verdict
    task 2): the corpus sits in MANY fixed-size children (one per 6250
    contiguous doc_ids — the nightly-increment accumulation pattern;
    ~9 at x1, ~90 at x10) and every doomed id lives in child 0. Measured
    per scale:

    - ``cold_stats_backfill_sec`` / ``cold_children_read``: the FIRST
      delete night on a legacy dir (no `_child_stats.json`) — reads
      every child once, backfilling stats; this is the one-time price a
      pre-round-15 dir pays, and it grows with corpus size.
    - ``sec`` / ``warm_children_read``: the SECOND delete night (stats
      warm) — must read exactly the one overlapping child, so the
      wall-clock is FLAT across scales (the child is fixed-size) while
      ``warm_children_skipped`` grows with the corpus. That flatness is
      the task's contract: purge reads track the delete's blast radius,
      not corpus size or child count."""
    import shutil

    from gcp_serverless_etl_pipeline_lab_spark.streaming import (
        nightly as nightly_mod,
    )

    docs = spark.read.parquet(os.path.join(path, "documents"))
    aux = os.path.join(path, "purge_blast_aux")
    shutil.rmtree(aux, ignore_errors=True)
    merged = os.path.join(aux, "merged")
    w = 6250
    (
        docs.withColumn("child", F.floor(F.col("doc_id") / w))
        .write.mode("overwrite")
        .partitionBy("child")
        .parquet(merged)
    )
    for leftover in ("_SUCCESS",):
        try:
            os.remove(os.path.join(merged, leftover))
        except OSError:
            pass
    ids1 = docs.filter(
        (F.col("doc_id") < w) & (F.col("doc_id") % 37 == 0)
    ).select("doc_id")
    ids2 = docs.filter(
        (F.col("doc_id") < w) & (F.col("doc_id") % 41 == 3)
    ).select("doc_id")
    t0 = time.perf_counter()
    r1 = nightly_mod._purge_merged(spark, merged, ids1, "doc_id")
    cold = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    r2 = nightly_mod._purge_merged(spark, merged, ids2, "doc_id")
    warm = round(time.perf_counter() - t0, 2)
    assert r2["children_read"] == 1, r2
    shutil.rmtree(aux, ignore_errors=True)
    return {
        "sec": warm,
        "out_rows": r2["purged"],
        "children": r2["children"],
        "cold_stats_backfill_sec": cold,
        "cold_children_read": r1["children_read"],
        "cold_purged_rows": r1["purged"],
        "warm_children_read": r2["children_read"],
        "warm_children_skipped": r2["children_skipped"],
    }


def _stress_positions_backfill(spark: SparkSession, path: str, n: int) -> dict:
    """In-place positions backfill cost (round-15 verdict task 3): copy
    the shared non-positional lex index, run ``add_positions_to_index``
    from the corpus, then serve a phrase probe from the upgraded
    artifacts. The backfill is a one-time upgrade whose cost is ONE
    corpus pass plus the positions write — expected LINEAR in corpus
    size (``sec``/doc flat across scales is the honest contract; an
    upgrade cheaper than linear would have to skip text). The phrase
    probe afterwards must stay bucket-pruned-flat like the
    ``phrase_query`` row."""
    import shutil

    from gcp_serverless_etl_pipeline_lab_spark.operators.lexindex import (
        add_positions_to_index,
        build_lexical_index,
        phrase_topk_from_index,
    )

    docs = spark.read.parquet(os.path.join(path, "documents"))
    src = os.path.join(path, "lex_index")
    if not os.path.exists(os.path.join(src, "_MANIFEST.json")):
        build_lexical_index(docs, src)
    idx = os.path.join(path, "lex_index_posbf")
    shutil.rmtree(idx, ignore_errors=True)
    shutil.copytree(src, idx)
    t0 = time.perf_counter()
    gens = add_positions_to_index(spark, idx, docs)
    sec = round(time.perf_counter() - t0, 2)
    probe = None
    out_rows = 0
    for _ in range(2):
        t0 = time.perf_counter()
        out_rows = phrase_topk_from_index(
            spark, idx, ["common", "boilerplate"], k=10
        ).count()
        e = round(time.perf_counter() - t0, 2)
        probe = e if probe is None else min(probe, e)
    shutil.rmtree(idx, ignore_errors=True)
    return {
        "sec": sec,
        "out_rows": out_rows,
        "gens_backfilled": len(gens),
        "phrase_probe_after_backfill_sec": probe,
    }


SIDE_OPS = {
    "index_append": _stress_index_append,
    "bpe_train": _stress_bpe_train,
    "bpe_delta_merges256": _stress_bpe_delta_merges,
    "lexindex_query": _stress_lexindex_query,
    "bpe_deep_apply": _stress_bpe_deep_apply,
    "hybrid_batch": _stress_hybrid_batch,
    "index_delete": _stress_index_delete,
    "phrase_query": _stress_phrase_query,
    "nightly_delete": _stress_nightly_delete,
    "purge_blast_radius": _stress_purge_blast,
    "positions_backfill": _stress_positions_backfill,
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", default="1,3,10")
    ap.add_argument(
        "--ops", default="", help="comma-separated op-name substrings to run (default all)"
    )
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]
    op_filter = [s for s in args.ops.split(",") if s]

    spark = get_session(app_name="scale_stress")
    results: dict[str, dict] = {}
    rows_at: dict[str, dict[str, int]] = {}

    for n in scales:
        path = generate(spark, n)
        print(f"-- x{n} corpus at {path}", file=sys.stderr)

    def _selected(ops: dict) -> dict:
        if not op_filter:
            return ops
        return {k: v for k, v in ops.items() if any(s in k for s in op_filter)}

    # Warmup at the smallest scale (JIT/codegen; same rationale as bench.py)
    for name, build in _selected(
        _ops(spark, os.path.join(DATA_DIR, f"x{scales[0]}"))
    ).items():
        try:
            build().write.format("noop").mode("overwrite").save()
        except Exception as exc:  # warmup must not kill the run
            print(f"warmup {name}: {exc}", file=sys.stderr)

    for n in scales:
        path = os.path.join(DATA_DIR, f"x{n}")
        rows_at[f"x{n}"] = {
            "documents": spark.read.parquet(os.path.join(path, "documents")).count(),
            "embeddings": spark.read.parquet(os.path.join(path, "embeddings")).count(),
        }
        for name, build in _selected(_ops(spark, path)).items():
            # count FIRST (records out_rows and warms caches), then two
            # timed full materializations, min-of-2 — same discipline as
            # bench.py; a single-pass number right after an unrelated heavy
            # query can read several-fold high from GC/page-cache pressure
            # (measured: 117 s vs 28 s steady-state for minhash at x10).
            out_rows = build().count()
            elapsed = None
            for _ in range(2):
                start = time.perf_counter()
                build().write.format("noop").mode("overwrite").save()
                e = round(time.perf_counter() - start, 2)
                elapsed = e if elapsed is None else min(elapsed, e)
            results.setdefault(name, {})[f"x{n}"] = {
                "sec": elapsed,
                "out_rows": out_rows,
            }
            print(f"x{n} {name}: {elapsed}s, {out_rows} rows", file=sys.stderr)
        # side-effecting ops (index mutation): timed by their own harness;
        # a side op may return (sec, rows) or a full x{n} entry dict with
        # extra evidence keys
        for name, side in SIDE_OPS.items():
            if op_filter and not any(s in name for s in op_filter):
                continue
            got = side(spark, path, n)
            entry = (
                got if isinstance(got, dict)
                else {"sec": got[0], "out_rows": got[1]}
            )
            results.setdefault(name, {})[f"x{n}"] = entry
            print(
                f"x{n} {name}: {entry['sec']}s, {entry['out_rows']} rows",
                file=sys.stderr,
            )

    lo, hi = f"x{scales[0]}", f"x{scales[-1]}"
    ratio = scales[-1] / scales[0]
    table = {}
    for name, per in results.items():
        growth = per[hi]["sec"] / max(per[lo]["sec"], 1e-9)
        table[name] = {
            **per,
            "time_growth": round(growth, 2),
            "data_growth": ratio,
            "subquadratic": growth < ratio * ratio * 0.5,
        }
    out_path = os.path.join(REPO, "SCALE_STRESS.json")
    out = {
        "base_sf_dir": BASE_SF,
        "scales": scales,
        "corpus_rows": rows_at,
        "ngram_max_df": NGRAM_MAX_DF,
        "ops": table,
    }
    if os.path.isfile(out_path):
        # partial rerun (subset of ops and/or scales): deep-merge the
        # re-measured x{n} entries into the existing per-op dicts, then
        # recompute growth over ALL scales present — a naive dict update
        # dropped x1/x3 when only x10 was rerun.
        with open(out_path) as fh:
            prev = json.load(fh)
        prev["corpus_rows"].update(out["corpus_rows"])
        for name, entry in out["ops"].items():
            merged = prev["ops"].get(name, {})
            merged.update(
                {k: v for k, v in entry.items() if k.startswith("x")}
            )
            xs = sorted(
                (int(k[1:]) for k in merged if k.startswith("x"))
            )
            lo_k, hi_k = f"x{xs[0]}", f"x{xs[-1]}"
            growth = merged[hi_k]["sec"] / max(merged[lo_k]["sec"], 1e-9)
            ratio2 = xs[-1] / xs[0]
            merged.update(
                time_growth=round(growth, 2),
                data_growth=ratio2,
                subquadratic=growth < ratio2 * ratio2 * 0.5,
            )
            prev["ops"][name] = merged
        prev["scales"] = sorted(
            set(prev.get("scales", [])) | set(out["scales"])
        )
        out = prev
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
