"""Approximate-nearest-neighbor similarity search over an embedding column.

Three strategies over (vec_id, embedding array<float>, label):

- brute_force_topk : broadcast the (small) query set, score every corpus
  vector map-side, rank per query. The exact baseline; scales linearly in
  corpus size and is the right plan whenever |queries| is small — at
  100 TB the corpus never shuffles, only (query, score) pairs do.
- ivf_topk         : restrict scoring to the query's coarse cell (label
  column as the IVF assignment; production = k-means centroids + nprobe).
- lsh_topk         : sign-random-projection LSH — 8 deterministic
  hyperplanes derived from the shared 60-bit hash, bucket = 8 sign bits;
  score only vectors in the query's bucket (single table → recall ceiling).
- lsh_topk_multitable : L independent sign-LSH tables, candidate on a
  bucket match in ANY table, dedup across tables — the recall fix for the
  single-table ceiling; P planes per table tunes pruning vs recall.

All scoring is built-in array expressions (`aggregate` over `sequence`) —
JVM-side, no Python. Cosine == dot product because input vectors are
unit-norm (asserted in tests).
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

NUM_PLANES = 8
PLANE_MOD = 2001
PLANE_SHIFT = 1000


@lru_cache(maxsize=8)
def _plane_weights(dim: int) -> tuple[tuple[int, ...], ...]:
    """Deterministic hyperplane weights w(h, i) = h60('lsh|h|i') % 2001
    - 1000, computed ONCE driver-side with hashlib (bit-identical to the
    engine/oracle h60 primitive) and embedded as literals — instead of
    re-hashing 8×dim strings per row inside the projection expression."""
    planes = []
    for h in range(NUM_PLANES):
        row = []
        for i in range(1, dim + 1):
            hx = hashlib.md5(f"lsh|{h}|{i}".encode()).hexdigest()[:15]
            row.append(int(hx, 16) % PLANE_MOD - PLANE_SHIFT)
        planes.append(tuple(row))
    return tuple(planes)


def _dot(a: str, b: str, dim: int) -> F.Column:
    # reduce(zip_with(...)) is the measured-fastest JVM spelling of the
    # dot product (3.3x over aggregate(sequence(...)+element_at) on 7M
    # pairs — no per-row index-array allocation, one lambda frame per
    # element instead of two). Fold order is ascending index either way,
    # so scores are bit-identical to the oracle's list_sum. `dim` is
    # retained for call-site documentation; vectors are exactly dim wide
    # (a length mismatch yields NULL score in both spellings).
    return F.expr(
        f"reduce(zip_with({a}, {b}, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        f"CAST(0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def _rank_topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("score_raw"), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "rank", "neighbor_id", F.round("score_raw", 4).alias("score")
        )
        .orderBy("query_id", "rank")
    )


def brute_force_topk(
    corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (dot on unit vectors)."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score_raw", _dot("qe", "ce", dim))
    )
    return _rank_topk(scored, k)


def ivf_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5) -> DataFrame:
    """Top-k restricted to the query's coarse cell (nprobe=1)."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("label"), F.col("embedding").alias("qe")
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label"),
        F.col("embedding").alias("ce"),
    )
    scored = (
        c.join(F.broadcast(q), "label")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score_raw", _dot("qe", "ce", dim))
    )
    return _rank_topk(scored, k)


def _bucket_expr(vec: str, dim: int) -> str:
    """8-bit sign-LSH bucket id. Hyperplane weights come from the
    cross-dialect hash — w(h, i) = h60('lsh|h|i') % 2001 - 1000 — so the
    DuckDB oracle regenerates the identical planes from the hash while the
    engine embeds them as literal arrays (no per-row hashing)."""
    bits = []
    for h, plane in enumerate(_plane_weights(dim)):
        lits = ", ".join(f"{w}D" for w in plane)
        proj = (
            f"reduce(zip_with(array({lits}), {vec}, "
            f"(w, x) -> w * CAST(x AS DOUBLE)), "
            f"CAST(0 AS DOUBLE), (a, y) -> a + y)"
        )
        bits.append(f"IF({proj} >= 0, {1 << h}, 0)")
    return " + ".join(bits)


@lru_cache(maxsize=64)
def _table_plane_weights(dim: int, table: int, planes: int) -> tuple[tuple[int, ...], ...]:
    """Per-table hyperplane weights w(t, h, i) = h60('mlsh|t|h|i') % 2001
    - 1000 — an independent family per table (distinct seed prefix from the
    single-table 'lsh|h|i' planes)."""
    out = []
    for h in range(planes):
        row = []
        for i in range(1, dim + 1):
            hx = hashlib.md5(f"mlsh|{table}|{h}|{i}".encode()).hexdigest()[:15]
            row.append(int(hx, 16) % PLANE_MOD - PLANE_SHIFT)
        out.append(tuple(row))
    return tuple(out)


def _bucket_expr_table(vec: str, dim: int, table: int, planes: int) -> str:
    """Sign bucket for one table of the multi-table family (literal
    weights, like _bucket_expr)."""
    bits = []
    for h, plane in enumerate(_table_plane_weights(dim, table, planes)):
        lits = ", ".join(f"{w}D" for w in plane)
        proj = (
            f"reduce(zip_with(array({lits}), {vec}, "
            f"(w, x) -> w * CAST(x AS DOUBLE)), "
            f"CAST(0 AS DOUBLE), (a, y) -> a + y)"
        )
        bits.append(f"IF({proj} >= 0, {1 << h}, 0)")
    return " + ".join(bits)


def lsh_topk_multitable(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    tables: int = 8,
    planes_per_table: int = 8,
) -> DataFrame:
    """Approximate top-k with L independent sign-LSH tables: a pair is a
    candidate if it shares a bucket in ANY table, fixing the single-table
    recall ceiling (miss probability decays as (1 - c)^L where c is the
    per-table collision rate).

    Tuning: per-neighbor recall at angle θ is 1 - (1 - (1-θ/π)^P)^L for P
    planes per table. Choose P from the neighbor-angle regime: near-dup
    corpora (θ small) want wide tables (P = 8-16) for pruning; corpora
    whose true top-k are far (θ/π ≈ 0.4, like the synthetic test
    embeddings) need narrow tables (P = 2-3) or recall collapses no matter
    how many tables you add.

    Scale shape: buckets are map-side literal-weight projections; the
    corpus explodes ONLY slim (id, table, bucket) rows (L per vector) that
    join against the broadcast query buckets; candidate (query, neighbor)
    pairs are deduped across tables, then embeddings are fetched by a
    broadcast semi-join of the candidate ids against the corpus — the
    corpus itself never shuffles."""
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )

    # Per-SIDE null sentinels (-1 corpus, -2 queries): a null bucket (null
    # or short embedding) must never join — the DuckDB oracle's NULL bucket
    # never matches — while the coalesce keeps the join key non-nullable so
    # the implicit isnotnull predicate isn't pushed down as a
    # re-materialized projection scan filter (see dedup._nn).
    def _keyed(df: DataFrame, id_col: str, vec: str, sentinel: int) -> DataFrame:
        buckets = [
            F.coalesce(
                F.expr(_bucket_expr_table(vec, dim, t, planes_per_table)),
                F.lit(sentinel),
            ).alias(f"b{t}")
            for t in range(tables)
        ]
        stack = ", ".join(f"{t}, b{t}" for t in range(tables))
        return df.select(id_col, *buckets).select(
            id_col, F.expr(f"stack({tables}, {stack}) AS (t, bkt)")
        )

    cand = (
        _keyed(c, "neighbor_id", "ce", -1)
        .join(F.broadcast(_keyed(q, "query_id", "qe", -2)), ["t", "bkt"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    scored = (
        c.join(F.broadcast(cand), "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .withColumn("score_raw", _dot("qe", "ce", dim))
    )
    return _rank_topk(scored, k)


# ---------------------------------------------------------------------------
# Trained IVF: deterministic Lloyd's k-means coarse quantizer + nprobe
# ---------------------------------------------------------------------------


def _lit_vec(values: list[float]) -> str:
    """Literal double array from driver-side centroid values. String-CAST
    round-trips exactly (repr is shortest-exact) and Catalyst constant-folds
    the whole array once, so rows never re-parse."""
    return "array(" + ", ".join(f"CAST('{v!r}' AS DOUBLE)" for v in values) + ")"


def _sq_dist_expr(vec: str, centroid: list[float]) -> str:
    """Squared L2 distance of (float-array) column `vec` to a literal
    centroid, summed in index order — the DuckDB oracle computes
    list_sum(list_transform(...)) over the identical rounded centroid
    literals, so comparisons agree bit-for-bit."""
    return (
        f"reduce(zip_with({_lit_vec(centroid)}, {vec}, "
        f"(w, x) -> (w - CAST(x AS DOUBLE)) * (w - CAST(x AS DOUBLE))), "
        f"CAST(0 AS DOUBLE), (a, y) -> a + y)"
    )


def _assign_cell(df: DataFrame, vec: str, centroids: list[tuple[int, list[float]]]) -> DataFrame:
    """argmin-distance cell with deterministic tie-break (lowest cell id):
    the distance array is ordered by ascending cell id and array_position
    takes the FIRST occurrence of the min — the oracle's
    row_number() OVER (ORDER BY dist, cell) = 1."""
    darr = "array(" + ", ".join(_sq_dist_expr(vec, c) for _, c in centroids) + ")"
    pos = F.expr(f"array_position({darr}, array_min({darr}))").cast("int")
    cell_ids = F.array(*[F.lit(cid) for cid, _ in centroids])
    # coalesce sentinel (see dedup._nn): keeps the cell join key
    # non-nullable so the join's implicit isnotnull(cell) isn't pushed down
    # as a scan filter that RE-EVALUATES the whole k×dim argmin expression
    # per row (observed in .explain: the full literal-centroid aggregate
    # duplicated into the Filter). A null embedding lands in cell -1, which
    # never matches a probe.
    return df.withColumn(
        "cell", F.coalesce(F.element_at(cell_ids, pos), F.lit(-1))
    )


def kmeans_centroids(
    corpus: DataFrame,
    dim: int,
    k: int = 8,
    iters: int = 2,
    sample_rate: float = 0.1,
) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd's over DataFrame ops; returns the tiny
    (cell, centroid) model driver-side (k×dim doubles — the only data that
    ever reaches the driver, in ONE collect after the final iteration).

    Reproducible across engines by construction, so the DuckDB oracle can
    re-derive the identical model in SQL:
    - init: the corpus vector with the MIN vec_id in each residue class
      vec_id % k (no RNG);
    - each iteration re-computes per-cell elementwise means ROUNDED to 6
      decimals — summation-order float noise (~1e-13) between Spark's
      partial aggregation and the oracle's is quashed by the rounding;
    - assignment breaks distance ties on the lowest cell id (the strict
      ``<`` fold over cell-ascending centroids);
    - cells that empty out are dropped (assignments only ever target
      surviving cells — mirrored exactly by the oracle's inner join).

    Scale shape — fully distributed: centroids live in a DataFrame across
    iterations; each iteration crossJoins the corpus against the ONE
    broadcast row holding the centroid array, assigns cells map-side with
    a fold over that array (no shuffle, no per-row window), and
    re-aggregates means via a posexplode groupBy whose map-side partial
    aggregation bounds the shuffle at k×dim rows per partition. No driver
    round-trip per iteration — the k×dim model is collected once at the
    end. (The per-centroid fold is an interpreted higher-order function,
    unlike the codegen'd literal-centroid assignment `_assign_cell` used
    at query time — acceptable for the training pass, which runs over the
    sample, not the corpus.)

    ``sample_rate < 1.0`` (default 0.1 — the 100 TB-safe setting) trains
    on a DETERMINISTIC hash-Bernoulli sample of the corpus
    (h60(vec_id) % 10000 < rate·10000 — the same stable sampler as
    operators/sampling.py, no RNG, reproducible across runs and engines):
    Lloyd never needs the full corpus — centroid quality converges on a
    tiny fraction of it (tests/test_ann_recall.py measures recall with
    the sampled model). Pass 1.0 to train on everything — what the
    oracled harness queries do, pinning the DuckDB-mirrored model.
    """
    from ..functions.hashing import h60

    c = corpus.select("vec_id", F.col("embedding").alias("e"))
    if sample_rate < 1.0:
        sampled = c.filter(
            F.pmod(h60(F.col("vec_id").cast("string")), F.lit(10000))
            < int(sample_rate * 10000)
        )
        # A tiny corpus can hash-sample to ZERO rows, which used to
        # surface as the misleading "empty centroid model (empty
        # corpus?)" error; Lloyd needs at least one vector, so fall back
        # to the full corpus (one 1-row existence gate — the corpus this
        # fires on is by definition small enough to train on whole).
        if sampled.limit(1).count() == 0:
            sampled = c
        c = sampled
    first = c.groupBy((F.col("vec_id") % k).alias("cell")).agg(
        F.min("vec_id").alias("vec_id")
    )
    cent = (
        c.join(F.broadcast(first), "vec_id")
        .select("cell", F.expr("transform(e, x -> CAST(x AS DOUBLE))").alias("ce"))
    )
    # fold over the cell-ascending centroid array: distance computed once
    # per centroid, strict < keeps the lowest cell on ties — identical
    # semantics to the literal-centroid argmin in _assign_cell.
    assign = F.expr(
        "aggregate("
        "  transform(cents, s -> named_struct("
        "    'd', reduce(zip_with(s.ce, e, (w, x) -> (w - CAST(x AS DOUBLE)) * (w - CAST(x AS DOUBLE))),"
        "                CAST(0 AS DOUBLE), (a, y) -> a + y),"
        "    'cl', s.cell)),"
        "  named_struct('d', CAST('Infinity' AS DOUBLE), 'cl', CAST(-1 AS BIGINT)),"
        "  (acc, s) -> IF(s.d < acc.d, s, acc)"
        ").cl"
    )
    for _ in range(iters):
        cents_row = cent.agg(
            F.expr("array_sort(collect_list(struct(cell, ce)))").alias("cents")
        )
        assigned = c.crossJoin(F.broadcast(cents_row)).select(
            assign.alias("cell"), "e"
        )
        cent = (
            assigned.select("cell", F.posexplode("e").alias("i", "x"))
            .groupBy("cell", "i")
            .agg(F.round(F.avg(F.col("x").cast("double")), 6).alias("v"))
            .groupBy("cell")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(i, v))), s -> s.v)"
                ).alias("ce")
            )
        )
    rows = cent.collect()
    centroids = sorted((int(r["cell"]), [float(x) for x in r["ce"]]) for r in rows)
    if not centroids:
        raise ValueError(
            "empty centroid model (empty corpus?) — the coarse quantizer "
            "needs at least one vector; use brute_force_topk for "
            "degenerate corpora"
        )
    return centroids


def ivf_trained_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    cells: int = 8,
    iters: int = 2,
    nprobe: int = 3,
    model: list[tuple[int, list[float]]] | None = None,
    sample_rate: float = 0.1,
) -> DataFrame:
    """Top-k restricted to the query's `nprobe` nearest k-means cells — the
    production IVF shape (`ivf_topk`'s label-as-cell is the degenerate
    stand-in). The trained coarse quantizer replaces data-dependent labels
    with geometry: recall is tunable via nprobe instead of being an
    accident of labeling.

    Query-time scale shape: the corpus is assigned map-side against the
    literal centroid model and NEVER shuffles; only the (query, cell) probe
    list (|Q|×nprobe rows) broadcasts; scoring touches ~nprobe/cells of the
    corpus. Recall vs brute force is measured in tests/test_ann_recall.py.

    Pass ``model`` (a prior ``kmeans_centroids`` result — k×dim floats, a
    trivially serializable list) to skip training: production fits the
    quantizer once per corpus snapshot and serves many query batches
    against it. ``sample_rate`` forwards to training (default 0.1 — the
    scale-safe hash-Bernoulli sample; pass 1.0 for the full-corpus model
    the DuckDB oracles mirror).
    """
    if model is None:
        model = kmeans_centroids(
            corpus, dim, k=cells, iters=iters, sample_rate=sample_rate
        )
    if not model:
        raise ValueError(
            "empty centroid model (empty corpus?) — ivf_trained_topk needs "
            "at least one cell; use brute_force_topk for degenerate corpora"
        )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    dist_cols = [
        F.expr(_sq_dist_expr("qe", cvec)).alias(f"d{cid}") for cid, cvec in model
    ]
    stack = ", ".join(f"{cid}, d{cid}" for cid, _ in model)
    w = Window.partitionBy("query_id").orderBy("dist", "cell")
    probes = (
        q.select("query_id", "qe", *dist_cols)
        .select(
            "query_id",
            "qe",
            F.expr(f"stack({len(model)}, {stack}) AS (cell, dist)"),
        )
        .withColumn("pr", F.row_number().over(w))
        .filter(F.col("pr") <= nprobe)
        .select("query_id", "qe", "cell")
    )
    scored = (
        _assign_cell(c, "ce", model)
        .join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score_raw", _dot("qe", "ce", dim))
    )
    return _rank_topk(scored, k)


def lsh_topk(corpus: DataFrame, queries: DataFrame, dim: int, k: int = 5) -> DataFrame:
    """Approximate top-k: score only corpus vectors sharing the query's
    sign-LSH bucket (may return < k rows — that's the accuracy/cost trade;
    recall is measured against brute force in tests)."""
    # coalesce sentinel: see operators.dedup._nn — keeps the implicit
    # isnotnull(bucket) join predicate from re-materializing the whole
    # 512-hash projection as a pushed-down scan filter. Sentinels differ
    # per side (-2 query, -1 corpus) so a null bucket — null or
    # shorter-than-dim embedding — never joins, matching the oracle's
    # NULL-never-matches semantics.
    q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    ).withColumn("bucket", F.coalesce(F.expr(_bucket_expr("qe", dim)), F.lit(-2)))
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    ).withColumn("bucket", F.coalesce(F.expr(_bucket_expr("ce", dim)), F.lit(-1)))
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score_raw", _dot("qe", "ce", dim))
    )
    return _rank_topk(scored, k)


def _scored_bidirectional(v: DataFrame, cand: DataFrame, dim: int) -> DataFrame:
    """Score unordered candidate pairs (id_a < id_b) against the vector
    table and emit BOTH directions with one generator — the dot is
    symmetric, so each scored pair serves as (query, neighbor) twice
    without recomputing the join or the dot. Shared by knn_graph_lsh and
    the oversized-block fallback in knn_graph_blocked."""
    q = v.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("qe"))
    c = v.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("ce"))
    half = (
        cand.join(q, "id_a")
        .join(c, "id_b")
        .withColumn("s", _dot("qe", "ce", dim))
    )
    return half.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("id_a").alias("query_id"),
                    F.col("id_b").alias("neighbor_id"),
                    F.col("s").alias("score_raw"),
                ),
                F.struct(
                    F.col("id_b").alias("query_id"),
                    F.col("id_a").alias("neighbor_id"),
                    F.col("s").alias("score_raw"),
                ),
            )
        ).alias("p")
    ).select("p.*")


def knn_graph_blocked(
    corpus: DataFrame,
    dim: int,
    k: int = 3,
    block_col: str = "label",
    max_block_rows: int | None = 1024,
    oversize_policy: str = "lsh",
) -> DataFrame:
    """k-NN GRAPH: top-k neighbors for EVERY corpus vector (not just a
    query set) by cosine, restricted to the vector's coarse block.

    The all-to-all variant of the search operators above — the structure
    semantic-dedup clustering, diversity sampling, and graph-based label
    propagation consume. Within-block exact scoring is the right plan
    when blocks are balanced: one shuffle of the corpus by block key,
    then each block's pairs are generated and scored locally; nothing
    quadratic in the CORPUS, only in the block. At 100 TB the block
    column is a trained coarse cell (ivf_topk's k-means).

    ``max_block_rows`` guards the hot block. A block within the bound is
    exact, always. Blocks over the bound follow ``oversize_policy``:

    - ``"lsh"`` (default): the oversized block's candidates come from the
      within-block hamming<=1 sign-LSH multiprobe
      (dedup.cosine_candidate_pairs) instead of exhaustive pairs —
      APPROXIMATE for those blocks only (same contract as
      ``knn_graph_lsh``: near-parallel neighbors kept with prob → 1,
      weakly-similar exact-top-k not preserved). This is the 100 TB
      default because the alternative is quadratic WORK, not just a
      straggler: a 30% hot label at 10× data means 100× the pairs, and
      round-5 measurement showed salting spreads the tasks but cannot
      shrink the arithmetic (27× wall growth salted vs 0.9× for the LSH
      candidates — SCALE_STRESS.json).
    - ``"salt"``: exact everywhere; the oversized block's QUERY side is
      split into ``ceil(rows / bound)`` hash sub-blocks with the
      neighbor side replicated across them, so every query still scores
      the full block and the output is byte-identical to unbounded —
      pair generation spreads over ``n_sub`` reducers. Use when exact
      results are non-negotiable and the cluster can afford the pairs.

    Balanced blocks take the same single-shuffle plan either way; the
    only added cost is one block-count aggregate that broadcasts back.
    ``max_block_rows=None`` disables the guard (unbounded exact).

    EAGER EVALUATION NOTE: with the guard enabled, building the plan runs
    one small Spark job (a block-count probe) at DataFrame-CONSTRUCTION
    time, so this function is not fully lazy: the balanced-vs-oversized
    decision is snapshotted when the plan is built, and a corpus that
    changes between construction and execution can make it stale. Pass
    ``max_block_rows=None`` if you need a lazily-built (unguarded) plan.
    """
    a = corpus.select(
        block_col,
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
    )
    b = corpus.select(
        block_col,
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
    )
    if max_block_rows is None:
        scored = (
            a.join(b, block_col)
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("score_raw", _dot("qe", "ce", dim))
        )
        return _rank_topk(scored, k)
    if oversize_policy not in ("lsh", "salt"):
        raise ValueError(f"oversize_policy must be 'lsh' or 'salt', got {oversize_policy!r}")

    sizes = corpus.groupBy(F.col(block_col)).agg(
        F.ceil(F.count(F.lit(1)) / F.lit(max_block_rows))
        .cast("int")
        .alias("_nsub")
    )

    # Short-circuit: when NO block exceeds the bound (the common case —
    # trained k-means cells, balanced labels), skip the two-leg guarded
    # plan entirely. One block-count aggregate (#blocks rows, the same
    # class as the allowed 1-row gate aggregates) buys back the guard's
    # plan-doubling overhead, measured ~0.6-1.2 s per query at sf0.1.
    if sizes.filter(F.col("_nsub") > 1).limit(1).count() == 0:
        scored = (
            a.join(b, block_col)
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("score_raw", _dot("qe", "ce", dim))
        )
        return _rank_topk(scored, k)

    if oversize_policy == "salt":
        a_s = a.join(F.broadcast(sizes), block_col).withColumn(
            "_salt", F.pmod(F.xxhash64("query_id"), F.col("_nsub")).cast("int")
        )
        b_s = (
            b.join(F.broadcast(sizes), block_col)
            .withColumn("_salt", F.explode(F.expr("sequence(0, _nsub - 1)")))
            .drop("_nsub")
        )
        scored = (
            a_s.drop("_nsub")
            .join(b_s, [block_col, "_salt"])
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("score_raw", _dot("qe", "ce", dim))
        )
        return _rank_topk(scored, k)

    # policy "lsh": exact on within-bound blocks, LSH candidates on the rest
    tagged = corpus.join(F.broadcast(sizes), block_col)
    small = tagged.filter(F.col("_nsub") <= 1)
    big = tagged.filter(F.col("_nsub") > 1)
    a_sm = small.select(
        block_col, F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    b_sm = small.select(
        block_col, F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ce")
    )
    scored_small = (
        a_sm.join(b_sm, block_col)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score_raw", _dot("qe", "ce", dim))
        .select("query_id", "neighbor_id", "score_raw")
    )
    from .dedup import cosine_candidate_pairs

    big_v = big.select(
        "vec_id", F.col(block_col).alias("label"), "embedding"
    )
    scored_big = _scored_bidirectional(
        big_v, cosine_candidate_pairs(big_v, dim), dim
    )
    return _rank_topk(scored_small.unionAll(scored_big), k)


KNN_GRAPH_LSH_MAX_ROWS = 10_000


def _assign_cells_multi(
    df: DataFrame, vec: str, centroids: list[tuple[int, list[float]]], nprobe: int
) -> DataFrame:
    """``_assign_cell``'s multiprobe sibling: the ``nprobe`` NEAREST cell
    ids per row as an array column ``cells`` (distance-ascending, ties to
    the lower cell id via lexicographic struct sort — the same tie rule
    as the argmin). Null embeddings land in the never-probed sentinel
    cell [-1], mirroring _assign_cell."""
    structs = "array(" + ", ".join(
        f"named_struct('d', {_sq_dist_expr(vec, c)}, 'cl', CAST({cid} AS BIGINT))"
        for cid, c in centroids
    ) + ")"
    expr = (
        f"IF({vec} IS NULL, array(CAST(-1 AS BIGINT)), "
        f"transform(slice(array_sort({structs}), 1, {nprobe}), s -> s.cl))"
    )
    return df.withColumn("cells", F.expr(expr))


def knn_graph_auto(
    corpus: DataFrame,
    dim: int,
    k: int = 3,
    route_threshold: int = KNN_GRAPH_LSH_MAX_ROWS,
    cell_rows: int = 256,
    nprobe: int = 3,
    iters: int = 2,
    sample_rate: float = 0.1,
    max_cells: int = 256,
) -> DataFrame:
    """Size-routed k-NN graph — the operator callers should reach for
    when the corpus size is not known in advance:

    - at or under ``route_threshold`` rows: ``knn_graph_lsh`` at its
      shipped default (recall@3 ~0.61 vs the exact graph, ~1.1x the
      pruned wall) — the right trade for corpora whose label/LSH blocks
      stay small;
    - above it: a TRAINED-IVF multiprobe graph. ``knn_graph_lsh``'s cost
      model breaks at scale because its blocking is FIXED (labels x
      2^planes buckets): block occupancy grows with the corpus, so
      candidate pairs grow quadratically — measured 4.94x wall at 10x
      data (SCALE_STRESS.json knn_graph_lsh). The trained route grows
      the cell COUNT with the corpus (``cells = clamp(n / cell_rows,
      8, max_cells)``), holding per-vector candidates at ~``nprobe *
      cell_rows`` — work linear in n, measured sub-2x wall at 10x data
      (SCALE_STRESS.json knn_graph_auto_routed). Each vector is indexed
      under its argmin cell and PROBES its ``nprobe`` nearest cells
      (query-side fan-out only, the classic IVF asymmetry), which is
      what buys retrieval-grade recall: measured recall@3 vs the exact
      global graph in tests/test_ann_recall.py, floor >= 0.6 at the
      shipped defaults — the same floor the LSH default clears, at a
      growth curve that survives 10x.

    The routing count is one eager aggregate at plan-BUILD time (same
    eager-gate class as knn_graph_blocked's block-size probe); pass
    ``route_threshold=0`` to force the trained route (what the stress
    row does). ``max_cells`` bounds the literal-centroid expression size
    (k-means model is collected driver-side and constant-folded); at
    corpus sizes where n/cell_rows exceeds it, cells grow past
    ``cell_rows`` rows and the per-vector candidate set grows with them
    — raise ``max_cells`` (deeper codegen) or ``cell_rows`` (cheaper
    training) deliberately at that scale."""
    n = corpus.count()
    if n <= route_threshold:
        return knn_graph_lsh(corpus, dim, k=k)
    cells = max(8, min(max_cells, n // cell_rows))
    model = kmeans_centroids(
        corpus, dim, k=cells, iters=iters, sample_rate=sample_rate
    )
    base = corpus.select("vec_id", "embedding")
    # ONE distance-array evaluation per vector: the multiprobe sort is
    # the expensive map-side step (cells x dim interpreted fold per row),
    # and both join sides need it — the index side as cells[0] (the
    # argmin, same tie rule), the query side exploded. An eager
    # localCheckpoint materializes the slim assigned frame once instead
    # of re-evaluating per branch (measured ~2x on the x10 stress
    # corpus); the operator is already eager via the routing count. On a
    # real cluster swap for df.checkpoint() if fault-tolerance of this
    # intermediate matters — it is cheap to recompute either way.
    assigned = _assign_cells_multi(base, "embedding", model, nprobe).localCheckpoint(
        eager=True
    )
    # Directed probe join: the corpus ships through ONE small cell-keyed
    # shuffle (nprobe+1 slim-ish rows per vector), candidates materialize
    # inside the join, and the only large exchange is the per-query
    # window. (The score-once-emit-both-directions spelling knn_graph_lsh
    # uses was measured WORSE here: its distinct + two id-fetch joins add
    # three candidate-sized shuffles, 72 s vs 19 s at x10 — the dots it
    # saves are cheaper than the exchanges it adds.)
    idx = assigned.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("ce"),
        F.element_at("cells", 1).alias("cell"),
    ).filter(F.col("cell") != -1)  # null-embedding sentinel: never indexed
    qry = assigned.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.explode("cells").alias("cell"),
    )
    # a neighbor has ONE index cell and the query's probed cells are
    # distinct, so each directed pair joins at most once — no dedup pass
    scored = (
        qry.join(idx, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score_raw", _dot("qe", "ce", dim))
    )
    return _rank_topk(scored, k)


def bucket_duck(vec: str, dim: int) -> str:
    """DuckDB twin of ``_bucket_expr`` — the identical 8-plane sign bucket
    as SQL over a double-list column. Lives next to the engine expression
    so the two stay in lockstep; imported by the harness oracles."""
    from ..functions.hashing import h60_duck

    bits = []
    for h in range(NUM_PLANES):
        w = h60_duck(f"'lsh|' || '{h}' || '|' || CAST(i AS VARCHAR)")
        proj = (
            f"list_sum(list_transform(range(1, {dim + 1}), i -> "
            f"CAST(({w}) % {PLANE_MOD} - {PLANE_SHIFT} AS DOUBLE)"
            f" * {vec}[i]))"
        )
        bits.append(f"CASE WHEN {proj} >= 0 THEN {1 << h} ELSE 0 END")
    return " + ".join(bits)


def knn_graph_lsh(
    corpus: DataFrame,
    dim: int,
    k: int = 3,
    tables: int = 1,
    planes_per_table: int | None = None,
    probe_hamming: int = 3,
) -> DataFrame:
    """Approximate k-NN graph: same output shape as ``knn_graph_blocked``
    but candidates come from the label block AND the sign-LSH multiprobe
    (dedup.cosine_candidate_pairs) instead of block-exhaustive pairs;
    every candidate is RERANKED by the exact dot product, so output
    quality is exactly candidate recall.

    This is the 100 TB spelling: ``knn_graph_blocked`` is quadratic in
    its largest block (a label owning 30% of a 10x corpus makes it melt —
    measured in SCALE_STRESS.json), while this plan's candidate count per
    vector is bounded by the bucket occupancy (~(1+P)/2^P of the block
    for unrelated vectors, ~3.5% at P=8). The price is recall: a true
    neighbor separated by >1 plane bits is missed; near-parallel
    neighbors (the ones that matter for dedup/curation) land in the same
    or an adjacent bucket with probability ≈ (1-θ/π)^8 → ~1 as θ → 0.

    ``tables`` / ``planes_per_table`` / ``probe_hamming`` escalate recall
    for retrieval-shaped workloads whose true neighbors are FAR (the
    regime where the near-dup default collapses by design). Measured on
    the sf0.01 embeddings (500 vectors in ONE block — weak similarity,
    θ/π ≈ 0.4; recall@3 vs the exact global graph; wall = min-of-2 full
    materializations on local[32]; cost also shown as scored-candidate
    fraction of all pairs):

    | config                          | recall@3 | candidates | wall  |
    |---------------------------------|----------|------------|-------|
    | probe_hamming=1 (8 planes)      |  0.13    |  3.9%      | 1.0x  |
    | probe_hamming=3 (DEFAULT)       |  0.61    | 37%        | 1.1x  |
    | tables=4, planes_per_table=3    |  0.99    | 93%        | 2.0x  |
    | exact (knn_graph_blocked)       |  1.00    | 100%       | 2.3x  |

    (recall floors asserted in tests/test_ann_recall.py). The escalation
    trades pruning for recall smoothly — ``probe_hamming=3`` is the
    DEFAULT because a graph operator's callers want retrieval-quality
    neighbors (recall 0.61 at ~1.1x wall); pass ``probe_hamming=1`` to
    reclaim the maximum-pruning near-dup config (which remains the
    default of the underlying ``cosine_candidate_pairs``, whose callers
    want near-dups). At 100 TB prefer trained-IVF blocks
    (``knn_graph_blocked`` over k-means cells) when you need
    exact-within-cell, and escalated LSH when the corpus can't afford
    cell-exhaustive pairs.

    COST MODEL CAVEAT — this operator's blocking is FIXED (labels x
    2^planes buckets), so candidate pairs grow QUADRATICALLY with the
    corpus: measured 4.94x wall at 10x data (SCALE_STRESS.json). Callers
    that don't know their corpus size should use ``knn_graph_auto``,
    which keeps this operator's behavior under 10k rows and routes
    larger corpora to a trained-IVF multiprobe graph (1.54x at 10x, at
    HIGHER measured recall)."""
    from .dedup import cosine_candidate_pairs

    v = corpus.select("vec_id", "label", "embedding")
    # one candidate row per unordered pair (id_a < id_b), scored once and
    # emitted in both directions (_scored_bidirectional)
    cand = cosine_candidate_pairs(
        v,
        dim,
        tables=tables,
        planes_per_table=planes_per_table,
        probe_hamming=probe_hamming,
    )
    return _rank_topk(_scored_bidirectional(v, cand, dim), k)
