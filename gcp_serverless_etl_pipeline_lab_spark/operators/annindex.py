"""Persisted IVF index over an embedding column — the VECTOR twin of the
text incremental index (operators/incremental.py).

``ivf_trained_topk`` trains + assigns per invocation; the operating mode
for a served corpus is train ONCE, assign ONCE, store the vectors
PARTITIONED BY CELL, and let every query batch read only the cells it
probes:

- ``build_ann_index`` fits the deterministic k-means coarse quantizer
  (or accepts a prior model), assigns every vector map-side against the
  literal centroids, and writes ``vectors/`` hive-partitioned by
  ``cell`` plus the serialized model in ``_MANIFEST.json`` (k x dim
  rounded floats — JSON round-trips them exactly);
- ``query_ann_index`` rebuilds the probe list from the manifest model
  (no training, no corpus scan), collects the <= ``cells``-value probed
  cell list driver-side (a bounded gate, same class as the text index's
  gram-bucket gate), and scans ONLY those partitions — per-batch cost
  tracks |queries| x nprobe x cell size, never corpus size.

Output parity: ``query_ann_index(spark, queries, path, k, nprobe)`` is
row-identical to ``ivf_trained_topk(corpus, queries, dim, k, nprobe,
model=<the stored model>)`` — same assignment expression, same probe
ranking, same tie rules (pinned by tests/test_ann_index.py and the
``a0e_ann_index_query`` oracle query).

At 100 TB: the cell partitioning is the pruning unit (raise ``cells``
so each holds many files); ``append_ann_index`` adds vectors WITHOUT
retraining — new arrivals are assigned against the STORED model and
land as an immutable generation dir committed by one atomic manifest
replace, the same crash/idempotence discipline as the text index's
``append_to_index`` (orphans invisible, ``increment_id`` replays are
no-ops). The model itself is pinned per index: appending changes which
vectors each cell holds, never the cell geometry, so
query-after-append == query-against-rebuild WITH THE SAME MODEL
(pinned by tests and the ``a0f_ann_index_append`` oracle). Retraining
(centroid drift after heavy growth) is a rebuild decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import (
    _assign_cell,
    _dot,
    _rank_topk,
    _sq_dist_expr,
    kmeans_centroids,
)

_MANIFEST = "_MANIFEST.json"


def build_ann_index(
    corpus: DataFrame,
    path: str,
    dim: int,
    cells: int = 8,
    iters: int = 2,
    sample_rate: float = 0.1,
    model: list[tuple[int, list[float]]] | None = None,
) -> None:
    """Train (or take) the coarse quantizer and persist the cell-assigned
    corpus under ``path``. ``sample_rate`` forwards to training (0.1 =
    the scale-safe hash-Bernoulli sample; 1.0 = the full-corpus model the
    DuckDB oracles mirror)."""
    import json
    import os

    if model is None:
        model = kmeans_centroids(
            corpus, dim, k=cells, iters=iters, sample_rate=sample_rate
        )
    _write_vectors_gen(corpus, path, 0, model)
    _write_ann_manifest(
        path,
        {
            "version": 2,
            "dim": dim,
            "model": [[cid, vec] for cid, vec in model],
            "generations": [{"gen": 0, "increment_id": None}],
        },
    )


def _write_vectors_gen(
    vectors: DataFrame, path: str, gen: int, model
) -> None:
    import os

    assigned = _assign_cell(
        vectors.select(
            F.col("vec_id").cast("long").alias("vec_id"), "embedding"
        ),
        "embedding",
        model,
    )
    (
        assigned.repartition(len(model), F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(path, "vectors", f"gen={gen}"))
    )


def _write_ann_manifest(path: str, man: dict) -> None:
    import json
    import os

    os.makedirs(path, exist_ok=True)
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(man, fh)
    os.replace(tmp, os.path.join(path, _MANIFEST))


def _load_ann_manifest(path: str) -> dict:
    import json
    import os

    with open(os.path.join(path, _MANIFEST)) as fh:
        return json.load(fh)


def append_ann_index(
    spark,
    increment: DataFrame,
    path: str,
    increment_id: str | None = None,
) -> bool:
    """Add vectors to a stored index WITHOUT retraining: assign the
    increment against the manifest model and commit it as a new
    generation (atomic manifest replace; ``increment_id`` replays are
    committed no-ops; a crash before the commit leaves an orphan no
    query reads). Cost is one map-side assignment pass over the
    INCREMENT. An empty increment is a no-op (returns False) — an empty
    generation dir would carry no schema to read back.

    Concurrent appenders are safe — same claim+locked-commit discipline
    as the text index (operators/incremental.append_to_index), with no
    cap-consistency relaxation to document: the model is pinned, so
    concurrent assignments never interact."""
    import os

    from .incremental import _GENCLAIM_PREFIX, _claim_generation, _manifest_lock

    man = _load_ann_manifest(path)
    if man.get("version", 1) < 2:
        raise ValueError(
            f"ANN index at {path} predates generations; rebuild with "
            "build_ann_index to enable appends"
        )
    applied = {
        g.get("increment_id") for g in man["generations"]
    } | set(man.get("compacted_increments", []))
    if increment_id is not None and increment_id in applied:
        return False
    if increment.limit(1).count() == 0:
        return False
    model = [(int(cid), [float(x) for x in vec]) for cid, vec in man["model"]]
    gen = _claim_generation(path)  # manifests share the generations shape
    _write_vectors_gen(increment, path, gen, model)
    with _manifest_lock(path):
        cur = _load_ann_manifest(path)
        applied_now = {
            g.get("increment_id") for g in cur["generations"]
        } | set(cur.get("compacted_increments", []))
        if increment_id is not None and increment_id in applied_now:
            try:
                os.remove(os.path.join(path, f"{_GENCLAIM_PREFIX}{gen}"))
            except OSError:
                pass
            return False
        cur["generations"].append({"gen": gen, "increment_id": increment_id})
        _write_ann_manifest(path, cur)
    try:
        os.remove(os.path.join(path, f"{_GENCLAIM_PREFIX}{gen}"))
    except OSError:
        pass
    return True


def load_ann_model(path: str) -> tuple[int, list[tuple[int, list[float]]]]:
    """(dim, centroid model) from the index manifest."""
    man = _load_ann_manifest(path)
    return int(man["dim"]), [
        (int(cid), [float(x) for x in vec]) for cid, vec in man["model"]
    ]


def _read_vectors(spark, path: str, man: dict) -> DataFrame:
    """Union of the committed vector generations (manifest-listed only —
    crashed appends' orphans are never read). v1 indexes (pre-append
    flat layout) read the bare ``vectors/`` dir."""
    import os

    root = os.path.join(path, "vectors")
    if man.get("version", 1) < 2:
        dirs = [root]
    else:
        dirs = [
            os.path.join(root, f"gen={g['gen']}") for g in man["generations"]
        ]
    out = None
    for d in dirs:
        part = spark.read.option("basePath", d).parquet(d)
        out = part if out is None else out.unionByName(part)
    return out


def query_ann_index(
    spark,
    queries: DataFrame,
    path: str,
    k: int = 5,
    nprobe: int = 3,
) -> DataFrame:
    """Top-k per query against the stored index: probe list from the
    manifest model, partition-pruned scan of the probed cells only
    (every committed generation; appended vectors are served the moment
    their manifest commit lands)."""
    from pyspark.sql import Window

    man = _load_ann_manifest(path)
    dim, model = load_ann_model(path)
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
    # bounded driver-side gate (<= len(model) values): the scan below
    # carries a partition filter on exactly the probed cells
    probed = [r["cell"] for r in probes.select("cell").distinct().collect()]
    vec = _read_vectors(spark, path, man)
    if len(probed) < len(model):
        vec = vec.filter(F.col("cell").isin(probed))
    scored = (
        vec.select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("embedding").alias("ce"),
            "cell",
        )
        .join(F.broadcast(probes), "cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("score_raw", _dot("qe", "ce", dim))
    )
    return _rank_topk(scored, k)
