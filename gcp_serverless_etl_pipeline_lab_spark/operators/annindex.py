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
so each holds many files); rebuilding after corpus growth is one
assignment pass (training reuses the stored model as init or refits on
a hash sample). The index is immutable per corpus snapshot — vectors
added later need a rebuild or a side batch probed separately (the text
index's append machinery generalizes here if that becomes the operating
mode).
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
    assigned = _assign_cell(
        corpus.select(
            F.col("vec_id").cast("long").alias("vec_id"), "embedding"
        ),
        "embedding",
        model,
    )
    (
        assigned.repartition(len(model), F.col("cell"))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(os.path.join(path, "vectors"))
    )
    tmp = os.path.join(path, _MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(
            {
                "version": 1,
                "dim": dim,
                "model": [[cid, vec] for cid, vec in model],
            },
            fh,
        )
    os.replace(tmp, os.path.join(path, _MANIFEST))


def load_ann_model(path: str) -> tuple[int, list[tuple[int, list[float]]]]:
    """(dim, centroid model) from the index manifest."""
    import json
    import os

    with open(os.path.join(path, _MANIFEST)) as fh:
        man = json.load(fh)
    return int(man["dim"]), [
        (int(cid), [float(x) for x in vec]) for cid, vec in man["model"]
    ]


def query_ann_index(
    spark,
    queries: DataFrame,
    path: str,
    k: int = 5,
    nprobe: int = 3,
) -> DataFrame:
    """Top-k per query against the stored index: probe list from the
    manifest model, partition-pruned scan of the probed cells only."""
    import os

    from pyspark.sql import Window

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
    vec = spark.read.option("basePath", os.path.join(path, "vectors")).parquet(
        os.path.join(path, "vectors")
    )
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
