"""Graph centrality over corpus graphs: fixed-point PageRank.

Why it's here: a k-NN graph over embeddings (knn_graph_*) turns corpus
curation into graph problems — centrality finds prototypical documents
(high in-degree from near neighbors), inverse-centrality finds outliers,
and both feed diversity-aware sampling. PageRank is the canonical such
score.

Why FIXED-POINT integers: PageRank iterates `r' = t + d·Σ r/outdeg`. In
doubles, the Σ is reduction-order-dependent, and after 3 iterations two
engines can disagree in the last ulp — enough to flip a ROUND() or a
rank order. All arithmetic here is BIGINT: ranks live in units of
1/SCALE (SCALE = 1e12), per-edge contributions are
`(85 · r) div (100 · outdeg)` (floor division both engines, positive
operands so trunc == floor), teleport is `(15 · SCALE) div (100 · n)`.
Both engines compute bit-identical BIGINTs — the same reasoning as the
integer-cents money columns (operators/timeseries.py).

Scale notes:
- per iteration: one join edges⋈ranks (shuffle by src — at 100 TB,
  pre-partition edges AND ranks by src so iterations co-locate), one
  aggregation by dst, one left join back to the node set;
- the iteration count is FIXED (unrolled) — no convergence actions, no
  lineage blowup (each round references the previous table once;
  contrast operators/cluster.py where a per-round self-join forces
  localCheckpoint);
- node count enters as a broadcast 1-row aggregate, not a collect;
- simplification: dangling-node mass is dropped, not redistributed —
  irrelevant for k-NN graphs (every node has out-degree k) and
  documented for general ones.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank_fixed_point(
    edges: DataFrame,
    iters: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, rank_fp) after ``iters`` damped iterations; rank_fp is the
    BIGINT fixed-point rank (units of 1/SCALE), identical across engines.
    """
    # Materialize the edge table ONCE before iterating: every iteration
    # references e / nodes / outdeg, and without a cut Spark re-executes
    # the whole upstream plan (e.g. the kNN-graph join that produced the
    # edges) once per reference — measured 3x the total runtime on the
    # harness pagerank query. Same pattern as the per-round truncation in
    # operators/cluster.py; at 100 TB this is a persist of the (src, dst)
    # pairs, tiny next to the corpus that produced them.
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")).localCheckpoint()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionAll(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    nn = nodes.agg(F.count(F.lit(1)).alias("n"))
    outdeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", F.expr(f"CAST({SCALE} AS BIGINT) div n").alias("rank_fp")
    )
    for _ in range(iters):
        contrib = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("(85 * rank_fp) div (100 * od)").alias("c"),
            )
        )
        summed = contrib.groupBy("node").agg(F.sum("c").alias("inflow"))
        ranks = (
            nodes.join(summed, "node", "left")
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                (
                    F.expr(f"CAST(15 * {SCALE} AS BIGINT) div (100 * n)")
                    + F.coalesce(F.col("inflow"), F.lit(0))
                ).alias("rank_fp"),
            )
        )
    return ranks
