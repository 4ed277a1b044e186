"""Training-sequence packing: fill fixed-token-budget sequences with
documents — the step between a deduped corpus and a training dataloader.

Semantics (deterministic, oracle-mirrorable): documents are sharded by
``doc_id % shards``; within a shard they are visited in doc_id order and
packed greedily — a document that would overflow the current sequence
closes it and starts the next (a document longer than the budget occupies
a sequence alone). Shards are independent, so packing parallelizes across
the cluster while each shard's greedy scan stays sequential.

Why a Pandas UDF: the greedy reset ("running sum that restarts when it
would exceed L") is inherently sequential per shard — no composition of
window functions expresses it (a plain cumsum/div assigns bins that SPLIT
documents across boundaries). This is exactly the carve-out for
Arrow-batched ``applyInPandas``: per-group imperative state, vectorized
transport, one shuffle on the shard key. The DuckDB oracle replays the
identical scan with a recursive CTE.

Scale shape: one shuffle of (doc_id, n_tokens, shard) slim rows — the
document text never moves. Shard count trades parallelism against packing
quality at shard boundaries (more shards → more partially-filled final
sequences); at 100 TB you'd pick shards ≈ executor-cores × a few, and the
waste stays bounded by shards × budget tokens.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACKED_SCHEMA = "doc_id long, n_tokens int, shard long, seq_id long"


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 512,
    shards: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, text) → (doc_id, n_tokens, shard, seq_id): every document
    assigned to a training sequence of at most ``max_tokens`` whitespace
    tokens (oversized documents get a sequence of their own)."""
    slim = docs.select(
        "doc_id",
        F.size(F.expr(f"split({text_col}, ' ', -1)")).alias("n_tokens"),
        (F.col("doc_id") % shards).alias("shard"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seq, fill, out = 0, 0, []
        for t in pdf["n_tokens"]:
            if fill > 0 and fill + t > max_tokens:
                seq += 1
                fill = 0
            fill += int(t)
            out.append(seq)
        pdf["seq_id"] = out
        return pdf

    return slim.groupBy("shard").applyInPandas(pack, PACKED_SCHEMA)


def packing_summary(packed: DataFrame) -> DataFrame:
    """Per-shard packing report: sequences built, tokens packed, and the
    min/avg/max sequence fill — the numbers a dataloader owner checks to
    size ``shards`` and ``max_tokens``."""
    per_seq = packed.groupBy("shard", "seq_id").agg(
        F.sum("n_tokens").alias("seq_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    return (
        per_seq.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_seqs"),
            F.sum("seq_tokens").alias("sum_tokens"),
            F.min("seq_tokens").alias("min_fill"),
            F.max("seq_tokens").alias("max_fill"),
            F.round(F.avg("seq_tokens"), 2).alias("avg_fill"),
        )
        .orderBy("shard")
    )
