"""Document chunking: split long documents into overlapping token windows
— the step that turns raw documents into trainable / retrievable units
(context-window packing upstream, RAG indexing downstream).

Unlike sequence packing (operators/packing.py), chunking is PURELY
relational: chunk starts are a generated sequence, the window is a
``slice``, and the 1→N fan-out is ``posexplode`` — no Python anywhere, so
the whole thing stays in whole-stage codegen and parallelizes trivially
(each document expands independently; no shuffle at all until whatever
consumes the chunks aggregates).

Chunk geometry: stride = max_tokens - overlap; documents with at most
``max_tokens`` tokens yield exactly one chunk; otherwise
ceil((n_tokens - overlap) / stride) chunks, the last one holding at least
``overlap`` tokens. Every token belongs to at least one chunk.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    max_tokens: int = 128,
    overlap: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, text) → (doc_id, chunk_id, chunk_tokens, chunk_text), one
    row per token window."""
    if not 0 <= overlap < max_tokens:
        raise ValueError("need 0 <= overlap < max_tokens")
    stride = max_tokens - overlap
    toked = docs.select(
        "doc_id", F.expr(f"split({text_col}, ' ', -1)").alias("t")
    ).withColumn(
        "n_chunks",
        F.expr(
            f"greatest(1L, CAST(ceil((size(t) - {overlap}) / "
            f"CAST({stride} AS DOUBLE)) AS BIGINT))"
        ),
    )
    return toked.select(
        "doc_id",
        "t",
        F.posexplode(F.expr("sequence(0, n_chunks - 1)")).alias("chunk_id", "_c"),
    ).select(
        "doc_id",
        "chunk_id",
        F.expr(f"size(slice(t, chunk_id * {stride} + 1, {max_tokens}))").alias(
            "chunk_tokens"
        ),
        F.expr(
            f"array_join(slice(t, chunk_id * {stride} + 1, {max_tokens}), ' ')"
        ).alias("chunk_text"),
    )
