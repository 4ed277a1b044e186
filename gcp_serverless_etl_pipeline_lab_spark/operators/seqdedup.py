"""Sequence-level (substring) deduplication: token-window fingerprints.

Doc-level dedup (exact / MinHash / SimHash / embedding — operators/dedup.py)
treats the document as the unit; it can't see a boilerplate paragraph or a
license header repeated across otherwise-distinct documents. Sequence-level
dedup finds REPEATED TOKEN SPANS across the corpus and can drop every
occurrence but the first — the operation the suffix-array substring dedup
of "Deduplicating Training Data Makes Language Models Better" performs,
re-expressed in the shape a distributed engine can run: fixed-width
token-window hashing.

Plan (all declarative, never all-pairs):

1. tokenize; explode window starts ``0, stride, ... <= n_tok - w``
   (``sequence`` + ``explode`` — generated, not scanned);
2. hash each w-token window with the cross-dialect 60-bit MD5 primitive
   (functions/hashing.py) — one narrow (doc_id, pos, h) row per window;
3. group by h: ``n_docs``, ``n_occ``, and the GLOBAL FIRST occurrence as
   ``min(doc_id * 2^20 + pos)`` — a composite BIGINT key so first-wins
   needs only a partial-aggregatable MIN, **no window function over h**:
   a boilerplate span present in every document becomes a hot key, and a
   ``row_number() over (partition by h)`` would funnel its entire
   occurrence list through one task; the MIN spelling keeps hot spans in
   map-side partial aggregation;
4. repeated spans = groups with ``n_docs >= min_docs``; the span text is
   re-derived by joining the (small) repeated-span table back to the
   first-occurrence document and slicing — span text never rides the
   corpus-wide shuffle;
5. survivor variant: occurrences of repeated spans other than the global
   first are "redundant"; each document drops the token positions covered
   by its redundant windows (covered = distinct flatten of per-span
   ``sequence(s, s+w-1)``, an array-local computation — no per-token rows
   ever exist) and re-joins the remainder.

Scale notes (100 TB):
- Shuffle volume is one (doc_id BIGINT, pos INT, h BIGINT) row per
  window ≈ 24 B × n_tok/stride per doc — with stride=w/2 about 3 B per
  input token, ~100× smaller than shuffling text.
- ``stride`` trades recall for cost: stride=1 is exhaustive (any aligned
  w-window repeat found), stride=w tiles. Two copies of a span are only
  matched when their window grids align (offset difference divisible by
  stride) — the standard tiling/winnowing trade; stride <= w/2 with
  w-token spans guarantees detection of repeats >= 2w-1 tokens at any
  alignment.
- The composite first-key uses 2^20 as the position radix: documents are
  capped at 2^20 tokens (a 4 MB+ doc should be chunked upstream —
  operators/chunking.py); doc_id stays exact up to 2^43.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import h60_sql

POS_RADIX = 1 << 20  # max tokens per document for the composite first-key


def window_hashes(
    docs: DataFrame,
    w: int = 16,
    stride: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One (doc_id, p, h) row per w-token window at each stride offset.

    ``p`` is the 0-based token index of the window start; ``h`` the 60-bit
    hash of the space-joined window text. Documents shorter than ``w``
    tokens emit nothing.
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ", -1).alias("t"),
    )
    return (
        toks.filter(F.size("t") >= w)
        .select(
            "doc_id",
            "t",
            F.explode(F.expr(f"sequence(0, size(t) - {w}, {stride})")).alias("p"),
        )
        .select(
            "doc_id",
            F.col("p").cast("bigint").alias("p"),
            F.expr(
                h60_sql(f"concat_ws(' ', slice(t, p + 1, {w}))")
            ).alias("h"),
        )
    )


def winnow_fingerprints(
    docs: DataFrame,
    k: int = 4,
    w: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Winnowed document fingerprints (the MOSS scheme): one (doc_id, p, h)
    row per SELECTED k-token gram, where each window of ``w`` consecutive
    gram hashes contributes its minimum (ties -> leftmost).

    Why this exists next to ``window_hashes``: stride-tiled windows only
    match repeats whose alignment difference is a multiple of the stride;
    winnowing guarantees that ANY shared token run of length
    >= w + k - 1 shares at least one selected fingerprint, at ~1/w the
    fingerprint density of exhaustive stride-1 hashing. The selection is
    ARRAY-LOCAL — gram hashes and window minima are computed inside one
    row's arrays (transform/slice/array_min), so the corpus-wide shuffle
    carries only the selected (doc_id, p, h) rows, ~2/(w+1) per token.

    Deterministic and engine-portable: gram hash is the h60 primitive;
    the window minimum ties break to the smallest position via
    array_position's first-match semantics (DuckDB list_position agrees).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ", -1).alias("t"),
    )
    gram = f"concat_ws(' ', slice(t, i + 1, {k}))"
    hs = f"transform(sequence(0, size(t) - {k}), i -> {h60_sql(gram)})"
    win = f"slice(hs, j + 1, {w})"
    sel = (
        f"array_distinct(transform(sequence(0, size(hs) - {w}), j -> "
        f"struct(CAST(j + array_position({win}, array_min({win})) - 1 AS BIGINT) AS p, "
        f"array_min({win}) AS h)))"
    )
    return (
        toks.filter(F.size("t") >= k + w - 1)
        .select("doc_id", F.expr(hs).alias("hs"))
        .select("doc_id", F.explode(F.expr(sel)).alias("fp"))
        .select("doc_id", F.col("fp.p").alias("p"), F.col("fp.h").alias("h"))
    )


def winnow_repeated_report(
    docs: DataFrame,
    k: int = 4,
    w: int = 4,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document matches over winnowed fingerprints: one row per
    fingerprint hash selected in >= min_docs documents, with the global
    first occurrence via the same partial-aggregatable composite MIN as
    ``repeated_spans`` (no hot-key window)."""
    fp = winnow_fingerprints(docs, k, w, text_col, id_col)
    return (
        fp.groupBy("h")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
            F.min(F.col("doc_id") * POS_RADIX + F.col("p")).alias("firstkey"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .select(
            "h",
            "n_docs",
            "n_occ",
            F.expr(f"firstkey DIV {POS_RADIX}").alias("first_doc"),
            F.pmod(F.col("firstkey"), F.lit(POS_RADIX)).alias("first_pos"),
        )
    )


def repeated_spans(
    docs: DataFrame,
    w: int = 16,
    stride: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document repeated-span report.

    Returns (h, n_docs, n_occ, first_doc, first_pos, span_text), one row
    per distinct w-token span seen in >= min_docs documents; ``first_doc``
    / ``first_pos`` is the global first occurrence ordered by
    (doc_id, pos). Span text is recovered by slicing the first-occurrence
    document — only repeated spans (small) join back to text.
    """
    occ = window_hashes(docs, w, stride, text_col, id_col)
    rep = (
        occ.groupBy("h")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occ"),
            F.min(F.col("doc_id") * POS_RADIX + F.col("p")).alias("firstkey"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .select(
            "h",
            "n_docs",
            "n_occ",
            F.expr(f"firstkey DIV {POS_RADIX}").alias("first_doc"),
            F.pmod(F.col("firstkey"), F.lit(POS_RADIX)).alias("first_pos"),
        )
    )
    toks = docs.select(
        F.col(id_col).alias("first_doc"),
        F.split(F.col(text_col), " ", -1).alias("t"),
    )
    return rep.join(toks, "first_doc").select(
        "h",
        "n_docs",
        "n_occ",
        "first_doc",
        "first_pos",
        F.expr(f"concat_ws(' ', slice(t, CAST(first_pos AS INT) + 1, {w}))").alias(
            "span_text"
        ),
    )


def drop_repeated_spans(
    docs: DataFrame,
    w: int = 16,
    stride: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Span-drop survivors: remove every occurrence of a repeated span
    except the global first.

    Returns one row per input document:
    (doc_id, n_tokens, kept_tokens, n_spans_dropped, kept_text) where
    ``kept_text`` is the document with redundant-span token positions
    removed (the first occurrence corpus-wide keeps its tokens; later
    ones lose [p, p+w) — overlapping dropped windows union their
    coverage). Documents with no redundant spans pass through intact.
    """
    occ = window_hashes(docs, w, stride, text_col, id_col)
    rep = (
        occ.groupBy("h")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.min(F.col("doc_id") * POS_RADIX + F.col("p")).alias("firstkey"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .select("h", "firstkey")
    )
    redundant = occ.join(rep, "h").filter(
        F.col("doc_id") * POS_RADIX + F.col("p") != F.col("firstkey")
    )
    per_doc = redundant.groupBy("doc_id").agg(
        F.sort_array(F.collect_list("p")).alias("starts"),
        F.count(F.lit(1)).alias("n_spans_dropped"),
    )
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ", -1).alias("t"),
    )
    joined = toks.join(per_doc, "doc_id", "left").select(
        "doc_id",
        "t",
        F.coalesce(F.col("starts"), F.expr("CAST(array() AS array<bigint>)")).alias(
            "starts"
        ),
        F.coalesce(F.col("n_spans_dropped"), F.lit(0)).alias("n_spans_dropped"),
    )
    covered = f"array_distinct(flatten(transform(starts, s -> sequence(s, s + {w - 1}))))"
    kept = (
        f"filter(t, (x, i) -> NOT array_contains({covered}, CAST(i AS BIGINT)))"
    )
    return joined.select(
        "doc_id",
        F.size("t").cast("bigint").alias("n_tokens"),
        F.expr(f"CAST(size({kept}) AS BIGINT)").alias("kept_tokens"),
        "n_spans_dropped",
        F.expr(f"concat_ws(' ', {kept})").alias("kept_text"),
    )
