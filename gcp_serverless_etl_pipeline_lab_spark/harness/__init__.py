"""Correctness-harness query registry (one package, per-family modules).

One named entry per implemented operator (SURVEY.md §2 + the
training-data-pipeline extensions). Each entry pairs a Spark DataFrame
builder ``(spark, sf_dir) -> DataFrame`` with an equivalent DuckDB SQL
oracle over the same parquet tables (views: region nation customer supplier
part orders lineitem events documents embeddings). Determinism rules:

- every computed column is aliased identically on both sides;
- double aggregates are ROUND(x, 2); dates/timestamps are emitted as
  formatted strings; DuckDB HUGEINT sums are cast to BIGINT;
- anything order-dependent carries a total tiebreak.

Family modules (each registers its queries on import):

- ``etl``         sales-ETL validation chain on synthesized messy CSV (S1, R1-R12)
- ``reports``     the reference's aggregate reports (A1-A8) + profiling/DQ/sketch gates
- ``relational``  joins, windows, grouping sets, set ops, TPC-H shapes, skew/layout joins
- ``events``      event-stream analytics: sessions, funnels, SCD2, drift, CMS, rolling windows
- ``dedup``       exact/near-dup detection: n-gram, MinHash-LSH, SimHash, embedding, sequence-level
- ``similarity``  ANN search and kNN graphs: brute-force, IVF, sign-LSH, PageRank
- ``text``        text analysis: token stats, lang-ID, quality, LM scoring, BM25, fuzzy join
- ``corpus``      corpus curation: prep pipeline, mixing, decontamination, chunking, packing, PII
- ``storage``     format/layout round-trips: JSONL, ORC, RFC CSV, bucketed/partitioned, compaction
- ``multimodal``  binary-column plumbing: payload features, frame sampling
- ``sql``         the oracled ``spark.sql`` surface (literal DAG/README SQL)
"""

from __future__ import annotations

from ._registry import QUERIES, Query, _t, query_names, register  # noqa: F401

# Family modules register their queries on import; etl/text/dedup first —
# sql reuses etl's oracle fragments and corpus reuses text/dedup constants.
from . import etl  # noqa: E402,F401
from . import text  # noqa: E402,F401
from . import dedup  # noqa: E402,F401
from . import similarity  # noqa: E402,F401
from . import corpus  # noqa: E402,F401
from . import reports  # noqa: E402,F401
from . import relational  # noqa: E402,F401
from . import events  # noqa: E402,F401
from . import storage  # noqa: E402,F401
from . import multimodal  # noqa: E402,F401
from . import sql  # noqa: E402,F401
