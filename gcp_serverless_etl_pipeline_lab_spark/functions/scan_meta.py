"""Scan-metadata probes: size facts about a DataFrame's file source,
computed from ``inputFiles()`` — driver-side metadata, no Spark job.

Used to make scale-dependent plan choices (broadcast hints, persist-vs-
recompute staging) self-tuning instead of pinned to either local-mode or
cluster constants (round 16; guide §1.2 "the distributed algorithm
first", §3.1 broadcast sizing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def source_bytes(df: DataFrame) -> int | None:
    """Total bytes of ``df``'s input files, or None when the frame has no
    file source (literal/RDD-backed inputs)."""
    try:
        files = df.inputFiles()
        if not files:
            return None
        import os
        from urllib.parse import unquote, urlparse

        total = 0
        for f in files:
            p = unquote(urlparse(f).path) if "://" in f else f
            total += os.path.getsize(p)
        return total
    except Exception:
        return None
