"""Deterministic cross-dialect 60-bit hash primitive.

Near-dup detection (MinHash, SimHash, fingerprinting) needs a hash function
that computes IDENTICALLY in the Spark engine and in the DuckDB oracle so
the correctness harness can compare results value-for-value. Neither
engine's native `hash()` matches the other (Spark = Murmur3-32, DuckDB =
its own 64-bit), so we standardize on the first 15 hex chars of MD5
(60 bits, always non-negative in a signed 64-bit lane):

    Spark : CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)
    DuckDB: CAST(('0x' || substr(md5(x), 1, 15)) AS BIGINT)

Both verified equal (see tests/test_extensions.py). MD5 is ~10× slower
than Murmur3; at 100 TB you would swap in `xxhash64` engine-side and drop
the cross-dialect constraint — the operator structure is hash-agnostic
(every call site goes through these two helpers).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def h60_sql(expr: str) -> str:
    """Spark-SQL snippet: 60-bit hash of a string expression."""
    return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def h60_duck(expr: str) -> str:
    """DuckDB snippet computing the identical value."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 15)) AS BIGINT)"


def h60(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")
