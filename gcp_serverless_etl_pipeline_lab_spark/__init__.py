"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference GCP serverless ETL lab
(MuhammadSalem10/GCP-Serverless-ETL-Pipeline-Lab), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession factory (local tuning, oracle-safe conf).
- ``sources``    : scans — naive-split CSV text scan (S1), parquet tables,
                   file-arrival sensor (S4).
- ``operators``  : the validation chain (R1-R12), dedup family, similarity
                   search, text analysis, multimodal column plumbing.
- ``functions``  : reusable column-expression helpers (cleaning, hashing,
                   vector math) — all JVM-side built-ins, no Python UDFs
                   in the hot path.
- ``plans``      : the reference's SQL analytics surface (A1-A7, Q1 gate).
- ``streaming``  : Structured Streaming file-arrival micro-batch (availableNow).
- ``sinks``      : overwrite warehouse writer (S2), dead-letter writer (S3).
- ``pipeline``   : the orchestrated end-to-end run (Q5).

Everything here is public-API PySpark (DataFrame / Spark SQL / Catalyst /
Structured Streaming). Reference file:line citations in docstrings point at
the behavior being matched, never at code being copied.
"""

__version__ = "0.1.0"
