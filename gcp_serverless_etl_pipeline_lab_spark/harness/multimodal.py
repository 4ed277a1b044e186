"""Multimodal binary-column harness queries: payload feature extraction
and frame sampling over opaque binary columns via Arrow-batched
mapInPandas (operators/multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators import multimodal
from ._registry import _t, register

# ---------------------------------------------------------------------------
# Multimodal binary-column plumbing
# ---------------------------------------------------------------------------

_BYTE0_DUCK = "CAST(('0x' || substr(md5(text), 1, 2)) AS INTEGER)"
_CHECKSUM_DUCK = (
    "CAST(list_sum(list_transform(range(0, 16), "
    "i -> CAST(('0x' || substr(md5(text), 2 * i + 1, 2)) AS INTEGER))) "
    f"% {multimodal.CHECKSUM_MOD} AS INTEGER)"
)


@register(
    "mm_decode_features",
    f"""
    SELECT doc_id,
           16 AS n_bytes,
           {_BYTE0_DUCK} AS first_byte,
           {_CHECKSUM_DUCK} AS checksum,
           CAST(1 + doc_id % 64 AS INTEGER) AS width,
           CAST(1 + doc_id % 48 AS INTEGER) AS height
    FROM documents ORDER BY doc_id
    """,
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = multimodal.attach_fake_payload(_t(spark, sf_dir, "documents"))
    return multimodal.payload_features(media).orderBy("doc_id")

@register(
    "mm_frame_sample",
    f"""
    SELECT doc_id,
           CAST(j AS INTEGER) AS frame_idx,
           CAST(('0x' || substr(md5(text || '|' || CAST(j AS VARCHAR)), 1, 2))
                AS INTEGER) AS frame_first_byte
    FROM documents, (SELECT unnest([0, 3, 6]) AS j)
    ORDER BY doc_id, frame_idx
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    video = multimodal.attach_fake_frames(_t(spark, sf_dir, "documents"))
    return multimodal.sample_frames(video).orderBy("doc_id", "frame_idx")
