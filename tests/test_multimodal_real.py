"""Real-codec multimodal decode (operators/multimodal.py Pillow path).

Skips where Pillow is absent (this test container); in an environment
with Pillow the whole pipeline — synthesize real PNGs, ship them through
the Arrow-batched mapInPandas decode stage, verify decoded features —
runs end to end.
"""

from __future__ import annotations

import pytest

PIL = pytest.importorskip("PIL")


def _png_bytes(w: int, h: int, value: int) -> bytes:
    import io

    from PIL import Image

    img = Image.new("L", (w, h), color=value)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_payload_features_real_decodes_pngs(spark):
    from gcp_serverless_etl_pipeline_lab_spark.operators.multimodal import (
        payload_features_real,
    )

    rows = [
        (1, _png_bytes(8, 4, 0)),
        (2, _png_bytes(16, 16, 128)),
        (3, _png_bytes(3, 7, 255)),
    ]
    media = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r["doc_id"]: r for r in payload_features_real(media).collect()}
    assert got[1]["width"] == 8 and got[1]["height"] == 4
    assert got[1]["n_pixels"] == 32 and got[1]["mean_luma"] == 0.0
    assert got[2]["n_pixels"] == 256 and abs(got[2]["mean_luma"] - 128.0) < 1e-9
    assert got[3]["mean_luma"] == 255.0
    assert got[3]["mode"] == "L"


def test_decode_image_real_roundtrip():
    from gcp_serverless_etl_pipeline_lab_spark.operators.multimodal import (
        decode_image_real,
    )

    img = decode_image_real(_png_bytes(5, 9, 42))
    assert (img.width, img.height) == (5, 9)
