"""Multimodal (binary) column plumbing for training-data pipelines.

Model: media lives in an opaque `binary` payload column next to typed
metadata (width/height/format). Decode / feature-extract / frame-sample run
as Arrow-batched `mapInPandas` stages — the one place Python belongs in
this engine, because media codecs are Python/C libraries. Everything
Spark-side (schemas, batch shapes, 1→N frame fan-out, partitioning) is
real and oracle-tested; the codec itself is a deterministic fake because
image/audio libraries are not available in this environment.

REAL DECODE: `payload_features_real` runs an actual decoder inside the
mapInPandas stage, selected via a pluggable codec — Pillow where
installed (import-gated with an actionable message), the stdlib netpbm
(P5/P6) decoder everywhere (so the real-decode path is TESTED in this
container despite its no-install policy: tests/test_multimodal_real.py),
or any user callable. The harness queries use `payload_features` /
`sample_frames`, whose byte-level arithmetic a SQL oracle can reproduce
exactly.

Scale notes: mapInPandas streams Arrow record batches (no row-at-a-time
pickling); payload bytes never hit the driver; a decode stage is
embarrassingly parallel so throughput scales with executors × batch size.
Keep `spark.sql.execution.arrow.maxRecordsPerBatch` sized so one batch of
payloads fits executor memory (media rows are wide).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CHECKSUM_MOD = 997
NUM_FRAMES = 8
FRAME_STRIDE = 3  # sample frames 0, 3, 6


def attach_fake_payload(docs: DataFrame) -> DataFrame:
    """Deterministic 16-byte fake 'image' payload (md5 digest of the text)
    plus typed metadata — the multimodal table constructor used by tests
    and the harness."""
    return docs.select(
        "doc_id",
        F.unhex(F.md5("text")).alias("payload"),
        (1 + F.col("doc_id") % 64).cast("int").alias("width"),
        (1 + F.col("doc_id") % 48).cast("int").alias("height"),
        F.lit("fake16").alias("fmt"),
    )


def attach_fake_frames(docs: DataFrame) -> DataFrame:
    """Fake 'video': NUM_FRAMES concatenated 16-byte frames
    (md5(text|frame_idx) each) in one binary payload."""
    frames = [F.unhex(F.md5(F.concat_ws("|", F.col("text"), F.lit(str(j))))) for j in range(NUM_FRAMES)]
    return docs.select("doc_id", F.concat(*frames).alias("payload"))


FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", IntegerType()),
        StructField("first_byte", IntegerType()),
        StructField("checksum", IntegerType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def payload_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature-extract stage (fake codec: length,
    first byte, byte-sum checksum). Shape of a real image featurizer:
    binary in → fixed-schema features out, one output row per input row."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": payloads.map(len).astype("int32"),
                    "first_byte": payloads.map(lambda b: b[0]).astype("int32"),
                    "checksum": payloads.map(
                        lambda b: sum(b) % CHECKSUM_MOD
                    ).astype("int32"),
                    "width": pdf["width"],
                    "height": pdf["height"],
                }
            )

    return media.mapInPandas(extract, schema=FEATURES_SCHEMA)


FRAMES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_first_byte", IntegerType()),
    ]
)


def sample_frames(
    video: DataFrame, frame_bytes: int = 16, stride: int = FRAME_STRIDE
) -> DataFrame:
    """Frame-sampling stage: 1 input row → one output row per sampled
    frame (every `stride`-th). The 1→N fan-out inside mapInPandas is the
    shape a real video pipeline uses (decode keyframes, drop the rest)."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc, out_idx, out_fb = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = len(payload) // frame_bytes
                for j in range(0, n_frames, stride):
                    out_doc.append(doc_id)
                    out_idx.append(j)
                    out_fb.append(payload[j * frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out_doc, dtype="int64"),
                    "frame_idx": pd.Series(out_idx, dtype="int32"),
                    "frame_first_byte": pd.Series(out_fb, dtype="int32"),
                }
            )

    return video.mapInPandas(sample, schema=FRAMES_SCHEMA)


def decode_image_real(payload: bytes):
    """Decode a real image payload with Pillow. Import-gated: raises
    ImportError with an actionable message where Pillow is absent (this
    test container has no imaging libraries; the deterministic fake
    codec in payload_features/sample_frames exercises the identical
    Spark plumbing there)."""
    try:
        from PIL import Image
    except ImportError as exc:  # pragma: no cover - env without Pillow
        raise ImportError(
            "decode_image_real requires Pillow (`pip install Pillow`); "
            "use payload_features (deterministic fake codec) where real "
            "decoding isn't needed."
        ) from exc
    import io

    return Image.open(io.BytesIO(payload))


REAL_FEATURES_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mode", StringType()),
        StructField("n_pixels", LongType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def decode_netpbm(payload: bytes) -> dict:
    """Stdlib binary netpbm decoder — PGM (``P5``, 8-bit gray) and PPM
    (``P6``, 8-bit RGB). Returns the codec contract of
    ``payload_features_real``: ``{"width", "height", "mode",
    "mean_luma"}`` with mode ``L``/``RGB`` and mean luminance per
    ITU-R 601-2 (L = 0.299 R + 0.587 G + 0.114 B).

    Exists so the REAL-decode Spark path is executable in environments
    without imaging libraries (this container): netpbm is parseable in
    ~40 lines of stdlib Python, so the mapInPandas decode stage — header
    parse, per-pixel reduction, malformed-payload failure — runs for
    real instead of being skipped. Production swaps in the Pillow codec
    (or any ``bytes -> dict``) with zero Spark-plumbing change."""
    buf = bytes(payload)

    pos = 0

    def tok() -> bytes:
        nonlocal pos
        while pos < len(buf):
            c = buf[pos : pos + 1]
            if c == b"#":
                while pos < len(buf) and buf[pos] != 0x0A:
                    pos += 1
            elif c.isspace():
                pos += 1
            else:
                break
        start = pos
        while pos < len(buf) and not buf[pos : pos + 1].isspace():
            pos += 1
        if start == pos:
            raise ValueError("netpbm: truncated header")
        return buf[start:pos]

    magic = tok()
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"netpbm: unsupported magic {magic!r} (want P5/P6)")
    w, h, maxval = int(tok()), int(tok()), int(tok())
    if w <= 0 or h <= 0:
        raise ValueError(f"netpbm: bad dimensions {w}x{h}")
    if maxval != 255:
        raise ValueError(f"netpbm: only maxval 255 supported, got {maxval}")
    pos += 1  # exactly ONE whitespace byte separates header and raster
    n = w * h
    if magic == b"P5":
        raster = buf[pos : pos + n]
        if len(raster) != n:
            raise ValueError("netpbm: raster shorter than width*height")
        return {
            "width": w,
            "height": h,
            "mode": "L",
            "mean_luma": sum(raster) / n,
        }
    raster = buf[pos : pos + 3 * n]
    if len(raster) != 3 * n:
        raise ValueError("netpbm: raster shorter than 3*width*height")
    # integer accumulation (exact), one float division at the end
    acc = (
        299 * sum(raster[0::3]) + 587 * sum(raster[1::3]) + 114 * sum(raster[2::3])
    )
    return {
        "width": w,
        "height": h,
        "mode": "RGB",
        "mean_luma": acc / (1000.0 * n),
    }


def _pillow_codec(payload: bytes) -> dict:
    import io

    from PIL import Image, ImageStat

    img = Image.open(io.BytesIO(bytes(payload)))
    return {
        "width": img.width,
        "height": img.height,
        "mode": img.mode,
        "mean_luma": float(ImageStat.Stat(img.convert("L")).mean[0]),
    }


def payload_features_real(media: DataFrame, codec="pillow") -> DataFrame:
    """Real-codec twin of ``payload_features``: Arrow-batched mapInPandas
    stage that DECODES each binary payload and emits typed image features
    (dimensions, mode, mean 8-bit luminance). Exactly the fake codec's
    shape — binary in, fixed-schema features out, one row per image — so
    swapping codecs changes no Spark plumbing.

    ``codec`` selects the decoder: ``"pillow"`` (default; import-gated at
    BUILD time so a missing library fails fast on the driver with a clear
    message rather than as per-task executor errors), ``"netpbm"`` (the
    stdlib P5/P6 decoder above — always available, exercised end to end
    in tests/test_multimodal_real.py), or any callable
    ``bytes -> {"width", "height", "mode", "mean_luma"}``. Executors
    decode inside the Arrow batch loop; payload bytes never touch the
    driver."""
    if codec == "pillow":
        try:
            import PIL  # noqa: F401
        except ImportError as exc:  # pragma: no cover - env without Pillow
            raise ImportError(
                "payload_features_real(codec='pillow') requires Pillow on "
                "driver and executors; pass codec='netpbm' for the stdlib "
                "decoder or use payload_features for the codec-free "
                "pipeline."
            ) from exc
        decode = _pillow_codec
    elif codec == "netpbm":
        decode = decode_netpbm
    elif callable(codec):
        decode = codec
    else:
        raise ValueError(
            f"codec must be 'pillow', 'netpbm', or a callable, got {codec!r}"
        )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            doc_ids, widths, heights, modes, pixels, lumas = [], [], [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                img = decode(payload)
                doc_ids.append(doc_id)
                widths.append(img["width"])
                heights.append(img["height"])
                modes.append(img["mode"])
                pixels.append(img["width"] * img["height"])
                lumas.append(float(img["mean_luma"]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(doc_ids, dtype="int64"),
                    "width": pd.Series(widths, dtype="int32"),
                    "height": pd.Series(heights, dtype="int32"),
                    "mode": pd.Series(modes, dtype="object"),
                    "n_pixels": pd.Series(pixels, dtype="int64"),
                    "mean_luma": pd.Series(lumas, dtype="float64"),
                }
            )

    return media.mapInPandas(extract, schema=REAL_FEATURES_SCHEMA)
