"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched ``mapInPandas``.

The Spark-side machinery — schema, partitioning, UDF signature, batch
iteration — is real and tested; the actual media decode is stubbed behind
``decode_image`` (the codec libraries are not in this container), with a
deterministic fake used by tests and a clearly marked NotImplementedError
on the real path. Swapping in PIL/ffmpeg is a one-function change; the
distributed plan (columnar Arrow batches in, feature rows out, no
per-row Python) is already the production shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),  # opaque encoded bytes
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                    T.StructField("n_frames", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("payload_sha256", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_ppm(payload: bytes) -> list[float]:
    """Real, dependency-free decode of a binary PPM (P6) image: header
    tokenizer (whitespace + ``#`` comments per the netpbm spec), then the
    raw RGB plane via numpy. Returns the engine's 8-dim feature:
    (w, h scaled) + per-channel means + overall mean + contrast (std) +
    maxval flag — deterministic and byte-stable across replays."""
    import numpy as np

    buf = payload
    i, tokens = 2, []  # past the 'P6' magic
    while len(tokens) < 3:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if buf[i : i + 1] == b"#":
            while i < len(buf) and buf[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        if i == j:
            raise ValueError("truncated PPM header")
        tokens.append(int(buf[i:j]))
        i = j
    w, h, maxval = tokens
    i += 1  # exactly one whitespace byte separates maxval from the raster
    if maxval > 255:
        raise NotImplementedError("16-bit PPM rasters not supported")
    px = np.frombuffer(buf, dtype=np.uint8, offset=i, count=w * h * 3)
    if px.size != w * h * 3:
        raise ValueError("truncated PPM raster")
    rgb = px.reshape(h, w, 3).astype(np.float64) / maxval
    return [
        float(w) / 4096.0,
        float(h) / 4096.0,
        float(rgb[:, :, 0].mean()),
        float(rgb[:, :, 1].mean()),
        float(rgb[:, :, 2].mean()),
        float(rgb.mean()),
        float(rgb.std()),
        maxval / 255.0,
    ]


def _decode_bmp(payload: bytes) -> list[float]:
    """Real, dependency-free decode of an uncompressed 24-bit BMP
    (BITMAPINFOHEADER, the overwhelmingly common layout): pixel rows are
    bottom-up, BGR order, padded to 4-byte boundaries. Emits the SAME
    8-dim feature shape as :func:`_decode_ppm` (last slot = 1.0 marks the
    8-bit-channel source) so downstream similarity code is format-blind."""
    import struct

    import numpy as np

    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMPs not supported")
    w, h = struct.unpack_from("<ii", payload, 18)
    planes, bpp = struct.unpack_from("<HH", payload, 26)
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (got bpp={bpp})")
    top_down = h < 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    raster = np.frombuffer(payload, dtype=np.uint8, offset=off,
                           count=stride * h)
    if raster.size != stride * h:
        raise ValueError("truncated BMP raster")
    rows = raster.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        rows = rows[::-1]
    bgr = rows.astype(np.float64) / 255.0
    return [
        float(w) / 4096.0,
        float(h) / 4096.0,
        float(bgr[:, :, 2].mean()),  # R (BMP stores BGR)
        float(bgr[:, :, 1].mean()),  # G
        float(bgr[:, :, 0].mean()),  # B
        float(bgr.mean()),
        float(bgr.std()),
        1.0,
    ]


def decode_image(payload: bytes, fake: bool = True) -> list[float]:
    """Decode + feature-extract one image payload.

    ``fake=True`` (tests / this container): a deterministic 8-dim feature
    from the payload digest — byte-stable across replays.
    ``fake=False``: REAL decode — binary PPM (P6) is parsed end-to-end in
    pure Python/numpy inside the Arrow batch (no codec libraries needed);
    codec-bound formats (PNG/JPEG/...) still raise — PIL/ffmpeg are not in
    this container and faking them would hide a production gap.
    """
    if not fake:
        if payload[:2] == b"P6":
            return _decode_ppm(payload)
        if payload[:2] == b"BM":
            return _decode_bmp(payload)
        raise NotImplementedError(
            "real media decode beyond PPM requires PIL/ffmpeg, not present "
            "in this container"
        )
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def extract_features(media: DataFrame, fake_decode: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary media columns.

    ``mapInPandas``: each Arrow batch arrives as a pandas DataFrame; the
    decode is applied vectorized per batch (pandas map over the payload
    series — the decode itself is the only per-item work, as it must be
    for opaque codecs) and a feature table comes back. Partitioning,
    spill and schema are all handled by Spark; no driver-side loops.
    """

    def _batch_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else None),
                    "payload_sha256": payloads.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "feature": payloads.map(
                        lambda b: decode_image(b, fake=fake_decode) if b is not None else None
                    ),
                }
            )

    return media.mapInPandas(_batch_fn, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 2) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    frame index (the decode of the frame itself is the stubbed step).
    Pure column ops — sequence + explode, no Python."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.coalesce(F.col("meta.n_frames"), F.lit(1)) - 1, F.lit(every_n))
            ).alias("frame_idx"),
        )
    )
