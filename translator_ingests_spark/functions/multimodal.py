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


def decode_image(payload: bytes, fake: bool = True) -> list[float]:
    """Decode + feature-extract one image payload.

    ``fake=True`` (tests / this container): a deterministic 8-dim feature
    from the payload digest — byte-stable across replays.
    ``fake=False``: the real decoder slot — not available here.
    """
    if not fake:
        raise NotImplementedError(
            "real media decode requires PIL/ffmpeg, not present in this container"
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
