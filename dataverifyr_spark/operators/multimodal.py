"""Multimodal binary-column plumbing: images / audio / video as opaque
``binary`` columns with typed metadata, processed through ``mapInPandas``.

Fully-real decoders (pure numpy + stdlib zlib, no codec libraries):
* audio WAV-PCM16 — ``dataverifyr_spark.audio.wav``
* still images PPM/BMP/PNG + video Y4M frame sampling — ``operators.image``
* baseline JPEG — ``operators.jpeg`` (numpy DCT, Python Huffman layer)

Compressed video is real end-to-end: ``operators.h264`` parses Annex-B
NAL/SPS/slice headers for resolution + frame/IDR counts with no pixel
decode, and ``operators.mjpeg`` does REAL compressed-video PIXEL decode
(AVI/RIFF or bare MJPEG container walk feeding sampled frames through the
numpy baseline-JPEG codec) — ``video_probe`` dispatches on magic.  The
former ``decode_image_stub`` fake was retired in r5; production clusters
can still swap faster codec libraries in via
``operators.image.register_decoder`` without touching the plan shape.

The feature pipeline (``extract_media_features``) is likewise pluggable
(r6): :func:`register_feature_extractor` installs a real embedding model;
:func:`default_feature_extractor` (deterministic chunked byte means) is the
documented default so the plumbing runs model-free.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = [
    "extract_media_features",
    "register_feature_extractor",
    "default_feature_extractor",
    "MEDIA_FEATURE_SCHEMA",
]

MEDIA_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("format_guess", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

_MAGIC = {
    b"\x89PNG": "png",
    b"\xff\xd8\xff": "jpeg",
    b"RIFF": "riff",  # wav/avi/webp container
    b"GIF8": "gif",
    b"\x00\x00\x00": "mp4?",
}


def _sniff(blob: bytes | None) -> str | None:
    if not blob:
        return None
    if blob[:4] == b"\x00\x00\x00\x01" or blob[:3] == b"\x00\x00\x01":
        return "h264-annexb"
    for magic, name in _MAGIC.items():
        if blob[: len(magic)] == magic:
            return name
    return "unknown"


def default_feature_extractor(blob: bytes, fmt: str | None, feature_dim: int) -> list[float] | None:
    """The DEFAULT feature function — deterministic chunked byte means.

    This is a cheap content fingerprint, NOT a learned embedding; it is the
    documented default so the pipeline is runnable (and its Spark plumbing
    testable) in environments with no model runtime.  Production swaps in a
    real embedding model via ``register_feature_extractor`` — the Spark side
    (schema, Arrow batching, partition-preservation) is identical either
    way."""
    arr = np.frombuffer(blob, dtype=np.uint8)
    chunks = np.array_split(arr, feature_dim) if len(arr) >= feature_dim else []
    if len(chunks) != feature_dim:
        return None
    return [float(c.mean()) for c in chunks]


# one-slot override registry, the operators.image.register_decoder pattern:
# the active extractor is resolved when extract_media_features is CALLED and
# shipped to executors inside the mapInPandas closure
_FEATURE_OVERRIDE: list = [None]


def register_feature_extractor(fn) -> None:
    """Install a replacement media feature function:
    ``fn(blob: bytes, fmt: str | None, feature_dim: int) -> list[float] | None``
    (e.g. an image/audio embedding model loaded per executor).  Pass ``None``
    to restore :func:`default_feature_extractor`.  The function must be
    picklable (top-level def / functools.partial — it ships to executors) and
    should return either ``feature_dim`` floats or ``None`` for
    can't-featurize inputs."""
    if fn is not None and not callable(fn):
        raise TypeError("feature extractor must be callable or None")
    _FEATURE_OVERRIDE[0] = fn


def extract_media_features(
    df: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "bytes",
    feature_dim: int = 8,
    feature_fn=None,
) -> DataFrame:
    """mapInPandas pipeline: binary column → per-item feature vector.

    Partition-preserving (no shuffle); one Arrow batch in, one out.  The
    feature function is, in precedence order: the explicit ``feature_fn``
    argument, the global :func:`register_feature_extractor` override, else
    :func:`default_feature_extractor` (documented byte-histogram default).
    """
    fn = feature_fn or _FEATURE_OVERRIDE[0] or default_feature_extractor

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, sizes, fmts, feats = [], [], [], []
            for mid, blob in zip(pdf[id_col], pdf[bytes_col]):
                ids.append(mid)
                if blob is None:
                    sizes.append(None)
                    fmts.append(None)
                    feats.append(None)
                    continue
                b = bytes(blob)
                fmt = _sniff(b)
                sizes.append(len(b))
                fmts.append(fmt)
                vec = fn(b, fmt, feature_dim)
                feats.append(None if vec is None else [float(x) for x in vec])
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="object"),
                    "n_bytes": pd.Series(sizes, dtype="object"),
                    "format_guess": pd.Series(fmts, dtype="object"),
                    "feature": pd.Series(feats, dtype="object"),
                }
            )

    src = df.select(
        df[id_col].cast("string").alias(id_col), df[bytes_col].alias(bytes_col)
    )
    return src.mapInPandas(extract, MEDIA_FEATURE_SCHEMA)
