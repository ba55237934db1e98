"""Multimodal binary-column plumbing: images / audio / video as opaque
``binary`` columns with typed metadata, processed through ``mapInPandas``.

Fully-real decoders (pure numpy + stdlib zlib, no codec libraries):
* audio WAV-PCM16 — ``dataverifyr_spark.audio.wav``
* still images PPM/BMP/PNG + video Y4M frame sampling — ``operators.image``
* baseline JPEG — ``operators.jpeg`` (numpy DCT, Python Huffman layer)

Compressed video gets a REAL container-level probe — ``operators.h264``
parses Annex-B NAL/SPS/slice headers for resolution + frame/IDR counts with
no pixel decode (that's what validation needs; ``video_probe`` dispatches on
magic).  Only PIXEL decode of compressed video remains a deterministic fake
(``decode_image_stub``), because it needs a codec library this environment
lacks; swapping it for a real codec changes only the inner function, not the
plan shape — the Arrow batch iteration, schema contracts, and
partition-preserving transforms here are real and tested either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["decode_image_stub", "extract_media_features", "MEDIA_FEATURE_SCHEMA"]

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


def decode_image_stub(blob: bytes, target_size: tuple[int, int] = (32, 32)) -> np.ndarray:
    """PIXEL-decode fake for compressed video codecs (container metadata is
    real — ``operators.h264.h264_info``; stills are real —
    ``operators.image.decode_image``).  Deterministic hash-seeded pixels with
    the right shape/dtype so downstream contracts are fully exercised; a
    production cluster swaps in PIL/cv2 via
    ``operators.image.register_decoder`` without touching the plan shape."""
    if blob is None:
        raise ValueError("NULL blob (decode_image_stub)")
    seed = len(blob) % (2**31)
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(*target_size, 3), dtype=np.uint8)


def extract_media_features(
    df: DataFrame,
    id_col: str = "media_id",
    bytes_col: str = "bytes",
    feature_dim: int = 8,
) -> DataFrame:
    """mapInPandas pipeline: binary column → per-item feature vector.

    Partition-preserving (no shuffle); one Arrow batch in, one out.  The
    feature extractor is the deterministic stub — byte-histogram moments —
    standing in for a real embedding model.
    """

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
                sizes.append(len(b))
                fmts.append(_sniff(b))
                arr = np.frombuffer(b, dtype=np.uint8)
                # deterministic cheap "features": chunked byte means
                chunks = np.array_split(arr, feature_dim) if len(arr) >= feature_dim else []
                feats.append(
                    [float(c.mean()) for c in chunks] if len(chunks) == feature_dim else None
                )
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
