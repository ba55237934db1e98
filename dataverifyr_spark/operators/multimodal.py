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
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["extract_media_features", "MEDIA_FEATURE_SCHEMA"]

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
