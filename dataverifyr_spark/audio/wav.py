"""Minimal RIFF/WAVE PCM16 codec in pure numpy (the WAV container format is
public: RIFF chunks, fmt block per Microsoft WAVEFORMAT, little-endian PCM).

No external audio library — the container decode is ~30 lines and the sample
payload is a straight ``np.frombuffer``.  FLAC/OPUS etc. would require codecs
not present in this environment; they are stubbed at the rules layer with the
same signature so the Spark plumbing stays identical.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_wav_pcm16", "decode_wav", "snr_db", "WavError"]


class WavError(ValueError):
    pass


def encode_wav_pcm16(pcm: np.ndarray, sr_hz: int) -> bytes:
    """float PCM in [-1, 1] (or int16) → mono WAV bytes."""
    if pcm.dtype != np.int16:
        samples = np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0)
        ints = np.round(samples * 32767.0).astype("<i2")
    else:
        ints = pcm.astype("<i2")
    data = ints.tobytes()
    byte_rate = sr_hz * 2
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr_hz, byte_rate, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 sample array, sample rate).  Raises WavError on any
    malformed container."""
    if blob is None or len(blob) < 44 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE container")
    pos = 12
    sr = None
    bits = None
    channels = None
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos : pos + 4]
        (size,) = struct.unpack_from("<I", blob, pos + 4)
        if pos + 8 + size > len(blob):
            raise WavError(f"truncated chunk {cid!r}: declares {size} bytes past EOF")
        body = blob[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise WavError("fmt chunk too short")
            fmt_code, channels, sr, _br, _ba, bits = struct.unpack_from("<HHIIHH", body, 0)
            if fmt_code != 1:
                raise WavError(f"unsupported WAV format code {fmt_code}")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if sr is None or data is None:
        raise WavError("missing fmt or data chunk")
    if bits != 16 or channels != 1:
        raise WavError(f"only mono PCM16 supported (got {bits} bits, {channels} ch)")
    if len(data) % 2:
        raise WavError("odd data length")
    return np.frombuffer(data, dtype="<i2"), sr


def snr_db(reference: np.ndarray, decoded: np.ndarray) -> float:
    """Signal-to-noise ratio of decoded vs reference, both float in [-1, 1]."""
    ref = np.asarray(reference, dtype=np.float64)
    dec = np.asarray(decoded, dtype=np.float64)
    if ref.shape != dec.shape:
        return float("-inf")
    noise = ref - dec
    p_sig = float(np.sum(ref * ref))
    p_noise = float(np.sum(noise * noise))
    if p_noise == 0.0:
        return float("inf")
    if p_sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(p_sig / p_noise)
