"""Minimal RIFF/WAVE codec family in pure numpy (all formats public:
RIFF chunks + fmt block per Microsoft WAVEFORMAT; sample codings per their
published specs — linear PCM 8/16-bit, IEEE float32 [WAVE_FORMAT_IEEE_FLOAT,
code 3], and ITU-T G.711 A-law/μ-law companding [codes 6/7]).

No external audio library — container decode is ~40 lines, PCM payload is a
straight ``np.frombuffer``, and G.711 decode is a 256-entry lookup table
built from the ITU segment/mantissa formulas (anchors match the canonical
public tables: μ-law 0x00→-32124, 0xFF→0; A-law 0x55→-8, 0xD5→+8).  The
G.711 encoders quantize to the nearest decode level via ``searchsorted`` —
level-exact with any standards-compliant decoder.  FLAC/OPUS etc. would
require codecs not present in this environment; they are stubbed at the
rules layer with the same signature so the Spark plumbing stays identical.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_wav_pcm16",
    "encode_wav",
    "decode_wav",
    "decode_wav_info",
    "snr_db",
    "WavError",
    "WAV_CODECS",
]


def _ulaw_decode_table() -> np.ndarray:
    """ITU-T G.711 μ-law byte → linear int16 (segment/mantissa expansion)."""
    u = np.arange(256, dtype=np.int32) ^ 0xFF  # transmitted bytes are complemented
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    mag = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -mag, mag).astype(np.int16)


def _alaw_decode_table() -> np.ndarray:
    """ITU-T G.711 A-law byte → linear int16 (even bits inverted per spec)."""
    a = np.arange(256, dtype=np.int32) ^ 0x55
    sign = (a & 0x80) != 0
    seg = (a & 0x70) >> 4
    t = (a & 0x0F) << 4
    mag = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where(sign, mag, -mag).astype(np.int16)


_ULAW_DEC = _ulaw_decode_table()
_ALAW_DEC = _alaw_decode_table()


def _nearest_level_encoder(table: np.ndarray):
    """Encoder for a 256-level companding table: int16 → byte of the nearest
    decode level (ties and duplicate levels resolve to one deterministic
    byte).  Vectorized: one searchsorted over the 255 midpoints per batch."""
    order = np.argsort(table.astype(np.int32), kind="stable")
    vals = table.astype(np.int32)[order]
    keep = np.ones(len(vals), dtype=bool)
    keep[1:] = vals[1:] != vals[:-1]
    vals, codes = vals[keep], order[keep].astype(np.uint8)
    mids = (vals[:-1] + vals[1:]) / 2.0

    def enc(x: np.ndarray) -> np.ndarray:
        return codes[np.searchsorted(mids, x.astype(np.int32), side="left")]

    return enc


_ULAW_ENC = _nearest_level_encoder(_ULAW_DEC)
_ALAW_ENC = _nearest_level_encoder(_ALAW_DEC)

# codec name -> (WAVE fmt code, bits per sample)
WAV_CODECS = {
    "pcm_s16le": (1, 16),
    "pcm_u8": (1, 8),
    "pcm_f32le": (3, 32),
    "alaw": (6, 8),
    "ulaw": (7, 8),
}


class WavError(ValueError):
    pass


def encode_wav_pcm16(pcm: np.ndarray, sr_hz: int) -> bytes:
    """float PCM in [-1, 1] (or int16) → mono PCM16 WAV bytes."""
    return encode_wav(pcm, sr_hz, codec="pcm_s16le")


def encode_wav(pcm: np.ndarray, sr_hz: int, codec: str = "pcm_s16le") -> bytes:
    """float PCM in [-1, 1] (or int16) → mono WAV bytes in any supported
    codec (``WAV_CODECS``: pcm_s16le, pcm_u8, pcm_f32le, alaw, ulaw)."""
    if codec not in WAV_CODECS:
        raise WavError(f"unsupported codec {codec!r} (know {sorted(WAV_CODECS)})")
    fmt_code, bits = WAV_CODECS[codec]
    if pcm.dtype != np.int16:
        samples = np.clip(np.asarray(pcm, dtype=np.float64), -1.0, 1.0)
        ints = np.round(samples * 32767.0).astype("<i2")
    else:
        ints = pcm.astype("<i2")
    if codec == "pcm_s16le":
        data = ints.tobytes()
    elif codec == "pcm_u8":
        # rounded 8-bit truncation of the 16-bit sample, unsigned midpoint 128
        u8 = np.clip((ints.astype(np.int32) + 128) >> 8, -128, 127) + 128
        data = u8.astype(np.uint8).tobytes()
    elif codec == "pcm_f32le":
        data = (ints.astype(np.float64) / 32767.0).astype("<f4").tobytes()
    elif codec == "alaw":
        data = _ALAW_ENC(ints).tobytes()
    else:  # ulaw
        data = _ULAW_ENC(ints).tobytes()
    block_align = bits // 8  # mono
    byte_rate = sr_hz * block_align
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack(
        "<IHHIIHH", 16, fmt_code, 1, sr_hz, byte_rate, block_align, bits
    )
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → (int16 sample array, sample rate).  Raises WavError on any
    malformed container."""
    samples, sr, _codec = decode_wav_info(blob)
    return samples, sr


def decode_wav_info(blob: bytes) -> tuple[np.ndarray, int, str]:
    """WAV bytes → (int16 sample array, sample rate, codec name).  All
    supported codecs decode to linear int16 (G.711 via the ITU expansion
    tables, float32 by rounding to 16-bit) so every downstream consumer —
    SNR, RMS, spectral, segments — is codec-agnostic.  Raises WavError on
    any malformed container."""
    if blob is None or len(blob) < 44 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        raise WavError("not a RIFF/WAVE container")
    pos = 12
    sr = None
    fmt_code = None
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
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if sr is None or data is None:
        raise WavError("missing fmt or data chunk")
    if channels != 1:
        raise WavError(f"only mono supported (got {channels} ch)")
    codec = next(
        (name for name, fb in WAV_CODECS.items() if fb == (fmt_code, bits)), None
    )
    if codec is None:
        raise WavError(f"unsupported WAV format code {fmt_code} at {bits} bits")
    if codec == "pcm_s16le":
        if len(data) % 2:
            raise WavError("odd data length")
        return np.frombuffer(data, dtype="<i2"), sr, codec
    if codec == "pcm_u8":
        u8 = np.frombuffer(data, dtype=np.uint8).astype(np.int32)
        return ((u8 - 128) << 8).astype(np.int16), sr, codec
    if codec == "pcm_f32le":
        if len(data) % 4:
            raise WavError("float32 data length not a multiple of 4")
        f = np.frombuffer(data, dtype="<f4").astype(np.float64)
        return np.round(np.clip(f, -1.0, 1.0) * 32767.0).astype(np.int16), sr, codec
    table = _ALAW_DEC if codec == "alaw" else _ULAW_DEC
    return table[np.frombuffer(data, dtype=np.uint8)], sr, codec


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
