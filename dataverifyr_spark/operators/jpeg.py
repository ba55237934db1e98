"""Baseline JPEG (ITU-T T.81 / ISO 10918-1) in pure numpy — no codec library.

Supported on decode: baseline DCT (SOF0), 8-bit, 1 component (grayscale) or
3 components (YCbCr) with 4:4:4, 4:2:2 or 4:2:0 subsampling, standard or
custom quant/Huffman tables, restart markers, byte stuffing.  The encoder
emits 4:4:4 YCbCr with the spec's Annex-K example tables (the "standard
tables" every camera ships), scaled by a quality factor — enough to
round-trip tests and to produce real files other decoders read.

All block math is numpy (the 8×8 DCT/IDCT are matrix products against an
orthonormal DCT-II basis); only the entropy (Huffman) layer walks bits in
Python, which is the honest cost of JPEG without a codec library.  For the
Spark probes this runs inside Arrow batches like every other decoder.

Spec constants (zigzag order, Annex-K quantization and Huffman tables) are
public-domain values from the standard.
"""

from __future__ import annotations

import numpy as np

from .image import ImageError

__all__ = ["decode_jpeg", "encode_jpeg"]

# ---------------------------------------------------------------------------
# spec constants
# ---------------------------------------------------------------------------

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])
_UNZIGZAG = np.argsort(_ZIGZAG)

# Annex K.1 example quantization tables (luminance, chrominance)
_QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32)
_QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32)

# Annex K.3 example Huffman tables: (bits[1..16], values)
_HT_DC_LUMA = (
    [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_DC_CHROMA = (
    [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_HT_AC_LUMA = (
    [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_HT_AC_CHROMA = (
    [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)

# orthonormal DCT-II basis: dct(B) = D @ B @ D.T, idct(C) = D.T @ C @ D
_D = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _D[_k, _n] = np.cos(np.pi * (2 * _n + 1) * _k / 16.0) * (
            np.sqrt(0.125) if _k == 0 else 0.5
        )


# ---------------------------------------------------------------------------
# Huffman code construction (T.81 C.2)
# ---------------------------------------------------------------------------


def _build_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from the BITS/HUFFVAL spec form."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[values[vi]] = (code, length)
            code += 1
            vi += 1
        code <<= 1
    return out


_LUT_CACHE: dict[bytes, tuple[list[int], list[int]]] = {}


def _build_lut(bits: list[int], values: list[int]) -> tuple[list[int], list[int]]:
    """16-bit-lookahead decode tables: peek16 -> (symbol, code length).

    Every canonical code of length L owns the 2^(16-L) table entries whose
    high L bits equal the code, so decoding a symbol is ONE list index
    instead of up to 16 bit-by-bit dict probes.  Unassigned entries keep
    length 0 = invalid code.  Plain Python lists: scalar indexing in the
    entropy loop is ~3x faster than numpy element access.  Cached by table
    content — a corpus reuses the same handful of tables (usually the
    Annex-K pair), so the 2×65536-entry fill happens once per worker, not
    once per image."""
    key = bytes(bits) + b"|" + bytes(values)
    hit = _LUT_CACHE.get(key)
    if hit is not None:
        return hit
    sym = [0] * 65536
    ln = [0] * 65536
    code = 0
    vi = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            base = code << (16 - length)
            span = 1 << (16 - length)
            sym[base : base + span] = [values[vi]] * span
            ln[base : base + span] = [length] * span
            code += 1
            vi += 1
        code <<= 1
    if len(_LUT_CACHE) < 64:  # bound worker memory under adversarial tables
        _LUT_CACHE[key] = (sym, ln)
    return sym, ln


def _entropy_segments(blob: bytes, pos: int) -> list[bytes]:
    """Split the entropy-coded stream into restart segments, pre-unstuffed
    (0xFF00 -> 0xFF via C-level bytes.replace).  Jumps between 0xFF sightings
    with bytes.find — no per-byte Python scan."""
    segs: list[bytes] = []
    n = len(blob)
    start = i = pos
    while True:
        j = blob.find(b"\xff", i)
        if j < 0 or j + 1 >= n:
            segs.append(blob[start:n].replace(b"\xff\x00", b"\xff"))
            return segs
        m = blob[j + 1]
        if m == 0x00:
            i = j + 2
            continue
        if 0xD0 <= m <= 0xD7:  # restart marker: segment boundary
            segs.append(blob[start:j].replace(b"\xff\x00", b"\xff"))
            i = start = j + 2
            continue
        segs.append(blob[start:j].replace(b"\xff\x00", b"\xff"))
        return segs


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(blob: bytes) -> np.ndarray:
    """Baseline JPEG → (h, w, 3) uint8 RGB (grayscale replicated)."""
    if blob[:2] != b"\xff\xd8":
        raise ImageError("not a JPEG (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    pos = 2
    n = len(blob)
    while pos + 4 <= n:
        if blob[pos] != 0xFF:
            raise ImageError(f"JPEG marker expected at {pos}")
        marker = blob[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        seglen = int.from_bytes(blob[pos : pos + 2], "big")
        if seglen < 2 or pos + seglen > n:
            raise ImageError("truncated JPEG segment")
        seg = blob[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if pq != 0:
                    raise ImageError("16-bit quant tables unsupported")
                if p + 64 > len(seg):
                    raise ImageError("truncated JPEG DQT segment")
                qt[tq] = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0xF
                p += 1
                if p + 16 > len(seg):
                    raise ImageError("truncated JPEG DHT segment")
                bits = [0] + list(seg[p : p + 16])
                p += 16
                nvals = sum(bits)
                if p + nvals > len(seg):
                    raise ImageError("truncated JPEG DHT values")
                vals = list(seg[p : p + nvals])
                p += nvals
                (dc_tabs if tc == 0 else ac_tabs)[th] = _build_lut(bits, vals)
        elif marker == 0xC0:  # SOF0 baseline
            if len(seg) < 6:
                raise ImageError("truncated JPEG SOF0 segment")
            prec = seg[0]
            if prec != 8:
                raise ImageError(f"only 8-bit JPEG supported, got {prec}")
            h = int.from_bytes(seg[1:3], "big")
            w = int.from_bytes(seg[3:5], "big")
            ncomp = seg[5]
            if len(seg) < 6 + 3 * ncomp:
                raise ImageError("truncated JPEG SOF0 components")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ImageError("only baseline (SOF0) JPEG supported")
        elif marker == 0xDD:  # DRI
            restart_interval = int.from_bytes(seg[0:2], "big")
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ImageError("JPEG SOS before SOF0")
            if not seg or len(seg) < 1 + 2 * seg[0]:
                raise ImageError("truncated JPEG SOS segment")
            ns = seg[0]
            scan = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan[cid] = (tabs >> 4, tabs & 0xF)
            return _decode_scan(
                blob, pos + seglen, frame, scan, qt, dc_tabs, ac_tabs, restart_interval
            )
        pos += seglen
    raise ImageError("JPEG has no scan (SOS) segment")


def _decode_scan(blob, pos, frame, scan, qt, dc_tabs, ac_tabs, restart_interval):
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    if h <= 0 or w <= 0:
        raise ImageError(f"invalid JPEG dimensions {w}x{h}")
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    ncomp = len(comps)
    nbx = [mcux * c["h"] for c in comps]
    nby = [mcuy * c["v"] for c in comps]
    # zigzag-order coefficient rows per component, filled in the entropy loop
    # and dequantized + IDCT'd in ONE batched einsum per component after it
    coefs = [np.zeros((nby[ci] * nbx[ci], 64), dtype=np.int32) for ci in range(ncomp)]
    tabs = []
    for c in comps:
        td, ta = scan.get(c["id"], (None, None))
        if td is None or dc_tabs.get(td) is None or ac_tabs.get(ta) is None or qt.get(c["tq"]) is None:
            raise ImageError("JPEG references undefined table")
        dsym, dlen = dc_tabs[td]
        asym, alen = ac_tabs[ta]
        tabs.append((dsym, dlen, asym, alen))

    segs = _entropy_segments(blob, pos)
    seg_i = 0
    pred = [0] * ncomp
    mcu_count = 0
    # bit-cursor INLINED as plain locals: local
    # integer ops beat bound-method + attribute access ~1.5x in this loop.
    # ONE refill per symbol tops the window up to >= 27 bits (16 code + 11
    # max magnitude), so code lookup AND magnitude extraction share a single
    # buffered read — the buffer holds <= 34 bits (Python int, masked).
    d = segs[0]
    dn = len(d)
    dpos = buf = bits = over = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                seg_i += 1
                if seg_i >= len(segs):
                    raise ImageError("JPEG restart segment missing")
                d = segs[seg_i]
                dn = len(d)
                dpos = buf = bits = over = 0
                pred = [0] * ncomp
            for ci, c in enumerate(comps):
                dsym, dlen, asym, alen = tabs[ci]
                cv, ch = c["v"], c["h"]
                width = nbx[ci]
                for by in range(cv):
                    for bx in range(ch):
                        row = coefs[ci][(my * cv + by) * width + (mx * ch + bx)]
                        while bits < 27:  # refill; zero-pads past stream end
                            if dpos < dn:
                                buf = ((buf << 8) | d[dpos]) & 0x3FFFFFFFF
                                dpos += 1
                            else:
                                buf = (buf << 8) & 0x3FFFFFFFF
                                over += 1
                                if over > 8:
                                    raise ImageError("JPEG entropy data exhausted")
                            bits += 8
                        v16 = (buf >> (bits - 16)) & 0xFFFF
                        ln = dlen[v16]
                        if ln == 0:
                            raise ImageError("invalid JPEG Huffman code")
                        bits -= ln
                        t = dsym[v16]
                        if t:
                            if t > 11:  # T.81 F.1.2.1.1: DC category 0..11
                                # (also: the 27-bit prefetch only guarantees
                                # 11 magnitude bits after a 16-bit code)
                                raise ImageError("invalid JPEG DC category")
                            bits -= t
                            v = (buf >> bits) & ((1 << t) - 1)
                            pred[ci] += v if v >= (1 << (t - 1)) else v - (1 << t) + 1
                        row[0] = pred[ci]
                        k = 1
                        while k < 64:
                            while bits < 27:
                                if dpos < dn:
                                    buf = ((buf << 8) | d[dpos]) & 0x3FFFFFFFF
                                    dpos += 1
                                else:
                                    buf = (buf << 8) & 0x3FFFFFFFF
                                    over += 1
                                    if over > 8:
                                        raise ImageError("JPEG entropy data exhausted")
                                bits += 8
                            v16 = (buf >> (bits - 16)) & 0xFFFF
                            ln = alen[v16]
                            if ln == 0:
                                raise ImageError("invalid JPEG Huffman code")
                            bits -= ln
                            rs = asym[v16]
                            s = rs & 0xF
                            if s == 0:
                                if rs == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += rs >> 4
                            if k > 63:
                                raise ImageError("JPEG AC run overflows block")
                            if s > 10:  # T.81 F.1.2.2.1: baseline AC category 1..10
                                raise ImageError("invalid JPEG AC category")
                            bits -= s
                            v = (buf >> bits) & ((1 << s) - 1)
                            row[k] = v if v >= (1 << (s - 1)) else v - (1 << s) + 1
                            k += 1
            mcu_count += 1

    # batched dequant + IDCT + layout per component, then upsample/crop
    full = []
    for ci, c in enumerate(comps):
        q = qt[c["tq"]]
        deq = (coefs[ci] * q[None, :])[:, _UNZIGZAG].reshape(-1, 8, 8).astype(np.float64)
        pixels = np.einsum("ij,njk,kl->nil", _D.T, deq, _D) + 128.0
        p = pixels.reshape(nby[ci], nbx[ci], 8, 8).transpose(0, 2, 1, 3).reshape(
            nby[ci] * 8, nbx[ci] * 8
        )
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    if len(full) != 3:
        raise ImageError(f"unsupported JPEG component count {len(full)}")
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (4:4:4, Annex-K tables scaled by quality)
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(quality, 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _mag(v: int) -> tuple[int, int]:
    """(category t, t-bit magnitude code) for a signed coefficient."""
    t = int(v).bit_length() if v > 0 else int(-v).bit_length()
    if v < 0:
        v = v + (1 << t) - 1
    return t, v


def _encode_block(bw: _BitWriter, block: np.ndarray, q: np.ndarray,
                  dc_codes: dict, ac_codes: dict, pred: int) -> int:
    """DCT + quantize + entropy-code one 8×8 block; returns the new DC pred."""
    coeffs = _D @ (block - 128.0) @ _D.T
    qzz = np.round(coeffs.reshape(-1)[_ZIGZAG] / q[_ZIGZAG]).astype(int)
    diff = int(qzz[0]) - pred
    t, mag = _mag(diff) if diff else (0, 0)
    code, ln = dc_codes[t]
    bw.write(code, ln)
    if t:
        bw.write(mag, t)
    run = 0
    last_nz = max(np.nonzero(qzz[1:])[0]) + 1 if np.any(qzz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(qzz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            bw.write(code, ln)
            run -= 16
        t, mag = _mag(v)
        code, ln = ac_codes[(run << 4) | t]
        bw.write(code, ln)
        bw.write(mag, t)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        bw.write(code, ln)
    return int(qzz[0])


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 image → baseline JPEG bytes (Annex-K tables scaled by quality).

    ``arr``: (h, w, 3) RGB, or (h, w) grayscale (single-component stream).
    ``subsampling``: ``"444"`` (default) or ``"420"`` (2×2-mean chroma).
    ``restart_interval``: emit DRI + RSTn markers every N MCUs (0 = none) —
    the resync points a streaming corpus uses to bound corruption blast
    radius."""
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ImageError("encode_jpeg expects (h, w, 3) RGB or (h, w) gray uint8")
    if arr.dtype != np.uint8:
        raise ImageError("encode_jpeg expects uint8")
    if subsampling not in ("444", "420"):
        raise ImageError(f"unsupported subsampling {subsampling!r}")
    h, w = arr.shape[:2]
    qly = _scaled_qt(_QT_LUMA, quality)
    qlc = _scaled_qt(_QT_CHROMA, quality)
    dc = [_build_codes(*_HT_DC_LUMA), _build_codes(*_HT_DC_CHROMA)]
    ac = [_build_codes(*_HT_AC_LUMA), _build_codes(*_HT_AC_CHROMA)]

    if gray:
        y = arr.astype(np.float64)
        cb = cr = None
    else:
        x = arr.astype(np.float64)
        r, g, b = x[..., 0], x[..., 1], x[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0

    mcu = 16 if (subsampling == "420" and not gray) else 8
    ph, pw = -(-h // mcu) * mcu, -(-w // mcu) * mcu

    def pad(p, tile):
        hh, ww = -(-h // tile) * tile, -(-w // tile) * tile
        return np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])), mode="edge")

    bw = _BitWriter()

    rst = {"mcu": 0, "n": 0}

    def mcu_boundary(preds):
        """Call BEFORE each MCU: emit RST and reset DC preds on interval."""
        if restart_interval and rst["mcu"] and rst["mcu"] % restart_interval == 0:
            bw.flush()
            bw.out.append(0xFF)
            bw.out.append(0xD0 + (rst["n"] % 8))
            rst["n"] += 1
            for i in range(len(preds)):
                preds[i] = 0
        rst["mcu"] += 1

    if gray:
        yp = pad(y, 8)
        preds = [0]
        for by in range(yp.shape[0] // 8):
            for bx in range(yp.shape[1] // 8):
                mcu_boundary(preds)
                preds[0] = _encode_block(
                    bw, yp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], qly, dc[0], ac[0], preds[0]
                )
        comps_sof = bytes([1, 1, 0x11, 0])
        comps_sos = bytes([1, 1, 0x00])
    elif subsampling == "444":
        planes = [pad(y, 8), pad(cb, 8), pad(cr, 8)]
        preds = [0, 0, 0]
        for by in range(planes[0].shape[0] // 8):
            for bx in range(planes[0].shape[1] // 8):
                mcu_boundary(preds)
                for ci in range(3):
                    tab = 0 if ci == 0 else 1
                    preds[ci] = _encode_block(
                        bw,
                        planes[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8],
                        qly if ci == 0 else qlc,
                        dc[tab], ac[tab], preds[ci],
                    )
        comps_sof = bytes([3, 1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1])
        comps_sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11])
    else:  # 420
        yp = pad(y, 16)
        # 2x2-mean chroma downsample, then pad to the chroma MCU grid (8)
        def down(p):
            p = pad(p, 2)
            return (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]) / 4.0
        cbp, crp = pad(down(cb), 8), pad(down(cr), 8)
        preds = [0, 0, 0]
        for my in range(yp.shape[0] // 16):
            for mx in range(yp.shape[1] // 16):
                mcu_boundary(preds)
                for by in range(2):
                    for bx in range(2):
                        y0, x0 = my * 16 + by * 8, mx * 16 + bx * 8
                        preds[0] = _encode_block(
                            bw, yp[y0 : y0 + 8, x0 : x0 + 8], qly, dc[0], ac[0], preds[0]
                        )
                for ci, cp in ((1, cbp), (2, crp)):
                    y0, x0 = my * 8, mx * 8
                    preds[ci] = _encode_block(
                        bw, cp[y0 : y0 + 8, x0 : x0 + 8], qlc, dc[1], ac[1], preds[ci]
                    )
        comps_sof = bytes([3, 1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1])
        comps_sos = bytes([3, 1, 0x00, 2, 0x11, 3, 0x11])
    bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(int(v) for v in q[_ZIGZAG]))

    def dht(tc: int, th: int, table: tuple) -> bytes:
        bits, vals = table
        return seg(0xC4, bytes([(tc << 4) | th]) + bytes(bits[1:]) + bytes(vals))

    dri = seg(0xDD, restart_interval.to_bytes(2, "big")) if restart_interval else b""
    sof = seg(0xC0, bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + comps_sof)
    sos = seg(0xDA, comps_sos + bytes([0, 63, 0]))
    tables = dqt(0, qly) + dht(0, 0, _HT_DC_LUMA) + dht(1, 0, _HT_AC_LUMA)
    if not gray:
        tables += dqt(1, qlc) + dht(0, 1, _HT_DC_CHROMA) + dht(1, 1, _HT_AC_CHROMA)
    return b"\xff\xd8" + tables + dri + sof + sos + bytes(bw.out) + b"\xff\xd9"
