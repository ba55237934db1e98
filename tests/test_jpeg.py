"""Baseline JPEG codec (operators/jpeg.py): pure numpy DCT + Python Huffman.
Round-trips across subsampling modes, grayscale, restart markers; malformed
streams rejected with ImageError; integrates with decode_image / image_probe.
"""

import numpy as np
import pytest

from dataverifyr_spark.operators.image import ImageError, decode_image
from dataverifyr_spark.operators.jpeg import decode_jpeg, encode_jpeg


def _psnr(a, b):
    e = (a.astype(float) - b.astype(float)) ** 2
    return 10 * np.log10(255**2 / (e.mean() + 1e-9))


def _smooth(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack([x * 4 % 256, y * 5 % 256, (x + y) * 2 % 256], axis=2).astype(np.uint8)


class TestRoundTrip:
    @pytest.mark.parametrize("mode", ["444", "420"])
    @pytest.mark.parametrize("ri", [0, 3])
    def test_color_modes_and_restarts(self, mode, ri):
        img = _smooth(40, 56)
        out = decode_jpeg(encode_jpeg(img, quality=92, subsampling=mode, restart_interval=ri))
        assert out.shape == img.shape
        assert _psnr(out, img) > 34, (mode, ri)

    def test_grayscale_single_component(self):
        y, x = np.mgrid[0:24, 0:40]
        g = (x * 3 + y * 2).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(g, quality=92))
        assert out.shape == (24, 40, 3)
        assert np.array_equal(out[..., 0], out[..., 1])
        assert _psnr(out[..., 0], g) > 40

    def test_non_multiple_of_8_dims(self):
        img = _smooth(19, 27)
        for mode in ("444", "420"):
            out = decode_jpeg(encode_jpeg(img, quality=90, subsampling=mode))
            assert out.shape == img.shape, mode

    def test_flat_image_near_lossless(self):
        flat = np.full((16, 16, 3), 120, dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(flat, quality=90))
        assert int(np.abs(out.astype(int) - 120).max()) <= 1

    def test_quality_monotone(self):
        img = _smooth(32, 32)
        p50 = _psnr(decode_jpeg(encode_jpeg(img, quality=50)), img)
        p95 = _psnr(decode_jpeg(encode_jpeg(img, quality=95)), img)
        assert p95 > p50
        assert len(encode_jpeg(img, quality=95)) > len(encode_jpeg(img, quality=50))


class TestMalformed:
    def test_not_a_jpeg(self):
        with pytest.raises(ImageError, match="SOI"):
            decode_jpeg(b"\x00\x01\x02\x03")

    def test_jpeg_magic_on_garbage(self):
        # the images_table CODEC_EVERY fixture shape: JPEG magic over PPM bytes
        with pytest.raises(ImageError):
            decode_jpeg(b"\xff\xd8\xff\xe0" + b"P6\n16 8\n255\n" + b"\x55" * 64)

    def test_truncated_entropy_data(self):
        blob = encode_jpeg(_smooth(16, 16), quality=90)
        with pytest.raises(ImageError):
            decode_jpeg(blob[: len(blob) // 2])

    def test_progressive_rejected(self):
        blob = bytearray(encode_jpeg(_smooth(16, 16)))
        i = bytes(blob).find(b"\xff\xc0")
        blob[i + 1] = 0xC2  # SOF2 progressive
        with pytest.raises(ImageError, match="baseline"):
            decode_jpeg(bytes(blob))

    def test_missing_scan(self):
        blob = encode_jpeg(_smooth(16, 16))
        i = blob.find(b"\xff\xda")
        with pytest.raises(ImageError, match="scan|exhaust|marker"):
            decode_jpeg(blob[:i] + b"\xff\xd9")

    @staticmethod
    def _patch_dht_symbols(blob: bytes, table_class: int, new_sym: int) -> bytes:
        """Rewrite every symbol byte of DHT tables of the given class
        (0=DC, 1=AC) to new_sym — adversarial custom-Huffman-table stream."""
        b = bytearray(blob)
        i = 0
        while True:
            i = blob.find(b"\xff\xc4", i)
            if i < 0:
                return bytes(b)
            seg_len = (blob[i + 2] << 8) | blob[i + 3]
            p, end = i + 4, i + 2 + seg_len
            while p < end:
                tc = blob[p] >> 4
                counts = blob[p + 1 : p + 17]
                nsym = sum(counts)
                if tc == table_class:
                    for q in range(p + 17, p + 17 + nsym):
                        b[q] = new_sym
                p += 17 + nsym
            i = end

    def test_dc_category_over_15_is_image_error(self):
        """ADVICE r3: category symbols >15 must raise ImageError, not
        overflow int32 with a raw OverflowError."""
        blob = self._patch_dht_symbols(encode_jpeg(_smooth(16, 16)), 0, 31)
        with pytest.raises(ImageError, match="DC category|Huffman"):
            decode_jpeg(blob)

    @pytest.mark.parametrize("sym", [12, 13, 15])
    def test_dc_category_12_to_15_is_image_error(self, sym):
        """r4 self-review: spec bound is 11 — symbols 12..15 must raise
        ImageError too, not underflow the 27-bit prefetch window into a raw
        ValueError('negative shift count')."""
        blob = self._patch_dht_symbols(encode_jpeg(_smooth(16, 16)), 0, sym)
        with pytest.raises(ImageError, match="DC category|Huffman"):
            decode_jpeg(blob)

    def test_ac_category_over_10_is_image_error(self):
        blob = self._patch_dht_symbols(encode_jpeg(_smooth(16, 16)), 1, 0x0F)
        with pytest.raises(ImageError, match="AC category|Huffman"):
            decode_jpeg(blob)


class TestIntegration:
    def test_decode_image_dispatch(self):
        img = _smooth(16, 24)
        out = decode_image(encode_jpeg(img, quality=95))
        assert out.shape == img.shape and _psnr(out, img) > 34

    def test_image_probe_decodes_jpeg(self, spark):
        from dataverifyr_spark.operators.image import image_probe

        img = _smooth(16, 24)
        df = spark.createDataFrame(
            [
                ("jpg444", bytearray(encode_jpeg(img, quality=95))),
                ("jpg420", bytearray(encode_jpeg(img, quality=95, subsampling="420"))),
                ("jpggarbage", bytearray(b"\xff\xd8\xff\xe0nonsense")),
            ],
            "media_id string, bytes binary",
        )
        got = {r["media_id"]: r for r in image_probe(df).collect()}
        for k in ("jpg444", "jpg420"):
            assert got[k]["img_valid"] is True, k
            assert (got[k]["img_width"], got[k]["img_height"]) == (24, 16)
            assert abs(got[k]["img_brightness"] - img.astype(float).mean()) < 3.0
        assert got["jpggarbage"]["img_valid"] is False

    def test_fixture_codec_rows_still_fail(self, spark):
        """images_table's CODEC_EVERY rows are JPEG magic over PPM bytes — a
        corrupt stream the real decoder must still REJECT, keeping the
        image_validate gate cadence intact."""
        from dataverifyr_spark.operators.image import _make_image_row, decode_image

        _, blob = _make_image_row(17)  # 17 % CODEC_EVERY == 0
        with pytest.raises(ImageError):
            decode_image(bytes(blob))


class TestFuzzNeverExceptions:
    def test_byte_flip_fuzz_through_probe(self, spark):
        """Deterministic byte-flip fuzz over all four container formats: the
        probe must yield a row for EVERY input (valid or invalid), never a
        task failure — the never-exceptions contract under real corruption."""
        from dataverifyr_spark.operators.image import (
            _make_mixed_image_row,
            image_probe,
        )

        rng = np.random.RandomState(7)
        rows = []
        for i in range(80):
            mid, fmt, blob = _make_mixed_image_row(i)
            b = bytearray(blob)
            if i % 2 and len(b) > 4:  # flip 3 random bytes in half the rows
                for _ in range(3):
                    b[rng.randint(0, len(b))] ^= 0xFF
            rows.append((f"{fmt}-{i}", b))
        df = spark.createDataFrame(rows, "media_id string, bytes binary")
        got = image_probe(df).collect()
        assert len(got) == 80  # one row per input, no dead tasks
        assert any(r["img_valid"] for r in got)
        assert any(not r["img_valid"] for r in got)
        for r in got:
            if not r["img_valid"]:
                assert r["img_error"], r["media_id"]
