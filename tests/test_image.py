"""Real image/video decoding (operators/image.py): PPM, BMP, Y4M — pure
numpy, pinned bytes, and the Spark probe through real check_data rules."""

import numpy as np
import pytest

from dataverifyr_spark.operators.image import (
    ImageError,
    decode_bmp,
    decode_image,
    decode_ppm,
    encode_ppm,
    encode_y4m,
    image_probe,
    resize_nearest,
    y4m_info,
    y4m_sample_frames,
)


def _checker(h, w):
    y, x = np.mgrid[0:h, 0:w]
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[..., 0] = ((x + y) % 2) * 255
    img[..., 1] = (x * 7) % 256
    img[..., 2] = (y * 13) % 256
    return img


class TestPPM:
    def test_round_trip(self):
        img = _checker(5, 7)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)

    def test_header_bytes_pinned(self):
        assert encode_ppm(np.zeros((2, 3, 3), dtype=np.uint8))[:11] == b"P6\n3 2\n255\n"

    def test_comment_in_header(self):
        img = _checker(2, 2)
        blob = b"P6\n# made by hand\n2 2\n255\n" + img.tobytes()
        assert np.array_equal(decode_ppm(blob), img)

    def test_truncated_rejected(self):
        with pytest.raises(ImageError, match="truncated"):
            decode_ppm(encode_ppm(_checker(4, 4))[:-5])


class TestBMP:
    @staticmethod
    def _encode_bmp(img: np.ndarray) -> bytes:
        # minimal 24bpp BI_RGB writer (bottom-up, padded rows) — test-local
        h, w = img.shape[:2]
        stride = (w * 3 + 3) & ~3
        rows = np.zeros((h, stride), dtype=np.uint8)
        rows[:, : w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)  # flip + RGB→BGR
        data = rows.tobytes()
        header = (
            b"BM"
            + (54 + len(data)).to_bytes(4, "little")
            + b"\x00\x00\x00\x00"
            + (54).to_bytes(4, "little")
            + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + h.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little")
            + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little")
            + len(data).to_bytes(4, "little")
            + b"\x00" * 16
        )
        return header + data

    def test_round_trip_with_padding(self):
        img = _checker(3, 3)  # stride 12 → 3 pad bytes per row
        assert np.array_equal(decode_bmp(self._encode_bmp(img)), img)

    def test_unsupported_bpp_rejected(self):
        blob = bytearray(self._encode_bmp(_checker(2, 2)))
        blob[28] = 8  # 8bpp
        with pytest.raises(ImageError, match="24bpp"):
            decode_bmp(bytes(blob))

    def test_magic_dispatch(self):
        img = _checker(2, 4)
        assert np.array_equal(decode_image(self._encode_bmp(img)), img)
        assert np.array_equal(decode_image(encode_ppm(img)), img)
        # PNG and JPEG decode natively now; garbage under their magic → ImageError
        with pytest.raises(ImageError):
            decode_image(b"\xff\xd8\xff\xe0JPEGJPEG")
        with pytest.raises(ImageError):
            decode_image(b"\x89PNG\r\n\x1a\nxxxx")
        with pytest.raises(ImageError, match="codec"):
            decode_image(b"GIF87a trailer")  # genuinely unsupported container


class TestResize:
    def test_downscale_exact_factor(self):
        img = _checker(8, 8)
        out = resize_nearest(img, 4, 4)
        assert out.shape == (4, 4, 3)
        assert np.array_equal(out, img[::2, ::2])

    def test_upscale(self):
        img = _checker(2, 2)
        out = resize_nearest(img, 4, 4)
        assert out.shape == (4, 4, 3)
        assert np.array_equal(out[0, 0], img[0, 0]) and np.array_equal(out[3, 3], img[1, 1])


class TestY4M:
    def test_info_and_sampling(self):
        frames = np.stack([np.full((4, 6), i * 10, dtype=np.uint8) for i in range(10)])
        blob = encode_y4m(frames, w=6, h=4)
        assert y4m_info(blob) == (6, 4, 10, 4 * 6 + 2 * 2 * 3)
        sampled = y4m_sample_frames(blob, every_n=3)
        assert sampled.shape == (4, 4, 6)
        assert [int(f[0, 0]) for f in sampled] == [0, 30, 60, 90]

    def test_max_frames_cap(self):
        frames = np.zeros((6, 2, 2), dtype=np.uint8)
        blob = encode_y4m(frames, w=2, h=2)
        assert y4m_sample_frames(blob, every_n=1, max_frames=2).shape[0] == 2

    def test_bad_stream_rejected(self):
        with pytest.raises(ImageError, match="YUV4MPEG2"):
            y4m_info(b"RIFF....")


class TestImageProbe:
    def test_probe_and_rules(self, spark):
        import dataverifyr_spark as dv

        good = _checker(10, 20)
        rows = [
            ("img-0", bytearray(encode_ppm(good))),
            ("img-1", bytearray(TestBMP._encode_bmp(good))),
            ("img-2", bytearray(b"\xff\xd8\xffJPEGJPEG")),  # codec-needing
            ("img-3", bytearray(b"garbage")),
        ]
        df = spark.createDataFrame(rows, "media_id string, bytes binary")
        probe = image_probe(df)
        got = {r["media_id"]: r for r in probe.collect()}
        assert got["img-0"]["img_valid"] and got["img-1"]["img_valid"]
        assert (got["img-0"]["img_width"], got["img-0"]["img_height"]) == (20, 10)
        # PPM and BMP of the SAME pixels must produce identical features
        for k in ("img_mean_r", "img_mean_g", "img_mean_b", "img_brightness", "img_contrast"):
            assert got["img-0"][k] == got["img-1"][k], k
        assert not got["img-2"]["img_valid"] and got["img-2"]["img_error"]
        assert not got["img-3"]["img_valid"]

        # the probe columns flow through the ordinary fused rule machinery
        res = dv.check_data(
            probe,
            dv.ruleset(
                dv.rule("img_valid", name="decodes"),
                dv.rule("img_width >= 16 & img_height >= 8", name="min_dims", allow_na=True),
                dv.rule("img_brightness > 1", name="not_black", allow_na=True),
            ),
        ).collect()
        by = {r["name"]: (r["pass"], r["fail"]) for r in res}
        assert by["decodes"] == (2, 2)
        assert by["min_dims"] == (4, 0)  # NULL dims rescued by allow_na
        assert by["not_black"] == (4, 0)


class TestRegisterDecoder:
    """The production codec swap point: an override installed for one format
    must take the dispatch for that format only, normalize to 3-channel, and
    be removable (None restores the built-in)."""

    def test_override_dispatch_and_restore(self):
        from dataverifyr_spark.operators.image import encode_ppm, register_decoder

        img = _checker(4, 6)
        blob = encode_ppm(img)
        calls = []

        def fake(b):
            calls.append(len(b))
            return np.full((2, 3), 7, dtype=np.uint8)  # gray — must replicate

        register_decoder("ppm", fake)
        try:
            out = decode_image(blob)
            assert calls == [len(blob)]
            assert out.shape == (2, 3, 3) and (out == 7).all()
            # other formats untouched by a ppm override
            from dataverifyr_spark.operators.image import encode_png

            assert decode_image(encode_png(img)).shape == img.shape
        finally:
            register_decoder("ppm", None)
        assert np.array_equal(decode_image(blob), img)
        assert not calls[1:]

    def test_unknown_format_rejected(self):
        from dataverifyr_spark.operators.image import register_decoder

        with pytest.raises(ValueError, match="unknown image format"):
            register_decoder("webp", lambda b: None)

    def test_override_two_channel_la_normalized(self):
        """r4 self-review: a PIL-style 'LA' (luma+alpha) override result must
        normalize to (h, w, 3) — alpha dropped, luma replicated — not leak a
        2-channel array through decode_image's RGB contract."""
        from dataverifyr_spark.operators.image import encode_ppm, register_decoder

        blob = encode_ppm(_checker(2, 2))
        la = np.dstack([np.full((2, 3), 9, np.uint8), np.full((2, 3), 255, np.uint8)])
        register_decoder("ppm", lambda b: la)
        try:
            out = decode_image(blob)
        finally:
            register_decoder("ppm", None)
        assert out.shape == (2, 3, 3) and (out == 9).all()


class TestMalformedContainers:
    """Malformed headers must raise ImageError (never ValueError or a numpy
    reshape crash), and the Spark probe must turn ANY decoder exception into
    an (img_valid=false, img_error=...) row — the 'never exceptions'
    contract."""

    def test_ppm_non_numeric_header_field(self):
        with pytest.raises(ImageError, match="non-numeric"):
            decode_ppm(b"P6\nabc 10\n255\n" + b"\x00" * 300)

    def test_ppm_zero_dims(self):
        with pytest.raises(ImageError, match="dimensions"):
            decode_ppm(b"P6\n0 10\n255\n")

    def test_bmp_zero_width(self):
        blob = bytearray(TestBMP._encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8)))
        blob[18:22] = (0).to_bytes(4, "little", signed=True)  # width = 0
        with pytest.raises(ImageError, match="dimensions"):
            decode_bmp(bytes(blob))

    def test_y4m_non_numeric_dims(self):
        from dataverifyr_spark.operators.image import y4m_info

        with pytest.raises(ImageError, match="non-numeric"):
            y4m_info(b"YUV4MPEG2 Wxx H4 F25:1 C420\nFRAME\n")

    def test_probe_survives_garbage_blobs(self, spark):
        """One garbage blob must not kill the task: every malformed container
        becomes an invalid ROW with the message recorded."""
        from dataverifyr_spark.operators.image import image_probe

        rows = [
            ("ok", bytearray(encode_ppm(np.full((3, 4, 3), 9, dtype=np.uint8)))),
            ("nonnum", bytearray(b"P6\n# c\nzz 4\n255\n" + b"\x01" * 64)),
            ("negdim", bytearray(b"P6\n4 -2\n255\n" + b"\x01" * 64)),
            ("junk", bytearray(b"\x00\x01\x02\x03garbage")),
            ("empty", bytearray(b"")),
            ("null", None),
        ]
        df = spark.createDataFrame(rows, "media_id string, bytes binary")
        got = {r["media_id"]: r for r in image_probe(df).collect()}
        assert got["ok"]["img_valid"] is True
        for mid in ("nonnum", "negdim", "junk", "empty", "null"):
            assert got[mid]["img_valid"] is False, mid
            assert got[mid]["img_error"], mid


class TestVideoProbe:
    def test_fixture_cadence_through_rules(self, spark):
        """videos_table + video_probe + fused rules must reproduce the
        injection cadence exactly (the same contract the video_validate gate
        certifies against DuckDB)."""
        import dataverifyr_spark as dv
        from dataverifyr_spark.operators.image import (
            VID_CORRUPT_EVERY,
            VID_DARK_EVERY,
            VID_SHORT_EVERY,
            video_probe,
            videos_table,
        )

        n = 200
        vids = videos_table(spark, n)
        rules = dv.ruleset(
            dv.rule("vid_valid", name="decodes"),
            dv.rule("vid_n_frames >= 5", name="enough_frames", allow_na=True),
            dv.rule("vid_mean_luma > 1", name="not_black", allow_na=True),
        )
        by = {r["name"]: r for r in dv.check_data(video_probe(vids), rules).collect()}
        corrupt = {i for i in range(1, n) if i % VID_CORRUPT_EVERY == 0}
        short = {i for i in range(1, n) if i % VID_SHORT_EVERY == 0}
        dark = {i for i in range(1, n) if i % VID_DARK_EVERY == 0}
        assert by["decodes"]["fail"] == len(corrupt)
        assert by["enough_frames"]["fail"] == len(short - corrupt)
        assert by["not_black"]["fail"] == len(dark - corrupt)
        assert all(by[k]["error"] == "" for k in by)

    def test_probe_counts_frames_without_reading_them(self, spark):
        """vid_n_frames is header arithmetic; sampled luma uses every_n=2."""
        from dataverifyr_spark.operators.image import video_probe, videos_table

        rows = {r["media_id"]: r for r in video_probe(videos_table(spark, 30)).collect()}
        assert rows["vid-00000001"]["vid_n_frames"] == 6  # 5 + 1%4
        assert rows["vid-00000001"]["vid_valid"] is True
        assert rows["vid-00000013"]["vid_valid"] is False
        assert rows["vid-00000013"]["vid_error"]


class TestPNG:
    """Real PNG decode (stdlib zlib + numpy unfiltering) — no codec library.
    Spec: RFC 2083; every filter type exercised both directions."""

    def test_round_trip_filter0(self):
        from dataverifyr_spark.operators.image import decode_png, encode_png

        img = _checker(5, 7)
        assert np.array_equal(decode_png(encode_png(img)), img)

    @pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
    def test_every_filter_round_trips(self, ftype):
        from dataverifyr_spark.operators.image import decode_png, encode_png

        rng = np.random.RandomState(ftype + 1)
        img = rng.randint(0, 256, size=(9, 6, 3), dtype=np.uint8)
        blob = encode_png(img, filter_type=ftype)
        assert np.array_equal(decode_png(blob), img), f"filter {ftype}"

    def test_paeth_spec_vector(self):
        """Hand-checked Paeth recon: raw=5, left=10, up=20, upleft=12 →
        p=18, pa=8, pb=2, pc=6 → predictor=up(20) → recon=25."""
        from dataverifyr_spark.operators.image import _unfilter_row

        prev = np.array([12, 12, 12, 20, 20, 20], dtype=np.uint8)
        raw = np.array([10, 10, 10, 5, 5, 5], dtype=np.uint8)
        # first pixel: a=0,c=0 → p=b=12, pa=12,pb=0 → pred=up=12 → 22
        rec = _unfilter_row(4, raw, prev, 3)
        assert list(rec[:3]) == [22, 22, 22]
        # second pixel: a=22, b=20, c=12 → p=30, pa=8, pb=10, pc=18 → pred=a → 27
        assert list(rec[3:]) == [27, 27, 27]

    def test_gray_and_rgba_normalize_in_decode_image(self):
        import zlib

        from dataverifyr_spark.operators.image import _PNG_SIG, decode_image

        def chunk(typ, data):
            return len(data).to_bytes(4, "big") + typ + data + zlib.crc32(typ + data).to_bytes(4, "big")

        # 2x2 grayscale (color type 0)
        gray = np.array([[1, 2], [3, 4]], dtype=np.uint8)
        raw = b"".join(b"\x00" + r.tobytes() for r in gray)
        ihdr = (2).to_bytes(4, "big") + (2).to_bytes(4, "big") + bytes([8, 0, 0, 0, 0])
        blob = _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        out = decode_image(blob)
        assert out.shape == (2, 2, 3) and np.array_equal(out[..., 0], gray)
        assert np.array_equal(out[..., 0], out[..., 2])

        # 1x2 RGBA (color type 6): alpha dropped
        rgba = np.array([[[9, 8, 7, 255], [1, 2, 3, 0]]], dtype=np.uint8)
        raw = b"\x00" + rgba.tobytes()
        ihdr = (2).to_bytes(4, "big") + (1).to_bytes(4, "big") + bytes([8, 6, 0, 0, 0])
        blob = _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
        out = decode_image(blob)
        assert out.shape == (1, 2, 3)
        assert list(out[0, 0]) == [9, 8, 7] and list(out[0, 1]) == [1, 2, 3]

    def test_malformed_png_rejected(self):
        from dataverifyr_spark.operators.image import decode_png, encode_png

        img = _checker(4, 4)
        blob = encode_png(img)
        with pytest.raises(ImageError, match="zlib|truncated|IEND|IDAT"):
            decode_png(blob[:40])  # cut inside IDAT
        with pytest.raises(ImageError, match="not a PNG"):
            decode_png(b"\x89PNX" + blob[4:])
        corrupted = bytearray(blob)
        corrupted[40] ^= 0xFF  # flip a byte inside the zlib stream
        with pytest.raises(ImageError):
            decode_png(bytes(corrupted))
        with pytest.raises(ImageError, match="interlace|method"):
            # set interlace=1 in IHDR (byte 8+8+4+12 = offset of IHDR data +12)
            bad = bytearray(blob)
            bad[8 + 8 + 12] = 1
            decode_png(bytes(bad))

    def test_png_flows_through_image_probe(self, spark):
        from dataverifyr_spark.operators.image import encode_png, image_probe

        img = _checker(6, 10)
        df = spark.createDataFrame(
            [("p", bytearray(encode_png(img, filter_type=4)))], "media_id string, bytes binary"
        )
        row = image_probe(df).collect()[0]
        assert row["img_valid"] is True
        assert (row["img_width"], row["img_height"]) == (10, 6)
        assert row["img_brightness"] == pytest.approx(float(img.astype(np.float64).mean()))


class TestByteFlipFuzz:
    """Systematic corruption sweep (mirrors test_h264's): every still decoder
    must either decode the mutated blob or raise ImageError — never a raw
    zlib.error / struct.error / IndexError — so image_probe's error-row
    contract holds for arbitrary corruption."""

    @pytest.mark.parametrize("fmt", ["ppm", "bmp", "png", "jpeg"])
    def test_single_byte_flips(self, fmt):
        from dataverifyr_spark.operators.image import _encode_bmp24, encode_png, encode_ppm
        from dataverifyr_spark.operators.jpeg import encode_jpeg

        img = _checker(8, 12)
        blob = {
            "ppm": encode_ppm,
            "bmp": _encode_bmp24,
            "png": encode_png,
            "jpeg": lambda a: encode_jpeg(a, quality=90),
        }[fmt](img)
        step = max(1, len(blob) // 120)  # ~120 mutation points per format
        for i in range(0, len(blob), step):
            mutated = blob[:i] + bytes([blob[i] ^ 0xFF]) + blob[i + 1 :]
            try:
                decode_image(mutated)
            except ImageError:
                pass  # the contract
            # any other exception type propagates and fails the test

    def test_wav_byte_flips(self):
        import numpy as np

        from dataverifyr_spark.audio.wav import WavError, decode_wav, encode_wav_pcm16

        blob = encode_wav_pcm16(np.linspace(-0.5, 0.5, 400), 8000)
        for i in range(0, len(blob), 7):
            mutated = blob[:i] + bytes([blob[i] ^ 0xFF]) + blob[i + 1 :]
            try:
                decode_wav(mutated)
            except WavError:
                pass

    def test_truncations(self):
        from dataverifyr_spark.operators.image import encode_png
        from dataverifyr_spark.operators.jpeg import encode_jpeg

        img = _checker(8, 12)
        for blob in (encode_png(img), encode_jpeg(img, quality=90)):
            for cut in range(0, len(blob), 11):
                try:
                    decode_image(blob[:cut])
                except ImageError:
                    pass


class TestMjpeg:
    """operators/mjpeg.py — real compressed-video pixel decode (r5: retires
    decode_image_stub)."""

    def _frames(self, n=6, h=16, w=24, bias=0):
        import numpy as np

        f, y, x = np.mgrid[0:n, 0:h, 0:w]
        return ((x * 3 + y * 5 + f * 7 + bias) % 200 + 50).astype(np.uint8)

    def test_roundtrip_both_carriers(self):
        import numpy as np

        from dataverifyr_spark.operators.mjpeg import (
            encode_avi_mjpeg,
            encode_bare_mjpeg,
            mjpeg_info,
            mjpeg_sample_frames,
        )

        frames = self._frames()
        for enc in (encode_avi_mjpeg, encode_bare_mjpeg):
            blob = enc(frames)
            w, h, n, spans = mjpeg_info(blob)
            assert (w, h, n) == (24, 16, 6)
            assert len(spans) == 6
            s = mjpeg_sample_frames(blob, every_n=2)
            assert s.shape == (3, 16, 24, 3)
            # decoded pixels are REAL (lossy-close to the source, not fake)
            err = np.abs(s[0, :, :, 0].astype(float) - frames[0].astype(float)).mean()
            assert err < 3.0, err
        # every_n honors offsets: frame 0, 2, 4 sampled (f-gradient +7/frame)
        assert float(s[1].mean()) != float(s[0].mean())

    def test_marker_walk_survives_ffd9_in_table_payload(self):
        """A COM segment whose payload contains FF D9 must NOT split the
        frame early — boundaries come from a real segment-length walk, not a
        byte search."""
        from dataverifyr_spark.operators.jpeg import encode_jpeg
        from dataverifyr_spark.operators.mjpeg import mjpeg_info

        f0 = encode_jpeg(self._frames(1)[0])
        # inject COM (FFFE), length 4, payload = FF D9 right after SOI
        poisoned = f0[:2] + b"\xff\xfe\x00\x04\xff\xd9" + f0[2:]
        blob = poisoned + f0  # two-frame bare stream
        w, h, n, spans = mjpeg_info(blob)
        assert n == 2
        assert spans[0][1] == len(poisoned)
        assert blob.find(b"\xff\xd9") < spans[0][1] - 2  # naive search WOULD mis-split

    def test_malformed_containers_raise(self):
        import numpy as np
        import pytest

        from dataverifyr_spark.operators.image import ImageError
        from dataverifyr_spark.operators.mjpeg import (
            encode_avi_mjpeg,
            encode_bare_mjpeg,
            mjpeg_info,
            mjpeg_sample_frames,
        )

        blob = encode_avi_mjpeg(self._frames(3))
        with pytest.raises(ImageError, match="RIFF/SOI"):
            mjpeg_info(b"XXXX" + blob[4:])
        with pytest.raises(ImageError):
            mjpeg_info(blob[: len(blob) // 2])  # truncated movi
        bare = encode_bare_mjpeg(self._frames(2))
        with pytest.raises(ImageError, match="unterminated"):
            mjpeg_info(bare[:-4])
        # frame size change mid-stream is a decode-time error
        mixed = encode_bare_mjpeg(self._frames(1)) + encode_bare_mjpeg(
            np.zeros((1, 8, 8), np.uint8)
        )
        with pytest.raises(ImageError, match="dimensions vary"):
            mjpeg_sample_frames(mixed)

    def test_fixture_cadence_through_probe_rules(self, spark):
        """mjpeg_videos_table + video_probe + fused rules reproduce the
        injection cadences — the mjpeg_validate gate contract.  The fixture
        alternates AVI / bare carriers per index, so both container walks are
        exercised in one pass."""
        import dataverifyr_spark as dv
        from dataverifyr_spark.operators.image import video_probe
        from dataverifyr_spark.operators.mjpeg import (
            MJPEG_CORRUPT_EVERY,
            MJPEG_DARK_EVERY,
            MJPEG_SHORT_EVERY,
            mjpeg_videos_table,
        )

        n = 120
        vids = mjpeg_videos_table(spark, n)
        rules = dv.ruleset(
            dv.rule("vid_valid", name="decodes"),
            dv.rule("vid_n_frames >= 5", name="enough_frames", allow_na=True),
            dv.rule("vid_mean_luma > 10", name="not_black", allow_na=True),
        )
        by = {r["name"]: r for r in dv.check_data(video_probe(vids), rules).collect()}
        corrupt = {i for i in range(1, n) if i % MJPEG_CORRUPT_EVERY == 0}
        short = {i for i in range(1, n) if i % MJPEG_SHORT_EVERY == 0}
        dark = {i for i in range(1, n) if i % MJPEG_DARK_EVERY == 0}
        assert by["decodes"]["fail"] == len(corrupt)
        assert by["enough_frames"]["fail"] == len(short - corrupt)
        assert by["not_black"]["fail"] == len(dark - corrupt)
        assert all(by[k]["error"] == "" for k in by)


class TestMjpegByteFlipFuzz:
    """r5: the MJPEG container walks under systematic corruption — mjpeg_info
    and mjpeg_sample_frames must raise only ImageError (or succeed), never a
    raw struct.error / IndexError / UnboundLocalError, so video_probe's
    error-row contract holds for arbitrary corruption of either carrier."""

    @pytest.mark.parametrize("carrier", ["avi", "bare"])
    def test_single_byte_flips(self, carrier):
        import numpy as np

        from dataverifyr_spark.operators.image import ImageError
        from dataverifyr_spark.operators.mjpeg import (
            encode_avi_mjpeg,
            encode_bare_mjpeg,
            mjpeg_sample_frames,
        )

        f, y, x = np.mgrid[0:3, 0:16, 0:16]
        frames = ((x * 3 + y * 5 + f * 7) % 200 + 50).astype(np.uint8)
        blob = (encode_avi_mjpeg if carrier == "avi" else encode_bare_mjpeg)(frames)
        step = max(1, len(blob) // 150)
        for i in range(0, len(blob), step):
            mutated = blob[:i] + bytes([blob[i] ^ 0xFF]) + blob[i + 1 :]
            try:
                mjpeg_sample_frames(mutated, every_n=1)
            except ImageError:
                pass  # the contract
        # truncation sweep too
        for cut in range(0, len(blob), max(1, len(blob) // 40)):
            try:
                mjpeg_sample_frames(blob[:cut])
            except ImageError:
                pass


class TestMjpegInterleavedStreams:
    def test_avi_with_audio_chunks_skips_them(self):
        """Real AVIs interleave audio ('01wb') with video ('00dc') inside
        movi — the walk must count only video frames."""
        import struct

        import numpy as np

        from dataverifyr_spark.operators.mjpeg import (
            _chunk,
            _list,
            encode_avi_mjpeg,
            mjpeg_info,
        )

        frames = np.full((2, 16, 16), 128, np.uint8)
        blob = encode_avi_mjpeg(frames)
        # rebuild movi with an audio chunk interleaved between the two frames
        w, h, n, spans = mjpeg_info(blob)
        f0 = bytes(blob[spans[0][0] : spans[0][0] + spans[0][1]])
        f1 = bytes(blob[spans[1][0] : spans[1][0] + spans[1][1]])
        movi = _list(
            b"movi",
            _chunk(b"00dc", f0) + _chunk(b"01wb", b"\x00" * 321) + _chunk(b"00dc", f1),
        )
        # splice: keep RIFF header + hdrl, swap movi, drop idx1
        hdr_end = blob.index(b"LIST", 12)  # hdrl LIST
        hdrl_size = struct.unpack_from("<I", blob, hdr_end + 4)[0]
        head = blob[: hdr_end + 8 + hdrl_size + (hdrl_size % 2)]
        rebuilt = head + movi
        rebuilt = b"RIFF" + struct.pack("<I", len(rebuilt) - 8) + rebuilt[8:]
        w2, h2, n2, spans2 = mjpeg_info(rebuilt)
        assert (w2, h2, n2) == (16, 16, 2)
        assert len(spans2) == 2
