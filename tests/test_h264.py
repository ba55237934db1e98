"""H.264 Annex-B container probe: SPS round-trip, Exp-Golomb, emulation
prevention, NAL walk frame/IDR counting, and the video_probe dispatch.

No reference analog (DavZim/dataverifyr validates tabular payloads only) —
this is the graft's compressed-video leg, spec: ITU-T H.264 §7.3 / §9.1 /
§B.1."""

import pytest

from dataverifyr_spark.operators.h264 import (
    H264_BASE_FRAMES,
    _BitReader,
    _BitWriter,
    _ebsp_to_rbsp,
    _rbsp_to_ebsp,
    _write_pps,
    _write_sps,
    h264_info,
    h264_videos_table,
    make_h264_stream,
    parse_sps,
)
from dataverifyr_spark.operators.image import ImageError


class TestExpGolomb:
    def test_ue_se_roundtrip(self):
        w = _BitWriter()
        vals_ue = [0, 1, 2, 7, 8, 255, 1023]
        vals_se = [0, 1, -1, 3, -7, 100, -255]
        for v in vals_ue:
            w.ue(v)
        for v in vals_se:
            w.se(v)
        r = _BitReader(w.rbsp())
        assert [r.ue() for _ in vals_ue] == vals_ue
        assert [r.se() for _ in vals_se] == vals_se

    def test_exhausted_rbsp_raises(self):
        with pytest.raises(ImageError, match="exhausted"):
            _BitReader(b"").u(1)


class TestEmulationPrevention:
    @pytest.mark.parametrize(
        "raw",
        [b"\x00\x00\x00", b"\x00\x00\x01\x02", b"\xaa\x00\x00\x03\x00", b"\x00" * 12],
    )
    def test_roundtrip(self, raw):
        ebsp = _rbsp_to_ebsp(raw)
        assert b"\x00\x00\x00" not in ebsp and b"\x00\x00\x01" not in ebsp
        assert _ebsp_to_rbsp(ebsp) == raw


class TestSPS:
    @pytest.mark.parametrize(
        "w,h", [(64, 48), (1920, 1080), (1280, 720), (100, 50), (16, 16), (3840, 2160)]
    )
    def test_resolution_roundtrip_incl_cropping(self, w, h):
        sps = parse_sps(_write_sps(w, h))
        assert (sps["width"], sps["height"]) == (w, h)
        assert sps["profile_idc"] == 66 and sps["level_idc"] == 30

    def test_high_profile_branch(self):
        """Hand-write a High-profile SPS (chroma_format_idc present) so the
        parser's §7.3.2.1.1 high-profile arm is exercised."""
        b = _BitWriter()
        b.u(100, 8)  # profile_idc High
        b.u(0, 8)
        b.u(40, 8)  # level 4.0
        b.ue(0)  # sps_id
        b.ue(1)  # chroma_format_idc 4:2:0
        b.ue(0), b.ue(0)  # bit depths
        b.u(0, 1)  # qpprime
        b.u(0, 1)  # no scaling matrix
        b.ue(0)  # log2_max_frame_num_minus4
        b.ue(0)  # pic_order_cnt_type 0
        b.ue(0)  # log2_max_pic_order_cnt_lsb_minus4
        b.ue(3)  # max_num_ref_frames
        b.u(0, 1)
        b.ue(120 - 1)  # 1920 / 16
        b.ue(68 - 1)  # 1088 / 16
        b.u(1, 1)  # frame_mbs_only
        b.u(1, 1)  # direct_8x8
        b.u(1, 1)  # cropping: 1088 -> 1080
        b.ue(0), b.ue(0), b.ue(0), b.ue(4)
        b.u(0, 1)  # no VUI
        sps = parse_sps(b.rbsp())
        assert (sps["width"], sps["height"]) == (1920, 1080)
        assert sps["profile_idc"] == 100

    def test_overcrop_raises(self):
        b = _BitWriter()
        for v, n in [(66, 8), (0, 8), (30, 8)]:
            b.u(v, n)
        b.ue(0), b.ue(0), b.ue(2), b.ue(1)
        b.u(0, 1)
        b.ue(0), b.ue(0)  # 16x16 coded
        b.u(1, 1), b.u(1, 1), b.u(1, 1)  # cropping on
        b.ue(0), b.ue(8), b.ue(0), b.ue(0)  # crop_right 8*2 = 16 -> width 0
        b.u(0, 1)
        with pytest.raises(ImageError, match="cropping"):
            parse_sps(b.rbsp())


class TestH264Info:
    def test_counts_and_resolution(self):
        blob = make_h264_stream(320, 240, 9, idr_every=4)
        assert h264_info(blob) == (320, 240, 9, 3, 66, 30)

    def test_single_idr_stream(self):
        w, h, n, idr, _, _ = h264_info(make_h264_stream(64, 48, 6, idr_every=10**6))
        assert (n, idr) == (6, 1)

    def test_multi_slice_frame_counts_once(self):
        """A second slice NAL with first_mb_in_slice > 0 belongs to the SAME
        picture (§7.4.3) and must not bump the frame count."""
        blob = bytearray(make_h264_stream(64, 48, 3, idr_every=1))
        extra = _BitWriter()
        extra.ue(12)  # first_mb_in_slice != 0 -> continuation slice
        extra.ue(7), extra.ue(0)
        extra.u(0, 4)
        extra.ue(0)
        blob += b"\x00\x00\x01\x65" + _rbsp_to_ebsp(extra.rbsp() + b"\xaa" * 16)
        w, h, n, idr, _, _ = h264_info(bytes(blob))
        assert (n, idr) == (3, 3)

    def test_corrupt_and_headerless(self):
        blob = make_h264_stream(64, 48, 5)
        with pytest.raises(ImageError, match="no SPS"):
            h264_info(b"XXXX" + blob[4:])  # SPS start code destroyed
        with pytest.raises(ImageError, match="start code"):
            h264_info(b"\xff" * 64)
        with pytest.raises(ImageError, match="empty"):
            h264_info(b"")

    def test_probe_cost_is_payload_independent(self):
        """Container walk must not scale with slice payload size: the same
        stream with 100x the dummy payload parses to identical metadata."""
        small = make_h264_stream(640, 480, 5, payload_bytes=32)
        big = make_h264_stream(640, 480, 5, payload_bytes=3200)
        assert h264_info(small) == h264_info(big)
        assert len(big) > 10 * len(small)


class TestVideoProbeDispatch:
    def test_mixed_y4m_and_h264_table(self, spark):
        from pyspark.sql import functions as F

        from dataverifyr_spark.operators.image import video_probe, videos_table

        y4m = videos_table(spark, 40)
        h264 = h264_videos_table(spark, 40)
        probed = video_probe(y4m.unionByName(h264)).cache()
        try:
            h = probed.filter(F.col("media_id").startswith("h264")).collect()
            y = probed.filter(F.col("media_id").startswith("vid")).collect()
            assert len(h) == 40 and len(y) == 40
            for r in h:
                if r["vid_valid"]:
                    assert r["vid_n_idr"] is not None and r["vid_mean_luma"] is None
                    assert r["vid_width"] >= 64
            for r in y:
                if r["vid_valid"]:
                    assert r["vid_n_idr"] is None and r["vid_mean_luma"] is not None
            # cadence: corrupt every 13 in both fixtures
            assert sum(not r["vid_valid"] for r in h) == 3  # i = 13, 26, 39
            assert sum(not r["vid_valid"] for r in y) == 3
        finally:
            probed.unpersist()

    def test_fixture_cadences_match_rules(self, spark):
        import dataverifyr_spark as dv
        from dataverifyr_spark.operators.image import video_probe

        n = 120
        res = {
            r["name"]: r
            for r in dv.check_data(
                video_probe(h264_videos_table(spark, n)),
                dv.ruleset(
                    dv.rule("vid_valid", name="decodes"),
                    dv.rule(f"vid_n_frames >= {H264_BASE_FRAMES}", name="frames", allow_na=True),
                    dv.rule("vid_n_idr >= 2", name="keyframes", allow_na=True),
                ),
            ).collect()
        }
        corrupt = {i for i in range(1, n) if i % 13 == 0}
        short = {i for i in range(1, n) if i % 7 == 0}
        noidr = {i for i in range(1, n) if i % 11 == 0}
        assert res["decodes"]["fail"] == len(corrupt)
        assert res["frames"]["fail"] == len(short - corrupt)
        assert res["keyframes"]["fail"] == len((short | noidr) - corrupt)

    def test_pps_parses(self):
        r = _BitReader(_write_pps())
        assert r.ue() == 0 and r.ue() == 0  # pps_id, sps_id wired to SPS 0


class TestByteFlipFuzz:
    def test_single_byte_flips_never_raise_non_image_error(self):
        """The probe contract: any corrupted container either still parses or
        raises ImageError — never ValueError/IndexError/struct.error — so
        video_probe's error-row path holds for arbitrary corruption."""
        blob = bytearray(make_h264_stream(64, 48, 5, idr_every=2))
        for i in range(0, len(blob), 3):  # every 3rd byte, all 8 bit flips at once
            mutated = bytes(blob[:i]) + bytes([blob[i] ^ 0xFF]) + bytes(blob[i + 1 :])
            try:
                h264_info(mutated)
            except ImageError:
                pass  # the contract
            # any other exception type propagates and fails the test

    def test_truncations_never_raise_non_image_error(self):
        blob = make_h264_stream(96, 64, 4)
        for cut in range(0, len(blob), 7):
            try:
                h264_info(blob[:cut])
            except ImageError:
                pass
