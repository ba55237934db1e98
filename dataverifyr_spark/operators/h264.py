"""H.264 / AVC container-level probe — Annex-B byte-stream parsing with NO
pixel decode (public spec: ITU-T H.264 (V15), §B.1 byte-stream NAL syntax,
§7.3.1 NAL header, §7.3.2.1.1 seq_parameter_set_data, §9.1 Exp-Golomb).

What a 100 TB-scale validation pass actually needs from a compressed video
column is container metadata: does the stream parse, what resolution does
the SPS declare, how many coded pictures, how many IDR random-access points.
All of that lives in NAL headers + the SPS + the first Exp-Golomb field of
each slice header — a few hundred bytes per clip regardless of clip size —
so the probe is header math like Y4M's (`y4m_info`), not a codec.  Pixel
decode (IDCT/CABAC/motion comp) stays out of scope without a codec library;
reference parity note: the reference validates tabular payloads only
(R/check_data.R), so video rules are a graft extension.

Fixture note: ``make_h264_stream`` writes SYNTACTICALLY VALID Annex-B
SPS/PPS/slice-header bytes with dummy slice payloads — a container fixture
for probe tests, not an encoder; real pixel data would need x264.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .image import ImageError

__all__ = [
    "h264_info",
    "parse_sps",
    "make_h264_stream",
    "h264_videos_table",
    "H264_BASE_FRAMES",
]

_HIGH_PROFILES = frozenset({100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135})


# ---------------------------------------------------------------------------
# bit I/O + Exp-Golomb (§9.1)
# ---------------------------------------------------------------------------


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ImageError("H.264 RBSP exhausted mid-field")
            v = (v << 1) | ((self.data[byte] >> (7 - (self.pos & 7))) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        """Exp-Golomb unsigned: count leading zeros z, read z more bits."""
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ImageError("H.264 Exp-Golomb run too long")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def u(self, v: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)

    def ue(self, v: int) -> None:
        code = v + 1
        n = code.bit_length()
        self.u(0, n - 1)
        self.u(code, n)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def rbsp(self) -> bytes:
        """Close the RBSP: stop bit + zero-pad to a byte (§7.3.2.11)."""
        bits = self.bits + [1]
        while len(bits) % 8:
            bits.append(0)
        return bytes(
            int("".join(map(str, bits[i : i + 8])), 2) for i in range(0, len(bits), 8)
        )


def _ebsp_to_rbsp(data: bytes) -> bytes:
    """Strip emulation-prevention 0x03 bytes (§7.4.1.1)."""
    if b"\x00\x00\x03" not in data:
        return data
    out = bytearray()
    zeros = 0
    for b in data:
        if zeros >= 2 and b == 3:
            zeros = 0
            continue  # emulation_prevention_three_byte
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


def _rbsp_to_ebsp(data: bytes) -> bytes:
    """Insert emulation-prevention bytes so no 0x000000..0x000003 appears."""
    out = bytearray()
    zeros = 0
    for b in data:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


# ---------------------------------------------------------------------------
# SPS (§7.3.2.1.1) — the resolution source of truth
# ---------------------------------------------------------------------------


def _skip_scaling_list(r: _BitReader, size: int) -> None:
    last, nxt = 8, 8
    for _ in range(size):
        if nxt != 0:
            nxt = (last + r.se() + 256) % 256
        last = last if nxt == 0 else nxt


def parse_sps(rbsp: bytes) -> dict:
    """seq_parameter_set_data → profile/level + frame width/height in luma
    samples (cropping applied, §7.4.2.1.1 frame-cropping semantics)."""
    r = _BitReader(rbsp)
    profile_idc = r.u(8)
    r.u(8)  # constraint_set flags + reserved_zero_2bits
    level_idc = r.u(8)
    r.ue()  # seq_parameter_set_id
    chroma_format_idc, separate_colour = 1, 0
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            separate_colour = r.u(1)
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            for i in range(8 if chroma_format_idc != 3 else 12):
                if r.u(1):
                    _skip_scaling_list(r, 16 if i < 6 else 64)
    log2_max_frame_num = r.ue() + 4
    pic_order_cnt_type = r.ue()
    if pic_order_cnt_type == 0:
        r.ue()  # log2_max_pic_order_cnt_lsb_minus4
    elif pic_order_cnt_type == 1:
        r.u(1)  # delta_pic_order_always_zero_flag
        r.se()  # offset_for_non_ref_pic
        r.se()  # offset_for_top_to_bottom_field
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    pw_mbs = r.ue() + 1
    ph_map = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    # CropUnit per §7.4.2.1.1 (SubWidthC/SubHeightC, Table 6-1)
    if chroma_format_idc == 0 or separate_colour:
        cux, cuy = 1, 2 - frame_mbs_only
    else:
        sub_w = 2 if chroma_format_idc in (1, 2) else 1
        sub_h = 2 if chroma_format_idc == 1 else 1
        cux, cuy = sub_w, sub_h * (2 - frame_mbs_only)
    width = pw_mbs * 16 - cux * (crop_l + crop_r)
    height = (2 - frame_mbs_only) * ph_map * 16 - cuy * (crop_t + crop_b)
    if width <= 0 or height <= 0:
        raise ImageError("H.264 SPS cropping exceeds coded size")
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "width": width,
        "height": height,
        "log2_max_frame_num": log2_max_frame_num,
    }


# ---------------------------------------------------------------------------
# NAL walk — frame/IDR counts from slice headers' first Exp-Golomb field
# ---------------------------------------------------------------------------


def _iter_nals(blob: bytes):
    """Yield (nal_unit_type, ebsp_payload) per Annex-B start code (§B.1)."""
    n = len(blob)
    i = blob.find(b"\x00\x00\x01")
    if i < 0:
        raise ImageError("no H.264 start code")
    while i >= 0:
        start = i + 3
        if start >= n:
            break
        header = blob[start]
        if header & 0x80:
            raise ImageError("H.264 forbidden_zero_bit set")
        nxt = blob.find(b"\x00\x00\x01", start)
        end = nxt if nxt >= 0 else n
        # trim the 00 of a 4-byte start code belonging to the NEXT NAL
        while end > start and blob[end - 1] == 0:
            end -= 1
        yield header & 0x1F, blob[start + 1 : end]
        i = nxt


def h264_info(blob: bytes) -> tuple[int, int, int, int, int, int]:
    """(width, height, n_frames, n_idr, profile_idc, level_idc) from headers
    only — touches no slice payload beyond each slice header's FIRST
    Exp-Golomb field (first_mb_in_slice == 0 marks a new picture, so
    multi-slice frames count once).  Cost is O(NAL count), independent of
    payload size: the 100 TB answer to "validate the video column"."""
    if blob is None or len(blob) < 4:
        raise ImageError("empty H.264 blob")
    sps = None
    n_frames = n_idr = 0
    for nal_type, ebsp in _iter_nals(blob):
        if nal_type == 7 and sps is None:
            sps = parse_sps(_ebsp_to_rbsp(ebsp))
        elif nal_type in (1, 5):
            first_mb = _BitReader(_ebsp_to_rbsp(ebsp[:8])).ue()
            if first_mb == 0:
                n_frames += 1
                if nal_type == 5:
                    n_idr += 1
    if sps is None:
        raise ImageError("H.264 stream has no SPS")
    if n_frames == 0:
        raise ImageError("H.264 stream has no coded pictures")
    return sps["width"], sps["height"], n_frames, n_idr, sps["profile_idc"], sps["level_idc"]


# ---------------------------------------------------------------------------
# fixture writer + table (container fixture, NOT an encoder)
# ---------------------------------------------------------------------------


def _write_sps(w: int, h: int) -> bytes:
    if w % 2 or h % 2:
        raise ImageError("fixture SPS needs even dimensions (4:2:0 crop units)")
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    b = _BitWriter()
    b.u(66, 8)  # profile_idc: Baseline
    b.u(0, 8)  # constraint flags + reserved
    b.u(30, 8)  # level_idc 3.0
    b.ue(0)  # seq_parameter_set_id
    b.ue(0)  # log2_max_frame_num_minus4 → frame_num is u(4)
    b.ue(2)  # pic_order_cnt_type 2 (no extra fields)
    b.ue(1)  # max_num_ref_frames
    b.u(0, 1)  # gaps_in_frame_num_value_allowed_flag
    b.ue(mb_w - 1)
    b.ue(mb_h - 1)
    b.u(1, 1)  # frame_mbs_only_flag
    b.u(1, 1)  # direct_8x8_inference_flag
    crop = w % 16 or h % 16
    b.u(1 if crop else 0, 1)
    if crop:  # CropUnitX = CropUnitY = 2 (4:2:0 frame)
        b.ue(0), b.ue((mb_w * 16 - w) // 2), b.ue(0), b.ue((mb_h * 16 - h) // 2)
    b.u(0, 1)  # vui_parameters_present_flag
    return b.rbsp()


def _write_pps() -> bytes:
    b = _BitWriter()
    b.ue(0), b.ue(0)  # pps_id, sps_id
    b.u(0, 1)  # entropy_coding_mode_flag (CAVLC)
    b.u(0, 1)  # bottom_field_pic_order_in_frame_present_flag
    b.ue(0)  # num_slice_groups_minus1
    b.ue(0), b.ue(0)  # num_ref_idx_l{0,1}_default_active_minus1
    b.u(0, 1)  # weighted_pred_flag
    b.u(0, 2)  # weighted_bipred_idc
    b.se(0), b.se(0), b.se(0)  # init_qp, init_qs, chroma_qp_offset
    b.u(0, 3)  # deblocking / constrained_intra / redundant_pic_cnt flags
    return b.rbsp()


def _write_slice_header(idr: bool, frame_num: int) -> bytes:
    b = _BitWriter()
    b.ue(0)  # first_mb_in_slice — the field h264_info counts frames by
    b.ue(7 if idr else 5)  # slice_type: I (7) / P (5), "all slices" variants
    b.ue(0)  # pic_parameter_set_id
    b.u(frame_num & 15, 4)  # frame_num, u(log2_max_frame_num)=u(4)
    if idr:
        b.ue(frame_num & 1)  # idr_pic_id
    return b.rbsp()


def make_h264_stream(
    w: int, h: int, n_frames: int, idr_every: int = 4, payload_bytes: int = 64
) -> bytes:
    """Deterministic Annex-B stream: SPS, PPS, then one slice NAL per frame
    (IDR every ``idr_every``-th starting at frame 0), each padded with
    ``payload_bytes`` of dummy slice data the probe never reads."""
    out = bytearray()
    out += b"\x00\x00\x00\x01\x67" + _rbsp_to_ebsp(_write_sps(w, h))
    out += b"\x00\x00\x00\x01\x68" + _rbsp_to_ebsp(_write_pps())
    for f in range(n_frames):
        idr = f % idr_every == 0
        out += b"\x00\x00\x01" + (b"\x65" if idr else b"\x41")
        payload = _write_slice_header(idr, f) + bytes(
            (f * 131 + j * 7) % 251 + 4 for j in range(payload_bytes)
        )
        out += _rbsp_to_ebsp(payload)
    return bytes(out)


H264_SHORT_EVERY = 7  # 2 frames (frame-count rule fails)
H264_NO_IDR_EVERY = 11  # single IDR for the whole stream (GOP rule fails)
H264_CORRUPT_EVERY = 13  # start code destroyed (decode fails)
H264_BASE_FRAMES = 5


def _make_h264_row(i: int) -> tuple:
    w, h = 64 + (i % 3) * 16, 48 + (i % 2) * 16
    n_frames = H264_BASE_FRAMES + i % 4
    if i > 0 and i % H264_SHORT_EVERY == 0:
        n_frames = 2
    idr_every = 4
    if i > 0 and i % H264_NO_IDR_EVERY == 0:
        idr_every = 10**6  # only frame 0 is an IDR
    blob = make_h264_stream(w, h, n_frames, idr_every=idr_every)
    if i > 0 and i % H264_CORRUPT_EVERY == 0:
        blob = b"XXXX" + blob[4:]
    return (f"h264-{i:08d}", bytearray(blob))


def h264_videos_table(spark, n: int = 500, num_partitions: int | None = None) -> DataFrame:
    """Generate the H.264 fixture distributed (rows built on executors),
    violation cadences pure index arithmetic so a SQL oracle recomputes
    expected rule counts — same design as videos_table/images_table."""
    num_partitions = num_partitions or max(2, spark.sparkContext.defaultParallelism)
    rdd = spark.sparkContext.parallelize(range(n), num_partitions).map(_make_h264_row)
    return spark.createDataFrame(
        rdd,
        T.StructType(
            [
                T.StructField("media_id", T.StringType(), False),
                T.StructField("bytes", T.BinaryType(), True),
            ]
        ),
    )
