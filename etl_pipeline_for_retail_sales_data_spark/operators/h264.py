"""H.264/AVC (ITU-T Rec. H.264) Annex-B codec subset in pure Python —
no ffmpeg, no libavcodec, no third-party libs.

Scope: I_PCM-only video. Every macroblock is coded as I_PCM (``mb_type``
25 in I slices) — raw uncompressed 4:2:0 samples carried inside a fully
spec-conformant coded bitstream that any conforming H.264 decoder plays.
The encoder emits real SPS / PPS / IDR-slice NAL units with Exp-Golomb
headers, real emulation-prevention-byte insertion (00 00 0x escaping),
and byte-aligned PCM macroblock payloads; the decoder parses any
Annex-B byte stream whose slices are I_PCM-only — it reads the
geometry and profile FROM the stream's own SPS (as every conforming
decoder must), honors both 3- and 4-byte start codes, de-escapes
emulation-prevention bytes, and raises typed errors for
predicted/transform-coded macroblocks, CABAC streams, or non-I slices
(honest scoping — those need intra prediction + CAVLC/CABAC residual
machinery, not different libraries).

Profiles: Baseline (profile_idc 66) and High (profile_idc 100). The
spec forbids PCM sample value 0 under Baseline/Main/Extended
(ITU-T H.264 §7.4.5 pcm_sample semantics), so the encoder validates
that; High profile allows zero samples — which is also what makes the
emulation-prevention path REAL rather than decorative: zero-runs in
PCM data produce 00 00 0x byte patterns that must be escaped or a
decoder would resynchronize on a phantom start code mid-slice.

I_PCM is lossless, so round trips are byte-exact — the strongest
oracle form (like the BMP/PNG codecs, unlike lossy JPEG).

Entropy-free by construction: per-macroblock header bits are a few
Exp-Golomb symbols, then the payload is raw bytes appended on byte
boundaries — the hot path is bytes-level, not bit-level, so encoding
scales with frame area, not with a per-bit Python loop.

Reference parity note: the reference repo has no media path at all
(743 lines of pandas/Airflow ETL); this module exists for the
training-data-pipeline extension tier (video corpus ingestion), same
as operators/jpeg.py.
"""

from __future__ import annotations

import re
import struct

import numpy as np

# NAL unit types used here (ITU-T H.264 Table 7-1).
NAL_SLICE_NON_IDR = 1
NAL_SLICE_IDR = 5
NAL_SPS = 7
NAL_PPS = 8

PROFILE_BASELINE = 66
PROFILE_HIGH = 100

# High-family profiles whose SPS carries chroma/bit-depth fields
# (ITU-T H.264 §7.3.2.1.1).
_HIGH_FAMILY = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}

_I_SLICE_TYPES = {2, 7}  # slice_type values meaning I (7 = all-I picture)
_MB_TYPE_I_PCM = 25  # Table 7-11, I slices


class _BitWriter:
    """MSB-first bit writer with a byte-aligned fast path (PCM payloads
    are appended as whole bytes, so the per-bit loop only ever sees the
    few Exp-Golomb header symbols)."""

    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0  # partial byte, MSB-first
        self._nbits = 0  # bits currently in _acc (0..7)

    def u(self, n: int, value: int) -> None:
        if value < 0 or value >> n:
            # n >= 64 included (r11 ADVICE): unlike the per-bit loop this
            # bulk fold replaced, an oversized value would corrupt bits
            # already buffered in the accumulator, so validate every n
            raise ValueError(f"u({n}) cannot encode {value}")
        # bulk append: fold all n bits into the accumulator at once and
        # flush whole bytes — O(n/8) instead of the per-bit loop this
        # replaces (the loop was a top-2 profile entry on PCM streams,
        # one ue() per macroblock adds up)
        acc = (self._acc << n) | value
        nbits = self._nbits + n
        while nbits >= 8:
            nbits -= 8
            self._out.append((acc >> nbits) & 0xFF)
        self._acc = acc & ((1 << nbits) - 1)
        self._nbits = nbits

    def ue(self, value: int) -> None:
        if value < 0:
            raise ValueError(f"ue cannot encode negative {value}")
        x = value + 1
        nbits = x.bit_length()
        self.u(nbits - 1, 0)
        self.u(nbits, x)

    def se(self, value: int) -> None:
        self.ue(2 * value - 1 if value > 0 else -2 * value)

    @property
    def byte_aligned(self) -> bool:
        return self._nbits == 0

    def align_zero(self) -> None:
        """pcm_alignment_zero_bit: pad with zeros to a byte boundary."""
        if self._nbits:
            self._out.append((self._acc << (8 - self._nbits)) & 0xFF)
            self._acc = 0
            self._nbits = 0

    def write_bytes(self, data: bytes) -> None:
        if self._nbits:
            raise ValueError("write_bytes requires byte alignment")
        self._out += data

    def rbsp_trailing(self) -> None:
        """rbsp_stop_one_bit + alignment zeros (§7.3.2.11)."""
        self.u(1, 1)
        self.align_zero()

    def getvalue(self) -> bytes:
        if self._nbits:
            raise ValueError("unterminated RBSP (call rbsp_trailing first)")
        return bytes(self._out)


class _BitReader:
    """MSB-first bit reader over a de-escaped RBSP, with the matching
    byte-aligned fast path for PCM payloads."""

    def __init__(self, data: bytes) -> None:
        self._data = data
        self._pos = 0  # bit position

    def u(self, n: int) -> int:
        end = self._pos + n
        if end > len(self._data) * 8:
            raise ValueError("truncated RBSP: bit read past end")
        if n == 0:
            return 0
        # bulk extract: one int.from_bytes over the covered byte span and
        # a shift/mask — C-speed, replacing the per-bit indexing loop
        # (top-2 profile entry on PCM streams)
        first = self._pos >> 3
        last = (end + 7) >> 3
        window = int.from_bytes(self._data[first:last], "big")
        value = (window >> (last * 8 - end)) & ((1 << n) - 1)
        self._pos = end
        return value

    def ue(self) -> int:
        zeros = 0
        nbits = len(self._data) * 8
        while self._pos < nbits and self.u(1) == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("malformed Exp-Golomb code (>32 leading zeros)")
        if zeros == 0:
            return 0
        return (1 << zeros | self.u(zeros)) - 1

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)

    @property
    def byte_aligned(self) -> bool:
        return self._pos % 8 == 0

    def align(self) -> None:
        """Consume pcm_alignment_zero_bit padding."""
        pad = -self._pos % 8
        if pad and self.u(pad) != 0:
            raise ValueError("nonzero pcm_alignment bit")

    def read_bytes(self, n: int) -> bytes:
        if self._pos % 8:
            raise ValueError("read_bytes requires byte alignment")
        start = self._pos >> 3
        if start + n > len(self._data):
            raise ValueError("truncated RBSP: byte read past end")
        self._pos += n * 8
        return self._data[start : start + n]

    def bits_left(self) -> int:
        return len(self._data) * 8 - self._pos


# Escape/de-escape run over every PCM payload byte, so they must not be
# per-byte Python loops (they were — ~60% of the whole roundtrip in the
# profile). C-speed regex substitution implements the identical
# left-to-right scan: sub() consumes the matched 00 00 exactly like the
# sequential scanner resets its zero counter after acting, so outputs are
# byte-identical on ALL inputs, conforming or not (differential-fuzzed in
# tests/test_multimodal_codecs.py).
_EP_ESCAPE = re.compile(rb"\x00\x00(?=[\x00-\x03])")
_EP_UNESCAPE = re.compile(rb"\x00\x00\x03")


def rbsp_to_ebsp(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes (§7.4.1.1): within the NAL
    payload, any 00 00 followed by a byte ≤ 03 gets a 03 spliced in so
    no 00 00 00 / 00 00 01 / 00 00 02 / 00 00 03 pattern survives to be
    mistaken for a start code (or an escape) by a byte-stream parser."""
    return _EP_ESCAPE.sub(b"\x00\x00\x03", rbsp)


def ebsp_to_rbsp(ebsp: bytes) -> bytes:
    """Strip emulation-prevention bytes: every 00 00 03 collapses to
    00 00 (§7.4.1.1)."""
    return _EP_UNESCAPE.sub(b"\x00\x00", ebsp)


def nal_unit(nal_unit_type: int, nal_ref_idc: int, rbsp: bytes) -> bytes:
    """NAL unit (header byte + escaped payload) WITHOUT a start code —
    the form AVCC/ISO-BMFF sample tables carry (length-prefixed) and
    Annex-B prefixes with 00 00 00 01."""
    header = bytes([(nal_ref_idc << 5) | nal_unit_type])
    return rbsp_to_ebsp(header + rbsp)


def _nal(nal_unit_type: int, nal_ref_idc: int, rbsp: bytes) -> bytes:
    return b"\x00\x00\x00\x01" + nal_unit(nal_unit_type, nal_ref_idc, rbsp)


def encode_sps(width_mb: int, height_mb: int, profile_idc: int) -> bytes:
    """seq_parameter_set_rbsp (§7.3.2.1.1) as a raw RBSP (no NAL
    wrapper): pic_order_cnt_type 2 (decode order == output order — the
    all-IDR stream needs no POC machinery), frame_mbs_only, no
    cropping, no VUI. High-family profiles carry the explicit 4:2:0 /
    8-bit chroma-format fields; Baseline infers them."""
    w = _BitWriter()
    w.u(8, profile_idc)
    w.u(8, 0)  # constraint_set0..5 + reserved_zero_2bits
    w.u(8, 40)  # level_idc 4.0
    w.ue(0)  # seq_parameter_set_id
    if profile_idc in _HIGH_FAMILY:
        w.ue(1)  # chroma_format_idc: 4:2:0
        w.ue(0)  # bit_depth_luma_minus8
        w.ue(0)  # bit_depth_chroma_minus8
        w.u(1, 0)  # qpprime_y_zero_transform_bypass_flag
        w.u(1, 0)  # seq_scaling_matrix_present_flag
    w.ue(0)  # log2_max_frame_num_minus4 -> frame_num is u(4)
    w.ue(2)  # pic_order_cnt_type
    w.ue(0)  # max_num_ref_frames
    w.u(1, 0)  # gaps_in_frame_num_value_allowed_flag
    w.ue(width_mb - 1)  # pic_width_in_mbs_minus1
    w.ue(height_mb - 1)  # pic_height_in_map_units_minus1
    w.u(1, 1)  # frame_mbs_only_flag
    w.u(1, 1)  # direct_8x8_inference_flag
    w.u(1, 0)  # frame_cropping_flag
    w.u(1, 0)  # vui_parameters_present_flag
    w.rbsp_trailing()
    return w.getvalue()


def encode_pps() -> bytes:
    """pic_parameter_set_rbsp (§7.3.2.2): CAVLC entropy mode (the flag
    a decoder must check before touching slice_data), single slice
    group, no deblocking override, QP init 26."""
    w = _BitWriter()
    w.ue(0)  # pic_parameter_set_id
    w.ue(0)  # seq_parameter_set_id
    w.u(1, 0)  # entropy_coding_mode_flag: CAVLC
    w.u(1, 0)  # bottom_field_pic_order_in_frame_present_flag
    w.ue(0)  # num_slice_groups_minus1
    w.ue(0)  # num_ref_idx_l0_default_active_minus1
    w.ue(0)  # num_ref_idx_l1_default_active_minus1
    w.u(1, 0)  # weighted_pred_flag
    w.u(2, 0)  # weighted_bipred_idc
    w.se(0)  # pic_init_qp_minus26
    w.se(0)  # pic_init_qs_minus26
    w.se(0)  # chroma_qp_index_offset
    w.u(1, 0)  # deblocking_filter_control_present_flag
    w.u(1, 0)  # constrained_intra_pred_flag
    w.u(1, 0)  # redundant_pic_cnt_present_flag
    w.rbsp_trailing()
    return w.getvalue()


def _validate_planes(
    y: np.ndarray, cb: np.ndarray, cr: np.ndarray, profile_idc: int
) -> tuple[int, int]:
    if y.dtype != np.uint8 or cb.dtype != np.uint8 or cr.dtype != np.uint8:
        raise ValueError("PCM planes must be uint8")
    height, width = y.shape
    if width % 16 or height % 16 or width < 16 or height < 16:
        raise ValueError(
            f"I_PCM frame geometry must be positive multiples of 16, got {width}x{height}"
        )
    if cb.shape != (height // 2, width // 2) or cr.shape != cb.shape:
        raise ValueError("chroma planes must be half the luma geometry (4:2:0)")
    if profile_idc not in _HIGH_FAMILY and (
        not y.all() or not cb.all() or not cr.all()
    ):
        raise ValueError(
            "PCM sample value 0 is forbidden under Baseline/Main/Extended "
            "profiles (H.264 7.4.5); use profile_idc=100 or samples in 1..255"
        )
    return width, height


def encode_slice_idr(
    y: np.ndarray,
    cb: np.ndarray,
    cr: np.ndarray,
    idr_pic_id: int,
    profile_idc: int,
) -> bytes:
    """slice_layer_without_partitioning_rbsp for one all-I_PCM IDR
    picture (§7.3.3 / §7.3.4 / §7.3.5): header symbols in Exp-Golomb,
    then per macroblock mb_type=25, pcm_alignment_zero_bit, and the raw
    16x16 luma + two 8x8 chroma sample blocks appended byte-aligned."""
    width, height = _validate_planes(y, cb, cr, profile_idc)
    w = _BitWriter()
    w.ue(0)  # first_mb_in_slice
    w.ue(7)  # slice_type: I (all slices of the picture are I)
    w.ue(0)  # pic_parameter_set_id
    w.u(4, 0)  # frame_num (log2_max_frame_num=4; IDR requires 0)
    w.ue(idr_pic_id)  # idr_pic_id
    # pic_order_cnt_type==2: no POC syntax; I slice: no ref-idx syntax.
    w.u(1, 0)  # dec_ref_pic_marking: no_output_of_prior_pics_flag
    w.u(1, 0)  # dec_ref_pic_marking: long_term_reference_flag
    w.se(0)  # slice_qp_delta
    for my in range(height // 16):
        for mx in range(width // 16):
            w.ue(_MB_TYPE_I_PCM)  # mb_type: I_PCM
            w.align_zero()
            w.write_bytes(y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16].tobytes())
            w.write_bytes(cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8].tobytes())
            w.write_bytes(cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8].tobytes())
    w.rbsp_trailing()
    return w.getvalue()


def encode_h264(
    frames: list[tuple[np.ndarray, np.ndarray, np.ndarray]],
    profile_idc: int = PROFILE_BASELINE,
) -> bytes:
    """Annex-B byte stream: SPS, PPS, then one IDR slice per frame
    (every picture is an instantaneous refresh — no inter prediction
    exists in an I_PCM stream anyway, and it keeps every access unit
    independently decodable, the property a sharded video-corpus reader
    wants). Consecutive IDR pictures alternate idr_pic_id as §7.4.3
    requires. Frames are (y, cb, cr) uint8 planes, 4:2:0."""
    if not frames:
        raise ValueError("encode_h264 requires at least one frame")
    y0, cb0, cr0 = frames[0]
    width, height = _validate_planes(y0, cb0, cr0, profile_idc)
    for y, cb, cr in frames[1:]:
        if _validate_planes(y, cb, cr, profile_idc) != (width, height):
            raise ValueError("all frames must share one geometry")
    out = bytearray()
    out += _nal(NAL_SPS, 3, encode_sps(width // 16, height // 16, profile_idc))
    out += _nal(NAL_PPS, 3, encode_pps())
    for i, (y, cb, cr) in enumerate(frames):
        out += _nal(NAL_SLICE_IDR, 3, encode_slice_idr(y, cb, cr, i % 2, profile_idc))
    return bytes(out)


def split_annexb(data: bytes) -> list[bytes]:
    """Split an Annex-B byte stream into EBSP NAL units (3- or 4-byte
    start codes, per B.1.1 — leading zero_bytes before the 00 00 01
    prefix are absorbed)."""
    # bytes.find is a C-speed scan; the per-byte Python loop it replaces
    # was a measurable slice of decode time on PCM-sized payloads
    starts = []
    n = len(data)
    i = data.find(b"\x00\x00\x01")
    while i != -1:
        starts.append(i + 3)
        i = data.find(b"\x00\x00\x01", i + 3)
    if not starts:
        raise ValueError("not an Annex-B H.264 stream (no start codes)")
    nals = []
    for k, s in enumerate(starts):
        end = starts[k + 1] - 3 if k + 1 < len(starts) else n
        while end > s and data[end - 1] == 0:  # trailing zero_bytes
            end -= 1
        if end > s:
            nals.append(data[s:end])
    return nals


class _Sps:
    __slots__ = (
        "profile_idc",
        "width_mb",
        "height_mb",
        "log2_max_frame_num",
        "poc_type",
        "log2_max_poc_lsb",
    )


class _Pps:
    __slots__ = ("bottom_field_poc_present",)


def parse_sps(rbsp: bytes) -> _Sps:
    r = _BitReader(rbsp)
    sps = _Sps()
    sps.profile_idc = r.u(8)
    r.u(8)  # constraint flags
    r.u(8)  # level_idc
    r.ue()  # seq_parameter_set_id
    if sps.profile_idc in _HIGH_FAMILY:
        chroma_format_idc = r.ue()
        if chroma_format_idc != 1:
            raise ValueError(
                f"only 4:2:0 (chroma_format_idc=1) is supported, got {chroma_format_idc}"
            )
        if r.ue() or r.ue():  # bit depths
            raise ValueError("only 8-bit samples are supported")
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):
            raise ValueError("scaling matrices are not supported (I_PCM subset)")
    sps.log2_max_frame_num = r.ue() + 4
    sps.poc_type = r.ue()
    sps.log2_max_poc_lsb = 0
    if sps.poc_type == 0:
        sps.log2_max_poc_lsb = r.ue() + 4
    elif sps.poc_type == 1:
        raise ValueError("pic_order_cnt_type 1 is not supported (I_PCM subset)")
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    sps.width_mb = r.ue() + 1
    sps.height_mb = r.ue() + 1
    if r.u(1) != 1:  # frame_mbs_only_flag
        raise ValueError("interlaced (field-coded) streams are not supported")
    r.u(1)  # direct_8x8_inference_flag
    if r.u(1):  # frame_cropping_flag
        raise ValueError("frame cropping is not supported (encode full macroblocks)")
    return sps


def parse_pps(rbsp: bytes) -> _Pps:
    r = _BitReader(rbsp)
    r.ue()  # pic_parameter_set_id
    r.ue()  # seq_parameter_set_id
    if r.u(1):  # entropy_coding_mode_flag
        raise ValueError(
            "CABAC streams are not supported (I_PCM subset decodes CAVLC-mode slice data only)"
        )
    pps = _Pps()
    pps.bottom_field_poc_present = bool(r.u(1))
    if r.ue() != 0:  # num_slice_groups_minus1
        raise ValueError("slice groups (FMO) are not supported")
    return pps


def _decode_slice(
    rbsp: bytes, sps: _Sps, pps: _Pps, idr: bool, ref_idc: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = _BitReader(rbsp)
    if r.ue() != 0:  # first_mb_in_slice
        raise ValueError("multi-slice pictures are not supported (one slice per frame)")
    slice_type = r.ue()
    if slice_type not in _I_SLICE_TYPES:
        raise ValueError(
            f"only I slices are supported (I_PCM subset), got slice_type {slice_type}"
        )
    r.ue()  # pic_parameter_set_id
    r.u(sps.log2_max_frame_num)  # frame_num
    if idr:
        r.ue()  # idr_pic_id
    if sps.poc_type == 0:
        r.u(sps.log2_max_poc_lsb)  # pic_order_cnt_lsb
        if pps.bottom_field_poc_present:
            r.se()  # delta_pic_order_cnt_bottom (frame_mbs_only streams)
    if idr:
        r.u(1)  # dec_ref_pic_marking: no_output_of_prior_pics_flag
        r.u(1)  # dec_ref_pic_marking: long_term_reference_flag
    elif ref_idc != 0:
        # a non-IDR reference picture carries dec_ref_pic_marking; the
        # all-IDR encoder never emits this path, but a foreign I_PCM
        # stream may — one flag, mode 0 only.
        if r.u(1):
            raise ValueError("adaptive reference marking is not supported")
    r.se()  # slice_qp_delta
    width = sps.width_mb * 16
    height = sps.height_mb * 16
    y = np.empty((height, width), dtype=np.uint8)
    cb = np.empty((height // 2, width // 2), dtype=np.uint8)
    cr = np.empty((height // 2, width // 2), dtype=np.uint8)
    for my in range(sps.height_mb):
        for mx in range(sps.width_mb):
            mb_type = r.ue()
            if mb_type != _MB_TYPE_I_PCM:
                raise ValueError(
                    f"only I_PCM macroblocks (mb_type 25) are supported; mb_type "
                    f"{mb_type} needs intra prediction + residual decoding"
                )
            r.align()
            y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = np.frombuffer(
                r.read_bytes(256), dtype=np.uint8
            ).reshape(16, 16)
            cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = np.frombuffer(
                r.read_bytes(64), dtype=np.uint8
            ).reshape(8, 8)
            cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = np.frombuffer(
                r.read_bytes(64), dtype=np.uint8
            ).reshape(8, 8)
    if r.u(1) != 1:  # rbsp_stop_one_bit
        raise ValueError("missing rbsp_stop_one_bit after slice data")
    return y, cb, cr


def decode_h264(
    data: bytes,
) -> tuple[int, int, int, list[tuple[np.ndarray, np.ndarray, np.ndarray]]]:
    """Decode an Annex-B I_PCM stream: returns (width, height,
    profile_idc, frames) with frames as (y, cb, cr) uint8 planes.
    Raises ValueError (typed, with the offending construct named) for
    anything outside the I_PCM subset."""
    sps: _Sps | None = None
    pps: _Pps | None = None
    frames: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    for nal in split_annexb(data):
        header = nal[0]
        if header & 0x80:
            raise ValueError("forbidden_zero_bit set in NAL header")
        nal_type = header & 0x1F
        ref_idc = (header >> 5) & 0x3
        rbsp = ebsp_to_rbsp(nal[1:])
        if nal_type == NAL_SPS:
            sps = parse_sps(rbsp)
        elif nal_type == NAL_PPS:
            pps = parse_pps(rbsp)
        elif nal_type in (NAL_SLICE_NON_IDR, NAL_SLICE_IDR):
            if sps is None or pps is None:
                raise ValueError("slice NAL before SPS/PPS")
            frames.append(
                _decode_slice(
                    rbsp, sps, pps, idr=nal_type == NAL_SLICE_IDR, ref_idc=ref_idc
                )
            )
        # other NAL types (SEI, AUD, filler) are legal to skip
    if sps is None or not frames:
        raise ValueError("stream carries no decodable picture")
    return sps.width_mb * 16, sps.height_mb * 16, sps.profile_idc, frames
