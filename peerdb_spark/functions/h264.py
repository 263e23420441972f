"""From-scratch H.264/AVC (ITU-T H.264) Annex-B parsing + I_PCM decode.

What this gives the engine (all public-spec, no codec lib):

- **Annex-B structure walk** (`split_nals`, `split_h264_frames`): start-code
  scan, NAL headers, and picture-boundary detection (first_mb_in_slice == 0
  on a VCL NAL) — so frame COUNTING and strided frame SAMPLING over real
  H.264 elementary streams never touch macroblock payloads of skipped
  frames, the same scale posture as the MJPEG container walk
  (jpeg.split_mjpeg).
- **SPS/PPS parse** (`parse_sps`, `parse_pps`): exp-Golomb headers incl.
  the high-profile chroma/scaling branches and frame cropping — width,
  height, profile, entropy mode, for any conforming stream.
- **I_PCM picture decode** (`decode_h264`): pictures whose macroblocks are
  all I_PCM (mb_type 25 in I slices — raw uncompressed samples carried
  INSIDE a conforming H.264 stream, spec §7.3.5/§8.3.5) decode to pixels,
  bit-exact. Any decoder plays such streams; `encode_h264_ipcm` emits them
  (baseline profile, 4:2:0, IDR-only, emulation-prevention inserted), so
  encode→decode pins the full NAL/RBSP/slice/MB layering against itself
  and hand-checkable vectors.
- **CAVLC intra decode (round 10)**: I_16x16 and I_4x4 macroblocks with
  real entropy-coded residuals — intra prediction per §8.3 (all 9 4x4
  modes, 4 16x16 modes, 4 chroma modes), flat-scaling-list dequant +
  inverse core/Hadamard transforms per §8.5, CAVLC per §9.2
  (h264_cavlc.py — read its docstring for the honest verification
  posture: no independent decoder exists in this container, so the VLC
  table tails are pinned by a published worked example + structural
  checks, and the encoder refuses to emit unpinned entries).
  `encode_h264_cavlc` emits I_16x16 DC-predicted streams (I_PCM fallback
  per-MB outside the pinned token subset) whose decoder output equals
  the encoder reconstruction BIT-EXACTLY — the H.264 contract.
- **P-slice inter prediction (round 11)**: P_Skip and P_L0_16x16
  macroblocks with one reference picture — §8.4.2.2 quarter/eighth-sample
  luma/chroma interpolation, §8.4.1 motion-vector prediction and P_Skip
  MV derivation (h264_inter.py), CAVLC-coded inter residuals, and a GOP
  encoder (`encode_h264_gop`) whose decoder output equals the encoder
  reconstruction bit-exactly frame-by-frame.
- **B-slice bi-prediction (round 12)**: B_Skip / B_Direct_16x16 under
  SPATIAL direct mode (§8.4.1.2.2) and explicit B_L0/B_L1/B_Bi 16x16,
  one reference per list, default bipred averaging (§8.4.2.3.1),
  poc_type-0 slice headers with §8.2.1.1 POC derivation and decode→
  display reordering, non-reference B NALs (droppable without breaking
  any reference chain), and `encode_h264_gop(b_frames=k)` emitting
  IDR + P anchors + B pictures with the same bit-exact contract.
- **Honest gates that remain**: CABAC entropy (its context-initialization
  tables have no honestly-verifiable in-container source — see
  h264_cavlc.py's verification posture for why table provenance is
  load-bearing), temporal direct mode, inter partitions below 16x16
  (P/B 16x8, 8x16, 8x8), more than one reference per list / long-term
  references / list reordering, weighted prediction, 8x8 transforms,
  non-flat scaling lists, and the in-loop deblocking filter raise
  NotImplementedError — residual-coded streams decode only when their
  slices disable deblocking (our encoder always does); an enabled filter
  without the implementation would silently produce non-conformant
  pixels, so it rejects instead.

Reference parity: the reference (PeerDB) has NO video decode at all —
media payloads are opaque bytes (flow/model/qvalue, BYTEA passthrough).
This module exists for the LLM-data-pipeline surface (frame sampling /
dedup over video corpora), studied from the public spec, not ported.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "split_nals",
    "parse_sps",
    "parse_pps",
    "split_h264_frames",
    "decode_h264",
    "encode_h264_ipcm",
    "encode_h264_cavlc",
    "decode_h264_yuv",
]


# -- RBSP <-> EBSP ------------------------------------------------------------


def _strip_epb(ebsp: bytes) -> bytes:
    """Remove emulation-prevention bytes: 00 00 03 xx → 00 00 xx
    (spec §7.4.1.1; the 03 may only precede 00/01/02/03)."""
    if b"\x00\x00\x03" not in ebsp:
        return ebsp
    out = bytearray()
    i, n = 0, len(ebsp)
    while i < n:
        if i + 2 < n and ebsp[i] == 0 and ebsp[i + 1] == 0 and ebsp[i + 2] == 3:
            out += b"\x00\x00"
            i += 3
        else:
            out.append(ebsp[i])
            i += 1
    return bytes(out)


def _insert_epb(rbsp: bytes) -> bytes:
    """Insert emulation-prevention bytes so no 00 00 0x pattern survives."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b <= 3:
            out.append(3)
            zeros = 0
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


# -- bit I/O ------------------------------------------------------------------


class _BitReader:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0  # bit position

    def u(self, n: int) -> int:
        v = 0
        p = self.pos
        if p + n > 8 * len(self.buf):
            raise ValueError("bitstream exhausted")
        for _ in range(n):
            v = (v << 1) | ((self.buf[p >> 3] >> (7 - (p & 7))) & 1)
            p += 1
        self.pos = p
        return v

    def ue(self) -> int:
        """Exp-Golomb ue(v) (spec §9.1)."""
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("malformed exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) >> 1 if k & 1 else -(k >> 1)

    def byte_align_zero(self) -> None:
        """Consume pcm_alignment_zero_bit padding; spec says the bits
        SHALL be zero — a nonzero pad means a desynced parse."""
        while self.pos & 7:
            if self.u(1):
                raise ValueError("nonzero PCM alignment bit")

    def read_bytes(self, n: int) -> bytes:
        if self.pos & 7:
            raise ValueError("byte read while not aligned")
        start = self.pos >> 3
        if start + n > len(self.buf):
            raise ValueError("bitstream exhausted")
        self.pos += 8 * n
        return self.buf[start : start + n]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def u(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.n += n
        while self.n >= 8:
            self.out.append((self.acc >> (self.n - 8)) & 0xFF)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def ue(self, v: int) -> None:
        k = v + 1
        nb = k.bit_length()
        self.u(0, nb - 1)
        self.u(k, nb)

    def se(self, v: int) -> None:
        self.ue(2 * v - 1 if v > 0 else -2 * v)

    def align_zero(self) -> None:
        if self.n:
            self.u(0, 8 - self.n)

    def put_bytes(self, b: bytes) -> None:
        if self.n:
            raise ValueError("byte write while not aligned")
        self.out += b

    def rbsp_trailing(self) -> bytes:
        self.u(1, 1)
        if self.n:
            self.u(0, 8 - self.n)
        return bytes(self.out)


# -- NAL walk -----------------------------------------------------------------


def split_nals(data: bytes) -> list[tuple[int, int, int]]:
    """Annex-B byte stream → [(nal_type, payload_start, payload_end)].
    payload_start points at the NAL header byte; start codes are 000001
    with any number of leading zeros (00000001 included)."""
    out = []
    n = len(data)
    i = data.find(b"\x00\x00\x01")
    if i < 0:
        return out
    while i >= 0 and i + 3 < n:
        start = i + 3
        nxt = data.find(b"\x00\x00\x01", start)
        end = nxt if nxt >= 0 else n
        # trim the trailing zeros that belong to the NEXT start code
        while end > start and data[end - 1] == 0:
            end -= 1
        hdr = data[start]
        if hdr & 0x80:
            raise ValueError("forbidden_zero_bit set in NAL header")
        out.append((hdr & 0x1F, start, end))
        i = nxt
    return out


def _scaling_list(r: _BitReader, size: int) -> None:
    """Skip a scaling list (spec §7.3.2.1.1.1) — values parsed, discarded."""
    last, nxt = 8, 8
    for _ in range(size):
        if nxt:
            nxt = (last + r.se()) & 0xFF
        if nxt:
            last = nxt


def parse_sps(rbsp: bytes) -> dict:
    """Sequence parameter set → the fields the walk/decode needs
    (spec §7.3.2.1.1). `rbsp` excludes the NAL header byte."""
    r = _BitReader(rbsp)
    profile = r.u(8)
    r.u(8)  # constraint flags + reserved
    level = r.u(8)
    sps_id = r.ue()
    chroma_format_idc = 1
    separate_colour = 0
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135):
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            separate_colour = r.u(1)
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass_flag
        if r.u(1):  # seq_scaling_matrix_present_flag
            for i in range(8 if chroma_format_idc != 3 else 12):
                if r.u(1):
                    _scaling_list(r, 16 if i < 6 else 64)
    log2_max_frame_num = r.ue() + 4
    poc_type = r.ue()
    log2_max_poc_lsb = 0
    delta_pic_order_always_zero = 0
    if poc_type == 0:
        log2_max_poc_lsb = r.ue() + 4
    elif poc_type == 1:
        delta_pic_order_always_zero = r.u(1)
        r.se()  # offset_for_non_ref_pic
        r.se()  # offset_for_top_to_bottom_field
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed_flag
    w_mbs = r.ue() + 1
    h_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field_flag
    r.u(1)  # direct_8x8_inference_flag
    width = 16 * w_mbs
    height = 16 * h_units * (2 - frame_mbs_only)
    if r.u(1):  # frame_cropping_flag
        cl, cr, ct, cb = r.ue(), r.ue(), r.ue(), r.ue()
        # crop units (spec table 6-1 derivation): 4:2:0 → 2, 4:2:2 → 2/1,
        # 4:4:4 or monochrome → 1; vertical doubles for field coding
        ux = 1 if chroma_format_idc in (0, 3) else 2
        uy = (1 if chroma_format_idc in (0, 3) else 2 if chroma_format_idc == 1 else 1) * (
            2 - frame_mbs_only)
        width -= ux * (cl + cr)
        height -= uy * (ct + cb)
    return {
        "sps_id": sps_id,
        "profile": profile,
        "level": level,
        "chroma_format_idc": chroma_format_idc,
        "separate_colour": separate_colour,
        "log2_max_frame_num": log2_max_frame_num,
        "poc_type": poc_type,
        "log2_max_poc_lsb": log2_max_poc_lsb,
        "delta_pic_order_always_zero": delta_pic_order_always_zero,
        "frame_mbs_only": frame_mbs_only,
        "width_mbs": w_mbs,
        "height_mbs": h_units * (2 - frame_mbs_only),
        "width": width,
        "height": height,
    }


def _last_one_bit(buf: bytes) -> int:
    """Bit index of the FINAL set bit — the rbsp_stop_one_bit (-1: none)."""
    for i in range(len(buf) - 1, -1, -1):
        if buf[i]:
            low = (buf[i] & -buf[i]).bit_length() - 1
            return 8 * i + (7 - low)
    return -1


def _more_rbsp(r: "_BitReader", rbsp: bytes) -> bool:
    """Spec §7.2 more_rbsp_data(): data remains before the stop bit."""
    return r.pos < _last_one_bit(rbsp)


def parse_pps(rbsp: bytes) -> dict:
    """Picture parameter set → the fields slice parsing needs
    (spec §7.3.2.2; the tail past what we consume is ignored)."""
    r = _BitReader(rbsp)
    pps_id = r.ue()
    sps_id = r.ue()
    entropy_coding_mode = r.u(1)
    bottom_field_poc = r.u(1)
    num_slice_groups = r.ue() + 1
    if num_slice_groups > 1:
        raise NotImplementedError("FMO slice groups not supported")
    num_ref_l0_default = r.ue() + 1  # num_ref_idx_l0_default_active_minus1
    num_ref_l1_default = r.ue() + 1  # num_ref_idx_l1_default_active_minus1
    weighted_pred = r.u(1)  # weighted_pred_flag
    weighted_bipred = r.u(2)  # weighted_bipred_idc
    pic_init_qp = 26 + r.se()
    r.se()  # pic_init_qs_minus26
    chroma_qp_offset = r.se()
    deblock_present = r.u(1)
    r.u(1)  # constrained_intra_pred_flag
    redundant_present = r.u(1)
    # optional High-profile tail: transform_8x8 / scaling matrices /
    # second chroma offset (spec: present iff more_rbsp_data)
    transform_8x8 = 0
    if _more_rbsp(r, rbsp):
        transform_8x8 = r.u(1)
        if r.u(1):  # pic_scaling_matrix_present_flag
            raise NotImplementedError(
                "PPS scaling matrices (non-flat lists) not supported")
        r.se()  # second_chroma_qp_index_offset
    return {
        "pps_id": pps_id,
        "sps_id": sps_id,
        "entropy_coding_mode": entropy_coding_mode,
        "bottom_field_poc": bottom_field_poc,
        "deblock_present": deblock_present,
        "redundant_present": redundant_present,
        "pic_init_qp": pic_init_qp,
        "chroma_qp_offset": chroma_qp_offset,
        "transform_8x8": transform_8x8,
        "num_ref_l0_default": num_ref_l0_default,
        "num_ref_l1_default": num_ref_l1_default,
        "weighted_pred": weighted_pred,
        "weighted_bipred": weighted_bipred,
    }


def split_h264_frames(data: bytes) -> list[tuple[int, int, bool]]:
    """Annex-B stream → [(start, end, is_idr)] byte ranges, one per coded
    picture. A picture starts at a VCL NAL (type 1/5) whose
    first_mb_in_slice is 0 (spec §7.4.1.2.4 boundary rule for the
    single-PPS streams this walks); its range reaches back to include any
    immediately-preceding non-VCL NALs (SPS/PPS/SEI/AUD) so every range is
    independently meaningful. Only the first exp-Golomb code of each VCL
    NAL is parsed — skipped frames' macroblock payloads are never read."""
    nals = split_nals(data)
    frames: list[tuple[int, int, bool]] = []
    pending_start = None  # earliest non-VCL NAL start since last picture
    cur_start = None
    cur_idr = False
    for nal_type, s, e in nals:
        # the range boundary is the start code, not the header byte
        sc = s - 3
        if sc > 0 and data[sc - 1] == 0:
            sc -= 1  # 4-byte start code
        if nal_type in (1, 5):
            first_mb = _BitReader(_strip_epb(data[s + 1 : min(e, s + 9)])).ue()
            if first_mb == 0:  # new picture
                if cur_start is not None:
                    frames.append(
                        (cur_start,
                         pending_start if pending_start is not None else sc,
                         cur_idr))
                cur_start = pending_start if pending_start is not None else sc
                cur_idr = nal_type == 5
                pending_start = None
        else:
            if pending_start is None:
                pending_start = sc
    if cur_start is not None:
        frames.append((cur_start, len(data), cur_idr))
    return frames


# -- I_PCM decode --------------------------------------------------------------

_I_PCM_MB_TYPE = 25  # table 7-11, I slices


def _parse_slice_header(r: _BitReader, sps: dict, pps: dict, idr: bool,
                        ref_idc: int = 1) -> dict:
    first_mb = r.ue()
    slice_type = r.ue()
    r.ue()  # pic_parameter_set_id (routed by caller)
    if sps["separate_colour"]:
        r.u(2)  # colour_plane_id
    r.u(sps["log2_max_frame_num"])  # frame_num
    if not sps["frame_mbs_only"]:
        if r.u(1):  # field_pic_flag
            raise NotImplementedError("field pictures not supported")
    if idr:
        r.ue()  # idr_pic_id
    poc_lsb = 0
    if sps["poc_type"] == 0:
        poc_lsb = r.u(sps["log2_max_poc_lsb"])
        if pps["bottom_field_poc"]:
            r.se()
    elif sps["poc_type"] == 1 and not sps["delta_pic_order_always_zero"]:
        r.se()
        if pps["bottom_field_poc"]:
            r.se()
    if pps["redundant_present"]:
        r.ue()  # redundant_pic_cnt
    is_p = slice_type % 5 == 0
    is_b = slice_type % 5 == 1
    if not is_p and not is_b and slice_type % 5 != 2:
        raise NotImplementedError(
            f"only I, P and B slices decode (got slice_type {slice_type})")
    direct_spatial = 1
    if is_b:
        direct_spatial = r.u(1)  # direct_spatial_mv_pred_flag
        if not direct_spatial:
            raise NotImplementedError(
                "temporal direct mode not supported (spatial direct only)")
    if is_p or is_b:
        # round 11/12: ONE active reference picture per list — no list
        # reordering, no weighted prediction
        n_ref0 = pps["num_ref_l0_default"]
        n_ref1 = pps["num_ref_l1_default"]
        if r.u(1):  # num_ref_idx_active_override_flag
            n_ref0 = r.ue() + 1
            if is_b:
                n_ref1 = r.ue() + 1
        if n_ref0 != 1 or (is_b and n_ref1 != 1):
            raise NotImplementedError(
                f"slices decode with exactly 1 reference picture per list "
                f"(num_ref_idx_active = {n_ref0}/{n_ref1})")
        if r.u(1):  # ref_pic_list_modification_flag_l0
            raise NotImplementedError("ref pic list modification")
        if is_b and r.u(1):  # ref_pic_list_modification_flag_l1
            raise NotImplementedError("ref pic list modification")
        if is_p and pps["weighted_pred"]:
            raise NotImplementedError("weighted prediction")
        if is_b and pps["weighted_bipred"]:
            raise NotImplementedError("weighted bi-prediction")
    # dec_ref_pic_marking is present only when nal_ref_idc != 0 (spec
    # §7.3.3) — non-reference slices carry none.
    if ref_idc:
        if idr:
            r.u(1)  # no_output_of_prior_pics_flag
            r.u(1)  # long_term_reference_flag
        else:
            if r.u(1):  # adaptive_ref_pic_marking_mode_flag
                raise NotImplementedError("adaptive ref pic marking")
    if pps["entropy_coding_mode"]:
        raise NotImplementedError("CABAC slices not supported (the intra "
                                  "path is CAVLC-mode only)")
    slice_qp_delta = r.se()
    deblock_idc = 0  # default: filter enabled
    if pps["deblock_present"]:
        deblock_idc = r.ue()
        if deblock_idc != 1:
            r.se()
            r.se()
    return {"first_mb": first_mb, "slice_type": slice_type,
            "slice_qp_delta": slice_qp_delta, "deblock_idc": deblock_idc,
            "poc_lsb": poc_lsb, "direct_spatial": direct_spatial}



# -- intra residual transforms (spec 8.5) -------------------------------------
# Flat scaling lists only (the PPS parser rejects non-flat): with weight 16
# the AC dequant collapses EXACTLY to c * V[qp%6][cls] << (qp//6) — the
# spec's two shift cases divide a 2^4-divisible value, so no rounding term
# survives (derivation in tests/test_h264_intra.py).

_V_DEQ = ((10, 16, 13), (11, 18, 14), (13, 20, 16), (14, 23, 18),
          (16, 25, 20), (18, 29, 23))
# raster idx → dequant class: (even,even)→0, (odd,odd)→1, else 2
_POS_CLS = tuple(0 if (i % 2 == 0 and j % 2 == 0) else 1 if (i % 2 and j % 2)
                 else 2 for i in range(4) for j in range(4))
# chroma QP mapping for qPi 30..51 (Table 8-15)
_CHROMA_QP = (29, 30, 31, 32, 32, 33, 34, 34, 35, 35, 36, 36, 37, 37, 37,
              38, 38, 38, 39, 39, 39, 39)
# forward quant multipliers (classic MF table; encoder-side only — any
# legal quantizer works, reconstruction uses the normative dequant)
_MF = ((13107, 5243, 8066), (11916, 4660, 7490), (10082, 4194, 6554),
       (9362, 3647, 5825), (8192, 3355, 5243), (7282, 2893, 4559))


def _chroma_qp(qp_y: int, offset: int) -> int:
    q = max(0, min(51, qp_y + offset))
    return q if q < 30 else _CHROMA_QP[q - 30]


def _zz_to_raster4(scan: list, start: int = 0) -> list:
    """Scan-order levels → 4x4 raster (start=1 for 15-coeff AC blocks)."""
    from peerdb_spark.functions.h264_cavlc import ZIGZAG4

    out = [0] * 16
    for k, v in enumerate(scan):
        out[ZIGZAG4[k + start]] = v
    return out


def _raster_to_zz4(raster: list, start: int = 0) -> list:
    from peerdb_spark.functions.h264_cavlc import ZIGZAG4

    return [raster[ZIGZAG4[k]] for k in range(start, 16)]


def _dequant4x4(raster: list, qp: int, skip_dc: bool = False) -> list:
    m, q6 = qp % 6, qp // 6
    return [raster[i] if (skip_dc and i == 0)
            else (raster[i] * _V_DEQ[m][_POS_CLS[i]]) << q6
            for i in range(16)]


def _itrans4x4(d: list) -> list:
    """Inverse core transform (8.5.12.2): rows, columns, (x+32)>>6."""
    g = list(d)
    for base in range(0, 16, 4):  # rows
        d0, d1, d2, d3 = g[base : base + 4]
        e0, e1 = d0 + d2, d0 - d2
        e2, e3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
        g[base : base + 4] = [e0 + e3, e1 + e2, e1 - e2, e0 - e3]
    for c in range(4):  # columns
        d0, d1, d2, d3 = g[c], g[c + 4], g[c + 8], g[c + 12]
        e0, e1 = d0 + d2, d0 - d2
        e2, e3 = (d1 >> 1) - d3, d1 + (d3 >> 1)
        g[c], g[c + 4], g[c + 8], g[c + 12] = (
            e0 + e3, e1 + e2, e1 - e2, e0 - e3)
    return [(x + 32) >> 6 for x in g]


def _hadamard4(c: list) -> list:
    """4x4 Hadamard (self-inverse up to scale; used raw in 8.5.10)."""
    g = list(c)
    for base in range(0, 16, 4):
        d0, d1, d2, d3 = g[base : base + 4]
        e0, e1, e2, e3 = d0 + d2, d0 - d2, d1 - d3, d1 + d3
        g[base : base + 4] = [e0 + e3, e1 + e2, e1 - e2, e0 - e3]
    for col in range(4):
        d0, d1, d2, d3 = g[col], g[col + 4], g[col + 8], g[col + 12]
        e0, e1, e2, e3 = d0 + d2, d0 - d2, d1 - d3, d1 + d3
        g[col], g[col + 4], g[col + 8], g[col + 12] = (
            e0 + e3, e1 + e2, e1 - e2, e0 - e3)
    return g


def _luma_dc_dequant(f: int, qp: int) -> int:
    """8.5.10 DC scaling AFTER the inverse Hadamard (LS = 16·V[m][0])."""
    m, q6 = qp % 6, qp // 6
    ls = 16 * _V_DEQ[m][0]
    if q6 >= 6:
        return (f * ls) << (q6 - 6)
    return (f * ls + (1 << (5 - q6))) >> (6 - q6)


def _chroma_dc_inverse(c00: int, c01: int, c10: int, c11: int,
                       qp_c: int) -> tuple[int, int, int, int]:
    """2x2 Hadamard + 8.5.11 scaling: ((f·LS) << qp/6) >> 5."""
    m, q6 = qp_c % 6, qp_c // 6
    ls = 16 * _V_DEQ[m][0]
    f = (c00 + c01 + c10 + c11, c00 - c01 + c10 - c11,
         c00 + c01 - c10 - c11, c00 - c01 - c10 + c11)
    return tuple(((x * ls) << q6) >> 5 for x in f)


def _ftrans4x4(x: "np.ndarray") -> "np.ndarray":
    """Forward core transform Cf = H·X·Hᵀ (encoder side)."""
    H = np.array([[1, 1, 1, 1], [2, 1, -1, -2], [1, -1, -1, 1],
                  [1, -2, 2, -1]], dtype=np.int64)
    return H @ x.astype(np.int64) @ H.T


def _fquant(c: int, qp: int, cls: int) -> int:
    q6 = qp // 6
    qbits = 15 + q6
    f = (1 << qbits) // 3  # intra rounding offset
    mag = (abs(int(c)) * _MF[qp % 6][cls] + f) >> qbits
    return -mag if c < 0 else mag


def _fquant_dc(c: int, qp: int, shift_extra: int = 1) -> int:
    q6 = qp // 6
    qbits = 15 + q6 + shift_extra
    f = (2 << (qbits - 1)) // 3
    mag = (abs(int(c)) * _MF[qp % 6][0] + f) >> qbits
    return -mag if c < 0 else mag


# -- intra prediction (spec 8.3) ----------------------------------------------


def _clip8(a):
    return max(0, min(255, a))


class _PicState:
    """Shared per-picture decode/encode state: planes, per-4x4 TotalCoeff
    (nC prediction), decoded flags, per-MB slice ids, I4x4 modes."""

    def __init__(self, wmb: int, hmb: int):
        self.wmb, self.hmb = wmb, hmb
        self.Y = np.zeros((hmb * 16, wmb * 16), dtype=np.int32)
        self.Cb = np.zeros((hmb * 8, wmb * 8), dtype=np.int32)
        self.Cr = np.zeros((hmb * 8, wmb * 8), dtype=np.int32)
        self.ncY = np.full((hmb * 4, wmb * 4), -1, dtype=np.int16)
        self.ncCb = np.full((hmb * 2, wmb * 2), -1, dtype=np.int16)
        self.ncCr = np.full((hmb * 2, wmb * 2), -1, dtype=np.int16)
        self.mb_slice = np.full((hmb, wmb), -1, dtype=np.int32)
        self.i4mode = np.full((hmb * 4, wmb * 4), -1, dtype=np.int8)
        # P-slice motion state (round 11): per-MB quarter-sample MV and
        # an is-inter flag (intra MBs inside P slices stay False).
        # For B slices (round 12) mv/inter double as LIST-0 motion and
        # mv1/used1 carry list-1 — a neighbour that predicted only from
        # the other list reads as "different reference" on this one.
        self.mv = np.zeros((hmb, wmb, 2), dtype=np.int32)
        self.inter = np.zeros((hmb, wmb), dtype=bool)
        self.mv1 = np.zeros((hmb, wmb, 2), dtype=np.int32)
        self.used1 = np.zeros((hmb, wmb), dtype=bool)

    # nC prediction (9.2.1): average of available left/top TotalCoeff
    def nc(self, arr, bx: int, by: int, sl: int, per_mb: int) -> int:
        nA = nB = None
        if bx > 0 and arr[by, bx - 1] >= 0 and self._same_slice(
                arr, bx - 1, by, sl, per_mb):
            nA = int(arr[by, bx - 1])
        if by > 0 and arr[by - 1, bx] >= 0 and self._same_slice(
                arr, bx, by - 1, sl, per_mb):
            nB = int(arr[by - 1, bx])
        if nA is not None and nB is not None:
            return (nA + nB + 1) >> 1
        if nA is not None:
            return nA
        if nB is not None:
            return nB
        return 0

    def _same_slice(self, arr, bx: int, by: int, sl: int, per_mb: int) -> bool:
        return self.mb_slice[by // per_mb, bx // per_mb] == sl

    def mb_avail(self, mx: int, my: int, sl: int) -> bool:
        return (0 <= mx < self.wmb and 0 <= my < self.hmb
                and self.mb_slice[my, mx] == sl)


def _pred_i4x4(st: _PicState, mode: int, x0: int, y0: int, sl: int,
               blk_decoded) -> "np.ndarray":
    """8.3.1: one 4x4 luma prediction. blk_decoded(bx,by) → sample group
    availability at 4x4 granularity incl. intra-MB decode order."""
    Y = st.Y
    bx, by = x0 // 4, y0 // 4
    have_top = by > 0 and blk_decoded(bx, by - 1)
    have_left = bx > 0 and blk_decoded(bx - 1, by)
    have_corner = bx > 0 and by > 0 and blk_decoded(bx - 1, by - 1)
    have_tr = by > 0 and blk_decoded(bx + 1, by - 1)
    top = [int(Y[y0 - 1, x0 + i]) for i in range(4)] if have_top else None
    left = [int(Y[y0 + i, x0 - 1]) for i in range(4)] if have_left else None
    corner = int(Y[y0 - 1, x0 - 1]) if have_corner else None
    if have_tr:
        tr = [int(Y[y0 - 1, x0 + 4 + i]) for i in range(4)]
    elif have_top:
        tr = [top[3]] * 4  # substitution (8.3.1.2)
    else:
        tr = None
    p = np.zeros((4, 4), dtype=np.int32)

    def t(x):  # p[x, -1] with top-right extension
        return top[x] if x < 4 else tr[x - 4]

    if mode == 0:  # vertical
        if top is None:
            raise ValueError("intra 4x4 vertical without top neighbours")
        for y in range(4):
            for x in range(4):
                p[y, x] = top[x]
    elif mode == 1:  # horizontal
        if left is None:
            raise ValueError("intra 4x4 horizontal without left neighbours")
        for y in range(4):
            for x in range(4):
                p[y, x] = left[y]
    elif mode == 2:  # DC
        if top is not None and left is not None:
            dc = (sum(top) + sum(left) + 4) >> 3
        elif top is not None:
            dc = (sum(top) + 2) >> 2
        elif left is not None:
            dc = (sum(left) + 2) >> 2
        else:
            dc = 128
        p[:, :] = dc
    elif mode == 3:  # diagonal down-left
        if top is None or tr is None:
            raise ValueError("intra 4x4 DDL without top neighbours")
        for y in range(4):
            for x in range(4):
                if x == 3 and y == 3:
                    p[y, x] = (t(6) + 3 * t(7) + 2) >> 2
                else:
                    p[y, x] = (t(x + y) + 2 * t(x + y + 1) + t(x + y + 2) + 2) >> 2
    elif mode == 4:  # diagonal down-right
        if top is None or left is None or corner is None:
            raise ValueError("intra 4x4 DDR without neighbours")
        for y in range(4):
            for x in range(4):
                if x > y:
                    p[y, x] = (t(x - y - 2) + 2 * t(x - y - 1) + t(x - y) + 2) >> 2
                elif x < y:
                    p[y, x] = (left[y - x - 2] + 2 * left[y - x - 1]
                               + left[y - x] + 2) >> 2
                else:
                    p[y, x] = (t(0) + 2 * corner + left[0] + 2) >> 2
    elif mode == 5:  # vertical-right
        if top is None or left is None or corner is None:
            raise ValueError("intra 4x4 VR without neighbours")
        ext = [corner] + top  # index shift: ext[i] = p[i-1, -1]
        for y in range(4):
            for x in range(4):
                z = 2 * x - y
                if z >= 0 and z % 2 == 0:
                    a = x - (y >> 1)
                    p[y, x] = (ext[a] + ext[a + 1] + 1) >> 1
                elif z >= 0:
                    a = x - (y >> 1)
                    p[y, x] = (ext[a - 1] + 2 * ext[a] + ext[a + 1] + 2) >> 2
                elif z == -1:
                    p[y, x] = (left[0] + 2 * corner + top[0] + 2) >> 2
                else:
                    p[y, x] = (left[y - 1] + 2 * left[y - 2]
                               + (left[y - 3] if y - 3 >= 0 else corner) + 2) >> 2
    elif mode == 6:  # horizontal-down
        if top is None or left is None or corner is None:
            raise ValueError("intra 4x4 HD without neighbours")
        extl = [corner] + left  # extl[i] = p[-1, i-1]
        for y in range(4):
            for x in range(4):
                z = 2 * y - x
                if z >= 0 and z % 2 == 0:
                    a = y - (x >> 1)
                    p[y, x] = (extl[a] + extl[a + 1] + 1) >> 1
                elif z >= 0:
                    a = y - (x >> 1)
                    p[y, x] = (extl[a - 1] + 2 * extl[a] + extl[a + 1] + 2) >> 2
                elif z == -1:
                    p[y, x] = (left[0] + 2 * corner + top[0] + 2) >> 2
                else:
                    p[y, x] = (t(x - 1) + 2 * t(x - 2)
                               + (t(x - 3) if x - 3 >= 0 else corner) + 2) >> 2
    elif mode == 7:  # vertical-left
        if top is None or tr is None:
            raise ValueError("intra 4x4 VL without top neighbours")
        for y in range(4):
            for x in range(4):
                a = x + (y >> 1)
                if y % 2 == 0:
                    p[y, x] = (t(a) + t(a + 1) + 1) >> 1
                else:
                    p[y, x] = (t(a) + 2 * t(a + 1) + t(a + 2) + 2) >> 2
    elif mode == 8:  # horizontal-up
        if left is None:
            raise ValueError("intra 4x4 HU without left neighbours")
        for y in range(4):
            for x in range(4):
                z = x + 2 * y
                if z % 2 == 0 and z < 6:
                    a = y + (x >> 1)
                    p[y, x] = (left[a] + left[a + 1] + 1) >> 1
                elif z < 5:
                    a = y + (x >> 1)
                    p[y, x] = (left[a] + 2 * left[a + 1] + left[a + 2] + 2) >> 2
                elif z == 5:
                    p[y, x] = (left[2] + 3 * left[3] + 2) >> 2
                else:
                    p[y, x] = left[3]
    else:
        raise ValueError(f"intra 4x4 prediction mode {mode} out of range")
    return p


def _pred_i16(st: _PicState, mode: int, mx: int, my: int, sl: int) -> "np.ndarray":
    """8.3.3: 16x16 luma prediction (V/H/DC/Plane)."""
    Y = st.Y
    x0, y0 = mx * 16, my * 16
    have_top = st.mb_avail(mx, my - 1, sl)
    have_left = st.mb_avail(mx - 1, my, sl)
    have_corner = st.mb_avail(mx - 1, my - 1, sl)
    p = np.zeros((16, 16), dtype=np.int32)
    if mode == 0:
        if not have_top:
            raise ValueError("I16x16 vertical without top MB")
        p[:, :] = Y[y0 - 1, x0 : x0 + 16]
    elif mode == 1:
        if not have_left:
            raise ValueError("I16x16 horizontal without left MB")
        p[:, :] = Y[y0 : y0 + 16, x0 - 1][:, None]
    elif mode == 2:
        if have_top and have_left:
            dc = (int(Y[y0 - 1, x0 : x0 + 16].sum())
                  + int(Y[y0 : y0 + 16, x0 - 1].sum()) + 16) >> 5
        elif have_top:
            dc = (int(Y[y0 - 1, x0 : x0 + 16].sum()) + 8) >> 4
        elif have_left:
            dc = (int(Y[y0 : y0 + 16, x0 - 1].sum()) + 8) >> 4
        else:
            dc = 128
        p[:, :] = dc
    elif mode == 3:
        if not (have_top and have_left and have_corner):
            raise ValueError("I16x16 plane without neighbours")
        top = [int(Y[y0 - 1, x0 + i]) for i in range(16)]
        left = [int(Y[y0 + i, x0 - 1]) for i in range(16)]
        corner = int(Y[y0 - 1, x0 - 1])
        tt = [corner] + top
        ll = [corner] + left
        H = sum((x + 1) * (tt[9 + x] - tt[7 - x]) for x in range(8))
        V = sum((y + 1) * (ll[9 + y] - ll[7 - y]) for y in range(8))
        a = 16 * (left[15] + top[15])
        b = (5 * H + 32) >> 6
        c = (5 * V + 32) >> 6
        for y in range(16):
            for x in range(16):
                p[y, x] = _clip8((a + b * (x - 7) + c * (y - 7) + 16) >> 5)
    else:
        raise ValueError(f"I16x16 prediction mode {mode} out of range")
    return p


def _pred_chroma(plane: "np.ndarray", st: _PicState, mode: int, mx: int,
                 my: int, sl: int) -> "np.ndarray":
    """8.3.4: 8x8 chroma prediction (DC/H/V/Plane; 4:2:0)."""
    x0, y0 = mx * 8, my * 8
    have_top = st.mb_avail(mx, my - 1, sl)
    have_left = st.mb_avail(mx - 1, my, sl)
    have_corner = st.mb_avail(mx - 1, my - 1, sl)
    p = np.zeros((8, 8), dtype=np.int32)
    if mode == 0:  # DC, per 4x4 quadrant
        for qy in (0, 4):
            for qx in (0, 4):
                top4 = ([int(plane[y0 - 1, x0 + qx + i]) for i in range(4)]
                        if have_top else None)
                left4 = ([int(plane[y0 + qy + i, x0 - 1]) for i in range(4)]
                         if have_left else None)
                corner_quad = (qx == 0 and qy == 0) or (qx == 4 and qy == 4)
                if corner_quad and top4 is not None and left4 is not None:
                    dc = (sum(top4) + sum(left4) + 4) >> 3
                elif qx == 4 and qy == 0:
                    if top4 is not None:
                        dc = (sum(top4) + 2) >> 2
                    elif left4 is not None:
                        dc = (sum(left4) + 2) >> 2
                    else:
                        dc = 128
                elif qx == 0 and qy == 4:
                    if left4 is not None:
                        dc = (sum(left4) + 2) >> 2
                    elif top4 is not None:
                        dc = (sum(top4) + 2) >> 2
                    else:
                        dc = 128
                elif top4 is not None:
                    dc = (sum(top4) + 2) >> 2
                elif left4 is not None:
                    dc = (sum(left4) + 2) >> 2
                else:
                    dc = 128
                p[qy : qy + 4, qx : qx + 4] = dc
    elif mode == 1:  # horizontal
        if not have_left:
            raise ValueError("chroma horizontal without left MB")
        p[:, :] = plane[y0 : y0 + 8, x0 - 1][:, None]
    elif mode == 2:  # vertical
        if not have_top:
            raise ValueError("chroma vertical without top MB")
        p[:, :] = plane[y0 - 1, x0 : x0 + 8]
    elif mode == 3:  # plane
        if not (have_top and have_left and have_corner):
            raise ValueError("chroma plane without neighbours")
        top = [int(plane[y0 - 1, x0 + i]) for i in range(8)]
        left = [int(plane[y0 + i, x0 - 1]) for i in range(8)]
        corner = int(plane[y0 - 1, x0 - 1])
        tt = [corner] + top
        ll = [corner] + left
        H = sum((x + 1) * (tt[5 + x] - tt[3 - x]) for x in range(4))
        V = sum((y + 1) * (ll[5 + y] - ll[3 - y]) for y in range(4))
        a = 16 * (left[7] + top[7])
        b = (17 * H + 16) >> 5
        c = (17 * V + 16) >> 5
        for y in range(8):
            for x in range(8):
                p[y, x] = _clip8((a + b * (x - 3) + c * (y - 3) + 16) >> 5)
    else:
        raise ValueError(f"chroma prediction mode {mode} out of range")
    return p


# Table 9-4, Intra_4x4 column: coded_block_pattern codeNum → cbp value
_CBP_INTRA = (47, 31, 15, 0, 23, 27, 29, 30, 7, 11, 13, 14, 39, 43, 45, 46,
              16, 3, 5, 10, 12, 19, 21, 26, 28, 35, 37, 42, 44, 1, 2, 4, 8,
              17, 18, 20, 24, 6, 9, 22, 25, 32, 33, 34, 36, 40, 38, 41)
# 4x4 luma block coding order n → (bx, by) offsets within the MB
_BLK4_ORDER = tuple((2 * ((n >> 2) & 1) + (n & 1), 2 * (n >> 3) + ((n >> 1) & 1))
                    for n in range(16))


def _decode_picture(
    vcl_payloads: list[tuple[bytes, bool, int]], sps: dict, pps: dict,
    ref: tuple | None = None,
    ref1: tuple | None = None,
    col: tuple | None = None,
    return_motion: bool = False,
):
    """Decode one coded picture's VCL NAL payloads (RBSP, idr flag,
    nal_ref_idc): I_PCM, I_16x16 and I_4x4 (I_NxN) macroblocks, CAVLC
    entropy (round 10 — see h264_cavlc.py for the verification posture),
    intra prediction per 8.3, flat-scaling-list dequant + inverse core /
    Hadamard transforms per 8.5 — plus, round 11, P slices (P_Skip +
    P_L0_16x16 + intra MBs) motion-compensated against `ref`, the
    previously decoded picture's (Y, Cb, Cr) planes (h264_inter.py:
    §8.4.2.2 quarter/eighth-sample interpolation, §8.4.1 MV prediction).
    4:2:0 8-bit. Streams whose slices leave the in-loop deblocking filter
    ENABLED and contain residual-coded or inter MBs are rejected
    (NotImplementedError) — decoding them without the filter would
    silently produce non-conformant pixels; all-I_PCM pictures are
    exempt (QP-0 thresholds disable filtering everywhere)."""
    from peerdb_spark.functions import h264_cavlc as CV

    if sps["chroma_format_idc"] != 1:
        raise NotImplementedError("intra decode supports 4:2:0 only")
    wmb, hmb = sps["width_mbs"], sps["height_mbs"]
    n_mbs = wmb * hmb
    st = _PicState(wmb, hmb)
    seen = 0
    for sl, (rbsp, idr, ref_idc) in enumerate(vcl_payloads):
        r = _BitReader(rbsp)
        hdr = _parse_slice_header(r, sps, pps, idr, ref_idc)
        is_p = hdr["slice_type"] % 5 == 0
        is_b = hdr["slice_type"] % 5 == 1
        if is_p and ref is None:
            raise ValueError("P slice without a prior decoded picture")
        if is_b and (ref is None or ref1 is None or col is None):
            raise ValueError(
                "B slice without both reference pictures (need a past and "
                "a future reference in display order)")
        if (is_p or is_b) and (hdr["first_mb"] != 0 or len(vcl_payloads) != 1):
            # MV prediction here treats picture == slice; multi-slice
            # inter pictures would need per-slice neighbour gating
            raise NotImplementedError(
                "multi-slice P/B pictures not supported")
        mb = hdr["first_mb"]
        if mb != seen:
            raise ValueError("slices out of order or overlapping")
        qp = pps["pic_init_qp"] + hdr["slice_qp_delta"]
        deblock_on = hdr["deblock_idc"] != 1

        def no_deblock():
            if deblock_on:
                raise NotImplementedError(
                    "in-loop deblocking not implemented: residual-coded"
                    " streams decode only with deblocking disabled"
                    " (disable_deblocking_filter_idc == 1)")

        stop = _last_one_bit(rbsp)
        while mb < n_mbs and r.pos < stop:
            if is_p or is_b:
                no_deblock()  # any inter MB can create a filtered edge
                skip_run = r.ue()
                if mb + skip_run > n_mbs:
                    raise ValueError("mb_skip_run past end of picture")
                for _ in range(skip_run):
                    my, mx = divmod(mb, wmb)
                    st.mb_slice[my, mx] = sl
                    if is_b:  # B_Skip: spatial direct, no residual
                        _decode_mb_bskip(st, ref, ref1, col, mx, my)
                    else:
                        _decode_mb_pskip(st, ref, mx, my)
                    mb += 1
                if mb >= n_mbs or r.pos >= stop:
                    break
            my, mx = divmod(mb, wmb)
            st.mb_slice[my, mx] = sl
            mb_type = r.ue()
            if is_p:
                if mb_type == 0:
                    qp = _decode_mb_p16(st, r, ref, mx, my, qp, pps, sl, CV)
                    mb += 1
                    continue
                if mb_type < 5:
                    raise NotImplementedError(
                        f"P macroblock partitions below 16x16 not supported"
                        f" (P mb_type {mb_type})")
                mb_type -= 5  # intra MB inside a P slice (spec 7.4.5)
            elif is_b:
                if mb_type <= 3:  # B_Direct_16x16 / B_L0 / B_L1 / B_Bi
                    qp = _decode_mb_b16(st, r, ref, ref1, col, mx, my,
                                        mb_type, qp, pps, sl, CV)
                    mb += 1
                    continue
                if mb_type < 23:
                    raise NotImplementedError(
                        f"B macroblock partitions below 16x16 not supported"
                        f" (B mb_type {mb_type})")
                mb_type -= 23  # intra MB inside a B slice (Table 7-14)
            if mb_type == _I_PCM_MB_TYPE:
                _decode_mb_ipcm(st, r, mx, my)
            elif 1 <= mb_type <= 24:
                no_deblock()
                qp = _decode_mb_i16(st, r, mx, my, mb_type - 1, qp, pps, sl, CV)
            elif mb_type == 0:
                no_deblock()
                if pps["transform_8x8"] and r.u(1):
                    raise NotImplementedError("8x8 transform not supported")
                qp = _decode_mb_i4(st, r, mx, my, qp, pps, sl, CV)
            else:
                raise ValueError(f"invalid I-slice mb_type {mb_type}")
            mb += 1
        seen = mb
    if seen != n_mbs:
        raise ValueError(f"picture covers {seen}/{n_mbs} macroblocks")
    planes = (st.Y.astype(np.uint8), st.Cb.astype(np.uint8),
              st.Cr.astype(np.uint8))
    if return_motion:
        return planes, (st.mv.copy(), st.inter.copy())
    return planes


def _inter_pred_mb(ref: tuple, mx: int, my: int, mv: tuple[int, int]):
    """Motion-compensated 16x16 luma + 8x8 chroma prediction blocks for
    one MB from the reference planes (int32 in, int32 out)."""
    from peerdb_spark.functions import h264_inter as HI

    ry, rcb, rcr = ref
    py = HI.interp_luma_block(ry, mx * 16, my * 16, mv[0], mv[1], 16, 16)
    pcb = HI.interp_chroma_block(rcb, mx * 8, my * 8, mv[0], mv[1], 8, 8)
    pcr = HI.interp_chroma_block(rcr, mx * 8, my * 8, mv[0], mv[1], 8, 8)
    return py, pcb, pcr


def _decode_mb_pskip(st: _PicState, ref: tuple, mx: int, my: int) -> None:
    """P_Skip: predicted motion, no residual, TotalCoeff 0 (§8.4.1.1)."""
    from peerdb_spark.functions import h264_inter as HI

    mv = HI.mv_skip(st.mv, st.inter, mx, my)
    py, pcb, pcr = _inter_pred_mb(ref, mx, my, mv)
    st.Y[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = py
    st.Cb[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = pcb
    st.Cr[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = pcr
    st.mv[my, mx] = mv
    st.inter[my, mx] = True
    st.ncY[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0
    st.ncCb[my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0
    st.ncCr[my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0


def _decode_mb_p16(st: _PicState, r: _BitReader, ref: tuple, mx: int,
                   my: int, qp: int, pps: dict, sl: int, CV) -> int:
    """P_L0_16x16: mvd over the §8.4.1.3 predictor, then the inter
    residual — 4x4 luma blocks per coded 8x8 group (full 16-coeff scans,
    no DC transform) and the shared chroma DC+AC layout. ref_idx_l0 is
    absent (one active reference)."""
    from peerdb_spark.functions import h264_inter as HI

    mvp = HI.mv_predict(st.mv, st.inter, mx, my)
    mv = (mvp[0] + r.se(), mvp[1] + r.se())
    py, pcb, pcr = _inter_pred_mb(ref, mx, my, mv)
    st.mv[my, mx] = mv
    st.inter[my, mx] = True
    return _decode_mb_inter_resid(st, r, (py, pcb, pcr), mx, my, qp, pps,
                                  sl, CV)


def _b_pred_mb(ref0: tuple, ref1: tuple, mx: int, my: int,
               use0: bool, mv0, use1: bool, mv1):
    """B prediction for one 16x16 unit: single-list motion compensation,
    or the §8.4.2.3.1 default bi-prediction (predL0 + predL1 + 1) >> 1
    (weighted_bipred_idc == 0 — the only mode accepted here)."""
    if use0 and use1:
        p0 = _inter_pred_mb(ref0, mx, my, mv0)
        p1 = _inter_pred_mb(ref1, mx, my, mv1)
        return tuple((a + b + 1) >> 1 for a, b in zip(p0, p1))
    if use0:
        return _inter_pred_mb(ref0, mx, my, mv0)
    return _inter_pred_mb(ref1, mx, my, mv1)


def _set_b_motion(st: _PicState, mx: int, my: int,
                  use0: bool, mv0, use1: bool, mv1) -> None:
    st.mv[my, mx] = mv0 if use0 else (0, 0)
    st.inter[my, mx] = use0
    st.mv1[my, mx] = mv1 if use1 else (0, 0)
    st.used1[my, mx] = use1


def _decode_mb_bskip(st: _PicState, ref0: tuple, ref1: tuple, col: tuple,
                     mx: int, my: int) -> None:
    """B_Skip: spatial direct motion (§8.4.1.2.2), no residual,
    TotalCoeff 0."""
    from peerdb_spark.functions import h264_inter as HI

    use0, mv0, use1, mv1 = HI.b_direct_spatial(
        st.mv, st.inter, st.mv1, st.used1, col[0], col[1], mx, my)
    py, pcb, pcr = _b_pred_mb(ref0, ref1, mx, my, use0, mv0, use1, mv1)
    st.Y[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = py
    st.Cb[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = pcb
    st.Cr[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = pcr
    _set_b_motion(st, mx, my, use0, mv0, use1, mv1)
    st.ncY[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 0
    st.ncCb[my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0
    st.ncCr[my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 0


def _decode_mb_b16(st: _PicState, r: _BitReader, ref0: tuple, ref1: tuple,
                   col: tuple, mx: int, my: int, btype: int, qp: int,
                   pps: dict, sl: int, CV) -> int:
    """B 16x16 macroblocks (Table 7-14 mb_type 0..3): B_Direct_16x16
    takes spatial-direct motion and decodes a residual; B_L0/B_L1/B_Bi
    read mvd(s) over the per-list §8.4.1.3 predictor (ref_idx absent —
    one active reference per list), l0 before l1 (§7.3.5.1)."""
    from peerdb_spark.functions import h264_inter as HI

    if btype == 0:  # B_Direct_16x16
        use0, mv0, use1, mv1 = HI.b_direct_spatial(
            st.mv, st.inter, st.mv1, st.used1, col[0], col[1], mx, my)
    else:
        use0 = btype in (1, 3)
        use1 = btype in (2, 3)
        mv0 = mv1 = (0, 0)
        if use0:
            p = HI.mv_predict_b(st.mv, st.inter, st.mv1, st.used1, 0, mx, my)
            mv0 = (p[0] + r.se(), p[1] + r.se())
        if use1:
            p = HI.mv_predict_b(st.mv, st.inter, st.mv1, st.used1, 1, mx, my)
            mv1 = (p[0] + r.se(), p[1] + r.se())
    preds = _b_pred_mb(ref0, ref1, mx, my, use0, mv0, use1, mv1)
    _set_b_motion(st, mx, my, use0, mv0, use1, mv1)
    return _decode_mb_inter_resid(st, r, preds, mx, my, qp, pps, sl, CV)


def _decode_mb_inter_resid(st: _PicState, r: _BitReader, preds: tuple,
                           mx: int, my: int, qp: int, pps: dict, sl: int,
                           CV) -> int:
    """Shared inter-MB residual decode (P_L0_16x16 and the B 16x16
    types): coded_block_pattern (Table 9-4 inter column), optional
    mb_qp_delta, 4x4 luma CAVLC blocks per coded 8x8 group, chroma
    DC+AC — added onto the caller's prediction planes."""
    from peerdb_spark.functions import h264_inter as HI

    py, pcb, pcr = preds
    cbp_code = r.ue()
    if cbp_code >= len(HI._CBP_INTER):
        raise ValueError("coded_block_pattern out of range")
    cbp = HI._CBP_INTER[cbp_code]
    cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
    if cbp_chroma > 2:
        raise ValueError("chroma coded_block_pattern out of range")
    if cbp:
        if pps["transform_8x8"] and cbp_luma and r.u(1):
            raise NotImplementedError("8x8 transform not supported")
        qp = (qp + r.se() + 52) % 52
    qp_c = _chroma_qp(qp, pps["chroma_qp_offset"])
    acs = [[0] * 16 for _ in range(16)]
    for n, (ox, oy) in enumerate(_BLK4_ORDER):
        bx, by = mx * 4 + ox, my * 4 + oy
        if cbp_luma & (1 << (n >> 2)):
            nc = st.nc(st.ncY, bx, by, sl, 4)
            scan = CV.decode_residual(r, nc, 16)
            acs[n] = scan
            st.ncY[by, bx] = sum(1 for v in scan if v)
        else:
            st.ncY[by, bx] = 0
    for n, (ox, oy) in enumerate(_BLK4_ORDER):
        x0, y0 = (mx * 4 + ox) * 4, (my * 4 + oy) * 4
        res = _itrans4x4(_dequant4x4(_zz_to_raster4(acs[n]), qp))
        for i in range(4):
            for j in range(4):
                st.Y[y0 + i, x0 + j] = _clip8(
                    int(py[y0 - my * 16 + i, x0 - mx * 16 + j])
                    + res[4 * i + j])
    _decode_chroma_residual(st, r, mx, my, cbp_chroma, qp_c, sl, CV,
                            pcb, pcr)
    return qp


def _decode_mb_ipcm(st: _PicState, r: _BitReader, mx: int, my: int) -> None:
    r.byte_align_zero()
    luma = np.frombuffer(r.read_bytes(256), dtype=np.uint8)
    cbcr = np.frombuffer(r.read_bytes(128), dtype=np.uint8)
    st.Y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = luma.reshape(16, 16)
    st.Cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = cbcr[:64].reshape(8, 8)
    st.Cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = cbcr[64:].reshape(8, 8)
    # nC neighbours of an I_PCM macroblock count as 16 (9.2.1)
    st.ncY[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = 16
    st.ncCb[my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 16
    st.ncCr[my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 16


def _decode_chroma_residual(st: _PicState, r: _BitReader, mx: int, my: int,
                            cbp_chroma: int, qp_c: int, sl: int, CV,
                            pred_cb: "np.ndarray", pred_cr: "np.ndarray"):
    """Parse + reconstruct both chroma components. Bitstream order per
    7.3.5.3.3: BOTH components' DC blocks first (Cb, Cr), then all AC
    blocks (Cb x4, Cr x4)."""
    comps = ((st.Cb, st.ncCb, pred_cb), (st.Cr, st.ncCr, pred_cr))
    dqs = []
    for _plane, _ncp, _pred in comps:
        dc_scan = ([0, 0, 0, 0] if cbp_chroma == 0
                   else CV.decode_residual(r, -1, 4))
        dqs.append(_chroma_dc_inverse(dc_scan[0], dc_scan[1], dc_scan[2],
                                      dc_scan[3], qp_c))
    all_acs = []
    for _plane, ncp, _pred in comps:
        acs = []
        for b in range(4):
            bx, by = mx * 2 + (b & 1), my * 2 + (b >> 1)
            if cbp_chroma == 2:
                nc = st.nc(ncp, bx, by, sl, 2)
                scan = CV.decode_residual(r, nc, 15)
                ncp[by, bx] = sum(1 for v in scan if v)
            else:
                scan = [0] * 15
                ncp[by, bx] = 0
            acs.append(scan)
        all_acs.append(acs)
    for (plane, _ncp, pred), dq, acs in zip(comps, dqs, all_acs):
        for b in range(4):
            raster = _zz_to_raster4(acs[b], start=1)
            raster = _dequant4x4(raster, qp_c, skip_dc=True)
            raster[0] = dq[b]
            res = _itrans4x4(raster)
            x0 = mx * 8 + (b & 1) * 4
            y0 = my * 8 + (b >> 1) * 4
            for i in range(4):
                for j in range(4):
                    plane[y0 + i, x0 + j] = _clip8(
                        int(pred[y0 - my * 8 + i, x0 - mx * 8 + j])
                        + res[4 * i + j])


def _decode_mb_i16(st: _PicState, r: _BitReader, mx: int, my: int,
                   code: int, qp: int, pps: dict, sl: int, CV) -> int:
    """I_16x16 macroblock: mb_type-1 encodes (pred, cbp_chroma, cbp_luma)."""
    pred_mode = code % 4
    cbp_chroma = (code // 4) % 3
    cbp_luma = 15 if code >= 12 else 0
    chroma_mode = r.ue()
    if chroma_mode > 3:
        raise ValueError("intra_chroma_pred_mode out of range")
    qp = (qp + r.se() + 52) % 52  # mb_qp_delta (always present for I16x16)
    qp_c = _chroma_qp(qp, pps["chroma_qp_offset"])
    # Intra16x16DCLevel: nC from luma block 0 neighbours
    nc = st.nc(st.ncY, mx * 4, my * 4, sl, 4)
    dc_scan = CV.decode_residual(r, nc, 16)
    dc_raster = _zz_to_raster4(dc_scan)
    had = _hadamard4(dc_raster)
    dc = [_luma_dc_dequant(v, qp) for v in had]
    # AC blocks in coding order
    acs = [[0] * 15 for _ in range(16)]
    for n, (ox, oy) in enumerate(_BLK4_ORDER):
        bx, by = mx * 4 + ox, my * 4 + oy
        if cbp_luma:
            nc = st.nc(st.ncY, bx, by, sl, 4)
            scan = CV.decode_residual(r, nc, 15)
            acs[n] = scan
            st.ncY[by, bx] = sum(1 for v in scan if v)
        else:
            st.ncY[by, bx] = 0
    pred = _pred_i16(st, pred_mode, mx, my, sl)
    for n, (ox, oy) in enumerate(_BLK4_ORDER):
        raster = _zz_to_raster4(acs[n], start=1)
        raster = _dequant4x4(raster, qp, skip_dc=True)
        # DC grid position: block (ox, oy) → hadamard cell (oy, ox)
        raster[0] = dc[4 * oy + ox]
        res = _itrans4x4(raster)
        for i in range(4):
            for j in range(4):
                y, x = oy * 4 + i, ox * 4 + j
                st.Y[my * 16 + y, mx * 16 + x] = _clip8(
                    int(pred[y, x]) + res[4 * i + j])
    pred_cb = _pred_chroma(st.Cb, st, chroma_mode, mx, my, sl)
    pred_cr = _pred_chroma(st.Cr, st, chroma_mode, mx, my, sl)
    _decode_chroma_residual(st, r, mx, my, cbp_chroma, qp_c, sl, CV,
                            pred_cb, pred_cr)
    return qp


def _decode_mb_i4(st: _PicState, r: _BitReader, mx: int, my: int, qp: int,
                  pps: dict, sl: int, CV) -> int:
    """I_NxN (4x4-transform) macroblock."""
    # prediction modes for the 16 blocks, with the min(left, top) predictor
    modes = [0] * 16

    def neigh_mode(bx: int, by: int) -> int:
        """Intra4x4PredMode of a neighbour block for the min(A,B)
        predictor: 2 (DC) when unavailable or the MB is not I_4x4.
        Neighbours INSIDE the current MB always precede in coding order
        (their i4mode is already set); outside, the block must belong to
        a decoded same-slice MB."""
        if bx < 0 or by < 0:
            return 2
        inside = (bx // 4 == mx) and (by // 4 == my)
        if not inside and not (st._same_slice(st.ncY, bx, by, sl, 4)
                               and st.ncY[by, bx] >= 0):
            return 2
        m = st.i4mode[by, bx]
        return int(m) if m >= 0 else 2

    for n, (ox, oy) in enumerate(_BLK4_ORDER):
        bx, by = mx * 4 + ox, my * 4 + oy
        predicted = min(neigh_mode(bx - 1, by), neigh_mode(bx, by - 1))
        if r.u(1):  # prev_intra4x4_pred_mode_flag
            mode = predicted
        else:
            rem = r.u(3)
            mode = rem if rem < predicted else rem + 1
        modes[n] = mode
        st.i4mode[by, bx] = mode
    chroma_mode = r.ue()
    if chroma_mode > 3:
        raise ValueError("intra_chroma_pred_mode out of range")
    cbp_code = r.ue()
    if cbp_code >= len(_CBP_INTRA):
        raise ValueError("coded_block_pattern out of range")
    cbp = _CBP_INTRA[cbp_code]
    cbp_luma, cbp_chroma = cbp & 15, cbp >> 4
    if cbp_chroma > 2:
        raise ValueError("chroma coded_block_pattern out of range")
    if cbp:
        qp = (qp + r.se() + 52) % 52
    qp_c = _chroma_qp(qp, pps["chroma_qp_offset"])
    # residuals come per 8x8 group in block coding order
    acs = [[0] * 16 for _ in range(16)]
    for n, (ox, oy) in enumerate(_BLK4_ORDER):
        bx, by = mx * 4 + ox, my * 4 + oy
        if cbp_luma & (1 << (n >> 2)):
            nc = st.nc(st.ncY, bx, by, sl, 4)
            scan = CV.decode_residual(r, nc, 16)
            acs[n] = scan
            st.ncY[by, bx] = sum(1 for v in scan if v)
        else:
            st.ncY[by, bx] = 0
    # reconstruct sequentially (prediction reads reconstructed neighbours)
    done = np.zeros((st.hmb * 4, st.wmb * 4), dtype=bool)
    done[st.ncY >= 0] = True
    for n, (ox, oy) in enumerate(_BLK4_ORDER):
        done[my * 4 + oy, mx * 4 + ox] = False  # this MB: not yet recon'd
    def blk_ok(bx, by):
        if not (0 <= bx < st.wmb * 4 and 0 <= by < st.hmb * 4):
            return False
        if not st._same_slice(st.ncY, bx, by, sl, 4):
            return False
        return bool(done[by, bx])
    for n, (ox, oy) in enumerate(_BLK4_ORDER):
        bx, by = mx * 4 + ox, my * 4 + oy
        x0, y0 = bx * 4, by * 4
        pred = _pred_i4x4(st, modes[n], x0, y0, sl, blk_ok)
        raster = _dequant4x4(_zz_to_raster4(acs[n]), qp)
        res = _itrans4x4(raster)
        for i in range(4):
            for j in range(4):
                st.Y[y0 + i, x0 + j] = _clip8(
                    int(pred[i, j]) + res[4 * i + j])
        done[by, bx] = True
    pred_cb = _pred_chroma(st.Cb, st, chroma_mode, mx, my, sl)
    pred_cr = _pred_chroma(st.Cr, st, chroma_mode, mx, my, sl)
    _decode_chroma_residual(st, r, mx, my, cbp_chroma, qp_c, sl, CV,
                            pred_cb, pred_cr)
    return qp


def _yuv_to_rgb(Y: np.ndarray, Cb: np.ndarray, Cr: np.ndarray,
                w: int, h: int) -> bytes:
    """Full-range BT.601 (the JFIF matrix, matching functions/jpeg.py) with
    nearest-neighbor chroma upsample; crop to (w, h)."""
    yv = Y[:h, :w].astype(np.float64)
    cb = np.repeat(np.repeat(Cb, 2, axis=0), 2, axis=1)[:h, :w] - 128.0
    cr = np.repeat(np.repeat(Cr, 2, axis=0), 2, axis=1)[:h, :w] - 128.0
    r = yv + 1.402 * cr
    g = yv - 0.344136 * cb - 0.714136 * cr
    b = yv + 1.772 * cb
    rgb = np.stack(
        [np.clip(np.round(x), 0, 255).astype(np.uint8) for x in (r, g, b)],
        axis=2)
    return rgb.tobytes()


def _decode_stream_ex(data: bytes):
    """Shared walk: yields (sps, (Y, Cb, Cr), poc, idr) per picture in
    decode order."""
    sps_by_id: dict[int, dict] = {}
    pps_by_id: dict[int, dict] = {}
    pictures: list[tuple[dict, list[tuple[bytes, bool]]]] = []
    for nal_type, s, e in split_nals(data):
        payload = _strip_epb(data[s + 1 : e])
        if nal_type == 7:
            sps = parse_sps(payload)
            sps_by_id[sps["sps_id"]] = sps
        elif nal_type == 8:
            pps = parse_pps(payload)
            if pps["sps_id"] not in sps_by_id:
                raise ValueError("PPS references unknown SPS")
            pps_by_id[pps["pps_id"]] = pps
        elif nal_type in (1, 5):
            # route to the picture: peek first_mb + pps id
            r = _BitReader(payload)
            first_mb = r.ue()
            r.ue()  # slice_type
            pps_id = r.ue()
            if pps_id not in pps_by_id:
                raise ValueError("slice references unknown PPS")
            if first_mb == 0 or not pictures:
                pictures.append((pps_by_id[pps_id], []))
            pictures[-1][1].append(
                (payload, nal_type == 5, (data[s] >> 5) & 3))
    # a stream with no NALs yields no frames; slices with missing
    # parameter sets were already rejected at routing above.
    #
    # Reference management (round 12, B slices): a sliding window of the
    # TWO most recent reference pictures (nal_ref_idc > 0) with their POC
    # and L0 motion fields. P slices reference the most recent reference
    # picture (the §8.2.4.2 default list for one active ref — round 11's
    # previous-picture rule, now skipping non-reference B pictures);
    # B slices build L0 = the reference with the largest POC below the
    # current picture and L1 = the smallest above it (the default B list
    # heads), and take colocated motion from RefPicList1[0]. POC follows
    # §8.2.1.1 for poc_type 0 (msb wrap from the previous REFERENCE
    # picture, reset at IDR); poc_type 2 streams use a decode-order
    # proxy (decode order == display order there by definition).
    refs: list[dict] = []
    prev_poc_msb = prev_poc_lsb = 0
    pic_idx = 0
    for pps, payloads in pictures:
        sps = sps_by_id[pps["sps_id"]]
        rbsp0, idr, ref_idc = payloads[0]
        hdr = _parse_slice_header(_BitReader(rbsp0), sps, pps, idr, ref_idc)
        if idr:
            refs = []
            prev_poc_msb = prev_poc_lsb = 0
        if sps["poc_type"] == 0:
            max_lsb = 1 << sps["log2_max_poc_lsb"]
            lsb = hdr["poc_lsb"]
            if lsb < prev_poc_lsb and prev_poc_lsb - lsb >= max_lsb // 2:
                poc_msb = prev_poc_msb + max_lsb
            elif lsb > prev_poc_lsb and lsb - prev_poc_lsb > max_lsb // 2:
                poc_msb = prev_poc_msb - max_lsb
            else:
                poc_msb = prev_poc_msb
            poc = poc_msb + lsb
            if ref_idc:
                prev_poc_msb, prev_poc_lsb = poc_msb, lsb
        else:
            poc = 2 * pic_idx
        is_b = hdr["slice_type"] % 5 == 1
        ref0 = ref1 = colpair = None
        if is_b:
            past = [e for e in refs if e["poc"] < poc]
            future = [e for e in refs if e["poc"] > poc]
            if not past or not future:
                raise ValueError(
                    "B picture needs decoded reference pictures on both "
                    "display-order sides")
            l0 = max(past, key=lambda e: e["poc"])
            l1 = min(future, key=lambda e: e["poc"])
            ref0, ref1 = l0["planes"], l1["planes"]
            colpair = (l1["mv"], l1["used"])
        elif refs:
            ref0 = refs[-1]["planes"]
        planes, (mv, used) = _decode_picture(
            payloads, sps, pps, ref=ref0, ref1=ref1, col=colpair,
            return_motion=True)
        if ref_idc:
            refs.append({
                "planes": tuple(p.astype(np.int32) for p in planes),
                "poc": poc, "mv": mv, "used": used,
            })
            refs = refs[-2:]
        pic_idx += 1
        yield sps, planes, poc, idr


def _decode_stream(data: bytes):
    """Shared walk: yields (sps, (Y, Cb, Cr)) per picture in DECODE
    order (use _decode_stream_display for output/display order)."""
    for sps, planes, _poc, _idr in _decode_stream_ex(data):
        yield sps, planes


def _decode_stream_display(data: bytes):
    """Yields (sps, planes) in DISPLAY order: pictures sort by POC within
    each IDR period (POC resets at IDR), periods stay in stream order.
    Identical to decode order for streams without B pictures."""
    group: list[tuple[int, dict, tuple]] = []
    for sps, planes, poc, idr in _decode_stream_ex(data):
        if idr and group:
            for _poc, s, p in sorted(group, key=lambda t: t[0]):
                yield s, p
            group = []
        group.append((poc, sps, planes))
    for _poc, s, p in sorted(group, key=lambda t: t[0]):
        yield s, p


def encode_h264_cavlc(frames_yuv, width: int, height: int, qp: int = 28,
                      return_recon: bool = False, mb_mode: str = "i16",
                      return_stats: bool = False, poc_bits: int = 0,
                      max_ref_frames: int = 1):
    """[(Y, Cb, Cr) uint8 planes] → a conforming Annex-B stream of IDR
    pictures with REAL entropy coding (round 10): I_16x16 DC-predicted
    macroblocks, CAVLC residuals, deblocking disabled per slice (the
    decoder's honest gate — no in-loop filter here). Lossy (quantised at
    `qp`); return_recon=True also returns the encoder's reconstruction,
    which decode_h264_yuv must reproduce BIT-EXACTLY — the H.264 contract
    that encoder reconstruction equals decoder output.

    Any macroblock whose residual CAVLC cannot represent (a level beyond
    the 12-bit escape range; since round 11's Table 9-5 tail completion
    there are no missing coeff_token entries — h264_cavlc docstring) is
    emitted as I_PCM instead, a safety net that no longer triggers on
    merely-busy blocks.

    mb_mode: "i16" (default, I_16x16 DC-predicted macroblocks with the
    Hadamard DC path), "i4" (I_NxN: 16 DC-predicted 4x4 blocks with
    full-block transforms — exercises the decoder's sequential
    intra-MB reconstruction and coded_block_pattern paths), or "mixed"
    (alternating per MB — exercises cross-type neighbour rules).

    return_stats=True appends a per-frame stats list of
    {"pcm_mbs": fallback count, "mbs": total} — pcm_mbs == 0 certifies
    the whole frame stayed entropy-coded (the r11 gate pins it)."""
    if mb_mode not in ("i16", "i4", "mixed"):
        raise ValueError(f"unknown mb_mode {mb_mode!r}")
    from peerdb_spark.functions import h264_cavlc as CV

    if width % 2 or height % 2 or width < 2 or height < 2:
        raise ValueError("H.264 4:2:0 dimensions must be positive and even")
    if not 0 <= qp <= 51:
        raise ValueError("qp out of range 0..51")
    wmb = -(-width // 16)
    hmb = -(-height // 16)
    crop_r = (16 * wmb - width) // 2
    crop_b = (16 * hmb - height) // 2

    sps = _BitWriter()
    sps.u(66, 8)
    sps.u(0, 8)
    sps.u(30, 8)
    sps.ue(0)
    sps.ue(0)
    if poc_bits:  # poc_type 0: slices carry pic_order_cnt_lsb (B GOPs)
        sps.ue(0)
        sps.ue(poc_bits - 4)
    else:
        sps.ue(2)  # poc_type 2: no POC bits in slices
    sps.ue(max_ref_frames)
    sps.u(0, 1)
    sps.ue(wmb - 1)
    sps.ue(hmb - 1)
    sps.u(1, 1)
    sps.u(1, 1)
    if crop_r or crop_b:
        sps.u(1, 1)
        sps.ue(0)
        sps.ue(crop_r)
        sps.ue(0)
        sps.ue(crop_b)
    else:
        sps.u(0, 1)
    sps.u(0, 1)
    out = bytearray(_nal(7, sps.rbsp_trailing()))

    pps = _BitWriter()
    pps.ue(0)
    pps.ue(0)
    pps.u(0, 1)    # CAVLC
    pps.u(0, 1)
    pps.ue(0)
    pps.ue(0)
    pps.ue(0)
    pps.u(0, 1)
    pps.u(0, 2)
    pps.se(qp - 26)  # pic_init_qp_minus26
    pps.se(0)
    pps.se(0)      # chroma_qp_index_offset
    pps.u(1, 1)    # deblocking_filter_control_present_flag
    pps.u(0, 1)
    pps.u(0, 1)
    out += _nal(8, pps.rbsp_trailing())

    qp_c = _chroma_qp(qp, 0)
    cw, ch = (width + 1) // 2, (height + 1) // 2
    recons = []
    stats = []
    for fi, (Y, Cb, Cr) in enumerate(frames_yuv):
        Y = np.asarray(Y, dtype=np.uint8)
        Cb = np.asarray(Cb, dtype=np.uint8)
        Cr = np.asarray(Cr, dtype=np.uint8)
        if Y.shape != (height, width) or Cb.shape != (ch, cw) or Cr.shape != (ch, cw):
            raise ValueError(
                f"frame {fi}: want Y {(height, width)}, chroma {(ch, cw)}; "
                f"got {Y.shape}, {Cb.shape}, {Cr.shape}")
        Yp = np.pad(Y, ((0, 16 * hmb - height), (0, 16 * wmb - width)),
                    mode="edge").astype(np.int32)
        Cbp = np.pad(Cb, ((0, 8 * hmb - ch), (0, 8 * wmb - cw)),
                     mode="edge").astype(np.int32)
        Crp = np.pad(Cr, ((0, 8 * hmb - ch), (0, 8 * wmb - cw)),
                     mode="edge").astype(np.int32)

        st = _PicState(wmb, hmb)
        w = _BitWriter()
        w.ue(0)        # first_mb_in_slice
        w.ue(7)        # slice_type I
        w.ue(0)        # pps_id
        w.u(0, 4)      # frame_num
        w.ue(fi & 0xFFFF)  # idr_pic_id
        if poc_bits:
            w.u((2 * fi) & ((1 << poc_bits) - 1), poc_bits)  # poc_lsb
        w.u(0, 1)
        w.u(0, 1)
        w.se(0)        # slice_qp_delta
        w.ue(1)        # disable_deblocking_filter_idc = 1 (filter OFF)
        pcm_mbs = 0
        for mb in range(wmb * hmb):
            my, mx = divmod(mb, wmb)
            st.mb_slice[my, mx] = 0
            use_i4 = mb_mode == "i4" or (mb_mode == "mixed" and mb % 2)
            enc = _encode_mb_i4 if use_i4 else _encode_mb_i16
            frag = enc(st, Yp, Cbp, Crp, mx, my, qp, qp_c, CV)
            if frag is None:  # CAVLC-unrepresentable level → I_PCM fallback
                pcm_mbs += 1
                w.ue(_I_PCM_MB_TYPE)
                w.align_zero()
                w.put_bytes(Yp[my * 16 : my * 16 + 16,
                               mx * 16 : mx * 16 + 16]
                            .astype(np.uint8).tobytes())
                w.put_bytes(Cbp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                            .astype(np.uint8).tobytes())
                w.put_bytes(Crp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                            .astype(np.uint8).tobytes())
                st.Y[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16] = \
                    Yp[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16]
                st.Cb[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = \
                    Cbp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                st.Cr[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] = \
                    Crp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                st.ncY[my * 4 : my * 4 + 4, mx * 4 : mx * 4 + 4] = 16
                st.ncCb[my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 16
                st.ncCr[my * 2 : my * 2 + 2, mx * 2 : mx * 2 + 2] = 16
            else:
                for bit in frag:
                    w.u(1 if bit == "1" else 0, 1)
        out += _nal(5, w.rbsp_trailing())
        stats.append({"pcm_mbs": pcm_mbs, "mbs": wmb * hmb})
        if return_recon:
            recons.append((st.Y.astype(np.uint8)[:height, :width],
                           st.Cb.astype(np.uint8)[:ch, :cw],
                           st.Cr.astype(np.uint8)[:ch, :cw]))
    parts = [bytes(out)]
    if return_recon:
        parts.append(recons)
    if return_stats:
        parts.append(stats)
    return tuple(parts) if len(parts) > 1 else parts[0]


def _encode_mb_i16(st: _PicState, Yp, Cbp, Crp, mx: int, my: int, qp: int,
                   qp_c: int, CV) -> str | None:
    """Encode one I_16x16 (DC-pred) macroblock → its bit fragment, and
    apply the DECODER-exact reconstruction + nC counts to `st`. None →
    some residual symbol is outside the pinned table subset; the caller
    re-emits the MB as I_PCM (st untouched)."""
    sl = 0
    pred = _pred_i16(st, 2, mx, my, sl)
    oy0, ox0 = my * 16, mx * 16
    diff = Yp[oy0 : oy0 + 16, ox0 : ox0 + 16] - pred
    dcs = [0] * 16
    ac_scan = [None] * 16  # by coding order n
    order_of = {v: n for n, v in enumerate(_BLK4_ORDER)}
    for oy in range(4):
        for ox in range(4):
            c = _ftrans4x4(diff[oy * 4 : oy * 4 + 4, ox * 4 : ox * 4 + 4])
            dcs[4 * oy + ox] = int(c[0, 0])
            raster = [0] * 16
            for i in range(4):
                for j in range(4):
                    if i == 0 and j == 0:
                        continue
                    raster[4 * i + j] = _fquant(
                        int(c[i, j]), qp, _POS_CLS[4 * i + j])
            ac_scan[order_of[(ox, oy)]] = _raster_to_zz4(raster, start=1)
    f = _hadamard4(dcs)
    # shift_extra=2: the inverse chain (Hadamard gain 16, 8.5.10 scaling)
    # reconstructs 1:1 with this choice — calibrated in test_h264_intra
    dc_levels = [_fquant_dc(v, qp, 2) for v in f]
    dc_scan = _raster_to_zz4(dc_levels, start=0)
    cbp_luma = 15 if any(any(s) for s in ac_scan) else 0

    # chroma (DC prediction, mode 0)
    pred_cb = _pred_chroma(st.Cb, st, 0, mx, my, sl)
    pred_cr = _pred_chroma(st.Cr, st, 0, mx, my, sl)
    ch_dc_levels = []
    ch_ac_scan = []
    for plane, cpred in ((Cbp, pred_cb), (Crp, pred_cr)):
        d = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] - cpred
        cdc = [0] * 4
        acs = []
        for b in range(4):
            qy, qx = (b >> 1) * 4, (b & 1) * 4
            c = _ftrans4x4(d[qy : qy + 4, qx : qx + 4])
            cdc[b] = int(c[0, 0])
            raster = [0] * 16
            for i in range(4):
                for j in range(4):
                    if i == 0 and j == 0:
                        continue
                    raster[4 * i + j] = _fquant(
                        int(c[i, j]), qp_c, _POS_CLS[4 * i + j])
            acs.append(_raster_to_zz4(raster, start=1))
        fdc = (cdc[0] + cdc[1] + cdc[2] + cdc[3],
               cdc[0] - cdc[1] + cdc[2] - cdc[3],
               cdc[0] + cdc[1] - cdc[2] - cdc[3],
               cdc[0] - cdc[1] - cdc[2] + cdc[3])
        ch_dc_levels.append([_fquant_dc(v, qp_c) for v in fdc])
        ch_ac_scan.append(acs)
    any_ch_ac = any(any(s) for acs in ch_ac_scan for s in acs)
    any_ch_dc = any(any(lv) for lv in ch_dc_levels)
    cbp_chroma = 2 if any_ch_ac else (1 if any_ch_dc else 0)

    # bits (mirrors the decoder's parse order exactly)
    wf = _BitWriter()
    mb_type = 1 + 2 + 4 * cbp_chroma + (12 if cbp_luma else 0)
    wf.ue(mb_type)
    wf.ue(0)   # intra_chroma_pred_mode: DC
    wf.se(0)   # mb_qp_delta
    prefix_bits = []
    acc = wf.out[:]
    # flush wf into a bitstring
    head = "".join(format(b, "08b") for b in wf.out)
    if wf.n:
        head += format(wf.acc & ((1 << wf.n) - 1), f"0{wf.n}b")
    bits = [head]
    overlayY: dict = {}
    overlayCb: dict = {}
    overlayCr: dict = {}

    def nc_of(arr, overlay, bx, by, per_mb):
        if (bx, by) in overlay or (bx, by - 1) in overlay \
                or (bx - 1, by) in overlay:
            nA = nB = None
            if bx > 0:
                v = overlay.get((bx - 1, by))
                if v is None and arr[by, bx - 1] >= 0 and \
                        st._same_slice(arr, bx - 1, by, sl, per_mb):
                    v = int(arr[by, bx - 1])
                nA = v
            if by > 0:
                v = overlay.get((bx, by - 1))
                if v is None and arr[by - 1, bx] >= 0 and \
                        st._same_slice(arr, bx, by - 1, sl, per_mb):
                    v = int(arr[by - 1, bx])
                nB = v
            if nA is not None and nB is not None:
                return (nA + nB + 1) >> 1
            if nA is not None:
                return nA
            if nB is not None:
                return nB
            return 0
        return st.nc(arr, bx, by, sl, per_mb)

    b = CV.encode_residual(dc_scan, nc_of(st.ncY, overlayY, mx * 4, my * 4, 4))
    if b is None:
        return None
    bits.append(b)
    for n, (ox, oy) in enumerate(_BLK4_ORDER):
        bx, by = mx * 4 + ox, my * 4 + oy
        if cbp_luma:
            b = CV.encode_residual(ac_scan[n],
                                   nc_of(st.ncY, overlayY, bx, by, 4))
            if b is None:
                return None
            bits.append(b)
            overlayY[(bx, by)] = sum(1 for v in ac_scan[n] if v)
        else:
            overlayY[(bx, by)] = 0
    if cbp_chroma:
        for lv in ch_dc_levels:
            b = CV.encode_residual(_raster_to_zz_cdc(lv), -1)
            if b is None:
                return None
            bits.append(b)
    for comp, (arr, overlay) in enumerate(((st.ncCb, overlayCb),
                                           (st.ncCr, overlayCr))):
        for bnum in range(4):
            bx, by = mx * 2 + (bnum & 1), my * 2 + (bnum >> 1)
            if cbp_chroma == 2:
                b = CV.encode_residual(ch_ac_scan[comp][bnum],
                                       nc_of(arr, overlay, bx, by, 2))
                if b is None:
                    return None
                bits.append(b)
                overlay[(bx, by)] = sum(1 for v in ch_ac_scan[comp][bnum] if v)
            else:
                overlay[(bx, by)] = 0

    # success: reconstruct EXACTLY as the decoder will and commit state
    had = _hadamard4(dc_levels)
    dc = [_luma_dc_dequant(v, qp) for v in had]
    for n, (ox, oy) in enumerate(_BLK4_ORDER):
        raster = _zz_to_raster4(ac_scan[n], start=1)
        raster = _dequant4x4(raster, qp, skip_dc=True)
        raster[0] = dc[4 * oy + ox]
        res = _itrans4x4(raster)
        for i in range(4):
            for j in range(4):
                y, x = oy * 4 + i, ox * 4 + j
                st.Y[oy0 + y, ox0 + x] = _clip8(int(pred[y, x]) + res[4 * i + j])
    for comp, (plane, cpred) in enumerate(((st.Cb, pred_cb), (st.Cr, pred_cr))):
        lv = ch_dc_levels[comp]
        dq = _chroma_dc_inverse(lv[0], lv[1], lv[2], lv[3], qp_c)
        for bnum in range(4):
            raster = _zz_to_raster4(ch_ac_scan[comp][bnum], start=1)
            raster = _dequant4x4(raster, qp_c, skip_dc=True)
            raster[0] = dq[bnum]
            res = _itrans4x4(raster)
            x0 = mx * 8 + (bnum & 1) * 4
            y0 = my * 8 + (bnum >> 1) * 4
            for i in range(4):
                for j in range(4):
                    plane[y0 + i, x0 + j] = _clip8(
                        int(cpred[y0 - my * 8 + i, x0 - mx * 8 + j])
                        + res[4 * i + j])
    for (bx, by), v in overlayY.items():
        st.ncY[by, bx] = v
    for (bx, by), v in overlayCb.items():
        st.ncCb[by, bx] = v
    for (bx, by), v in overlayCr.items():
        st.ncCr[by, bx] = v
    return "".join(bits)


def _encode_mb_i4(st: _PicState, Yp, Cbp, Crp, mx: int, my: int, qp: int,
                  qp_c: int, CV) -> str | None:
    """Encode one I_NxN macroblock, all 16 blocks DC-predicted (mode 2),
    reconstructing each 4x4 before the next predicts from it — the same
    sequential order the decoder uses. Returns the bit fragment and
    commits decoder-exact state, or None (unpinned CAVLC symbol → the
    caller falls back to I_PCM; st untouched until success, so luma
    reconstruction is staged in a scratch overlay)."""
    sl = 0
    oy0, ox0 = my * 16, mx * 16
    # stage luma recon in a copy: prediction inside the MB reads it,
    # but st must stay untouched if a later symbol refuses to encode
    y_stage = st.Y.copy()
    done = np.zeros((st.hmb * 4, st.wmb * 4), dtype=bool)
    done[st.ncY >= 0] = True
    for ox, oy in _BLK4_ORDER:
        done[my * 4 + oy, mx * 4 + ox] = False

    def blk_ok(bx, by):
        if not (0 <= bx < st.wmb * 4 and 0 <= by < st.hmb * 4):
            return False
        if not st._same_slice(st.ncY, bx, by, sl, 4):
            return False
        return bool(done[by, bx])

    stY_real = st.Y
    st.Y = y_stage  # _pred_i4x4 reads st.Y; point it at the stage
    try:
        ac_scan = [None] * 16
        for n, (ox, oy) in enumerate(_BLK4_ORDER):
            bx, by = mx * 4 + ox, my * 4 + oy
            x0, y0 = bx * 4, by * 4
            pred = _pred_i4x4(st, 2, x0, y0, sl, blk_ok)
            diff = Yp[y0 : y0 + 4, x0 : x0 + 4] - pred
            c = _ftrans4x4(diff)
            raster = [
                _fquant(int(c[i // 4, i % 4]), qp, _POS_CLS[i])
                for i in range(16)
            ]
            ac_scan[n] = _raster_to_zz4(raster, start=0)
            # reconstruct exactly as the decoder will
            res = _itrans4x4(_dequant4x4(raster, qp))
            for i in range(4):
                for j in range(4):
                    y_stage[y0 + i, x0 + j] = _clip8(
                        int(pred[i, j]) + res[4 * i + j])
            done[by, bx] = True
    finally:
        st.Y = stY_real
    # cbp: an 8x8 group is coded iff any of its four blocks is nonzero
    groups = [any(any(ac_scan[g * 4 + k]) for k in range(4))
              for g in range(4)]
    cbp_luma = sum(1 << g for g, on in enumerate(groups) if on)

    pred_cb = _pred_chroma(st.Cb, st, 0, mx, my, sl)
    pred_cr = _pred_chroma(st.Cr, st, 0, mx, my, sl)
    ch_dc_levels = []
    ch_ac_scan = []
    for plane, cpred in ((Cbp, pred_cb), (Crp, pred_cr)):
        d = plane[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8] - cpred
        cdc = [0] * 4
        acs = []
        for b in range(4):
            qy, qx = (b >> 1) * 4, (b & 1) * 4
            c = _ftrans4x4(d[qy : qy + 4, qx : qx + 4])
            cdc[b] = int(c[0, 0])
            raster = [0] * 16
            for i in range(4):
                for j in range(4):
                    if i == 0 and j == 0:
                        continue
                    raster[4 * i + j] = _fquant(
                        int(c[i, j]), qp_c, _POS_CLS[4 * i + j])
            acs.append(_raster_to_zz4(raster, start=1))
        fdc = (cdc[0] + cdc[1] + cdc[2] + cdc[3],
               cdc[0] - cdc[1] + cdc[2] - cdc[3],
               cdc[0] + cdc[1] - cdc[2] - cdc[3],
               cdc[0] - cdc[1] - cdc[2] + cdc[3])
        ch_dc_levels.append([_fquant_dc(v, qp_c) for v in fdc])
        ch_ac_scan.append(acs)
    any_ch_ac = any(any(s) for acs in ch_ac_scan for s in acs)
    any_ch_dc = any(any(lv) for lv in ch_dc_levels)
    cbp_chroma = 2 if any_ch_ac else (1 if any_ch_dc else 0)
    cbp = cbp_luma | (cbp_chroma << 4)

    wf = _BitWriter()
    wf.ue(0)  # mb_type I_NxN
    for _ in range(16):
        wf.u(1, 1)  # prev_intra4x4_pred_mode_flag: predicted (DC) — all
        # neighbours are DC or unavailable, so min(A,B) == 2 throughout
    wf.ue(0)  # intra_chroma_pred_mode: DC
    wf.ue(_CBP_INTRA.index(cbp))
    if cbp:
        wf.se(0)  # mb_qp_delta
    head = "".join(format(b, "08b") for b in wf.out)
    if wf.n:
        head += format(wf.acc & ((1 << wf.n) - 1), f"0{wf.n}b")
    bits = [head]

    overlayY: dict = {}
    overlayCb: dict = {}
    overlayCr: dict = {}

    def nc_of(arr, overlay, bx, by, per_mb):
        nA = nB = None
        if bx > 0:
            v = overlay.get((bx - 1, by))
            if v is None and arr[by, bx - 1] >= 0 and \
                    st._same_slice(arr, bx - 1, by, sl, per_mb):
                v = int(arr[by, bx - 1])
            nA = v
        if by > 0:
            v = overlay.get((bx, by - 1))
            if v is None and arr[by - 1, bx] >= 0 and \
                    st._same_slice(arr, bx, by - 1, sl, per_mb):
                v = int(arr[by - 1, bx])
            nB = v
        if nA is not None and nB is not None:
            return (nA + nB + 1) >> 1
        if nA is not None:
            return nA
        if nB is not None:
            return nB
        return 0

    for n, (ox, oy) in enumerate(_BLK4_ORDER):
        bx, by = mx * 4 + ox, my * 4 + oy
        if cbp_luma & (1 << (n >> 2)):
            b = CV.encode_residual(ac_scan[n],
                                   nc_of(st.ncY, overlayY, bx, by, 4))
            if b is None:
                return None
            bits.append(b)
            overlayY[(bx, by)] = sum(1 for v in ac_scan[n] if v)
        else:
            overlayY[(bx, by)] = 0
    if cbp_chroma:
        for lv in ch_dc_levels:
            b = CV.encode_residual(list(lv), -1)
            if b is None:
                return None
            bits.append(b)
    for comp, (arr, overlay) in enumerate(((st.ncCb, overlayCb),
                                           (st.ncCr, overlayCr))):
        for bnum in range(4):
            bx, by = mx * 2 + (bnum & 1), my * 2 + (bnum >> 1)
            if cbp_chroma == 2:
                b = CV.encode_residual(ch_ac_scan[comp][bnum],
                                       nc_of(arr, overlay, bx, by, 2))
                if b is None:
                    return None
                bits.append(b)
                overlay[(bx, by)] = sum(
                    1 for v in ch_ac_scan[comp][bnum] if v)
            else:
                overlay[(bx, by)] = 0

    # success: commit luma stage, chroma recon, counts and modes
    st.Y[oy0 : oy0 + 16, ox0 : ox0 + 16] = \
        y_stage[oy0 : oy0 + 16, ox0 : ox0 + 16]
    for comp, (plane, cpred) in enumerate(((st.Cb, pred_cb),
                                           (st.Cr, pred_cr))):
        lv = ch_dc_levels[comp]
        dq = _chroma_dc_inverse(lv[0], lv[1], lv[2], lv[3], qp_c)
        for bnum in range(4):
            raster = _zz_to_raster4(ch_ac_scan[comp][bnum], start=1)
            raster = _dequant4x4(raster, qp_c, skip_dc=True)
            raster[0] = dq[bnum]
            res = _itrans4x4(raster)
            x0 = mx * 8 + (bnum & 1) * 4
            y0 = my * 8 + (bnum >> 1) * 4
            for i in range(4):
                for j in range(4):
                    plane[y0 + i, x0 + j] = _clip8(
                        int(cpred[y0 - my * 8 + i, x0 - mx * 8 + j])
                        + res[4 * i + j])
    for (bx, by), v in overlayY.items():
        st.ncY[by, bx] = v
        st.i4mode[by, bx] = 2
    for (bx, by), v in overlayCb.items():
        st.ncCb[by, bx] = v
    for (bx, by), v in overlayCr.items():
        st.ncCr[by, bx] = v
    return "".join(bits)


def _raster_to_zz_cdc(levels4: list) -> list:
    """2x2 chroma DC blocks are scanned in RASTER order (no zigzag)."""
    return list(levels4)


def decode_h264_yuv(data: bytes):
    """Annex-B I_PCM stream → list of (width, height, Y, Cb, Cr) with
    planes CROPPED to the display size — the bit-exact contract
    `encode_h264_ipcm` roundtrips against."""
    out = []
    for sps, (Y, Cb, Cr) in _decode_stream_display(data):
        w, h = sps["width"], sps["height"]
        out.append((w, h, Y[:h, :w], Cb[: (h + 1) // 2, : (w + 1) // 2],
                    Cr[: (h + 1) // 2, : (w + 1) // 2]))
    return out


def decode_h264(data: bytes) -> list[tuple[int, int, bytes]]:
    """Annex-B I_PCM stream → [(width, height, RGB888 bytes)] per picture.
    Raises ValueError on corruption, NotImplementedError on entropy-coded
    macroblocks / non-I slices (the genuine codec-library gate)."""
    try:
        return [
            (sps["width"], sps["height"],
             _yuv_to_rgb(Y, Cb, Cr, sps["width"], sps["height"]))
            for sps, (Y, Cb, Cr) in _decode_stream_display(data)
        ]
    except (IndexError, struct.error) as e:
        raise ValueError(f"corrupt H.264 stream ({type(e).__name__})") from e


# -- P-frame (GOP) encoder (round 11) -----------------------------------------


def _commit_b_mb(st: _PicState, enc: tuple, mx: int, my: int,
                 use0: bool, mv0, use1: bool, mv1) -> None:
    cbp_, bits_, (ry, rcb, rcr), (oy, ocb, ocr) = enc
    st.Y[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = ry
    st.Cb[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = rcb
    st.Cr[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = rcr
    for (bx, by), v in oy.items():
        st.ncY[by, bx] = v
    for (bx, by), v in ocb.items():
        st.ncCb[by, bx] = v
    for (bx, by), v in ocr.items():
        st.ncCr[by, bx] = v
    _set_b_motion(st, mx, my, use0, mv0, use1, mv1)


def _encode_b_picture(w, Yp, Cbp, Crp, ref0e: dict, ref1e: dict, qp: int,
                      qp_c: int, search: int, subpel: bool, CV, HI,
                      cbp_index, wmb: int, hmb: int):
    """Encode one B picture's macroblock layer into writer `w` (header
    written by the caller): per MB, full-search (+optional subpel) motion
    against EACH reference list, then the cheapest of {spatial direct,
    B_L0_16x16, B_L1_16x16, B_Bi_16x16} by luma SAD — direct with a
    zero-quantized residual becomes B_Skip (mb_skip_run), direct with a
    residual becomes B_Direct_16x16 (mb_type 0, no mvd bits). I_PCM
    fallback (mb_type 23+25) for CAVLC-unrepresentable levels. Returns
    (st, counts) with counts = (skip, direct, l0, l1, bi, pcm)."""
    st = _PicState(wmb, hmb)
    st.mb_slice[:, :] = 0
    ref0, ref1 = ref0e["planes"], ref1e["planes"]
    col = (ref1e["mv"], ref1e["used"])
    src_of = lambda: None  # noqa: E731 — placeholder removed below
    skip_run = 0
    n_skip = n_direct = n_l0 = n_l1 = n_bi = n_pcm = 0
    for mb in range(wmb * hmb):
        my, mx = divmod(mb, wmb)
        src = Yp[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16]
        mv0 = _search_mv(Yp, ref0[0], mx, my, search)
        mv1 = _search_mv(Yp, ref1[0], mx, my, search)
        if subpel:
            mv0 = _refine_mv_subpel(Yp, ref0[0], mx, my, mv0)
            mv1 = _refine_mv_subpel(Yp, ref1[0], mx, my, mv1)
        u0d, mv0d, u1d, mv1d = HI.b_direct_spatial(
            st.mv, st.inter, st.mv1, st.used1, col[0], col[1], mx, my)

        def luma_pred(use0, m0, use1, m1):
            if use0 and use1:
                p0 = HI.interp_luma_block(ref0[0], mx * 16, my * 16,
                                          m0[0], m0[1], 16, 16)
                p1 = HI.interp_luma_block(ref1[0], mx * 16, my * 16,
                                          m1[0], m1[1], 16, 16)
                return (p0 + p1 + 1) >> 1
            r_, m_ = (ref0, m0) if use0 else (ref1, m1)
            return HI.interp_luma_block(r_[0], mx * 16, my * 16,
                                        m_[0], m_[1], 16, 16)

        # candidate order = tie-break preference: direct costs no mvd,
        # single-list costs one mvd pair, bi costs two
        cands = [
            ("direct", u0d, mv0d, u1d, mv1d),
            ("l0", True, mv0, False, (0, 0)),
            ("l1", False, (0, 0), True, mv1),
            ("bi", True, mv0, True, mv1),
        ]
        best = None
        for kind, a0, m0, a1, m1 in cands:
            sad = int(np.abs(src - luma_pred(a0, m0, a1, m1)).sum())
            if best is None or sad < best[0]:
                best = (sad, kind, a0, m0, a1, m1)
        _sad, kind, a0, m0, a1, m1 = best
        # direct first: a zero-residual direct MB is B_Skip (~0 bits)
        preds_d = _b_pred_mb(ref0, ref1, mx, my, u0d, mv0d, u1d, mv1d)
        enc_d = _encode_mb_inter_resid(st, preds_d, Yp, Cbp, Crp, mx, my,
                                       qp, qp_c, CV)
        if enc_d is not None and enc_d[0] == 0:
            _commit_b_mb(st, enc_d, mx, my, u0d, mv0d, u1d, mv1d)
            skip_run += 1
            n_skip += 1
            continue
        if kind == "direct":
            enc = enc_d
        else:
            preds = _b_pred_mb(ref0, ref1, mx, my, a0, m0, a1, m1)
            enc = _encode_mb_inter_resid(st, preds, Yp, Cbp, Crp, mx, my,
                                         qp, qp_c, CV)
        if enc is None:  # CAVLC-unrepresentable -> I_PCM (Table 7-14)
            w.ue(skip_run)
            skip_run = 0
            n_pcm += 1
            w.ue(_I_PCM_MB_TYPE + 23)
            w.align_zero()
            w.put_bytes(Yp[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16]
                        .astype(np.uint8).tobytes())
            w.put_bytes(Cbp[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                        .astype(np.uint8).tobytes())
            w.put_bytes(Crp[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                        .astype(np.uint8).tobytes())
            st.Y[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = \
                Yp[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16]
            st.Cb[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = \
                Cbp[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
            st.Cr[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = \
                Crp[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
            st.ncY[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 16
            st.ncCb[my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 16
            st.ncCr[my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 16
            continue
        w.ue(skip_run)
        skip_run = 0
        cbp = enc[0]
        if kind == "direct":
            n_direct += 1
            w.ue(0)  # B_Direct_16x16: no mvd
        else:
            # mvp per list BEFORE committing this MB's motion
            if kind == "l0":
                n_l0 += 1
                w.ue(1)
            elif kind == "l1":
                n_l1 += 1
                w.ue(2)
            else:
                n_bi += 1
                w.ue(3)
            if a0:
                p = HI.mv_predict_b(st.mv, st.inter, st.mv1, st.used1,
                                    0, mx, my)
                w.se(m0[0] - p[0])
                w.se(m0[1] - p[1])
            if a1:
                p = HI.mv_predict_b(st.mv, st.inter, st.mv1, st.used1,
                                    1, mx, my)
                w.se(m1[0] - p[0])
                w.se(m1[1] - p[1])
        w.ue(cbp_index[cbp])
        if cbp:
            w.se(0)  # mb_qp_delta
        for bit in enc[1]:
            w.u(1 if bit == "1" else 0, 1)
        if kind == "direct":
            _commit_b_mb(st, enc, mx, my, u0d, mv0d, u1d, mv1d)
        else:
            _commit_b_mb(st, enc, mx, my, a0, m0, a1, m1)
    if skip_run:
        w.ue(skip_run)
    return st, (n_skip, n_direct, n_l0, n_l1, n_bi, n_pcm)


def _encode_gop_b(frames_yuv, width: int, height: int, qp: int,
                  search: int, return_recon: bool, return_stats: bool,
                  subpel: bool, b_frames: int):
    """IDR + P anchors + non-reference B pictures (encode_h264_gop's
    b_frames > 0 path): anchors every (b_frames + 1) display positions
    (plus the final frame), B pictures between them referencing BOTH
    surrounding anchors. SPS poc_type 0 (slices carry pic_order_cnt_lsb,
    poc = 2 x display index) so the decoder reorders decode -> display;
    B NALs are nal_ref_idc 0 — droppable without breaking any reference
    chain, temporal scalability in its simplest form."""
    from peerdb_spark.functions import h264_cavlc as CV
    from peerdb_spark.functions import h264_inter as HI

    if len(frames_yuv) < 1:
        raise ValueError("GOP needs at least one frame")
    POC_BITS = 8
    head = encode_h264_cavlc(frames_yuv[:1], width, height, qp=qp,
                             return_recon=True, mb_mode="i16",
                             return_stats=True, poc_bits=POC_BITS,
                             max_ref_frames=2)
    stream = bytearray(head[0])
    n = len(frames_yuv)
    recons: list = [None] * n
    stats: list = [None] * n
    recons[0] = head[1][0]
    stats[0] = dict(head[2][0], skip_mbs=0, inter_mbs=0, subpel_mbs=0,
                    intra_mbs=head[2][0]["mbs"], kind="I", poc=0)
    (_sps, ref_planes), = list(_decode_stream(bytes(stream)))

    wmb, hmb = -(-width // 16), -(-height // 16)
    qp_c = _chroma_qp(qp, 0)
    cw, ch = (width + 1) // 2, (height + 1) // 2
    cbp_index = {v: i for i, v in enumerate(HI._CBP_INTER)}

    def padded(fi):
        Y = np.asarray(frames_yuv[fi][0], dtype=np.uint8)
        Cb = np.asarray(frames_yuv[fi][1], dtype=np.uint8)
        Cr = np.asarray(frames_yuv[fi][2], dtype=np.uint8)
        if Y.shape != (height, width) or Cb.shape != (ch, cw) \
                or Cr.shape != (ch, cw):
            raise ValueError(f"frame {fi}: plane shape mismatch")
        return (
            np.pad(Y, ((0, 16 * hmb - height), (0, 16 * wmb - width)),
                   mode="edge").astype(np.int32),
            np.pad(Cb, ((0, 8 * hmb - ch), (0, 8 * wmb - cw)),
                   mode="edge").astype(np.int32),
            np.pad(Cr, ((0, 8 * hmb - ch), (0, 8 * wmb - cw)),
                   mode="edge").astype(np.int32),
        )

    g = b_frames + 1
    anchors = list(range(0, n, g))
    if anchors[-1] != n - 1:
        anchors.append(n - 1)
    prev = {"planes": tuple(p.astype(np.int32) for p in ref_planes),
            "mv": np.zeros((hmb, wmb, 2), dtype=np.int32),
            "used": np.zeros((hmb, wmb), dtype=bool), "disp": 0}
    ref_count = 1  # reference pictures emitted (frame_num source)
    for d in anchors[1:]:
        Yp, Cbp, Crp = padded(d)
        w = _BitWriter()
        w.ue(0)                      # first_mb_in_slice
        w.ue(5)                      # slice_type P
        w.ue(0)                      # pps_id
        w.u(ref_count & 15, 4)       # frame_num
        w.u((2 * d) & ((1 << POC_BITS) - 1), POC_BITS)  # pic_order_cnt_lsb
        w.u(0, 1)                    # num_ref_idx_active_override_flag
        w.u(0, 1)                    # ref_pic_list_modification_flag_l0
        w.u(0, 1)                    # adaptive_ref_pic_marking_mode_flag
        w.se(0)                      # slice_qp_delta
        w.ue(1)                      # disable_deblocking_filter_idc
        st, (n_skip, n_inter, n_pcm, n_subpel) = _encode_p_picture(
            w, Yp, Cbp, Crp, prev["planes"], qp, qp_c, search, subpel,
            CV, HI, cbp_index, wmb, hmb)
        stream += _nal(1, w.rbsp_trailing(), ref_idc=2)
        stats[d] = {"pcm_mbs": n_pcm, "skip_mbs": n_skip,
                    "inter_mbs": n_inter, "intra_mbs": n_pcm,
                    "subpel_mbs": n_subpel, "mbs": wmb * hmb,
                    "kind": "P", "poc": 2 * d}
        recons[d] = (st.Y.astype(np.uint8)[:height, :width],
                     st.Cb.astype(np.uint8)[:ch, :cw],
                     st.Cr.astype(np.uint8)[:ch, :cw])
        cur = {"planes": (st.Y.copy(), st.Cb.copy(), st.Cr.copy()),
               "mv": st.mv.copy(), "used": st.inter.copy(), "disp": d}
        ref_count += 1
        for bd in range(prev["disp"] + 1, d):
            Yb, Cbb, Crb = padded(bd)
            w = _BitWriter()
            w.ue(0)                  # first_mb_in_slice
            w.ue(6)                  # slice_type B
            w.ue(0)                  # pps_id
            w.u(ref_count & 15, 4)   # frame_num (non-ref: prev ref + 1)
            w.u((2 * bd) & ((1 << POC_BITS) - 1), POC_BITS)
            w.u(1, 1)                # direct_spatial_mv_pred_flag
            w.u(0, 1)                # num_ref_idx_active_override_flag
            w.u(0, 1)                # ref_pic_list_modification_flag_l0
            w.u(0, 1)                # ref_pic_list_modification_flag_l1
            # nal_ref_idc 0 -> no dec_ref_pic_marking
            w.se(0)                  # slice_qp_delta
            w.ue(1)                  # disable_deblocking_filter_idc
            stb, (b_skip, b_dir, b_l0, b_l1, b_bi, b_pcm) = \
                _encode_b_picture(w, Yb, Cbb, Crb, prev, cur, qp, qp_c,
                                  search, subpel, CV, HI, cbp_index,
                                  wmb, hmb)
            stream += _nal(1, w.rbsp_trailing(), ref_idc=0)
            stats[bd] = {"pcm_mbs": b_pcm, "skip_mbs": b_skip,
                         "inter_mbs": b_dir + b_l0 + b_l1 + b_bi,
                         "intra_mbs": b_pcm, "subpel_mbs": 0,
                         "mbs": wmb * hmb, "kind": "B", "poc": 2 * bd,
                         "direct_mbs": b_dir, "l0_mbs": b_l0,
                         "l1_mbs": b_l1, "bi_mbs": b_bi}
            recons[bd] = (stb.Y.astype(np.uint8)[:height, :width],
                          stb.Cb.astype(np.uint8)[:ch, :cw],
                          stb.Cr.astype(np.uint8)[:ch, :cw])
        prev = cur
    parts = [bytes(stream)]
    if return_recon:
        parts.append(recons)
    if return_stats:
        parts.append(stats)
    return tuple(parts) if len(parts) > 1 else parts[0]


def _encode_p_picture(w, Yp, Cbp, Crp, ref, qp: int, qp_c: int,
                      search: int, subpel: bool, CV, HI, cbp_index,
                      wmb: int, hmb: int):
    """Encode one P picture's macroblock layer into writer `w` (slice
    header already written by the caller): P_Skip / P_L0_16x16 with
    full-search (+optional subpel) motion against `ref`, per-MB I_PCM
    fallback. Returns (st, counts) where counts = (skip, inter, pcm,
    subpel)."""
    st = _PicState(wmb, hmb)
    st.mb_slice[:, :] = 0
    skip_run = 0
    n_skip = n_inter = n_pcm = n_subpel = 0
    for mb in range(wmb * hmb):
        my, mx = divmod(mb, wmb)
        mv = _search_mv(Yp, ref[0], mx, my, search)
        if subpel:
            mv = _refine_mv_subpel(Yp, ref[0], mx, my, mv)
        skipmv = HI.mv_skip(st.mv, st.inter, mx, my)
        # prefer the skip MV when it predicts as well as the searched
        # one — a skipped MB costs ~0 bits
        enc = _encode_mb_p16(st, ref, Yp, Cbp, Crp, mx, my, skipmv,
                             qp, qp_c, CV, HI, cbp_index)
        if enc is not None and enc[0] == 0:
            # zero residual at the skip MV → P_Skip
            _commit_p_mb(st, enc, mx, my, skipmv)
            skip_run += 1
            n_skip += 1
            if (skipmv[0] & 3) or (skipmv[1] & 3):
                n_subpel += 1  # fractional FINAL motion (inherited)
            continue
        enc2 = (_encode_mb_p16(st, ref, Yp, Cbp, Crp, mx, my, mv,
                               qp, qp_c, CV, HI, cbp_index)
                if mv != skipmv else enc)
        if enc2 is None:  # CAVLC-unrepresentable → I_PCM (mb_type 30)
            w.ue(skip_run)
            skip_run = 0
            n_pcm += 1
            w.ue(_I_PCM_MB_TYPE + 5)
            w.align_zero()
            w.put_bytes(Yp[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16]
                        .astype(np.uint8).tobytes())
            w.put_bytes(Cbp[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                        .astype(np.uint8).tobytes())
            w.put_bytes(Crp[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
                        .astype(np.uint8).tobytes())
            st.Y[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = \
                Yp[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16]
            st.Cb[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = \
                Cbp[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
            st.Cr[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = \
                Crp[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8]
            st.ncY[my * 4:my * 4 + 4, mx * 4:mx * 4 + 4] = 16
            st.ncCb[my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 16
            st.ncCr[my * 2:my * 2 + 2, mx * 2:mx * 2 + 2] = 16
            continue
        use_mv = skipmv if enc2 is enc else mv
        cbp, mvd_unused, bits = enc2[0], enc2[1], enc2[2]
        mvp = HI.mv_predict(st.mv, st.inter, mx, my)
        w.ue(skip_run)
        skip_run = 0
        n_inter += 1
        if (use_mv[0] & 3) or (use_mv[1] & 3):
            n_subpel += 1  # fractional FINAL motion vector
        w.ue(0)  # mb_type P_L0_16x16
        w.se(use_mv[0] - mvp[0])
        w.se(use_mv[1] - mvp[1])
        w.ue(cbp_index[cbp])
        if cbp:
            w.se(0)  # mb_qp_delta
        for bit in bits:
            w.u(1 if bit == "1" else 0, 1)
        _commit_p_mb(st, enc2, mx, my, use_mv)
    if skip_run:
        w.ue(skip_run)
    return st, (n_skip, n_inter, n_pcm, n_subpel)


def encode_h264_gop(frames_yuv, width: int, height: int, qp: int = 28,
                    search: int = 8, return_recon: bool = False,
                    return_stats: bool = False, subpel: bool = True,
                    b_frames: int = 0):
    """[(Y, Cb, Cr) uint8 planes] → a conforming Annex-B GOP: one IDR
    I picture (the round-10 CAVLC intra encoder) followed by P pictures —
    P_Skip / P_L0_16x16 with integer-sample full-search motion (±`search`)
    against the previously RECONSTRUCTED picture, CAVLC residuals, and
    per-MB I_PCM fallback for CAVLC-unrepresentable levels. Deblocking
    disabled per slice (the decoder's honest gate). The decoder must
    reproduce every frame's encoder reconstruction BIT-EXACTLY — the
    encoder motion-compensates against the full padded decoded planes
    (obtained by decoding its own IDR output), exactly what the decoder
    will use, so the contract holds at any frame size.

    subpel=True refines the integer-search winner over its half-sample
    then quarter-sample neighbours (SAD on the §8.4.2.2 interpolated
    prediction, the same code path the decoder runs) — streams from real
    motion carry fractional MVs, so the bit-exact contract exercises the
    decoder's sub-sample interpolation, not just integer fetches.

    return_stats appends per-frame dicts {"pcm_mbs", "skip_mbs",
    "inter_mbs", "intra_mbs", "subpel_mbs", "mbs"} — the P-frame
    temporal-compression evidence the r11 gate pins. intra_mbs counts ALL
    intra-coded macroblocks INCLUDING I_PCM, uniformly for I and P frames
    (I frame: every MB; P frame: exactly the I_PCM fallbacks), so summing
    across a GOP is meaningful; pcm_mbs is always a subset of intra_mbs. Reference: PeerDB
    has no video decode (BYTEA passthrough); this is the engine's
    from-scratch §8.4 layer."""
    from peerdb_spark.functions import h264_cavlc as CV
    from peerdb_spark.functions import h264_inter as HI

    if b_frames:
        return _encode_gop_b(frames_yuv, width, height, qp, search,
                             return_recon, return_stats, subpel, b_frames)
    if len(frames_yuv) < 1:
        raise ValueError("GOP needs at least one frame")
    head = encode_h264_cavlc(frames_yuv[:1], width, height, qp=qp,
                             return_recon=True, mb_mode="i16",
                             return_stats=True)
    stream = bytearray(head[0])
    recons = list(head[1])
    stats = [dict(head[2][0], skip_mbs=0, inter_mbs=0, subpel_mbs=0,
                  intra_mbs=head[2][0]["mbs"])]
    # the decoder's reference = the FULL padded decoded planes
    (_sps, ref_planes), = list(_decode_stream(bytes(stream)))
    ref = tuple(p.astype(np.int32) for p in ref_planes)

    wmb, hmb = -(-width // 16), -(-height // 16)
    qp_c = _chroma_qp(qp, 0)
    cw, ch = (width + 1) // 2, (height + 1) // 2
    cbp_index = {v: i for i, v in enumerate(HI._CBP_INTER)}

    for fi in range(1, len(frames_yuv)):
        Y = np.asarray(frames_yuv[fi][0], dtype=np.uint8)
        Cb = np.asarray(frames_yuv[fi][1], dtype=np.uint8)
        Cr = np.asarray(frames_yuv[fi][2], dtype=np.uint8)
        if Y.shape != (height, width) or Cb.shape != (ch, cw) or Cr.shape != (ch, cw):
            raise ValueError(f"frame {fi}: plane shape mismatch")
        Yp = np.pad(Y, ((0, 16 * hmb - height), (0, 16 * wmb - width)),
                    mode="edge").astype(np.int32)
        Cbp = np.pad(Cb, ((0, 8 * hmb - ch), (0, 8 * wmb - cw)),
                     mode="edge").astype(np.int32)
        Crp = np.pad(Cr, ((0, 8 * hmb - ch), (0, 8 * wmb - cw)),
                     mode="edge").astype(np.int32)
        w = _BitWriter()
        w.ue(0)            # first_mb_in_slice
        w.ue(5)            # slice_type P (all slices in picture)
        w.ue(0)            # pps_id
        w.u(fi & 15, 4)    # frame_num
        # poc_type 2: no poc fields; non-IDR: no idr_pic_id
        w.u(0, 1)          # num_ref_idx_active_override_flag
        w.u(0, 1)          # ref_pic_list_modification_flag_l0
        w.u(0, 1)          # adaptive_ref_pic_marking_mode_flag
        w.se(0)            # slice_qp_delta
        w.ue(1)            # disable_deblocking_filter_idc = 1
        st, (n_skip, n_inter, n_pcm, n_subpel) = _encode_p_picture(
            w, Yp, Cbp, Crp, ref, qp, qp_c, search, subpel, CV, HI,
            cbp_index, wmb, hmb)
        stream += _nal(1, w.rbsp_trailing(), ref_idc=2)
        stats.append({"pcm_mbs": n_pcm, "skip_mbs": n_skip,
                      "inter_mbs": n_inter, "intra_mbs": n_pcm,
                      "subpel_mbs": n_subpel, "mbs": wmb * hmb})
        recons.append((st.Y.astype(np.uint8)[:height, :width],
                       st.Cb.astype(np.uint8)[:ch, :cw],
                       st.Cr.astype(np.uint8)[:ch, :cw]))
        ref = (st.Y.copy(), st.Cb.copy(), st.Cr.copy())
    parts = [bytes(stream)]
    if return_recon:
        parts.append(recons)
    if return_stats:
        parts.append(stats)
    return tuple(parts) if len(parts) > 1 else parts[0]


def _search_mv(Yp: np.ndarray, refY: np.ndarray, mx: int, my: int,
               search: int) -> tuple[int, int]:
    """Integer-sample full-search (±search) luma SAD; returns the best MV
    in QUARTER-sample units, preferring (0,0) then smaller |mv| on ties.
    Candidates may reach OUTSIDE the reference picture — fetches clamp to
    the edge exactly like the decoder's §8.4.2.2 sample access, so edge
    MBs can still track motion toward the picture border."""
    src = Yp[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16]
    H, W = refY.shape
    best = None
    for dy in range(-search, search + 1):
        ys = np.clip(np.arange(my * 16 + dy, my * 16 + dy + 16), 0, H - 1)
        for dx in range(-search, search + 1):
            xs = np.clip(np.arange(mx * 16 + dx, mx * 16 + dx + 16), 0, W - 1)
            sad = int(np.abs(refY[np.ix_(ys, xs)] - src).sum())
            key = (sad, dx != 0 or dy != 0, abs(dx) + abs(dy))
            if best is None or key < best[0]:
                best = (key, (dx * 4, dy * 4))
    return best[1] if best is not None else (0, 0)


def _refine_mv_subpel(Yp: np.ndarray, refY: np.ndarray, mx: int, my: int,
                      mv: tuple[int, int]) -> tuple[int, int]:
    """Two-stage sub-sample refinement around an integer-search winner:
    the 8 half-sample neighbours (±2 quarter units), then the 8
    quarter-sample neighbours of that winner. Each candidate's SAD uses
    interp_luma_block — the decoder's own §8.4.2.2 prediction — so the
    chosen MV's prediction is exactly what the decoder will produce.
    Integer positions win ties (cheaper CAVLC, no interpolation cost)."""
    from peerdb_spark.functions import h264_inter as HI

    src = Yp[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16]

    def sad(cand):
        p = HI.interp_luma_block(refY, mx * 16, my * 16, cand[0], cand[1],
                                 16, 16)
        return int(np.abs(src - p).sum())

    best, best_sad = mv, sad(mv)
    for step in (2, 1):
        centre = best
        for dy in (-step, 0, step):
            for dx in (-step, 0, step):
                if dx == 0 and dy == 0:
                    continue
                cand = (centre[0] + dx, centre[1] + dy)
                s = sad(cand)
                if s < best_sad:
                    best, best_sad = cand, s
    return best


def _encode_mb_p16(st: _PicState, ref: tuple, Yp, Cbp, Crp, mx: int,
                   my: int, mv: tuple[int, int], qp: int, qp_c: int,
                   CV, HI, cbp_index) -> tuple | None:
    """Quantize one P_L0_16x16 macroblock's residual at `mv` WITHOUT
    committing state. Returns (cbp, mv, residual_bits, recon_planes,
    nc_updates) or None when a level is CAVLC-unrepresentable."""
    py = HI.interp_luma_block(ref[0], mx * 16, my * 16, mv[0], mv[1], 16, 16)
    pcb = HI.interp_chroma_block(ref[1], mx * 8, my * 8, mv[0], mv[1], 8, 8)
    pcr = HI.interp_chroma_block(ref[2], mx * 8, my * 8, mv[0], mv[1], 8, 8)
    enc = _encode_mb_inter_resid(st, (py, pcb, pcr), Yp, Cbp, Crp, mx, my,
                                 qp, qp_c, CV)
    if enc is None:
        return None
    cbp, bits, recon, overlays = enc
    return (cbp, mv, bits, recon, overlays)


def _encode_mb_inter_resid(st: _PicState, preds: tuple, Yp, Cbp, Crp,
                           mx: int, my: int, qp: int, qp_c: int,
                           CV) -> tuple | None:
    """Quantize one inter macroblock's residual against precomputed
    prediction planes (shared by P_L0_16x16 and the B 16x16 types)
    WITHOUT committing state. Returns (cbp, residual_bits, recon_planes,
    nc_updates) or None when a level is CAVLC-unrepresentable."""
    py, pcb, pcr = preds
    diff = Yp[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] - py
    ac_scan = [None] * 16
    recon_y = np.zeros((16, 16), dtype=np.int32)
    for n, (ox, oy) in enumerate(_BLK4_ORDER):
        x0, y0 = ox * 4, oy * 4
        c = _ftrans4x4(diff[y0:y0 + 4, x0:x0 + 4])
        raster = [_fquant(int(c[i // 4, i % 4]), qp, _POS_CLS[i])
                  for i in range(16)]
        ac_scan[n] = _raster_to_zz4(raster, start=0)
        res = _itrans4x4(_dequant4x4(raster, qp))
        for i in range(4):
            for j in range(4):
                recon_y[y0 + i, x0 + j] = _clip8(
                    int(py[y0 + i, x0 + j]) + res[4 * i + j])
    groups = [any(any(ac_scan[g * 4 + k]) for k in range(4))
              for g in range(4)]
    cbp_luma = sum(1 << g for g, on in enumerate(groups) if on)
    ch_dc_levels, ch_ac_scan = [], []
    for plane, cpred in ((Cbp, pcb), (Crp, pcr)):
        d = plane[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] - cpred
        cdc = [0] * 4
        acs = []
        for b in range(4):
            qy, qx = (b >> 1) * 4, (b & 1) * 4
            c = _ftrans4x4(d[qy:qy + 4, qx:qx + 4])
            cdc[b] = int(c[0, 0])
            raster = [0] * 16
            for i in range(4):
                for j in range(4):
                    if i == 0 and j == 0:
                        continue
                    raster[4 * i + j] = _fquant(
                        int(c[i, j]), qp_c, _POS_CLS[4 * i + j])
            acs.append(_raster_to_zz4(raster, start=1))
        fdc = (cdc[0] + cdc[1] + cdc[2] + cdc[3],
               cdc[0] - cdc[1] + cdc[2] - cdc[3],
               cdc[0] + cdc[1] - cdc[2] - cdc[3],
               cdc[0] - cdc[1] - cdc[2] + cdc[3])
        ch_dc_levels.append([_fquant_dc(v, qp_c) for v in fdc])
        ch_ac_scan.append(acs)
    any_ch_ac = any(any(s) for acs in ch_ac_scan for s in acs)
    any_ch_dc = any(any(lv) for lv in ch_dc_levels)
    cbp_chroma = 2 if any_ch_ac else (1 if any_ch_dc else 0)
    cbp = cbp_luma | (cbp_chroma << 4)
    # residual bits with staged nC (same overlay discipline as the intra
    # encoders: nothing committed until the whole MB encodes)
    overlayY: dict = {}
    overlayCb: dict = {}
    overlayCr: dict = {}

    def nc_of(arr, overlay, bx, by, per_mb):
        nA = nB = None
        if bx > 0:
            v = overlay.get((bx - 1, by))
            if v is None and arr[by, bx - 1] >= 0:
                v = int(arr[by, bx - 1])
            nA = v
        if by > 0:
            v = overlay.get((bx, by - 1))
            if v is None and arr[by - 1, bx] >= 0:
                v = int(arr[by - 1, bx])
            nB = v
        if nA is not None and nB is not None:
            return (nA + nB + 1) >> 1
        if nA is not None:
            return nA
        if nB is not None:
            return nB
        return 0

    bits = []
    for n, (ox, oy) in enumerate(_BLK4_ORDER):
        bx, by = mx * 4 + ox, my * 4 + oy
        if cbp_luma & (1 << (n >> 2)):
            b = CV.encode_residual(ac_scan[n], nc_of(st.ncY, overlayY, bx, by, 4))
            if b is None:
                return None
            bits.append(b)
            overlayY[(bx, by)] = sum(1 for v in ac_scan[n] if v)
        else:
            overlayY[(bx, by)] = 0
    if cbp_chroma:
        for lv in ch_dc_levels:
            b = CV.encode_residual(list(lv), -1)
            if b is None:
                return None
            bits.append(b)
    for comp, (arr, overlay) in enumerate(((st.ncCb, overlayCb),
                                           (st.ncCr, overlayCr))):
        for bnum in range(4):
            bx, by = mx * 2 + (bnum & 1), my * 2 + (bnum >> 1)
            if cbp_chroma == 2:
                b = CV.encode_residual(ch_ac_scan[comp][bnum],
                                       nc_of(arr, overlay, bx, by, 2))
                if b is None:
                    return None
                bits.append(b)
                overlay[(bx, by)] = sum(1 for v in ch_ac_scan[comp][bnum] if v)
            else:
                overlay[(bx, by)] = 0
    # decoder-exact chroma reconstruction
    recon_cb = np.zeros((8, 8), dtype=np.int32)
    recon_cr = np.zeros((8, 8), dtype=np.int32)
    for comp, (out_p, cpred) in enumerate(((recon_cb, pcb), (recon_cr, pcr))):
        lv = ch_dc_levels[comp]
        dq = _chroma_dc_inverse(lv[0], lv[1], lv[2], lv[3], qp_c)
        for bnum in range(4):
            raster = _zz_to_raster4(ch_ac_scan[comp][bnum], start=1)
            raster = _dequant4x4(raster, qp_c, skip_dc=True)
            raster[0] = dq[bnum]
            res = _itrans4x4(raster)
            qx, qy = (bnum & 1) * 4, (bnum >> 1) * 4
            for i in range(4):
                for j in range(4):
                    out_p[qy + i, qx + j] = _clip8(
                        int(cpred[qy + i, qx + j]) + res[4 * i + j])
    return (cbp, "".join(bits), (recon_y, recon_cb, recon_cr),
            (overlayY, overlayCb, overlayCr))


def _commit_p_mb(st: _PicState, enc: tuple, mx: int, my: int,
                 mv: tuple[int, int]) -> None:
    _cbp, _mv, _bits, (ry, rcb, rcr), (oy, ocb, ocr) = enc
    st.Y[my * 16:my * 16 + 16, mx * 16:mx * 16 + 16] = ry
    st.Cb[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = rcb
    st.Cr[my * 8:my * 8 + 8, mx * 8:mx * 8 + 8] = rcr
    for (bx, by), v in oy.items():
        st.ncY[by, bx] = v
    for (bx, by), v in ocb.items():
        st.ncCb[by, bx] = v
    for (bx, by), v in ocr.items():
        st.ncCr[by, bx] = v
    st.mv[my, mx] = mv
    st.inter[my, mx] = True


# -- I_PCM encoder (fixtures, tests, interop) ----------------------------------


def _nal(nal_type: int, rbsp: bytes, ref_idc: int = 3) -> bytes:
    return b"\x00\x00\x00\x01" + bytes([(ref_idc << 5) | nal_type]) + _insert_epb(rbsp)


def encode_h264_ipcm(frames_yuv, width: int, height: int) -> bytes:
    """[(Y, Cb, Cr) uint8 planes] → a conforming baseline-profile Annex-B
    stream of IDR pictures whose macroblocks are all I_PCM. Y is (h, w),
    Cb/Cr are (ceil(h/2), ceil(w/2)) (4:2:0). Even dims only (a 4:2:0
    cropping-unit constraint of the format itself). Pad regions beyond the
    crop replicate edge samples."""
    if width % 2 or height % 2 or width < 2 or height < 2:
        raise ValueError("H.264 4:2:0 dimensions must be positive and even")
    wmb = -(-width // 16)
    hmb = -(-height // 16)
    crop_r = (16 * wmb - width) // 2
    crop_b = (16 * hmb - height) // 2

    sps = _BitWriter()
    sps.u(66, 8)   # profile_idc: baseline
    sps.u(0, 8)    # constraint flags / reserved
    sps.u(30, 8)   # level 3.0
    sps.ue(0)      # sps_id
    sps.ue(0)      # log2_max_frame_num_minus4
    sps.ue(2)      # pic_order_cnt_type 2 (no POC bits in slices)
    sps.ue(1)      # max_num_ref_frames
    sps.u(0, 1)    # gaps_in_frame_num_value_allowed_flag
    sps.ue(wmb - 1)
    sps.ue(hmb - 1)
    sps.u(1, 1)    # frame_mbs_only_flag
    sps.u(1, 1)    # direct_8x8_inference_flag
    if crop_r or crop_b:
        sps.u(1, 1)
        sps.ue(0)
        sps.ue(crop_r)
        sps.ue(0)
        sps.ue(crop_b)
    else:
        sps.u(0, 1)
    sps.u(0, 1)    # vui_parameters_present_flag
    out = bytearray(_nal(7, sps.rbsp_trailing()))

    pps = _BitWriter()
    pps.ue(0)      # pps_id
    pps.ue(0)      # sps_id
    pps.u(0, 1)    # entropy_coding_mode_flag: CAVLC
    pps.u(0, 1)    # bottom_field_pic_order_in_frame_present_flag
    pps.ue(0)      # num_slice_groups_minus1
    pps.ue(0)      # num_ref_idx_l0_default_active_minus1
    pps.ue(0)      # num_ref_idx_l1_default_active_minus1
    pps.u(0, 1)    # weighted_pred_flag
    pps.u(0, 2)    # weighted_bipred_idc
    pps.se(0)      # pic_init_qp_minus26
    pps.se(0)      # pic_init_qs_minus26
    pps.se(0)      # chroma_qp_index_offset
    pps.u(0, 1)    # deblocking_filter_control_present_flag
    pps.u(0, 1)    # constrained_intra_pred_flag
    pps.u(0, 1)    # redundant_pic_cnt_present_flag
    out += _nal(8, pps.rbsp_trailing())

    cw, ch = (width + 1) // 2, (height + 1) // 2
    for fi, (Y, Cb, Cr) in enumerate(frames_yuv):
        Y = np.asarray(Y, dtype=np.uint8)
        Cb = np.asarray(Cb, dtype=np.uint8)
        Cr = np.asarray(Cr, dtype=np.uint8)
        if Y.shape != (height, width) or Cb.shape != (ch, cw) or Cr.shape != (ch, cw):
            raise ValueError(
                f"frame {fi}: want Y {(height, width)}, chroma {(ch, cw)}; "
                f"got {Y.shape}, {Cb.shape}, {Cr.shape}")
        # edge-pad to macroblock grid
        Yp = np.pad(Y, ((0, 16 * hmb - height), (0, 16 * wmb - width)), mode="edge")
        Cbp = np.pad(Cb, ((0, 8 * hmb - ch), (0, 8 * wmb - cw)), mode="edge")
        Crp = np.pad(Cr, ((0, 8 * hmb - ch), (0, 8 * wmb - cw)), mode="edge")

        w = _BitWriter()
        w.ue(0)        # first_mb_in_slice
        w.ue(7)        # slice_type: I (all slices in picture)
        w.ue(0)        # pic_parameter_set_id
        w.u(0, 4)      # frame_num (log2_max_frame_num = 4; IDR → 0)
        w.ue(fi & 0xFFFF)  # idr_pic_id
        w.u(0, 1)      # no_output_of_prior_pics_flag
        w.u(0, 1)      # long_term_reference_flag
        w.se(0)        # slice_qp_delta
        for mb in range(wmb * hmb):
            my, mx = divmod(mb, wmb)
            w.ue(_I_PCM_MB_TYPE)
            w.align_zero()
            w.put_bytes(Yp[my * 16 : my * 16 + 16, mx * 16 : mx * 16 + 16].tobytes())
            w.put_bytes(Cbp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8].tobytes())
            w.put_bytes(Crp[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8].tobytes())
        out += _nal(5, w.rbsp_trailing())
    return bytes(out)
