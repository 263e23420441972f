"""B-slice (round 12) tests: bi-prediction, spatial direct mode, display
reordering via POC, droppable non-reference B NALs, and the bit-exact
encoder-reconstruction == decoder-output contract over IDR+P+B GOPs.

Scope gates (stated honestly, mirroring h264.py): B_L0/B_L1/B_Bi 16x16 +
B_Skip/B_Direct_16x16 under SPATIAL direct mode, one reference per list,
CAVLC entropy, no weighted prediction, no sub-16x16 partitions. Temporal
direct, list reordering and partitions reject loudly.

Reference: PeerDB has no video decode at all (BYTEA passthrough,
flow/model/qvalue) — this layer serves the LLM-pipeline video surface.
"""
import numpy as np
import pytest

from peerdb_spark.functions import h264_inter as HI
from peerdb_spark.functions.h264 import (
    _decode_stream_ex,
    decode_h264_yuv,
    encode_h264_gop,
    split_nals,
)

rng = np.random.default_rng(12)
W, H = 64, 48
_BASE = (np.add.outer(np.arange(H * 2), np.arange(W * 2)) * 5 % 256).astype(np.uint8)
_TEX = rng.integers(0, 30, (H * 2, W * 2), dtype=np.uint8)


def _frame(dx, dy, gain=1.0):
    Y = np.clip(
        (_BASE[dy:dy + H, dx:dx + W].astype(float)
         + _TEX[dy:dy + H, dx:dx + W]) * gain, 0, 255).astype(np.uint8)
    return (Y, (Y[::2, ::2] // 2 + 60).astype(np.uint8),
            (Y[1::2, ::2] // 3 + 80).astype(np.uint8))


def _assert_exact(stream, recons):
    dec = decode_h264_yuv(bytes(stream))
    assert len(dec) == len(recons)
    for i, (w, h, Y, Cb, Cr) in enumerate(dec):
        rY, rCb, rCr = recons[i]
        assert np.array_equal(Y, rY), f"frame {i} luma mismatch"
        assert np.array_equal(Cb, rCb), f"frame {i} Cb mismatch"
        assert np.array_equal(Cr, rCr), f"frame {i} Cr mismatch"


@pytest.mark.parametrize("qp", [22, 30])
def test_bslice_gop_bit_exact(qp):
    """decoder output == encoder reconstruction, frame by frame in
    DISPLAY order, through I+B+P+B+P with real motion."""
    frames = [_frame(3 * i, 2 * i) for i in range(5)]
    stream, recons, stats = encode_h264_gop(
        frames, W, H, qp=qp, b_frames=1, return_recon=True,
        return_stats=True)
    assert [s["kind"] for s in stats] == ["I", "B", "P", "B", "P"]
    assert [s["poc"] for s in stats] == [0, 2, 4, 6, 8]
    assert all(s["pcm_mbs"] == 0 for s in stats)  # stayed entropy-coded
    _assert_exact(stream, recons)


def test_bslice_mode_coverage_and_compression():
    """Real-motion GOP exercises every implemented B mb type; the stream
    beats raw size and every B picture's bits are below the I frame's
    (temporal evidence, same bar as the P gate)."""
    frames = [_frame(3 * i, 2 * i) for i in range(7)]
    stream, recons, stats = encode_h264_gop(
        frames, W, H, qp=26, b_frames=2, return_recon=True,
        return_stats=True)
    b_stats = [s for s in stats if s["kind"] == "B"]
    assert len(b_stats) == 4
    totals = {k: sum(s[k] for s in b_stats)
              for k in ("direct_mbs", "l0_mbs", "l1_mbs", "bi_mbs")}
    assert all(v > 0 for v in totals.values()), totals
    raw = 7 * (W * H + 2 * (W // 2) * (H // 2))
    assert len(stream) < raw // 3
    _assert_exact(stream, recons)


def test_bslice_static_scene_skips():
    """A static scene collapses B pictures to pure B_Skip runs (spatial
    direct motion, zero residual) — near-zero bits per B frame."""
    frames = [_frame(4, 2)] * 4
    stream, recons, stats = encode_h264_gop(
        frames, W, H, qp=28, b_frames=2, return_recon=True,
        return_stats=True)
    for s in stats:
        if s["kind"] == "B":
            # anchors' reconstructions can differ by quantization noise,
            # so a stray MB may carry a small direct-mode residual
            assert s["skip_mbs"] >= s["mbs"] - 2
            assert s["pcm_mbs"] == 0
    _assert_exact(stream, recons)


def test_bslice_fade_prefers_averaging():
    """On a linear fade the B frame is exactly the average of its two
    anchors — bi-directional prediction (direct or B_Bi) must dominate
    and single-list MBs stay rare."""
    frames = [_frame(0, 0, 0.6), _frame(0, 0, 0.8), _frame(0, 0, 1.0)]
    stream, recons, stats = encode_h264_gop(
        frames, W, H, qp=28, b_frames=1, return_recon=True,
        return_stats=True)
    b = next(s for s in stats if s["kind"] == "B")
    two_sided = b["skip_mbs"] + b["direct_mbs"] + b["bi_mbs"]
    assert two_sided > b["l0_mbs"] + b["l1_mbs"]
    _assert_exact(stream, recons)


def test_b_nals_droppable():
    """B pictures are nal_ref_idc 0 — stripping every non-reference NAL
    leaves a stream whose anchors still decode BIT-EXACTLY (no reference
    chain runs through a B picture): temporal scalability."""
    frames = [_frame(3 * i, 2 * i) for i in range(5)]
    stream, recons, stats = encode_h264_gop(
        frames, W, H, qp=26, b_frames=1, return_recon=True,
        return_stats=True)
    data = bytes(stream)
    kept = bytearray()
    for nal_type, s, e in split_nals(data):
        ref_idc = (data[s] >> 5) & 3
        if nal_type in (1, 5) and ref_idc == 0:
            continue  # drop non-reference (B) pictures
        kept += b"\x00\x00\x00\x01" + data[s:e]
    dec = decode_h264_yuv(bytes(kept))
    anchor_recons = [r for r, st_ in zip(recons, stats)
                     if st_["kind"] != "B"]
    assert len(dec) == len(anchor_recons)
    for (w, h, Y, Cb, Cr), (rY, rCb, rCr) in zip(dec, anchor_recons):
        assert np.array_equal(Y, rY)
        assert np.array_equal(Cb, rCb)
        assert np.array_equal(Cr, rCr)


def test_decode_order_vs_display_order():
    """The wire carries anchors BEFORE the B pictures between them
    (decode order); _decode_stream_ex yields that order with POCs, and
    the public decode reorders to display."""
    frames = [_frame(3 * i, 2 * i) for i in range(5)]
    stream = encode_h264_gop(frames, W, H, qp=26, b_frames=1)
    pocs = [poc for _s, _p, poc, _i in _decode_stream_ex(bytes(stream))]
    assert pocs == [0, 4, 2, 8, 6]  # I P B P B on the wire
    assert len(decode_h264_yuv(bytes(stream))) == 5


def test_poc_lsb_wrap():
    """pic_order_cnt_lsb is 8 bits in these streams: a GOP long enough
    to cross poc 256 exercises the §8.2.1.1 msb carry — display count
    and bit-exactness survive the wrap."""
    w = h = 16
    fr = []
    for i in range(132):
        Y = np.full((h, w), 40 + (i % 7) * 20, dtype=np.uint8)
        Y[4:9, 4:9] = 220 - (i % 5) * 15
        fr.append((Y, np.full((8, 8), 90, np.uint8),
                   np.full((8, 8), 140, np.uint8)))
    stream, recons, _stats = encode_h264_gop(
        fr, w, h, qp=30, b_frames=1, search=2, subpel=False,
        return_recon=True, return_stats=True)
    _assert_exact(stream, recons)


def test_b_first_picture_rejects():
    """A B picture with no decoded reference on both display sides must
    reject, not decode garbage."""
    frames = [_frame(0, 0), _frame(2, 1), _frame(4, 2)]
    stream = encode_h264_gop(frames, W, H, qp=26, b_frames=1)
    data = bytes(stream)
    # keep SPS/PPS + ONLY the B NAL (ref_idc 0)
    kept = bytearray()
    for nal_type, s, e in split_nals(data):
        ref_idc = (data[s] >> 5) & 3
        if nal_type in (7, 8) or (nal_type == 1 and ref_idc == 0):
            kept += b"\x00\x00\x00\x01" + data[s:e]
    with pytest.raises(ValueError, match="reference"):
        decode_h264_yuv(bytes(kept))


def test_direct_spatial_derivation_unit():
    """§8.4.1.2.2 unit pins: no neighbours -> directZeroPrediction (both
    lists, zero MVs); colocated near-zero motion clamps a list to zero;
    single-list neighbourhood predicts only that list."""
    hmb = wmb = 3
    mv0 = np.zeros((hmb, wmb, 2), np.int32)
    u0 = np.zeros((hmb, wmb), bool)
    mv1 = np.zeros((hmb, wmb, 2), np.int32)
    u1 = np.zeros((hmb, wmb), bool)
    col_mv = np.zeros((hmb, wmb, 2), np.int32)
    col_u = np.zeros((hmb, wmb), bool)
    # corner MB, no neighbours at all -> zero-pred BOTH lists
    assert HI.b_direct_spatial(mv0, u0, mv1, u1, col_mv, col_u, 0, 0) == \
        (True, (0, 0), True, (0, 0))
    # left neighbour used L0 with motion; colocated STILL (used, |mv|<=1)
    u0[1, 0] = True
    mv0[1, 0] = (8, 4)
    col_u[1, 1] = True
    col_mv[1, 1] = (1, -1)
    assert HI.b_direct_spatial(mv0, u0, mv1, u1, col_mv, col_u, 1, 1) == \
        (True, (0, 0), False, (0, 0))  # col-zero clamp, L1 unused
    # colocated MOVING -> the median predictor flows through
    col_mv[1, 1] = (9, 0)
    use0, mvl0, use1, _ = HI.b_direct_spatial(
        mv0, u0, mv1, u1, col_mv, col_u, 1, 1)
    assert use0 and not use1 and mvl0 == (8, 4)  # single inter neighbour
    # intra colocated (col_used False) never clamps
    col_u[1, 1] = False
    assert HI.b_direct_spatial(
        mv0, u0, mv1, u1, col_mv, col_u, 1, 1)[1] == (8, 4)


def test_temporal_direct_rejects():
    """direct_spatial_mv_pred_flag == 0 (temporal direct) rejects loudly
    rather than mis-deriving motion."""
    frames = [_frame(0, 0), _frame(2, 1), _frame(4, 2)]
    stream = encode_h264_gop(frames, W, H, qp=26, b_frames=1)
    data = bytearray(stream)
    # find the B slice NAL and flip direct_spatial_mv_pred_flag. Header
    # bits: first_mb ue(0)=1b, slice_type ue(6)='00111', pps ue(0)=1b,
    # frame_num 4b, poc_lsb 8b -> flag is bit 19 (0-indexed) of the RBSP
    for nal_type, s, e in split_nals(bytes(data)):
        if nal_type == 1 and (data[s] >> 5) & 3 == 0:
            payload_start = s + 1
            bit = 19
            data[payload_start + bit // 8] ^= 0x80 >> (bit % 8)
            break
    with pytest.raises(NotImplementedError, match="temporal direct"):
        decode_h264_yuv(bytes(data))
