"""H.264 P slices (round 11 stretch): §8.4 inter prediction — quarter/
eighth-sample interpolation, MV prediction, P_Skip, the GOP encoder, and
the encoder-reconstruction == decoder-output bit-exact contract.

Verification posture: no independent H.264 codec exists in this container;
the interpolators are pinned against an INDEPENDENT scalar re-implementation
of the spec formulas written here (different code shape: per-sample loops
with explicit Clip3 fetches vs the module's vectorized windows), MV rules
against hand-built neighbour configurations, and the stream layer by the
same bit-exact roundtrip contract the intra layer uses."""

import numpy as np
import pytest

from peerdb_spark.functions import h264_inter as HI
from peerdb_spark.functions.h264 import (
    decode_h264_yuv,
    encode_h264_cavlc,
    encode_h264_gop,
)


# -- independent scalar reference for §8.4.2.2 --------------------------------


def _ref_luma_sample(ref, x, y, fx, fy):
    """One luma prediction sample at integer pos (x, y) + frac (fx, fy),
    straight from the spec formulas with Clip3 sample fetches."""
    H, W = ref.shape

    def S(xx, yy):
        return int(ref[min(max(yy, 0), H - 1), min(max(xx, 0), W - 1)])

    def half_h(xx, yy):  # b at (xx + 1/2, yy), unclipped intermediate
        return (S(xx - 2, yy) - 5 * S(xx - 1, yy) + 20 * S(xx, yy)
                + 20 * S(xx + 1, yy) - 5 * S(xx + 2, yy) + S(xx + 3, yy))

    def half_v(xx, yy):
        return (S(xx, yy - 2) - 5 * S(xx, yy - 1) + 20 * S(xx, yy)
                + 20 * S(xx, yy + 1) - 5 * S(xx, yy + 2) + S(xx, yy + 3))

    def clip8(v):
        return max(0, min(255, v))

    G = S(x, y)
    b = clip8((half_h(x, y) + 16) >> 5)
    h = clip8((half_v(x, y) + 16) >> 5)
    # j: vertical 6-tap over unrounded horizontal halves
    j1 = (half_h(x, y - 2) - 5 * half_h(x, y - 1) + 20 * half_h(x, y)
          + 20 * half_h(x, y + 1) - 5 * half_h(x, y + 2) + half_h(x, y + 3))
    j = clip8((j1 + 512) >> 10)
    b_below = clip8((half_h(x, y + 1) + 16) >> 5)
    h_right = clip8((half_v(x + 1, y) + 16) >> 5)
    pos = (fx, fy)
    if pos == (0, 0):
        return G
    if pos == (1, 0):
        return (G + b + 1) >> 1
    if pos == (2, 0):
        return b
    if pos == (3, 0):
        return (S(x + 1, y) + b + 1) >> 1
    if pos == (0, 1):
        return (G + h + 1) >> 1
    if pos == (0, 2):
        return h
    if pos == (0, 3):
        return (S(x, y + 1) + h + 1) >> 1
    if pos == (2, 2):
        return j
    if pos == (2, 1):
        return (b + j + 1) >> 1
    if pos == (2, 3):
        return (b_below + j + 1) >> 1
    if pos == (1, 2):
        return (h + j + 1) >> 1
    if pos == (3, 2):
        return (h_right + j + 1) >> 1
    if pos == (1, 1):
        return (b + h + 1) >> 1
    if pos == (3, 1):
        return (b + h_right + 1) >> 1
    if pos == (1, 3):
        return (b_below + h + 1) >> 1
    if pos == (3, 3):
        return (b_below + h_right + 1) >> 1
    raise AssertionError(pos)


def test_luma_interp_matches_scalar_spec_reference():
    rng = np.random.RandomState(1)
    ref = rng.randint(0, 256, (40, 52)).astype(np.int32)
    for trial in range(40):
        x0 = int(rng.randint(-4, 44))
        y0 = int(rng.randint(-4, 36))
        fx, fy = int(rng.randint(0, 4)), int(rng.randint(0, 4))
        mvx = ((int(rng.randint(-3, 4))) << 2) | fx
        mvy = ((int(rng.randint(-3, 4))) << 2) | fy
        got = HI.interp_luma_block(ref, x0, y0, mvx, mvy, 8, 8)
        for i in range(8):
            for j in range(8):
                want = _ref_luma_sample(ref, x0 + (mvx >> 2) + j,
                                        y0 + (mvy >> 2) + i, fx, fy)
                assert got[i, j] == want, (trial, i, j, fx, fy)


def test_luma_half_pel_exact_on_linear_ramp():
    """The 6-tap filter has DC gain 32 and is symmetric, so on a linear
    ramp the half-sample value is exactly the midpoint — an analytic pin
    independent of any implementation."""
    ref = (np.arange(64, dtype=np.int32) * 2)[None, :].repeat(24, axis=0)
    got = HI.interp_luma_block(ref, 10, 4, 2, 0, 8, 8)  # fx = 1/2
    want = ref[4:12, 10:18] + 1  # midpoint of step-2 ramp
    assert (got == want).all()


def test_chroma_interp_matches_scalar_spec_reference():
    rng = np.random.RandomState(2)
    ref = rng.randint(0, 256, (20, 26)).astype(np.int32)
    H, W = ref.shape
    for trial in range(40):
        x0, y0 = int(rng.randint(-2, 22)), int(rng.randint(-2, 16))
        mvx, mvy = int(rng.randint(-20, 21)), int(rng.randint(-20, 21))
        dx, dy = mvx & 7, mvy & 7
        got = HI.interp_chroma_block(ref, x0, y0, mvx, mvy, 4, 4)
        for i in range(4):
            for j in range(4):
                xx, yy = x0 + (mvx >> 3) + j, y0 + (mvy >> 3) + i

                def S(a, b):
                    return int(ref[min(max(b, 0), H - 1),
                                   min(max(a, 0), W - 1)])

                want = ((8 - dx) * (8 - dy) * S(xx, yy)
                        + dx * (8 - dy) * S(xx + 1, yy)
                        + (8 - dx) * dy * S(xx, yy + 1)
                        + dx * dy * S(xx + 1, yy + 1) + 32) >> 6
                assert got[i, j] == want, (trial, i, j)


# -- MV prediction rules -------------------------------------------------------


def _state(wmb=4, hmb=3):
    mvs = np.zeros((hmb, wmb, 2), np.int32)
    inter = np.zeros((hmb, wmb), bool)
    return mvs, inter


def test_mvp_median_and_single_inter_neighbour():
    mvs, inter = _state()
    # A=(4,0) B=(8,4) C=(12,8): median = (8,4)
    for (x, y), mv in {(0, 1): (4, 0), (1, 0): (8, 4), (2, 0): (12, 8)}.items():
        mvs[y, x] = mv
        inter[y, x] = True
    assert HI.mv_predict(mvs, inter, 1, 1) == (8, 4)
    # only B inter (A intra, C intra): exactly one matching ref -> B
    inter[1, 0] = False
    inter[0, 2] = False
    assert HI.mv_predict(mvs, inter, 1, 1) == (8, 4)
    # none inter: median over zeros = (0,0)
    inter[0, 1] = False
    assert HI.mv_predict(mvs, inter, 1, 1) == (0, 0)


def test_mvp_b_c_unavailable_takes_a():
    mvs, inter = _state()
    mvs[2, 0] = (-8, 12)
    inter[2, 0] = True
    # MB (1, 2) on the bottom row with wmb=2-wide picture: emulate by
    # querying the last row — B/C/D rows exist here, so instead test the
    # TOP row where B, C, D are outside the picture
    mvs2, inter2 = _state()
    mvs2[0, 0] = (-8, 12)
    inter2[0, 0] = True
    assert HI.mv_predict(mvs2, inter2, 1, 0) == (-8, 12)
    # top-left corner: nothing available -> (0,0)
    assert HI.mv_predict(*_state(), 0, 0) == (0, 0)


def test_mvp_c_unavailable_substitutes_d():
    mvs, inter = _state(wmb=2)
    # MB (1,1): C would be (2,0) — outside a 2-wide picture -> D=(0,0)
    for (x, y), mv in {(0, 1): (4, 0), (1, 0): (8, 4), (0, 0): (12, 8)}.items():
        mvs[y, x] = mv
        inter[y, x] = True
    assert HI.mv_predict(mvs, inter, 1, 1) == (8, 4)  # median(4,8,12 / 0,4,8)


def test_skip_mv_rules():
    mvs, inter = _state()
    # top row / left column: A or B outside picture -> (0,0)
    assert HI.mv_skip(mvs, inter, 0, 1) == (0, 0)
    assert HI.mv_skip(mvs, inter, 1, 0) == (0, 0)
    # interior with zero-MV inter A -> (0,0)
    for (x, y), mv in {(0, 1): (0, 0), (1, 0): (8, 4), (2, 0): (4, 8)}.items():
        mvs[y, x] = mv
        inter[y, x] = True
    assert HI.mv_skip(mvs, inter, 1, 1) == (0, 0)
    # interior, both nonzero inter -> the 16x16 predictor
    mvs[1, 0] = (4, 4)
    assert HI.mv_skip(mvs, inter, 1, 1) == HI.mv_predict(mvs, inter, 1, 1)
    # intra A (available, "different motion") does NOT force zero
    inter[1, 0] = False
    assert HI.mv_skip(mvs, inter, 1, 1) == HI.mv_predict(mvs, inter, 1, 1)


def test_cbp_inter_table_is_permutation():
    assert sorted(HI._CBP_INTER) == list(range(48))
    assert HI._CBP_INTER[0] == 0  # all-zero cbp gets the shortest code


# -- GOP encode/decode contract -------------------------------------------------


def _gray(h, w, fn):
    y = np.zeros((h, w), np.uint8)
    for yy in range(h):
        for xx in range(w):
            y[yy, xx] = fn(xx, yy) % 256
    cb = np.full((h // 2, w // 2), 116, np.uint8)
    cr = np.full((h // 2, w // 2), 138, np.uint8)
    return (y, cb, cr)


@pytest.mark.parametrize("qp", [14, 26, 34])
def test_gop_bit_exact_contract(qp):
    """IDR + 3 P frames (translation, change, second translation chained
    off a P reference): decoder output == encoder reconstruction for
    every frame, and the P frames genuinely compress vs the I frame."""
    h, w = 48, 64
    f0 = _gray(h, w, lambda x, y: 40 + (x * 3 + y * 2) % 160)
    f1 = _gray(h, w, lambda x, y: 40 + ((x - 4) * 3 + y * 2) % 160)
    f2 = _gray(h, w, lambda x, y: 40 + ((x - 4) * 3 + y * 2) % 160
               + (3 if (x + y) % 7 == 0 else 0))
    f3 = _gray(h, w, lambda x, y: 40 + ((x - 4) * 3 + (y - 2) * 2) % 160)
    stream, recons, stats = encode_h264_gop(
        [f0, f1, f2, f3], w, h, qp=qp, return_recon=True, return_stats=True)
    outs = decode_h264_yuv(stream)
    assert len(outs) == 4
    for i, (ww, hh, dy, dcb, dcr) in enumerate(outs):
        assert (ww, hh) == (w, h)
        assert (dy == recons[i][0]).all(), i
        assert (dcb == recons[i][1]).all() and (dcr == recons[i][2]).all(), i
    assert all(s["pcm_mbs"] == 0 for s in stats)
    assert stats[1]["skip_mbs"] + stats[1]["inter_mbs"] == stats[1]["mbs"]
    # temporal compression: the whole 3-P tail is smaller than the I frame
    i_only = encode_h264_cavlc([f0], w, h, qp=qp, mb_mode="i16")
    assert len(stream) - len(i_only) < len(i_only)


def test_gop_static_scene_is_all_skip():
    """A fully static frame after a LOSSLESS intra frame (qp 0, constant
    content) costs one skip run — a few bytes — and reconstructs as a
    byte-exact copy of the I recon. (At higher qp a 'static' P frame
    legitimately re-encodes the intra quantization error toward the
    source — only a lossless reference guarantees zero residual.)"""
    h, w = 32, 48
    f0 = _gray(h, w, lambda x, y: 100)
    stream, recons, stats = encode_h264_gop(
        [f0, f0], w, h, qp=0, return_recon=True, return_stats=True)
    assert stats[1]["skip_mbs"] == stats[1]["mbs"]
    outs = decode_h264_yuv(stream)
    assert (outs[1][2] == outs[0][2]).all()  # P recon == I recon
    assert (outs[1][2] == recons[1][0]).all()
    # the P picture NAL itself is tiny (slice header + one skip run)
    from peerdb_spark.functions.h264 import split_nals

    nals = split_nals(stream)
    p_nal = nals[-1]
    assert p_nal[2] - p_nal[1] < 16

    # at qp 24 the same scene may re-encode quantization error, but the
    # contract and a majority-skip frame still hold
    f0b = _gray(h, w, lambda x, y: 60 + (x * 5 + y * 3) % 140)
    stream2, recons2, stats2 = encode_h264_gop(
        [f0b, f0b], w, h, qp=24, return_recon=True, return_stats=True)
    assert stats2[1]["skip_mbs"] >= stats2[1]["mbs"] // 2
    outs2 = decode_h264_yuv(stream2)
    assert (outs2[1][2] == recons2[1][0]).all()


def test_gop_cropped_dimensions():
    """Non-MB-multiple sizes: the encoder references the same padded
    decoded planes the decoder uses, so the contract holds under crop."""
    h, w = 18, 34
    f0 = _gray(h, w, lambda x, y: 30 + (x * 7 + y * 5) % 180)
    f1 = _gray(h, w, lambda x, y: 30 + ((x - 2) * 7 + y * 5) % 180)
    stream, recons, _ = encode_h264_gop(
        [f0, f1], w, h, qp=22, return_recon=True, return_stats=True)
    outs = decode_h264_yuv(stream)
    assert len(outs) == 2 and outs[1][0] == w and outs[1][1] == h
    for i in range(2):
        assert (outs[i][2] == recons[i][0]).all()
        assert (outs[i][3] == recons[i][1]).all()
        assert (outs[i][4] == recons[i][2]).all()


def test_gop_pcm_fallback_inside_p_slice():
    """A P frame whose residual needs CAVLC-unrepresentable levels falls
    back to I_PCM per MB (mb_type 30 in P slices) — losslessly. With
    8-bit inputs the inter LUMA path can never exceed the escape range
    (max |level| ~1836 < the ~2064 first-level cap), so the trigger is a
    full-amplitude CHROMA flip at qp 0: the chroma DC Hadamard sums four
    block DCs (up to 4*4080) past any representable level."""
    h, w = 32, 48
    y = np.full((h, w), 100, np.uint8)
    c0 = np.full((h // 2, w // 2), 0, np.uint8)
    c1 = c0.copy()
    c1[:, w // 4:] = 255
    stream, recons, stats = encode_h264_gop(
        [(y, c0, c0), (y, c1, c1)], w, h, qp=0,
        return_recon=True, return_stats=True)
    assert stats[1]["pcm_mbs"] >= 1
    outs = decode_h264_yuv(stream)
    assert (outs[1][2] == recons[1][0]).all()
    assert (outs[1][3] == recons[1][1]).all()
    # PCM MBs are lossless: the flipped chroma matches the source exactly
    assert (outs[1][3][:, w // 4 + 8:] == c1[:, w // 4 + 8:]).all()


def test_p_slice_rejects_without_reference():
    """A stream starting with a P picture (no prior decoded picture)
    rejects cleanly."""
    h, w = 32, 48
    f0 = _gray(h, w, lambda x, y: 60 + x % 50)
    stream = encode_h264_gop([f0, f0], w, h, qp=24)
    from peerdb_spark.functions.h264 import split_nals

    nals = split_nals(stream)
    # keep SPS/PPS, drop the IDR, keep the P NAL
    keep = bytearray()
    for t, s, e in nals:
        if t in (7, 8) or t == 1:
            keep += stream[s - 4 if stream[s - 4:s] == b"\x00\x00\x00\x01" else s - 3:e]
    with pytest.raises(ValueError, match="P slice without"):
        decode_h264_yuv(bytes(keep))


def test_gop_subpel_motion_exercises_fractional_interp():
    """A HALF-SAMPLE shifted linear ramp: the 6-tap half-pel filter of a
    linear ramp is the exact midpoint, so the refined search finds a
    fractional MV on every inter MB and the decoder's sub-sample
    interpolation is exercised through the bit-exact contract (integer-MV
    streams never reach those paths)."""
    h, w = 32, 48
    ramp0 = np.arange(w, dtype=np.int32) * 4 + 20
    y0 = np.clip(np.tile(ramp0, (h, 1)), 0, 255).astype(np.uint8)
    y1 = np.clip(np.tile(ramp0 + 2, (h, 1)), 0, 255).astype(np.uint8)
    cb = np.full((h // 2, w // 2), 128, np.uint8)
    stream, recons, stats = encode_h264_gop(
        [(y0, cb, cb), (y1, cb, cb)], w, h, qp=8,
        return_recon=True, return_stats=True)
    assert stats[1]["subpel_mbs"] >= stats[1]["mbs"] - 1
    outs = decode_h264_yuv(stream)
    for k in range(2):
        assert (outs[k][2] == recons[k][0]).all()
        assert (outs[k][3] == recons[k][1]).all()
    # disabled refinement keeps the contract but stays integer
    s2, r2, st2 = encode_h264_gop(
        [(y0, cb, cb), (y1, cb, cb)], w, h, qp=8,
        return_recon=True, return_stats=True, subpel=False)
    assert st2[1]["subpel_mbs"] == 0
    outs2 = decode_h264_yuv(s2)
    assert (outs2[1][2] == r2[1][0]).all()


def test_decoded_p_frames_look_right():
    """Beyond bit-exactness: the decoded P frame of a translated scene is
    CLOSE to the translated source (lossy but faithful — MAD under 2 at
    qp 14), which pins that motion compensation actually moved content."""
    h, w = 48, 64
    f0 = _gray(h, w, lambda x, y: 40 + (x * 3 + y * 2) % 160)
    f1 = _gray(h, w, lambda x, y: 40 + ((x - 4) * 3 + y * 2) % 160)
    stream = encode_h264_gop([f0, f1], w, h, qp=14)
    outs = decode_h264_yuv(stream)
    mad = np.abs(outs[1][2].astype(int) - f1[0].astype(int)).mean()
    assert mad < 2.0
