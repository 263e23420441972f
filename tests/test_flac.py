"""From-scratch FLAC codec (functions/flac.py): published CRC anchors,
bit-exact roundtrips, hand-assembled frames for the decoder paths the
encoder doesn't emit (CONSTANT, LPC, stereo decorrelation, wasted bits,
rice escape, 5-bit method), and the dispatched Spark audio ops."""

import numpy as np
import pytest

from peerdb_spark.functions.flac import (
    _BitW,
    _crc8,
    _crc16,
    encode_flac,
    parse_flac,
)


def test_crc_published_check_values():
    """CRC-8 poly 0x07 and CRC-16 poly 0x8005 (unreflected, init 0) over
    '123456789' — the published check values 0xF4 / 0xFEE8."""
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_roundtrip_depths_channels_modes():
    rng = np.random.RandomState(1)
    for bits in (8, 16, 24):
        lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        for ch in (1, 2, 3):
            for mode in ("verbatim", "fixed2"):
                s = rng.randint(lo, hi + 1, size=(700, ch)).astype(np.int32)
                r, c, b, out = parse_flac(
                    encode_flac(s, 16000, bits, block=256, subframe=mode))
                assert (r, c, b) == (16000, ch, bits)
                assert (out == s).all(), (bits, ch, mode)


def test_fixed_predictor_compresses_smooth_signals():
    t = np.arange(4000)
    s = (1000 * np.sin(t / 30) + 500 * np.sin(t / 7)).astype(np.int32)[:, None]
    data = encode_flac(s, 16000, 16, block=512)
    assert len(data) < s.size * 2 * 0.5  # better than 50% of raw PCM16
    assert (parse_flac(data)[3] == s).all()


# -- hand-assembled frames: decoder paths beyond the encoder -------------------


def _stream(frame_body_fn, ch=1, bps=16, n=8, rate=8000):
    """Build fLaC + STREAMINFO + ONE frame whose subframe bits come from
    frame_body_fn(w) — an independent test-side serializer."""
    si = _BitW()
    si.u(n, 16)
    si.u(n, 16)
    si.u(0, 24)
    si.u(0, 24)
    si.u(rate, 20)
    si.u(ch - 1, 3)
    si.u(bps - 1, 5)
    si.u(n, 36)
    meta = bytes([0x80]) + (34).to_bytes(3, "big") + bytes(si.out) + b"\x00" * 16
    w = _BitW()
    w.u(0x3FFE, 14)
    w.u(0, 2)
    w.u(7, 4)                      # blocksize: 16-bit follows
    w.u(0, 4)                      # rate from STREAMINFO
    w.u(ch - 1, 4)
    w.u({8: 1, 16: 4, 24: 6}[bps], 3)
    w.u(0, 1)
    w.u(0, 8)                      # frame number 0 (UTF-8 single byte)
    w.u(n - 1, 16)
    w.align()
    hdr = bytes(w.out)
    w.u(_crc8(hdr), 8)
    frame_body_fn(w)
    w.align()
    body = bytes(w.out)
    w.u(_crc16(body), 16)
    return b"fLaC" + meta + bytes(w.out)


def test_constant_subframe():
    def body(w):
        w.u(0, 1)
        w.u(0, 6)   # CONSTANT
        w.u(0, 1)
        w.u(-7 & 0xFFFF, 16)

    _, _, _, out = parse_flac(_stream(body))
    assert (out[:, 0] == -7).all()


def test_lpc_subframe_hand_computed():
    """LPC order 1, coefficient 2, shift 1: pred = (2·prev)>>1 = prev, so
    with residuals [1, 1, ...] the signal counts up from the warmup."""
    def body(w):
        w.u(0, 1)
        w.u(32, 6)  # LPC order 1
        w.u(0, 1)
        w.u(5, 16)       # warmup sample
        w.u(2, 4)        # precision-1 = 2 → 3 bits
        w.u(1, 5)        # shift 1
        w.u(2, 3)        # coefficient +2
        w.u(0, 2)        # rice method 0
        w.u(0, 4)        # partition order 0
        w.u(1, 4)        # rice k=1
        for _ in range(7):  # residual +1 → zigzag 2 → q=1: '01', rem 0
            w.u(0b010, 3)

    _, _, _, out = parse_flac(_stream(body))
    assert out[:, 0].tolist() == [5, 6, 7, 8, 9, 10, 11, 12]


def test_stereo_decorrelation_all_three():
    """left/side, right/side, mid/side — verbatim subframes built from a
    known (L, R) pair; the reconstruction must invert exactly (side gets
    the +1-bit lane)."""
    L = [100, -50, 3, 0, 77, -128, 12, 9]
    R = [90, -60, 3, 1, -77, 127, -12, 9]

    def verbatim(w, vals, bits):
        w.u(0, 1)
        w.u(1, 6)
        w.u(0, 1)
        for v in vals:
            w.u(v & ((1 << bits) - 1), bits)

    side = [l - r for l, r in zip(L, R)]
    mid = [(l + r) >> 1 for l, r in zip(L, R)]

    def assemble(ca, chans_bits):
        si = _BitW()
        si.u(8, 16); si.u(8, 16); si.u(0, 24); si.u(0, 24)
        si.u(8000, 20); si.u(1, 3); si.u(15, 5); si.u(8, 36)
        meta = bytes([0x80]) + (34).to_bytes(3, "big") + bytes(si.out) + b"\x00" * 16
        w = _BitW()
        w.u(0x3FFE, 14); w.u(0, 2)
        w.u(7, 4); w.u(0, 4); w.u(ca, 4); w.u(4, 3); w.u(0, 1)
        w.u(0, 8); w.u(7, 16)
        w.align()
        w.u(_crc8(bytes(w.out)), 8)
        for vals, bits in chans_bits:
            verbatim(w, vals, bits)
        w.align()
        w.u(_crc16(bytes(w.out)), 16)
        return b"fLaC" + meta + bytes(w.out)

    for ca, chans in ((8, [(L, 16), (side, 17)]),
                      (9, [(side, 17), (R, 16)]),
                      (10, [(mid, 16), (side, 17)])):
        _, c, _, out = parse_flac(assemble(ca, chans))
        assert c == 2
        assert out[:, 0].tolist() == L and out[:, 1].tolist() == R, ca


def test_wasted_bits_and_rice_escape():
    """A subframe with 2 wasted bits shifts every output left by 2; an
    escaped rice partition stores raw 5-bit residuals."""
    def body(w):
        w.u(0, 1)
        w.u(8, 6)     # FIXED order 0 (pure residuals)
        w.u(1, 1)     # wasted-bits flag
        w.u(1, 2)     # unary 1 → wasted = 2
        w.u(0, 2)     # rice method 0
        w.u(0, 4)     # partition order 0
        w.u(0xF, 4)   # ESCAPE
        w.u(5, 5)     # raw residuals are 5-bit signed
        for v in (1, -2, 3, -4, 5, -6, 7, -8):
            w.u(v & 0x1F, 5)

    _, _, _, out = parse_flac(_stream(body))
    assert out[:, 0].tolist() == [4, -8, 12, -16, 20, -24, 28, -32]


def test_rejects():
    rng = np.random.RandomState(2)
    s = rng.randint(-1000, 1000, size=(300, 1)).astype(np.int32)
    good = encode_flac(s, 8000, 16)
    # OggS magic now routes into the Ogg layer (round 10), which must
    # cleanly reject a stream that is not really Ogg
    with pytest.raises(ValueError):
        parse_flac(b"OggS" + good[4:])
    with pytest.raises(ValueError, match="magic"):
        parse_flac(b"fLaX" + good[4:])
    with pytest.raises(ValueError):
        parse_flac(good[:-5])
    bad = bytearray(good)
    bad[-1] ^= 0xFF  # frame CRC-16
    with pytest.raises(ValueError, match="CRC"):
        parse_flac(bytes(bad))
    with pytest.raises(ValueError, match="range"):
        encode_flac(np.full((4, 1), 300, np.int32), 8000, 8)


# -- Spark dispatch -------------------------------------------------------------


def test_audio_ops_accept_flac(spark):
    """decode_audio / audio_frame_features dispatch FLAC by magic and
    produce byte-identical results to the same samples as WAV."""
    from peerdb_spark.functions.audio import encode_wav
    from peerdb_spark.functions.multimodal import (
        audio_frame_features,
        decode_audio,
    )

    rng = np.random.RandomState(3)
    s = rng.randint(-2000, 2000, size=(500, 2)).astype(np.int32)
    df = spark.createDataFrame(
        [(0, encode_wav(s, 16000, 16)), (1, encode_flac(s, 16000, 16))],
        "media_id long, content binary")
    dec = {r["media_id"]: r for r in decode_audio(df).collect()}
    assert bytes(dec[0]["pcm"]) == bytes(dec[1]["pcm"])
    assert dec[1]["sample_rate"] == 16000 and dec[1]["bit_depth"] == 16
    feats = audio_frame_features(df, frame_len=100).collect()
    by = {}
    for r in feats:
        by.setdefault(r["media_id"], []).append(
            (r["frame_idx"], r["sum_sq"], r["zero_crossings"], r["peak"]))
    assert sorted(by[0]) == sorted(by[1])


def test_32bit_full_range_and_escape_paths():
    """32-bit samples: full-range noise forces the VERBATIM fallback
    (order-2 residuals exceed the 31-bit raw escape) and the escape path
    itself; smooth 32-bit data exercises rice. All bit-exact."""
    rng = np.random.RandomState(9)
    s = (rng.randint(-(1 << 31), (1 << 31) - 1, size=(600, 2), dtype=np.int64)
         .astype(np.int32))
    for mode in ("verbatim", "fixed2"):
        r, c, b, out = parse_flac(
            encode_flac(s, 48000, 32, block=256, subframe=mode))
        assert (r, c, b) == (48000, 2, 32) and (out == s).all(), mode
    t = np.arange(2000)
    sm = (200000 * np.sin(t / 40)).astype(np.int32)[:, None]
    assert (parse_flac(encode_flac(sm, 48000, 32, block=512))[3] == sm).all()


def test_transcode_wav_flac_32bit(spark):
    """commit 3ae9bdb taught the codec 32-bit encode; the operator gate
    (transcode_wav_flac) must accept 32-bit WAV input too (ADVICE r9).
    Samples roundtrip bit-exact through the transcoded FLAC."""
    from peerdb_spark.functions.audio import encode_wav
    from peerdb_spark.functions.multimodal import transcode_wav_flac

    rng = np.random.RandomState(11)
    s = rng.randint(-(1 << 30), 1 << 30, size=(300, 1)).astype(np.int32)
    df = spark.createDataFrame(
        [(0, encode_wav(s, 8000, 32))], "media_id long, content binary")
    out = transcode_wav_flac(df).collect()
    rate, ch, bits, got = parse_flac(bytes(out[0]["content"]))
    assert (rate, ch, bits) == (8000, 1, 32) and (got == s).all()
