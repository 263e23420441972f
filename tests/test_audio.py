"""Audio layer (functions/audio.py + multimodal Spark ops): WAV codec
roundtrips across depths, hand-checked feature/resample vectors, chunk-walk
robustness, and the Arrow-batched Spark paths."""

import struct

import numpy as np
import pytest

from peerdb_spark.functions.audio import (
    encode_wav,
    frame_features,
    parse_wav,
    resample_linear,
)


def _wav_header(fmt_payload: bytes, data: bytes) -> bytes:
    chunks = (b"fmt " + struct.pack("<I", len(fmt_payload)) + fmt_payload
              + b"data" + struct.pack("<I", len(data)) + data
              + (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


# -- codec ---------------------------------------------------------------------


def test_pcm_roundtrip_all_depths_channels():
    rng = np.random.RandomState(1)
    for bits in (8, 16, 24, 32):
        lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        for ch in (1, 2, 3):
            s = rng.randint(lo, hi + 1, size=(37, ch)).astype(np.int32)
            rate, c, b, out = parse_wav(encode_wav(s, 16000, bits))
            assert (rate, c, b) == (16000, ch, bits)
            assert (out == s).all(), (bits, ch)


def test_24bit_sign_extension():
    """0x800000 is the most negative 24-bit value; 0x7FFFFF the most
    positive — the packed little-endian bytes must sign-extend."""
    s = np.array([[-(1 << 23)], [(1 << 23) - 1], [-1], [0]], dtype=np.int32)
    _, _, _, out = parse_wav(encode_wav(s, 8000, 24))
    assert out[:, 0].tolist() == [-(1 << 23), (1 << 23) - 1, -1, 0]


def test_float32_decode_scales_to_int16_range():
    f = np.array([[0.0], [0.5], [-1.0], [0.999969482421875]], dtype="<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
    rate, ch, bits, out = parse_wav(_wav_header(fmt, f.tobytes()))
    assert (rate, ch, bits) == (8000, 1, 32)
    assert out[:, 0].tolist() == [0, 16384, -32768, 32767]


def test_extensible_header_unwraps():
    """WAVE_FORMAT_EXTENSIBLE (0xFFFE) carries the real tag in the GUID."""
    samples = np.array([[100], [-100]], dtype=np.int32)
    data = samples.astype("<i2").tobytes()
    # base(16) + cbSize + validBits + channelMask + GUID (tag in first 2)
    fmt = (struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
           + struct.pack("<HHI", 22, 16, 0x4)
           + struct.pack("<H", 1) + b"\x00" * 14)
    rate, ch, bits, out = parse_wav(_wav_header(fmt, data))
    assert (out[:, 0] == [100, -100]).all()


def test_chunk_walk_skips_metadata_and_pads():
    """LIST/fact chunks (odd-sized, so padded) between fmt and data must
    be skipped per the RIFF even-byte rule."""
    samples = np.array([[7], [-7], [9]], dtype=np.int32)
    good = encode_wav(samples, 8000, 16)
    # splice an odd-length LIST chunk right after fmt
    fmt_end = good.index(b"data")
    lst = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = good[:fmt_end] + lst + good[fmt_end:]
    spliced = spliced[:4] + struct.pack(
        "<I", struct.unpack("<I", spliced[4:8])[0] + len(lst)) + spliced[8:]
    _, _, _, out = parse_wav(spliced)
    assert (out[:, 0] == [7, -7, 9]).all()


def test_rejects():
    s = np.zeros((4, 1), dtype=np.int32)
    good = encode_wav(s, 8000, 16)
    with pytest.raises(ValueError, match="signature"):
        parse_wav(b"OggS" + good[4:])
    with pytest.raises(ValueError, match="truncated|exceeds"):
        parse_wav(good[:-3])
    # compressed formats are an honest gate (G.711 decodes since r9)
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 8000, 1, 4)  # MS ADPCM
    with pytest.raises(NotImplementedError, match="codec"):
        parse_wav(_wav_header(fmt, b"\x00" * 4))
    # torn frame boundary
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
    with pytest.raises(ValueError, match="whole number"):
        parse_wav(_wav_header(fmt, b"\x00" * 6))
    with pytest.raises(ValueError, match="range"):
        encode_wav(np.full((1, 1), 200, np.int32), 8000, 8)


# -- kernels -------------------------------------------------------------------


def test_frame_features_hand_vector():
    s = np.array([[1], [-2], [3], [0], [-1], [5], [6]], dtype=np.int32)
    # frame 0 [1,-2,3,0]: sum_sq 14, signs 1,-1,1 → 2 crossings, peak 3
    # frame 1 [-1,5,6]: sum_sq 62, 1 crossing, peak 6 (partial frame kept)
    assert frame_features(s, 4) == [(0, 4, 14, 2, 3), (1, 3, 62, 1, 6)]


def test_frame_features_stereo_mixdown_floor():
    """Mixdown is floor-toward-minus-inf of the channel mean: (-3 + 2)//2
    = -1 (NOT 0) — the SQL-restatable convention."""
    s = np.array([[-3, 2]], dtype=np.int32)
    assert frame_features(s, 4) == [(0, 1, 1, 0, 1)]


def test_resample_vectors():
    s = np.arange(0, 50, 5, dtype=np.int32)[:, None]
    up = resample_linear(s, 8000, 16000)
    assert up.shape[0] == 20
    # j=1 → source pos 0.5 → (0+5)/2 = 2.5 → round half up = 3
    assert up[:4, 0].tolist() == [0, 3, 5, 8]
    down = resample_linear(s, 16000, 8000)
    assert (down[:, 0] == s[::2, 0]).all()
    assert (resample_linear(s, 8000, 8000) == s).all()
    # past-the-end positions clamp to the final sample
    tail = resample_linear(np.array([[10], [20]], np.int32), 2, 3)
    assert tail[:, 0].tolist() == [10, 17, 20]


# -- Spark paths ---------------------------------------------------------------


def test_decode_audio_spark(spark):
    from peerdb_spark.functions.multimodal import decode_audio

    rng = np.random.RandomState(2)
    rows = []
    truth = {}
    for mid, (bits, ch) in enumerate([(16, 1), (24, 2), (8, 1)]):
        lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
        s = rng.randint(lo, hi + 1, size=(50, ch)).astype(np.int32)
        truth[mid] = (bits, ch, s)
        rows.append((mid, encode_wav(s, 8000 * (mid + 1), bits)))
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r for r in decode_audio(df).collect()}
    for mid, (bits, ch, s) in truth.items():
        r = out[mid]
        assert (r["sample_rate"], r["channels"], r["bit_depth"],
                r["n_samples"]) == (8000 * (mid + 1), ch, bits, 50)
        got = np.frombuffer(bytes(r["pcm"]), dtype="<i4").reshape(50, ch)
        assert (got == s).all()


def test_audio_frame_features_spark(spark):
    from peerdb_spark.functions.multimodal import audio_frame_features

    rng = np.random.RandomState(3)
    s = rng.randint(-1000, 1000, size=(130, 2)).astype(np.int32)
    df = spark.createDataFrame(
        [(1, encode_wav(s, 16000, 16))], "media_id long, content binary")
    got = sorted(
        (r["frame_idx"], r["n_samples"], r["sum_sq"], r["zero_crossings"],
         r["peak"])
        for r in audio_frame_features(df, frame_len=64).collect()
    )
    want = [tuple(f) for f in frame_features(s, 64)]
    assert got == want
    assert got[-1][1] == 130 - 2 * 64  # trailing partial frame kept


def test_resample_audio_spark(spark):
    from peerdb_spark.functions.multimodal import resample_audio

    s = np.arange(0, 500, 5, dtype=np.int32)[:, None]
    df = spark.createDataFrame(
        [(1, encode_wav(s, 8000, 16))], "media_id long, content binary")
    r = resample_audio(df, 16000).collect()[0]
    got = np.frombuffer(bytes(r["pcm"]), dtype="<i4").reshape(-1, 1)
    want = resample_linear(s, 8000, 16000)
    assert r["sample_rate"] == 16000 and (got == want).all()


# -- G.711 companding (format tags 6/7) — r9 ----------------------------------


def test_g711_canonical_anchors():
    """The published G.711 16-bit expansion constants: mu-law extrema
    ±32124 with TWO zero codes (0xFF, 0x7F); A-law extrema ±32256 with
    minimum magnitude 8 (no zero). Monotone magnitude within each sign
    half — the properties every published table satisfies."""
    from peerdb_spark.functions.audio import _alaw_table, _mulaw_table

    mu, al = _mulaw_table(), _alaw_table()
    assert (int(mu.min()), int(mu.max())) == (-32124, 32124)
    assert mu[0xFF] == 0 and mu[0x7F] == 0 and mu[0x00] == -32124
    assert (int(al.min()), int(al.max())) == (-32256, 32256)
    assert al[0x55] == -8 and al[0xD5] == 8  # a^0x55 = 0 / 0x80
    assert int(np.abs(al).min()) == 8
    # positive half (codes 0x80..0xFF) descends to zero; negative half
    # (0x00..0x7F) ascends from -32124 to zero
    assert np.all(np.diff(mu[0x80:0x100].astype(int)) <= 0)
    assert np.all(np.diff(mu[0x00:0x80].astype(int)) >= 0)


def test_g711_wav_decode():
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 8000, 1, 8)
    data = bytes([0xFF, 0x7F, 0x00, 0x80])
    _, _, bits, out = parse_wav(_wav_header(fmt, data))
    assert bits == 8 and out[:, 0].tolist() == [0, 0, -32124, 32124]
    fmt = struct.pack("<HHIIHH", 6, 2, 8000, 16000, 2, 8)
    data = bytes([0x55, 0xD5, 0x2A, 0xAA])
    _, ch, _, out = parse_wav(_wav_header(fmt, data))
    assert ch == 2 and out.reshape(-1).tolist() == [-8, 8, -32256, 32256]
    # G.711 is 8-bit by definition
    fmt = struct.pack("<HHIIHH", 7, 1, 8000, 16000, 2, 16)
    with pytest.raises(ValueError, match="8-bit"):
        parse_wav(_wav_header(fmt, bytes(4)))


# -- audio near-dup fingerprint — r9 -------------------------------------------


def test_audio_fingerprint_sign_invariance(spark):
    """Energy-delta fingerprints are invariant to sample sign flips (sum
    of squares) but change when a frame's energy dents."""
    from peerdb_spark.functions.multimodal import audio_fingerprint

    rng = np.random.RandomState(7)
    s = rng.randint(-300, 300, size=(65 * 16, 1)).astype(np.int32)
    flipped = s.copy()
    flipped[::3] *= -1
    # boost frame 10 far above its neighbors: only the two deltas
    # touching frame 10 can change
    dented = s.copy()
    dented[10 * 16 : 11 * 16] *= 100
    rows = [(i, encode_wav(x, 16000, 16)) for i, x in
            enumerate((s, flipped, dented))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r["fp_hex"] for r in
           audio_fingerprint(df, frame_len=16).collect()}
    assert out[0] == out[1]

    def expect(x):
        e = [0] * 65
        for fi, _n, sq, _zc, _pk in frame_features(x, 16):
            e[fi] = sq
        return sum((e[f + 1] > e[f]) << f for f in range(64))

    # exact cross-check against the (hand-vector-tested) feature kernel
    assert int(out[0], 16) == expect(s)
    assert int(out[2], 16) == expect(dented)
    diff = int(out[0], 16) ^ int(out[2], 16)
    assert diff and diff & ~(0b11 << 9) == 0  # only bits 9/10 differ


def test_audio_fingerprint_hand_vector(spark):
    """Monotone-increasing frame energies set every delta bit; decreasing
    set none — pins the bit direction and missing-frames-as-zero rule."""
    from peerdb_spark.functions.multimodal import audio_fingerprint

    up = np.concatenate(
        [np.full(16, f + 1, dtype=np.int32) for f in range(65)])[:, None]
    down = up[::-1].copy()
    short = up[: 16 * 3]  # 3 frames: bits 0,1 set; frames 3.. are energy 0
    df = spark.createDataFrame(
        [(0, encode_wav(up, 8000, 16)), (1, encode_wav(down, 8000, 16)),
         (2, encode_wav(short, 8000, 16))],
        "media_id long, content binary")
    out = {r["media_id"]: int(r["fp_hex"], 16) for r in
           audio_fingerprint(df, frame_len=16).collect()}
    assert out[0] == (1 << 64) - 1
    assert out[1] == 0
    assert out[2] == 0b11  # E1>E0, E2>E1, then zeros forever
