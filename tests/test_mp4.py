"""MP4/ISO-BMFF layer (functions/mp4.py): box walk, sample-table
resolution, avcC parameter sets, mux→parse→decode roundtrips through the
H.264 I_PCM path, multi-chunk stsc expansion, and the Spark sampler."""

import struct

import numpy as np
import pytest

from peerdb_spark.functions.h264 import decode_h264_yuv, encode_h264_ipcm
from peerdb_spark.functions.mp4 import (
    _box,
    encode_mp4_h264,
    mp4_sample_ranges,
    mp4_sample_to_annexb,
    parse_mp4,
    walk_boxes,
)


def _mkframe(rng, w, h):
    return (
        rng.randint(0, 256, (h, w)).astype(np.uint8),
        rng.randint(0, 256, ((h + 1) // 2, (w + 1) // 2)).astype(np.uint8),
        rng.randint(0, 256, ((h + 1) // 2, (w + 1) // 2)).astype(np.uint8),
    )


def _mp4(rng, w=32, h=16, n=4):
    frames = [_mkframe(rng, w, h) for _ in range(n)]
    pics = [encode_h264_ipcm([f], w, h) for f in frames]
    return frames, encode_mp4_h264(pics, w, h)


# -- box layer ------------------------------------------------------------------


def test_box_walk_sizes():
    data = _box(b"aaaa", b"xy") + _box(b"bbbb", b"")
    assert [(t, data[s:e]) for t, s, e in walk_boxes(data)] == [
        (b"aaaa", b"xy"), (b"bbbb", b"")]
    # largesize (size==1 + 64-bit length)
    big = struct.pack(">I", 1) + b"cccc" + struct.pack(">Q", 19) + b"pay"
    assert [(t, big[s:e]) for t, s, e in walk_boxes(big)] == [(b"cccc", b"pay")]
    # size==0: to end of container
    tail = struct.pack(">I", 0) + b"dddd" + b"rest"
    assert [(t, tail[s:e]) for t, s, e in walk_boxes(tail)] == [(b"dddd", b"rest")]
    with pytest.raises(ValueError, match="invalid box size"):
        list(walk_boxes(struct.pack(">I", 4) + b"eeee"))
    with pytest.raises(ValueError, match="overruns"):
        list(walk_boxes(struct.pack(">I", 100) + b"ffff"))


# -- parse + sample tables --------------------------------------------------------


def test_parse_own_mux():
    rng = np.random.RandomState(1)
    _, mp4 = _mp4(rng, 32, 16, 4)
    trk = parse_mp4(mp4)["tracks"][0]
    assert trk["codec"] == "avc1"
    assert (trk["width"], trk["height"]) == (32, 16)
    assert trk["nal_length_size"] == 4
    assert len(trk["sps"]) == 1 and len(trk["pps"]) == 1
    assert trk["timescale"] == 90000
    ranges = mp4_sample_ranges(trk)
    assert len(ranges) == 4
    assert all(sync for _, _, sync, _ in ranges)  # all-IDR stream
    assert [d for *_r, d in ranges] == [0, 3000, 6000, 9000]
    # offsets must tile the mdat payload contiguously
    for (o1, s1, *_a), (o2, *_b) in zip(ranges, ranges[1:]):
        assert o1 + s1 == o2


def test_container_roundtrip_bit_exact():
    rng = np.random.RandomState(2)
    frames, mp4 = _mp4(rng, 20, 14, 3)  # cropped dims through the container
    trk = parse_mp4(mp4)["tracks"][0]
    for i, (off, size, _sync, _dts) in enumerate(mp4_sample_ranges(trk)):
        annexb = mp4_sample_to_annexb(mp4, trk, off, size)
        (w, h, oy, ocb, ocr), = decode_h264_yuv(annexb)
        Y, Cb, Cr = frames[i]
        assert (w, h) == (20, 14)
        assert (oy == Y).all() and (ocb == Cb).all() and (ocr == Cr).all()


def test_multichunk_stsc_resolution():
    """Hand-edit the mux into 2 chunks (3 samples = 2 + 1) and check the
    stsc run expansion: chunk 1 holds samples 1-2, chunk 2 holds 3."""
    rng = np.random.RandomState(3)
    frames, mp4 = _mp4(rng, 16, 16, 3)
    trk = parse_mp4(mp4)["tracks"][0]
    flat = mp4_sample_ranges(trk)
    # rewrite the tables: two stsc runs + two chunk offsets, same bytes
    trk2 = dict(trk)
    trk2["sample_to_chunk"] = [(1, 2, 1), (2, 1, 1)]
    trk2["chunk_offsets"] = [flat[0][0], flat[2][0]]
    got = mp4_sample_ranges(trk2)
    assert [(o, s) for o, s, *_ in got] == [(o, s) for o, s, *_ in flat]
    # a run table that does not cover the chunks must reject
    trk3 = dict(trk2)
    trk3["chunk_offsets"] = [flat[0][0]]
    with pytest.raises(ValueError, match="cover|samples"):
        mp4_sample_ranges(trk3)


def test_stss_marks_keyframes():
    """If stss lists only sample 1, the others are non-sync."""
    rng = np.random.RandomState(4)
    _, mp4 = _mp4(rng, 16, 16, 3)
    trk = parse_mp4(mp4)["tracks"][0]
    trk2 = dict(trk)
    trk2["sync_samples"] = {1}
    assert [sync for _, _, sync, _ in mp4_sample_ranges(trk2)] == [
        True, False, False]
    # absent stss ⇒ all sync (spec default)
    trk2["sync_samples"] = None
    assert all(sync for _, _, sync, _ in mp4_sample_ranges(trk2))


def test_rejects():
    rng = np.random.RandomState(5)
    _, mp4 = _mp4(rng, 16, 16, 2)
    with pytest.raises(ValueError, match="moov"):
        parse_mp4(mp4[: mp4.index(b"moov") - 4])
    with pytest.raises(ValueError):
        parse_mp4(b"\x00\x00\x00\x08ftyp" + b"\x00\x00\x10\x00mdat")
    trk = parse_mp4(mp4)["tracks"][0]
    off, size, *_x = mp4_sample_ranges(trk)[0]
    # sample range past EOF
    with pytest.raises(ValueError, match="exceeds|overruns"):
        mp4_sample_to_annexb(mp4[: off + 4], trk, off, size)
    with pytest.raises(ValueError):
        encode_mp4_h264([], 16, 16)
    with pytest.raises(ValueError, match="VCL"):
        encode_mp4_h264([b"\x00\x00\x00\x01\x67\x42\x00\x1e"], 16, 16)


# -- Spark path -------------------------------------------------------------------


def test_sample_frames_mp4_spark(spark):
    from peerdb_spark.functions.h264 import decode_h264
    from peerdb_spark.functions.multimodal import sample_frames_mp4

    rng = np.random.RandomState(6)
    rows, truth = [], {}
    for mid in range(2):
        frames, mp4 = _mp4(rng, 32, 16, 4)
        truth[mid] = frames
        rows.append((mid, mp4))
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = sample_frames_mp4(df, stride=2).collect()
    assert sorted((r["media_id"], r["frame_idx"]) for r in out) == [
        (0, 0), (0, 2), (1, 0), (1, 2)]
    for r in out:
        Y, Cb, Cr = truth[r["media_id"]][r["frame_idx"]]
        want = decode_h264(encode_h264_ipcm([(Y, Cb, Cr)], 32, 16))[0][2]
        assert bytes(r["frame"]) == want
        assert (r["width"], r["height"]) == (32, 16)
