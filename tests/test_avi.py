"""AVI/RIFF MJPEG container (functions/avi.py): header parse, movi frame
index, mux→split→decode equivalence with raw MJPEG, padding rules, and the
auto-detecting Spark sampler."""

import struct

import numpy as np
import pytest

from peerdb_spark.functions.avi import (
    encode_avi_mjpeg,
    parse_avi_header,
    split_avi_frames,
)
from peerdb_spark.functions.jpeg import decode_jpeg, encode_jpeg


def _jpegs(n=4, w=16, h=16):
    rng = np.random.RandomState(5)
    out = []
    for i in range(n):
        rgb = rng.randint(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
        out.append(encode_jpeg(rgb, w, h, quality=70,
                               progressive=bool(i % 2)))
    return out


def test_header_parse():
    frames = _jpegs(3, 24, 16)
    avi = encode_avi_mjpeg(frames, 24, 16, fps=30)
    hdr = parse_avi_header(avi)
    assert (hdr["width"], hdr["height"], hdr["n_frames"]) == (24, 16, 3)
    assert hdr["streams"] == [("vids", "MJPG")]


def test_split_returns_exact_frame_bytes():
    frames = _jpegs(5)
    avi = encode_avi_mjpeg(frames, 16, 16)
    ranges = split_avi_frames(avi)
    assert len(ranges) == 5
    for (off, ln), f in zip(ranges, frames):
        assert avi[off : off + ln] == f
        w, h, _rgb = decode_jpeg(avi[off : off + ln])
        assert (w, h) == (16, 16)


def test_odd_sized_frames_pad_even():
    """A JPEG of odd length forces the RIFF even-padding rule; the NEXT
    frame must still be found at the padded boundary."""
    frames = _jpegs(3)
    if len(frames[0]) % 2 == 0:
        frames[0] += b""  # encode_jpeg output length varies; force odd:
        frames[0] = frames[0] + b"" if len(frames[0]) % 2 else frames[0]
    # guarantee an odd frame by truncating a COPY only for the container
    odd = frames[0] + b"\xd9"  # extra byte → odd/even flip
    if len(odd) % 2 == 0:
        odd += b"\x00"
    avi = encode_avi_mjpeg([odd, frames[1]], 16, 16)
    ranges = split_avi_frames(avi)
    assert len(ranges) == 2
    off, ln = ranges[0]
    assert avi[off : off + ln] == odd and ln % 2 == 1
    off2, ln2 = ranges[1]
    assert avi[off2 : off2 + ln2] == frames[1]


def test_rejects():
    with pytest.raises(ValueError, match="signature"):
        split_avi_frames(b"RIFFxxxxWAVE" + b"\x00" * 16)
    avi = encode_avi_mjpeg(_jpegs(2), 16, 16)
    with pytest.raises(ValueError, match="truncated|exceeds"):
        split_avi_frames(avi[:-9])
    with pytest.raises(ValueError):
        encode_avi_mjpeg([], 16, 16)
    with pytest.raises(ValueError, match="avih"):
        # movi list without hdrl
        body = b"AVI " + b"LIST" + struct.pack("<I", 4) + b"movi"
        parse_avi_header(b"RIFF" + struct.pack("<I", len(body)) + body)


def test_sampler_auto_detects_avi(spark):
    from peerdb_spark.functions.multimodal import sample_frames_mjpeg

    frames = _jpegs(4)
    raw = b"".join(frames)
    avi = encode_avi_mjpeg(frames, 16, 16)
    df = spark.createDataFrame(
        [(0, raw), (1, avi)], "media_id long, content binary")
    out = sample_frames_mjpeg(df, stride=2).collect()
    assert sorted((r["media_id"], r["frame_idx"]) for r in out) == [
        (0, 0), (0, 2), (1, 0), (1, 2)]
    by = {(r["media_id"], r["frame_idx"]): bytes(r["frame"]) for r in out}
    # both containers decode the SAME frames → identical pixels
    for fi in (0, 2):
        assert by[(0, fi)] == by[(1, fi)] == decode_jpeg(frames[fi])[2]
