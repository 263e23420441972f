"""AVI (RIFF) container walk for MJPEG video — public msdn/RIFF structure.

AVI is the other container camera/scan pipelines actually emit for MJPEG
(the raw concatenated form is handled by jpeg.split_mjpeg). This walks
the RIFF tree — LIST hdrl (avih, strl(strh/strf)) for stream metadata,
LIST movi for the frame chunks ('NNdc'/'NNdb' compressed/uncompressed
video), optional idx1 ignored in favor of the authoritative movi scan —
and yields per-frame byte ranges WITHOUT touching frame payloads, the
same scale posture as the MP4 sample tables and the H.264 NAL walk.

`encode_avi_mjpeg` is the minimal conforming muxer for fixtures: one
'00dc' chunk per JPEG stream, correct avih/strh counts, even-byte chunk
padding. Real players accept such files.
"""

from __future__ import annotations

import struct

__all__ = ["split_avi_frames", "parse_avi_header", "encode_avi_mjpeg"]


def _walk_riff(data: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_end) honoring even padding."""
    pos = start
    while pos + 8 <= end:
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = pos + 8
        if body + size > end:
            raise ValueError(f"truncated chunk {tag!r}")
        yield tag, body, body + size
        pos = body + size + (size & 1)


def parse_avi_header(data: bytes) -> dict:
    """AVI bytes → {width, height, n_frames, streams:[fourcc...]} from the
    hdrl list (avih + per-stream strh). Frame payloads are not read."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF/AVI signature")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if riff_size + 8 > len(data):
        raise ValueError("RIFF size exceeds payload")
    out: dict = {"streams": []}
    for tag, s, e in _walk_riff(data, 12, min(8 + riff_size, len(data))):
        if tag != b"LIST" or data[s : s + 4] != b"hdrl":
            continue
        for t2, s2, e2 in _walk_riff(data, s + 4, e):
            if t2 == b"avih":
                (_us, _rate, _pad, _flags, n_frames) = struct.unpack_from(
                    "<IIIII", data, s2
                )
                w, h = struct.unpack_from("<II", data, s2 + 32)
                out.update({"n_frames": n_frames, "width": w, "height": h})
            elif t2 == b"LIST" and data[s2 : s2 + 4] == b"strl":
                for t3, s3, _e3 in _walk_riff(data, s2 + 4, e2):
                    if t3 == b"strh":
                        out["streams"].append(
                            (data[s3 : s3 + 4].decode("latin-1"),
                             data[s3 + 4 : s3 + 8].decode("latin-1"))
                        )
                        break
    if "n_frames" not in out:
        raise ValueError("no avih header")
    return out


def split_avi_frames(data: bytes) -> list[tuple[int, int]]:
    """AVI bytes → [(offset, length)] of the video frame chunks
    ('NNdc'/'NNdb') inside LIST movi, in stream order. Pure structure walk
    — no frame payload bytes are read; idx1 (when present) is redundant
    with this authoritative scan and ignored."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF/AVI signature")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    frames: list[tuple[int, int]] = []
    for tag, s, e in _walk_riff(data, 12, min(8 + riff_size, len(data))):
        if tag != b"LIST" or data[s : s + 4] != b"movi":
            continue
        for t2, s2, e2 in _walk_riff(data, s + 4, e):
            # video data chunks: '##dc' (compressed) / '##db' (raw)
            if t2[2:4] in (b"dc", b"db") and t2[:2].isdigit():
                frames.append((s2, e2 - s2))
    return frames


def encode_avi_mjpeg(jpeg_frames: list[bytes], width: int, height: int,
                     fps: int = 25) -> bytes:
    """[complete JPEG streams] → minimal conforming AVI (vids/MJPG)."""
    if not jpeg_frames:
        raise ValueError("need at least one frame")

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (tag + struct.pack("<I", len(payload)) + payload
                + (b"\x00" if len(payload) & 1 else b""))

    def lst(fourcc: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", fourcc + payload)

    n = len(jpeg_frames)
    max_bytes = max(len(f) for f in jpeg_frames)
    avih = chunk(b"avih", struct.pack(
        "<14I", 1_000_000 // fps, max_bytes * fps, 0, 0x10, n, 0, 1,
        max_bytes, width, height, 0, 0, 0, 0))
    strh = chunk(b"strh", b"vids" + b"MJPG" + struct.pack(
        "<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n, max_bytes, 0, 0, 0))
    # BITMAPINFOHEADER for MJPG
    strf = chunk(b"strf", struct.pack(
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0))
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in jpeg_frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body
