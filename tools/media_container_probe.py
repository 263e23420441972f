"""Probe: container frame-sampling cost = index walk + selected decodes.

Verifies the scale claim the r9 container layers make — that SKIPPED
frames cost index/walk only — with wall-clock numbers on synthetic
400-frame streams: MJPEG (marker walk), raw H.264 Annex-B (NAL walk),
and MP4 (moov sample tables). For each: index-only time, full decode
(stride 1), and stride-8 decode; the claim holds iff
t(stride 8) ≈ t(index) + t(full)/8, i.e. the walk does not grow with the
decode work avoided.

Usage: python tools/media_container_probe.py [n_frames]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from peerdb_spark.functions.h264 import (  # noqa: E402
    decode_h264,
    encode_h264_ipcm,
    split_h264_frames,
    split_nals,
)
from peerdb_spark.functions.jpeg import (  # noqa: E402
    decode_jpeg,
    encode_jpeg,
    split_mjpeg,
)
from peerdb_spark.functions.mp4 import (  # noqa: E402
    encode_mp4_h264,
    mp4_sample_ranges,
    mp4_sample_to_annexb,
    parse_mp4,
)


def _t(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    rng = np.random.default_rng(1)
    w, h = 64, 48

    # MJPEG
    jpegs = [
        encode_jpeg(
            rng.integers(0, 256, w * h * 3, dtype=np.uint8).tobytes(),
            w, h, quality=70)
        for _ in range(n)
    ]
    mjpeg = b"".join(jpegs)

    def mjpeg_decode(stride):
        for j, (off, ln) in enumerate(split_mjpeg(mjpeg)):
            if j % stride == 0:
                decode_jpeg(mjpeg[off : off + ln])

    t_idx = _t(lambda: split_mjpeg(mjpeg))
    t_full = _t(lambda: mjpeg_decode(1), reps=1)
    t_s8 = _t(lambda: mjpeg_decode(8), reps=1)
    print(f"MJPEG   {len(mjpeg)/1e6:6.1f} MB {n} frames: "
          f"index {t_idx*1e3:7.1f} ms | full {t_full:6.2f} s | "
          f"stride8 {t_s8:6.2f} s | predicted {t_idx + t_full/8:6.2f} s")

    # H.264 Annex-B (I_PCM)
    pics = [
        encode_h264_ipcm(
            [(rng.integers(0, 256, (h, w), dtype=np.uint8),
              rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8),
              rng.integers(0, 256, (h // 2, w // 2), dtype=np.uint8))],
            w, h)
        for _ in range(n)
    ]
    annexb = b"".join(pics)
    seen = set()
    parts = []
    for t, s, e in split_nals(annexb):
        if t in (7, 8) and annexb[s:e] not in seen:
            seen.add(annexb[s:e])
            parts.append(b"\x00\x00\x00\x01" + annexb[s:e])
    ps = b"".join(parts)  # deduped, like sample_frames_h264

    def h264_decode(stride):
        for j, (off, end, _idr) in enumerate(split_h264_frames(annexb)):
            if j % stride == 0:
                decode_h264(ps + annexb[off:end])

    t_idx = _t(lambda: split_h264_frames(annexb))
    t_full = _t(lambda: h264_decode(1), reps=1)
    t_s8 = _t(lambda: h264_decode(8), reps=1)
    print(f"H.264   {len(annexb)/1e6:6.1f} MB {n} pics:   "
          f"index {t_idx*1e3:7.1f} ms | full {t_full:6.2f} s | "
          f"stride8 {t_s8:6.2f} s | predicted {t_idx + t_full/8:6.2f} s")

    # MP4
    mp4 = encode_mp4_h264(pics, w, h)
    trk = parse_mp4(mp4)["tracks"][0]

    def mp4_decode(stride):
        trk2 = parse_mp4(mp4)["tracks"][0]
        for j, (off, size, _sync, _dts) in enumerate(mp4_sample_ranges(trk2)):
            if j % stride == 0:
                decode_h264(mp4_sample_to_annexb(mp4, trk2, off, size))

    t_idx = _t(lambda: mp4_sample_ranges(parse_mp4(mp4)["tracks"][0]))
    t_full = _t(lambda: mp4_decode(1), reps=1)
    t_s8 = _t(lambda: mp4_decode(8), reps=1)
    print(f"MP4     {len(mp4)/1e6:6.1f} MB {n} samples:"
          f" index {t_idx*1e3:7.1f} ms | full {t_full:6.2f} s | "
          f"stride8 {t_s8:6.2f} s | predicted {t_idx + t_full/8:6.2f} s")


if __name__ == "__main__":
    main()
