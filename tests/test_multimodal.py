"""Multimodal kernels: REAL numpy pixel math over raw byte buffers."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from peerdb_spark.functions import multimodal as M


def _rgb_bytes(w, h, seed):
    return bytes((seed * 55 + i * 177) % 256 for i in range(w * h * 3))


def _media_df(spark, n=6, w=12, h=8):
    rows = [
        (i, _rgb_bytes(w, h, i), ("image/raw-rgb", w, h, None, "rgb"))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_extract_features_chunk_means(spark):
    df = _media_df(spark)
    rows = M.extract_features(df).collect()
    assert len(rows) == 6
    assert all(len(r["features"]) == M.FEATURE_DIM for r in rows)
    # ground truth: chunk means computed in plain python
    by_id = {r["media_id"]: r["features"] for r in rows}
    for mid in range(6):
        buf = _rgb_bytes(12, 8, mid)
        L = len(buf)
        for k in range(M.FEATURE_DIM):
            lo, hi = k * L // 16, (k + 1) * L // 16
            expect = sum(buf[lo:hi]) / ((hi - lo) * 255.0)
            assert by_id[mid][k] == pytest.approx(expect, rel=1e-6)


def test_extract_features_short_and_empty(spark):
    rows = [
        (1, b"", ("application/octet-stream", None, None, None, None)),
        (2, b"\xff" * 5, ("application/octet-stream", None, None, None, None)),
    ]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = {r["media_id"]: r["features"] for r in M.extract_features(df).collect()}
    assert out[1] == [0.0] * 16
    # 5 bytes over 16 chunks: 5 non-empty chunks of one 0xff byte each
    assert sum(1 for x in out[2] if x == pytest.approx(1.0)) == 5
    assert sum(1 for x in out[2] if x == 0.0) == 11


def test_resize_images_nearest_neighbor_exact(spark):
    w, h = 12, 8
    df = _media_df(spark, n=4, w=w, h=h)
    rows = {r["media_id"]: bytes(r["content"]) for r in M.resize_images(df, 8, 8).collect()}
    for mid in range(4):
        src = np.frombuffer(_rgb_bytes(w, h, mid), dtype=np.uint8).reshape(h, w, 3)
        expect = bytes(
            int(src[(y * h) // 8, (x * w) // 8, c])
            for y in range(8)
            for x in range(8)
            for c in range(3)
        )
        assert rows[mid] == expect
    meta = M.resize_images(df, 8, 8).collect()[0]["meta"]
    assert meta["width"] == 8 and meta["height"] == 8 and meta["mime"] == "image/raw-rgb"


def test_resize_rejects_malformed(spark):
    rows = [(1, b"short", ("image/raw-rgb", 12, 8, None, "rgb"))]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="raw RGB"):
        M.resize_images(df, 8, 8).collect()


def test_sample_frames_stride(spark):
    fb = 6
    content = bytes(range(fb * 5)) + b"\x01\x02"  # 5 frames + torn tail
    rows = [(7, content, ("video/raw-frames", None, None, 200, "raw"))]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = sorted(
        (r["frame_idx"], bytes(r["frame"]))
        for r in M.sample_frames(df, fb, stride=2).collect()
    )
    assert [i for i, _ in out] == [0, 2, 4]
    assert out[0][1] == bytes(range(0, 6))
    assert out[1][1] == bytes(range(12, 18))
    assert out[2][1] == bytes(range(24, 30))
    # stride 1 keeps every whole frame, drops the tail
    assert M.sample_frames(df, fb, stride=1).count() == 5
    # empty content → no rows
    empty = spark.createDataFrame(
        [(8, b"", ("video/raw-frames", None, None, 0, "raw"))], M.MEDIA_SCHEMA
    )
    assert M.sample_frames(empty, fb).count() == 0


def test_frame_sample_plan(spark):
    rows = [(1, b"x", ("video/raw-frames", None, None, 3500, "raw"))]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = M.frame_sample_plan(df, every_ms=1000)
    assert [r["frame_ts_ms"] for r in out.collect()] == [0, 1000, 2000, 3000]


def test_media_stats_prunes_content(spark):
    df = _media_df(spark)
    out = M.media_stats(df)
    r = out.collect()[0]
    assert r["mime"] == "image/raw-rgb" and r["n"] == 6


def test_decode_encoded_gate():
    assert M.decode_encoded(b"abc", "image/raw-rgb") == b"abc"
    # PNG and baseline JPEG decode for real now (functions/png.py, jpeg.py);
    # malformed payloads are a hard error, never silent passthrough
    from peerdb_spark.functions.png import encode_png

    assert M.decode_encoded(encode_png(bytes(3), 1, 1), "image/png") == bytes(3)
    with pytest.raises(ValueError):
        M.decode_encoded(b"\x89PNG", "image/png")  # truncated
    # formats with no codec stay explicitly gated
    with pytest.raises(NotImplementedError):
        M.decode_encoded(b"\x00\x00", "video/h264")


def test_mjpeg_split_and_stream_length():
    """split_mjpeg walks marker structure (segment lengths + entropy scan):
    exact frame boundaries across baseline, restart-interval, and
    progressive member streams; strict reject of torn tails and garbage."""
    import numpy as np
    import pytest

    from peerdb_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        jpeg_stream_length,
        split_mjpeg,
    )

    rng = np.random.RandomState(1)
    frames = []
    for f in range(4):
        img = rng.randint(0, 256, (16, 24, 3), dtype=np.uint8)
        frames.append(encode_jpeg(img.tobytes(), 24, 16, quality=70,
                                  restart_interval=2 if f == 1 else 0,
                                  progressive=(f == 3)))
    blob = b"".join(frames)
    offs = split_mjpeg(blob)
    assert [blob[o : o + ln] for o, ln in offs] == frames
    for o, ln in offs:
        decode_jpeg(blob[o : o + ln])  # every member is a complete stream
    assert jpeg_stream_length(blob) == len(frames[0])
    with pytest.raises(ValueError, match="missing SOI"):
        split_mjpeg(blob + b"\x12\x34")
    with pytest.raises(ValueError, match="truncated"):
        split_mjpeg(blob[:-2])
    with pytest.raises(ValueError):
        jpeg_stream_length(b"\xff\xd8\xff")


def test_sample_frames_mjpeg_spark(spark):
    """Arrow-path MJPEG sampling: build a 5-frame MJPEG per media in
    pandas, sample stride=2, verify exact frame indices and that decoded
    frames equal decoding each member stream directly."""
    import numpy as np

    from peerdb_spark.functions import multimodal as MM
    from peerdb_spark.functions.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.RandomState(5)
    rows = []
    want = {}
    for mid in range(3):
        members = []
        for f in range(5):
            img = rng.randint(0, 256, (8, 16, 3), dtype=np.uint8)
            members.append(encode_jpeg(img.tobytes(), 16, 8, quality=60))
        rows.append((mid, bytearray(b"".join(members))))
        for f in (0, 2, 4):
            want[(mid, f)] = decode_jpeg(members[f])
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = MM.sample_frames_mjpeg(df, stride=2)
    got = {(r["media_id"], r["frame_idx"]):
           (r["width"], r["height"], bytes(r["frame"]))
           for r in out.collect()}
    assert got == want
    # stride=1 yields every frame
    assert MM.sample_frames_mjpeg(df, stride=1).count() == 15


# -- perceptual image hash (dHash) — r9 ----------------------------------------


def test_image_dhash_hand_vector(spark):
    """9x8 source == grid → reduction is identity; a left-to-right ramp
    sets every bit (strictly increasing → gray[x] > gray[x+1] false...
    direction pinned: bit = left > right, so a DECREASING ramp sets all
    64 bits, an increasing one sets none)."""
    import numpy as np

    from peerdb_spark.functions.multimodal import image_dhash

    inc = np.tile(np.arange(9, dtype=np.uint8) * 10, (8, 1))
    dec = inc[:, ::-1].copy()
    rows = []
    for mid, g in ((0, inc), (1, dec)):
        rgb = np.repeat(g[:, :, None], 3, axis=2).tobytes()
        rows.append((mid, rgb, ("image/raw-rgb", 9, 8, None, "rgb")))
    df = spark.createDataFrame(
        rows,
        "media_id long, content binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:bigint,codec:string>",
    )
    out = {r["media_id"]: r for r in image_dhash(df).collect()}
    assert out[0]["dhash_hex"] == "0" * 16 and out[0]["dhash"] == 0
    assert out[1]["dhash_hex"] == "f" * 16 and out[1]["dhash"] == -1


def test_image_dhash_gray_is_floor_mean(spark):
    """(r+g+b)//3 floor semantics: (1,1,2) → 1 vs (2,1,1) → 1 equal (no
    bit), while (2,2,2) → 2 vs (1,1,1) → 1 sets the bit."""
    import numpy as np

    from peerdb_spark.functions.multimodal import image_dhash

    img = np.ones((8, 9, 3), dtype=np.uint8)  # gray 1 everywhere else
    img[:, 0] = (2, 2, 2)  # gray 2 > gray 1 at x=0 → bits (y, 0) set
    img[:, 1] = (1, 1, 2)  # floor(4/3) = 1 == gray(2,1,1) = 1 → no bit
    df = spark.createDataFrame(
        [(0, img.tobytes(), ("image/raw-rgb", 9, 8, None, "rgb"))],
        "media_id long, content binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:bigint,codec:string>",
    )
    (row,) = image_dhash(df).collect()
    val = int(row["dhash_hex"], 16)
    for y in range(8):
        assert val >> (y * 8) & 1 == 1
        assert val >> (y * 8 + 1) & 1 == 0


def test_hash64_hamming_pairs_banding(spark):
    """Identical hashes pair at distance 0; ≤3-bit flips are found by
    pigeonhole (flip bits in ≤3 distinct bands); 4+ scattered flips
    across all four bands are (correctly) beyond the guarantee and the
    exact verify kills ≥4-distance candidates anyway."""
    from peerdb_spark.functions.dedup import hash64_hamming_pairs

    base = 0x0123456789ABCDEF
    rows = [
        (0, base),
        (1, base),                      # d=0
        (2, base ^ 0b111),              # d=3, one band
        (3, base ^ (1 | (1 << 16) | (1 << 32) | (1 << 48))),  # d=4, all bands
    ]
    df = spark.createDataFrame(rows, "media_id long, dhash long")
    got = sorted(
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hash64_hamming_pairs(df, "dhash", "media_id").collect()
    )
    assert got == [(0, 1, 0), (0, 2, 3), (1, 2, 3)]


def test_video_fingerprint_majority_and_order_invariance(spark):
    """Round-10 video near-dup: the majority fold is order-invariant
    (frame-rate resample/trim robustness) and tolerant of one perturbed
    frame when the other frames vote consistently; a fully different
    video hashes differently."""
    import numpy as np

    from peerdb_spark.functions.multimodal import video_fingerprint

    rng = np.random.RandomState(4)
    base = rng.randint(0, 200, (16, 18, 3)).astype(np.uint8)

    def frames(vid, order, perturb=None):
        out = []
        for k, f in enumerate(order):
            fr = base.copy()
            fr[(f * 3) % 16, (f * 5) % 18] = 255  # per-frame variation
            if perturb == f:
                fr[:4, :4] = rng.randint(0, 255, (4, 4, 3))
            out.append((vid, k, bytes(fr.tobytes()), 18, 16))
        return out

    rows = (
        frames(0, [0, 1, 2, 3])
        + frames(1, [3, 1, 0, 2])          # same frames, shuffled order
        + frames(2, [0, 1, 2, 3], perturb=3)  # one frame badly perturbed
        + [(9, k, bytes(rng.randint(0, 255, (16, 18, 3), dtype=np.uint8)
                        .astype(np.uint8).tobytes()), 18, 16)
           for k in range(4)]              # unrelated video
    )
    df = spark.createDataFrame(
        rows, "media_id long, frame_idx int, frame binary, width int, height int")
    got = {r["media_id"]: r["vhash"] for r in video_fingerprint(df).collect()}
    assert got[0] == got[1]  # order-invariant
    ham = bin((got[0] ^ got[2]) & ((1 << 64) - 1)).count("1")
    assert ham <= 6  # 3-of-4 majority absorbs most of one bad frame
    ham_far = bin((got[0] ^ got[9]) & ((1 << 64) - 1)).count("1")
    assert ham_far > 10  # unrelated content stays far
