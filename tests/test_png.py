"""From-scratch PNG codec (functions/png.py): spec-vector unfilter tests,
encode→decode roundtrips across every filter and color type, corruption
rejection, and the Spark decode_images path over Arrow batches."""

import struct
import zlib

import numpy as np
import pytest

from peerdb_spark.functions.png import _SIGNATURE, _chunk, decode_png, encode_png


def _manual_png(width, height, color_type, scanlines, plte=None):
    """Assemble a PNG from hand-built filtered scanlines (bytes incl. the
    per-row filter byte) — the decoder is tested against the SPEC, not
    against our own encoder."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    body = _SIGNATURE + _chunk(b"IHDR", ihdr)
    if plte is not None:
        body += _chunk(b"PLTE", bytes(plte))
    return body + _chunk(b"IDAT", zlib.compress(bytes(scanlines))) + _chunk(b"IEND", b"")


# -- decoder vs hand-computed spec vectors (pin the filter conventions) -----


def test_unfilter_sub_spec_vector():
    # gray 4x1, Sub filter: recon[x] = raw[x] + recon[x-1] (mod 256)
    # filtered [10, 20, 30, 250] → recon [10, 30, 60, 54]
    png = _manual_png(4, 1, 0, bytes([1, 10, 20, 30, 250]))
    w, h, rgb = decode_png(png)
    assert (w, h) == (4, 1)
    assert list(rgb[::3]) == [10, 30, 60, 54]


def test_unfilter_up_spec_vector():
    # gray 2x2: row0 None [7, 9]; row1 Up filtered [3, 250] → [10, 3]
    png = _manual_png(2, 2, 0, bytes([0, 7, 9]) + bytes([2, 3, 250]))
    _, _, rgb = decode_png(png)
    assert list(rgb[::3]) == [7, 9, 10, 3]


def test_unfilter_average_spec_vector():
    # gray 2x2: row0 None [4, 8]; row1 Average:
    #   x0: raw 10 + (0 + 4)//2 = 12;  x1: raw 5 + (12 + 8)//2 = 15
    png = _manual_png(2, 2, 0, bytes([0, 4, 8]) + bytes([3, 10, 5]))
    _, _, rgb = decode_png(png)
    assert list(rgb[::3]) == [4, 8, 12, 15]


def test_unfilter_paeth_spec_vector():
    # gray 2x2: row0 None [100, 30]; row1 Paeth:
    #   x0: a=0 b=100 c=0 → p=100, pa=100 pb=0 → pred=b=100; raw 1 → 101
    #   x1: a=101 b=30 c=100 → p=31, pa=70 pb=1 pc=69 → pred=b=30; raw 2 → 32
    png = _manual_png(2, 2, 0, bytes([0, 100, 30]) + bytes([4, 1, 2]))
    _, _, rgb = decode_png(png)
    assert list(rgb[::3]) == [100, 30, 101, 32]


def test_rgb_sub_uses_bpp_stride():
    # RGB 2x1, Sub: left neighbor is the SAME CHANNEL 3 bytes back
    # filtered [(1,2,3), (10,20,30)] → recon [(1,2,3), (11,22,33)]
    png = _manual_png(2, 1, 2, bytes([1, 1, 2, 3, 10, 20, 30]))
    _, _, rgb = decode_png(png)
    assert list(rgb) == [1, 2, 3, 11, 22, 33]


def test_palette_and_alpha_expansion():
    # palette 2x1: indices [1, 0] over PLTE [(9,8,7), (1,2,3)]
    png = _manual_png(2, 1, 3, bytes([0, 1, 0]), plte=[9, 8, 7, 1, 2, 3])
    assert list(decode_png(png)[2]) == [1, 2, 3, 9, 8, 7]
    # RGBA 1x1: alpha dropped
    png = _manual_png(1, 1, 6, bytes([0, 5, 6, 7, 128]))
    assert list(decode_png(png)[2]) == [5, 6, 7]
    # gray+alpha 1x1: gray replicated, alpha dropped
    png = _manual_png(1, 1, 4, bytes([0, 42, 9]))
    assert list(decode_png(png)[2]) == [42, 42, 42]


# -- corruption / out-of-scope rejection ------------------------------------


def test_decode_rejects_bad_inputs():
    good = encode_png(bytes(12), 2, 2)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"JFIF" + good)
    # flip one IDAT byte → CRC must catch it
    idx = good.index(b"IDAT") + 4
    bad = good[:idx] + bytes([good[idx] ^ 0xFF]) + good[idx + 1 :]
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bad)
    # invalid interlace method (2) → hard error (Adam7=1 decodes since r6)
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 2)
    png = _SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(
        b"IDAT", zlib.compress(bytes([0, 1]))
    ) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="interlace"):
        decode_png(png)
    # spec §11.2.2 invalid (color type, depth) combos → hard error
    # (sub-byte 1/2/4 decode for gray/palette since r9; 16 since r6)
    for ct, dep in [(2, 4), (6, 2), (3, 16), (0, 3), (4, 1)]:
        ihdr = struct.pack(">IIBBBBB", 1, 1, dep, ct, 0, 0, 0)
        png = _SIGNATURE + _chunk(b"IHDR", ihdr) + _chunk(
            b"IDAT", zlib.compress(bytes([0, 1]))
        ) + _chunk(b"IEND", b"")
        with pytest.raises(ValueError, match="depth|color type"):
            decode_png(png)


# -- encode → decode roundtrips ---------------------------------------------


def test_roundtrip_every_filter_type():
    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, size=9 * 5 * 3, dtype=np.uint8).tobytes()
    for ft in range(5):
        png = encode_png(rgb, 9, 5, filter_for_row=lambda y, ft=ft: ft)
        assert decode_png(png) == (9, 5, rgb)


def test_roundtrip_color_types():
    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, size=6 * 4 * 3, dtype=np.uint8).tobytes()
    for ct in (2, 6):
        assert decode_png(encode_png(rgb, 6, 4, color_type=ct))[2] == rgb
    # palette: few distinct colors
    pal_img = bytes([10, 20, 30, 40, 50, 60] * 12)
    assert decode_png(encode_png(pal_img, 6, 4, color_type=3))[2] == pal_img
    # gray: r==g==b
    g = rng.randint(0, 256, size=6 * 4, dtype=np.uint8)
    gray = np.repeat(g, 3).tobytes()
    for ct in (0, 4):
        assert decode_png(encode_png(gray, 6, 4, color_type=ct))[2] == gray


def test_roundtrip_hypothesis_random_images():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=30, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=12),
        h=st.integers(min_value=1, max_value=12),
        seed=st.integers(min_value=0, max_value=2**31 - 1),
        data=st.data(),
    )
    def check(w, h, seed, data):
        rng = np.random.RandomState(seed)
        rgb = rng.randint(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
        fts = data.draw(
            st.lists(st.integers(0, 4), min_size=h, max_size=h)
        )
        png = encode_png(rgb, w, h, filter_for_row=lambda y: fts[y])
        assert decode_png(png) == (w, h, rgb)

    check()


# -- the Spark path: decode_images over Arrow batches ------------------------


def test_decode_images_mixed_mimes(spark):
    from pyspark.sql import functions as F

    from peerdb_spark.functions.multimodal import decode_images

    rng = np.random.RandomState(3)
    rows = []
    for i in range(6):
        w, h = 4 + i, 3 + i
        rgb = rng.randint(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
        if i % 2 == 0:
            rows.append(
                (i, encode_png(rgb, w, h, filter_for_row=lambda y: (i + y) % 5),
                 ("image/png", None, None, None, "png"), rgb, w, h)
            )
        else:
            rows.append((i, rgb, ("image/raw-rgb", w, h, None, "rgb"), rgb, w, h))
    df = spark.createDataFrame(
        [(r[0], r[1], r[2]) for r in rows],
        "media_id long, content binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:bigint,codec:string>",
    )
    out = {r["media_id"]: r for r in decode_images(df).collect()}
    for i, _c, _m, rgb, w, h in rows:
        got = out[i]
        assert bytes(got["content"]) == rgb
        assert got["meta"]["mime"] == "image/raw-rgb"
        assert (got["meta"]["width"], got["meta"]["height"]) == (w, h)
    # decoded output composes with the downstream kernels
    from peerdb_spark.functions.multimodal import extract_features

    feats = extract_features(decode_images(df))
    assert feats.count() == 6
    assert feats.where(F.size("features") == 16).count() == 6


def test_decoder_skips_ancillary_chunks():
    """tEXt/gAMA/pHYs chunks (every real PNG has some) must be skipped;
    a corrupt ancillary CRC still fails loudly (never silent)."""
    rgb = bytes(range(6 * 4 * 3))
    plain = encode_png(rgb, 6, 4)
    ihdr_end = plain.index(b"IDAT") - 4
    extra = (_chunk(b"tEXt", b"Comment\x00spark-peerflow")
             + _chunk(b"gAMA", (45455).to_bytes(4, "big"))
             + _chunk(b"pHYs", bytes(9)))
    spliced = plain[:ihdr_end] + extra + plain[ihdr_end:]
    assert decode_png(spliced) == decode_png(plain) == (6, 4, rgb)
    # ancillary chunk with a bad CRC is still a hard error
    bad = bytearray(spliced)
    i = spliced.index(b"tEXt") + 6
    bad[i] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))


def _manual_png16(width, height, color_type, scanlines):
    ihdr = struct.pack(">IIBBBBB", width, height, 16, color_type, 0, 0, 0)
    return (_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(scanlines)))
            + _chunk(b"IEND", b""))


def test_decode_16bit_samples():
    """16-bit depth: samples are big-endian u16, filters run at the BYTE
    level with a doubled pixel stride, output keeps the high byte."""
    # gray16 2x1, no filter: samples 0x1234, 0xABCD → gray 0x12, 0xAB
    png = _manual_png16(2, 1, 0, bytes([0, 0x12, 0x34, 0xAB, 0xCD]))
    assert list(decode_png(png)[2]) == [0x12, 0x12, 0x12, 0xAB, 0xAB, 0xAB]
    # rgb16 2x1, Sub filter: stride is 6 BYTES — second pixel's bytes add
    # to the first pixel's SAME-channel bytes
    row = bytes([1,
                 0x10, 0x00, 0x20, 0x00, 0x30, 0x00,   # pixel 1 raw
                 0x01, 0x00, 0x02, 0x00, 0x03, 0x00])  # pixel 2 filtered
    png = _manual_png16(2, 1, 2, row)
    assert list(decode_png(png)[2]) == [0x10, 0x20, 0x30, 0x11, 0x22, 0x33]
    # rgba16: alpha dropped, high bytes kept
    row = bytes([0, 0x77, 0xFF, 0x88, 0x00, 0x99, 0x01, 0xFF, 0xFF])
    png = _manual_png16(1, 1, 6, row)
    assert list(decode_png(png)[2]) == [0x77, 0x88, 0x99]
    # 16-bit palette is illegal
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 3, 0, 0, 0)
    bad = (_SIGNATURE + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(bytes(3))) + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="depth 16 invalid"):
        decode_png(bad)


# -- Adam7 interlacing --------------------------------------------------------

_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _interlaced_png(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Test-side Adam7 serializer (independent spec implementation): slice
    each pass from the full image, filter its scanlines, concatenate."""
    h, w, _ = img.shape
    out = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        hp, wp = sub.shape[:2]
        if hp == 0 or wp == 0:
            continue
        prev = np.zeros((wp, 3), dtype=np.int32)
        for y in range(hp):
            row = sub[y].astype(np.int32)
            if filter_type == 0:
                filt = row
            elif filter_type == 2:  # Up (per-pass prev resets!)
                filt = row - prev
            else:
                raise ValueError(filter_type)
            out.append(filter_type)
            out += (filt % 256).astype(np.uint8).tobytes()
            prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    return (_SIGNATURE + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(out)))
            + _chunk(b"IEND", b""))


def test_adam7_tiny_hand_layout():
    """2x2 image: pass 1 carries (0,0), pass 6 carries (1,0), pass 7 the
    bottom row — passes 2-5 are EMPTY and contribute zero bytes (the spec
    matrix, checkable by hand)."""
    img = np.array([[[1, 2, 3], [4, 5, 6]],
                    [[7, 8, 9], [10, 11, 12]]], dtype=np.uint8)
    png = _interlaced_png(img)
    assert decode_png(png) == (2, 2, img.tobytes())
    # the serialized stream really holds 1+1+2 pixels in pass order
    raw = zlib.decompress(png[png.index(b"IDAT") + 4 : -16])
    assert len(raw) == (1 + 3) + (1 + 3) + (1 + 6)
    assert raw[1:4] == bytes([1, 2, 3]) and raw[5:8] == bytes([4, 5, 6])


def test_adam7_roundtrip_various_sizes():
    rng = np.random.RandomState(9)
    for w, h in ((1, 1), (3, 5), (8, 8), (13, 9), (16, 17)):
        img = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        for ft in (0, 2):
            assert decode_png(_interlaced_png(img, ft)) == (w, h, img.tobytes())


def test_adam7_truncated_rejects():
    rng = np.random.RandomState(4)
    img = rng.randint(0, 256, size=(9, 9, 3), dtype=np.uint8)
    png = _interlaced_png(img)
    raw = zlib.decompress(png[png.index(b"IDAT") + 4 : -16])
    short = zlib.compress(raw[:-4])
    bad = (_SIGNATURE
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", 9, 9, 8, 2, 0, 0, 1))
           + _chunk(b"IDAT", short) + _chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        decode_png(bad)


# -- sub-byte bit depths (1/2/4, color types 0 and 3) — r9 -------------------


def test_subbyte_gray_roundtrip_all_filters():
    """k-bit gray roundtrips bit-exact through pack→filter→decode for every
    filter type; widths chosen to exercise partial trailing bytes."""
    rng = np.random.RandomState(21)
    for depth in (1, 2, 4):
        scale = 255 // ((1 << depth) - 1)
        for w, h in ((1, 1), (3, 2), (8, 5), (13, 7), (31, 9)):
            g = rng.randint(0, 1 << depth, size=(h, w)).astype(np.uint8) * scale
            rgb = np.repeat(g[:, :, None], 3, axis=2).tobytes()
            for ft in range(5):
                png = encode_png(
                    rgb, w, h, filter_for_row=lambda y, ft=ft: ft,
                    color_type=0, bit_depth=depth,
                )
                assert decode_png(png) == (w, h, rgb), (depth, w, h, ft)


def test_subbyte_palette_roundtrip():
    rng = np.random.RandomState(22)
    for depth in (1, 2, 4):
        n = 1 << depth
        pal = rng.randint(0, 256, size=(n, 3), dtype=np.uint8)
        idx = rng.randint(0, n, size=(7, 13))
        rgb = pal[idx].tobytes()
        png = encode_png(
            rgb, 13, 7, filter_for_row=lambda y: 4, color_type=3,
            bit_depth=depth,
        )
        assert decode_png(png) == (13, 7, rgb)


def test_subbyte_packing_is_msb_first():
    """Spec §7.2: within a byte the leftmost pixel is in the high bits.
    A 1-bit row [1,0,1,1,0,0,0,1] must pack to exactly 0xB1."""
    g = np.array([[255, 0, 255, 255, 0, 0, 0, 255]], dtype=np.uint8)
    rgb = np.repeat(g[:, :, None], 3, axis=2).tobytes()
    png = encode_png(rgb, 8, 1, color_type=0, bit_depth=1)
    raw = zlib.decompress(png[png.index(b"IDAT") + 4 : -16])
    assert raw == bytes([0, 0b10110001])
    assert decode_png(png) == (8, 1, rgb)


def test_subbyte_adam7_hand_layout():
    """Hand-packed interlaced 1-bit 2x2: pass rows carry packed bits and
    each pass pads to its own byte boundary."""
    # image: [[1,0],[0,1]] → pass1=(0,0)=1, pass6=(1,0)=0, pass7=row1=[0,1]
    out = bytes([0, 0b10000000]) + bytes([0, 0b00000000]) + bytes([0, 0b01000000])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 1, 0, 0, 0, 1)
    png = (_SIGNATURE + _chunk(b"IHDR", ihdr)
           + _chunk(b"IDAT", zlib.compress(out)) + _chunk(b"IEND", b""))
    w, h, rgb = decode_png(png)
    px = np.frombuffer(rgb, dtype=np.uint8).reshape(2, 2, 3)
    assert (px[:, :, 0] == np.array([[255, 0], [0, 255]])).all()


def test_subbyte_encode_rejects():
    # gray not a multiple of the scale step → no exact roundtrip possible
    with pytest.raises(ValueError, match="multiples"):
        encode_png(bytes([7] * 3), 1, 1, color_type=0, bit_depth=4)
    # palette wider than the depth can index
    pal = np.repeat(np.arange(8, dtype=np.uint8), 3).tobytes()
    with pytest.raises(ValueError, match="palette|entries"):
        encode_png(pal, 8, 1, color_type=3, bit_depth=2)
    # sub-byte depth on a truecolor type is a spec violation
    with pytest.raises(ValueError, match="invalid"):
        encode_png(bytes(3), 1, 1, color_type=2, bit_depth=4)


def test_subbyte_palette_index_out_of_range_rejects():
    """A 4-bit palette image whose sample indexes past the PLTE must hard
    error, not wrap or read garbage."""
    plte = _chunk(b"PLTE", bytes([1, 2, 3, 4, 5, 6]))  # 2 entries
    raw = bytes([0, 0xF0])  # one pixel, index 15
    ihdr = struct.pack(">IIBBBBB", 1, 1, 4, 3, 0, 0, 0)
    png = (_SIGNATURE + _chunk(b"IHDR", ihdr) + plte
           + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="palette index"):
        decode_png(png)
