"""From-scratch JPEG codec (functions/jpeg.py), baseline + progressive.

The decoder is pinned four independent ways: (1) HAND-ASSEMBLED minimal
streams — baseline AND a 4-scan progressive one — whose entropy bits and
expected pixels are computed on paper from T.81 (DC-only block: pixel =
dequantized_DC/8 + 128), so the wire format is verified independent of
our encoder; (2) exact roundtrips on constant tiles where quantization
provably loses nothing; (3) tolerance roundtrips through the full
Huffman/DCT path on gradients, all modes, with and without restart
markers; (4) progressive==baseline byte-identity (both encodings carry
the same quantized coefficients). Spark path: decode_images over Arrow
batches.
"""

import struct

import numpy as np
import pytest

from peerdb_spark.functions.jpeg import (
    _AC_BITS,
    _AC_VALS,
    _DC_BITS,
    _DC_VALS,
    ZIGZAG,
    _extend,
    _magnitude,
    decode_jpeg,
    encode_jpeg,
)


def _seg(marker, payload):
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _manual_gray_jpeg(scan_bits: str, qval: int = 16, w: int = 8, h: int = 8):
    """Hand-assembled 1-component baseline stream: flat quant table qval,
    the module's DHT specs (carried IN the stream, as any real file), and
    caller-supplied entropy bits (string of '0'/'1', 1-padded here)."""
    dqt = bytes([0x00]) + bytes([qval] * 64)
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    dht = (bytes([0x00] + _DC_BITS) + bytes(_DC_VALS)
           + bytes([0x10] + _AC_BITS) + bytes(_AC_VALS))
    sos = bytes([1, 1, 0x00]) + b"\x00\x3f\x00"
    bits = scan_bits + "1" * (-len(scan_bits) % 8)
    scan = bytes(int(bits[i : i + 8], 2) for i in range(0, len(bits), 8))
    # destuffing safety: the chosen vectors produce no 0xFF bytes
    assert b"\xff" not in scan
    return (b"\xff\xd8" + _seg(0xDB, dqt) + _seg(0xC0, sof)
            + _seg(0xC4, dht) + _seg(0xDA, sos) + scan + b"\xff\xd9")


def test_extend_spec_vectors():
    # T.81 F.2.2.1 table: size 2 → raw 0..3 maps to -3,-2,2,3
    assert [_extend(v, 2) for v in range(4)] == [-3, -2, 2, 3]
    assert _extend(0, 0) == 0
    assert [_extend(v, 1) for v in (0, 1)] == [-1, 1]
    for v in (-255, -1, 1, 77, 1023):
        s, raw = _magnitude(v)
        assert _extend(raw, s) == v


def test_decode_hand_assembled_dc_only():
    """One 8×8 gray MCU, DC diff +8, quant 16: pixels = (8·16)/8 + 128 =
    144 everywhere. Entropy bits on paper from the canonical tables:
    DC size-4 symbol = '101' (3rd code of length 3), raw '1000',
    AC EOB = first length-8 code = '00000000'."""
    png = _manual_gray_jpeg("101" + "1000" + "00000000")
    w, h, rgb = decode_jpeg(png)
    assert (w, h) == (8, 8)
    assert set(rgb) == {144}


def test_decode_hand_assembled_with_ac():
    """DC 0 ('00' size-0 code, no raw bits) + one AC coefficient:
    canonical codes put EOB (the only length-8 symbol) at '00000000';
    length-9 codes then start at value 2, so ZRL='000000010' and
    (run=0, size=1)=0x01 → '000000011'. Raw bit '1' → +1 at zigzag
    index 1 (= coef (0,1)), then EOB. Expected block: IDCT of F[0,1]=16
    → row-constant cos-profile, computed with the public basis formula."""
    bits = "00" + "000000011" + "1" + "00000000"
    jpg = _manual_gray_jpeg(bits)
    _, _, rgb = decode_jpeg(jpg)
    got = np.frombuffer(rgb, np.uint8).reshape(8, 8, 3)[:, :, 0].astype(float)
    x = np.arange(8)
    # f(y,x) = C[0,y]·F·C[1,x] with C[0,·]=1/(2√2), C[1,x]=cos((2x+1)π/16)/2
    # → amplitude 16/(4√2) = 2√2
    want = np.clip(np.round(
        128 + 16 / (4 * np.sqrt(2)) * np.cos((2 * x + 1) * np.pi / 16)
    ), 0, 255)
    assert np.array_equal(got, np.tile(want, (8, 1)))
    # rows identical (coef varies only along x)
    assert np.array_equal(got[0], got[7])


def test_constant_even_gray_roundtrips_exactly():
    # Q50 luma DC step is 16; a constant block's only coefficient is
    # 8·(v−128), divisible by 16 for even v → lossless roundtrip
    for v in (0, 84, 128, 254):
        rgb = bytes([v] * (16 * 24 * 3))
        out = decode_jpeg(encode_jpeg(rgb, 24, 16, quality=50, mode="gray"))
        assert out == (24, 16, rgb), v


def test_roundtrip_tolerance_all_modes():
    w, h = 24, 16
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    img = np.stack(
        [(xx * 3 + yy * 2) % 256, (xx * 5) % 256, (yy * 7) % 256], axis=2
    ).astype(np.uint8)
    rgb = img.tobytes()
    for mode, tol in (("444", 8), ("422", 32), ("420", 48)):
        W, H, dec = decode_jpeg(encode_jpeg(rgb, w, h, quality=95, mode=mode))
        assert (W, H) == (w, h)
        err = np.abs(
            np.frombuffer(dec, np.uint8).astype(int).reshape(h, w, 3)
            - img.astype(int)
        )
        assert err.max() <= tol, (mode, err.max())
    # gray mode reproduces the luma plane
    W, H, dec = decode_jpeg(encode_jpeg(rgb, w, h, quality=95, mode="gray"))
    luma = 0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    got = np.frombuffer(dec, np.uint8).reshape(h, w, 3)[:, :, 0].astype(float)
    assert np.abs(got - luma).max() <= 6


def test_422_exact_on_horizontal_pairs():
    """4:2:2 halves chroma horizontally only: an image whose chroma is
    constant across each horizontal pixel pair (and whose blocks are
    tile-constant even grays) survives exactly — pins the (2,1)+(1,1)
    sampling geometry, not just tolerance."""
    w, h = 32, 8
    v = np.repeat(np.arange(4) * 60 + 2, 8).astype(np.uint8)  # 8-wide tiles
    img = np.tile(v[None, :, None], (h, 1, 3))
    rgb = img.tobytes()
    out = decode_jpeg(encode_jpeg(rgb, w, h, quality=50, mode="422"))
    assert out == (w, h, rgb)


def test_restart_markers_roundtrip():
    w, h = 40, 24
    rng = np.random.RandomState(3)
    # smooth image (random would stress quantization, not restarts)
    base = rng.randint(0, 32, size=(h // 8, w // 8, 3))
    img = np.repeat(np.repeat(base * 8, 8, axis=0), 8, axis=1).astype(np.uint8)
    rgb = img.tobytes()
    plain = decode_jpeg(encode_jpeg(rgb, w, h, quality=90, mode="444"))
    rst = decode_jpeg(
        encode_jpeg(rgb, w, h, quality=90, mode="444", restart_interval=2)
    )
    assert plain == rst  # restart plumbing must not change a single pixel
    enc = encode_jpeg(rgb, w, h, quality=90, mode="444", restart_interval=2)
    assert any(
        enc[i] == 0xFF and 0xD0 <= enc[i + 1] <= 0xD7 for i in range(2, len(enc) - 2)
    )


def test_decoder_rejects_out_of_scope():
    rgb = bytes(8 * 8 * 3)
    good = encode_jpeg(rgb, 8, 8)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG" + good)
    # flipping SOF0→SOF2 leaves a baseline scan header (Ss=0, Se=63),
    # which is malformed in a progressive frame (DC scans must have Se=0)
    idx = good.index(b"\xff\xc0")
    prog = good[:idx] + b"\xff\xc2" + good[idx + 2 :]
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(prog)
    # arithmetic-coded progressive (SOF10) stays out of scope
    arith = good[:idx] + b"\xff\xca" + good[idx + 2 :]
    with pytest.raises(NotImplementedError, match="SOF"):
        decode_jpeg(arith)
    # truncated scan rejects as ValueError (the IndexError escape is
    # closed — overruns convert at the scan-call boundary)
    with pytest.raises(ValueError):
        decode_jpeg(good[: len(good) - 6])


def test_zigzag_is_a_permutation():
    assert sorted(ZIGZAG) == list(range(64))
    # spot anchors from the published order
    assert ZIGZAG[:8] == [0, 1, 8, 16, 9, 2, 3, 10]
    assert ZIGZAG[-3:] == [47, 55, 62, 63][-3:]


def test_decode_images_jpeg_mixed(spark):
    from peerdb_spark.functions.multimodal import (
        decode_images,
        encode_images_jpeg,
    )

    rows = []
    want = {}
    for i in range(4):
        w, h = 16, 8
        # tile-constant even gray → exact through q50 gray JPEG
        v = 2 * ((i * 37) % 128)
        rgb = bytes([v] * (w * h * 3))
        want[i] = (rgb, w, h)
        rows.append((i, rgb, ("image/raw-rgb", w, h, None, "rgb")))
    df = spark.createDataFrame(
        rows,
        "media_id long, content binary, "
        "meta struct<mime:string,width:int,height:int,duration_ms:bigint,codec:string>",
    )
    enc = encode_images_jpeg(df, quality=50, mode="gray")
    out = {r["media_id"]: r for r in decode_images(enc).collect()}
    for i, (rgb, w, h) in want.items():
        assert bytes(out[i]["content"]) == rgb
        assert out[i]["meta"]["mime"] == "image/raw-rgb"
        assert (out[i]["meta"]["width"], out[i]["meta"]["height"]) == (w, h)


def test_decoder_skips_app_and_comment_segments():
    """Real-world files carry APP0/JFIF, APPn (EXIF), and COM segments our
    encoder never writes — splice them in after SOI; decode must be
    byte-identical to the plain stream's."""
    rgb = bytes(range(48)) * (16 * 16 * 3 // 48)
    plain = encode_jpeg(rgb, 16, 16, quality=90, mode="444")
    app0 = _seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    app1 = _seg(0xE1, b"Exif\x00\x00" + bytes(20))
    com = _seg(0xFE, b"written by spark-peerflow tests")
    spliced = plain[:2] + app0 + app1 + com + plain[2:]
    assert decode_jpeg(spliced) == decode_jpeg(plain)


def test_nonflat_quant_dequant_order():
    """Regression: the decoder must pair zigzag-order coefficient i with
    quant step ZIGZAG[i] of the natural-order table. With the pairing
    wrong, sharp high-frequency content at mid quality (non-flat scaled
    Annex-K tables) decodes to pixels off by >100; correct pairing keeps
    the roundtrip error within normal lossy bounds."""
    w, h = 64, 48
    img = np.zeros((h, w, 3), dtype=np.uint8)
    img[:, ::2] = 255  # vertical stripes: strong AC energy everywhere
    img[::3, :, 1] = 40
    rgb = img.tobytes()
    for q, tol in ((75, 48), (80, 48), (90, 32)):
        W, H, dec = decode_jpeg(encode_jpeg(rgb, w, h, quality=q, mode="444"))
        assert (W, H) == (w, h)
        err = np.abs(
            np.frombuffer(dec, np.uint8).astype(int).reshape(h, w, 3)
            - img.astype(int)
        )
        assert err.max() <= tol, (q, err.max())


def _test_image(style: str, w: int, h: int, rng) -> np.ndarray:
    if style == "noise":
        return rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
    if style == "sparse":  # isolated dots on flat ground → ZRL-heavy
        img = np.full((h, w, 3), 128, np.uint8)
        img[::7, ::7] = 255
        img[3::11, 5::11] = 0
        return img
    if style == "smooth":  # blockwise-constant → long EOB runs
        base = rng.randint(0, 256, ((h + 7) // 8, (w + 7) // 8, 3))
        return np.repeat(np.repeat(base, 8, 0), 8, 1)[:h, :w].astype(np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]  # gradient / texture
    return np.stack(
        [(xx * 7) % 256, (yy * 5) % 256, ((xx ^ yy) * 3) % 256], 2
    ).astype(np.uint8)


def test_progressive_decodes_identical_to_baseline():
    """Progressive and baseline encodings carry the same quantized
    coefficients, so decoded pixels must be byte-identical — this pins all
    four G.2 scan procedures (DC first/refine, AC first with EOB runs, AC
    refine with correction bits) against the verified baseline decoder."""
    rng = np.random.RandomState(5)
    cases = [
        ("noise", 24, 16, "444", 80),
        ("noise", 36, 16, "422", 70),
        ("smooth", 64, 48, "444", 80),   # EOB runs spanning many blocks
        ("sparse", 48, 48, "420", 92),   # ZRL runs >15
        ("grad", 17, 13, "444", 90),     # non-multiple-of-8 dims
        ("grad", 33, 18, "420", 60),     # non-multiple-of-16 dims
        ("noise", 41, 20, "gray", 70),   # regression: batched-IDCT rounding
    ]
    for style, w, h, mode, q in cases:
        img = _test_image(style, w, h, rng)
        rgb = img.tobytes()
        base = decode_jpeg(encode_jpeg(rgb, w, h, quality=q, mode=mode))
        prog = decode_jpeg(
            encode_jpeg(rgb, w, h, quality=q, mode=mode, progressive=True)
        )
        assert prog == base, (style, w, h, mode, q)


def test_progressive_stream_is_sof2_multiscan():
    rgb = _test_image("noise", 24, 16, np.random.RandomState(1)).tobytes()
    data = encode_jpeg(rgb, 24, 16, quality=80, progressive=True)
    assert b"\xff\xc2" in data and b"\xff\xc0" not in data
    # scan script: DC first + (2 luma + 2 chroma) AC first + DC refine +
    # (2 luma + 2 chroma) AC refine = 10 SOS markers (entropy data is
    # stuffed, so FF DA can't occur inside a scan)
    assert data.count(b"\xff\xda") == 10


def test_progressive_rejects_malformed_scans():
    rgb = bytes(8 * 8 * 3)
    data = encode_jpeg(rgb, 8, 8, quality=80, progressive=True)
    with pytest.raises(ValueError, match="restart"):
        encode_jpeg(rgb, 8, 8, progressive=True, restart_interval=2)
    # truncating mid-scan loses the EOI → decoder reports truncation
    with pytest.raises((ValueError, IndexError)):
        decode_jpeg(data[: len(data) // 2])


def test_decode_hand_assembled_progressive():
    """Hand-assembled 4-scan SOF2 stream with on-paper pixels — pins the
    progressive WIRE format (scan headers, point transforms, refinement
    bit semantics, EOB-run refinement reads) independent of our encoder:

    scan 1  DC first  (Ss=0 Se=0 Ah=0 Al=1): diff 4  → coef0 = 4<<1 = 8
    scan 2  AC first  (Ss=1 Se=63 Ah=0 Al=1): (r=0,s=1) raw 1 at k=1 →
            coef1 = extend(1,1)<<1 = 2, then EOB
    scan 3  DC refine (Ah=1 Al=0): bit 1     → coef0 = 8|1 = 9
    scan 4  AC refine (Ah=1 Al=0): EOB run 1, then the correction bit for
            the nonzero coef1: bit 1 and (2 & 1)==0 → coef1 = 3

    Flat quant 16 → DC dequant 144 → base pixel 144/8 + 128 = 146;
    AC (0,1) dequant 48 → amplitude 48/(4√2)·cos((2x+1)π/16), row-constant.
    Canonical codes from the module tables (carried in DHT, as any real
    file): DC size-3 = '100', AC (0,1) = '000000011', AC EOB = '00000000'.
    """
    dqt = bytes([0x00]) + bytes([16] * 64)
    sof2 = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    dht = (bytes([0x00] + _DC_BITS) + bytes(_DC_VALS)
           + bytes([0x10] + _AC_BITS) + bytes(_AC_VALS))

    def sos(ss, se, ah, al):
        return _seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))

    def bits(s):
        s = s + "1" * (-len(s) % 8)
        raw = bytes(int(s[i:i + 8], 2) for i in range(0, len(s), 8))
        return raw.replace(b"\xff", b"\xff\x00")  # byte stuffing

    jpg = (b"\xff\xd8" + _seg(0xDB, dqt) + _seg(0xC2, sof2) + _seg(0xC4, dht)
           + sos(0, 0, 0, 1) + bits("100" + "100")          # DC first: size 3, raw 4
           + sos(1, 63, 0, 1) + bits("000000011" + "1" + "00000000")  # AC first
           + sos(0, 0, 1, 0) + bits("1")                    # DC refine
           + sos(1, 63, 1, 0) + bits("00000000" + "1")      # AC refine
           + b"\xff\xd9")
    w, h, rgb = decode_jpeg(jpg)
    assert (w, h) == (8, 8)
    got = np.frombuffer(rgb, np.uint8).reshape(8, 8, 3)[:, :, 0].astype(float)
    x = np.arange(8)
    want = np.clip(np.round(
        146 + 48 / (4 * np.sqrt(2)) * np.cos((2 * x + 1) * np.pi / 16)
    ), 0, 255)
    assert np.array_equal(got, np.tile(want, (8, 1)))


def test_truncated_entropy_rejects_with_valueerror():
    """Entropy data far shorter than the declared MCU count must reject as
    ValueError (never IndexError / never wrong pixels), even when the
    zero-padding overrun happens deep inside an MCU (code-review repro:
    64×64 4:4:4 with 4 bytes of scan data)."""
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (64, 64, 3), dtype=np.uint8)
    good = encode_jpeg(img.tobytes(), 64, 64, quality=80, mode="444")
    sos = good.index(b"\xff\xda")
    hdr_len = struct.unpack_from(">H", good, sos + 2)[0]
    cut = good[: sos + 2 + hdr_len + 4] + b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_jpeg(cut)
    # progressive twin
    goodp = encode_jpeg(img.tobytes(), 64, 64, quality=80, mode="444",
                        progressive=True)
    sos = goodp.index(b"\xff\xda")
    hdr_len = struct.unpack_from(">H", goodp, sos + 2)[0]
    cutp = goodp[: sos + 2 + hdr_len + 2] + b"\xff\xd9"
    with pytest.raises(ValueError):
        decode_jpeg(cutp)


def test_bad_sampling_factors_reject_on_both_paths():
    """h or v of 0, or non-dividing layouts, must reject at SOF parse —
    the progressive path previously skipped the check (ZeroDivisionError /
    silent chroma mis-upsampling; code-review finding)."""
    rgb = bytes(8 * 8 * 3)
    good = encode_jpeg(rgb, 8, 8, quality=80, mode="444")
    sof = good.index(b"\xff\xc0")
    # component 1's sampling byte sits at SOF body offset 6+1
    samp_off = sof + 4 + 6 + 1
    assert good[samp_off] == 0x11
    for marker in (b"\xff\xc0", b"\xff\xc2"):
        base = good[:sof] + marker + good[sof + 2 :]
        zero_h = base[:samp_off] + b"\x01" + base[samp_off + 1 :]  # h=0
        with pytest.raises(NotImplementedError, match="sampling"):
            decode_jpeg(zero_h)
        # luma h=3, chroma h=2: 2 does not divide hmax=3 → mis-upsample
        nondiv = bytearray(base)
        nondiv[samp_off] = 0x31
        nondiv[samp_off + 3] = 0x21
        with pytest.raises(NotImplementedError, match="sampling"):
            decode_jpeg(bytes(nondiv))


def test_hostile_short_code_overrun_rejects_with_valueerror():
    """Round-8 review repro: a crafted DHT whose ALL-ZEROS code is valid
    and maps to (r=0, s=15) makes one AC block consume ~1 KB past the end
    of a truncated scan before the per-block bound check runs — with the
    old 68-byte reader padding that surfaced as IndexError from a Spark
    task instead of the decoders' documented ValueError reject."""
    dqt = bytes([0x00]) + bytes([16] * 64)
    sof2 = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    # DC table: 1-bit code -> size 0; AC table: 1-bit code -> 0x0F (s=15)
    dc_bits = [1] + [0] * 15
    ac_bits = [1] + [0] * 15
    dht = (bytes([0x00] + dc_bits) + bytes([0x00])
           + bytes([0x10] + ac_bits) + bytes([0x0F]))
    sos = _seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))  # AC first, Ss=1..63
    jpg = (b"\xff\xd8" + _seg(0xDB, dqt) + _seg(0xC2, sof2)
           + _seg(0xC4, dht) + sos + b"\xff\xd9")  # EMPTY entropy section
    with pytest.raises(ValueError):
        decode_jpeg(jpg)


# -- 12-bit extended sequential (SOF1) — r9 -----------------------------------


def _make12(dc_val, sofm=0xC1, quant=1):
    """Hand-assembled 12-bit gray 8x8 single-block stream: flat quant,
    extended DC table (categories 0..15), one DC coefficient then EOB.
    With quant=1 and coef0=8k the IDCT is exact: every pixel is
    k + 2048 (T.81 level shift at P=12), reduced to 8 bits by >>4."""
    from peerdb_spark.functions.jpeg import (
        _AC_BITS, _AC_VALS, _BitWriter, _build_codes, _canonical_bits,
        _magnitude)

    def seg(marker, payload):
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    dc_vals = list(range(16))
    dc_bits = _canonical_bits(16)
    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, b"\x00" + bytes([quant] * 64))
    sof = struct.pack(">BHHB", 12, 8, 8, 1) + struct.pack(">BBB", 1, 0x11, 0)
    out += seg(sofm, sof)
    _d, dc_enc = _build_codes(dc_bits, dc_vals)
    _a, ac_enc = _build_codes(_AC_BITS, _AC_VALS)
    out += seg(0xC4, bytes([0x00] + dc_bits) + bytes(dc_vals))
    out += seg(0xC4, bytes([0x10] + _AC_BITS) + bytes(_AC_VALS))
    out += seg(0xDA, bytes([1, 1, 0x00]) + b"\x00\x3f\x00")
    w = _BitWriter()
    s, raw = _magnitude(dc_val)
    code, ln = dc_enc[s]
    w.write(code, ln)
    if s:
        w.write(raw, s)
    code, ln = ac_enc[0x00]
    w.write(code, ln)
    out += w.flush() + b"\xff\xd9"
    return bytes(out)


def test_12bit_sof1_dc_only_exact():
    # coef0 = 8000 → pixels 8000/8 + 2048 = 3048 → high byte 3048>>4 = 190
    w, h, rgb = decode_jpeg(_make12(8000))
    px = np.frombuffer(rgb, np.uint8).reshape(8, 8, 3)
    assert (w, h) == (8, 8) and (px == 190).all()
    # the 12-bit zero point: coef0 = -16384 → sample 0 exactly
    assert np.frombuffer(decode_jpeg(_make12(-16384))[2], np.uint8).max() == 0
    # clamp at 4095 (NOT 255): an 8-bit-shifted decoder would wrap
    assert np.frombuffer(decode_jpeg(_make12(32000))[2], np.uint8).min() == 255


def test_12bit_rejected_on_sof0_only():
    # SOF0 is 8-bit by spec; the same stream under SOF1 decodes
    with pytest.raises(ValueError, match="12-bit.*SOF0"):
        decode_jpeg(_make12(0, sofm=0xC0))
    decode_jpeg(_make12(0, sofm=0xC1))


# -- lossless (SOF3, Annex H) — r9 ---------------------------------------------


def test_lossless_roundtrip_precisions_predictors():
    from peerdb_spark.functions.jpeg import (
        decode_jpeg_lossless, encode_jpeg_lossless)

    rng = np.random.RandomState(11)
    for prec in (2, 4, 8, 12, 16):
        for pred in (1, 4, 7):
            for nc in (1, 3):
                h, w = rng.randint(1, 9), rng.randint(1, 9)
                s = rng.randint(0, 1 << prec, size=(h, w, nc)).astype(np.uint16)
                data = encode_jpeg_lossless(s, prec, predictor=pred)
                W, H, P, out = decode_jpeg_lossless(data)
                assert (W, H, P) == (w, h, prec)
                assert (out == s).all(), (prec, pred, nc)


def test_lossless_every_predictor_hand_vector():
    """Pin the Annex-H prediction rules against on-paper math: a 2x2
    8-bit image [[100, 102], [90, 95]], checked per predictor.
    Row 0 always predicts: (0,0)→default 128, (0,1)→Ra=100.
    Row 1: (1,0)→Rb=100; (1,1) depends on the predictor with
    Ra=90, Rb=102, Rc=100."""
    from peerdb_spark.functions.jpeg import (
        decode_jpeg_lossless, encode_jpeg_lossless)

    img = np.array([[100, 102], [90, 95]], dtype=np.uint16)
    want_px = {1: 90, 2: 102, 3: 100, 4: 92, 5: 91, 6: 97, 7: 96}
    for pred, px in want_px.items():
        data = encode_jpeg_lossless(img, 8, predictor=pred)
        _, _, _, out = decode_jpeg_lossless(data)
        assert (out[:, :, 0] == img).all(), pred
        # the bitstream must actually carry the predicted difference:
        # re-encode with the sample forced to equal its prediction and
        # check the (1,1) diff is zero bits → shorter/equal stream
        forced = img.copy()
        forced[1, 1] = px
        assert len(encode_jpeg_lossless(forced, 8, predictor=pred)) <= len(data)


def test_lossless_point_transform_and_restarts():
    from peerdb_spark.functions.jpeg import (
        decode_jpeg_lossless, encode_jpeg_lossless)

    rng = np.random.RandomState(5)
    s = (rng.randint(0, 256, size=(5, 7, 1)) * 16).astype(np.uint16)
    data = encode_jpeg_lossless(s, 12, predictor=4, point_transform=4)
    assert (decode_jpeg_lossless(data)[3] == s).all()
    # odd samples cannot roundtrip under a point transform → reject
    with pytest.raises(ValueError, match="multiples"):
        encode_jpeg_lossless(s + 1, 12, point_transform=4)
    # restart markers reset prediction; stream re-syncs byte-aligned
    s = rng.randint(0, 4096, size=(9, 11, 3)).astype(np.uint16)
    data = encode_jpeg_lossless(s, 12, predictor=7, restart_interval=10)
    assert b"\xff\xd0" in data
    assert (decode_jpeg_lossless(data)[3] == s).all()


def test_lossless_ssss16_wraparound():
    """diff = ±32768 maps to the no-extra-bits SSSS=16 escape; mod-2^16
    reconstruction must land exactly (16-bit full-range steps)."""
    from peerdb_spark.functions.jpeg import (
        decode_jpeg_lossless, encode_jpeg_lossless)

    s = np.array([[0, 32768, 0, 65535, 32767]], dtype=np.uint16)
    data = encode_jpeg_lossless(s, 16, predictor=1)
    assert (decode_jpeg_lossless(data)[3][:, :, 0] == s).all()


def test_lossless_generic_rgb_contract():
    """decode_jpeg maps lossless streams onto the RGB888 contract:
    3 components pass through (no color transform), 16-bit keeps the
    high byte, sub-8-bit scales to full range."""
    from peerdb_spark.functions.jpeg import encode_jpeg_lossless

    rng = np.random.RandomState(7)
    s8 = rng.randint(0, 256, size=(4, 6, 3)).astype(np.uint16)
    assert decode_jpeg(encode_jpeg_lossless(s8, 8))[2] == (
        s8.astype(np.uint8).tobytes())
    s16 = rng.randint(0, 1 << 16, size=(3, 3, 1)).astype(np.uint16)
    want = np.repeat((s16 >> 8).astype(np.uint8), 3, axis=2).tobytes()
    assert decode_jpeg(encode_jpeg_lossless(s16, 16))[2] == want
    s2 = rng.randint(0, 4, size=(3, 3, 1)).astype(np.uint16)
    want = np.repeat((s2 * 85).astype(np.uint8), 3, axis=2).tobytes()
    assert decode_jpeg(encode_jpeg_lossless(s2, 2))[2] == want


def test_lossless_rejects():
    from peerdb_spark.functions.jpeg import (
        decode_jpeg_lossless, encode_jpeg_lossless)

    s = np.zeros((2, 2), dtype=np.uint16)
    with pytest.raises(ValueError, match="predictor"):
        encode_jpeg_lossless(s, 8, predictor=0)
    with pytest.raises(ValueError, match="range"):
        encode_jpeg_lossless(np.full((1, 1), 300, np.uint16), 8)
    # a DCT stream is not a lossless stream
    dct = encode_jpeg(bytes(8 * 8 * 3), 8, 8, mode="gray")
    with pytest.raises(ValueError, match="lossless"):
        decode_jpeg_lossless(dct)
    # truncated entropy data → ValueError, never wrong samples
    good = encode_jpeg_lossless(
        np.arange(64, dtype=np.uint16).reshape(8, 8), 8, predictor=4)
    with pytest.raises(ValueError):
        decode_jpeg_lossless(good[:len(good) - 8])
