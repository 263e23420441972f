"""Pure-Python baseline JPEG codec (numpy DCT math, stdlib only — no PIL).

Implements the public JPEG standard (ITU-T T.81 / ISO 10918-1, baseline
sequential DCT): marker parsing (SOI/APPn/COM/DQT/SOF0/DHT/DRI/SOS/RSTn/
EOI), Huffman entropy decode with byte-destuffing and restart intervals,
dequantization, zigzag, 8×8 IDCT via an orthonormal cosine basis matrix,
chroma upsampling, and JFIF YCbCr→RGB. The encoder (for fixtures, tests,
and JPEG sink output) writes grayscale, 4:4:4, or 4:2:0 baseline streams
with Annex-K-style tables embedded in DQT/DHT — the decoder always reads
tables FROM the stream, so decode correctness never depends on any
built-in table.

Scope (strict rejects, never wrong pixels):
- baseline sequential (SOF0) only; progressive (SOF2) and arithmetic
  coding raise NotImplementedError.
- 8-bit samples; 1-component (gray) and 3-component (YCbCr) scans;
  sampling factors 1×1 (4:4:4) and the 2×2-luma 4:2:0 layout.

Perf stance: the entropy loop is per-symbol Python — correct and
deterministic, sized for fixture/test payloads and metadata-scale media;
a production 100 TB image pipeline plugs a codec lib into the same
`multimodal.decode_encoded` entry point without touching any Spark
plumbing. The DCT itself is one 8×8 matrix triple-product per block
(numpy), not per-pixel Python.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]
_ZZ = np.array(ZIGZAG)
_UNZIGZAG = np.argsort(_ZZ)

# Annex-K-style quantization tables (quality 50 base). These ship in the
# DQT segment; the decoder reads whatever the stream declares.
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32,
    dtype=np.int64,
)

# standard-shape Huffman specs (BITS, HUFFVAL). Embedded in DHT; only
# encode efficiency depends on them, never decode correctness.
_DC_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_VALS = list(range(12))


def _ac_vals() -> list[int]:
    """(run, size) symbol inventory covering every baseline AC symbol:
    EOB (0x00), ZRL (0xF0), and run 0-15 × size 1-10."""
    vals = [0x00, 0xF0]
    for size in range(1, 11):
        for run in range(16):
            vals.append((run << 4) | size)
    return vals


def _canonical_bits(nvals: int) -> list[int]:
    """A valid BITS histogram for `nvals` symbols: fill code lengths
    8..16 greedily (keeps every code ≤ 16 bits and the tree prefix-free)."""
    bits = [0] * 16
    remaining = nvals
    length = 8
    while remaining > 0 and length <= 16:
        # capacity heuristic: leave room for longer codes
        take = min(remaining, 1 << (length - 8)) if length < 16 else remaining
        bits[length - 1] = take
        remaining -= take
        length += 1
    if remaining:
        raise ValueError("too many huffman symbols")
    return bits


_AC_VALS = _ac_vals()
_AC_BITS = _canonical_bits(len(_AC_VALS))


def _build_codes(bits: list[int], vals: list[int]):
    """Canonical Huffman codes (T.81 Annex C): returns
    (decode {(length, code): symbol}, encode {symbol: (code, length)})."""
    decode, encode = {}, {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            sym = vals[k]
            decode[(length, code)] = sym
            encode[sym] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return decode, encode


# orthonormal 8-point DCT basis: C[u, x] = c(u)/2 * cos((2x+1)uπ/16)
_C = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
        _C[_u, _x] = _c / 2 * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _fdct(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def pad_to_byte(self) -> None:
        if self.n:
            pad = 8 - self.n
            self.write((1 << pad) - 1, pad)  # 1-pad per spec

    def restart(self, idx: int) -> None:
        """Byte-align and emit RSTn (marker bytes are never stuffed)."""
        self.pad_to_byte()
        self.out += bytes([0xFF, 0xD0 + (idx % 8)])

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.out)


class _BitReader:
    """Reads the entropy-coded segment: destuffs FF00; an FF followed by a
    non-zero marker byte ends the segment (the caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise ValueError(f"unexpected marker FF{nxt:02X} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v

    def align_after_restart(self, marker: int) -> None:
        # consume the FF Dn and reset bit state
        assert self.data[self.pos] == 0xFF and self.data[self.pos + 1] == marker
        self.pos += 2
        self.acc = 0
        self.n = 0


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


def _extend(v: int, size: int) -> int:
    """DC/AC magnitude sign extension (T.81 F.2.2.1)."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """Inverse of _extend: value → (size, raw bits)."""
    if v == 0:
        return 0, 0
    size = int(v if v > 0 else -v).bit_length()
    raw = v if v >= 0 else v + (1 << size) - 1
    return size, raw


def _decode_huff(reader: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in scan")


# -- encoder ------------------------------------------------------------------


def _scale_quant(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-convention quality scaling of a base table (public formula)."""
    quality = min(max(quality, 1), 100)
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255).astype(np.int64)


def _encode_block(coefq: np.ndarray, dc_pred: int, w: _BitWriter,
                  dc_enc: dict, ac_enc: dict) -> int:
    """Quantized zigzag coefficients (len 64) → entropy bits; returns new
    DC predictor."""
    dc = int(coefq[0])
    size, raw = _magnitude(dc - dc_pred)
    code, ln = dc_enc[size]
    w.write(code, ln)
    if size:
        w.write(raw, size)
    run = 0
    last_nz = 0
    for i in range(63, 0, -1):
        if coefq[i]:
            last_nz = i
            break
    for i in range(1, last_nz + 1):
        v = int(coefq[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        size, raw = _magnitude(v)
        code, ln = ac_enc[(run << 4) | size]
        w.write(code, ln)
        w.write(raw, size)
        run = 0
    if last_nz < 63:
        code, ln = ac_enc[0x00]  # EOB
        w.write(code, ln)
    return dc


def _plane_blocks(plane: np.ndarray, bx: int, by: int) -> np.ndarray:
    """8×8 block at block-coords (bx, by), edge-replicated."""
    h, w = plane.shape
    ys = np.minimum(np.arange(by * 8, by * 8 + 8), h - 1)
    xs = np.minimum(np.arange(bx * 8, bx * 8 + 8), w - 1)
    return plane[np.ix_(ys, xs)]


def encode_jpeg(rgb: bytes, width: int, height: int, quality: int = 90,
                mode: str = "444", restart_interval: int = 0) -> bytes:
    """RGB888 → baseline JPEG. mode: 'gray' (1 component, from luma),
    '444' (no subsampling), '422' (horizontal-only 2:1 chroma), or
    '420' (2×2 chroma box-average).
    restart_interval > 0 writes a DRI segment and RSTn markers every that
    many MCUs (DC predictors reset) — the resync machinery long scans use."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"rgb buffer is {len(rgb)} B, want {width * height * 3}")
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3).astype(np.float64)
    r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b

    ql = _scale_quant(QUANT_LUMA, quality)
    qc = _scale_quant(QUANT_CHROMA, quality)
    dc_dec, dc_enc = _build_codes(_DC_BITS, _DC_VALS)
    ac_dec, ac_enc = _build_codes(_AC_BITS, _AC_VALS)

    out = bytearray(b"\xff\xd8")  # SOI

    def seg(marker: int, payload: bytes) -> None:
        out.extend(struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload)

    # DQT (8-bit precision)
    seg(0xDB, b"\x00" + bytes(int(ql[z]) for z in ZIGZAG))
    if mode != "gray":
        seg(0xDB, b"\x01" + bytes(int(qc[z]) for z in ZIGZAG))

    # SOF0
    if mode == "gray":
        comps = [(1, 0x11, 0)]
    elif mode == "444":
        comps = [(1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1)]
    elif mode == "422":
        comps = [(1, 0x21, 0), (2, 0x11, 1), (3, 0x11, 1)]
    elif mode == "420":
        comps = [(1, 0x22, 0), (2, 0x11, 1), (3, 0x11, 1)]
    else:
        raise ValueError(f"unknown mode {mode!r}")
    sof = struct.pack(">BHHB", 8, height, width, len(comps))
    for cid, samp, tq in comps:
        sof += struct.pack(">BBB", cid, samp, tq)
    seg(0xC0, sof)

    # DHT: table class/id 0x00 (DC0), 0x10 (AC0), 0x01, 0x11
    def dht(cls_id: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([cls_id] + bits) + bytes(vals)

    seg(0xC4, dht(0x00, _DC_BITS, _DC_VALS) + dht(0x10, _AC_BITS, _AC_VALS))
    if mode != "gray":
        seg(0xC4, dht(0x01, _DC_BITS, _DC_VALS) + dht(0x11, _AC_BITS, _AC_VALS))

    # SOS
    sos = bytes([len(comps)])
    for cid, _s, tq in comps:
        sos += bytes([cid, 0x00 if tq == 0 else 0x11])
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sos += b"\x00\x3f\x00"
    seg(0xDA, sos)

    w = _BitWriter()
    mcu_done = 0
    rst_idx = 0

    total_mcus = 0  # set per mode below

    def maybe_restart(preds) -> None:
        # RST after each full interval, but never after the final MCU
        nonlocal mcu_done, rst_idx
        mcu_done += 1
        if (restart_interval and mcu_done % restart_interval == 0
                and mcu_done < total_mcus):
            w.restart(rst_idx)
            rst_idx += 1
            for i in range(len(preds)):
                preds[i] = 0

    def q_block(plane, bx, by, q) -> np.ndarray:
        coef = _fdct(_plane_blocks(plane, bx, by) - 128.0)
        zz = coef.reshape(64)[ZIGZAG]
        return np.round(zz / q.astype(np.float64)).astype(np.int64)

    qlz = ql.reshape(64)[ZIGZAG]
    qcz = qc.reshape(64)[ZIGZAG]
    if mode == "gray":
        nbx, nby = (width + 7) // 8, (height + 7) // 8
        total_mcus = nbx * nby
        preds = [0]
        for byi in range(nby):
            for bxi in range(nbx):
                preds[0] = _encode_block(q_block(y, bxi, byi, qlz), preds[0],
                                         w, dc_enc, ac_enc)
                maybe_restart(preds)
    elif mode == "444":
        nbx, nby = (width + 7) // 8, (height + 7) // 8
        total_mcus = nbx * nby
        preds = [0, 0, 0]
        for byi in range(nby):
            for bxi in range(nbx):
                for ci, plane, q in ((0, y, qlz), (1, cb, qcz), (2, cr, qcz)):
                    preds[ci] = _encode_block(q_block(plane, bxi, byi, q),
                                              preds[ci], w, dc_enc, ac_enc)
                maybe_restart(preds)
    elif mode == "422":
        # horizontal-only chroma box-average
        def hhalf(p: np.ndarray) -> np.ndarray:
            hh, ww = p.shape
            pe = np.pad(p, ((0, 0), (0, ww % 2)), mode="edge")
            return (pe[:, 0::2] + pe[:, 1::2]) / 2.0

        cbh, crh = hhalf(cb), hhalf(cr)
        nmx, nmy = (width + 15) // 16, (height + 7) // 8
        total_mcus = nmx * nmy
        preds = [0, 0, 0]
        for myi in range(nmy):
            for mxi in range(nmx):
                for dx in range(2):
                    preds[0] = _encode_block(
                        q_block(y, mxi * 2 + dx, myi, qlz),
                        preds[0], w, dc_enc, ac_enc)
                preds[1] = _encode_block(q_block(cbh, mxi, myi, qcz),
                                         preds[1], w, dc_enc, ac_enc)
                preds[2] = _encode_block(q_block(crh, mxi, myi, qcz),
                                         preds[2], w, dc_enc, ac_enc)
                maybe_restart(preds)
    else:  # 420
        # chroma box-average over 2×2 (pad odd dims by edge replication)
        def half(p: np.ndarray) -> np.ndarray:
            hh, ww = p.shape
            pe = np.pad(p, ((0, hh % 2), (0, ww % 2)), mode="edge")
            return (pe[0::2, 0::2] + pe[0::2, 1::2] + pe[1::2, 0::2]
                    + pe[1::2, 1::2]) / 4.0

        cbh, crh = half(cb), half(cr)
        nmx, nmy = (width + 15) // 16, (height + 15) // 16
        total_mcus = nmx * nmy
        preds = [0, 0, 0]
        for myi in range(nmy):
            for mxi in range(nmx):
                for dy in range(2):
                    for dx in range(2):
                        preds[0] = _encode_block(
                            q_block(y, mxi * 2 + dx, myi * 2 + dy, qlz),
                            preds[0], w, dc_enc, ac_enc)
                preds[1] = _encode_block(q_block(cbh, mxi, myi, qcz),
                                         preds[1], w, dc_enc, ac_enc)
                preds[2] = _encode_block(q_block(crh, mxi, myi, qcz),
                                         preds[2], w, dc_enc, ac_enc)
                maybe_restart(preds)
    out.extend(w.flush())
    out.extend(b"\xff\xd9")  # EOI
    return bytes(out)


# -- decoder ------------------------------------------------------------------


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """Baseline JPEG → (width, height, interleaved RGB888)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: missing SOI")
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → decode table
    frame = None
    restart_interval = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            raise ValueError("no scan data before EOI")
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        (seglen,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + seglen]
        pos += seglen
        if marker == 0xDB:  # DQT (possibly several tables)
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0xF
                p += 1
                n = 64 * (2 if pq else 1)
                raw = body[p : p + n]
                p += n
                if pq:
                    vals = np.frombuffer(raw, dtype=">u2").astype(np.int64)
                else:
                    vals = np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                tbl = np.zeros(64, dtype=np.int64)
                tbl[np.array(ZIGZAG)] = vals  # stream order is zigzag
                quant[tq] = tbl
        elif marker == 0xC4:  # DHT (possibly several tables)
            p = 0
            while p < len(body):
                cls, tid = body[p] >> 4, body[p] & 0xF
                bits = list(body[p + 1 : p + 17])
                n = sum(bits)
                vals = list(body[p + 17 : p + 17 + n])
                huff[(cls, tid)], _ = _build_codes(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w_, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit samples not supported")
            comps = []
            for i in range(nc):
                cid, samp, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
            frame = {"w": w_, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"only baseline sequential (SOF0) supported, got SOF{marker & 0xF}"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF0")
            ns = body[0]
            scan_tabs = {}
            for i in range(ns):
                cid, tt = body[1 + 2 * i], body[2 + 2 * i]
                scan_tabs[cid] = (tt >> 4, tt & 0xF)
            return _decode_scan(data, pos, frame, quant, huff, scan_tabs,
                                restart_interval)
        # APPn / COM / others: skipped
    raise ValueError("no SOS marker found")


def _decode_scan(data, pos, frame, quant, huff, scan_tabs, restart_interval):
    w_, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    layout = tuple(sorted((c["h"], c["v"]) for c in comps))
    # the MCU walk and repeat-upsampling are generic in (h, v); accept any
    # baseline-legal factors where every component divides the maxima
    # (covers 4:4:4, 4:2:2, 4:2:0, 4:1:1 and gray)
    for c in comps:
        if not (1 <= c["h"] <= 4 and 1 <= c["v"] <= 4
                and hmax % c["h"] == 0 and vmax % c["v"] == 0):
            raise NotImplementedError(f"unsupported sampling layout {layout}")
    mcux = (w_ + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8)) for c in comps
    }
    reader = _BitReader(data, pos)
    preds = {c["id"]: 0 for c in comps}
    mcu_count = 0
    next_rst = 0

    def decode_block(c):
        dc_tab = huff.get((0, scan_tabs[c["id"]][0]))
        ac_tab = huff.get((1, scan_tabs[c["id"]][1]))
        q = quant[c["tq"]]
        if dc_tab is None or ac_tab is None:
            raise ValueError("scan references missing huffman table")
        s = _decode_huff(reader, dc_tab)
        diff = _extend(reader.receive(s), s)
        preds[c["id"]] += diff
        zz = np.zeros(64, dtype=np.int64)
        zz[0] = preds[c["id"]]
        k = 1
        while k < 64:
            rs = _decode_huff(reader, ac_tab)
            r, s = rs >> 4, rs & 0xF
            if rs == 0x00:  # EOB
                break
            if rs == 0xF0:  # ZRL
                k += 16
                continue
            k += r
            if k > 63:
                raise ValueError("AC index past 63")
            zz[k] = _extend(reader.receive(s), s)
            k += 1
        coef = np.zeros(64, dtype=np.float64)
        # zz[i] is the i-th ZIGZAG-order coefficient; its quant step lives at
        # natural position ZIGZAG[i] of the (natural-order) table q.
        coef[_ZZ] = (zz * q[_ZZ]).astype(np.float64)
        return _idct(coef.reshape(8, 8)) + 128.0

    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align_after_restart(0xD0 + next_rst)
                next_rst = (next_rst + 1) % 8
                for cid in preds:
                    preds[cid] = 0
            try:
                for c in comps:
                    for dy in range(c["v"]):
                        for dx in range(c["h"]):
                            blk = decode_block(c)
                            y0 = (my * c["v"] + dy) * 8
                            x0 = (mx * c["h"] + dx) * 8
                            planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = blk
            except _RestartMarker as rm:
                raise ValueError(
                    f"restart marker FF{rm.marker:02X} inside an MCU"
                ) from None
            mcu_count += 1

    # crop to nominal size, upsample chroma to full resolution
    full = {}
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full[c["id"]] = p[:h, :w_]
    if len(comps) == 1:
        yv = np.clip(np.round(full[comps[0]["id"]]), 0, 255).astype(np.uint8)
        rgb = np.repeat(yv[:, :, None], 3, axis=2)
        return w_, h, rgb.tobytes()
    yv = full[comps[0]["id"]]
    cb = full[comps[1]["id"]] - 128.0
    cr = full[comps[2]["id"]] - 128.0
    r = yv + 1.402 * cr
    g = yv - 0.344136 * cb - 0.714136 * cr
    b = yv + 1.772 * cb
    rgb = np.stack(
        [np.clip(np.round(x), 0, 255).astype(np.uint8) for x in (r, g, b)],
        axis=2,
    )
    return w_, h, rgb.tobytes()
