"""Pure-Python PNG codec (stdlib zlib + numpy filter math) — no PIL.

Implements the public PNG specification (W3C PNG, RFC 2083): signature,
chunk framing with CRC-32, IHDR/PLTE/IDAT/IEND, zlib-deflated scanlines,
and all five filter types (None/Sub/Up/Average/Paeth). This unlocks
`multimodal.decode_encoded` for ENCODED image payloads — a real training
corpus ships PNG/JPEG, not raw RGB — without any codec library. (Baseline
JPEG has its own from-scratch codec in functions/jpeg.py.)

Decoder scope (raises on anything else, never guesses):
- bit depths 8 and 16 (16-bit reduces to the high byte); color types 0
  (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA); sequential AND
  Adam7-interlaced. Output always expands to interleaved RGB —
  the native format of every kernel in functions/multimodal — dropping
  alpha (compositing policy belongs upstream).

Encoder exists for fixtures/tests and the declared roundtrip query: RGB in,
any per-scanline filter type out (the declared query varies the filter by
row, so every unfilter path is exercised end-to-end on the gate).

Scale notes: per-image decode cost only; called from Arrow-batched
mapInPandas (multimodal.decode_images) so the work is embarrassingly
parallel and never touches a shuffle. Sub/None/Up unfilter are vectorized
numpy; Average/Paeth walk pixels per scanline (left-neighbor data
dependence is inherent to the format) with the bpp lanes vectorized.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type → channels in the scanline
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunk(tag: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor over int32 arrays (spec §6.6 pseudocode, ties a,b,c)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(
    rgb: bytes,
    width: int,
    height: int,
    filter_for_row=None,
    color_type: int = 2,
    bit_depth: int = 8,
) -> bytes:
    """RGB888 buffer → PNG bytes. `filter_for_row(y) -> 0..4` picks the
    per-scanline filter (default: 0/None). color_type 2 writes the pixels
    verbatim; 6 pads an opaque alpha; 0 writes the red channel as gray
    (caller guarantees r==g==b if roundtrip equality matters); 3 builds a
    palette of the distinct pixels (≤256 required). bit_depth 1/2/4 is
    accepted for color types 0 and 3 (spec §11.2.2 valid combinations):
    gray samples must be exact multiples of 255/(2^depth−1) so the decode
    roundtrips bit-exact, palettes must fit in 2^depth entries; scanlines
    are packed MSB-first with the filter applied to the PACKED bytes
    (spec §7.2 — filters always operate on bytes, bpp=1 for sub-byte)."""
    if len(rgb) != width * height * 3:
        raise ValueError(f"rgb buffer is {len(rgb)} B, want {width * height * 3}")
    img = np.frombuffer(rgb, dtype=np.uint8).reshape(height, width, 3)
    plte = b""
    if color_type == 2:
        raw = img
    elif color_type == 6:
        raw = np.concatenate(
            [img, np.full((height, width, 1), 255, dtype=np.uint8)], axis=2
        )
    elif color_type == 0:
        raw = img[:, :, :1]
    elif color_type == 4:
        raw = np.concatenate(
            [img[:, :, :1], np.full((height, width, 1), 255, dtype=np.uint8)], axis=2
        )
    elif color_type == 3:
        flat = img.reshape(-1, 3)
        pal, inv = np.unique(flat, axis=0, return_inverse=True)
        if len(pal) > 256:
            raise ValueError(f"palette encode needs <=256 colors, got {len(pal)}")
        plte = _chunk(b"PLTE", pal.astype(np.uint8).tobytes())
        raw = inv.astype(np.uint8).reshape(height, width, 1)
    else:
        raise ValueError(f"unsupported encoder color type {color_type}")

    if bit_depth != 8:
        if bit_depth not in (1, 2, 4) or color_type not in (0, 3):
            raise ValueError(
                f"bit depth {bit_depth} invalid for color type {color_type}"
            )
        levels = (1 << bit_depth) - 1
        if color_type == 0:
            scale = 255 // levels
            if (raw % scale).any():
                raise ValueError(
                    f"gray samples must be multiples of {scale} at depth"
                    f" {bit_depth} for an exact roundtrip"
                )
            samples = raw[:, :, 0] // scale
        else:
            if raw.max(initial=0) > levels:
                raise ValueError(
                    f"palette has {raw.max() + 1} entries, depth {bit_depth}"
                    f" indexes only {levels + 1}"
                )
            samples = raw[:, :, 0]
        # pack width k-bit samples MSB-first into ceil(width*k/8) bytes/row
        bits = (
            (samples[:, :, None] >> np.arange(bit_depth - 1, -1, -1)) & 1
        ).reshape(height, width * bit_depth)
        raw = np.packbits(bits.astype(np.uint8), axis=1)[:, :, None]

    bpp = raw.shape[2]
    rw = raw.shape[1]  # row length in filter units (packed bytes when sub-byte)
    out = bytearray()
    prev = np.zeros((rw, bpp), dtype=np.int32)
    for y in range(height):
        row = raw[y].astype(np.int32)  # (rw, bpp)
        ft = 0 if filter_for_row is None else int(filter_for_row(y))
        left = np.vstack([np.zeros((1, bpp), dtype=np.int32), row[:-1]])
        upleft = np.vstack([np.zeros((1, bpp), dtype=np.int32), prev[:-1]])
        if ft == 0:
            filt = row
        elif ft == 1:
            filt = row - left
        elif ft == 2:
            filt = row - prev
        elif ft == 3:
            filt = row - (left + prev) // 2
        elif ft == 4:
            filt = row - _paeth(left, prev, upleft)
        else:
            raise ValueError(f"unknown filter type {ft}")
        out.append(ft)
        out += (filt % 256).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + plte
        + _chunk(b"IDAT", zlib.compress(bytes(out)))
        + _chunk(b"IEND", b"")
    )


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass (spec §8.2)
_ADAM7 = [
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
]


def _unfilter(raw: bytes, off: int, width: int, height: int, bpp: int) -> np.ndarray:
    """Reverse the per-scanline filters of one (sub-)image whose filtered
    bytes start at `off`; returns (height, width, bpp) uint8. Sub/None/Up
    are vectorized; Average/Paeth walk pixels (left-neighbor dependence)
    with the bpp lanes vectorized."""
    rowbytes = width * bpp
    if off + height * (rowbytes + 1) > len(raw):
        raise ValueError("filtered data shorter than the image demands")
    recon = np.empty((height, width, bpp), dtype=np.uint8)
    prev = np.zeros((width, bpp), dtype=np.int32)
    for y in range(height):
        base = off + y * (rowbytes + 1)
        ft = raw[base]
        row = np.frombuffer(raw, dtype=np.uint8, count=rowbytes, offset=base + 1)
        row = row.reshape(width, bpp).astype(np.int32)
        if ft == 0:
            cur = row
        elif ft == 1:  # Sub: per-lane cumulative sum (vectorized)
            cur = np.cumsum(row, axis=0) % 256
        elif ft == 2:  # Up (vectorized)
            cur = (row + prev) % 256
        elif ft == 3:  # Average: left-dependence → plain-int pixel walk
            # (numpy scalar ops per pixel cost ~200× the Up filter; python
            # ints over tolist()'d rows are ~5× faster than lane arrays)
            rl = row.tolist()
            pl = prev.tolist()
            out = []
            left = [0] * bpp
            for x in range(width):
                px = pl[x]
                rx = rl[x]
                left = [(rx[i] + ((left[i] + px[i]) >> 1)) & 255
                        for i in range(bpp)]
                out.append(left)
            cur = np.array(out, dtype=np.int32)
        elif ft == 4:  # Paeth: left-dependence → plain-int pixel walk
            rl = row.tolist()
            pl = prev.tolist()
            out = []
            left = [0] * bpp
            upleft = [0] * bpp
            for x in range(width):
                px = pl[x]
                rx = rl[x]
                new = []
                for i in range(bpp):
                    a, b, c = left[i], px[i], upleft[i]
                    p = a + b - c
                    pa = p - a if p >= a else a - p
                    pb = p - b if p >= b else b - p
                    pc = p - c if p >= c else c - p
                    pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    new.append((rx[i] + pr) & 255)
                out.append(new)
                left = new
                upleft = px
            cur = np.array(out, dtype=np.int32)
        else:
            raise ValueError(f"invalid filter type {ft} in scanline {y}")
        recon[y] = cur.astype(np.uint8)
        prev = cur
    return recon


def _read_subimage(
    raw: bytes, off: int, w: int, h: int, depth: int, channels: int
) -> tuple[np.ndarray, int]:
    """Unfilter + unpack one (sub-)image starting at filtered-byte `off`.

    Returns ((h, w, lanes) uint8, bytes consumed) — lanes is the byte
    count per pixel for depths ≥8 (two bytes per sample at 16), and 1 for
    sub-byte depths, whose values are the raw k-bit samples. Sub-byte
    scanlines pack samples MSB-first into ceil(w·depth/8) bytes and are
    filtered at byte granularity (spec §7.2: bpp is rounded up to 1)."""
    if depth >= 8:
        bpp = channels * (depth // 8)
        return _unfilter(raw, off, w, h, bpp), h * (w * bpp + 1)
    rowbytes = (w * depth + 7) // 8
    packed = _unfilter(raw, off, rowbytes, h, 1).reshape(h, rowbytes)
    bits = np.unpackbits(packed, axis=1)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint8)
    samples = (bits.reshape(h, rowbytes * 8 // depth, depth) * weights).sum(
        axis=2, dtype=np.uint8
    )[:, :w]
    return samples.reshape(h, w, 1), h * (rowbytes + 1)


# spec §11.2.2: the valid (color type → bit depths) combinations
_VALID_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8), 4: (8, 16), 6: (8, 16)}


def decode_png(data: bytes) -> tuple[int, int, bytes]:
    """PNG bytes → (width, height, interleaved RGB888 buffer).

    Covers every spec §11.2.2 (color type, bit depth) combination —
    gray/palette at 1/2/4/8(/16 gray) bits, truecolor/alpha at 8/16 —
    sequential or Adam7-interlaced. Validates the signature and every
    chunk CRC; raises ValueError on corruption — a torn payload must
    never decode to silently-wrong pixels, and the low-level escapes
    corruption can trigger (short chunk reads, broken deflate streams)
    convert to ValueError at this boundary."""
    try:
        return _decode_png(data)
    except (struct.error, zlib.error, IndexError) as e:
        raise ValueError(f"corrupt PNG stream ({type(e).__name__})") from e


def _decode_png(data: bytes) -> tuple[int, int, bytes]:
    if data[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos, ihdr, plte, idat = 8, None, None, bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated chunk {tag!r}")
        (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
        if crc != zlib.crc32(tag + body) & 0xFFFFFFFF:
            raise ValueError(f"bad CRC in chunk {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        # ancillary chunks (tEXt, gAMA, …) are skipped
        pos += 12 + length
    if ihdr is None:
        raise ValueError("no IHDR chunk")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if color_type not in _CHANNELS:
        raise ValueError(f"invalid color type {color_type}")
    if depth not in _VALID_DEPTHS[color_type]:
        raise ValueError(
            f"bit depth {depth} invalid for color type {color_type}"
        )
    if comp != 0 or filt != 0:
        raise ValueError("invalid compression/filter method")
    if interlace not in (0, 1):
        raise ValueError(f"invalid interlace method {interlace}")
    if color_type == 3 and plte is None:
        raise ValueError("palette image without PLTE")

    channels = _CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))

    if interlace == 0:
        recon, consumed = _read_subimage(raw, 0, width, height, depth, channels)
        if len(raw) != consumed:
            raise ValueError(f"decompressed {len(raw)} B, want {consumed}")
    else:  # Adam7: seven independently-filtered sub-images, scattered back
        lanes = channels * (depth // 8) if depth >= 8 else 1
        recon = np.empty((height, width, lanes), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            wp = (width - x0 + dx - 1) // dx
            hp = (height - y0 + dy - 1) // dy
            if wp <= 0 or hp <= 0:
                continue  # empty pass contributes no bytes
            sub, consumed = _read_subimage(raw, off, wp, hp, depth, channels)
            recon[y0::dy, x0::dx] = sub
            off += consumed
        if off != len(raw):
            raise ValueError(
                f"decompressed {len(raw)} B, interlaced passes want {off}"
            )

    if depth < 8:
        if color_type == 0:
            # scale k-bit gray to 8-bit: ×255/(2^k−1), exact for k=1/2/4
            recon = recon * np.uint8(255 // ((1 << depth) - 1))
        elif int(recon.max(initial=0)) >= len(plte if plte is not None else ()):
            raise ValueError("palette index out of range")
    if depth == 16:
        # 16→8: keep the most-significant byte of each big-endian sample
        # (the standard reduction; PNG stores 16-bit samples network-order)
        recon = recon.reshape(height, width, _CHANNELS[color_type], 2)[:, :, :, 0]

    if color_type == 2:
        rgb = recon
    elif color_type == 6:
        rgb = recon[:, :, :3]
    elif color_type == 0:
        rgb = np.repeat(recon, 3, axis=2)
    elif color_type == 4:
        rgb = np.repeat(recon[:, :, :1], 3, axis=2)
    else:  # 3: palette lookup
        rgb = plte[recon[:, :, 0]]
    return width, height, np.ascontiguousarray(rgb).tobytes()
