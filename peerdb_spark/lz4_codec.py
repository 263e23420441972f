"""From-scratch LZ4 frame codec + XXH32 (public specs: lz4_Frame_format.md,
lz4_Block_format.md, xxhash_spec.md — all published in the lz4/xxHash
repositories).

Kafka record batches (magic v2) compress the records section with the LZ4
FRAME format (codec 3) — magic 0x184D2204, FLG/BD descriptor with an
XXH32 header-checksum byte, independent data blocks (each either an LZ4
block or stored uncompressed with the high size bit set), an end mark,
and an optional XXH32 content checksum. The legacy v0/v1 message sets
used a broken header-checksum variant; that quirk does not apply to v2
and is deliberately not implemented.

Block grammar: sequences of [token][literal-length ext][literals]
[2B LE offset][match-length ext]; token high nibble = literal length
(15 → 255-extension bytes), low nibble = match length − 4. The last
sequence is literals-only; the spec requires the last 5 bytes to be
literals and any match to start ≥ 12 bytes before the block end — the
compressor enforces both, the decompressor accepts the full grammar
(overlapping matches copied byte-by-byte) with strict validation.

XXH32 is implemented from its published spec (stripe accumulators,
rotate-multiply lanes, avalanche) and pinned by the spec's check values.
"""

from __future__ import annotations

import struct

_P1 = 2654435761
_P2 = 2246822519
_P3 = 3266489917
_P4 = 668265263
_P5 = 374761393
_M32 = 0xFFFFFFFF


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def xxh32(data: bytes, seed: int = 0) -> int:
    """XXH32 per the published spec (little-endian lanes)."""
    n = len(data)
    pos = 0
    if n >= 16:
        a1 = (seed + _P1 + _P2) & _M32
        a2 = (seed + _P2) & _M32
        a3 = seed & _M32
        a4 = (seed - _P1) & _M32
        while pos + 16 <= n:
            l1, l2, l3, l4 = struct.unpack_from("<IIII", data, pos)
            a1 = (_rotl((a1 + l1 * _P2) & _M32, 13) * _P1) & _M32
            a2 = (_rotl((a2 + l2 * _P2) & _M32, 13) * _P1) & _M32
            a3 = (_rotl((a3 + l3 * _P2) & _M32, 13) * _P1) & _M32
            a4 = (_rotl((a4 + l4 * _P2) & _M32, 13) * _P1) & _M32
            pos += 16
        acc = (_rotl(a1, 1) + _rotl(a2, 7) + _rotl(a3, 12) + _rotl(a4, 18)) & _M32
    else:
        acc = (seed + _P5) & _M32
    acc = (acc + n) & _M32
    while pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        acc = (_rotl((acc + lane * _P3) & _M32, 17) * _P4) & _M32
        pos += 4
    while pos < n:
        acc = (_rotl((acc + data[pos] * _P5) & _M32, 11) * _P1) & _M32
        pos += 1
    acc ^= acc >> 15
    acc = (acc * _P2) & _M32
    acc ^= acc >> 13
    acc = (acc * _P3) & _M32
    acc ^= acc >> 16
    return acc


# -- block format -------------------------------------------------------------


def _write_len(out: bytearray, n: int) -> None:
    """Length extension bytes for a 15-valued nibble."""
    n -= 15
    while n >= 255:
        out.append(255)
        n -= 255
    out.append(n)


def lz4_block_compress(data: bytes) -> bytes:
    """One LZ4 block (greedy 4-byte-hash matcher, 64 KiB offsets).
    Every output obeys the end-of-block rules (last 5 bytes literal,
    matches start ≥ 12 bytes before the end), so any conformant
    decompressor reads it."""
    n = len(data)
    out = bytearray()
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0

    def emit(lit_end: int, match_len: int, offset: int) -> None:
        lits = lit_end - lit_start
        tok_l = 15 if lits >= 15 else lits
        tok_m = 0 if match_len == 0 else (15 if match_len - 4 >= 15
                                          else match_len - 4)
        out.append((tok_l << 4) | tok_m)
        if lits >= 15:
            _write_len(out, lits)
        out.extend(data[lit_start:lit_end])
        if match_len:
            out.extend(offset.to_bytes(2, "little"))
            if match_len - 4 >= 15:
                _write_len(out, match_len - 4)

    # matches may not start in the final 12 bytes
    while i + 4 <= n and i <= n - 13:
        key = data[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 65535:
            length = 4
            maxlen = (n - 5) - i  # matches must not cover the last 5 bytes
            while length < maxlen and data[j + length] == data[i + length]:
                length += 1
            if length >= 4:
                emit(i, length, i - j)
                i += length
                lit_start = i
                continue
        i += 1
    emit(n, 0, 0)  # final literals-only sequence
    return bytes(out)


def lz4_block_decompress(data: bytes, max_size: int = 1 << 27) -> bytes:
    out = bytearray()
    pos = 0
    n = len(data)
    while pos < n:
        token = data[pos]
        pos += 1
        lits = token >> 4
        if lits == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated literal length")
                b = data[pos]
                pos += 1
                lits += b
                if b != 255:
                    break
        if pos + lits > n:
            raise ValueError("lz4: truncated literals")
        out += data[pos : pos + lits]
        pos += lits
        if pos == n:
            break  # final literals-only sequence
        if pos + 2 > n:
            raise ValueError("lz4: truncated match offset")
        offset = int.from_bytes(data[pos : pos + 2], "little")
        pos += 2
        if offset == 0 or offset > len(out):
            raise ValueError("lz4: match offset out of range")
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                if pos >= n:
                    raise ValueError("lz4: truncated match length")
                b = data[pos]
                pos += 1
                mlen += b
                if b != 255:
                    break
        if len(out) + mlen > max_size:
            raise ValueError("lz4: output exceeds size bound")
        start = len(out) - offset
        if offset >= mlen:
            out += out[start : start + mlen]
        else:  # overlapping match (RLE idiom): byte-by-byte
            for _ in range(mlen):
                out.append(out[start])
                start += 1
    return bytes(out)


# -- frame format --------------------------------------------------------------

_MAGIC = 0x184D2204
_BLOCK_MAX = 65536  # BD code 4 (64 KiB)


def lz4_frame_compress(data: bytes) -> bytes:
    """LZ4 frame: v01, independent blocks, no block checksums, content
    checksum on, 64 KiB max block size. Incompressible blocks are stored
    (high size bit), as the spec prescribes."""
    flg = (1 << 6) | (1 << 5) | (1 << 2)  # version 01, indep blocks, C.cksum
    bd = 4 << 4
    desc = bytes([flg, bd])
    hc = (xxh32(desc) >> 8) & 0xFF
    out = bytearray(struct.pack("<I", _MAGIC) + desc + bytes([hc]))
    for off in range(0, len(data), _BLOCK_MAX):
        chunk = data[off : off + _BLOCK_MAX]
        comp = lz4_block_compress(chunk)
        if len(comp) < len(chunk):
            out += struct.pack("<I", len(comp))
            out += comp
        else:
            out += struct.pack("<I", len(chunk) | 0x80000000)
            out += chunk
    out += struct.pack("<I", 0)  # EndMark
    out += struct.pack("<I", xxh32(data))  # content checksum
    return bytes(out)


def lz4_frame_decompress(data: bytes) -> bytes:
    if len(data) < 7:
        raise ValueError("lz4: truncated frame header")
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != _MAGIC:
        raise ValueError(f"lz4: bad magic {magic:#x}")
    flg = data[4]
    if (flg >> 6) != 1:
        raise ValueError("lz4: unsupported frame version")
    has_bcksum = bool(flg & (1 << 4))
    has_csize = bool(flg & (1 << 3))
    has_ccksum = bool(flg & (1 << 2))
    has_dict = bool(flg & 1)
    bd = data[5]
    pos = 6
    if has_csize:
        pos += 8
    if has_dict:
        pos += 4
    if pos >= len(data):  # optional descriptor fields extend the header
        raise ValueError("lz4: truncated frame header")
    hc = data[pos]
    if (xxh32(data[4:pos]) >> 8) & 0xFF != hc:
        raise ValueError("lz4: frame header checksum mismatch")
    pos += 1
    # reserved-bit validation AFTER the header checksum: a corrupt
    # descriptor reports as a checksum mismatch, a well-checksummed but
    # spec-invalid one as the specific violation
    if flg & (1 << 1):  # FLG bit 1 is reserved, must be 0 per the spec
        raise ValueError("lz4: reserved FLG bit set")
    if bd & 0x8F:  # BD bits 7 and 3-0 are reserved, must be 0
        raise ValueError("lz4: reserved BD bits set")
    bmax_code = (bd >> 4) & 0x7
    if bmax_code < 4:
        raise ValueError(f"lz4: invalid block max size code {bmax_code}")
    bmax = 1 << (8 + 2 * bmax_code)  # 4→64 KiB .. 7→4 MiB
    out = bytearray()
    while True:
        if pos + 4 > len(data):
            raise ValueError("lz4: truncated block size")
        (bsize,) = struct.unpack_from("<I", data, pos)
        pos += 4
        if bsize == 0:
            break  # EndMark
        stored = bool(bsize & 0x80000000)
        bsize &= 0x7FFFFFFF
        if bsize > bmax:
            raise ValueError(
                f"lz4: block size {bsize} exceeds declared BD max {bmax}"
            )
        if pos + bsize > len(data):
            raise ValueError("lz4: truncated block")
        block = data[pos : pos + bsize]
        pos += bsize
        if has_bcksum:
            if pos + 4 > len(data):
                raise ValueError("lz4: truncated block checksum")
            (bc,) = struct.unpack_from("<I", data, pos)
            pos += 4
            if xxh32(block) != bc:
                raise ValueError("lz4: block checksum mismatch")
        if stored:
            out += block
        else:
            dec = lz4_block_decompress(block, max_size=bmax)
            if len(dec) > bmax:
                raise ValueError(
                    "lz4: decompressed block exceeds declared BD max"
                )
            out += dec
    if has_ccksum:
        if pos + 4 > len(data):
            raise ValueError("lz4: truncated content checksum")
        (cc,) = struct.unpack_from("<I", data, pos)
        if xxh32(bytes(out)) != cc:
            raise ValueError("lz4: content checksum mismatch")
    return bytes(out)
