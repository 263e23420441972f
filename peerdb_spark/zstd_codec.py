"""Spec-minimal zstd frame codec + XXH64, from the public specs (RFC 8878 /
zstd_compression_format.md; xxhash_spec.md).

Zstandard frames permit blocks of three kinds: Raw (stored), RLE (one byte
repeated), and Compressed (FSE/Huffman sequences). A frame built ONLY from
Raw and RLE blocks is fully valid zstd — any conformant decoder (including
a real broker's libzstd) reads it — which is exactly the trick the LZ4
frame codec used for interop without a codec lib. This encoder emits
single-segment frames with a frame-content-size field, run-splitting
RLE/Raw blocks, and the optional XXH64 content checksum; the decoder reads
everything a conformant ENCODER can emit: Raw/RLE blocks here, Compressed
(FSE/Huffman) blocks through zstd_entropy (round 9 — the consume path now
interops with real libzstd/franz-go producers; pinned against pyarrow's
bundled libzstd in tests), with strict rejects (reserved bits, block-size
bounds, FCS and checksum mismatches). Dictionary frames keep a descriptive
ValueError scope gate.

The reference's franz-go client negotiates zstd in its default codec set
(flow/connectors/kafka/kafka.go — studied, not copied); this module lets
the wire sink complete that codec matrix with stdlib only.

Frame layout (RFC 8878 §3.1.1, little-endian):
- magic 0xFD2FB528;
- Frame_Header_Descriptor byte: bits 7-6 FCS-field-size code, bit 5
  Single_Segment, bit 4 unused, bit 3 RESERVED (must be 0), bit 2
  Content_Checksum, bits 1-0 Dictionary_ID field size;
- Window_Descriptor byte unless single-segment (window = (1 << (10+exp))
  * (8+mantissa)/8);
- Frame_Content_Size: 0/1/2/4/8 bytes (the 2-byte form stores size-256);
- blocks, each with a 3-byte LE header: bit 0 Last_Block, bits 1-2 type
  (0 Raw / 1 RLE / 2 Compressed / 3 Reserved), bits 3-23 Block_Size
  (for RLE this is the REGENERATED size; content is one byte). Block size
  is bounded by min(window, 128 KiB);
- if Content_Checksum: 4 bytes = low 32 bits of XXH64(content, seed=0).
"""

from __future__ import annotations

import struct

_MAGIC = 0xFD2FB528
_BLOCK_MAX = 128 * 1024  # spec: Block_Maximum_Size ≤ 128 KiB always
_RLE_MIN = 16  # shortest run worth breaking a Raw block for (2 headers + 1)

# -- XXH64 (xxhash_spec.md) ----------------------------------------------------

_P64_1 = 0x9E3779B185EBCA87
_P64_2 = 0xC2B2AE3D27D4EB4F
_P64_3 = 0x165667B19E3779F9
_P64_4 = 0x85EBCA77C2B2AE63
_P64_5 = 0x27D4EB2F165667C5
_M64 = 0xFFFFFFFFFFFFFFFF


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _round64(acc: int, lane: int) -> int:
    return (_rotl64((acc + lane * _P64_2) & _M64, 31) * _P64_1) & _M64


def _merge64(acc: int, lane_acc: int) -> int:
    return ((acc ^ _round64(0, lane_acc)) * _P64_1 + _P64_4) & _M64


def xxh64(data: bytes, seed: int = 0) -> int:
    """XXH64 per the published spec (little-endian lanes). Pinned by the
    spec check values and cross-checked against Spark SQL's xxhash64
    (seed 42) in tests — an independent JVM implementation."""
    n = len(data)
    pos = 0
    if n >= 32:
        a1 = (seed + _P64_1 + _P64_2) & _M64
        a2 = (seed + _P64_2) & _M64
        a3 = seed & _M64
        a4 = (seed - _P64_1) & _M64
        while pos + 32 <= n:
            l1, l2, l3, l4 = struct.unpack_from("<QQQQ", data, pos)
            a1 = _round64(a1, l1)
            a2 = _round64(a2, l2)
            a3 = _round64(a3, l3)
            a4 = _round64(a4, l4)
            pos += 32
        acc = (_rotl64(a1, 1) + _rotl64(a2, 7)
               + _rotl64(a3, 12) + _rotl64(a4, 18)) & _M64
        acc = _merge64(acc, a1)
        acc = _merge64(acc, a2)
        acc = _merge64(acc, a3)
        acc = _merge64(acc, a4)
    else:
        acc = (seed + _P64_5) & _M64
    acc = (acc + n) & _M64
    while pos + 8 <= n:
        (lane,) = struct.unpack_from("<Q", data, pos)
        acc = (_rotl64(acc ^ _round64(0, lane), 27) * _P64_1 + _P64_4) & _M64
        pos += 8
    if pos + 4 <= n:
        (lane,) = struct.unpack_from("<I", data, pos)
        acc = (_rotl64(acc ^ ((lane * _P64_1) & _M64), 23) * _P64_2 + _P64_3) & _M64
        pos += 4
    while pos < n:
        acc = (_rotl64(acc ^ ((data[pos] * _P64_5) & _M64), 11) * _P64_1) & _M64
        pos += 1
    acc ^= acc >> 33
    acc = (acc * _P64_2) & _M64
    acc ^= acc >> 29
    acc = (acc * _P64_3) & _M64
    acc ^= acc >> 32
    return acc


# -- frame encode ---------------------------------------------------------------


def _block_header(size: int, btype: int, last: bool) -> bytes:
    return ((size << 3) | (btype << 1) | int(last)).to_bytes(3, "little")


def _split_runs(chunk: bytes) -> list[tuple[int, bytes]]:
    """Split one ≤128 KiB chunk into (type, payload) blocks: runs of one
    byte ≥ _RLE_MIN become RLE blocks (payload = the full run; encoded as
    1 byte + regenerated size), the rest Raw. Linear scan, deterministic."""
    out: list[tuple[int, bytes]] = []
    n = len(chunk)
    i = 0
    raw_start = 0
    while i < n:
        j = i + 1
        while j < n and chunk[j] == chunk[i]:
            j += 1
        if j - i >= _RLE_MIN:
            if i > raw_start:
                out.append((0, chunk[raw_start:i]))
            out.append((1, chunk[i:j]))
            raw_start = j
        i = j
    if n > raw_start or not out:
        out.append((0, chunk[raw_start:]))
    return out


def zstd_compress(data: bytes, entropy: bool = True) -> bytes:
    """bytes → one single-segment zstd frame (FCS field, XXH64 content
    checksum). Valid input for any conformant decoder.

    Each ≤128 KiB chunk is encoded as whichever is smaller: the Raw/RLE
    run split, or (round 9, entropy=True) a Compressed block with
    Huffman-coded literals and zero sequences (zstd_entropy.
    encode_compressed_block) — real entropy compression for JSON/text
    payloads the run splitter leaves untouched. entropy=False keeps the
    Raw/RLE-only frames (deterministic and cheapest to produce)."""
    data = bytes(data)
    n = len(data)
    if n <= 255:
        fcs_code, fcs = 0, bytes([n])
    elif n <= 65791:
        fcs_code, fcs = 1, struct.pack("<H", n - 256)
    elif n < 1 << 32:
        fcs_code, fcs = 2, struct.pack("<I", n)
    else:
        fcs_code, fcs = 3, struct.pack("<Q", n)
    fhd = (fcs_code << 6) | (1 << 5) | (1 << 2)  # single-segment + checksum
    out = bytearray(struct.pack("<I", _MAGIC))
    out.append(fhd)
    out += fcs
    chunks = [data[off : off + _BLOCK_MAX] for off in range(0, n, _BLOCK_MAX)]
    if not chunks:
        chunks = [b""]
    blocks: list[tuple[int, bytes]] = []
    for chunk in chunks:
        runs = _split_runs(chunk)
        run_cost = sum(3 + (1 if t == 1 else len(p)) for t, p in runs)
        if entropy:
            from peerdb_spark.zstd_entropy import (
                encode_compressed_block,
                encode_lz_block,
            )

            # cheapest of: LZ matches + sequences (wins on repetitive
            # data), Huffman literals only (wins when no matches), Raw/RLE
            # runs (wins on incompressible / wide-alphabet data)
            comp = encode_lz_block(chunk)
            lit_only = encode_compressed_block(chunk)
            if lit_only is not None and (comp is None or len(lit_only) < len(comp)):
                comp = lit_only
            if comp is not None and 3 + len(comp) < run_cost:
                blocks.append((2, comp))
                continue
        blocks.extend(runs)
    for idx, (btype, payload) in enumerate(blocks):
        last = idx == len(blocks) - 1
        if btype == 1:
            out += _block_header(len(payload), 1, last)
            out.append(payload[0])
        elif btype == 2:
            # payload is the complete block CONTENT; header size = its length
            out += _block_header(len(payload), 2, last)
            out += payload
        else:
            out += _block_header(len(payload), 0, last)
            out += payload
    out += struct.pack("<I", xxh64(data) & 0xFFFFFFFF)
    return bytes(out)


# -- frame decode ---------------------------------------------------------------


def zstd_decompress(data: bytes, max_size: int = 1 << 27) -> bytes:
    """Zstd frame → bytes. Raw and RLE blocks decode here; Compressed
    (FSE/Huffman) blocks decode through zstd_entropy (round 9 — the consume
    path now interops with real producers: libzstd/franz-go emit Compressed
    blocks for any non-trivial payload). Strict rejects on reserved
    bits/block types, block-size bounds, truncation, FCS and checksum
    mismatches; dictionary frames keep the descriptive scope reject."""
    if len(data) < 5:
        raise ValueError("zstd: truncated frame header")
    (magic,) = struct.unpack_from("<I", data, 0)
    if magic != _MAGIC:
        raise ValueError(f"zstd: bad magic {magic:#x}")
    fhd = data[4]
    if fhd & (1 << 3):
        raise ValueError("zstd: reserved FHD bit set")
    fcs_code = fhd >> 6
    single = bool(fhd & (1 << 5))
    has_cksum = bool(fhd & (1 << 2))
    did_code = fhd & 3
    pos = 5
    window = None
    if not single:
        if pos >= len(data):
            raise ValueError("zstd: truncated window descriptor")
        wd = data[pos]
        pos += 1
        base = 1 << (10 + (wd >> 3))
        window = base + (base // 8) * (wd & 7)
    did_size = (0, 1, 2, 4)[did_code]
    if did_size:
        if pos + did_size > len(data):
            raise ValueError("zstd: truncated dictionary id")
        did = int.from_bytes(data[pos : pos + did_size], "little")
        pos += did_size
        if did != 0:
            raise ValueError(
                f"zstd: dictionary {did} required; dictionary frames are "
                "out of scope for this minimal decoder"
            )
    fcs_size = (1 if single else 0, 2, 4, 8)[fcs_code]
    expect: int | None = None
    if fcs_size:
        if pos + fcs_size > len(data):
            raise ValueError("zstd: truncated frame content size")
        expect = int.from_bytes(data[pos : pos + fcs_size], "little")
        if fcs_size == 2:
            expect += 256
        pos += fcs_size
    if single:
        window = expect if expect is not None else 0
    bmax = min(window if window else _BLOCK_MAX, _BLOCK_MAX)
    bmax = max(bmax, 1)  # a zero-FCS single-segment frame still has a block
    out = bytearray()
    ctx = None  # entropy state threads across a frame's Compressed blocks
    last = False
    while not last:
        if pos + 3 > len(data):
            raise ValueError("zstd: truncated block header")
        hdr = int.from_bytes(data[pos : pos + 3], "little")
        pos += 3
        last = bool(hdr & 1)
        btype = (hdr >> 1) & 3
        bsize = hdr >> 3
        if btype == 3:
            raise ValueError("zstd: reserved block type")
        if bsize > bmax:
            raise ValueError(
                f"zstd: block size {bsize} exceeds maximum {bmax}"
            )
        if btype == 0:  # Raw
            if len(out) + bsize > max_size:  # bsize IS the output size here
                raise ValueError("zstd: output exceeds size bound")
            if pos + bsize > len(data):
                raise ValueError("zstd: truncated raw block")
            out += data[pos : pos + bsize]
            pos += bsize
        elif btype == 1:  # RLE: content is ONE byte, bsize the regen length
            if len(out) + bsize > max_size:
                raise ValueError("zstd: output exceeds size bound")
            if pos + 1 > len(data):
                raise ValueError("zstd: truncated rle block")
            out += data[pos : pos + 1] * bsize
            pos += 1
        else:  # Compressed: FSE/Huffman entropy (zstd_entropy, RFC 8878 §4)
            from peerdb_spark import zstd_entropy as ZE

            if pos + bsize > len(data):
                raise ValueError("zstd: truncated compressed block")
            if ctx is None:
                ctx = ZE.BlockContext()
            ZE.decompress_block(data[pos : pos + bsize], ctx, out, max_size)
            pos += bsize
    if expect is not None and len(out) != expect:
        raise ValueError(
            f"zstd: declared {expect} bytes, decoded {len(out)}"
        )
    if has_cksum:
        if pos + 4 > len(data):
            raise ValueError("zstd: truncated content checksum")
        (cc,) = struct.unpack_from("<I", data, pos)
        if xxh64(bytes(out)) & 0xFFFFFFFF != cc:
            raise ValueError("zstd: content checksum mismatch")
    return bytes(out)
