"""Raw-block Snappy codec, implemented from scratch (public format spec:
google/snappy format_description.txt).

Kafka's own protocol docs describe the v2 records section as a raw snappy
block, and that is what this sink EMITS — but Java clients and brokers
still wrap v2 batches in the xerial "\\x82SNAPPY\\x00" stream framing
(interop works only because xerial decoders auto-detect raw blocks), so
the DECODE path sniffs the xerial magic and unwraps its framing
(xerial_decompress below). The reference's franz-go client negotiates
snappy as one of its default codecs (flow/connectors/kafka/kafka.go —
studied, not copied); this module lets the wire sink speak it with stdlib
only.

Format recap (little-endian throughout):
- preamble: uvarint uncompressed length;
- elements: tag byte, low 2 bits = type:
  00 literal — length-1 in tag bits 2-7, or 60..63 meaning the length-1
     occupies the following 1..4 bytes;
  01 copy, 1-byte offset — length-4 in tag bits 2-4 (4..11), offset =
     tag bits 5-7 << 8 | next byte (1..2047);
  10 copy, 2-byte offset — length-1 in tag bits 2-7 (1..64), offset LE16;
  11 copy, 4-byte offset — as above with offset LE32.
Copies may overlap their output (offset < length): decode byte-by-byte.

The compressor is a greedy single-pass LZ with a 4-byte hash table and
2-byte-offset copies (64-byte max match per element, 64 KiB window) —
simple, deterministic, and every output stays within the spec, so any
conformant decompressor (including a real broker's) reads it. The
decompressor handles the FULL element grammar, not just what the
compressor emits.
"""

from __future__ import annotations


def _uvarint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(data: bytes, pos: int) -> tuple[int, int]:
    n = 0
    shift = 0
    while True:
        if pos >= len(data):
            raise ValueError("snappy: truncated length preamble")
        b = data[pos]
        pos += 1
        n |= (b & 0x7F) << shift
        if not b & 0x80:
            return n, pos
        shift += 7
        if shift > 35:
            raise ValueError("snappy: length varint too long")


def _emit_literal(out: bytearray, data: bytes, start: int, end: int) -> None:
    if end <= start:
        return
    lm1 = end - start - 1
    if lm1 < 60:
        out.append(lm1 << 2)
    else:
        nb = (lm1.bit_length() + 7) // 8
        out.append((59 + nb) << 2)
        out += lm1.to_bytes(nb, "little")
    out += data[start:end]


def snappy_compress(data: bytes) -> bytes:
    """bytes → raw snappy block."""
    data = bytes(data)
    n = len(data)
    out = bytearray(_uvarint(n))
    if n == 0:
        return bytes(out)
    table: dict[bytes, int] = {}
    i = 0
    lit_start = 0
    while i + 4 <= n:
        key = data[i : i + 4]
        j = table.get(key)
        table[key] = i
        if j is not None and i - j <= 65535:
            _emit_literal(out, data, lit_start, i)
            length = 4
            maxlen = min(64, n - i)
            while length < maxlen and data[j + length] == data[i + length]:
                length += 1
            out.append(((length - 1) << 2) | 2)  # copy, 2-byte offset
            out += (i - j).to_bytes(2, "little")
            i += length
            lit_start = i
        else:
            i += 1
    _emit_literal(out, data, lit_start, n)
    return bytes(out)


def snappy_decompress(data: bytes) -> bytes:
    """Raw snappy block → bytes; validates lengths, offsets, and the
    declared uncompressed size (strict rejects, never wrong output)."""
    expect, pos = _read_uvarint(data, 0)
    out = bytearray()
    n = len(data)
    while pos < n:
        tag = data[pos]
        pos += 1
        t = tag & 3
        if t == 0:  # literal
            lm1 = tag >> 2
            if lm1 >= 60:
                nb = lm1 - 59
                if pos + nb > n:
                    raise ValueError("snappy: truncated literal length")
                lm1 = int.from_bytes(data[pos : pos + nb], "little")
                pos += nb
            length = lm1 + 1
            if pos + length > n:
                raise ValueError("snappy: truncated literal")
            out += data[pos : pos + length]
            pos += length
            continue
        if t == 1:  # copy, 1-byte offset
            if pos + 1 > n:
                raise ValueError("snappy: truncated copy")
            length = ((tag >> 2) & 0x7) + 4
            offset = ((tag >> 5) << 8) | data[pos]
            pos += 1
        elif t == 2:  # copy, 2-byte offset
            if pos + 2 > n:
                raise ValueError("snappy: truncated copy")
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[pos : pos + 2], "little")
            pos += 2
        else:  # copy, 4-byte offset
            if pos + 4 > n:
                raise ValueError("snappy: truncated copy")
            length = (tag >> 2) + 1
            offset = int.from_bytes(data[pos : pos + 4], "little")
            pos += 4
        if offset == 0 or offset > len(out):
            raise ValueError("snappy: copy offset out of range")
        start = len(out) - offset
        if offset >= length:
            out += out[start : start + length]
        else:  # overlapping copy: byte-by-byte, the spec's RLE idiom
            for _ in range(length):
                out.append(out[start])
                start += 1
    if len(out) != expect:
        raise ValueError(
            f"snappy: declared {expect} bytes, decoded {len(out)}"
        )
    return bytes(out)


XERIAL_MAGIC = b"\x82SNAPPY\x00"


def xerial_decompress(data: bytes) -> bytes:
    """Xerial (snappy-java) stream framing → bytes. Layout: 8-byte magic
    "\\x82SNAPPY\\x00", two big-endian int32 version fields, then a
    sequence of [int32-BE block length][raw snappy block]. Java Kafka
    producers emit this framing even for v2 record batches; strict rejects
    on truncation or a bad inner block."""
    if not data.startswith(XERIAL_MAGIC):
        raise ValueError("xerial: bad magic")
    pos = len(XERIAL_MAGIC) + 8  # skip version + compat-version
    if pos > len(data):
        raise ValueError("xerial: truncated header")
    out = bytearray()
    n = len(data)
    while pos < n:
        if pos + 4 > n:
            raise ValueError("xerial: truncated block length")
        blen = int.from_bytes(data[pos : pos + 4], "big")
        pos += 4
        if pos + blen > n:
            raise ValueError("xerial: truncated block")
        out += snappy_decompress(data[pos : pos + blen])
        pos += blen
    return bytes(out)


def snappy_decompress_auto(data: bytes) -> bytes:
    """Decode either framing: xerial stream if the magic matches, raw
    block otherwise — mirroring xerial's own auto-detection, which is what
    makes raw-block producers interoperate with Java consumers."""
    if data.startswith(XERIAL_MAGIC):
        return xerial_decompress(data)
    return snappy_decompress(data)
