"""Ogg encapsulation (RFC 3533) + the FLAC-in-Ogg mapping — round 10,
closing the r9 "rare codec corner" gap (flac.py previously rejected
OggS-magic payloads).

From the public specs, stdlib only:
- Ogg pages: capture pattern, version 0, header-type flags
  (continued / BOS / EOS), 64-bit granule position, serial, sequence,
  CRC32 with the Ogg polynomial 0x04C11DB7 (non-reflected, init 0,
  no final xor, computed with the CRC field zeroed), segment lacing
  (255 = packet continues, <255 ends it; packets may span pages via the
  continued flag).
- FLAC mapping (the xiph Ogg-FLAC mapping, version 1.0): the BOS page
  holds exactly one packet — 0x7F "FLAC" major minor, a 16-bit
  big-endian count of following header packets, then the native "fLaC"
  magic and the STREAMINFO metadata block; header packets follow (the
  mapping mandates a VORBIS_COMMENT); every later packet is one native
  FLAC frame; granule position is the sample count after the page's
  last frame.

Decoding TRANSMUXES to a native FLAC stream (fLaC + metadata + frames)
and reuses the verified frame parser in functions/flac.py — the Ogg
layer never re-implements FLAC. `encode_ogg_flac` produces streams from
`encode_flac(as_parts=True)`; roundtrips are bit-exact because the
underlying codec's are.
"""

from __future__ import annotations

import struct


def _crc_table() -> list[int]:
    tab = []
    for i in range(256):
        r = i << 24
        for _ in range(8):
            r = ((r << 1) ^ 0x04C11DB7) & 0xFFFFFFFF if r & 0x80000000 \
                else (r << 1) & 0xFFFFFFFF
        tab.append(r)
    return tab


_CRC_TAB = _crc_table()


def ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TAB[((crc >> 24) & 0xFF) ^ b]
    return crc


def _build_page(header_type: int, granule: int, serial: int, seq: int,
                packets: list[bytes], continued_tail: bool = False) -> bytes:
    """One page from whole packets (each ends on this page). A packet
    longer than 255*255 is laced across segments; the caller must ensure
    the segment count stays <= 255."""
    lacing = bytearray()
    body = bytearray()
    for p in packets:
        q, r = divmod(len(p), 255)
        lacing += b"\xff" * q + bytes([r])
        body += p
    if len(lacing) > 255:
        raise ValueError("page needs more than 255 segments")
    hdr = bytearray(b"OggS\x00")
    hdr.append(header_type)
    hdr += struct.pack("<q", granule)
    hdr += struct.pack("<I", serial)
    hdr += struct.pack("<I", seq)
    hdr += b"\x00\x00\x00\x00"  # CRC placeholder
    hdr.append(len(lacing))
    page = bytes(hdr) + bytes(lacing) + bytes(body)
    crc = ogg_crc(page)
    return page[:22] + struct.pack("<I", crc) + page[26:]


def ogg_packets(data: bytes):
    """Parse an Ogg stream → [(packet_bytes, bos, eos)], CRC-verified,
    packets reassembled across segment lacing and page boundaries."""
    pos = 0
    packets: list[tuple[bytes, bool, bool]] = []
    pending = bytearray()
    pending_open = False
    expected_seq: int | None = None
    while pos < len(data):
        if data[pos : pos + 4] != b"OggS":
            raise ValueError("bad Ogg capture pattern")
        if pos + 27 > len(data):
            raise ValueError("truncated Ogg page header")
        if data[pos + 4] != 0:
            raise ValueError("unsupported Ogg version")
        htype = data[pos + 5]
        seq = struct.unpack("<I", data[pos + 18 : pos + 22])[0]
        crc_stored = struct.unpack("<I", data[pos + 22 : pos + 26])[0]
        nseg = data[pos + 26]
        lace_end = pos + 27 + nseg
        if lace_end > len(data):
            raise ValueError("truncated Ogg lacing table")
        lacing = data[pos + 27 : lace_end]
        body_len = sum(lacing)
        page_end = lace_end + body_len
        if page_end > len(data):
            raise ValueError("truncated Ogg page body")
        page = bytearray(data[pos:page_end])
        page[22:26] = b"\x00\x00\x00\x00"
        if ogg_crc(bytes(page)) != crc_stored:
            raise ValueError("Ogg page CRC mismatch")
        if expected_seq is not None and seq != expected_seq:
            raise ValueError("Ogg page sequence gap")
        expected_seq = seq + 1
        continued = bool(htype & 0x01)
        bos = bool(htype & 0x02)
        eos = bool(htype & 0x04)
        if continued != pending_open:
            raise ValueError("Ogg continued-packet flag inconsistent")
        off = lace_end
        for i, seg in enumerate(lacing):
            pending += data[off : off + seg]
            off += seg
            if seg < 255:  # packet ends here
                packets.append((bytes(pending), bos and not packets, eos
                                and i == nseg - 1))
                pending = bytearray()
        pending_open = bool(lacing) and lacing[-1] == 255
        pos = page_end
    if pending_open:
        raise ValueError("Ogg stream ends mid-packet")
    return packets


def ogg_flac_to_native(data: bytes) -> bytes:
    """Ogg-FLAC → native FLAC bytes (transmux; no re-encode)."""
    pkts = ogg_packets(data)
    if not pkts:
        raise ValueError("empty Ogg stream")
    first = pkts[0][0]
    if len(first) < 9 or first[0] != 0x7F or first[1:5] != b"FLAC":
        raise ValueError("not an Ogg-FLAC stream (bad mapping packet)")
    if first[5] != 1:
        raise NotImplementedError(
            f"Ogg-FLAC mapping major version {first[5]} not supported")
    n_headers = struct.unpack(">H", first[7:9])[0]
    native = first[9:]
    if native[:4] != b"fLaC":
        raise ValueError("Ogg-FLAC first packet missing fLaC magic")
    # STREAMINFO must be marked last-metadata in the transmuxed stream
    # (the remaining mapping header packets are metadata we drop — the
    # frame parser needs only STREAMINFO)
    body = bytearray(native)
    if len(body) < 8:
        raise ValueError("Ogg-FLAC STREAMINFO truncated")
    body[4] |= 0x80
    out = bytearray(body)
    tail = pkts[1 + n_headers:]
    if n_headers == 0:
        # xiph mapping: a header count of 0 means "number unknown", NOT
        # zero headers — the mandatory VORBIS_COMMENT (and any further
        # metadata packets) still follow. Skip leading packets by
        # inspection: a FLAC audio frame always begins with the 14-bit
        # sync code (first byte 0xFF, second 0b111110xx), which no
        # metadata packet can start with (its first byte is a block type
        # <= 0x84).
        while tail and not (
            len(tail[0][0]) >= 2
            and tail[0][0][0] == 0xFF
            and (tail[0][0][1] & 0xFC) == 0xF8
        ):
            tail = tail[1:]
    for pkt, _bos, _eos in tail:
        out += pkt
    return bytes(out)


def encode_ogg_flac(samples, rate: int, bits: int = 16,
                    block: int = 256) -> bytes:
    """(n, ch) int samples → an Ogg-FLAC stream (mapping v1.0): BOS page
    with the mapping packet, one VORBIS_COMMENT header page, then one
    FLAC frame per packet with sample-accurate granule positions."""
    from peerdb_spark.functions.flac import encode_flac

    header, frames = encode_flac(samples, rate, bits, block=block,
                                 as_parts=True)
    # header = b"fLaC" + STREAMINFO block (last-metadata flag set by the
    # native encoder); the mapping wants the flag CLEAR because header
    # packets follow
    si = bytearray(header)
    si[4] &= 0x7F
    first = bytes([0x7F]) + b"FLAC" + bytes([1, 0]) + struct.pack(">H", 1) \
        + bytes(si)
    vendor = b"peerdb-spark ogg-flac"
    vc_body = struct.pack("<I", len(vendor)) + vendor + struct.pack("<I", 0)
    vorbis_comment = bytes([0x84]) + len(vc_body).to_bytes(3, "big") + vc_body
    serial = 0x70655250  # arbitrary fixed serial ("peRP")
    out = bytearray()
    out += _build_page(0x02, 0, serial, 0, [first])
    out += _build_page(0x00, 0, serial, 1, [vorbis_comment])
    import numpy as np

    n = np.asarray(samples).shape[0]
    seq = 2
    done = 0
    for i, fr in enumerate(frames):
        done = min(done + block, n)
        flags = 0x04 if i == len(frames) - 1 else 0x00
        out += _build_page(flags, done, serial, seq, [fr])
        seq += 1
    if not frames:  # zero-sample stream still needs an EOS page
        out += _build_page(0x04, 0, serial, seq, [b""])
    return bytes(out)
