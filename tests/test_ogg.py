"""Ogg encapsulation + FLAC-in-Ogg mapping (functions/ogg.py, round 10):
page structure, the Ogg CRC, segment lacing, packets spanning pages,
transmux-to-native equivalence, and the audio-op dispatch."""

import struct

import numpy as np
import pytest

from peerdb_spark.functions.flac import encode_flac, parse_flac
from peerdb_spark.functions.ogg import (
    _build_page,
    encode_ogg_flac,
    ogg_crc,
    ogg_flac_to_native,
    ogg_packets,
)


def test_ogg_crc_properties():
    """The Ogg CRC is 0x04C11DB7 non-reflected with zero init/xorout:
    crc('') == 0, and the standard check value for '123456789' under
    this exact configuration is 0x89A1897F (CRC-32/MPEG-2 without the
    final complement and without reflection ... pinned numerically here
    against an independent bit-by-bit implementation)."""
    assert ogg_crc(b"") == 0

    def ref(data: bytes) -> int:  # independent bit-serial implementation
        crc = 0
        for byte in data:
            crc ^= byte << 24
            for _ in range(8):
                crc = ((crc << 1) ^ 0x04C11DB7) & 0xFFFFFFFF \
                    if crc & 0x80000000 else (crc << 1) & 0xFFFFFFFF
        return crc

    for payload in (b"123456789", b"\x00" * 40, bytes(range(256))):
        assert ogg_crc(payload) == ref(payload)


def test_ogg_flac_roundtrip_all_depths():
    rng = np.random.RandomState(5)
    for bits, ch, n in [(16, 2, 700), (8, 1, 100), (24, 2, 513), (32, 1, 300)]:
        s = (rng.randint(-(1 << (bits - 1)), (1 << (bits - 1)) - 1,
                         size=(n, ch)) // 3).astype(np.int32)
        ogg = encode_ogg_flac(s, 44100, bits, block=256)
        assert ogg[:4] == b"OggS"
        r, c, b, out = parse_flac(ogg)  # magic dispatch through transmux
        assert (r, c, b) == (44100, ch, bits) and (out == s).all()
        # the transmux reproduces the native encoding byte-for-byte
        assert ogg_flac_to_native(ogg) == encode_flac(s, 44100, bits,
                                                      block=256)


def test_ogg_packet_spanning_pages():
    """A packet laced with a trailing 255 segment continues on the next
    page (continued flag) — hand-built two-page stream."""
    big = bytes(range(256)) * 2  # 512 bytes: 255+255+2 lacing
    serial = 7
    # page 1: first 255-byte segment then a 255 that CONTINUES
    hdr = bytearray(b"OggS\x00\x02")
    hdr += struct.pack("<q", -1) + struct.pack("<I", serial)
    hdr += struct.pack("<I", 0) + b"\x00" * 4 + bytes([2]) + b"\xff\xff"
    p1 = bytes(hdr) + big[:510]
    p1 = p1[:22] + struct.pack("<I", ogg_crc(p1)) + p1[26:]
    hdr2 = bytearray(b"OggS\x00\x05")  # continued + EOS
    hdr2 += struct.pack("<q", 0) + struct.pack("<I", serial)
    hdr2 += struct.pack("<I", 1) + b"\x00" * 4 + bytes([1, 2])
    p2 = bytes(hdr2) + big[510:]
    p2 = p2[:22] + struct.pack("<I", ogg_crc(p2)) + p2[26:]
    pkts = ogg_packets(p1 + p2)
    assert len(pkts) == 1 and pkts[0][0] == big


def test_ogg_rejects():
    rng = np.random.RandomState(6)
    s = rng.randint(-100, 100, (300, 1)).astype(np.int32)
    ogg = encode_ogg_flac(s, 8000, 16)
    bad = bytearray(ogg)
    bad[30] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        ogg_packets(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        ogg_flac_to_native(ogg[:40])
    # non-FLAC Ogg stream
    page = _build_page(0x02, 0, 1, 0, [b"\x01vorbis junk"])
    with pytest.raises(ValueError, match="mapping packet"):
        ogg_flac_to_native(page)
    # future mapping major version → clean NotImplementedError
    pkt = bytes([0x7F]) + b"FLAC" + bytes([2, 0]) + b"\x00\x01" + b"fLaC" + b"\x80" + b"\x00" * 10
    page = _build_page(0x02, 0, 1, 0, [pkt])
    with pytest.raises(NotImplementedError, match="major version"):
        ogg_flac_to_native(page)


def test_ogg_flac_zero_header_count_means_unknown():
    """xiph mapping: a header-packet count of 0 means 'number unknown',
    not zero headers (r10 ADVICE) — the transmux must skip the mandatory
    VORBIS_COMMENT by inspection instead of feeding it to the frame
    parser as audio data."""
    rng = np.random.RandomState(9)
    s = rng.randint(-3000, 3000, size=(600, 2)).astype(np.int32)
    ogg = encode_ogg_flac(s, 22050, 16)
    # rebuild the BOS page with the count field (packet offset 7:9)
    # patched to 0; the VORBIS_COMMENT page that follows is unchanged
    first = bytearray(ogg_packets(ogg)[0][0])
    assert struct.unpack(">H", first[7:9])[0] == 1
    first[7:9] = b"\x00\x00"
    second_page = ogg.index(b"OggS", 4)
    patched = bytes(_build_page(0x02, 0, 0x70655250, 0, [bytes(first)])) \
        + ogg[second_page:]
    assert ogg_flac_to_native(patched) == encode_flac(s, 22050, 16)
    r, c, b, out = parse_flac(patched)
    assert (r, c, b) == (22050, 2, 16) and (out == s).all()


def test_audio_ops_accept_ogg_flac(spark):
    """decode_audio dispatches OggS by magic: identical results to the
    same samples as WAV/FLAC."""
    from peerdb_spark.functions.audio import encode_wav
    from peerdb_spark.functions.multimodal import decode_audio

    rng = np.random.RandomState(3)
    s = rng.randint(-2000, 2000, size=(500, 2)).astype(np.int32)
    df = spark.createDataFrame(
        [(0, encode_wav(s, 16000, 16)), (1, encode_ogg_flac(s, 16000, 16))],
        "media_id long, content binary")
    dec = {r["media_id"]: r for r in decode_audio(df).collect()}
    assert bytes(dec[0]["pcm"]) == bytes(dec[1]["pcm"])
    assert dec[1]["sample_rate"] == 16000 and dec[1]["bit_depth"] == 16
