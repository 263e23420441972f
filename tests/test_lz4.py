"""From-scratch LZ4 frame codec + XXH32 (peerdb_spark/lz4_codec.py).

No lz4 library exists in this environment; correctness is pinned by the
XXH32 spec check values, hand-built block-grammar vectors, roundtrip
properties over adversarial inputs, and strict-reject corruption tests.
"""

import struct

import pytest

from peerdb_spark.lz4_codec import (
    lz4_block_compress,
    lz4_block_decompress,
    lz4_frame_compress,
    lz4_frame_decompress,
    xxh32,
)


def test_xxh32_spec_check_values():
    # published xxHash test vectors (seed 0)
    assert xxh32(b"") == 0x02CC5D05
    assert xxh32(b"abc") == 0x32D153FF
    # seed participates: same input, different seed, different hash
    assert xxh32(b"abc", seed=1) != 0x32D153FF
    # all the size classes: <4, 4-15, exactly 16, >16 with tail
    for blob in (b"x", b"fourbyte", b"0123456789abcdef", b"0123456789abcdefg" * 7):
        assert 0 <= xxh32(blob) <= 0xFFFFFFFF


def test_block_hand_vectors():
    # literals-only block: token 0x30, 3 literals, no match
    assert lz4_block_decompress(b"\x30abc") == b"abc"
    # one match: 4 literals 'abcd', then offset 4 len 4 → 'abcdabcd';
    # trailing literals-only sequence 'xyzzy' (≥5 final literals)
    blk = b"\x40abcd" + b"\x04\x00" + b"\x50xyzzy"
    assert lz4_block_decompress(blk) == b"abcdabcdxyzzy"
    # overlapping match (offset 1 = RLE): 'a' then 8 copies of it
    blk = b"\x14a" + b"\x01\x00" + b"\x50bcdef"
    assert lz4_block_decompress(blk) == b"a" * 9 + b"bcdef"
    # length extension: literal run of 15+255+3 = 273
    lits = bytes(i % 251 for i in range(273))
    blk = b"\xf0" + bytes([255, 3]) + lits
    assert lz4_block_decompress(blk) == lits


def test_block_rejects():
    with pytest.raises(ValueError, match="offset"):
        lz4_block_decompress(b"\x14a" + b"\x05\x00" + b"\x50bcdef")  # past start
    with pytest.raises(ValueError, match="truncated"):
        lz4_block_decompress(b"\x40abc")  # fewer literals than declared
    with pytest.raises(ValueError, match="truncated"):
        lz4_block_decompress(b"\x44abcd" + b"\x04")  # half an offset


def test_compressor_end_of_block_rules():
    """Spec: last 5 bytes literal; matches start ≥12 bytes before the end.
    Decode the compressor's own output sequence by sequence and check."""
    data = b"abcdabcdabcdabcdabcdabcd"  # heavily matchable incl. the tail
    blk = lz4_block_compress(data)
    assert lz4_block_decompress(blk) == data
    # walk sequences: the final one must be literals-only
    pos, n, out_len, last_match_start = 0, len(blk), 0, -1
    while pos < n:
        token = blk[pos]; pos += 1
        lits = token >> 4
        if lits == 15:
            while True:
                b = blk[pos]; pos += 1; lits += b
                if b != 255:
                    break
        pos += lits; out_len += lits
        if pos == n:
            break
        pos += 2
        mlen = (token & 0xF) + 4
        if (token & 0xF) == 15:
            while True:
                b = blk[pos]; pos += 1; mlen += b
                if b != 255:
                    break
        last_match_start = out_len
        out_len += mlen
    assert out_len == len(data)
    assert last_match_start <= len(data) - 12
    assert pos == n


def test_frame_roundtrip_adversarial():
    import random

    rng = random.Random(3)
    cases = [
        b"",
        b"a",
        b"\x00" * 200_000,                      # multi-block RLE
        bytes(range(256)) * 700,                 # period 256, > 2 blocks
        b"the quick brown fox " * 9000,
        bytes(rng.randrange(256) for _ in range(100_000)),  # incompressible
        bytes(rng.randrange(3) for _ in range(66_000)),     # block boundary
    ]
    for data in cases:
        enc = lz4_frame_compress(data)
        assert lz4_frame_decompress(enc) == data, len(data)
    # incompressible data is stored, costing only headers
    blob = bytes(rng.randrange(256) for _ in range(50_000))
    assert len(lz4_frame_compress(blob)) < len(blob) + 64


def test_frame_roundtrip_hypothesis():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=120, deadline=None)
    @given(st.binary(max_size=4096))
    def check(data):
        assert lz4_frame_decompress(lz4_frame_compress(data)) == data

    check()


def test_frame_rejects_corruption():
    good = lz4_frame_compress(b"abcabcabcabc" * 10)
    bad = bytearray(good)
    bad[5] ^= 0x01  # BD byte → header checksum mismatch
    with pytest.raises(ValueError, match="header checksum"):
        lz4_frame_decompress(bytes(bad))
    bad = bytearray(good)
    bad[-6] ^= 0x01  # flip a byte inside the last block → content checksum
    with pytest.raises(ValueError):
        lz4_frame_decompress(bytes(bad))
    with pytest.raises(ValueError, match="magic"):
        lz4_frame_decompress(b"\x00" * 16)
    with pytest.raises(ValueError, match="truncated"):
        lz4_frame_decompress(good[:10])


def test_kafka_record_batch_lz4_roundtrip():
    from peerdb_spark import kafka_wire as KW

    recs = [(b"k%d" % i, b'{"v":%d,"pad":"' % i + b"z" * 200 + b'"}')
            for i in range(50)]
    batch = KW.encode_record_batch(recs, compression="lz4")
    plain = KW.encode_record_batch(recs, compression="none")
    attrs = int.from_bytes(batch[21:23], "big")
    assert attrs & 0x7 == 3
    assert len(batch) < len(plain) // 2
    assert [(k, v) for k, v, _h in KW.decode_record_batch(batch)] == recs


def test_frame_truncated_optional_descriptor_fields():
    """A header whose FLG advertises content-size/dict-id fields but is cut
    short must reject as ValueError, not IndexError (code-review repro:
    7-byte frame with the content-size bit set)."""
    flg_csize = (1 << 6) | (1 << 5) | (1 << 3)
    frame = struct.pack("<I", 0x184D2204) + bytes([flg_csize, 4 << 4, 0])
    assert len(frame) == 7
    with pytest.raises(ValueError, match="truncated frame header"):
        lz4_frame_decompress(frame)


def test_frame_rejects_reserved_bits_and_oversized_blocks():
    """Strict-reject contract symmetry (round-8 review item): FLG reserved
    bit, BD reserved bits, and blocks above the declared BD maximum all
    reject instead of decoding spec-invalid frames."""
    from peerdb_spark.lz4_codec import xxh32 as _xxh32

    def frame_with(flg, bd, blocks):
        desc = bytes([flg, bd])
        hc = (_xxh32(desc) >> 8) & 0xFF
        out = struct.pack("<I", 0x184D2204) + desc + bytes([hc])
        for stored, payload in blocks:
            size = len(payload) | (0x80000000 if stored else 0)
            out += struct.pack("<I", size) + payload
        return out + struct.pack("<I", 0)

    base_flg = (1 << 6) | (1 << 5)  # v01, independent blocks, no checksums
    # reserved FLG bit 1
    with pytest.raises(ValueError, match="reserved FLG"):
        lz4_frame_decompress(frame_with(base_flg | 2, 4 << 4, []))
    # reserved BD bits (low nibble / high bit)
    with pytest.raises(ValueError, match="reserved BD"):
        lz4_frame_decompress(frame_with(base_flg, (4 << 4) | 1, []))
    with pytest.raises(ValueError, match="reserved BD"):
        lz4_frame_decompress(frame_with(base_flg, (4 << 4) | 0x80, []))
    # block max size codes 0-3 are invalid
    with pytest.raises(ValueError, match="block max size code"):
        lz4_frame_decompress(frame_with(base_flg, 3 << 4, []))
    # a stored block larger than the declared 64 KiB maximum rejects
    big = b"x" * 65537
    with pytest.raises(ValueError, match="exceeds declared BD max"):
        lz4_frame_decompress(frame_with(base_flg, 4 << 4, [(True, big)]))
    # valid frames still decode under the stricter checks
    assert lz4_frame_decompress(lz4_frame_compress(big)) == big
