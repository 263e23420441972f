"""CAVLC residual coding — ITU-T H.264 §9.2 (context-adaptive VLC).

The entropy layer under intra-coded macroblocks: coeff_token (TotalCoeff,
TrailingOnes) VLCs selected by the neighbour-predicted nC, trailing-one
sign bits, adaptive level prefix/suffix coding, total_zeros, and
run_before. Written from the public spec for the engine's from-scratch
H.264 intra path (h264.py round 10); the reference (PeerDB) has no video
decode at all — BYTEA passthrough (flow/model/qvalue).

VERIFICATION POSTURE (stated honestly; this container has no independent
H.264 decoder or encoder to machine-verify table conformance against):

- The LEVEL coding algorithm (§9.2.2), the nC >= 8 six-bit FLC, zigzag
  order, and the adaptation rules are closed-form spec text — property-
  tested exhaustively (encode<->decode roundtrip over every level
  magnitude class and suffix-length transition).
- The 0 <= nC < 2 coeff_token column, the chroma-DC column, total_zeros
  and run_before tables are pinned by the published worked example
  (Richardson, "H.264 and MPEG-4 Video Compression" §6.4.1: the
  [0,3,0,1,-1,-1,0,1,...] block encodes to 000010001110010111101101) and
  validated structurally (prefix-free, fixed-length bounds).
- The 2 <= nC < 4 and 4 <= nC < 8 columns are spec transcriptions,
  COMPLETE as of round 11 (the TotalCoeff >= 14 tails were typed from
  the published Table 9-5): validated structurally (prefix-free AND
  complete — all 62 (TotalCoeff, TrailingOnes) pairs per column, so the
  code tree's leaves are fully accounted for) and by dense-block
  encode<->decode roundtrip property tests that drive TotalCoeff 13-16
  through every column. Each tail entry was cross-checked for
  (length, value) consistency against the worked-example-pinned head
  rows of its own column. IMPORTANT CAVEAT: those structural checks and
  roundtrips prove SELF-consistency only — no worked example or second
  decoder in this container pins the TotalCoeff >= 14 tail rows of
  these two columns against the spec, so a transposition that kept the
  code prefix-free-and-complete would roundtrip internally yet
  mis-decode an EXTERNAL stream. Callers decoding streams they did not
  encode can set `STRICT_UNPINNED_TAILS = True` to get a loud
  ValueError instead of a silent possible mis-decode when one of those
  tail codewords is actually hit (TotalCoeff 14-16 at nC 2-8 means a
  near-saturated 4x4 block — rare in practice). `encode_residual`
  still returns None for a genuinely unrepresentable level (beyond the
  12-bit escape range used here), and the macroblock encoder keeps its
  I_PCM fallback as a safety net — it no longer triggers on busy
  blocks.
"""

from __future__ import annotations

# zigzag scan: raster index of the k-th coefficient in scan order (4x4)
ZIGZAG4 = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

# -- Table 9-5: coeff_token --------------------------------------------------
# {(TotalCoeff, TrailingOnes): bitstring}; column by nC range.

_NC02 = {
    (0, 0): "1",
    (1, 0): "000101", (1, 1): "01",
    (2, 0): "00000111", (2, 1): "000100", (2, 2): "001",
    (3, 0): "000000111", (3, 1): "00000110", (3, 2): "0000101", (3, 3): "00011",
    (4, 0): "0000000111", (4, 1): "000000110", (4, 2): "00000101", (4, 3): "000011",
    (5, 0): "00000000111", (5, 1): "0000000110", (5, 2): "000000101", (5, 3): "0000100",
    (6, 0): "0000000001111", (6, 1): "00000000110", (6, 2): "0000000101", (6, 3): "00000100",
    (7, 0): "0000000001011", (7, 1): "0000000001110", (7, 2): "00000000101", (7, 3): "000000100",
    (8, 0): "0000000001000", (8, 1): "0000000001010", (8, 2): "0000000001101", (8, 3): "0000000100",
    (9, 0): "00000000001111", (9, 1): "00000000001110", (9, 2): "0000000001001", (9, 3): "00000000100",
    (10, 0): "00000000001011", (10, 1): "00000000001010", (10, 2): "00000000001101", (10, 3): "0000000001100",
    (11, 0): "000000000001111", (11, 1): "000000000001110", (11, 2): "00000000001001", (11, 3): "00000000001100",
    (12, 0): "000000000001011", (12, 1): "000000000001010", (12, 2): "000000000001101", (12, 3): "00000000001000",
    (13, 0): "0000000000001111", (13, 1): "000000000000001", (13, 2): "000000000001001", (13, 3): "000000000001100",
    (14, 0): "0000000000001011", (14, 1): "0000000000001110", (14, 2): "0000000000001101", (14, 3): "000000000001000",
    (15, 0): "0000000000000111", (15, 1): "0000000000001010", (15, 2): "0000000000001001", (15, 3): "0000000000001100",
    (16, 0): "0000000000000100", (16, 1): "0000000000000110", (16, 2): "0000000000000101", (16, 3): "0000000000001000",
}

_NC24 = {
    (0, 0): "11",
    (1, 0): "001011", (1, 1): "10",
    (2, 0): "000111", (2, 1): "00111", (2, 2): "011",
    (3, 0): "0000111", (3, 1): "001010", (3, 2): "001001", (3, 3): "0101",
    (4, 0): "00000111", (4, 1): "000110", (4, 2): "000101", (4, 3): "0100",
    (5, 0): "00000100", (5, 1): "0000110", (5, 2): "0000101", (5, 3): "00110",
    (6, 0): "000000111", (6, 1): "00000110", (6, 2): "00000101", (6, 3): "001000",
    (7, 0): "00000001111", (7, 1): "000000110", (7, 2): "000000101", (7, 3): "000100",
    (8, 0): "00000001011", (8, 1): "00000001110", (8, 2): "00000001101", (8, 3): "0000100",
    (9, 0): "000000001111", (9, 1): "00000001010", (9, 2): "00000001001", (9, 3): "000000100",
    (10, 0): "000000001011", (10, 1): "000000001110", (10, 2): "000000001101", (10, 3): "00000001100",
    (11, 0): "000000001000", (11, 1): "000000001010", (11, 2): "000000001001", (11, 3): "00000001000",
    (12, 0): "0000000001111", (12, 1): "0000000001110", (12, 2): "0000000001101", (12, 3): "000000001100",
    (13, 0): "0000000001011", (13, 1): "0000000001010", (13, 2): "0000000001001", (13, 3): "0000000001100",
    (14, 0): "0000000000111", (14, 1): "00000000001011", (14, 2): "0000000000110", (14, 3): "0000000001000",
    (15, 0): "00000000001001", (15, 1): "00000000001000", (15, 2): "00000000001010", (15, 3): "0000000000001",
    (16, 0): "00000000000111", (16, 1): "00000000000110", (16, 2): "00000000000101", (16, 3): "00000000000100",
}

_NC48 = {
    (0, 0): "1111",
    (1, 0): "001111", (1, 1): "1110",
    (2, 0): "001011", (2, 1): "01111", (2, 2): "1101",
    (3, 0): "001000", (3, 1): "01100", (3, 2): "01110", (3, 3): "1100",
    (4, 0): "0001111", (4, 1): "01010", (4, 2): "01011", (4, 3): "1011",
    (5, 0): "0001011", (5, 1): "01000", (5, 2): "01001", (5, 3): "1010",
    (6, 0): "0001001", (6, 1): "001110", (6, 2): "001101", (6, 3): "1001",
    (7, 0): "0001000", (7, 1): "001010", (7, 2): "001001", (7, 3): "1000",
    (8, 0): "00001111", (8, 1): "0001110", (8, 2): "0001101", (8, 3): "01101",
    (9, 0): "00001011", (9, 1): "00001110", (9, 2): "0001010", (9, 3): "001100",
    (10, 0): "000001111", (10, 1): "00001010", (10, 2): "00001101", (10, 3): "0001100",
    (11, 0): "000001011", (11, 1): "000001110", (11, 2): "00001001", (11, 3): "00001100",
    (12, 0): "000001000", (12, 1): "000001010", (12, 2): "000001101", (12, 3): "00001000",
    (13, 0): "0000001101", (13, 1): "000000111", (13, 2): "000001001", (13, 3): "000001100",
    (14, 0): "0000001001", (14, 1): "0000001100", (14, 2): "0000001011", (14, 3): "0000001010",
    (15, 0): "0000000101", (15, 1): "0000001000", (15, 2): "0000000111", (15, 3): "0000000110",
    (16, 0): "0000000001", (16, 1): "0000000100", (16, 2): "0000000011", (16, 3): "0000000010",
}

# chroma DC (4:2:0), nC == -1
_NCCDC = {
    (0, 0): "01",
    (1, 0): "000111", (1, 1): "1",
    (2, 0): "000100", (2, 1): "000110", (2, 2): "001",
    (3, 0): "000011", (3, 1): "0000011", (3, 2): "0000010", (3, 3): "000101",
    (4, 0): "000010", (4, 1): "00000011", (4, 2): "00000010", (4, 3): "0000000",
}

# The token set the ENCODER may emit. Round 11 completed the 2<=nC<8
# TotalCoeff>=14 tails from the published Table 9-5 (every new entry
# cross-checked for consistency against the externally-pinned head rows
# of its own column: same (length, value) layout, validated prefix-free
# and COMPLETE by validate_tables, and encode<->decode roundtrip
# property-tested over dense blocks) — all four columns are now full
# 62-entry codes, so the encoder never falls back to I_PCM for a busy
# block because of a missing coeff_token entry.
CONFIDENT_TOKENS = (
    {(0, k) for k in _NC02}
    | {(-1, k) for k in _NCCDC}
    | {(2, k) for k in _NC24}
    | {(4, k) for k in _NC48}
)

# -- Table 9-7/9-8: total_zeros for 4x4 blocks (index = TotalCoeff) ---------
_TOTAL_ZEROS = {
    1: ["1", "011", "010", "0011", "0010", "00011", "00010", "000011",
        "000010", "0000011", "0000010", "00000011", "00000010",
        "000000011", "000000010", "000000001"],
    2: ["111", "110", "101", "100", "011", "0101", "0100", "0011", "0010",
        "00011", "00010", "000011", "000010", "000001", "000000"],
    3: ["0101", "111", "110", "101", "0100", "0011", "100", "011", "0010",
        "00011", "00010", "000001", "00001", "000000"],
    4: ["00011", "111", "0101", "0100", "110", "101", "100", "0011", "011",
        "0010", "00010", "00001", "00000"],
    5: ["0101", "0100", "0011", "111", "110", "101", "100", "011", "0010",
        "00001", "0001", "00000"],
    6: ["000001", "00001", "111", "110", "101", "100", "011", "010", "0001",
        "001", "000000"],
    7: ["000001", "00001", "101", "100", "011", "11", "010", "0001", "001",
        "000000"],
    8: ["000001", "0001", "00001", "011", "11", "10", "010", "001", "000000"],
    9: ["000001", "000000", "0001", "11", "10", "001", "01", "00001"],
    10: ["00001", "00000", "001", "11", "10", "01", "0001"],
    11: ["0000", "0001", "001", "010", "1", "011"],
    12: ["0000", "0001", "01", "1", "001"],
    13: ["000", "001", "1", "01"],
    14: ["00", "01", "1"],
    15: ["0", "1"],
}

# chroma DC total_zeros (4:2:0; max 3 zeros)
_TOTAL_ZEROS_CDC = {
    1: ["1", "01", "001", "000"],
    2: ["1", "01", "00"],
    3: ["1", "0"],
}

# -- Table 9-10: run_before (index = zerosLeft, 1..6; >6 shared) -------------
_RUN_BEFORE = {
    1: ["1", "0"],
    2: ["1", "01", "00"],
    3: ["11", "10", "01", "00"],
    4: ["11", "10", "01", "001", "000"],
    5: ["11", "10", "011", "010", "001", "000"],
    6: ["11", "000", "001", "011", "010", "101", "100"],
    7: ["111", "110", "101", "100", "011", "010", "001", "0001", "00001",
        "000001", "0000001", "00000001", "000000001", "0000000001",
        "00000000001"],
}


def _col(nC: int):
    if nC == -1:
        return _NCCDC
    if nC < 2:
        return _NC02
    if nC < 4:
        return _NC24
    if nC < 8:
        return _NC48
    return None  # 6-bit FLC


def _col_key(nC: int) -> int:
    if nC == -1:
        return -1
    if nC < 2:
        return 0
    if nC < 4:
        return 2
    if nC < 8:
        return 4
    return 8


def _build_decoders():
    out = {}
    for key, tab in ((-1, _NCCDC), (0, _NC02), (2, _NC24), (4, _NC48)):
        d = {}
        for k, bits in tab.items():
            if bits in d:
                raise AssertionError(f"duplicate code {bits} in column {key}")
            d[bits] = k
        out[key] = d
    return out


_DECODERS = _build_decoders()


def validate_tables() -> None:
    """Structural self-check: every column (coeff_token, total_zeros,
    run_before) is a prefix-free code; lengths within spec bounds."""
    def prefix_free(codes, name):
        cl = sorted(codes)
        for i, a in enumerate(cl):
            for b in cl[i + 1:]:
                if b.startswith(a):
                    raise AssertionError(f"{name}: {a!r} prefixes {b!r}")
    for key, tab in ((-1, _NCCDC), (0, _NC02), (2, _NC24), (4, _NC48)):
        want = 14 if key == -1 else 62
        assert len(tab) == want, (key, len(tab))
        if key != -1:
            # COMPLETE: every legal (TotalCoeff, TrailingOnes) pair present
            assert set(tab) == {(tc, t1) for tc in range(17)
                                for t1 in range(min(tc, 3) + 1)}, key
        assert all(1 <= len(v) <= 16 for v in tab.values())
        prefix_free(list(tab.values()), f"coeff_token[{key}]")
    for tc, col in _TOTAL_ZEROS.items():
        assert len(col) == 17 - tc, tc
        prefix_free(col, f"total_zeros[{tc}]")
    for tc, col in _TOTAL_ZEROS_CDC.items():
        assert len(col) == 5 - tc
        prefix_free(col, f"total_zeros_cdc[{tc}]")
    for zl, col in _RUN_BEFORE.items():
        prefix_free(col, f"run_before[{zl}]")


def read_vlc(r, table: dict) -> tuple:
    """Read one code from a {bits: value} prefix map via the h264
    _BitReader. Raises ValueError on an undecodable prefix."""
    bits = ""
    for _ in range(16):
        bits += "1" if r.u(1) else "0"
        v = table.get(bits)
        if v is not None:
            return v
    raise ValueError("CAVLC: undecodable coeff_token prefix")


def _read_code(r, codes: list) -> int:
    """Read one code from a positional list (index = decoded value)."""
    bits = ""
    m = {c: i for i, c in enumerate(codes)}
    for _ in range(max(len(c) for c in codes)):
        bits += "1" if r.u(1) else "0"
        if bits in m:
            return m[bits]
    raise ValueError("CAVLC: undecodable VLC")


# Tail entries of the 2<=nC<4 / 4<=nC<8 columns with no external pin
# (module docstring, VERIFICATION POSTURE). When STRICT_UNPINNED_TAILS
# is set, decode_coeff_token raises on them instead of trusting the
# in-repo transcription — for callers decoding EXTERNAL streams where a
# silent mis-decode is worse than a reject. Default False: the engine's
# own encoder<->decoder contract (bit-exact reconstruction) is proven
# regardless of whether the transcription matches the spec.
STRICT_UNPINNED_TAILS = False
UNPINNED_TAILS = {
    (key, (tc, t1)) for key in (2, 4) for tc in (14, 15, 16) for t1 in range(4)
}


def decode_coeff_token(r, nC: int) -> tuple[int, int]:
    col = _col(nC)
    if col is None:  # nC >= 8: 6-bit FLC
        v = r.u(6)
        if v == 3:
            return 0, 0
        return (v >> 2) + 1, v & 3
    tok = read_vlc(r, _DECODERS[_col_key(nC)])
    if STRICT_UNPINNED_TAILS and (_col_key(nC), tok) in UNPINNED_TAILS:
        raise ValueError(
            "CAVLC strict mode: coeff_token (TotalCoeff=%d, T1s=%d) at "
            "nC=%d decodes via a Table 9-5 tail row with no external pin "
            "in this repo; refusing rather than risking a silent "
            "mis-decode of an external stream" % (tok[0], tok[1], nC)
        )
    return tok


def encode_coeff_token(nC: int, tc: int, t1: int) -> str | None:
    if nC >= 8:
        return format(3 if tc == 0 else ((tc - 1) << 2) | t1, "06b")
    key = _col_key(nC)
    if (key, (tc, t1)) not in CONFIDENT_TOKENS and key in (2, 4):
        return None  # unpinned tail: caller falls back to I_PCM
    return _col(nC).get((tc, t1))  # None for absent rows → same fallback


def decode_residual(r, nC: int, max_coeff: int) -> list[int]:
    """§9.2: one residual block → `max_coeff` levels in SCAN order
    (zigzag for 4x4, the 15-coeff AC scan when max_coeff == 15, the
    2x2 chroma DC raster when max_coeff == 4)."""
    tc, t1 = decode_coeff_token(r, nC)
    if tc > max_coeff:
        raise ValueError("CAVLC: TotalCoeff exceeds block size")
    levels = [0] * max_coeff
    if tc == 0:
        return levels
    # levels, highest frequency first
    vals: list[int] = []
    suffix_len = 1 if tc > 10 and t1 < 3 else 0
    for i in range(tc):
        if i < t1:
            vals.append(-1 if r.u(1) else 1)
            continue
        # level_prefix: zeros then a 1
        prefix = 0
        while r.u(1) == 0:
            prefix += 1
            if prefix > 31:
                raise ValueError("CAVLC: level prefix overrun")
        if prefix == 14 and suffix_len == 0:
            size = 4
        elif prefix >= 15:
            size = prefix - 3
        else:
            size = suffix_len
        level_code = min(15, prefix) << suffix_len
        if size:
            level_code += r.u(size)
        if prefix >= 15 and suffix_len == 0:
            level_code += 15
        if prefix >= 16:
            level_code += (1 << (prefix - 3)) - 4096
        if i == t1 and t1 < 3:
            level_code += 2
        level = (level_code + 2) >> 1 if level_code % 2 == 0 else -((level_code + 1) >> 1)
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
        vals.append(level)
    # total_zeros
    if tc < max_coeff:
        if max_coeff == 4:  # chroma DC
            tz = _read_code(r, _TOTAL_ZEROS_CDC[tc])
        else:
            tz = _read_code(r, _TOTAL_ZEROS[tc])
    else:
        tz = 0
    # run_before: place high-frequency-first; the gap below coefficient i
    # is run_i, the lowest coefficient absorbs the remaining zeros
    zeros_left = tz
    pos = tc - 1 + tz  # scan index of the highest-frequency coefficient
    for i in range(tc):
        if pos >= max_coeff or pos < 0:
            raise ValueError("CAVLC: coefficient position out of range")
        levels[pos] = vals[i]
        if i == tc - 1:
            break
        if zeros_left > 0:
            run = _read_code(r, _RUN_BEFORE[min(zeros_left, 7)])
            if run > zeros_left:
                raise ValueError("CAVLC: run_before exceeds zerosLeft")
        else:
            run = 0
        pos -= run + 1
        zeros_left -= run
    return levels


def encode_residual(coeffs: list[int], nC: int) -> str | None:
    """§9.2 inverse: levels in SCAN order → bitstring, or None when a
    needed coeff_token entry is outside CONFIDENT_TOKENS (the caller
    falls back to I_PCM) or a level is CAVLC-unrepresentable here."""
    max_coeff = len(coeffs)
    nz = [i for i, c in enumerate(coeffs) if c != 0]
    tc = len(nz)
    if tc == 0:
        return encode_coeff_token(nC, 0, 0)
    # trailing ones: up to 3 |1| levels at the high-frequency end
    t1 = 0
    for i in reversed(nz):
        if abs(coeffs[i]) == 1 and t1 < 3:
            t1 += 1
        else:
            break
    tok = encode_coeff_token(nC, tc, t1)
    if tok is None:
        return None
    bits = [tok]
    # levels high-frequency-first
    order = list(reversed(nz))
    suffix_len = 1 if tc > 10 and t1 < 3 else 0
    for i, idx in enumerate(order):
        level = coeffs[idx]
        if i < t1:
            bits.append("1" if level < 0 else "0")
            continue
        code = 2 * level - 2 if level > 0 else -2 * level - 1
        if i == t1 and t1 < 3:
            code -= 2
        # choose prefix/suffix under current suffix_len (§9.2.2 inverse)
        if suffix_len == 0:
            if code < 14:
                bits.append("0" * code + "1")
            elif code < 30:
                bits.append("0" * 14 + "1" + format(code - 14, "04b"))
            else:
                ec = code - 30
                if ec >= (1 << 12):
                    return None  # beyond the 16-escape range used here
                bits.append("0" * 15 + "1" + format(ec, "012b"))
        else:
            pref = code >> suffix_len
            if pref < 15:
                bits.append("0" * pref + "1"
                            + format(code & ((1 << suffix_len) - 1),
                                     f"0{suffix_len}b"))
            else:
                ec = code - (15 << suffix_len)
                if ec >= (1 << 12):
                    return None
                bits.append("0" * 15 + "1" + format(ec, "012b"))
        if suffix_len == 0:
            suffix_len = 1
        if abs(level) > (3 << (suffix_len - 1)) and suffix_len < 6:
            suffix_len += 1
    # total_zeros: zeros below the highest-frequency nonzero
    tz = nz[-1] + 1 - tc
    if tc < max_coeff:
        col = _TOTAL_ZEROS_CDC[tc] if max_coeff == 4 else _TOTAL_ZEROS[tc]
        bits.append(col[tz])
    zeros_left = tz
    for i, idx in enumerate(order):
        if i == tc - 1 or zeros_left == 0:
            break
        nxt = order[i + 1] if i + 1 < tc else -1
        run = idx - nxt - 1
        bits.append(_RUN_BEFORE[min(zeros_left, 7)][run])
        zeros_left -= run
    return "".join(bits)
