"""Tar archive walk — WebDataset-style .tar shards, the standard container
for large multimodal training datasets (sample = members sharing a key
prefix: `000123.jpg` + `000123.json` + `000123.txt`).

Pure structural parse of the public POSIX ustar format (512-byte headers,
octal or GNU base-256 sizes, checksum validation) plus the two long-name
mechanisms real tars use: PAX extended headers ('x', path=... records)
and GNU longname ('L'). `index_tar` walks header blocks only — member
payload bytes are never touched for an index/sampling plan (the same
posture as the MP4 sample tables), so selecting `.json` members from a
shard full of images reads headers + the selected payloads only.

The Spark surface (functions/multimodal.py:explode_tar) turns (media_id,
shard bytes) rows into (media_id, member name, sample key, payload) rows
inside Arrow batches — the ingest step that feeds decode_images /
decode_audio / the text operators. `encode_tar` is the fixture muxer
(plain ustar + PAX when names overflow).

Reference parity: the reference has no archive handling (opaque BYTEA);
this is LLM-pipeline surface from the public format specification.
"""

from __future__ import annotations

__all__ = ["index_tar", "extract_tar_member", "encode_tar"]

_BLOCK = 512


def _parse_octal(field: bytes) -> int:
    """Tar numeric field: NUL/space-terminated octal, or GNU base-256
    (high bit of first byte set) for sizes ≥ 8 GiB."""
    if field and field[0] & 0x80:
        v = field[0] & 0x7F
        for b in field[1:]:
            v = (v << 8) | b
        return v
    s = field.split(b"\x00", 1)[0].strip()
    if not s:
        return 0
    try:
        return int(s, 8)
    except ValueError as e:
        raise ValueError(f"bad octal field {field!r}") from e


def _checksum_ok(hdr: bytes) -> bool:
    stored = _parse_octal(hdr[148:156])
    calc = sum(hdr[:148]) + 8 * 32 + sum(hdr[156:])
    return stored == calc


def index_tar(data: bytes) -> list[dict]:
    """Tar bytes → [{"name", "offset", "size", "type"}] for regular
    members, header blocks only (payloads untouched). Handles PAX 'x'
    path overrides and GNU 'L' longnames; validates header checksums; two
    zero blocks (or EOF) end the archive. Torn archives raise ValueError."""
    out: list[dict] = []
    pos = 0
    pending_name: str | None = None
    n = len(data)
    clean_end = False
    while pos + _BLOCK <= n:
        hdr = data[pos : pos + _BLOCK]
        if hdr == b"\x00" * _BLOCK:
            clean_end = True
            break  # end-of-archive marker
        if not _checksum_ok(hdr):
            raise ValueError(f"bad tar header checksum at {pos}")
        size = _parse_octal(hdr[124:136])
        typeflag = hdr[156:157]
        payload_start = pos + _BLOCK
        payload_end = payload_start + size
        if payload_end > n:
            raise ValueError(f"member at {pos} overruns the archive")
        if typeflag == b"x":  # PAX extended header: "length key=value\n"
            pax = data[payload_start:payload_end]
            p = 0
            while p < len(pax):
                sp = pax.index(b" ", p)
                rec_len = int(pax[p:sp])
                if rec_len <= 0 or p + rec_len > len(pax):
                    raise ValueError("malformed PAX record length")
                rec = pax[sp + 1 : p + rec_len - 1]  # strip len+sp, \n
                key, _, val = rec.partition(b"=")
                if key == b"path":
                    pending_name = val.decode("utf-8")
                p += rec_len
        elif typeflag == b"L":  # GNU longname
            pending_name = (
                data[payload_start:payload_end].split(b"\x00", 1)[0]
            ).decode("utf-8")
        elif typeflag in (b"0", b"\x00"):  # regular file
            raw = hdr[:100].split(b"\x00", 1)[0].decode("utf-8")
            prefix = hdr[345:500].split(b"\x00", 1)[0].decode("utf-8")
            name = pending_name or (f"{prefix}/{raw}" if prefix else raw)
            pending_name = None
            out.append({"name": name, "offset": payload_start,
                        "size": size, "type": "file"})
        else:
            pending_name = None  # dirs/links: skipped, reset overrides
        pos = payload_end + (-size % _BLOCK)
    if not clean_end and pos != n:
        # neither a zero end-block nor an exact block boundary: a torn
        # shard must reject, not silently yield fewer members
        raise ValueError("truncated tar: trailing partial block")
    return out


def extract_tar_member(data: bytes, member: dict) -> bytes:
    off, size = member["offset"], member["size"]
    if off + size > len(data):
        raise ValueError("member range exceeds archive")
    return data[off : off + size]


def encode_tar(members: list[tuple[str, bytes]]) -> bytes:
    """[(name, payload)] → ustar bytes (PAX header when the name exceeds
    the 100-byte field — the WebDataset-relevant long-key case)."""
    out = bytearray()

    def header(name: str, size: int, typeflag: bytes) -> bytes:
        nb = name.encode("utf-8")
        if len(nb) > 100:
            raise ValueError("header name too long (PAX path handles it)")
        hdr = bytearray(_BLOCK)
        hdr[0 : len(nb)] = nb
        hdr[100:108] = b"0000644\x00"
        hdr[108:116] = b"0000000\x00"
        hdr[116:124] = b"0000000\x00"
        hdr[124:136] = f"{size:011o}\x00".encode()
        hdr[136:148] = b"00000000000\x00"
        hdr[148:156] = b" " * 8
        hdr[156:157] = typeflag
        hdr[257:263] = b"ustar\x00"
        hdr[263:265] = b"00"
        chk = sum(hdr)
        hdr[148:156] = f"{chk:06o}\x00 ".encode()
        return bytes(hdr)

    def pad(payload: bytes) -> bytes:
        return payload + b"\x00" * (-len(payload) % _BLOCK)

    for name, payload in members:
        if len(name.encode("utf-8")) > 100:
            body = b" path=" + name.encode("utf-8") + b"\n"
            # the PAX record length counts its own digits (fixpoint)
            total = len(body)
            while len(str(total)) + len(body) != total:
                total = len(str(total)) + len(body)
            pax = str(total).encode() + body
            out += header("./PaxHeaders/x", len(pax), b"x") + pad(pax)
            # fallback ustar name truncated by ENCODED bytes (multibyte
            # names overflow a char-count truncation); the PAX 'path'
            # record above overrides it on read anyway
            short = name.encode("utf-8")[:100].decode("utf-8", "ignore")
            out += header(short, len(payload), b"0") + pad(payload)
        else:
            out += header(name, len(payload), b"0") + pad(payload)
    out += b"\x00" * (2 * _BLOCK)
    return bytes(out)
