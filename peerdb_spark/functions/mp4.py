"""MP4 / ISO Base Media File Format (ISO 14496-12) container walk.

Purely structural — no entropy decode: box tree parsing, track headers,
the full sample-table resolution (stsz/stsc/stco→absolute byte ranges,
stss keyframes, stts timestamps), AVC decoder configuration (avcC SPS/PPS
+ NAL length-prefix size), and length-prefixed→Annex-B conversion feeding
functions/h264.py. With it, frame COUNTING/SAMPLING plans run over real
.mp4 files the way split_mjpeg/split_h264_frames already do for raw
streams — skipped samples' payload bytes are never touched (the sample
table IS the index), which is the 100 TB posture: metadata-driven pruning
before any byte of video decodes.

A minimal conforming muxer (`encode_mp4_h264`) wraps Annex-B H.264
pictures for fixtures and interop tests: ftyp + mdat + moov with correct
stbl tables, avcC carrying the stream's own SPS/PPS, one sample per
picture. Real players accept such files; our parser resolves them
bit-exactly back.

Reference parity: the reference (PeerDB) has no container/video support
at all (opaque BYTEA) — this exists for the LLM-data-pipeline surface,
built from the public ISO 14496-12/-15 structure.
"""

from __future__ import annotations

import struct

import numpy as np  # noqa: F401  (kept: callers pass numpy planes through)

__all__ = [
    "walk_boxes",
    "parse_mp4",
    "mp4_sample_ranges",
    "mp4_sample_to_annexb",
    "encode_mp4_h264",
]


def walk_boxes(data: bytes, start: int = 0, end: int | None = None):
    """Yield (box_type, payload_start, payload_end) for the boxes in
    [start, end). Handles 64-bit largesize (size==1) and to-end boxes
    (size==0); malformed sizes raise ValueError."""
    end = len(data) if end is None else end
    pos = start
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated box header")
        (size,) = struct.unpack_from(">I", data, pos)
        btype = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize box")
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body = pos + 16
            if size < 16:
                raise ValueError("invalid largesize")
        elif size == 0:
            size = end - pos
        elif size < 8:
            raise ValueError(f"invalid box size {size}")
        if pos + size > end:
            raise ValueError(f"box {btype!r} overruns container")
        yield btype, body, pos + size
        pos += size


def _find(data: bytes, start: int, end: int, btype: bytes):
    for t, s, e in walk_boxes(data, start, end):
        if t == btype:
            return s, e
    return None


def _full_box(data: bytes, s: int) -> tuple[int, int]:
    """FullBox header: (version, payload offset past version/flags)."""
    return data[s], s + 4


def _entry_fits(count: int, entry_size: int, p: int, box_end: int,
                name: str) -> None:
    """Table entry counts must fit their box — a mutated count must fail
    here, not hang a million-iteration loop or allocate gigabytes."""
    if count * entry_size > box_end - p:
        raise ValueError(f"{name} entry count {count} overruns its box")


def parse_mp4(data: bytes) -> dict:
    """MP4 bytes → {"tracks": [...]} where each video track dict carries
    codec, width, height, timescale, nal_length_size, sps/pps lists, and
    the raw sample tables (sizes, chunk offsets, sample-to-chunk runs,
    sync-sample set, decode timestamps). Only the structure is read —
    sample payloads stay untouched. Torn/corrupt tables convert to
    ValueError at this boundary (a mutated count must never escape as a
    raw struct/index fault into a Spark task)."""
    try:
        return _parse_mp4(data)
    except (struct.error, IndexError, OverflowError, MemoryError) as e:
        raise ValueError(f"corrupt MP4 ({type(e).__name__})") from e


def _parse_mp4(data: bytes) -> dict:
    moov = _find(data, 0, len(data), b"moov")
    if moov is None:
        raise ValueError("no moov box")
    tracks = []
    for t, s, e in walk_boxes(data, *moov):
        if t != b"trak":
            continue
        trk: dict = {"codec": None}
        tkhd = _find(data, s, e, b"tkhd")
        if tkhd is not None:
            ver, p = _full_box(data, tkhd[0])
            # tkhd v0: times(4+4) id(4) reserved(4) duration(4);
            # v1: times(8+8) id(4) reserved(4) duration(8); then
            # reserved(8) layer/alt/volume/reserved(2*4) matrix(36),
            # width/height as 16.16 fixed point
            p += 20 if ver == 0 else 32
            p += 8 + 2 + 2 + 2 + 2 + 36
            w_fx, h_fx = struct.unpack_from(">II", data, p)
            trk["width"] = w_fx >> 16
            trk["height"] = h_fx >> 16
        mdia = _find(data, s, e, b"mdia")
        if mdia is None:
            continue
        mdhd = _find(data, *mdia, b"mdhd")
        if mdhd is not None:
            ver, p = _full_box(data, mdhd[0])
            p += 8 if ver == 0 else 16
            (trk["timescale"],) = struct.unpack_from(">I", data, p)
        minf = _find(data, *mdia, b"minf")
        if minf is None:
            continue
        stbl = _find(data, *minf, b"stbl")
        if stbl is None:
            continue
        _parse_stbl(data, stbl, trk)
        tracks.append(trk)
    if not tracks:
        raise ValueError("no trak boxes in moov")
    return {"tracks": tracks}


def _parse_stbl(data: bytes, stbl: tuple[int, int], trk: dict) -> None:
    for t, s, e in walk_boxes(data, *stbl):
        if t == b"stsd":
            _, p = _full_box(data, s)
            (n_entries,) = struct.unpack_from(">I", data, p)
            if n_entries < 1:
                continue
            for et, es, ee in walk_boxes(data, p + 4, e):
                trk["codec"] = et.decode("latin-1")
                if et in (b"avc1", b"avc3"):
                    # VisualSampleEntry: 6 reserved + 2 ref idx + 16 pre-
                    # defined/reserved + width/height + resolution etc.
                    vs = es + 6 + 2 + 16
                    w_, h_ = struct.unpack_from(">HH", data, vs)
                    trk.setdefault("width", w_)
                    trk.setdefault("height", h_)
                    avcc = _find(data, es + 78, ee, b"avcC")
                    if avcc is not None:
                        _parse_avcc(data, avcc, trk)
                break  # first sample entry only
        elif t == b"stsz":
            _, p = _full_box(data, s)
            uniform, count = struct.unpack_from(">II", data, p)
            if uniform:
                # entries are implicit, so the box can't bound the count:
                # sanity-cap against the file (samples can't outnumber
                # its bytes) so a mutated count can't allocate GBs
                if count > len(data):
                    raise ValueError("stsz sample count exceeds file size")
                trk["sizes"] = [uniform] * count
            else:
                _entry_fits(count, 4, p + 8, e, "stsz")
                trk["sizes"] = list(
                    struct.unpack_from(f">{count}I", data, p + 8)
                )
        elif t == b"stco":
            _, p = _full_box(data, s)
            (count,) = struct.unpack_from(">I", data, p)
            _entry_fits(count, 4, p + 4, e, "stco")
            trk["chunk_offsets"] = list(
                struct.unpack_from(f">{count}I", data, p + 4)
            )
        elif t == b"co64":
            _, p = _full_box(data, s)
            (count,) = struct.unpack_from(">I", data, p)
            _entry_fits(count, 8, p + 4, e, "co64")
            trk["chunk_offsets"] = list(
                struct.unpack_from(f">{count}Q", data, p + 4)
            )
        elif t == b"stsc":
            _, p = _full_box(data, s)
            (count,) = struct.unpack_from(">I", data, p)
            _entry_fits(count, 12, p + 4, e, "stsc")
            runs = []
            for i in range(count):
                first, per, desc = struct.unpack_from(">III", data, p + 4 + 12 * i)
                runs.append((first, per, desc))
            trk["sample_to_chunk"] = runs
        elif t == b"stss":
            _, p = _full_box(data, s)
            (count,) = struct.unpack_from(">I", data, p)
            _entry_fits(count, 4, p + 4, e, "stss")
            trk["sync_samples"] = set(
                struct.unpack_from(f">{count}I", data, p + 4)
            )
        elif t == b"stts":
            _, p = _full_box(data, s)
            (count,) = struct.unpack_from(">I", data, p)
            _entry_fits(count, 8, p + 4, e, "stts")
            trk["time_to_sample"] = [
                struct.unpack_from(">II", data, p + 4 + 8 * i)
                for i in range(count)
            ]


def _parse_avcc(data: bytes, avcc: tuple[int, int], trk: dict) -> None:
    """AVCDecoderConfigurationRecord (ISO 14496-15 §5.2.4.1)."""
    s, e = avcc
    if e - s < 7:
        raise ValueError("truncated avcC")
    trk["nal_length_size"] = (data[s + 4] & 0x3) + 1
    n_sps = data[s + 5] & 0x1F
    p = s + 6
    sps = []
    for _ in range(n_sps):
        (ln,) = struct.unpack_from(">H", data, p)
        sps.append(data[p + 2 : p + 2 + ln])
        p += 2 + ln
    n_pps = data[p]
    p += 1
    pps = []
    for _ in range(n_pps):
        (ln,) = struct.unpack_from(">H", data, p)
        pps.append(data[p + 2 : p + 2 + ln])
        p += 2 + ln
    if p > e:
        raise ValueError("avcC parameter sets overrun the box")
    trk["sps"] = sps
    trk["pps"] = pps


def mp4_sample_ranges(trk: dict) -> list[tuple[int, int, bool, int]]:
    """Resolve the sample tables → [(offset, size, is_sync, dts)] per
    sample — the frame index. stsc runs expand against the chunk-offset
    list; sizes accumulate within each chunk; stss marks sync (key)
    samples (absent ⇒ all sync, per spec); stts accumulates decode
    timestamps in track timescale units."""
    sizes = trk.get("sizes")
    offsets = trk.get("chunk_offsets")
    runs = trk.get("sample_to_chunk")
    if not sizes or not offsets or not runs:
        raise ValueError("track is missing sample tables")
    sync = trk.get("sync_samples")
    # expand stsc: per-chunk sample counts
    per_chunk = []
    for i, (first, per, _desc) in enumerate(runs):
        last = runs[i + 1][0] - 1 if i + 1 < len(runs) else len(offsets)
        if first < 1 or first > last + 1:
            raise ValueError("invalid sample-to-chunk run")
        per_chunk.extend([per] * (last - first + 1))
    if len(per_chunk) != len(offsets):
        raise ValueError("sample-to-chunk runs do not cover the chunks")
    # decode timestamps
    dts = []
    t = 0
    for count, delta in trk.get("time_to_sample", []):
        for _ in range(count):
            dts.append(t)
            t += delta
    out = []
    si = 0
    for ci, base in enumerate(offsets):
        off = base
        for _ in range(per_chunk[ci]):
            if si >= len(sizes):
                raise ValueError("chunk table references more samples than stsz")
            is_sync = True if sync is None else (si + 1) in sync
            out.append((off, sizes[si],
                        is_sync, dts[si] if si < len(dts) else 0))
            off += sizes[si]
            si += 1
    if si != len(sizes):
        raise ValueError(f"sample tables cover {si}/{len(sizes)} samples")
    return out


def mp4_sample_to_annexb(data: bytes, trk: dict, offset: int, size: int) -> bytes:
    """One length-prefixed AVC sample → Annex-B bytes with the track's
    SPS/PPS prepended, ready for functions/h264.py:decode_h264."""
    nls = trk.get("nal_length_size")
    if not nls:
        raise ValueError("track has no avcC configuration")
    out = bytearray()
    for ps in trk.get("sps", []) + trk.get("pps", []):
        out += b"\x00\x00\x00\x01" + ps
    pos, end = offset, offset + size
    if end > len(data):
        raise ValueError("sample range exceeds file")
    while pos < end:
        if pos + nls > end:
            raise ValueError("truncated NAL length prefix")
        ln = int.from_bytes(data[pos : pos + nls], "big")
        pos += nls
        if pos + ln > end:
            raise ValueError("NAL overruns its sample")
        out += b"\x00\x00\x00\x01" + data[pos : pos + ln]
        pos += ln
    return bytes(out)


# -- minimal muxer (fixtures / interop) ----------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, flags: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">I", (version << 24) | flags) + payload)


def encode_mp4_h264(annexb_pictures: list[bytes], width: int, height: int,
                    timescale: int = 90000, sample_delta: int = 3000) -> bytes:
    """[Annex-B picture bytes] → a minimal conforming MP4: ftyp + mdat
    (4-byte length-prefixed NALs, parameter sets hoisted into avcC) +
    moov with one video track (stsd/stts/stsc/stsz/stco, stss marking IDR
    samples). Pictures come straight from h264.encode_h264_ipcm or any
    Annex-B source; every picture becomes one sample."""
    from peerdb_spark.functions.h264 import split_nals

    if not annexb_pictures:
        raise ValueError("need at least one picture")
    sps_list: list[bytes] = []
    pps_list: list[bytes] = []
    samples: list[bytes] = []
    syncs: list[int] = []
    for pi, pic in enumerate(annexb_pictures):
        sample = bytearray()
        is_sync = False
        for t, s, e in split_nals(pic):
            nal = pic[s:e]
            if t == 7:
                if nal not in sps_list:
                    sps_list.append(nal)
            elif t == 8:
                if nal not in pps_list:
                    pps_list.append(nal)
            else:
                sample += struct.pack(">I", len(nal)) + nal
                if t == 5:
                    is_sync = True
        if not sample:
            raise ValueError(f"picture {pi} has no VCL NAL")
        samples.append(bytes(sample))
        if is_sync:
            syncs.append(pi + 1)
    if not sps_list or not pps_list:
        raise ValueError("pictures carry no SPS/PPS to hoist into avcC")

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 0x200) + b"isomavc1")
    # mdat directly after ftyp: chunk offsets are deterministic
    mdat_payload = b"".join(samples)
    mdat = _box(b"mdat", mdat_payload)
    first_chunk_off = len(ftyp) + 8  # into mdat payload

    profile, compat, level = sps_list[0][1], sps_list[0][2], sps_list[0][3]
    avcc = bytes([1, profile, compat, level, 0xFC | 3,
                  0xE0 | len(sps_list)])
    for sp in sps_list:
        avcc += struct.pack(">H", len(sp)) + sp
    avcc += bytes([len(pps_list)])
    for pp in pps_list:
        avcc += struct.pack(">H", len(pp)) + pp
    avc1 = _box(
        b"avc1",
        b"\x00" * 6 + struct.pack(">H", 1)  # reserved + data ref idx
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame count
        + b"\x00" * 32  # compressor name
        + struct.pack(">H", 0x18) + struct.pack(">h", -1)
        + _box(b"avcC", avcc),
    )
    n = len(samples)
    stsd = _full(b"stsd", 0, 0, struct.pack(">I", 1) + avc1)
    stts = _full(b"stts", 0, 0, struct.pack(">III", 1, n, sample_delta))
    stsc = _full(b"stsc", 0, 0, struct.pack(">IIII", 1, 1, n, 1))
    stsz = _full(b"stsz", 0, 0,
                 struct.pack(">II", 0, n)
                 + b"".join(struct.pack(">I", len(sm)) for sm in samples))
    # one chunk per... single chunk holding all samples (stsc says so)
    stco = _full(b"stco", 0, 0, struct.pack(">II", 1, first_chunk_off))
    stss = _full(b"stss", 0, 0,
                 struct.pack(">I", len(syncs))
                 + b"".join(struct.pack(">I", x) for x in syncs))
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + stss)
    dinf = _box(b"dinf", _full(b"dref", 0, 0,
                               struct.pack(">I", 1)
                               + _full(b"url ", 0, 1, b"")))
    vmhd = _full(b"vmhd", 0, 1, b"\x00" * 8)
    minf = _box(b"minf", vmhd + dinf + stbl)
    duration = n * sample_delta
    mdhd = _full(b"mdhd", 0, 0,
                 struct.pack(">IIII", 0, 0, timescale, duration)
                 + struct.pack(">HH", 0x55C4, 0))  # 'und' language
    hdlr = _full(b"hdlr", 0, 0,
                 b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"video\x00")
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(b"tkhd", 0, 7,
                 struct.pack(">IIIII", 0, 0, 1, 0, duration)
                 + b"\x00" * 8 + struct.pack(">HHHH", 0, 0, 0x0100, 0)
                 + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(b"mvhd", 0, 0,
                 struct.pack(">IIII", 0, 0, timescale, duration)
                 + struct.pack(">IHH", 0x10000, 0x100, 0)
                 + b"\x00" * 8
                 + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                               0x40000000)
                 + b"\x00" * 24 + struct.pack(">I", 2))
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
