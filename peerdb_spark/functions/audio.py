"""Audio columns: WAV/RIFF decode + frame features + resampling, no codec lib.

The reference (PeerDB) treats audio as opaque BYTEA (flow/model/qvalue
passthrough) — this module exists for the LLM-data-pipeline surface
(speech-corpus curation: framing, energy/ZCR features for VAD-style
trimming and quality filters, rate normalization) the way png/jpeg/h264.py
do for images and video. Everything is public-spec (RIFF/WAVE, IEEE 754)
and numpy; the Spark entry points live in functions/multimodal.py
(decode_audio / audio_frame_features / resample_audio) as Arrow-batched
mapInPandas kernels over (media_id, content, meta) rows.

Codec scope (strict rejects, never wrong samples):
- PCM integer 8 (unsigned) / 16 / 24 / 32-bit little-endian and IEEE
  float32/float64 (format tags 1 and 3, plus WAVE_FORMAT_EXTENSIBLE
  (0xFFFE) wrapping any supported tag), any channel count.
- G.711 A-law (tag 6) and mu-law (tag 7): the logarithmic companding
  expansion computed from the public formulas (segment/mantissa decode —
  mu-law ((m<<3)+0x84)<<s − 0x84 over the inverted code, A-law the
  13-bit segmented equivalent scaled ×8), hitting the canonical 16-bit
  extrema ±32124 (mu) / ±32256 (A) and mu-law's two zero codes.
- ADPCM / MP3-in-WAV raise NotImplementedError — those genuinely need
  codec tables/libraries out of scope.
- Chunk walk tolerates LIST/fact/cue metadata, enforces even-byte chunk
  padding, and validates sizes; a torn payload is ValueError, never
  silently-wrong samples.

Decoded samples normalize to int32 at the SOURCE bit depth (no scaling):
8-bit u8 → centered −128..127, 16 → −32768..32767, 24/32 kept; float
inputs scale by 2^15 and round (documented, exact for the synthesizable
fixtures the oracle queries pin). Frame features are integer-exact
(sum-of-squares as int64) so DuckDB restates them bit-for-bit.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "parse_wav",
    "parse_audio",
    "encode_wav",
    "frame_features",
    "resample_linear",
]


def parse_audio(data: bytes) -> tuple[int, int, int, "np.ndarray"]:
    """Format-dispatching decode: FLAC or Ogg-FLAC by magic
    (functions/flac.py; OggS payloads transmux through functions/ogg.py
    — round 10), else WAV — one contract (rate, channels, bits, (n, ch)
    int32) for every Spark audio operator."""
    if data[:4] in (b"fLaC", b"OggS"):
        from peerdb_spark.functions.flac import parse_flac

        return parse_flac(data)
    return parse_wav(data)


def _mulaw_table() -> np.ndarray:
    """G.711 mu-law code → 16-bit linear (the public expansion formula:
    invert the code, split sign/segment/mantissa, magnitude =
    ((m<<3) + 0x84) << s − 0x84). Extrema ±32124; codes 0xFF and 0x7F
    both decode to 0 (mu-law's two zeros)."""
    codes = np.arange(256, dtype=np.uint8)
    u = (~codes) & 0xFF
    seg = (u >> 4) & 0x7
    mant = u & 0xF
    mag = (((mant.astype(np.int32) << 3) + 0x84) << seg) - 0x84
    return np.where(u & 0x80, -mag, mag).astype(np.int16)


def _alaw_table() -> np.ndarray:
    """G.711 A-law code → 16-bit linear: XOR 0x55, segmented expansion
    ((m<<4)+8 for segment 0, ((m<<4)+0x108)<<(s−1) above) scaled ×... the
    standard 16-bit alignment is <<3 (extrema ±32256)."""
    codes = np.arange(256, dtype=np.uint8)
    a = codes ^ 0x55
    seg = (a >> 4) & 0x7
    mant = (a & 0xF).astype(np.int32)
    mag = np.where(
        seg == 0,
        (mant << 4) + 8,
        ((mant << 4) + 0x108) << np.maximum(seg - 1, 0),
    )
    return np.where(a & 0x80, mag, -mag).astype(np.int16)


def parse_wav(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """WAV bytes → (sample_rate, n_channels, bit_depth, samples) with
    samples an (n_frames, n_channels) int32 array at source precision.

    Validates the RIFF/WAVE signature, walks chunks with even-byte
    padding, requires fmt before data, and checks data length divides the
    frame stride. bit_depth reports the SOURCE container depth (8/16/24/
    32; floats report 32/64 with samples scaled to 16-bit range)."""
    try:
        return _parse_wav(data)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt WAV stream ({type(e).__name__})") from e


def _parse_wav(data: bytes):
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF/WAVE signature")
    (riff_size,) = struct.unpack_from("<I", data, 4)
    if riff_size + 8 > len(data):
        raise ValueError("RIFF size exceeds payload")
    pos = 12
    fmt = None
    raw = None
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body_start = pos + 8
        if body_start + size > len(data):
            raise ValueError(f"truncated chunk {tag!r}")
        if tag == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            (audio_fmt, n_ch, rate, _brate, block_align, bits) = struct.unpack_from(
                "<HHIIHH", data, body_start
            )
            if audio_fmt == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: real tag in GUID
                if size < 40:
                    raise ValueError("extensible fmt chunk too short")
                (audio_fmt,) = struct.unpack_from("<H", data, body_start + 24)
            fmt = (audio_fmt, n_ch, rate, block_align, bits)
        elif tag == b"data":
            raw = data[body_start : body_start + size]
        # LIST / fact / cue / bext etc.: skipped
        pos = body_start + size + (size & 1)  # chunks pad to even bytes
    if fmt is None:
        raise ValueError("no fmt chunk")
    if raw is None:
        raise ValueError("no data chunk")
    audio_fmt, n_ch, rate, block_align, bits = fmt
    if n_ch < 1 or rate < 1:
        raise ValueError(f"invalid fmt: channels={n_ch} rate={rate}")
    if audio_fmt == 1:  # integer PCM
        if bits not in (8, 16, 24, 32):
            raise ValueError(f"invalid PCM bit depth {bits}")
    elif audio_fmt == 3:  # IEEE float
        if bits not in (32, 64):
            raise ValueError(f"invalid float bit depth {bits}")
    elif audio_fmt in (6, 7):  # G.711 A-law / mu-law
        if bits != 8:
            raise ValueError(f"G.711 samples are 8-bit, got {bits}")
    else:
        raise NotImplementedError(
            f"WAV format tag {audio_fmt} (ADPCM/MP3/...) needs a codec "
            "out of scope; PCM, IEEE-float, and G.711 WAV decode"
        )
    stride = n_ch * (bits // 8)
    if block_align and block_align != stride:
        raise ValueError(f"block align {block_align} != frame stride {stride}")
    if len(raw) % stride:
        raise ValueError("data chunk is not a whole number of frames")
    n = len(raw) // stride
    if audio_fmt in (6, 7):
        codes = np.frombuffer(raw, dtype=np.uint8)
        lut = _alaw_table() if audio_fmt == 6 else _mulaw_table()
        samples = lut[codes].astype(np.int32).reshape(n, n_ch)
    elif audio_fmt == 3:
        dt = "<f4" if bits == 32 else "<f8"
        f = np.frombuffer(raw, dtype=dt).reshape(n, n_ch).astype(np.float64)
        if not np.isfinite(f).all():
            raise ValueError("non-finite float samples")
        samples = np.clip(np.round(f * 32768.0), -32768, 32767).astype(np.int32)
    elif bits == 8:
        samples = (
            np.frombuffer(raw, dtype=np.uint8).astype(np.int32) - 128
        ).reshape(n, n_ch)
    elif bits == 16:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.int32).reshape(n, n_ch)
    elif bits == 24:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3).astype(np.int32)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        samples = ((v ^ 0x800000) - 0x800000).reshape(n, n_ch)  # sign-extend
    else:  # 32
        samples = np.frombuffer(raw, dtype="<i4").astype(np.int32).reshape(n, n_ch)
    return rate, n_ch, bits, samples


def encode_wav(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """(n, ch) int samples → PCM WAV bytes (the fixture/test encoder).
    Values must fit the target depth; 8-bit writes unsigned-offset."""
    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError("samples must be (n,) or (n, channels)")
    n, ch = arr.shape
    arr = arr.astype(np.int64)
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported encode depth {bits}")
    if arr.min(initial=0) < lo or arr.max(initial=0) > hi:
        raise ValueError(f"samples exceed {bits}-bit range")
    if bits == 8:
        payload = (arr + 128).astype(np.uint8).tobytes()
    elif bits == 16:
        payload = arr.astype("<i2").tobytes()
    elif bits == 24:
        u = (arr & 0xFFFFFF).astype(np.uint32)
        b = np.empty((n * ch, 3), dtype=np.uint8)
        flat = u.reshape(-1)
        b[:, 0] = flat & 0xFF
        b[:, 1] = (flat >> 8) & 0xFF
        b[:, 2] = (flat >> 16) & 0xFF
        payload = b.tobytes()
    else:
        payload = arr.astype("<i4").tobytes()
    stride = ch * (bits // 8)
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * stride, stride, bits)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
        + (b"\x00" if len(payload) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def frame_features(samples: np.ndarray, frame_len: int):
    """(n, ch) int32 → per-frame integer-exact features over the channel
    mixdown: (frame_idx, n_samples, sum_sq int64, zero_crossings int32,
    peak int32). Mixdown is the floor-toward-minus-inf channel mean (SQL
    restatable); a trailing partial frame is kept with its true length.
    Zero crossings count sign flips between CONSECUTIVE mixdown samples
    within the frame (strict sign change, zeros break runs — the classic
    ZCR definition made integer-exact)."""
    if frame_len < 1:
        raise ValueError(f"frame_len must be >= 1, got {frame_len}")
    if samples.ndim != 2:
        raise ValueError("samples must be (n, channels)")
    n = samples.shape[0]
    if n == 0:
        return []
    mix = np.floor_divide(samples.astype(np.int64).sum(axis=1), samples.shape[1])
    out = []
    for f0 in range(0, n, frame_len):
        fr = mix[f0 : f0 + frame_len]
        sgn = np.sign(fr)
        nz = sgn[sgn != 0]
        zc = int((nz[1:] * nz[:-1] < 0).sum()) if len(nz) > 1 else 0
        out.append((
            f0 // frame_len,
            int(len(fr)),
            int((fr * fr).sum()),
            zc,
            int(np.abs(fr).max(initial=0)),
        ))
    return out


def resample_linear(samples: np.ndarray, src_rate: int, dst_rate: int) -> np.ndarray:
    """Linear-interpolation resample of (n, ch) int32 → (m, ch) int32 with
    m = ceil(n · dst/src); output sample j sits at source position
    j·src/dst (exact rational arithmetic, round-half-up on the
    interpolated value — restatable in integer SQL). The standard cheap
    rate normalizer for corpus ingest; a real low-pass polyphase filter is
    a quality upgrade, not a correctness gate."""
    if src_rate < 1 or dst_rate < 1:
        raise ValueError("rates must be positive")
    n = samples.shape[0]
    if n == 0 or src_rate == dst_rate:
        return samples.copy()
    m = -(-n * dst_rate // src_rate)
    j = np.arange(m, dtype=np.int64)
    # source position as exact rational: pos = j*src/dst = q + r/dst
    q, r = np.divmod(j * src_rate, dst_rate)
    q1 = np.minimum(q + 1, n - 1)
    s0 = samples[np.minimum(q, n - 1)].astype(np.int64)
    s1 = samples[q1].astype(np.int64)
    # value = s0 + (s1-s0)*r/dst, round half up in exact integers
    num = s0 * dst_rate + (s1 - s0) * r[:, None]
    out = np.floor_divide(2 * num + dst_rate, 2 * dst_rate)
    return out.astype(np.int32)
