"""MySQL binlog ROW-event decoder: binary binlog v4 events → changelog rows.

The wire grammar is the PUBLIC binlog format (MySQL Internals manual,
"Binary Log Versions" / "ROWS_EVENT"):
  event header (19B, all little-endian): timestamp u32, type u8,
    server_id u32, event_size u32, log_pos u32, flags u16
  TABLE_MAP_EVENT (19): table_id u48, flags u16, schema lenstr+NUL,
    table lenstr+NUL, col_count lenenc, col types, metadata block,
    nullability bitmap
  WRITE/UPDATE/DELETE_ROWS_EVENTv2 (30/31/32): table_id u48, flags u16,
    extra_len u16, col_count lenenc, present bitmap(s), rows of
    [null bitmap + values]; UPDATE carries before+after image pairs
  GTID_EVENT (33): flags u8, sid 16B, gno u64 — the transaction id
  XID_EVENT (16): commit

Column types decoded (all little-endian unless noted; per the MySQL
Internals manual "ROWS_EVENT > column definition"):
  integers: TINY i8, SHORT i16, INT24 i24, LONG i32, LONGLONG i64,
    YEAR u8+1900
  floats: FLOAT f32, DOUBLE f64 (metadata 1 byte = width)
  strings: VARCHAR / VAR_STRING (metadata max_len u16; 1- or 2-byte
    length prefix), STRING/CHAR (packed 2-byte metadata carries real type
    + length), BLOB/TEXT (metadata = #length bytes; utf-8 when it decodes,
    else base64: prefix — binlog table maps don't carry charsets)
  temporal, rendered as ISO strings so the JSON staging stays typed by the
  destination schema (types.py casts on normalize, like every changelog):
    DATE u24 packed, TIME i24 packed decimal, DATETIME u64 packed decimal,
    TIMESTAMP u32 epoch, and the 5.6+ big-endian fixed-point forms
    TIMESTAMP2/DATETIME2/TIME2 (metadata 1 byte = fsp; (fsp+1)//2 frac
    bytes)
  NEWDECIMAL (metadata precision+scale): MySQL's 9-digits-per-4-bytes
    big-endian packing, sign-bit flipped, negatives bit-inverted →
    exact decimal string
  ENUM/SET (real type packed in STRING metadata, value = 1-2B / 1-8B
    little-endian index / bitmask): label string / comma-joined labels when
    the decoder was given column labels (the reference resolves them from
    the schema catalog, flow/connectors/mysql/qvalue_convert.go:82-93),
    else the raw index / bitmask int
  BIT (metadata [bits%8, bits//8]): big-endian integer
  JSON (BLOB-like length prefix): MySQL binary JSON (WL#8132 public
    format: small/large objects+arrays, inlined literals/int16, varint
    strings, opaque NEWDECIMAL) → JSON text
  GEOMETRY (BLOB-like): 4B LE SRID + WKB → "SRID=<n>;<wkb hex>"

Reference parity (studied, not copied): flow/connectors/mysql/cdc.go
consumes the same events via go-mysql's replication reader — table-map
tracking, before/after row images for updates, GTID checkpoints (string
offsets, flow/model/cdc_stream.go:56-58). Checkpoints here are strings that
order lexicographically: 'gtid:<sid>:<gno zero-padded>' when GTID events
are present, else 'pos:<log_pos zero-padded>'.

Like pgoutput, a binlog stream is sequential (table-map + txn state), so
`decode_binlog` runs the kernel per stream id via applyInPandas.
"""

from __future__ import annotations

import datetime as dt
import json
import struct
from dataclasses import dataclass, field

TABLE_MAP_EVENT = 19
XID_EVENT = 16
GTID_EVENT = 33
WRITE_ROWS_V2 = 30
UPDATE_ROWS_V2 = 31
DELETE_ROWS_V2 = 32

TYPE_TINY = 1
TYPE_SHORT = 2
TYPE_LONG = 3
TYPE_FLOAT = 4
TYPE_DOUBLE = 5
TYPE_NULL = 6
TYPE_TIMESTAMP = 7
TYPE_LONGLONG = 8
TYPE_INT24 = 9
TYPE_DATE = 10
TYPE_TIME = 11
TYPE_DATETIME = 12
TYPE_YEAR = 13
TYPE_VARCHAR = 15
TYPE_BIT = 16
TYPE_TIMESTAMP2 = 17
TYPE_DATETIME2 = 18
TYPE_TIME2 = 19
TYPE_JSON = 245
TYPE_NEWDECIMAL = 246
TYPE_ENUM = 247
TYPE_SET = 248
TYPE_BLOB = 252
TYPE_VAR_STRING = 253
TYPE_STRING = 254
TYPE_GEOMETRY = 255

# table-map metadata widths (manual: TABLE_MAP_EVENT column metadata)
_META1 = {TYPE_FLOAT, TYPE_DOUBLE, TYPE_BLOB, TYPE_TIMESTAMP2, TYPE_DATETIME2,
          TYPE_TIME2, TYPE_JSON, TYPE_GEOMETRY}
_META2_LE = {TYPE_VARCHAR, TYPE_VAR_STRING}
_META2_PACKED = {TYPE_STRING, TYPE_NEWDECIMAL}  # (byte0 << 8) | byte1
# BIT: 2 bytes stored as [bits % 8, bits // 8] (log_event.cc
# save_field_metadata) — kept in a dedicated set, packed (byte1 << 8) | byte0


class _Reader:
    __slots__ = ("buf", "pos")

    def __init__(self, buf: bytes, pos: int = 0):
        self.buf = buf
        self.pos = pos

    def u8(self) -> int:
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def u16(self) -> int:
        (v,) = struct.unpack_from("<H", self.buf, self.pos)
        self.pos += 2
        return v

    def u32(self) -> int:
        (v,) = struct.unpack_from("<I", self.buf, self.pos)
        self.pos += 4
        return v

    def i32(self) -> int:
        (v,) = struct.unpack_from("<i", self.buf, self.pos)
        self.pos += 4
        return v

    def u48(self) -> int:
        lo, hi = struct.unpack_from("<IH", self.buf, self.pos)
        self.pos += 6
        return lo | (hi << 32)

    def u64(self) -> int:
        (v,) = struct.unpack_from("<Q", self.buf, self.pos)
        self.pos += 8
        return v

    def i64(self) -> int:
        (v,) = struct.unpack_from("<q", self.buf, self.pos)
        self.pos += 8
        return v

    def take(self, n: int) -> bytes:
        b = self.buf[self.pos:self.pos + n]
        self.pos += n
        return b

    def lenenc(self) -> int:
        v = self.u8()
        if v < 0xFB:
            return v
        if v == 0xFC:
            return self.u16()
        if v == 0xFD:
            lo, mid = struct.unpack_from("<HB", self.buf, self.pos)
            self.pos += 3
            return lo | (mid << 16)
        return self.u64()

    def at_end(self) -> bool:
        return self.pos >= len(self.buf)


@dataclass
class _TableMap:
    table_id: int
    schema: str
    table: str
    col_types: list[int] = field(default_factory=list)
    col_meta: list[int] = field(default_factory=list)
    # per-column ENUM/SET label lists (binlog carries none; supplied by the
    # caller from the schema catalog, like the reference's qvalue_convert)
    labels: dict[int, list[str]] = field(default_factory=dict)

    @property
    def qualified(self) -> str:
        return f"{self.schema}.{self.table}" if self.schema else self.table

    def columns(self) -> list[str]:
        # binlog carries no column NAMES; positional names c0..cN match the
        # reference's behavior of resolving names from the schema catalog —
        # callers rename via CdcTableConfig.renames when needed
        return [f"c{i}" for i in range(len(self.col_types))]


# bytes needed for n leftover decimal digits (MySQL strings/decimal/decimal.c)
_DIG2BYTES = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]


def _decimal_bin_size(precision: int, scale: int) -> int:
    intg = precision - scale
    intg0, intgx = divmod(intg, 9)
    frac0, fracx = divmod(scale, 9)
    return intg0 * 4 + _DIG2BYTES[intgx] + frac0 * 4 + _DIG2BYTES[fracx]


def _read_newdecimal(r: _Reader, precision: int, scale: int) -> str:
    """MySQL packed decimal → exact decimal string. Groups of 9 decimal
    digits per 4 big-endian bytes; first byte's sign bit flipped; negative
    numbers stored bit-inverted."""
    raw = bytearray(r.take(_decimal_bin_size(precision, scale)))
    positive = bool(raw[0] & 0x80)
    raw[0] ^= 0x80
    if not positive:
        raw = bytearray(b ^ 0xFF for b in raw)
    intg = precision - scale
    intg0, intgx = divmod(intg, 9)
    frac0, fracx = divmod(scale, 9)
    pos = 0
    int_val = 0
    if intgx:
        n = _DIG2BYTES[intgx]
        int_val = int.from_bytes(raw[pos:pos + n], "big")
        pos += n
    for _ in range(intg0):
        int_val = int_val * 10**9 + int.from_bytes(raw[pos:pos + 4], "big")
        pos += 4
    frac_str = ""
    for _ in range(frac0):
        frac_str += f"{int.from_bytes(raw[pos:pos + 4], 'big'):09d}"
        pos += 4
    if fracx:
        n = _DIG2BYTES[fracx]
        frac_str += f"{int.from_bytes(raw[pos:pos + n], 'big'):0{fracx}d}"
        pos += n
    s = str(int_val) + (f".{frac_str}" if frac_str else "")
    return s if positive else f"-{s}"


def _jb_varint(buf: bytes, pos: int) -> tuple[int, int]:
    """MySQL binary-JSON variable-length int: 7 bits per byte, high bit =
    continuation (json_binary.cc read_variable_length)."""
    ln, shift = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        ln |= (b & 0x7F) << shift
        if not (b & 0x80):
            return ln, pos
        shift += 7


def _jb_inline(vt: int, entry: bytes):
    """Value inlined in a container's offset slot (literals + small ints;
    large containers also inline 32-bit ints)."""
    if vt == 0x04:  # literal
        return None if entry[0] == 0 else entry[0] == 1
    if vt == 0x05:
        return int.from_bytes(entry[:2], "little", signed=True)
    if vt == 0x06:
        return int.from_bytes(entry[:2], "little")
    if vt == 0x07:
        return int.from_bytes(entry[:4], "little", signed=True)
    return int.from_bytes(entry[:4], "little")  # 0x08 uint32


def _jb_value(vt: int, buf: bytes, pos: int):
    """Decode one binary-JSON value of type `vt` whose data begins at `pos`.
    Container offsets are relative to the container's own start, so
    containers recurse on a slice (public WL#8132 layout, json_binary.h)."""
    if vt in (0x00, 0x01, 0x02, 0x03):  # object/array, small/large
        data = buf[pos:]
        small = vt in (0x00, 0x02)
        w = 2 if small else 4
        count = int.from_bytes(data[0:w], "little")
        p = 2 * w  # skip count + total-size words
        is_obj = vt in (0x00, 0x01)
        keys = []
        if is_obj:
            for _ in range(count):
                koff = int.from_bytes(data[p:p + w], "little")
                klen = int.from_bytes(data[p + w:p + w + 2], "little")
                keys.append(data[koff:koff + klen].decode("utf-8"))
                p += w + 2
        inline = (0x04, 0x05, 0x06) if small else (0x04, 0x05, 0x06, 0x07, 0x08)
        vals = []
        for _ in range(count):
            t = data[p]
            entry = data[p + 1:p + 1 + w]
            if t in inline:
                vals.append(_jb_inline(t, entry))
            else:
                vals.append(_jb_value(t, data, int.from_bytes(entry, "little")))
            p += 1 + w
        return dict(zip(keys, vals)) if is_obj else vals
    if vt == 0x04:
        return None if buf[pos] == 0 else buf[pos] == 1
    if vt == 0x05:
        return int.from_bytes(buf[pos:pos + 2], "little", signed=True)
    if vt == 0x06:
        return int.from_bytes(buf[pos:pos + 2], "little")
    if vt == 0x07:
        return int.from_bytes(buf[pos:pos + 4], "little", signed=True)
    if vt == 0x08:
        return int.from_bytes(buf[pos:pos + 4], "little")
    if vt == 0x09:
        return int.from_bytes(buf[pos:pos + 8], "little", signed=True)
    if vt == 0x0A:
        return int.from_bytes(buf[pos:pos + 8], "little")
    if vt == 0x0B:
        (v,) = struct.unpack_from("<d", buf, pos)
        return v
    if vt == 0x0C:  # utf8mb4 string
        ln, p = _jb_varint(buf, pos)
        return buf[p:p + ln].decode("utf-8")
    if vt == 0x0F:  # opaque: field-type byte + varint length + payload
        ftype = buf[pos]
        ln, p = _jb_varint(buf, pos + 1)
        data = buf[p:p + ln]
        if ftype == TYPE_NEWDECIMAL:
            # precision byte + scale byte + packed decimal
            return _read_newdecimal(_Reader(data, 2), data[0], data[1])
        import base64

        return "base64:" + base64.b64encode(data).decode("ascii")
    raise ValueError(f"unsupported binary-JSON value type 0x{vt:02x}")


def _json_binary_to_text(payload: bytes) -> str | None:
    """MySQL binary JSON document → JSON text (empty payload = SQL NULL)."""
    if not payload:
        return None
    return json.dumps(_jb_value(payload[0], payload, 1), ensure_ascii=False)


def _read_frac_micros(r: _Reader, fsp: int) -> int:
    """Fractional seconds of the 5.6+ temporal types: (fsp+1)//2 big-endian
    bytes holding 2·⌈fsp/2⌉-digit units."""
    fb = (fsp + 1) // 2
    if not fb:
        return 0
    return int.from_bytes(r.take(fb), "big") * 10 ** (6 - 2 * fb)


def _iso_dt(y: int, mo: int, d: int, h: int, mi: int, s: int, us: int = 0) -> str:
    base = f"{y:04d}-{mo:02d}-{d:02d} {h:02d}:{mi:02d}:{s:02d}"
    return f"{base}.{us:06d}" if us else base


def _read_value(r: _Reader, ctype: int, meta: int, labels: list[str] | None = None):
    if ctype == TYPE_TINY:
        (v,) = struct.unpack_from("<b", r.buf, r.pos)
        r.pos += 1
        return v
    if ctype == TYPE_SHORT:
        (v,) = struct.unpack_from("<h", r.buf, r.pos)
        r.pos += 2
        return v
    if ctype == TYPE_INT24:
        v = int.from_bytes(r.take(3), "little", signed=True)
        return v
    if ctype == TYPE_LONG:
        return r.i32()
    if ctype == TYPE_LONGLONG:
        return r.i64()
    if ctype == TYPE_YEAR:
        v = r.u8()
        return 1900 + v if v else 0
    if ctype == TYPE_FLOAT:
        (v,) = struct.unpack_from("<f", r.buf, r.pos)
        r.pos += 4
        return v
    if ctype == TYPE_DOUBLE:
        (v,) = struct.unpack_from("<d", r.buf, r.pos)
        r.pos += 8
        return v
    if ctype == TYPE_NULL:
        return None
    if ctype in (TYPE_VARCHAR, TYPE_VAR_STRING):
        ln = r.u16() if meta > 255 else r.u8()
        return r.take(ln).decode("utf-8")
    if ctype == TYPE_STRING:
        m0, m1 = meta >> 8, meta & 0xFF
        if (m0 & 0x30) != 0x30:
            real, length = m0 | 0x30, m1 | (((m0 & 0x30) ^ 0x30) << 4)
        else:
            real, length = m0, m1
        if real == TYPE_ENUM:
            # value = 1-based label index, 1 or 2 LE bytes (= pack length in
            # the metadata); index 0 is MySQL's invalid-empty-string value.
            # With labels (reference resolves them from the schema catalog,
            # qvalue_convert.go:82-88) emit the label, else the index.
            v = int.from_bytes(r.take(length), "little")
            if labels is not None:
                return "" if v == 0 or v > len(labels) else labels[v - 1]
            return v
        if real == TYPE_SET:
            # value = bitmask over the label list, 1-8 LE bytes
            v = int.from_bytes(r.take(length), "little")
            if labels is not None:
                return ",".join(l for b, l in enumerate(labels) if v >> b & 1)
            return v
        ln = r.u16() if length > 255 else r.u8()
        return r.take(ln).decode("utf-8")
    if ctype == TYPE_BIT:
        bits_mod, nbytes_full = meta & 0xFF, meta >> 8
        total = nbytes_full + (1 if bits_mod else 0)
        # BIT values are stored big-endian (manual: ROWS_EVENT field encoding)
        return int.from_bytes(r.take(total), "big")
    if ctype == TYPE_JSON:
        ln = int.from_bytes(r.take(meta), "little")
        return _json_binary_to_text(r.take(ln))
    if ctype == TYPE_GEOMETRY:
        ln = int.from_bytes(r.take(meta), "little")
        raw = r.take(ln)
        # 4-byte LE SRID prefix + WKB — rendered like PostGIS EWKT's SRID
        # tag with the WKB hex payload (same shape functions/exotic.py uses)
        srid = int.from_bytes(raw[:4], "little")
        return f"SRID={srid};{raw[4:].hex()}"
    if ctype == TYPE_BLOB:
        ln = int.from_bytes(r.take(meta), "little")
        raw = r.take(ln)
        try:
            return raw.decode("utf-8")
        except UnicodeDecodeError:
            import base64

            return "base64:" + base64.b64encode(raw).decode("ascii")
    if ctype == TYPE_DATE:
        v = int.from_bytes(r.take(3), "little")
        if v == 0:
            return None  # zero date
        return f"{v >> 9:04d}-{(v >> 5) & 0xF:02d}-{v & 0x1F:02d}"
    if ctype == TYPE_TIME:
        v = int.from_bytes(r.take(3), "little", signed=True)
        sign, v = ("-" if v < 0 else ""), abs(v)
        return f"{sign}{v // 10000:02d}:{v // 100 % 100:02d}:{v % 100:02d}"
    if ctype == TYPE_DATETIME:
        v = r.u64()
        d, t = divmod(v, 1_000_000)
        return _iso_dt(d // 10000, d // 100 % 100, d % 100,
                       t // 10000, t // 100 % 100, t % 100)
    if ctype == TYPE_TIMESTAMP:
        ts = dt.datetime.fromtimestamp(r.u32(), dt.timezone.utc)
        return _iso_dt(ts.year, ts.month, ts.day, ts.hour, ts.minute, ts.second)
    if ctype == TYPE_TIMESTAMP2:
        secs = int.from_bytes(r.take(4), "big")  # big-endian, unlike v1
        us = _read_frac_micros(r, meta)
        ts = dt.datetime.fromtimestamp(secs, dt.timezone.utc)
        return _iso_dt(ts.year, ts.month, ts.day, ts.hour, ts.minute, ts.second, us)
    if ctype == TYPE_DATETIME2:
        v = int.from_bytes(r.take(5), "big")
        ym = (v >> 22) & 0x1FFFF
        return _iso_dt(ym // 13, ym % 13, (v >> 17) & 0x1F,
                       (v >> 12) & 0x1F, (v >> 6) & 0x3F, v & 0x3F,
                       _read_frac_micros(r, meta))
    if ctype == TYPE_TIME2:
        fb = (meta + 1) // 2
        # int part + fraction form ONE sign-offset big-endian number, so
        # negatives borrow across the fraction correctly
        combined = int.from_bytes(r.take(3 + fb), "big") - (0x800000 << (8 * fb))
        sign, mag = ("-" if combined < 0 else ""), abs(combined)
        frac = mag & ((1 << (8 * fb)) - 1) if fb else 0
        base = mag >> (8 * fb)
        us = frac * 10 ** (6 - 2 * fb) if fb else 0
        out = f"{sign}{(base >> 12) & 0x3FF:02d}:{(base >> 6) & 0x3F:02d}:{base & 0x3F:02d}"
        return f"{out}.{us:06d}" if us else out
    if ctype == TYPE_NEWDECIMAL:
        return _read_newdecimal(r, meta >> 8, meta & 0xFF)
    raise ValueError(f"unsupported binlog column type {ctype} (extend _read_value)")


def _bitmap_bits(bm: bytes, n: int) -> list[bool]:
    return [bool(bm[i // 8] >> (i % 8) & 1) for i in range(n)]


def _read_row(r: _Reader, tm: _TableMap, present: list[bool]) -> dict:
    n_present = sum(present)
    nullbm = _bitmap_bits(r.take((n_present + 7) // 8), n_present)
    vals: dict = {}
    j = 0
    for i, col in enumerate(tm.columns()):
        if not present[i]:
            continue
        if nullbm[j]:
            vals[col] = None
        else:
            vals[col] = _read_value(r, tm.col_types[i], tm.col_meta[i], tm.labels.get(i))
        j += 1
    return vals


class BinlogDecoder:
    """Sequential binlog stream decoder (one replication stream's order).

    feed(payload) yields change dicts in CHANGELOG_SCHEMA shape (string
    checkpoints)."""

    def __init__(self, column_labels: dict[str, dict[int, list[str]]] | None = None):
        # column_labels: qualified table -> column ordinal -> ENUM/SET label
        # list (from the schema catalog; binlog table maps carry no labels)
        self.tables: dict[int, _TableMap] = {}
        # latest raw TABLE_MAP_EVENT payload per table id — the preamble
        # for resumed decode (decode_binlog.table_map_preamble), the exact
        # analogue of pgoutput's relation_messages: a chunk boundary can
        # split a TABLE_MAP from its rows events (mid-transaction), and a
        # fresh decoder would reject those rows as unknown-table-id
        self.table_map_events: dict[int, bytes] = {}
        self.column_labels = column_labels or {}
        self.gtid: str | None = None
        self.txid: int | None = None

    def state(self) -> dict | None:
        """JSON-serializable carry for chunked decode: the open GTID/txid
        (a chunk boundary inside a transaction would otherwise downgrade
        following rows to position checkpoints with NULL txid) — table
        maps travel separately as raw payloads (table_map_events), since
        replaying those through feed() rebuilds the parsed state exactly."""
        if self.gtid is None and self.txid is None:
            return None
        return {"gtid": self.gtid, "txid": self.txid}

    def load_state(self, state: dict | None) -> None:
        if not state:
            return
        self.gtid = state.get("gtid")
        self.txid = state.get("txid")

    def feed(self, payload: bytes):
        """Decode one binlog event. Malformed payloads reject as ValueError
        (low-level escapes from torn reads convert at this boundary)."""
        try:
            # _feed is a generator: drain it HERE so decode errors surface
            # inside this try, not lazily at the caller's iteration
            out = self._feed(payload)
            return list(out) if out is not None else None
        except (struct.error, IndexError, OverflowError, UnicodeDecodeError,
                OSError) as e:
            # OSError: datetime.fromtimestamp on a garbage epoch value
            raise ValueError(
                f"corrupt binlog event ({type(e).__name__})"
            ) from e

    def _feed(self, payload: bytes):
        r = _Reader(payload)
        ts = r.u32()
        etype = r.u8()
        r.u32()  # server id
        r.u32()  # event size
        log_pos = r.u32()
        r.u16()  # flags
        commit_ts = dt.datetime.fromtimestamp(ts, dt.timezone.utc).replace(tzinfo=None)

        if etype == GTID_EVENT:
            r.u8()  # flags
            sid = r.take(16).hex()
            gno = r.u64()
            self.gtid = f"{sid}:{gno:019d}"
            self.txid = gno
            return
        if etype == XID_EVENT:
            self.txid = None
            return
        if etype == TABLE_MAP_EVENT:
            tid = r.u48()
            r.u16()  # flags
            slen = r.u8()
            schema = r.take(slen).decode()
            r.u8()  # NUL
            tlen = r.u8()
            table = r.take(tlen).decode()
            r.u8()  # NUL
            ncols = r.lenenc()
            tm = _TableMap(tid, schema, table)
            tm.col_types = list(r.take(ncols))
            meta_len = r.lenenc()
            meta_r = _Reader(r.take(meta_len))
            for ct in tm.col_types:
                if ct in _META2_LE:
                    tm.col_meta.append(meta_r.u16())
                elif ct in _META2_PACKED:
                    tm.col_meta.append((meta_r.u8() << 8) | meta_r.u8())
                elif ct == TYPE_BIT:
                    # [bits % 8, bits // 8] → (full_bytes << 8) | bits_mod
                    bits_mod, nbytes_full = meta_r.u8(), meta_r.u8()
                    tm.col_meta.append((nbytes_full << 8) | bits_mod)
                elif ct in _META1:
                    tm.col_meta.append(meta_r.u8())
                else:
                    tm.col_meta.append(0)
            tm.labels = self.column_labels.get(tm.qualified, {})
            self.tables[tid] = tm
            self.table_map_events[tid] = bytes(payload)
            return
        if etype not in (WRITE_ROWS_V2, UPDATE_ROWS_V2, DELETE_ROWS_V2):
            return  # FORMAT_DESCRIPTION / QUERY(BEGIN) / ROTATE etc.

        tid = r.u48()
        r.u16()  # flags
        extra = r.u16()
        if extra > 2:
            r.take(extra - 2)
        tm = self.tables.get(tid)
        if tm is None:
            raise ValueError(f"rows event for unknown table id {tid}")
        ncols = r.lenenc()
        present1 = _bitmap_bits(r.take((ncols + 7) // 8), ncols)
        present2 = (
            _bitmap_bits(r.take((ncols + 7) // 8), ncols)
            if etype == UPDATE_ROWS_V2
            else None
        )
        checkpoint = self.gtid if self.gtid else f"pos:{log_pos:012d}"
        n = 0
        while not r.at_end():
            row_start = r.pos
            if etype == WRITE_ROWS_V2:
                kind, old, new = "insert", None, _read_row(r, tm, present1)
            elif etype == DELETE_ROWS_V2:
                kind, old, new = "delete", _read_row(r, tm, present1), None
            else:
                before = _read_row(r, tm, present1)
                after = _read_row(r, tm, present2)
                kind, old, new = "update", before, after
            yield {
                "_kind": kind,
                # multi-row events share a checkpoint prefix; the row ordinal
                # keeps the LWW ordering total within the event
                "_checkpoint_id": f"{checkpoint}#{n:06d}",
                "_commit_ts": commit_ts,
                "_txid": self.txid,
                "_src_table": tm.qualified,
                "_dst_table": tm.qualified,
                "_data": json.dumps(new) if new is not None else None,
                "_old_data": json.dumps(old) if old is not None else None,
                "_unchanged_cols": None,
            }
            n += 1
            if r.pos == row_start:
                # a corrupt event (e.g. lenenc ncols of 0) could parse a
                # "row" that consumes no bytes — without this guard the
                # rows loop never terminates
                raise ValueError("rows event makes no progress (corrupt)")

    def decode_all(self, payloads) -> list[dict]:
        out: list[dict] = []
        for p in payloads:
            out.extend(self.feed(p) or [])
        return out


def decode_binlog(events_df, stream_col: str = "stream", seq_col: str = "seq",
                  payload_col: str = "payload",
                  table_map_preamble: list[bytes] | None = None,
                  decoder_state: dict | None = None):
    """Distributed decode: DataFrame(stream, seq, payload binary) → changelog
    rows with STRING (GTID) checkpoints. Sequential per stream id inside one
    applyInPandas group — the replication stream is the parallelism unit,
    exactly like pgoutput slots.

    Chunked/micro-batch decode carry (r11, the binlog analogue of
    decode_pgoutput's relation_preamble + stream_state):
    `table_map_preamble` replays raw TABLE_MAP_EVENT payloads into each
    group's decoder BEFORE its events — a chunk boundary can split a
    TABLE_MAP from its rows events mid-transaction, and a fresh decoder
    would reject those rows as unknown-table-id; harvest from
    `BinlogDecoder.table_map_events` after any prior decode.
    `decoder_state` maps stream id → `BinlogDecoder.state()` (the open
    GTID/txid), so rows after the boundary keep GTID checkpoints and
    their transaction id instead of degrading to position checkpoints."""
    from pyspark.sql import types as T

    from peerdb_spark.cdc import changelog_schema_with_checkpoint

    out_schema = changelog_schema_with_checkpoint(T.StringType())
    preamble = [bytes(p) for p in (table_map_preamble or [])]
    carry_in = dict(decoder_state or {})

    def _decode(pdf):
        import pandas as pd

        pdf = pdf.sort_values(seq_col)
        dec = BinlogDecoder()
        for p in preamble:
            dec.feed(p)
        if len(pdf):
            dec.load_state(carry_in.get(pdf[stream_col].iloc[0]))
        rows = dec.decode_all(pdf[payload_col])
        cols = [f.name for f in out_schema.fields]
        if not rows:
            return pd.DataFrame({c: pd.Series(dtype="object") for c in cols})
        return pd.DataFrame(rows, columns=cols)

    return (
        events_df.select(stream_col, seq_col, payload_col)
        .groupBy(stream_col)
        .applyInPandas(_decode, schema=out_schema)
    )
