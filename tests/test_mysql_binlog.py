"""MySQL binlog ROW-event decode: binary events → changelog → pipeline.

The encoder writes the public binlog v4 wire format (header + TABLE_MAP +
ROWS_EVENTv2 + GTID/XID), the decoder round-trips it.
"""

import datetime as dt
import json
import struct
import uuid

from pyspark.sql import types as T

import peerdb_spark.sources.mysql_binlog as MB
from peerdb_spark.sources.mysql_binlog import (
    DELETE_ROWS_V2,
    GTID_EVENT,
    TABLE_MAP_EVENT,
    TYPE_LONG,
    TYPE_LONGLONG,
    TYPE_VARCHAR,
    UPDATE_ROWS_V2,
    WRITE_ROWS_V2,
    XID_EVENT,
    BinlogDecoder,
    decode_binlog,
)

SID = uuid.UUID("aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee")
TS = int(dt.datetime(2024, 3, 1, 12, 0, 0).replace(tzinfo=dt.timezone.utc).timestamp())


def hdr(etype, body, ts=TS, log_pos=1000):
    return struct.pack("<IBIIIH", ts, etype, 1, 19 + len(body), log_pos, 0) + body


def ev_gtid(gno, log_pos):
    return hdr(GTID_EVENT, struct.pack("<B", 0) + SID.bytes + struct.pack("<Q", gno),
               log_pos=log_pos)


def ev_xid(log_pos):
    return hdr(XID_EVENT, struct.pack("<Q", 99), log_pos=log_pos)


def ev_table_map(tid, schema, table, col_types, col_meta, log_pos):
    b = struct.pack("<IH", tid & 0xFFFFFFFF, tid >> 32) + struct.pack("<H", 0)
    b += bytes([len(schema)]) + schema.encode() + b"\x00"
    b += bytes([len(table)]) + table.encode() + b"\x00"
    b += bytes([len(col_types)]) + bytes(col_types)
    meta = b""
    for ct, m in zip(col_types, col_meta):
        if ct in MB._META2_LE:
            meta += struct.pack("<H", m)
        elif ct in MB._META2_PACKED:
            meta += bytes([m >> 8, m & 0xFF])
        elif ct == MB.TYPE_BIT:
            # wire order [bits % 8, bits // 8]; m packed (full_bytes<<8)|mod
            meta += bytes([m & 0xFF, m >> 8])
        elif ct in MB._META1:
            meta += bytes([m])
    b += bytes([len(meta)]) + meta
    b += bytes((len(col_types) + 7) // 8)  # nullability bitmap (unused)
    return hdr(TABLE_MAP_EVENT, b, log_pos=log_pos)


def _row_bytes(vals, col_types, col_meta, present):
    n_present = sum(present)
    nullbm = bytearray((n_present + 7) // 8)
    data = b""
    j = 0
    for i, p in enumerate(present):
        if not p:
            continue
        v = vals[i]
        if v is None:
            nullbm[j // 8] |= 1 << (j % 8)
        elif col_types[i] == TYPE_LONG:
            data += struct.pack("<i", v)
        elif col_types[i] == TYPE_LONGLONG:
            data += struct.pack("<q", v)
        elif isinstance(v, bytes):
            data += v  # pre-encoded wire value (extended-type tests)
        else:
            raw = v.encode()
            data += (struct.pack("<H", len(raw)) if col_meta[i] > 255
                     else bytes([len(raw)])) + raw
        j += 1
    return bytes(nullbm) + data


def ev_rows(etype, tid, col_types, col_meta, rows, log_pos):
    """rows: list of vals (write/delete) or (before, after) tuples (update)."""
    n = len(col_types)
    b = struct.pack("<IH", tid & 0xFFFFFFFF, tid >> 32) + struct.pack("<H", 0)
    b += struct.pack("<H", 2)  # extra_data_len (v2, no extra)
    b += bytes([n])  # lenenc col count (< 0xFB)
    present = [True] * n
    bm = bytes([0xFF]) * ((n + 7) // 8)  # all columns present
    b += bm
    if etype == UPDATE_ROWS_V2:
        b += bm
        for before, after in rows:
            b += _row_bytes(before, col_types, col_meta, present)
            b += _row_bytes(after, col_types, col_meta, present)
    else:
        for vals in rows:
            b += _row_bytes(vals, col_types, col_meta, present)
    return hdr(etype, b, log_pos=log_pos)


CT = [TYPE_LONGLONG, TYPE_VARCHAR, TYPE_LONG]
CM = [0, 300, 0]  # varchar max_len 300 → 2-byte length prefix


def _stream():
    return [
        ev_table_map(7, "shop", "orders", CT, CM, 100),
        ev_gtid(41, 110),
        ev_rows(WRITE_ROWS_V2, 7, CT, CM, [[1, "new", 10], [2, "new", 20]], 120),
        ev_xid(130),
        ev_gtid(42, 140),
        ev_rows(UPDATE_ROWS_V2, 7, CT, CM, [([1, "new", 10], [1, "paid", None])], 150),
        ev_rows(DELETE_ROWS_V2, 7, CT, CM, [[2, "new", 20]], 160),
        ev_xid(170),
    ]


def test_binlog_decoder_round_trip():
    rows = BinlogDecoder().decode_all(_stream())
    assert [r["_kind"] for r in rows] == ["insert", "insert", "update", "delete"]
    # GTID string checkpoints, zero-padded, row-ordinal suffix keeps order total
    assert rows[0]["_checkpoint_id"] == f"{SID.hex}:{41:019d}#000000"
    assert rows[1]["_checkpoint_id"] == f"{SID.hex}:{41:019d}#000001"
    assert rows[2]["_checkpoint_id"].startswith(f"{SID.hex}:{42:019d}")
    assert rows[0]["_txid"] == 41 and rows[2]["_txid"] == 42
    assert rows[0]["_dst_table"] == "shop.orders"
    assert json.loads(rows[0]["_data"]) == {"c0": 1, "c1": "new", "c2": 10}
    assert json.loads(rows[2]["_data"]) == {"c0": 1, "c1": "paid", "c2": None}
    assert json.loads(rows[2]["_old_data"]) == {"c0": 1, "c1": "new", "c2": 10}
    assert rows[3]["_data"] is None
    assert json.loads(rows[3]["_old_data"]) == {"c0": 2, "c1": "new", "c2": 20}


def test_binlog_chunked_decode_carries_table_maps_and_gtid():
    """r11 (the binlog analogue of the pgoutput v2 cross-batch fix): a
    chunk boundary between a TABLE_MAP and its rows events — or inside a
    transaction, after its GTID — must not lose decoder state. The
    two-chunk decode with `table_map_events` + `state()` carried equals
    the single-pass decode at EVERY split point; without the carry, the
    mid-transaction splits visibly degrade (unknown table id, or
    position-checkpoint / NULL-txid rows)."""
    msgs = _stream()
    single = BinlogDecoder().decode_all(msgs)
    for split in range(1, len(msgs)):
        d1 = BinlogDecoder()
        first = d1.decode_all(msgs[:split])
        d2 = BinlogDecoder()
        for p in d1.table_map_events.values():
            d2.feed(p)
        d2.load_state(json.loads(json.dumps(d1.state())) if d1.state() else None)
        got = first + d2.decode_all(msgs[split:])
        assert [r["_checkpoint_id"] for r in got] == \
            [r["_checkpoint_id"] for r in single], split
        assert [r["_txid"] for r in got] == [r["_txid"] for r in single]
        assert [r["_data"] for r in got] == [r["_data"] for r in single]
    # the damage without the carry: split after the GTID, before the rows
    d3 = BinlogDecoder()
    d3.decode_all(msgs[:2])
    d4 = BinlogDecoder()
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown table id"):
        d4.decode_all(msgs[2:])  # no table-map preamble


def test_decode_binlog_distributed_carry(spark):
    """The same carry through the applyInPandas path: chunk 2 decodes
    with the harvested table-map preamble + per-stream state."""
    from pyspark.sql import Row

    msgs = _stream()
    d1 = BinlogDecoder()
    rows1 = d1.decode_all(msgs[:3])  # ends mid-txn 41 (before XID)
    df2 = spark.createDataFrame(
        [Row(stream="s0", seq=i, payload=bytearray(p))
         for i, p in enumerate(msgs[3:])]
    )
    out2 = decode_binlog(
        df2,
        table_map_preamble=list(d1.table_map_events.values()),
        decoder_state={"s0": d1.state()},
    ).collect()
    single = BinlogDecoder().decode_all(msgs)
    got = sorted(((r["_checkpoint_id"], r["_txid"], r["_data"])
                  for r in out2), key=lambda t: t[0])
    want = sorted(((r["_checkpoint_id"], r["_txid"], r["_data"])
                   for r in single[len(rows1):]), key=lambda t: t[0])
    assert got == want


def test_binlog_extended_types_round_trip():
    """Widened column-type surface, wire bytes hand-encoded from the
    documented format (not via a shared encoder) so the decoder is checked
    against the spec, not against itself."""
    import base64

    ct = [
        MB.TYPE_TINY, MB.TYPE_SHORT, MB.TYPE_INT24, MB.TYPE_FLOAT,
        MB.TYPE_DOUBLE, MB.TYPE_YEAR, MB.TYPE_DATE, MB.TYPE_TIME,
        MB.TYPE_DATETIME, MB.TYPE_TIMESTAMP2, MB.TYPE_DATETIME2,
        MB.TYPE_TIME2, MB.TYPE_TIME2, MB.TYPE_NEWDECIMAL, MB.TYPE_BLOB,
        MB.TYPE_BLOB, MB.TYPE_STRING, MB.TYPE_VAR_STRING,
    ]
    cm = [0, 0, 0, 4, 8, 0, 0, 0, 0, 0, 6, 2, 0,
          (10 << 8) | 2, 1, 1, (MB.TYPE_STRING << 8) | 10, 300]

    # hand-packed wire values
    dt2 = ((1 << 39) | ((2024 * 13 + 3) << 22) | (5 << 17) | (13 << 12)
           | (2 << 6) | 3).to_bytes(5, "big") + (250000).to_bytes(3, "big")
    t2_pos = ((((0x800000 | (1 << 12) | (2 << 6) | 3)) << 8) | 45).to_bytes(4, "big")
    t2_neg = (0x800000 - 1).to_bytes(3, "big")
    mag = (123456).to_bytes(4, "big") + bytes([78])
    dec_neg = bytes((~b) & 0xFF for b in bytes([mag[0] ^ 0x80]) + mag[1:])
    junk = b"\xff\xfe\x00"
    vals = [
        struct.pack("<b", -5), struct.pack("<h", -300),
        (-70000).to_bytes(3, "little", signed=True), struct.pack("<f", 1.5),
        struct.pack("<d", -2.25), bytes([124]),
        (5 | (3 << 5) | (2024 << 9)).to_bytes(3, "little"),
        (130203).to_bytes(3, "little", signed=True),
        struct.pack("<Q", 20240305130203), TS.to_bytes(4, "big"), dt2,
        t2_pos, t2_neg, dec_neg,
        bytes([6]) + "héllo".encode(), bytes([len(junk)]) + junk,
        bytes([3]) + b"abc", struct.pack("<H", 2) + b"vs",
    ]
    stream = [
        ev_table_map(9, "shop", "wide", ct, cm, 100),
        ev_gtid(50, 110),
        ev_rows(WRITE_ROWS_V2, 9, ct, cm, [vals], 120),
        ev_xid(130),
    ]
    rows = BinlogDecoder().decode_all(stream)
    assert len(rows) == 1
    got = json.loads(rows[0]["_data"])
    assert got == {
        "c0": -5, "c1": -300, "c2": -70000, "c3": 1.5, "c4": -2.25,
        "c5": 2024, "c6": "2024-03-05", "c7": "13:02:03",
        "c8": "2024-03-05 13:02:03", "c9": "2024-03-01 12:00:00",
        "c10": "2024-03-05 13:02:03.250000", "c11": "01:02:03.450000",
        "c12": "-00:00:01", "c13": "-123456.78", "c14": "héllo",
        "c15": "base64:" + base64.b64encode(junk).decode(), "c16": "abc",
        "c17": "vs",
    }


def test_binlog_to_pipeline_with_renames(spark, tmp_path):
    """Binlog positional columns (c0..cN) → renamed destination columns via
    CdcTableConfig.renames, merged end-to-end on GTID string offsets."""
    from peerdb_spark import cdc as C
    from peerdb_spark.storage import ParquetTable

    msgs = [("s0", i, bytes(p)) for i, p in enumerate(_stream())]
    df = spark.createDataFrame(
        msgs, T.StructType([
            T.StructField("stream", T.StringType()),
            T.StructField("seq", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    changelog = decode_binlog(df)
    assert changelog.count() == 4

    val_schema = T.StructType([
        T.StructField("c0", T.LongType()),
        T.StructField("c1", T.StringType()),
        T.StructField("c2", T.LongType()),
    ])
    dest = str(tmp_path / "orders")
    pipe = C.CdcPipeline(spark, str(tmp_path / "raw"), [
        C.CdcTableConfig(
            "shop.orders", ["id"], val_schema, dest, n_buckets=2,
            renames={"c0": "id", "c1": "status", "c2": "amount"},
        ),
    ])
    pipe.sync_batch(changelog, 0)
    pipe.normalize_batches(0, 0)
    state = {r["id"]: r.asDict() for r in ParquetTable(spark, dest, ["id"], 2).read().collect()}
    assert set(state) == {1}
    assert state[1]["status"] == "paid" and state[1]["amount"] is None


def _enc_newdecimal(neg: bool, int_val: int, frac_digits: str, precision: int, scale: int) -> bytes:
    """Test-side packed-decimal encoder (documented format, written
    independently of the decoder): leftover group first, 9-digit groups,
    big-endian; positive → first byte XOR 0x80; negative → bit-invert."""
    D2B = [0, 1, 1, 2, 2, 3, 3, 4, 4, 4]
    intg = precision - scale
    intg0, intgx = divmod(intg, 9)
    frac0, fracx = divmod(scale, 9)
    int_str = f"{int_val:0{intg}d}" if intg else ""
    out = b""
    pos = 0
    if intgx:
        out += int(int_str[:intgx] or "0").to_bytes(D2B[intgx], "big")
        pos = intgx
    for _ in range(intg0):
        out += int(int_str[pos:pos + 9] or "0").to_bytes(4, "big")
        pos += 9
    pos = 0
    for _ in range(frac0):
        out += int(frac_digits[pos:pos + 9]).to_bytes(4, "big")
        pos += 9
    if fracx:
        out += int(frac_digits[pos:pos + fracx]).to_bytes(D2B[fracx], "big")
    stored = bytes([out[0] ^ 0x80]) + out[1:]
    return bytes((~b) & 0xFF for b in stored) if neg else stored


def test_newdecimal_property():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from peerdb_spark.sources.mysql_binlog import _Reader, _read_newdecimal

    @settings(max_examples=300, deadline=None)
    @given(st.integers(1, 38), st.data())
    def prop(precision, data):
        scale = data.draw(st.integers(0, min(precision, 30)))
        v = data.draw(st.integers(0, 10**precision - 1))
        neg = data.draw(st.booleans()) and v != 0
        int_val, frac_val = divmod(v, 10**scale)
        frac_digits = f"{frac_val:0{scale}d}" if scale else ""
        buf = _enc_newdecimal(neg, int_val, frac_digits, precision, scale)
        got = _read_newdecimal(_Reader(buf), precision, scale)
        want = str(int_val) + (f".{frac_digits}" if scale else "")
        if neg:
            want = "-" + want
        assert got == want, (precision, scale, v, neg)

    prop()


def _jb_doc_object() -> bytes:
    """Hand-packed MySQL binary JSON for {"a": 1, "b": "hi", "c": [true, null, 3.5]}
    (WL#8132 small-object layout: count/size words, key entries, value
    entries with inlined int16/literals, offset-addressed string and array)."""
    obj = b""
    obj += struct.pack("<HH", 3, 52)              # count, total size
    obj += struct.pack("<HH", 25, 1)              # key "a" @25
    obj += struct.pack("<HH", 26, 1)              # key "b" @26
    obj += struct.pack("<HH", 27, 1)              # key "c" @27
    obj += bytes([0x05]) + struct.pack("<H", 1)   # a: inlined int16 = 1
    obj += bytes([0x0C]) + struct.pack("<H", 28)  # b: string @28
    obj += bytes([0x02]) + struct.pack("<H", 31)  # c: small array @31
    obj += b"abc"                                 # key bytes
    obj += bytes([2]) + b"hi"                     # varint len + "hi"
    arr = struct.pack("<HH", 3, 21)
    arr += bytes([0x04, 1, 0])                    # true (inlined literal)
    arr += bytes([0x04, 0, 0])                    # null (inlined literal)
    arr += bytes([0x0B]) + struct.pack("<H", 13)  # double @13 (rel. to array)
    arr += struct.pack("<d", 3.5)
    obj += arr
    return b"\x00" + obj                          # doc: type byte + payload


def test_binlog_enum_set_bit_json_geometry_round_trip():
    """ENUM/SET (STRING-packed real types), BIT, binary JSON, GEOMETRY —
    the exotic column decoders of flow/connectors/mysql/qvalue_convert.go:82-93."""
    ct = [MB.TYPE_STRING, MB.TYPE_STRING, MB.TYPE_BIT, MB.TYPE_JSON, MB.TYPE_GEOMETRY]
    cm = [
        (MB.TYPE_ENUM << 8) | 1,   # ENUM, 1-byte index
        (MB.TYPE_SET << 8) | 1,    # SET, 1-byte bitmask
        (1 << 8) | 2,              # BIT(10): 1 full byte + 2 bits
        4,                         # JSON: 4 length bytes
        4,                         # GEOMETRY: 4 length bytes
    ]
    doc = _jb_doc_object()
    geom = struct.pack("<I", 4326) + b"\x01\x02\x03"
    wire = [
        bytes([2]),                              # ENUM index 2
        bytes([0b101]),                          # SET bits 0+2
        (0b10_00000001).to_bytes(2, "big"),      # BIT(10) big-endian = 513
        struct.pack("<I", len(doc)) + doc,
        struct.pack("<I", len(geom)) + geom,
    ]
    stream = [
        ev_table_map(9, "shop", "t2", ct, cm, 100),
        ev_rows(WRITE_ROWS_V2, 9, ct, cm, [wire], 120),
    ]
    # without labels: raw index / bitmask ints
    rows = BinlogDecoder().decode_all(stream)
    v = json.loads(rows[0]["_data"])
    assert v["c0"] == 2 and v["c1"] == 0b101
    assert v["c2"] == 513
    assert json.loads(v["c3"]) == {"a": 1, "b": "hi", "c": [True, None, 3.5]}
    assert v["c4"] == "SRID=4326;010203"
    # with schema-catalog labels: ENUM label / comma-joined SET members
    dec = BinlogDecoder(
        column_labels={"shop.t2": {0: ["red", "green", "blue"], 1: ["x", "y", "z"]}}
    )
    v2 = json.loads(dec.decode_all(stream)[0]["_data"])
    assert v2["c0"] == "green"
    assert v2["c1"] == "x,z"


def test_binlog_json_scalars_and_opaque_decimal():
    """Binary-JSON scalar roots: int64, double, string, literal, and the
    opaque NEWDECIMAL carrier."""
    ct = [MB.TYPE_JSON]
    cm = [4]

    def enc(doc: bytes) -> list[bytes]:
        return [struct.pack("<I", len(doc)) + doc]

    def decode_one(doc: bytes):
        stream = [
            ev_table_map(5, "d", "j", ct, cm, 10),
            ev_rows(WRITE_ROWS_V2, 5, ct, cm, [enc(doc)], 20),
        ]
        return json.loads(json.loads(BinlogDecoder().decode_all(stream)[0]["_data"])["c0"])

    assert decode_one(b"\x09" + struct.pack("<q", -(2**40))) == -(2**40)
    assert decode_one(b"\x0b" + struct.pack("<d", 2.25)) == 2.25
    assert decode_one(b"\x0c" + bytes([5]) + b"hello") == "hello"
    assert decode_one(b"\x04\x02") is False
    # opaque decimal: field type + varint len + precision/scale + packed body
    # (-12.345 at precision 7 scale 3: 2 int bytes + 2 frac bytes, sign bit
    # flipped then all bytes inverted — same hand-packing as the
    # extended-types test)
    mag = (12).to_bytes(2, "big") + (345).to_bytes(2, "big")
    body = bytes((~b) & 0xFF for b in bytes([mag[0] ^ 0x80]) + mag[1:])
    doc = b"\x0f" + bytes([MB.TYPE_NEWDECIMAL]) + bytes([2 + len(body)]) + bytes([7, 3]) + body
    assert decode_one(doc) == "-12.345"


# ---------------------------------------------------------------------------
# property test: binary JSON decoder vs an independent reference packer
# (r4 verdict item #8 — same rigor as the NEWDECIMAL / pgoutput paths)
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_INLINE_SMALL = {0x04, 0x05, 0x06}
_INLINE_LARGE = {0x04, 0x05, 0x06, 0x07, 0x08}


def _enc_varint(n: int) -> bytes:
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _jb_ser(v, large: bool):
    """Reference MySQL binary-JSON serializer (WL#8132 layout), written
    independently of the decoder: returns (type, standalone_bytes,
    inline_bytes_or_None)."""
    if v is None:
        return 0x04, b"\x00", b"\x00"
    if v is True:
        return 0x04, b"\x01", b"\x01"
    if v is False:
        return 0x04, b"\x02", b"\x02"
    if isinstance(v, int):
        for t, size, signed in (
            (0x05, 2, True), (0x06, 2, False), (0x07, 4, True),
            (0x08, 4, False), (0x09, 8, True), (0x0A, 8, False),
        ):
            try:
                b = v.to_bytes(size, "little", signed=signed)
            except OverflowError:
                continue
            return t, b, b
        raise ValueError(f"int out of uint64 range: {v}")
    if isinstance(v, float):
        return 0x0B, struct.pack("<d", v), None
    if isinstance(v, str):
        b = v.encode("utf-8")
        return 0x0C, _enc_varint(len(b)) + b, None
    is_obj = isinstance(v, dict)
    t = (0x01 if large else 0x00) if is_obj else (0x03 if large else 0x02)
    w = 4 if large else 2
    inline_set = _INLINE_LARGE if large else _INLINE_SMALL
    items = list(v.items()) if is_obj else [(None, x) for x in v]
    count = len(items)
    entries = []
    for _, x in items:
        ct, sb, ib = _jb_ser(x, large)
        entries.append((ct, sb, ib if ct in inline_set else None))
    keys = [k.encode("utf-8") for k, _ in items] if is_obj else []
    header_len = 2 * w + (count * (w + 2) if is_obj else 0) + count * (1 + w)
    key_offsets = []
    off = header_len
    for kb in keys:
        key_offsets.append(off)
        off += len(kb)
    val_base = off
    blob = bytearray()
    val_offsets = []
    for ct, sb, ib in entries:
        if ib is None:
            val_offsets.append(val_base + len(blob))
            blob.extend(sb)
        else:
            val_offsets.append(None)
    total = val_base + len(blob)
    out = bytearray()
    out += count.to_bytes(w, "little") + total.to_bytes(w, "little")
    for kb, ko in zip(keys, key_offsets):
        out += ko.to_bytes(w, "little") + len(kb).to_bytes(2, "little")
    for (ct, sb, ib), vo in zip(entries, val_offsets):
        out.append(ct)
        out += ib.ljust(w, b"\x00") if ib is not None else vo.to_bytes(w, "little")
    out += b"".join(keys) + blob
    return t, bytes(out), None


_json_vals = st.recursive(
    st.none()
    | st.booleans()
    | st.integers(min_value=-(2**63), max_value=2**64 - 1)
    | st.floats(allow_nan=False, allow_infinity=False)
    | st.text(max_size=12),
    lambda c: st.lists(c, max_size=4)
    | st.dictionaries(st.text(max_size=8), c, max_size=4),
    max_leaves=12,
)


@settings(max_examples=150, deadline=None)
@given(doc=_json_vals, large=st.booleans())
def test_json_binary_roundtrip_property(doc, large):
    t, body, _ = _jb_ser(doc, large)
    payload = bytes([t]) + body
    text = MB._json_binary_to_text(payload)
    assert json.loads(text) == json.loads(json.dumps(doc))


def test_json_binary_nested_mixed_containers():
    doc = {
        "a": [1, -40000, 70000, 2**40, {"deep": [None, True, False, "x"]}],
        "": {"empty-key": []},
        "f": 1.5,
        "u16": 65535,
        "u64": 2**63 + 7,
        "üñí": "çödé",
    }
    for large in (False, True):
        t, body, _ = _jb_ser(doc, large)
        got = json.loads(MB._json_binary_to_text(bytes([t]) + body))
        assert got == json.loads(json.dumps(doc))


def test_json_binary_empty_payload_is_null():
    assert MB._json_binary_to_text(b"") is None
