"""MySQL binlog ROW-event decode: binary events → changelog → pipeline.

The encoder writes the public binlog v4 wire format (header + TABLE_MAP +
ROWS_EVENTv2 + GTID/XID), the decoder round-trips it.
"""

import datetime as dt
import json
import struct
import uuid

from pyspark.sql import types as T

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
        if ct == TYPE_VARCHAR:
            meta += struct.pack("<H", m)
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
