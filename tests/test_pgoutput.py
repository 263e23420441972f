"""pgoutput wire decode: binary WAL messages → changelog → CDC pipeline.

The encoder below writes the public pgoutput v1 wire format (the same
grammar pglogrepl parses for the reference's cdc.go); the decoder must
round-trip it, including TOAST 'u' columns, old-tuple row images, and
relation-schema changes mid-stream.
"""

import datetime as dt
import json
import struct

from pyspark.sql import types as T

from peerdb_spark.sources.pgoutput import PgOutputDecoder, decode_pgoutput

PG_EPOCH = dt.datetime(2000, 1, 1)


def enc_begin(xid, ts, final_lsn=0):
    us = int((ts - PG_EPOCH).total_seconds() * 1_000_000)
    return b"B" + struct.pack(">Qq I".replace(" ", ""), final_lsn, us, xid)


def enc_commit(ts, lsn=0):
    us = int((ts - PG_EPOCH).total_seconds() * 1_000_000)
    return b"C" + struct.pack(">BQQq", 0, lsn, lsn, us)


def enc_relation(oid, ns, name, cols, key_cols=(), col_types=None):
    """col_types: optional {col: (type_oid, typmod)}; defaults to text."""
    b = b"R" + struct.pack(">I", oid) + ns.encode() + b"\x00" + name.encode() + b"\x00"
    b += struct.pack(">BH", ord("d"), len(cols))
    for c in cols:
        toid, tmod = (col_types or {}).get(c, (25, -1))
        b += struct.pack(">B", 1 if c in key_cols else 0) + c.encode() + b"\x00"
        b += struct.pack(">Ii", toid, tmod)
    return b


def enc_tuple(vals):
    """vals: list of None | ('u',) | str | bytes."""
    b = struct.pack(">H", len(vals))
    for v in vals:
        if v is None:
            b += b"n"
        elif v == ("u",):
            b += b"u"
        elif isinstance(v, bytes):
            b += b"b" + struct.pack(">I", len(v)) + v
        else:
            raw = v.encode()
            b += b"t" + struct.pack(">I", len(raw)) + raw
    return b


def enc_insert(oid, vals):
    return b"I" + struct.pack(">I", oid) + b"N" + enc_tuple(vals)


def enc_update(oid, new_vals, old_vals=None, old_kind=b"O"):
    b = b"U" + struct.pack(">I", oid)
    if old_vals is not None:
        b += old_kind + enc_tuple(old_vals)
    return b + b"N" + enc_tuple(new_vals)


def enc_delete(oid, old_vals, old_kind=b"K"):
    return b"D" + struct.pack(">I", oid) + old_kind + enc_tuple(old_vals)


TS1 = dt.datetime(2024, 3, 1, 12, 0, 0)
TS2 = dt.datetime(2024, 3, 1, 12, 0, 5)


def _stream():
    """(lsn, payload) WAL stream: two txns over one table."""
    return [
        (10, enc_relation(500, "public", "items", ["id", "v", "blob"], key_cols=("id",))),
        (11, enc_begin(700, TS1)),
        (12, enc_insert(500, ["1", "one", b"\x01\xff"])),
        (13, enc_insert(500, ["2", "two", None])),
        (14, enc_commit(TS1)),
        (15, enc_begin(701, TS2)),
        # TOAST: blob unchanged; old row image supplied ('O')
        (16, enc_update(500, ["1", "ONE", ("u",)], old_vals=["1", "one", None])),
        (17, enc_delete(500, ["2", None, None])),
        (18, enc_commit(TS2)),
    ]


def test_decoder_round_trip():
    dec = PgOutputDecoder()
    rows = dec.decode_all(_stream())
    assert [r["_kind"] for r in rows] == ["insert", "insert", "update", "delete"]
    assert [r["_checkpoint_id"] for r in rows] == [12, 13, 16, 17]
    assert rows[0]["_txid"] == 700 and rows[2]["_txid"] == 701
    assert rows[0]["_commit_ts"] == TS1 and rows[3]["_commit_ts"] == TS2
    assert rows[0]["_dst_table"] == "public.items"
    assert json.loads(rows[0]["_data"]) == {"id": "1", "v": "one", "blob": "01ff"}
    assert json.loads(rows[1]["_data"]) == {"id": "2", "v": "two", "blob": None}
    # TOAST-unchanged column is absent from the row image + flagged
    assert json.loads(rows[2]["_data"]) == {"id": "1", "v": "ONE"}
    assert rows[2]["_unchanged_cols"] == ["blob"]
    assert json.loads(rows[2]["_old_data"]) == {"id": "1", "v": "one", "blob": None}
    # delete carries the old row image (reference: deletes read match_data)
    assert json.loads(rows[3]["_old_data"]) == {"id": "2", "v": None, "blob": None}
    assert rows[3]["_data"] is None


def test_decoder_relation_change_mid_stream():
    dec = PgOutputDecoder()
    rows = dec.decode_all([
        (1, enc_relation(9, "", "t", ["id", "a"])),
        (2, enc_begin(1, TS1)),
        (3, enc_insert(9, ["1", "x"])),
        # ALTER TABLE ADD COLUMN → new Relation message mid-stream
        (4, enc_relation(9, "", "t", ["id", "a", "b"])),
        (5, enc_insert(9, ["2", "y", "z"])),
        (6, enc_commit(TS1)),
    ])
    assert json.loads(rows[0]["_data"]) == {"id": "1", "a": "x"}
    assert json.loads(rows[1]["_data"]) == {"id": "2", "a": "y", "b": "z"}


def test_decode_pgoutput_spark_and_pipeline(spark, tmp_path):
    """Distributed decode (per-slot sequential) feeding the real CDC
    pipeline: binary WAL bytes end as normalized destination rows."""
    from peerdb_spark import cdc as C
    from peerdb_spark.storage import ParquetTable

    msgs = [("slot0", lsn, bytes(payload)) for lsn, payload in _stream()]
    df = spark.createDataFrame(
        msgs, T.StructType([
            T.StructField("slot", T.StringType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]),
    )
    changelog = decode_pgoutput(df)
    assert changelog.count() == 4

    dest = str(tmp_path / "items")
    val_schema = T.StructType([
        T.StructField("id", T.StringType()),
        T.StructField("v", T.StringType()),
        T.StructField("blob", T.StringType()),
    ])
    pipe = C.CdcPipeline(spark, str(tmp_path / "raw"), [
        C.CdcTableConfig("public.items", ["id"], val_schema, dest, n_buckets=2),
    ])
    # batch per transaction (TOAST backfill reads the destination, so the
    # insert must be normalized before the unchanged-column update arrives)
    from pyspark.sql import functions as F

    pipe.sync_batch(changelog.where(F.col("_txid") == 700), 0)
    pipe.normalize_batches(0, 0)
    pipe.sync_batch(changelog.where(F.col("_txid") == 701), 1)
    pipe.normalize_batches(1, 1)
    state = {r["id"]: r.asDict() for r in ParquetTable(spark, dest, ["id"], 2).read().collect()}
    assert set(state) == {"1"}  # id=2 deleted
    assert state["1"]["v"] == "ONE"
    # TOAST backfill: unchanged blob keeps the pre-update value
    assert state["1"]["blob"] == "01ff"


# ---------------------------------------------------------------------------
# Property test: random WAL sequences round-trip through the decoder
# ---------------------------------------------------------------------------

def test_decoder_property_random_wal_sequences():
    """Hypothesis: arbitrary I/U/D sequences with random null / TOAST-'u' /
    text / binary column values and optional old-tuple images decode to
    changelog rows satisfying the invariants (same approach as the MySQL
    NEWDECIMAL property tests): one row per change, WAL order preserved,
    txn stamps from the enclosing Begin, row-image JSON matching an
    independently-computed expectation, 'u' columns absent from _data and
    listed in _unchanged_cols in relation column order."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    # a column value on the wire: NULL | unchanged-TOAST | utf-8 text | bytes
    val = st.one_of(
        st.none(),
        st.just(("u",)),
        st.text(max_size=8),
        st.binary(min_size=1, max_size=6),
    )

    def change(ncols):
        new_vals = st.lists(val, min_size=ncols, max_size=ncols)
        # old images never carry 'u' (they are full replica-identity images)
        old_val = st.one_of(st.none(), st.text(max_size=8), st.binary(min_size=1, max_size=6))
        old_vals = st.lists(old_val, min_size=ncols, max_size=ncols)
        return st.one_of(
            st.tuples(st.just("insert"), new_vals, st.none()),
            st.tuples(st.just("update"), new_vals, st.one_of(st.none(), old_vals)),
            st.tuples(st.just("delete"), old_vals, st.none()),
        )

    @st.composite
    def wal(draw):
        ncols = draw(st.integers(min_value=1, max_value=4))
        txns = draw(
            st.lists(
                st.lists(change(ncols), min_size=1, max_size=4),
                min_size=1,
                max_size=3,
            )
        )
        return ncols, txns

    def expect_json(vals, cols):
        d = {}
        for v, c in zip(vals, cols):
            if v == ("u",):
                continue
            d[c] = v.hex() if isinstance(v, bytes) else v
        return d

    @given(wal())
    @settings(max_examples=60, deadline=None)
    def run(case):
        ncols, txns = case
        cols = [f"c{i}" for i in range(ncols)]
        msgs = [(1, enc_relation(42, "s", "t", cols, key_cols=(cols[0],)))]
        lsn = 2
        expected = []
        for ti, changes in enumerate(txns):
            xid = 100 + ti
            ts = TS1 + dt.timedelta(seconds=ti)
            msgs.append((lsn, enc_begin(xid, ts)))
            lsn += 1
            for kind, vals, old in changes:
                # deletes must not carry 'u' markers (full old image)
                if kind == "delete":
                    vals = [None if v == ("u",) else v for v in vals]
                if kind == "insert":
                    msgs.append((lsn, enc_insert(42, vals)))
                elif kind == "update":
                    msgs.append((lsn, enc_update(42, vals, old_vals=old)))
                else:
                    msgs.append((lsn, enc_delete(42, vals, old_kind=b"O")))
                expected.append(
                    {
                        "kind": kind,
                        "lsn": lsn,
                        "xid": xid,
                        "ts": ts,
                        "data": None if kind == "delete" else expect_json(vals, cols),
                        "old": expect_json(vals, cols)
                        if kind == "delete"
                        else (expect_json(old, cols) if old is not None else None),
                        "unchanged": None
                        if kind == "delete"
                        else [c for v, c in zip(vals, cols) if v == ("u",)],
                    }
                )
                lsn += 1
            msgs.append((lsn, enc_commit(ts)))
            lsn += 1

        rows = PgOutputDecoder().decode_all(msgs)
        assert len(rows) == len(expected)
        for r, e in zip(rows, expected):
            assert r["_kind"] == e["kind"]
            assert r["_checkpoint_id"] == e["lsn"]
            assert r["_txid"] == e["xid"]
            assert r["_commit_ts"] == e["ts"]
            assert r["_src_table"] == "s.t"
            got_data = None if r["_data"] is None else json.loads(r["_data"])
            assert got_data == e["data"]
            got_old = None if r["_old_data"] is None else json.loads(r["_old_data"])
            assert got_old == e["old"]
            assert r["_unchanged_cols"] == e["unchanged"]

    run()


def test_relation_type_oids_to_value_schema():
    """Typed value schemas derived from the WIRE: Relation type OIDs map to
    Spark types like the reference's PostgresOIDToQValueKind
    (flow/connectors/postgres/type_conversion.go:13-90), numeric typmods
    parse to exact decimal(p,s) (flow/pkg/common/numeric.go)."""
    from pyspark.sql import types as T

    from peerdb_spark.sources.pgoutput import pg_oid_to_spark_ddl

    # numeric typmod: ((p<<16)|s)+4
    num_mod = ((12 << 16) | 5) + 4
    cols = ["id", "flag", "qty", "price", "note", "raw", "d", "ts", "tstz", "mystery"]
    types = {
        "id": (20, -1),        # int8
        "flag": (16, -1),      # bool
        "qty": (23, -1),       # int4
        "price": (1700, num_mod),
        "note": (1043, 64),    # varchar(60)
        "raw": (17, -1),       # bytea
        "d": (1082, -1),       # date
        "ts": (1114, -1),      # timestamp
        "tstz": (1184, -1),    # timestamptz
        "mystery": (999999, -1),  # unknown oid → string fallback
    }
    dec = PgOutputDecoder()
    dec.decode_all([(1, enc_relation(7, "public", "typed", cols,
                                     key_cols=("id",), col_types=types))])
    schema = dec.value_schema("public.typed")
    got = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert got == {
        "id": "bigint", "flag": "boolean", "qty": "int",
        "price": "decimal(12,5)", "note": "string", "raw": "binary",
        "d": "date", "ts": "timestamp_ntz", "tstz": "timestamp",
        "mystery": "string",
    }
    assert dec.key_columns("public.typed") == ["id"]
    # numeric with no typmod → the reference's (38,20) default
    assert pg_oid_to_spark_ddl(1700, -1) == "decimal(38,20)"
    assert dec.value_schema("public.nope") is None


# ---------------------------------------------------------------------------
# logical-decoding messages ('M') and truncate ('T')
# ---------------------------------------------------------------------------


def enc_message(prefix, content, lsn=0, transactional=True):
    return (b"M" + struct.pack(">BQ", 1 if transactional else 0, lsn)
            + prefix.encode() + b"\x00"
            + struct.pack(">I", len(content)) + content)


def enc_truncate(oids, options=0):
    return (b"T" + struct.pack(">IB", len(oids), options)
            + b"".join(struct.pack(">I", o) for o in oids))


def test_message_record_transactional():
    d = PgOutputDecoder()
    ts = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows = d.decode_all([
        (10, enc_begin(77, ts)),
        (11, enc_message("audit", b'{"op":"mark"}', lsn=11)),
        (12, enc_commit(ts)),
    ])
    assert len(rows) == 1
    r = rows[0]
    assert r["_kind"] == "message"
    assert r["_txid"] == 77 and r["_commit_ts"] == ts
    assert r["_checkpoint_id"] == 11
    body = json.loads(r["_data"])
    assert body == {"prefix": "audit", "content": '{"op":"mark"}',
                    "encoding": "utf8"}


def test_message_record_non_transactional_and_binary():
    d = PgOutputDecoder()
    # outside any txn; content is not valid utf-8 → hex transport
    rows = d.decode_all([(5, enc_message("blob", b"\xff\xfe\x00", lsn=99,
                                         transactional=False))])
    assert len(rows) == 1
    r = rows[0]
    assert r["_txid"] is None and r["_commit_ts"] is None
    assert r["_checkpoint_id"] == 99
    body = json.loads(r["_data"])
    assert body == {"prefix": "blob", "content": "fffe00", "encoding": "hex"}


def test_truncate_parsed_and_skipped():
    d = PgOutputDecoder()
    ts = dt.datetime(2024, 5, 1)
    rows = d.decode_all([
        (1, enc_begin(9, ts)),
        (2, enc_relation(42, "public", "t", ["a"], key_cols=("a",))),
        (3, enc_truncate([42, 43], options=2)),
        (4, enc_insert(42, ["1"])),
        (5, enc_commit(ts)),
    ])
    # truncate contributes no record; the stream continues decoding after it
    assert [r["_kind"] for r in rows] == ["insert"]


def test_message_maps_to_kind_code_4(spark):
    from peerdb_spark.cdc import changelog_to_raw, CHANGELOG_SCHEMA
    d = PgOutputDecoder()
    ts = dt.datetime(2024, 5, 1)
    rows = d.decode_all([
        (1, enc_begin(9, ts)),
        (2, enc_message("p", b"x", lsn=2)),
        (3, enc_commit(ts)),
    ])
    df = spark.createDataFrame(rows, schema=CHANGELOG_SCHEMA)
    raw = changelog_to_raw(df, batch_id=0).collect()
    assert raw[0]["_peerdb_record_type"] == 4


def test_partitioned_table_children_attribute_to_parent():
    """Deep-dive §1.6 (cdc.go childToParentRelIDMapping): leaf partitions
    stream under their own relation oids; the child→parent mapping
    attributes their events to the parent destination — including children
    whose column ORDER differs (row JSON is keyed by name)."""
    from peerdb_spark.sources.pgoutput import PgOutputDecoder

    dec = PgOutputDecoder(
        child_to_parent={
            "public.orders_2024_01": "public.orders",
            "public.orders_2024_02": "public.orders",
        }
    )
    msgs = [
        enc_begin(7, PG_EPOCH),
        enc_relation(101, "public", "orders_2024_01", ["id", "amt"], ("id",)),
        # second child declares columns in a DIFFERENT order
        enc_relation(102, "public", "orders_2024_02", ["amt", "id"], ("id",)),
        enc_relation(103, "public", "standalone", ["id"], ("id",)),
        enc_insert(101, ["1", "10"]),
        enc_insert(102, ["20", "2"]),   # amt=20, id=2
        enc_insert(103, ["3"]),
        enc_commit(PG_EPOCH),
    ]
    rows = dec.decode_all((i, m) for i, m in enumerate(msgs))
    assert [r["_dst_table"] for r in rows] == [
        "public.orders", "public.orders", "public.standalone"
    ]
    # provenance keeps the leaf
    assert [r["_src_table"] for r in rows] == [
        "public.orders_2024_01", "public.orders_2024_02", "public.standalone"
    ]
    import json

    assert json.loads(rows[0]["_data"]) == {"id": "1", "amt": "10"}
    assert json.loads(rows[1]["_data"]) == {"amt": "20", "id": "2"}


def test_partitioned_mapping_through_distributed_decode(spark):
    """The same mapping flows through the applyInPandas decode path."""
    from pyspark.sql import Row

    from peerdb_spark.sources.pgoutput import decode_pgoutput

    msgs = [
        enc_begin(9, PG_EPOCH),
        enc_relation(201, "public", "ev_p0", ["id"], ("id",)),
        enc_insert(201, ["5"]),
        enc_commit(PG_EPOCH),
    ]
    df = spark.createDataFrame(
        [Row(slot="s", lsn=i, payload=bytearray(m)) for i, m in enumerate(msgs)]
    )
    out = decode_pgoutput(
        df, child_to_parent={"public.ev_p0": "public.ev"}
    ).collect()
    assert [r["_dst_table"] for r in out if r["_kind"] == "insert"] == ["public.ev"]


# -- protocol v2: streamed in-progress transactions (round 10) ---------------


import pytest  # noqa: E402


def enc_stream_start(xid, first=1):
    return b"S" + struct.pack(">IB", xid, first)


def enc_stream_stop():
    return b"E"


def enc_stream_commit(xid, ts_us):
    return b"c" + struct.pack(">IBQQq", xid, 0, 100, 200, ts_us)


def enc_stream_abort(xid, subxid):
    return b"A" + struct.pack(">II", xid, subxid)


def v2(msg, xid):
    # v2 prefixes R/I/U/D/T/M inside a streamed segment with the xid
    return msg[:1] + struct.pack(">I", xid) + msg[1:]


def test_v2_streamed_transaction_commit_and_interleave():
    """Protocol v2 (BEYOND the reference, which pins proto_version '1' —
    postgres_source.go:237): two in-progress transactions stream
    interleaved segments; nothing emits until each StreamCommit, which
    stamps the buffered rows with ITS commit timestamp in arrival order;
    an aborted stream vanishes."""
    dec = PgOutputDecoder()
    dec.replay(enc_relation(77, "public", "t", ["id", "v"]))
    out = []
    out += dec.feed(10, enc_stream_start(500)) or []
    out += dec.feed(11, v2(enc_insert(77, ["1", "a"]), 500)) or []
    out += dec.feed(12, enc_stream_stop()) or []
    out += dec.feed(13, enc_stream_start(600)) or []
    out += dec.feed(14, v2(enc_insert(77, ["9", "z"]), 600)) or []
    out += dec.feed(15, enc_stream_stop()) or []
    assert out == []  # nothing before commit
    out += dec.feed(16, enc_stream_start(500, first=0)) or []
    out += dec.feed(17, v2(enc_insert(77, ["2", "b"]), 500)) or []
    out += dec.feed(18, enc_stream_stop()) or []
    got = dec.feed(19, enc_stream_commit(500, 86400 * 365 * 20 * 10**6))
    assert [json.loads(r["_data"])["id"] for r in got] == ["1", "2"]
    assert all(r["_txid"] == 500 for r in got)
    assert all(r["_commit_ts"] is not None for r in got)
    assert got[0]["_checkpoint_id"] == 11 and got[1]["_checkpoint_id"] == 17
    # xid 600 aborts entirely: its row never appears
    assert dec.feed(20, enc_stream_abort(600, 600)) in (None, [])
    assert dec.feed(21, enc_stream_commit(600, 1)) in (None, [])


def test_v2_subtransaction_abort_rejects():
    dec = PgOutputDecoder()
    dec.replay(enc_relation(77, "public", "t", ["id", "v"]))
    dec.feed(1, enc_stream_start(500))
    dec.feed(2, v2(enc_insert(77, ["1", "a"]), 500))
    dec.feed(3, enc_stream_stop())
    with pytest.raises(NotImplementedError, match="SUBtransaction"):
        list(dec.feed(4, enc_stream_abort(500, 501)) or [])


def test_v2_stream_state_carries_across_chunks():
    """r11 (ADVICE r10 high): a streamed transaction spanning decode chunks
    must not drop the earlier chunk's buffered rows at StreamCommit, and a
    chunk starting mid-segment must strip xid prefixes. The carried state
    round-trips through JSON (what WalStreamRunner persists), and the
    two-chunk decode equals the single-pass decode at EVERY split point."""
    rel = enc_relation(77, "public", "t", ["id", "v"])
    ts_us = 86400 * 365 * 20 * 10**6
    msgs = [
        (1, rel),
        (10, enc_stream_start(500)),
        (11, v2(enc_insert(77, ["1", "a"]), 500)),
        (12, v2(enc_insert(77, ["2", "b"]), 500)),
        (13, enc_stream_stop()),
        (14, enc_stream_start(600)),
        (15, v2(enc_insert(77, ["9", "z"]), 600)),
        (16, enc_stream_stop()),
        (17, enc_stream_start(500, first=0)),
        (18, v2(enc_insert(77, ["3", "c"]), 500)),
        (19, enc_stream_stop()),
        (20, enc_stream_commit(500, ts_us)),
        (21, enc_stream_commit(600, ts_us + 5)),
    ]
    single = PgOutputDecoder().decode_all(msgs)
    assert [json.loads(r["_data"])["id"] for r in single] == ["1", "2", "3", "9"]
    for split in range(1, len(msgs)):
        d1 = PgOutputDecoder()
        first = d1.decode_all(msgs[:split], carry=True)
        state = d1.stream_state()
        d2 = PgOutputDecoder()
        d2.replay(rel)  # relation preamble, as the runner provides
        d2.load_stream_state(json.loads(json.dumps(state)) if state else None)
        second = d2.decode_all(msgs[split:], carry=True)
        assert d2.stream_state() is None  # stream fully committed
        got = first + second
        assert [r["_data"] for r in got] == [r["_data"] for r in single], split
        assert [r["_txid"] for r in got] == [r["_txid"] for r in single]
        assert [r["_checkpoint_id"] for r in got] == \
            [r["_checkpoint_id"] for r in single]
        assert [r["_commit_ts"] for r in got] == \
            [r["_commit_ts"] for r in single]


def test_v2_decode_all_rejects_dangling_stream_state():
    """decode_all without carry=True must raise, not silently discard
    buffered committed-later rows (and not mis-park an open segment)."""
    dec = PgOutputDecoder()
    dec.replay(enc_relation(77, "public", "t", ["id", "v"]))
    msgs = [
        (1, enc_stream_start(500)),
        (2, v2(enc_insert(77, ["1", "a"]), 500)),
        (3, enc_stream_stop()),
    ]
    with pytest.raises(ValueError, match="buffered uncommitted"):
        dec.decode_all(msgs)
    # mid-open-segment (no StreamStop) also rejects
    with pytest.raises(ValueError, match="streamed transaction"):
        PgOutputDecoder().decode_all([(1, enc_stream_start(9))])


def test_v2_non_transactional_message_in_stream_has_no_txid():
    """A NON-transactional logical-decoding message arriving inside a
    streamed segment emits immediately with _txid=None (it is not part of
    the streamed transaction — same as the v1 path)."""
    dec = PgOutputDecoder()
    dec.feed(1, enc_stream_start(500))
    got = list(dec.feed(2, v2(enc_message("hb", b"x", lsn=2,
                                          transactional=False), 500)) or [])
    assert len(got) == 1
    assert got[0]["_txid"] is None and got[0]["_commit_ts"] is None
    # a TRANSACTIONAL one buffers under the stream xid with no ts yet
    assert dec.feed(3, v2(enc_message("tx", b"y", lsn=3), 500)) in (None, [])
    dec.feed(4, enc_stream_stop())
    rows = dec.feed(5, enc_stream_commit(500, 10**6))
    assert len(rows) == 1 and rows[0]["_txid"] == 500
    assert rows[0]["_commit_ts"] is not None


def test_decode_pgoutput_carry_roundtrip(spark):
    """Distributed two-batch decode with on_incomplete='carry': batch 1
    ends mid-stream and emits ONE stream_state row; feeding that state
    into batch 2 reproduces the single-pass decode. Default mode raises
    instead of silently dropping."""
    from pyspark.sql import Row
    from pyspark.sql import functions as F

    from peerdb_spark.sources.pgoutput import decode_pgoutput

    rel = enc_relation(77, "public", "t", ["id", "v"])
    ts_us = 86400 * 365 * 20 * 10**6
    chunk1 = [
        (1, rel),
        (10, enc_stream_start(500)),
        (11, v2(enc_insert(77, ["1", "a"]), 500)),
    ]
    chunk2 = [
        (12, v2(enc_insert(77, ["2", "b"]), 500)),  # still mid-segment
        (13, enc_stream_stop()),
        (14, enc_stream_commit(500, ts_us)),
    ]

    def mkdf(msgs):
        return spark.createDataFrame(
            [Row(slot="s0", lsn=lsn, payload=bytearray(p)) for lsn, p in msgs]
        )

    with pytest.raises(Exception, match="buffered uncommitted"):
        decode_pgoutput(mkdf(chunk1)).collect()

    out1 = decode_pgoutput(mkdf(chunk1), on_incomplete="carry").collect()
    states = [r for r in out1 if r["_kind"] == "stream_state"]
    assert len(states) == 1 and len(out1) == 1  # no data rows yet
    st = states[0]
    assert st["_src_table"] == "s0" and st["_txid"] == 500
    assert st["_checkpoint_id"] == 11  # earliest buffered row = replay anchor
    out2 = decode_pgoutput(
        mkdf(chunk2),
        relation_preamble=[rel],
        stream_state={"s0": json.loads(st["_data"])},
    ).collect()  # default 'error' mode: the stream completes, no raise
    got = sorted(
        (json.loads(r["_data"])["id"], r["_checkpoint_id"], r["_txid"])
        for r in out2 if r["_kind"] == "insert"
    )
    assert got == [("1", 11, 500), ("2", 12, 500)]
    assert all(r["_commit_ts"] is not None for r in out2)


def test_v2_relation_inside_stream_applies():
    """A Relation message inside a streamed segment (v2 prefixes it with
    the xid) updates the mapping for the buffered rows."""
    dec = PgOutputDecoder()
    dec.feed(1, enc_stream_start(900))
    dec.feed(2, v2(enc_relation(88, "public", "s", ["a", "b"]), 900))
    dec.feed(3, v2(enc_insert(88, ["5", "x"]), 900))
    dec.feed(4, enc_stream_stop())
    got = dec.feed(5, enc_stream_commit(900, 10**6))
    assert len(got) == 1 and json.loads(got[0]["_data"]) == {"a": "5", "b": "x"}


def test_sweep_stream_state_files(tmp_path):
    """r12 (ADVICE low): the cleanup helper for direct state_dir users —
    unreferenced stream_*.json bodies are removed, anything named by
    `keep` (pointer dicts or bare paths) survives, inline states and
    foreign files are ignored."""
    from peerdb_spark.sources.pgoutput import sweep_stream_state_files

    sdir = tmp_path / "st"
    sdir.mkdir()
    live = sdir / "stream_s0_aaaa.json"
    orphan1 = sdir / "stream_s0_bbbb.json"
    orphan2 = sdir / "stream_s1_cccc.json"
    other = sdir / "state_3.json"  # runner record: not this helper's job
    for p in (live, orphan1, orphan2, other):
        p.write_text("{}")
    removed = sweep_stream_state_files(
        str(sdir),
        keep=[{"state_file": str(live)}, {"stream_xid": 5, "pending": {}}],
    )
    assert sorted(removed) == sorted([str(orphan1), str(orphan2)])
    assert live.exists() and other.exists()
    # bare-path keep form; missing dir is a no-op
    (orphan1).write_text("{}")
    assert sweep_stream_state_files(str(sdir), keep=[str(orphan1), str(live)]) == []
    assert sweep_stream_state_files(str(sdir / "nope")) == []
