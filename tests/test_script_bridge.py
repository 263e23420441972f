"""Script-surface bridge tests: the reference's Lua helper semantics
(flow/pua/peerdb.go RegisterTypes / LuaRecordIndex / lvalueToKafkaRecord,
flow/connectors/utils/lua.go DefaultOnRecord), ported scripts included."""

import decimal
import json
import threading

import pytest

from peerdb_spark import script_bridge as SB
from peerdb_spark.script_bridge import (
    Record,
    Row,
    ScriptTime,
    Uuid,
    default_on_record,
    peerdb,
    result_to_kafka,
)


# ---------------------------------------------------------------------------
# typed helpers
# ---------------------------------------------------------------------------


def test_uuid_byte_indexing_and_string():
    u = peerdb.UUID("01020304-0506-0708-090a-0b0c0d0e0f10")
    assert [u[i] for i in range(16)] == list(range(1, 17))
    assert str(u) == "01020304-0506-0708-090a-0b0c0d0e0f10"
    assert u == peerdb.UUID(bytes(range(1, 17)))
    assert u.bytes == bytes(range(1, 17))
    with pytest.raises(IndexError):
        u[16]
    with pytest.raises(TypeError):
        peerdb.UUID(3.14)


def test_uuid_random_distinct():
    assert peerdb.UUID() != peerdb.UUID()


def test_time_accessors_match_reference_fields():
    # 2024-03-05 06:07:08.000000009 UTC
    t = ScriptTime(1709618828 * 10**9 + 9)
    assert t.unix_second == 1709618828
    assert t.unix_milli == 1709618828000
    assert t.unix_micro == 1709618828000000
    assert t.unix_nano == 1709618828 * 10**9 + 9
    assert t.nanosecond == 9
    assert (t.year, t.month, t.day) == (2024, 3, 5)
    assert (t.hour, t.minute, t.second) == (6, 7, 8)
    assert t.yearday == 65
    assert abs(t.unix - 1709618828.0) < 1e-6


def test_time_ordering_and_epoch():
    assert peerdb.unix_epoch < peerdb.Time(1.5)
    assert peerdb.Time(1.5) == ScriptTime(1_500_000_000)
    assert peerdb.Time() == peerdb.unix_epoch
    assert peerdb.Time(2) <= peerdb.Time(2)
    with pytest.raises(TypeError):
        peerdb.Time("2024-01-01")


def test_decimal_constructor_and_accessors():
    d = peerdb.Decimal("123.45")
    assert isinstance(d, decimal.Decimal)
    assert SB.dec_coefficient(d) == 12345
    assert SB.dec_exponent(d) == -2
    assert SB.dec_int64(d) == 123
    assert SB.dec_int64(peerdb.Decimal("-7.9")) == -7  # truncate toward zero
    assert SB.dec_float64(d) == pytest.approx(123.45)
    # NewFromFloat semantics: shortest repr, not binary expansion
    assert str(peerdb.Decimal(0.1)) == "0.1"
    assert peerdb.Decimal(7) == decimal.Decimal(7)
    # arithmetic is native decimal (the __add/__mul metamethods)
    assert peerdb.Decimal("1.1") + peerdb.Decimal("2.2") == decimal.Decimal("3.3")
    with pytest.raises(ValueError):
        peerdb.Decimal("not-a-number")


def test_peerdb_type_and_tostring():
    assert peerdb.type(peerdb.UUID()) == "Uuid"
    assert peerdb.type(peerdb.Decimal("1")) == "Decimal"
    assert peerdb.type("plain") is None  # non-userdata → nothing
    assert peerdb.tostring(peerdb.Decimal("1.50")) == "1.50"
    assert peerdb.tostring(42) is None


def test_row_access_mutation_len():
    r = Row({"id": 1, "val": "x"})
    assert r.val == "x" and r["id"] == 1
    assert len(r) == 2
    r.val = "y"
    r["extra"] = True
    assert r.table() == {"id": 1, "val": "y", "extra": True}
    assert peerdb.RowColumns(r) == ["id", "val", "extra"]
    assert peerdb.RowColumnKind(r, "id") == "int64"
    assert peerdb.RowColumnKind(r, "extra") == "bool"
    with pytest.raises(KeyError):
        r["absent"]
    with pytest.raises(AttributeError):
        r.absent


# ---------------------------------------------------------------------------
# Record surface
# ---------------------------------------------------------------------------


def _rec(kind, data=None, old=None, **kw):
    return Record(
        kind_code=kind,
        data=data,
        old_data=old,
        checkpoint=kw.get("checkpoint", 10),
        commit_ts_us=kw.get("ts", 1_700_000_000_000_000),
        target=kw.get("target", "dst_t"),
        unchanged=kw.get("unchanged"),
    )


def test_record_images_per_kind():
    ins = _rec(0, data='{"id": 1}')
    assert ins.kind == "insert"
    assert ins.row.id == 1 and ins.new.id == 1 and ins.old is None

    upd = _rec(1, data='{"id": 1, "v": 2}', old='{"id": 1, "v": 1}')
    assert upd.kind == "update"
    assert upd.row.v == 2 and upd.new.v == 2 and upd.old.v == 1

    # delete: GetItems() IS the deleted image; old aliases it too
    dele = _rec(2, old='{"id": 3}')
    assert dele.kind == "delete"
    assert dele.row.id == 3 and dele.old.id == 3 and dele.new is None


def test_record_meta_fields():
    r = _rec(1, data="{}", old="{}", unchanged="big_col,blob")
    assert r.checkpoint == 10
    assert r.commit_time.unix_second == 1_700_000_000
    assert r.target == "dst_t" and r.source == "dst_t"
    assert r.unchanged_columns == {"big_col": True, "blob": True}
    assert _rec(0, data="{}").unchanged_columns is None  # update-only


def test_message_record_prefix_content():
    m = _rec(4, data='{"prefix": "p", "content": "c"}')
    assert m.kind == "message"
    assert m.prefix == "p" and m.content == "c"
    assert _rec(0, data="{}").prefix is None


def test_default_on_record_json_envelope():
    out = default_on_record(
        _rec(1, data='{"id": 1}', old='{"id": 0}', unchanged="c1")
    )
    env = json.loads(out)
    assert env["kind"] == "update"
    assert env["new"] == {"id": 1} and env["old"] == {"id": 0}
    assert env["checkpoint"] == 10 and env["source"] == "dst_t"
    assert env["unchanged_columns"] == ["c1"]
    # relation/message records are skipped (DefaultOnRecord returns nothing)
    assert default_on_record(_rec(3, data="{}")) is None
    assert default_on_record(_rec(4, data="{}")) is None


# ---------------------------------------------------------------------------
# result normalization (lvalueToKafkaRecord)
# ---------------------------------------------------------------------------


def test_result_nil_skips_string_is_value_only():
    assert result_to_kafka(None, "t") is None
    assert result_to_kafka(False, "t") is None  # `r.row and ...` idiom on deletes
    kr = result_to_kafka("payload", "t")
    assert kr == {
        "key": None, "value": b"payload", "topic": "t", "partition": 0,
        "headers": [],
    }


def test_result_table_full_shape():
    kr = result_to_kafka(
        {
            "key": "k1",
            "value": b"v1",
            "topic": "custom",
            "partition": 3,
            "headers": {"h1": "x", "h2": None},
        },
        "fallback",
    )
    assert kr["key"] == b"k1" and kr["value"] == b"v1"
    assert kr["topic"] == "custom" and kr["partition"] == 3
    assert sorted(kr["headers"]) == [("h1", b"x"), ("h2", None)]
    # empty topic falls back (kafka.go:376-378)
    assert result_to_kafka({"value": "v"}, "dst")["topic"] == "dst"


def test_result_error_cases_match_reference():
    with pytest.raises(TypeError, match="invalid headers"):
        result_to_kafka({"value": "v", "headers": "nope"}, "t")
    with pytest.raises(TypeError, match="invalid key"):
        result_to_kafka({"key": 3.5}, "t")
    with pytest.raises(TypeError, match="invalid value"):
        result_to_kafka({"value": ["arr"]}, "t")
    with pytest.raises(TypeError, match="invalid value"):
        result_to_kafka(42, "t")  # number is not a valid script return
    # header conversion error becomes the header VALUE (kafka.go:199-210)
    kr = result_to_kafka({"value": "v", "headers": {"bad": 1.5}}, "t")
    assert kr["headers"][0][0] == "bad" and b"header" in kr["headers"][0][1]


def test_uuid_as_key_bytes():
    u = peerdb.UUID("01020304-0506-0708-090a-0b0c0d0e0f10")
    kr = result_to_kafka({"key": u, "value": "v"}, "t")
    assert kr["key"] == u.bytes


# ---------------------------------------------------------------------------
# ported reference scripts over a Spark raw batch (apply_script e2e)
# ---------------------------------------------------------------------------


def _raw_batch(spark):
    """changelog → raw rows exactly as the engine stages them."""
    from pyspark.sql import functions as F

    from peerdb_spark import cdc

    chg = spark.createDataFrame(
        [
            ("insert", 1, 1_700_000_000_000_000, "t1",
             '{"id": 1, "val": "a"}', None, None),
            ("update", 2, 1_700_000_001_000_000, "t1",
             '{"id": 1, "val": "b"}', '{"id": 1, "val": "a"}', "big_col"),
            ("delete", 3, 1_700_000_002_000_000, "t2",
             None, '{"id": 9, "val": "z"}', None),
        ],
        "_kind string, _checkpoint_id long, _commit_us long, _dst_table string,"
        " _data string, _old_data string, _unchanged string",
    ).select(
        "_kind", "_checkpoint_id",
        F.timestamp_micros(F.col("_commit_us")).alias("_commit_ts"),
        "_dst_table", "_data", "_old_data",
        F.split(F.coalesce(F.col("_unchanged"), F.lit("")), ",").alias("_unchanged_cols"),
    )
    return cdc.changelog_to_raw(chg, batch_id=1)


def test_ported_reference_script_row_val(spark):
    """The reference e2e script, ported 1:1:
    `function onRecord(r) return r.row and r.row.val end`
    (flow/e2e/pubsub_test.go:139)."""
    raw = _raw_batch(spark)
    out = SB.apply_script(raw, lambda r: r.row and r.row.val).collect()
    got = sorted((row["topic"], row["value"]) for row in out)
    # delete's row IS the deleted image (val "z"); all three emit
    assert got == [("t1", b"a"), ("t1", b"b"), ("t2", b"z")]


def test_apply_script_default_is_json_envelope(spark):
    raw = _raw_batch(spark)
    out = SB.apply_script(raw).collect()
    assert len(out) == 3
    envs = {json.loads(r["value"].decode())["kind"] for r in out}
    assert envs == {"insert", "update", "delete"}
    upd = next(
        json.loads(r["value"].decode())
        for r in out
        if json.loads(r["value"].decode())["kind"] == "update"
    )
    assert upd["new"] == {"id": 1, "val": "b"}
    assert upd["old"] == {"id": 1, "val": "a"}
    assert upd["unchanged_columns"] == ["big_col"]


def test_apply_script_routing_key_headers(spark):
    """A routing script using the typed helpers: key from the pk, topic by
    kind, a commit-time header — the reference's scripted kafka routing
    shape (kafka.go lvalueToKafkaRecord full-table form)."""

    def on_record(r):
        if r.kind == "delete":
            return None  # drop deletes
        return {
            "key": str(r.row.id),
            "value": r.json(),
            "topic": f"{r.target}_{r.kind}",
            "headers": {"commit_us": str(r.commit_time.unix_micro)},
        }

    out = SB.apply_script(_raw_batch(spark), on_record).collect()
    assert sorted(r["topic"] for r in out) == ["t1_insert", "t1_update"]
    assert all(r["key"] == b"1" for r in out)
    hdr = {r["topic"]: r["headers"][0] for r in out}
    assert hdr["t1_insert"]["key"] == "commit_us"
    assert hdr["t1_insert"]["value"] == b"1700000000000000"


def test_apply_script_to_wire_broker(spark):
    """Scripted records flow through the from-scratch wire producer to the
    stub broker — the reference's script→franz-go path, end to end."""
    from test_kafka_wire import _StubBroker

    from peerdb_spark import kafka_wire as KW

    b = _StubBroker()
    t = threading.Thread(target=b.serve_forever, daemon=True)
    t.start()
    try:
        host, port = b.server_address
        rows = SB.apply_script(
            _raw_batch(spark), lambda r: r.row and r.row.val
        )
        rows.foreachPartition(
            lambda it: KW.deliver_kafka_wire(it, host, port, "fallback")
        )
        assert sorted((t_, v) for t_, _k, v in b.received) == [
            ("t1", b"a"), ("t1", b"b"), ("t2", b"z")
        ]
    finally:
        b.shutdown()
        b.server_close()
