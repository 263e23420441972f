"""Schema-change-as-data through the CDC pipeline (FIXTURES F3/F6): a
'relation' changelog record adds a column mid-stream; subsequent data rows
carry values, prior rows read NULL, and a restarted pipeline keeps parsing
the added column (catalog rehydration)."""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from peerdb_spark import cdc
from peerdb_spark.registry import Catalog
from peerdb_spark.schema_evolution import read_evolved
from peerdb_spark.storage import ParquetTable

VAL = T.StructType([T.StructField("id", T.LongType()), T.StructField("v", T.StringType())])


def _feed(spark, rows):
    return spark.createDataFrame(rows, cdc.CHANGELOG_SCHEMA)


def _row(kind, ck, data, old=None):
    import datetime as dt

    return (kind, ck, dt.datetime(2024, 1, 1, 0, 0, ck), ck, "t", "t", data, old, None)


def test_relation_record_adds_column_mid_stream(spark, tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    cfg = cdc.CdcTableConfig("t", ["id"], VAL, str(tmp_path / "dst"), n_buckets=4)
    pipe = cdc.CdcPipeline(spark, str(tmp_path / "raw"), [cfg],
                           catalog=cat, mirror_name="m1")

    # batch 0: two plain inserts
    b0 = _feed(spark, [
        _row("insert", 1, json.dumps({"id": 1, "v": "a"})),
        _row("insert", 2, json.dumps({"id": 2, "v": "b"})),
    ])
    pipe.sync_batch(b0, 0)
    pipe.normalize_batches(0, 0)

    # batch 1: relation record adds c2 int, then a row carrying it
    b1 = _feed(spark, [
        _row("relation", 3, json.dumps({"added": [{"name": "c2", "type": "int"}]})),
        _row("insert", 4, json.dumps({"id": 3, "v": "c", "c2": 42})),
        _row("update", 5, json.dumps({"id": 1, "v": "a2", "c2": 7})),
    ])
    pipe.sync_batch(b1, 1)
    pipe.normalize_batches(1, 1)

    table = ParquetTable(spark, cfg.path, ["id"], 4)
    got = {r["id"]: (r["v"], r["c2"]) for r in read_evolved(table).collect()}
    assert got == {1: ("a2", 7), 2: ("b", None), 3: ("c", 42)}
    # audit recorded once
    audit = cat.schema_delta_audit("m1")
    assert len(audit) == 1 and audit[0]["added"] == [["c2", "int"]]

    # batch 2 on a RESTARTED pipeline (fresh configs — static schema): the
    # rehydration path must keep parsing c2
    cfg2 = cdc.CdcTableConfig("t", ["id"], VAL, str(tmp_path / "dst"), n_buckets=4)
    pipe2 = cdc.CdcPipeline(spark, str(tmp_path / "raw"), [cfg2],
                            catalog=cat, mirror_name="m1")
    assert "c2" in [f.name for f in cfg2.value_schema.fields]
    b2 = _feed(spark, [_row("insert", 6, json.dumps({"id": 4, "v": "d", "c2": 9}))])
    pipe2.sync_batch(b2, 2)
    pipe2.normalize_batches(2, 2)
    got = {r["id"]: (r["v"], r["c2"]) for r in read_evolved(table).collect()}
    assert got[4] == ("d", 9)


def test_repeated_relation_record_dedups(spark, tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    cfg = cdc.CdcTableConfig("t", ["id"], VAL, str(tmp_path / "dst"), n_buckets=0)
    pipe = cdc.CdcPipeline(spark, str(tmp_path / "raw"), [cfg],
                           catalog=cat, mirror_name="m1")
    pipe.sync_batch(_feed(spark, [_row("insert", 1, json.dumps({"id": 1, "v": "a"}))]), 0)
    pipe.normalize_batches(0, 0)
    delta = json.dumps({"added": [{"name": "c2", "type": "int"}]})
    pipe.sync_batch(_feed(spark, [_row("relation", 2, delta), _row("relation", 3, delta)]), 1)
    pipe.normalize_batches(1, 1)
    pipe.sync_batch(_feed(spark, [_row("relation", 4, delta)]), 2)
    pipe.normalize_batches(2, 2)
    assert len(cat.schema_delta_audit("m1")) == 1  # applied once, replays dedup
    # schema has c2 exactly once
    names = [f.name for f in cfg.value_schema.fields]
    assert names.count("c2") == 1


def test_message_record_is_inert(spark, tmp_path):
    """MessageRecords (logical-decoding messages) and unknown kinds stage in
    raw for queue consumers but never merge — previously an unknown kind
    mapped to delete and merged a destructive null-pk row."""
    cfg = cdc.CdcTableConfig("t", ["id"], VAL, str(tmp_path / "dst"), n_buckets=0)
    pipe = cdc.CdcPipeline(spark, str(tmp_path / "raw"), [cfg])
    pipe.sync_batch(_feed(spark, [
        _row("insert", 1, json.dumps({"id": 1, "v": "a"})),
        _row("message", 2, json.dumps({"prefix": "wal2json", "content": "hello"})),
        _row("bogus-kind", 3, json.dumps({"id": 1})),
    ]), 0)
    pipe.normalize_batches(0, 0)
    table = ParquetTable(spark, cfg.path, ["id"], 0)
    rows = [(r["id"], r["v"]) for r in table.read().collect()]
    assert rows == [(1, "a")]  # no null-pk row, no phantom delete
    # counts exclude metadata kinds
    counts = {(r[cdc.RAW_TYPE]): r["count"] for r in pipe.record_counts(0, 0).collect()}
    assert counts == {0: 1}


def test_detect_payload_drift_proposes_typed_deltas(spark):
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from peerdb_spark.schema_evolution import detect_payload_drift

    schema = T.StructType(
        [T.StructField("pk", T.LongType()), T.StructField("v", T.StringType())]
    )
    raw = spark.createDataFrame(
        [
            ('{"pk": 1, "v": "a"}',),
            ('{"pk": 2, "v": "b", "score": 1.5}',),
            ('{"pk": 3, "v": "c", "score": 2.5, "tag": "x"}',),
            ('{"pk": 4, "v": "d", "flagged": true}',),
        ],
        "x string",
    ).select(F.col("x").alias("_peerdb_data"))
    delta = detect_payload_drift(raw, schema, "t")
    assert delta.dst_table == "t"
    assert delta.added_columns == [
        ("flagged", "boolean"),
        ("score", "double"),
        ("tag", "string"),
    ]
    # no drift -> empty delta
    clean = raw.limit(1)
    assert detect_payload_drift(clean, schema, "t").added_columns == []
