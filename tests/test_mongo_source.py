"""Mongo change-stream decode → changelog → CDC pipeline with string
resume-token checkpoints."""

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from peerdb_spark.sources.mongo import changestream_to_changelog


def ev(token, op, key=None, doc=None, t=1709290000, db="app", coll="users", txn=None):
    e = {
        "_id": {"_data": token},
        "operationType": op,
        "clusterTime": {"$timestamp": {"t": t, "i": 1}},
        "ns": {"db": db, "coll": coll},
    }
    if key is not None:
        e["documentKey"] = key
    if doc is not None:
        e["fullDocument"] = doc
    if txn is not None:
        e["txnNumber"] = txn
    return json.dumps(e)


EVENTS = [
    ev("82650000000000000001", "insert", {"_id": 1}, {"_id": 1, "name": "ada"}),
    ev("82650000000000000002", "insert", {"_id": 2}, {"_id": 2, "name": "bob"}),
    ev("82650000000000000003", "update", {"_id": 1}, {"_id": 1, "name": "ADA"}, txn=7),
    ev("82650000000000000004", "replace", {"_id": 2}, {"_id": 2, "name": "BOB2"}),
    ev("82650000000000000005", "delete", {"_id": 2}),
    ev("82650000000000000006", "drop"),  # stream-control event → ignored
]


def test_changestream_decode(spark):
    df = spark.createDataFrame([(e,) for e in EVENTS], "event_json string")
    out = changestream_to_changelog(df).orderBy("_checkpoint_id").collect()
    assert [r["_kind"] for r in out] == ["insert", "insert", "update", "update", "delete"]
    assert out[0]["_checkpoint_id"] == "82650000000000000001"
    assert out[0]["_dst_table"] == "app.users"
    assert json.loads(out[0]["_data"]) == {"_id": 1, "name": "ada"}
    assert out[2]["_txid"] == 7
    assert out[4]["_data"] is None
    assert json.loads(out[4]["_old_data"]) == {"_id": 2}
    assert out[0]["_commit_ts"] is not None


def test_changestream_to_pipeline_string_offsets(spark, tmp_path):
    """Resume tokens are opaque strings: the pipeline's LWW ordering and
    merge must work on them end-to-end (same path as GTID offsets)."""
    from peerdb_spark import cdc as C
    from peerdb_spark.storage import ParquetTable

    df = spark.createDataFrame([(e,) for e in EVENTS], "event_json string")
    changelog = changestream_to_changelog(df)
    val_schema = T.StructType([
        T.StructField("_id", T.LongType()),
        T.StructField("name", T.StringType()),
    ])
    dest = str(tmp_path / "users")
    pipe = C.CdcPipeline(spark, str(tmp_path / "raw"), [
        C.CdcTableConfig("app.users", ["_id"], val_schema, dest, n_buckets=2),
    ])
    pipe.sync_batch(changelog, 0)
    pipe.normalize_batches(0, 0)
    state = {r["_id"]: r["name"] for r in ParquetTable(spark, dest, ["_id"], 2).read().collect()}
    assert state == {1: "ADA"}  # 2 replaced then deleted; 1 updated


def test_update_without_fulldocument_dropped(spark):
    """updateLookup can miss (doc deleted before lookup) — the reference
    skips such events; passing NULL _data through would null-out every
    destination column on merge."""
    import json

    from peerdb_spark.sources.mongo import changestream_to_changelog

    events = [
        {"_id": {"_data": "82AA01"}, "operationType": "update",
         "clusterTime": {"$timestamp": {"t": 1700000300, "i": 1}},
         "ns": {"db": "app", "coll": "users"},
         "documentKey": {"_id": 7}},  # no fullDocument
        {"_id": {"_data": "82AA02"}, "operationType": "delete",
         "clusterTime": {"$timestamp": {"t": 1700000301, "i": 1}},
         "ns": {"db": "app", "coll": "users"},
         "documentKey": {"_id": 8}},
    ]
    df = spark.createDataFrame([(json.dumps(e),) for e in events], "event_json string")
    out = changestream_to_changelog(df).collect()
    # the fullDocument-less update is dropped; the delete (match-data only) stays
    assert [r["_kind"] for r in out] == ["delete"]
