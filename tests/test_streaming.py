"""Streaming CDC end-to-end: file changelog → raw → normalized destinations,
with checkpoint restart and replay idempotency."""

import datetime as dt
import json
import os

import pytest
from pyspark.sql import types as T

from peerdb_spark import cdc
from peerdb_spark.storage import ParquetTable
from peerdb_spark.streaming import CdcStreamRunner

TS = dt.datetime(2024, 1, 1)

VAL = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
)


def _write_changelog(spark, path, rows, fname):
    data = [
        {
            "_kind": k,
            "_checkpoint_id": c,
            "_commit_ts": TS + dt.timedelta(seconds=c),
            "_txid": c,
            "_src_table": "t",
            "_dst_table": "t",
            "_data": json.dumps(d) if d else None,
            "_old_data": json.dumps(o) if o else None,
            "_unchanged_cols": None,
        }
        for (k, c, d, o) in rows
    ]
    df = spark.createDataFrame(data, cdc.CHANGELOG_SCHEMA)
    df.coalesce(1).write.mode("append").parquet(path)


def test_stream_end_to_end_with_restart(spark, tmp_path):
    chg_dir = str(tmp_path / "chg")
    os.makedirs(chg_dir)
    dest = str(tmp_path / "t")
    runner = CdcStreamRunner(
        spark,
        changelog_dir=chg_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        tables=[cdc.CdcTableConfig("t", ["id"], VAL, dest, n_buckets=4)],
        raw_path=str(tmp_path / "raw"),
    )

    # wave 1: inserts
    _write_changelog(
        spark, chg_dir, [("insert", i, {"id": i, "v": f"v{i}"}, None) for i in range(10)], "w1"
    )
    runner.run_available()
    t = ParquetTable(spark, dest, ["id"], 4)
    assert t.read().count() == 10

    # wave 2: update + delete, new runner instance (restart from checkpoint)
    _write_changelog(
        spark, chg_dir,
        [("update", 100, {"id": 3, "v": "V3"}, None), ("delete", 101, None, {"id": 7, "v": "v7"})],
        "w2",
    )
    runner2 = CdcStreamRunner(
        spark,
        changelog_dir=chg_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        tables=[cdc.CdcTableConfig("t", ["id"], VAL, dest, n_buckets=4)],
        raw_path=str(tmp_path / "raw"),
    )
    runner2.run_available()
    state = {r["id"]: r["v"] for r in t.read().collect()}
    assert set(state) == set(range(10)) - {7}
    assert state[3] == "V3"

    # wave 3 replayed runner: no new files → no changes (offsets committed)
    runner3 = CdcStreamRunner(
        spark,
        changelog_dir=chg_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        tables=[cdc.CdcTableConfig("t", ["id"], VAL, dest, n_buckets=4)],
        raw_path=str(tmp_path / "raw"),
    )
    runner3.run_available()
    assert t.read().count() == 9


def test_stream_batch_replay_idempotent(spark, tmp_path):
    """Simulate a crash between sink write and checkpoint commit: re-running
    the same foreachBatch(batch_id) must not duplicate rows."""
    chg_dir = str(tmp_path / "chg")
    os.makedirs(chg_dir)
    dest = str(tmp_path / "t")
    runner = CdcStreamRunner(
        spark,
        changelog_dir=chg_dir,
        checkpoint_dir=str(tmp_path / "ckpt"),
        tables=[cdc.CdcTableConfig("t", ["id"], VAL, dest, n_buckets=4)],
        raw_path=str(tmp_path / "raw"),
    )
    _write_changelog(
        spark, chg_dir, [("insert", i, {"id": i, "v": f"v{i}"}, None) for i in range(5)], "w1"
    )
    runner.run_available()
    t = ParquetTable(spark, dest, ["id"], 4)
    assert t.read().count() == 5

    # manual replay of batch 0 with identical content
    batch_df = spark.createDataFrame(
        [
            {
                "_kind": "insert", "_checkpoint_id": i,
                "_commit_ts": TS + dt.timedelta(seconds=i), "_txid": i,
                "_src_table": "t", "_dst_table": "t",
                "_data": json.dumps({"id": i, "v": f"v{i}"}), "_old_data": None,
                "_unchanged_cols": None,
            }
            for i in range(5)
        ],
        cdc.CHANGELOG_SCHEMA,
    )
    runner._foreach_batch(batch_df, 0)
    assert t.read().count() == 5  # no duplicates
