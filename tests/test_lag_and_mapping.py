"""Async normalize lag + column rename/type-override mapping tests."""

import datetime as dt
import json
import os

from pyspark.sql import types as T

from peerdb_spark import cdc
from peerdb_spark.storage import ParquetTable
from peerdb_spark.streaming import CdcStreamRunner

TS = dt.datetime(2024, 1, 1)
VAL = T.StructType([T.StructField("id", T.LongType()), T.StructField("v", T.StringType())])


def _wave(spark, path, rows):
    data = [
        {"_kind": "insert", "_checkpoint_id": c, "_commit_ts": TS, "_txid": c,
         "_src_table": "t", "_dst_table": "t",
         "_data": json.dumps(d), "_old_data": None, "_unchanged_cols": None}
        for (c, d) in rows
    ]
    spark.createDataFrame(data, cdc.CHANGELOG_SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_normalize_lag_trails_then_catches_up(spark, tmp_path):
    chg = str(tmp_path / "chg")
    os.makedirs(chg)
    dest = str(tmp_path / "t")
    runner = CdcStreamRunner(
        spark, chg, str(tmp_path / "ck"),
        [cdc.CdcTableConfig("t", ["id"], VAL, dest, n_buckets=4)],
        str(tmp_path / "raw"),
        max_files_per_trigger=1,  # one file per micro-batch
        normalize_lag=1,
    )
    _wave(spark, chg, [(1, {"id": 1, "v": "a"})])
    _wave(spark, chg, [(2, {"id": 2, "v": "b"})])
    runner.run_available()  # batches 0,1 synced; lag=1 → only batch 0 normalized
    t = ParquetTable(spark, dest, ["id"], 4)
    assert t.read().count() == 1
    runner.catch_up()  # drain the tail
    assert t.read().count() == 2


def test_column_rename_and_type_override(spark, tmp_path):
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("old_name", T.StringType()),
         T.StructField("amt", T.StringType())]
    )
    cfg = cdc.CdcTableConfig(
        "t", ["id"], schema, str(tmp_path / "t"), n_buckets=4,
        renames={"old_name": "new_name"},
        type_overrides={"amt": "decimal(10,2)"},
        exclude=[],
    )
    pipe = cdc.CdcPipeline(spark, str(tmp_path / "raw"), [cfg])
    b = spark.createDataFrame(
        [{"_kind": "insert", "_checkpoint_id": 1, "_commit_ts": TS, "_txid": 1,
          "_src_table": "t", "_dst_table": "t",
          "_data": json.dumps({"id": 1, "old_name": "x", "amt": "12.345"}),
          "_old_data": None, "_unchanged_cols": None}],
        cdc.CHANGELOG_SCHEMA,
    )
    pipe.sync_batch(b, 1)
    pipe.normalize_batches(1, 1)
    out = ParquetTable(spark, cfg.path, ["id"], 4).read()
    assert "new_name" in out.columns and "old_name" not in out.columns
    row = out.collect()[0]
    assert row["new_name"] == "x" and str(row["amt"]) == "12.35"
    assert dict(out.dtypes)["amt"] == "decimal(10,2)"
