"""applyInPandasWithState operator test: cross-batch redelivery dedup."""

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from peerdb_spark.streaming_stateful import stateful_dedup_stream

SCHEMA = T.StructType(
    [
        T.StructField("pk", T.LongType()),
        T.StructField("_checkpoint_id", T.LongType()),
        T.StructField("v", T.StringType()),
    ]
)


def _write_wave(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_stateful_dedup_filters_redelivered(spark, tmp_path):
    src_dir = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src_dir)

    # wave 1: ckpts 1..3 for key 1, 1..2 for key 2
    _write_wave(
        spark, src_dir,
        [(1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (2, 1, "x"), (2, 2, "y")],
    )

    def run_available():
        stream = spark.readStream.schema(SCHEMA).parquet(src_dir)
        deduped = stateful_dedup_stream(stream, ["pk"], SCHEMA)
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_available()
    out1 = spark.read.parquet(out_dir)
    assert out1.count() == 5

    # wave 2: REDELIVERY of (1,2),(1,3),(2,2) + genuinely new (1,4),(2,3)
    _write_wave(
        spark, src_dir,
        [(1, 2, "b"), (1, 3, "c"), (1, 4, "d"), (2, 2, "y"), (2, 3, "z")],
    )
    run_available()
    out2 = spark.read.parquet(out_dir)
    # only the two new checkpoints pass the state filter
    assert out2.count() == 7
    got = {(r["pk"], r["_checkpoint_id"]) for r in out2.collect()}
    assert (1, 4) in got and (2, 3) in got
    # no duplicates at all
    assert len(got) == 7
