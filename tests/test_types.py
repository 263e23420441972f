"""Type-system tests: kind↔Spark mapping, numeric rules, clamping."""

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from peerdb_spark.types import (
    QKind,
    clamp_date,
    clamp_timestamp,
    numeric_destination,
    qkind_for_spark_type,
    spark_type,
    truncate_numeric,
)


def test_scalar_mapping_table():
    assert spark_type(QKind.INT64) == T.LongType()
    assert spark_type(QKind.INT16) == T.ShortType()
    assert spark_type(QKind.UINT64) == T.DecimalType(38, 0)
    assert spark_type(QKind.INT256) == T.StringType()
    assert spark_type(QKind.TIMESTAMP) == T.TimestampNTZType()
    assert spark_type(QKind.TIMESTAMPTZ) == T.TimestampType()
    assert spark_type(QKind.JSON) == T.StringType()
    assert spark_type(QKind.BYTES) == T.BinaryType()
    assert spark_type(QKind.GEOMETRY) == T.StringType()  # WKT


def test_numeric_destination_rules():
    # unparameterized → engine default (38,18)
    assert numeric_destination(None, None) == (38, 18)
    assert numeric_destination(0, 0) == (38, 18)
    # in-range honored
    assert numeric_destination(12, 2) == (12, 2)
    # beyond max precision → string fallback (ref: kind.go:26-33)
    assert numeric_destination(76, 10) == (None, None)
    assert spark_type(QKind.NUMERIC, 76, 10) == T.StringType()
    assert spark_type(QKind.NUMERIC, 20, 4) == T.DecimalType(20, 4)


def test_roundtrip_inference():
    for kind in [QKind.INT64, QKind.FLOAT64, QKind.BOOL, QKind.DATE, QKind.BYTES]:
        assert qkind_for_spark_type(spark_type(kind)) == kind


def test_clamping(spark):
    df = spark.createDataFrame(
        [
            (1, dt.date(1800, 1, 1), dt.datetime(1800, 1, 1)),
            (2, dt.date(2000, 6, 15), dt.datetime(2000, 6, 15)),
            (3, dt.date(2500, 1, 1), dt.datetime(2500, 1, 1)),
        ],
        "id long, d date, ts timestamp",
    )
    out = {r["id"]: r for r in df.select(
        "id", clamp_date(F.col("d")).alias("d"), clamp_timestamp(F.col("ts")).alias("ts")
    ).collect()}
    assert out[1]["d"] == dt.date(1900, 1, 1)
    assert out[2]["d"] == dt.date(2000, 6, 15)
    assert out[3]["d"] == dt.date(2299, 12, 31)
    assert out[1]["ts"].year == 1900 and out[3]["ts"].year == 2299


def test_truncate_numeric_overflow_null(spark):
    df = spark.createDataFrame([(1.23456,), (1e15,)], "x double")
    out = [r[0] for r in df.select(truncate_numeric(F.col("x"), 10, 2)).collect()]
    assert str(out[0]) == "1.23" and out[1] is None
