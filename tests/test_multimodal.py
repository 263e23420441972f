"""Multimodal column plumbing tests (decode kernels are deterministic stubs)."""

from pyspark.sql import functions as F

from peerdb_spark.functions import multimodal as M


def _media_df(spark, n=10):
    rows = [
        (i, bytes([i % 256]) * (100 + i), ("image/png", 64, 64, None, None))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, M.MEDIA_SCHEMA)


def test_extract_features_shape(spark):
    df = _media_df(spark)
    out = M.extract_features(df)
    rows = out.collect()
    assert len(rows) == 10
    assert all(len(r["features"]) == M.FEATURE_DIM for r in rows)
    # deterministic: same bytes → same features
    again = {r["media_id"]: r["features"] for r in M.extract_features(df).collect()}
    first = {r["media_id"]: r["features"] for r in rows}
    assert again == first


def test_frame_sample_plan(spark):
    rows = [(1, b"x", ("video/mp4", 0, 0, 3500, "h264"))]
    df = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = M.frame_sample_plan(df, every_ms=1000)
    assert [r["frame_ts_ms"] for r in out.collect()] == [0, 1000, 2000, 3000]


def test_resize_images_shape_and_meta(spark):
    df = _media_df(spark)
    out = M.resize_images(df, 8, 8)
    rows = out.collect()
    assert len(rows) == 10
    assert all(len(bytes(r["content"])) == 8 * 8 * 3 for r in rows)
    assert all(r["meta"]["width"] == 8 and r["meta"]["height"] == 8 for r in rows)
    # deterministic in source bytes
    again = {r["media_id"]: bytes(r["content"]) for r in M.resize_images(df, 8, 8).collect()}
    first = {r["media_id"]: bytes(r["content"]) for r in rows}
    assert again == first


def test_media_stats_prunes_content(spark):
    df = _media_df(spark)
    out = M.media_stats(df)
    r = out.collect()[0]
    assert r["mime"] == "image/png" and r["n"] == 10
