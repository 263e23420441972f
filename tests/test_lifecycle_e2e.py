"""Full mirror lifecycle in one story: SQL-surface DDL → CDC executes with a
pk-changing update and a poison payload → pause/resume signals → small-file
compaction → time-travel read. Exercises the round's features TOGETHER the
way an operator would hit them, not just in isolation."""

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from peerdb_spark import cdc
from peerdb_spark.registry import Catalog
from peerdb_spark.sql_surface import SqlSurface
from peerdb_spark.storage import ParquetTable

SCHEMA = T.StructType(
    [T.StructField("pk", T.LongType()), T.StructField("v", T.StringType())]
)


def _feed(spark, rows):
    return spark.createDataFrame(
        rows, "_kind string, _checkpoint_id long, _data string, _old_data string"
    ).select(
        "_kind",
        "_checkpoint_id",
        F.timestamp_seconds(F.col("_checkpoint_id") + 1_700_000_000).alias("_commit_ts"),
        F.col("_checkpoint_id").alias("_txid"),
        F.lit("t").alias("_src_table"),
        F.lit("t").alias("_dst_table"),
        "_data",
        "_old_data",
        F.lit(None).cast("array<string>").alias("_unchanged_cols"),
    )


def test_mirror_lifecycle_end_to_end(spark, tmp_path):
    surface = SqlSurface(spark, Catalog(str(tmp_path / "cat")))
    out = surface.execute(
        "CREATE MIRROR life FROM src TO dst WITH TABLE MAPPING (t:t) "
        "WITH (max_batch_size = 3)"
    )
    assert out["kind"] == "cdc"

    pipe = cdc.CdcPipeline(
        spark,
        str(tmp_path / "raw"),
        [cdc.CdcTableConfig("t", ["pk"], SCHEMA, str(tmp_path / "dst"), n_buckets=4)],
    )
    chg_dir = str(tmp_path / "chg")
    os.makedirs(chg_dir)

    def changelog():
        return spark.read.parquet(chg_dir)

    surface.bind_cdc("life", pipe, changelog)
    dst = ParquetTable(spark, str(tmp_path / "dst"), ["pk"], 4)

    # --- wave 1: inserts ---------------------------------------------------
    _feed(
        spark,
        [
            ("insert", 1, '{"pk": 1, "v": "a"}', None),
            ("insert", 2, '{"pk": 2, "v": "b"}', None),
            ("insert", 3, '{"pk": 3, "v": "c"}', None),
        ],
    ).write.mode("append").parquet(chg_dir)
    surface.execute("EXECUTE MIRROR life")
    state1 = sorted((r["pk"], r["v"]) for r in dst.read().collect())
    assert state1 == [(1, "a"), (2, "b"), (3, "c")]
    wave1_batch = surface.catalog.get_batch_id("life")

    # --- wave 2: pk-changing update, delete, poison payload ----------------
    _feed(
        spark,
        [
            # pk 2 -> pk 20 (old image carries the previous pk)
            ("update", 4, '{"pk": 20, "v": "b2"}', '{"pk": 2, "v": "b"}'),
            ("delete", 5, None, '{"pk": 3, "v": "c"}'),
            ("insert", 6, '{"pk": 4, "v": "d', None),  # poison: truncated JSON
            ("insert", 7, '{"pk": 5, "v": "e"}', None),
        ],
    ).write.mode("append").parquet(chg_dir)
    surface.execute("EXECUTE MIRROR life")
    state2 = sorted((r["pk"], r["v"]) for r in dst.read().collect())
    # old-pk row 2 gone (pk-update split), 3 deleted, poison absent, 5 landed
    assert state2 == [(1, "a"), (5, "e"), (20, "b2")]
    last_batch = surface.catalog.get_batch_id("life")
    dead = pipe.raw.dead_letters(1, last_batch, SCHEMA).collect()
    assert len(dead) == 1 and dead[0]["_peerdb_data"].startswith('{"pk": 4')

    # --- signals: paused mirror ignores EXECUTE ----------------------------
    surface.execute("PAUSE MIRROR life")
    _feed(spark, [("insert", 8, '{"pk": 6, "v": "f"}', None)]).write.mode(
        "append"
    ).parquet(chg_dir)
    surface.execute("EXECUTE MIRROR life")
    assert sorted((r["pk"], r["v"]) for r in dst.read().collect()) == state2
    surface.execute("RESUME MIRROR life")
    surface.execute("EXECUTE MIRROR life")
    state3 = sorted((r["pk"], r["v"]) for r in dst.read().collect())
    assert state3 == [(1, "a"), (5, "e"), (6, "f"), (20, "b2")]

    # --- layout: bucket-aligned merges keep 1 file/bucket, so compaction
    # has nothing to do (it matters for append-mode tables; see
    # test_storage_crash.py for the fragmented case)
    assert all(n == 1 for n in dst.files_per_bucket().values())
    stats = dst.compact()
    assert stats["buckets_compacted"] == 0
    assert sorted((r["pk"], r["v"]) for r in dst.read().collect()) == state3

    # --- time travel: state as of wave 1 -----------------------------------
    tt = sorted(
        (r["pk"], r["v"])
        for r in pipe.state_as_of("t", wave1_batch).select("pk", "v").collect()
    )
    assert tt == state1
