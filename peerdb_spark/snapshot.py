"""Initial snapshot (consistent clone) and resync (full refresh + swap).

Reference semantics (studied, not copied):
- snapshot: a consistent source version is exported, every table cloned in
  parallel partitions under that version, then CDC starts from the recorded
  offset (flow/workflows/snapshot_flow.go:103-434). Spark: read the source at
  a fixed state, QRep-style partitioned write, record the changelog offset
  watermark before the snapshot began.
- resync: clone to `<table>_resync` staging, then atomic rename swap; the
  soft-delete-aware path carries deleted rows forward
  (flow/workflows/cdc_flow.go:638-829, flow/activities/flowable.go:1653-1760
  RenameTables).

Over parquet directories the swap is an os.replace-style directory rename —
atomic on a POSIX filesystem, metadata-only on object stores with a manifest
(single-driver semantics, like the reference's one-orchestrator model).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from peerdb_spark.registry import Catalog, MirrorConfig
from peerdb_spark.qrep import QRepEngine
from peerdb_spark.storage import ParquetTable


def snapshot_table(
    engine: QRepEngine,
    cfg: MirrorConfig,
    source: DataFrame,
    dest_path: str,
    changelog_offset: int | None = None,
) -> dict:
    """Consistent initial load: partitioned parallel clone of `source`, then
    record the CDC start offset so the stream resumes where the snapshot's
    view of the world ended (slot-created-before-snapshot semantics)."""
    stats = engine.run(cfg, source, dest_path)
    if changelog_offset is not None:
        engine.catalog.set_batch_id(cfg.name, changelog_offset)
    return stats


def resync_table(
    spark: SparkSession,
    source: DataFrame,
    table: ParquetTable,
    soft_delete_col: str | None = None,
) -> None:
    """Full refresh with atomic swap.

    1. write the fresh clone to `<path>.staging-resync`
    2. if soft-delete mode: union tombstones present only in the old table
       (deleted rows carried forward — RenameTables soft-delete branch)
    3. park-promote swap using the storage repair protocol's marker names,
       so a crash in any window is rolled forward/back by
       `ParquetTable.repair()` exactly like an interrupted overwrite
    """
    resync_path = table.path + ".staging-resync"
    staging = ParquetTable(spark, resync_path, table.pk_cols, table.n_buckets)

    fresh = source
    if soft_delete_col and table.exists:
        old = table.read()
        if soft_delete_col in old.columns:
            live_keys = fresh.select(*table.pk_cols)
            tombstones = (
                old.where(F.col(soft_delete_col))
                .join(live_keys, table.pk_cols, "left_anti")
            )
            fresh = fresh.withColumn(soft_delete_col, F.lit(False)).unionByName(tombstones)
        else:
            fresh = fresh.withColumn(soft_delete_col, F.lit(False))
    elif soft_delete_col:
        fresh = fresh.withColumn(soft_delete_col, F.lit(False))

    staging.overwrite(fresh)

    parked = table.path + ".overwrite-old-resync"
    if os.path.isdir(table.path):
        os.rename(table.path, parked)
    os.rename(resync_path, table.path)
    shutil.rmtree(parked, ignore_errors=True)
