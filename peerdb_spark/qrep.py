"""QRep — partitioned batch replication engine.

Reference lifecycle (studied, not copied): flow/workflows/qrep_flow.go:519-675 —
GetQRepPartitions → distribute to parallel workers → per-partition pull+sync →
consolidate → wait-for-new-rows → loop. Idempotency via IsQRepPartitionSynced
(flow/connectors/core.go:255-257). Write modes APPEND / UPSERT / OVERWRITE
(protos/flow.proto:370-380). Watermark progression via MAX(wm) and
`EXISTS wm > last` polling (flow/activities/flowable.go:1597-1651).

Spark realization: each partition is a predicate on the watermark column that
the parquet scan pushes down (PushedFilters), so a "partition pull" costs only
the row-groups whose min/max stats overlap the range. Partitions execute as
one unioned job (Spark schedules the parallelism; max_parallel_workers maps to
concurrent tasks, not threads we manage).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from peerdb_spark import normalize as N
from peerdb_spark.partition import QRepPartition, minmax_partitions, ntile_partitions
from peerdb_spark.registry import Catalog, MirrorConfig
from peerdb_spark.storage import ParquetTable


def watermark_range_pull(df: DataFrame, wm: str, part: QRepPartition) -> DataFrame:
    """One partition's pull: `SELECT * WHERE wm BETWEEN start AND end`
    (ref: query template flow/connectors/postgres/qrep_source.go:411-414)."""
    return df.where(part.predicate(wm))


def get_max_value(df: DataFrame, wm: str):
    """MAX(watermark) (ref: flow/connectors/postgres/qrep_source.go:310-323)."""
    return df.agg(F.max(wm).alias("max_wm")).collect()[0]["max_wm"]


def has_new_rows(df: DataFrame, wm: str, last_end) -> bool:
    """EXISTS(wm > last) poll (ref: flow/activities/flowable.go:1597-1651).
    limit(1) short-circuits the scan; the filter is pushed to parquet stats."""
    if last_end is None:
        return df.limit(1).count() > 0
    return df.where(F.col(wm) > F.lit(last_end)).limit(1).count() > 0


def _coalesce_ranges(parts: list[QRepPartition]) -> list[QRepPartition]:
    """Merge adjacent pending partitions into contiguous spans.

    A fresh sync has every partition pending → the union of hundreds of
    range-filtered scans collapses to ONE scan with one BETWEEN predicate
    (the per-partition task split is Spark's job, not the plan's). Only
    re-runs with holes (some partitions already synced) produce multiple
    spans. Integer and timestamp watermarks supported; full-table/null
    partitions pass through untouched.
    """
    import datetime as dt

    rangeable = [p for p in parts if not (p.full_table or p.is_null_partition)]
    passthrough = [p for p in parts if p.full_table or p.is_null_partition]
    if len(rangeable) <= 1:
        return parts
    rangeable.sort(key=lambda p: p.start)

    def adjacent(prev_end, nxt_start) -> bool:
        if isinstance(prev_end, dt.datetime):
            return nxt_start - prev_end <= dt.timedelta(microseconds=1)
        return int(nxt_start) - int(prev_end) <= 1

    spans: list[QRepPartition] = []
    cur = rangeable[0]
    for p in rangeable[1:]:
        # half-open NTILE neighbors touch exactly (p.start == cur.end)
        if adjacent(cur.end, p.start) or (p.start_exclusive and p.start == cur.end):
            cur = QRepPartition(f"span_{cur.start}_{p.end}", cur.start, p.end,
                                start_exclusive=cur.start_exclusive)
        else:
            spans.append(cur)
            cur = p
    spans.append(cur)
    return spans + passthrough


class QRepEngine:
    """Executes a QRep mirror config against parquet sources/destinations."""

    def __init__(self, spark: SparkSession, catalog: Catalog):
        self.spark = spark
        self.catalog = catalog

    def get_partitions(
        self, cfg: MirrorConfig, source: DataFrame, last_end=None
    ) -> list[QRepPartition]:
        wm = cfg.watermark_column
        src = source.where(F.col(wm) > F.lit(last_end)) if last_end is not None else source
        if cfg.partition_strategy == "full":
            return [QRepPartition("p_full", None, None, full_table=True)]
        if cfg.partition_strategy == "ntile":
            n = max(1, cfg.max_parallel_workers)
            return ntile_partitions(src, wm, n)
        return minmax_partitions(src, wm, cfg.num_rows_per_partition)

    def run(self, cfg: MirrorConfig, source: DataFrame, dest_path: str) -> dict:
        """One QRep sync pass: partition → pull (skipping done partitions) →
        write in the configured mode → record watermark. Returns stats."""
        wm = cfg.watermark_column
        last_end = self.catalog.get_last_watermark(cfg.name)
        if last_end is not None and not has_new_rows(source, wm, last_end):
            return {"partitions": 0, "rows": 0, "skipped": True}

        parts = self.get_partitions(cfg, source, last_end)
        todo = [p for p in parts if not self.catalog.is_partition_done(cfg.name, p.partition_id)]
        if not todo:
            return {"partitions": 0, "rows": 0, "skipped": True}

        src = source.where(F.col(wm) > F.lit(last_end)) if last_end is not None else source
        # Watermark bound for partitions without a planned range (full-table /
        # null partitions) is captured at PLANNING time, before the pull: a
        # planning-time max is <= what the pull will contain (at-least-once),
        # whereas a post-pull re-scan races with concurrent appends — rows
        # landing between planning and the re-scan would raise the watermark
        # past data never pulled, skipping them forever.
        full_max = (
            get_max_value(src, wm)
            if any(p.full_table or p.is_null_partition for p in todo)
            else None
        )
        spans = _coalesce_ranges(todo)
        pulls = [watermark_range_pull(src, wm, p) for p in spans]
        batch = reduce(DataFrame.unionByName, pulls)

        table = ParquetTable(
            self.spark,
            dest_path,
            pk_cols=cfg.upsert_key_columns or None,
            n_buckets=16 if cfg.write_mode == "upsert" else 0,
            # upsert destinations grow without bound across qrep runs; the
            # same bucket-size bound as CDC destinations (storage.maybe_split)
            split_threshold_rows=4_000_000 if cfg.write_mode == "upsert" else 0,
        )
        rows = self._write(cfg, table, batch)
        for p in todo:
            self.catalog.mark_partition_done(cfg.name, p.partition_id)
        # advance to the max END of the partitions actually pulled — never a
        # fresh scan of the live source (see full_max note above); never lower
        # an already-recorded watermark (resumed runs may pull older holes)
        ends = [p.end for p in todo if p.end is not None]
        new_max = max(ends) if ends else full_max
        if new_max is not None and (last_end is None or new_max > last_end):
            self.catalog.set_last_watermark(cfg.name, new_max)
        return {"partitions": len(todo), "rows": rows, "skipped": False}

    def _write(self, cfg: MirrorConfig, table: ParquetTable, batch: DataFrame) -> int:
        """Write the batch in the configured mode; the row count is collected
        with an Observation during the write job itself — a separate count()
        would scan the source twice (2× IO at 100 TB for a metric)."""
        from pyspark.sql import Observation

        mode = cfg.write_mode
        obs = Observation()
        batch = batch.observe(obs, F.count(F.lit(1)).alias("rows"))
        if mode == "overwrite":
            table.overwrite(batch)
        elif mode == "upsert":
            keys = cfg.upsert_key_columns
            # QRep upsert = last-writer-wins on the upsert keys then pk-merge
            # (ref: snowflake/qrep_avro_consolidate.go:198-202 QUALIFY ROW_NUMBER)
            wmcol = cfg.watermark_column
            changes = batch.withColumn(N.COL_KIND, F.lit("insert")).withColumn(
                N.COL_COMMIT_TS, F.col(wmcol).cast("timestamp")
                if dict(batch.dtypes)[wmcol].startswith("timestamp")
                else F.timestamp_micros(F.col(wmcol).cast("long"))
            ).withColumn(N.COL_CHECKPOINT, F.monotonically_increasing_id())
            N.merge_into_table(table, changes)
        else:  # append
            table.append(batch)
        return int(obs.get["rows"])
