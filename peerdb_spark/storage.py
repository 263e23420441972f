"""Destination table storage over plain parquet.

The reference's destinations are real MERGE-capable engines; here the engine
owns its destination tables as parquet directories. The scale problem is
UPSERT: merge = read + join + rewrite, and rewriting 100 TB per batch is not
viable. Solution (mirrors what the reference's ClickHouse path gets from
`ORDER BY` sharding and what lakehouses get from clustering): destination
tables are hash-bucketed by primary key into `_peerdb_bucket=`N partitions.
A merge then:

1. computes the distinct buckets touched by the incoming batch (a batch of
   250k rows touches ≤ n_buckets partitions, typically all, but a skewed or
   small batch touches few);
2. reads ONLY those partitions (directory-partition pruning — Spark prunes
   on `_peerdb_bucket` before touching any file);
3. merges and dynamically overwrites ONLY those partitions
   (`partitionOverwriteMode=dynamic`).

Per-batch cost is O(touched buckets / total buckets × table size), and both
sides of the merge join are already co-partitioned by bucket. With table-size
~100 TB and n_buckets sized so a bucket is a few GB, each bucket merge is an
independent task-sized unit — exactly the property a 1000-executor cluster
needs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "_peerdb_bucket"


def bucket_expr(pk_cols: list[str], n_buckets: int):
    """Deterministic pk-hash bucket (xxhash64 is JVM-side, codegen-friendly)."""
    return F.pmod(F.xxhash64(*[F.col(c) for c in pk_cols]), F.lit(n_buckets)).cast("int")


class ParquetTable:
    """A managed destination table: parquet dir, optionally pk-hash-bucketed."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        pk_cols: list[str] | None = None,
        n_buckets: int = 0,
    ):
        self.spark = spark
        self.path = path
        self.pk_cols = pk_cols or []
        self.n_buckets = n_buckets

    # -- helpers ----------------------------------------------------------
    @property
    def _schema_path(self) -> str:
        return os.path.join(self.path, "_peerdb_schema.json")

    def _save_schema(self, df: DataFrame) -> None:
        os.makedirs(self.path, exist_ok=True)
        tmp = self._schema_path + ".tmp"
        with open(tmp, "w") as f:
            f.write(df.schema.json())
        os.replace(tmp, self._schema_path)  # atomic publish (no torn sidecar)

    def _load_schema(self):
        from pyspark.sql import types as T

        if os.path.exists(self._schema_path):
            with open(self._schema_path) as f:
                return T.StructType.fromJson(__import__("json").loads(f.read()))
        return None

    @property
    def exists(self) -> bool:
        # a crash-parked table must count as existing (callers branch to
        # BOOTSTRAP on not-exists, which would discard the restorable state)
        self.repair()
        if not os.path.isdir(self.path):
            return False
        for root, _dirs, files in os.walk(self.path):
            if any(f.endswith(".parquet") for f in files):
                return True
        return False

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        if self.n_buckets and self.pk_cols:
            return df.withColumn(BUCKET_COL, bucket_expr(self.pk_cols, self.n_buckets))
        return df

    def read(self) -> DataFrame:
        df = self.read_raw()
        return df.drop(BUCKET_COL) if BUCKET_COL in df.columns else df

    def read_raw(self) -> DataFrame:
        """Read including the bucket partition column (for pruned merges)."""
        self.repair()  # a reader after a crash must see restored buckets
        if not self.exists:
            # a table whose rows were all deleted still reads as empty with
            # its last known schema (schema sidecar written on every write)
            schema = self._load_schema()
            if schema is not None:
                return self.spark.createDataFrame([], schema)
        return self.spark.read.parquet(self.path)

    # -- write modes ------------------------------------------------------
    def overwrite(self, df: DataFrame) -> None:
        """Full replace via stage-then-swap: safe even when df's plan lazily
        reads this very table (read-modify-overwrite is a common caller
        pattern and Spark's overwrite truncates before executing the read).
        Crash-safe: the pre-overwrite state is parked at a marker dir until
        the staged state is promoted — repair() rolls either way."""
        import shutil
        import uuid

        self.repair()
        out = self._with_bucket(df)
        staging = f"{self.path}.staging-{uuid.uuid4().hex[:8]}"
        w = out.write.mode("overwrite")
        if self.n_buckets and self.pk_cols:
            w = w.partitionBy(BUCKET_COL)
        w.parquet(staging)
        parked = f"{self.path}.overwrite-old-{uuid.uuid4().hex[:8]}"
        if os.path.isdir(self.path):
            os.rename(self.path, parked)
        os.rename(staging, self.path)
        shutil.rmtree(parked, ignore_errors=True)
        self._save_schema(out)

    def append(self, df: DataFrame) -> None:
        out = self._with_bucket(df)
        w = out.write.mode("append")
        if self.n_buckets and self.pk_cols:
            w = w.partitionBy(BUCKET_COL)
        w.parquet(self.path)
        self._save_schema(out)

    def repair(self) -> None:
        """Roll interrupted writes forward or back (crash recovery).

        Two protocols leave breadcrumbs, both idempotent to repair and
        O(#leftovers); called before every read and destructive write:

        1. Full overwrite parks the whole table dir at `<path>.overwrite-old-*`
           before promoting the staged dir. Leftover marker + missing table →
           promote a COMPLETE staging (`_SUCCESS` present — it was fully
           written before the park happened) or, failing that, restore the
           parked pre-overwrite state.
        2. replace_partitions parks each old bucket dir at `.swap-old-<bucket>`
           inside the table (dot-prefixed → invisible to Spark's partition
           discovery) before moving the staged replacement in. Marker with the
           target bucket missing → the swap died between park and move; the
           parked dir is the authoritative pre-batch state — restore it (the
           batch's idempotent normalize re-run then redoes the merge). Target
           present → swap completed, drop the marker.

        Orphaned staging dirs are swept last (never before the overwrite
        decision — a complete staging may BE the newest committed state).
        """
        import shutil

        parent = os.path.dirname(self.path) or "."
        base = os.path.basename(self.path)
        if os.path.isdir(parent):
            parked_ovw = sorted(
                n for n in os.listdir(parent) if n.startswith(f"{base}.overwrite-old-")
            )
            stagings = sorted(
                n for n in os.listdir(parent) if n.startswith(f"{base}.staging-")
            )
            if parked_ovw and not os.path.isdir(self.path):
                complete = [
                    s for s in stagings
                    if os.path.exists(os.path.join(parent, s, "_SUCCESS"))
                ]
                if complete:
                    os.rename(os.path.join(parent, complete[0]), self.path)
                    stagings.remove(complete[0])
                else:
                    os.rename(os.path.join(parent, parked_ovw[0]), self.path)
                    parked_ovw = parked_ovw[1:]
            if os.path.isdir(self.path):
                for n in parked_ovw:
                    shutil.rmtree(os.path.join(parent, n), ignore_errors=True)
            for n in stagings:
                shutil.rmtree(os.path.join(parent, n), ignore_errors=True)
        if not os.path.isdir(self.path):
            return
        for name in os.listdir(self.path):
            if not name.startswith(".swap-old-"):
                continue
            orig = name[len(".swap-old-"):]
            parked = os.path.join(self.path, name)
            target = os.path.join(self.path, orig)
            if os.path.isdir(target):
                shutil.rmtree(parked, ignore_errors=True)
            else:
                os.rename(parked, target)

    def replace_partitions(self, df: DataFrame, buckets: list[int]) -> None:
        """Replace exactly the given bucket partitions with df's content.

        Dynamic partition overwrite alone is insufficient: a bucket whose merge
        result is EMPTY (all rows deleted) would never be rewritten and stale
        rows would survive. So each touched bucket is swapped: park the old
        dir at a dot-prefixed marker, move the staged dir in, drop the marker.
        Single-writer semantics (same as the reference's one normalize per
        mirror); any crash window is repairable — the staged output is fully
        materialized before the first swap, the park/move pair is two renames,
        and repair() rolls an interrupted swap back to the pre-batch state so
        re-running the idempotent normalize converges. (The old clear-then-move
        sequence could LOSE a bucket: a crash after the clear left neither the
        old rows nor the staged ones.)
        """
        assert self.n_buckets and self.pk_cols, "bucketed table required"
        import shutil
        import uuid

        self.repair()
        # df lazily reads the very files being replaced — materialize to a
        # staging dir first, then swap bucket directories into place.
        staging = f"{self.path}.staging-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(staging)
        try:
            for b in buckets:
                dst = os.path.join(self.path, f"{BUCKET_COL}={b}")
                src = os.path.join(staging, f"{BUCKET_COL}={b}")
                parked = os.path.join(self.path, f".swap-old-{BUCKET_COL}={b}")
                if os.path.isdir(parked):  # leftover from a completed swap
                    shutil.rmtree(parked)
                if os.path.isdir(dst):
                    os.rename(dst, parked)
                if os.path.isdir(src):
                    shutil.move(src, dst)
                shutil.rmtree(parked, ignore_errors=True)
        finally:
            shutil.rmtree(staging, ignore_errors=True)
        self._save_schema(df)

    def read_buckets(self, buckets: list[int]) -> DataFrame:
        """Partition-pruned read of specific buckets (no file IO outside them)."""
        return self.read_raw().where(F.col(BUCKET_COL).isin(buckets))
