"""Dedup-window double-execution probe (r11 verdict "What's wrong #2" /
r12 Next #3).

merge_into_table WITHOUT return_images executes the latest_changes window
twice: once for the touched-bucket probe (`select(BUCKET).distinct()`),
once for the merge itself. The checkpoint-the-deduped-batch variant
(localCheckpoint after the window, as the return_images path already
does) executes it once. r11 measured the saving at ~5-20% on 150k-row
batches and declined it; this probe decides the question at the 1M+ row
regime (scale_probe shape).

Alternates plain/checkpoint measurements (A/B/A/B...) so host drift hits
both arms equally. Usage:
  python tools/merge_probe.py --batch-rows 1500000 --dest-rows 4000000
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-rows", type=int, default=1_500_000)
    ap.add_argument("--dest-rows", type=int, default=4_000_000)
    ap.add_argument("--buckets", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    a = ap.parse_args()

    from pyspark.sql import functions as F

    from peerdb_spark import get_spark
    from peerdb_spark import normalize as N
    from peerdb_spark.storage import ParquetTable

    spark = get_spark("merge_probe", cpus=a.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    wd = tempfile.mkdtemp(prefix="merge_probe_")

    import shutil

    base = spark.range(a.dest_rows).select(
        F.col("id").alias("pk"),
        (F.col("id") % 1000).cast("double").alias("qty"),
        F.concat(F.lit("v"), F.col("id") % 97).alias("flag"),
    )
    dest = ParquetTable(spark, os.path.join(wd, "dst"), ["pk"], a.buckets)
    # bootstrap through the merge path itself (decoded-changes shape)
    boot = base.select(
        F.lit("insert").alias("_kind"),
        F.col("pk").alias("_checkpoint_id"),
        F.lit(None).cast("timestamp").alias("_commit_ts"),
        "pk", "qty", "flag")
    N.merge_into_table(dest, boot)

    # change batch: updates for 60%, fresh inserts 30%, deletes 10%
    nb = a.batch_rows
    upd = spark.range(int(nb * 0.6)).select(
        F.lit("update").alias("_kind"),
        (F.col("id") * 7 % a.dest_rows).alias("pk"),
        (F.col("id") % 500).cast("double").alias("qty"),
        F.lit("u").alias("flag"))
    ins = spark.range(int(nb * 0.3)).select(
        F.lit("insert").alias("_kind"),
        (F.col("id") + a.dest_rows).alias("pk"),
        F.lit(1.0).alias("qty"), F.lit("n").alias("flag"))
    dele = spark.range(nb - int(nb * 0.6) - int(nb * 0.3)).select(
        F.lit("delete").alias("_kind"),
        (F.col("id") * 13 % a.dest_rows).alias("pk"),
        F.lit(None).cast("double").alias("qty"),
        F.lit(None).cast("string").alias("flag"))
    batch = upd.unionByName(ins).unionByName(dele).select(
        "_kind", F.monotonically_increasing_id().alias("_checkpoint_id"),
        F.lit(None).cast("timestamp").alias("_commit_ts"),
        "pk", "qty", "flag",
    ).localCheckpoint(eager=True)  # feed is NOT part of the measurement

    orig_latest = N.latest_changes

    def ck_latest(*args, **kw):
        return orig_latest(*args, **kw).localCheckpoint(eager=True)

    def one_merge(variant: str) -> float:
        # snapshot the dest dir so every rep merges into identical state
        run_dir = os.path.join(wd, f"m_{variant}_{time.time_ns()}")
        shutil.copytree(os.path.join(wd, "dst"), run_dir)
        t = ParquetTable(spark, run_dir, ["pk"], a.buckets)
        N.latest_changes = ck_latest if variant == "ckpt" else orig_latest
        t0 = time.time()
        try:
            N.merge_into_table(t, batch)
        finally:
            N.latest_changes = orig_latest
        wall = time.time() - t0
        shutil.rmtree(run_dir, ignore_errors=True)
        return round(wall, 2)

    one_merge("plain")  # warm both pipelines once
    one_merge("ckpt")
    res = {"plain": [], "ckpt": []}
    for _ in range(a.reps):  # alternate so drift hits both arms
        res["plain"].append(one_merge("plain"))
        res["ckpt"].append(one_merge("ckpt"))
    out = {
        "batch_rows": nb, "dest_rows": a.dest_rows, "buckets": a.buckets,
        "plain": res["plain"], "ckpt": res["ckpt"],
        "plain_min": min(res["plain"]), "ckpt_min": min(res["ckpt"]),
        "saving_pct": round(100 * (1 - min(res["ckpt"]) / min(res["plain"])), 1),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
