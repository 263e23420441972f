"""Cardinality-mode CDC probe (round-8 verdict #7): drive the sync+merge
path with a GENUINELY GROWING pk space — every batch inserts brand-new keys
(plus updates to a sample of earlier keys), so touched-bucket pruning is
exercised under worst-case fan-out (uniformly-hashed new keys touch every
bucket every batch) and the destination table grows monotonically.

The r6 throughput probe (288k ev/s at 10.2M events) replicated a fixed key
set, which under-exercises two things this probe measures directly:
  - buckets touched per batch (reported per batch; worst case = n_buckets)
  - ev/s as the DESTINATION grows (the merge rereads touched buckets, so
    per-batch cost includes O(existing rows in touched buckets))

Usage: python tools/cdc_cardinality_probe.py [keys_per_batch] [n_batches]
       default 100_000 keys x 6 batches, then 1_000_000 x 2 (the x10 row).
Prints one JSON line per batch and a summary; paste the table into
SCALING.md.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F
from pyspark.sql import types as T


def make_feed(spark, start_key: int, n_new: int, n_upd: int, batch_id: int):
    """n_new inserts of brand-new pks [start_key, start_key+n_new) plus
    n_upd updates sampled across [0, start_key) (earlier keys)."""
    ins = spark.range(start_key, start_key + n_new).select(
        F.lit("insert").alias("_kind"), F.col("id").alias("pk")
    )
    if n_upd and start_key:
        upd = spark.range(n_upd).select(
            F.lit("update").alias("_kind"),
            (F.pmod(F.xxhash64("id") + batch_id, F.lit(start_key))).alias("pk"),
        )
        ins = ins.unionByName(upd)
    payload = F.to_json(
        F.struct(
            F.col("pk"),
            (F.col("pk") % 97).cast("double").alias("qty"),
            (F.col("pk") % 1009).cast("double").alias("price"),
            F.lit("N").alias("flag"),
        )
    )
    return ins.select(
        "_kind",
        # 10^12 stride: checkpoint ids must stay strictly ordered by batch
        # for LWW to resolve correctly — pk may reach billions at large
        # CLI arguments (10^8 collided above 100M accumulated keys)
        (F.lit(batch_id) * 1_000_000_000_000 + F.col("pk"))
        .alias("_checkpoint_id"),
        F.timestamp_seconds(F.lit(1_700_000_000) + F.col("pk") % 1000).alias(
            "_commit_ts"
        ),
        F.col("pk").alias("_txid"),
        F.lit("lineitem").alias("_src_table"),
        F.lit("lineitem").alias("_dst_table"),
        payload.alias("_data"),
        F.lit(None).cast("string").alias("_old_data"),
        F.lit(None).cast("array<string>").alias("_unchanged_cols"),
    )


def run(spark, keys_per_batch: int, n_batches: int, wd: str, label: str,
        n_buckets: int = 32, split_threshold: int = 0,
        normalize_every="1"):
    normalize_every = ("auto" if normalize_every == "auto"
                      else int(normalize_every))
    from peerdb_spark import cdc
    from peerdb_spark.storage import BUCKET_COL, ParquetTable

    schema = T.StructType(
        [
            T.StructField("pk", T.LongType()),
            T.StructField("qty", T.DoubleType()),
            T.StructField("price", T.DoubleType()),
            T.StructField("flag", T.StringType()),
        ]
    )
    cfg = cdc.CdcTableConfig(
        "lineitem", ["pk"], schema, f"{wd}/{label}/dst", n_buckets=n_buckets,
        split_threshold_rows=split_threshold,
    )
    pipe = cdc.CdcPipeline(spark, f"{wd}/{label}/raw", [cfg],
                           normalize_every=normalize_every)
    dst = ParquetTable(spark, cfg.path, ["pk"], n_buckets,
                       split_threshold_rows=split_threshold)
    rows = []
    next_key = 0
    for b in range(1, n_batches + 1):
        n_upd = keys_per_batch // 4 if next_key else 0
        feed = make_feed(spark, next_key, keys_per_batch, n_upd, b)
        feed.write.parquet(f"{wd}/{label}/feed_{b}")  # untimed: workload gen
        feed_src = spark.read.parquet(f"{wd}/{label}/feed_{b}")
        n_ev = feed_src.count()
        t0 = time.time()
        pipe.sync_batch(feed_src, b)
        t1 = time.time()
        # normalize_every > 1 = the LAZY cadence (ClickHouse-RMT shape the
        # reference delegates to): sync cost is O(batch) and flat; the merge
        # amortizes over k batches of deltas. Reads between normalizes go
        # through pipe.read_table (fold-on-read). Round 10: this is now the
        # PRODUCT path — CdcPipeline(normalize_every=k).maybe_normalize —
        # not a hand-wired composition; the final drain uses force=True
        # exactly as CdcStreamRunner.catch_up does.
        merged = pipe.maybe_normalize(b, force=(b == n_batches))
        t2 = time.time()
        # buckets the batch actually touched (same manifest-aware expr the
        # merge uses — after splits the leaf count grows)
        touched_ids = [
            r[0]
            for r in feed_src.select(
                F.get_json_object("_data", "$.pk").cast("long").alias("pk")
            )
            .select(dst.assign_bucket_expr().alias(BUCKET_COL))
            .distinct()
            .collect()
        ]
        # the batch's REREAD+REWRITE cost driver: rows now sitting in the
        # touched buckets (footer metadata only — no data read). Under
        # static bucketing this grows with the destination; with splitting
        # it must stay bounded by leaves × threshold locality.
        per_bucket = dst.rows_per_bucket(touched_ids)
        next_key += keys_per_batch
        row = {
            "label": label,
            "batch": b,
            "events": n_ev,
            "sync_s": round(t1 - t0, 2),
            "norm_s": round(t2 - t1, 2),
            "ev_s": int(n_ev / (t2 - t0)),
            "buckets_touched": len(touched_ids),
            "leaves": len(dst.leaf_buckets()),
            "merged": bool(merged),
            "rows_in_touched": sum(per_bucket.values()),
            "max_bucket_rows": max(per_bucket.values() or [0]),
            "dest_keys": next_key,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"label": label, "final_rows": dst.read().count(),
                      "final_leaves": len(dst.leaf_buckets())}), flush=True)
    return rows


def main():
    from peerdb_spark import get_spark

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    nb = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    # argv[3]: split threshold rows (0 = static buckets, the r8 behavior);
    # argv[4]: 'both' runs static THEN split on the same workload shape —
    # the round-9 done-criterion comparison (rows_in_touched flat vs growing)
    thr = int(sys.argv[3]) if len(sys.argv) > 3 else 0
    mode = sys.argv[4] if len(sys.argv) > 4 else "one"
    spark = get_spark("cdc-card-probe", cpus=16)
    spark.sparkContext.setLogLevel("ERROR")
    wd = tempfile.mkdtemp(prefix="cdc_card_")
    try:
        if mode == "both":
            run(spark, k, nb, wd, f"static_{k}", split_threshold=0)
            run(spark, k, nb, wd, f"split_{k}_thr{thr}", split_threshold=thr)
        elif mode == "auto":
            # normalize_every='auto' with DEFAULT floor/ratio (100k, 0.10):
            # the r12 verdict #6 probe — merge-trigger batch indices vs
            # destination size, showing the cadence stretching once
            # 0.1 x dest outgrows a batch's pending rows
            run(spark, k, nb, wd, f"auto_{k}", split_threshold=thr,
                normalize_every="auto")
        elif mode.startswith("lazy"):
            k_norm = int(mode[4:] or 4)
            run(spark, k, nb, wd, f"lazy{k_norm}_{k}", split_threshold=thr,
                normalize_every=k_norm)
        else:
            run(spark, k, nb, wd, f"x1_{k}" if not thr else f"split_{k}_thr{thr}",
                split_threshold=thr)
            if not thr:
                run(spark, k * 10, max(2, nb // 3), wd, f"x10_{k * 10}")
    finally:
        shutil.rmtree(wd, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
