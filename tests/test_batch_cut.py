"""Transaction-atomic batch cut + mid-flow table addition tests."""

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from peerdb_spark import cdc
from peerdb_spark.storage import ParquetTable

TS = dt.datetime(2024, 1, 1)


def _chg(spark, rows):
    """rows: (ckpt, txid)"""
    data = [
        {
            "_kind": "insert", "_checkpoint_id": c, "_commit_ts": TS, "_txid": tx,
            "_src_table": "t", "_dst_table": "t",
            "_data": json.dumps({"id": c}), "_old_data": None, "_unchanged_cols": None,
        }
        for (c, tx) in rows
    ]
    return spark.createDataFrame(data, cdc.CHANGELOG_SCHEMA)


def test_cut_batches_never_splits_txn(spark):
    # 3 txns of sizes 4, 4, 4 with max_batch_size=6: txn2 won't fit in batch 0's
    # remainder → batch boundaries land between txns only
    rows = [(i, i // 4) for i in range(12)]
    out = cdc.cut_batches(_chg(spark, rows), max_batch_size=6).collect()
    by_txn = {}
    for r in out:
        by_txn.setdefault(r["_txid"], set()).add(r["_batch_no"])
    # invariant: every txn maps to exactly one batch
    assert all(len(b) == 1 for b in by_txn.values()), by_txn
    batches = {}
    for r in out:
        batches.setdefault(r["_batch_no"], 0)
        batches[r["_batch_no"]] += 1
    assert sum(batches.values()) == 12


def test_cut_batches_oversized_txn_stays_whole(spark):
    # one 10-row transaction with max=4: must stay in a single (oversized) batch
    rows = [(i, 1) for i in range(10)] + [(100 + i, 2) for i in range(2)]
    out = cdc.cut_batches(_chg(spark, rows), max_batch_size=4).collect()
    tx1_batches = {r["_batch_no"] for r in out if r["_txid"] == 1}
    assert len(tx1_batches) == 1


def test_add_table_mid_flow_with_backfill(spark, tmp_path):
    VAL = T.StructType([T.StructField("id", T.LongType()), T.StructField("v", T.StringType())])
    pipe = cdc.CdcPipeline(spark, str(tmp_path / "raw"), [])
    # batch 1 arrives before the table is registered → ignored
    b1 = spark.createDataFrame(
        [{"_kind": "insert", "_checkpoint_id": 1, "_commit_ts": TS, "_txid": 1,
          "_src_table": "t2", "_dst_table": "t2",
          "_data": json.dumps({"id": 1, "v": "early"}), "_old_data": None,
          "_unchanged_cols": None}],
        cdc.CHANGELOG_SCHEMA,
    )
    pipe.sync_batch(b1, 1)
    pipe.normalize_batches(1, 1)

    # table added mid-flow with snapshot backfill
    backfill = spark.createDataFrame([(10, "snap10"), (11, "snap11")], "id long, v string")
    cfg = cdc.CdcTableConfig("t2", ["id"], VAL, str(tmp_path / "t2"), n_buckets=4)
    pipe.add_table(cfg, backfill=backfill)
    t = ParquetTable(spark, cfg.path, ["id"], 4)
    assert t.read().count() == 2

    # subsequent batch normalizes into it
    b2 = spark.createDataFrame(
        [{"_kind": "insert", "_checkpoint_id": 2, "_commit_ts": TS, "_txid": 2,
          "_src_table": "t2", "_dst_table": "t2",
          "_data": json.dumps({"id": 12, "v": "live"}), "_old_data": None,
          "_unchanged_cols": None}],
        cdc.CHANGELOG_SCHEMA,
    )
    pipe.sync_batch(b2, 2)
    pipe.normalize_batches(2, 2)
    state = {r["id"]: r["v"] for r in t.read().collect()}
    assert state == {10: "snap10", 11: "snap11", 12: "live"}

    pipe.remove_table("t2")
    assert "t2" not in pipe.tables


def test_cross_table_txn_lands_in_one_batch_and_applies_atomically(spark, tmp_path):
    """A transaction spanning TWO destination tables must be batched as a
    unit (the reference holds the batch cut until the txn commits across
    all its tables) and normalize must advance both destinations together."""
    rows = []
    # txn 100: 3 rows into table a + 3 into table b (interleaved ckpts)
    for i in range(3):
        rows.append(("a", 10 + 2 * i, 100, {"id": i, "v": f"a{i}"}))
        rows.append(("b", 11 + 2 * i, 100, {"id": i, "v": f"b{i}"}))
    # txn 200: 4 rows into table a only
    for i in range(4):
        rows.append(("a", 20 + i, 200, {"id": 10 + i, "v": f"c{i}"}))
    data = [
        {
            "_kind": "insert", "_checkpoint_id": c, "_commit_ts": TS, "_txid": tx,
            "_src_table": t, "_dst_table": t,
            "_data": json.dumps(d), "_old_data": None, "_unchanged_cols": None,
        }
        for (t, c, tx, d) in rows
    ]
    chg = spark.createDataFrame(data, cdc.CHANGELOG_SCHEMA)
    cut = cdc.cut_batches(chg, max_batch_size=4)
    by_txn = {
        r["_txid"]: r["n"]
        for r in cut.groupBy("_txid").agg(
            F.count_distinct("_batch_no").alias("n")
        ).collect()
    }
    assert by_txn == {100: 1, 200: 1}  # neither txn split, even cross-table
    batch_of = {
        r["_txid"]: r["b"]
        for r in cut.groupBy("_txid").agg(F.min("_batch_no").alias("b")).collect()
    }
    assert batch_of[100] != batch_of[200]  # 6 rows > max 4 closed batch 0

    # drive the pipeline: after normalizing txn 100's batch, BOTH tables
    # hold exactly their slice of the txn; txn 200 not yet visible
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
    )
    pipe = cdc.CdcPipeline(
        spark,
        str(tmp_path / "raw"),
        [
            cdc.CdcTableConfig("a", ["id"], schema, str(tmp_path / "da"), n_buckets=2),
            cdc.CdcTableConfig("b", ["id"], schema, str(tmp_path / "db"), n_buckets=2),
        ],
    )
    first = batch_of[100] + 1  # sync_batch numbering is 1-based below
    for bno in sorted(set(batch_of.values())):
        part = cut.where(F.col("_batch_no") == bno).drop("_batch_no")
        pipe.sync_batch(part, bno + 1)
    pipe.normalize_batches(first, first)
    got_a = sorted(r["v"] for r in ParquetTable(spark, str(tmp_path / "da"), ["id"], 2).read().collect())
    got_b = sorted(r["v"] for r in ParquetTable(spark, str(tmp_path / "db"), ["id"], 2).read().collect())
    assert got_a == ["a0", "a1", "a2"] and got_b == ["b0", "b1", "b2"]


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=20, deadline=None)
@given(
    txn_sizes=st.lists(st.integers(min_value=1, max_value=7), min_size=1, max_size=12),
    max_batch=st.integers(min_value=1, max_value=12),
    shuffle_seed=st.integers(min_value=0, max_value=999),
)
def test_cut_batches_matches_python_reference(spark, txn_sizes, max_batch, shuffle_seed):
    """Property: cut_batches == the reference packing rule — txns ordered by
    (first checkpoint, txid), packed cumulatively, batch = floor((cum -
    txn_rows) / max) — regardless of row arrival order, and no txn ever
    spans two batches."""
    import random

    rows = []
    ck = 0
    for tx, n in enumerate(txn_sizes):
        for _ in range(n):
            rows.append((ck, tx))
            ck += 1
    rng = random.Random(shuffle_seed)
    rng.shuffle(rows)
    cut = cdc.cut_batches(_chg(spark, rows), max_batch_size=max_batch)
    got = {
        r["_txid"]: (r["b"], r["n"])
        for r in cut.groupBy("_txid").agg(
            F.min("_batch_no").alias("b"), F.count_distinct("_batch_no").alias("n")
        ).collect()
    }
    # python reference
    order = sorted(range(len(txn_sizes)), key=lambda tx: (tx * 0 + min(
        c for c, t in rows if t == tx), tx))
    cum = 0
    want = {}
    for tx in order:
        cum += txn_sizes[tx]
        want[tx] = (cum - txn_sizes[tx]) // max_batch
    assert {t: b for t, (b, _) in got.items()} == want
    assert all(n == 1 for _, n in got.values()), "txn split across batches"
