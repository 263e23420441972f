"""Both merge strategies must produce identical results on the same workload."""

import datetime as dt

from pyspark.sql import functions as F

from peerdb_spark import normalize as N

TS = dt.datetime(2024, 1, 1)


def _workload(spark):
    dest = spark.createDataFrame(
        [(i, f"old{i}", float(i)) for i in range(1, 50)], "id long, v string, x double"
    )
    # heavy churn: 10 changes per key for keys 1..30, including deletes
    rows = []
    ck = 0
    for rep in range(10):
        for pk in range(1, 31):
            ck += 1
            kind = "delete" if (pk % 7 == 0 and rep == 9) else ("insert" if rep == 0 else "update")
            rows.append(
                {
                    "_kind": kind, "_checkpoint_id": ck,
                    "_commit_ts": TS + dt.timedelta(seconds=ck), "_txid": ck,
                    "_dst_table": "t", "_unchanged_cols": ["x"] if ck % 5 == 0 else None,
                    "id": pk, "v": f"new{pk}r{rep}", "x": None if ck % 5 == 0 else float(ck),
                }
            )
    chg = spark.createDataFrame(
        rows,
        "id long, v string, x double, _kind string, _checkpoint_id long,"
        "_commit_ts timestamp, _txid long, _dst_table string, _unchanged_cols array<string>",
    )
    return dest, chg


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_strategies_agree_hard_delete(spark):
    dest, chg = _workload(spark)
    a = N.merge_changes(dest, chg, ["id"], strategy="join")
    b = N.merge_changes(dest, chg, ["id"], strategy="agg")
    assert _canon(a.select("id", "v", "x")) == _canon(b.select("id", "v", "x"))


def test_strategies_agree_soft_delete(spark):
    dest, chg = _workload(spark)
    a = N.merge_changes(dest, chg, ["id"], soft_delete_col="_del", strategy="join")
    b = N.merge_changes(dest, chg, ["id"], soft_delete_col="_del", strategy="agg")
    assert _canon(a.select("id", "v", "x", "_del")) == _canon(b.select("id", "v", "x", "_del"))


def test_strategies_agree_bootstrap(spark):
    _, chg = _workload(spark)
    a = N.merge_changes(None, chg, ["id"], strategy="join")
    b = N.merge_changes(None, chg, ["id"], strategy="agg")
    assert _canon(a.select("id", "v", "x")) == _canon(b.select("id", "v", "x"))
