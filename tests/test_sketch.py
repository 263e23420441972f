"""Count-min sketch: estimate bounds, mergeability, sizing."""

from pyspark.sql import Row
from pyspark.sql import functions as F

from peerdb_spark.functions import sketch as SK


def _items(spark, words):
    return spark.createDataFrame([Row(w=x) for x in words])


def test_cms_estimate_upper_bounds_truth(spark):
    words = ["a"] * 50 + ["b"] * 20 + [f"x{i}" for i in range(100)]
    df = _items(spark, words)
    sk = SK.cms_build(df, "w", d=4, width=64)
    est = {
        r.w: r.est
        for r in SK.cms_estimate(
            sk, _items(spark, ["a", "b", "x0", "nothere"]), "w", d=4, width=64
        ).collect()
    }
    assert est["a"] >= 50 and est["b"] >= 20 and est["x0"] >= 1
    # absent key may collide but never goes below zero
    assert est["nothere"] >= 0


def test_cms_no_collision_exact(spark):
    # width >> distinct values → estimates exact
    words = ["p"] * 7 + ["q"] * 3
    df = _items(spark, words)
    sk = SK.cms_build(df, "w", d=4, width=4096)
    est = {r.w: r.est for r in
           SK.cms_estimate(sk, _items(spark, ["p", "q"]), "w", d=4, width=4096).collect()}
    assert est == {"p": 7, "q": 3}


def test_cms_merge_equals_full_build(spark):
    a = _items(spark, ["a"] * 10 + ["b"] * 5)
    b = _items(spark, ["a"] * 3 + ["c"] * 8)
    full = SK.cms_build(a.unionByName(b), "w", d=4, width=128)
    merged = SK.cms_merge(
        SK.cms_build(a, "w", d=4, width=128),
        SK.cms_build(b, "w", d=4, width=128),
    )
    f = {(r.row, r.slot): r.cnt for r in full.collect()}
    m = {(r.row, r.slot): r.cnt for r in merged.collect()}
    assert f == m


def test_cms_size_bound(spark):
    df = _items(spark, [f"w{i}" for i in range(5000)])
    sk = SK.cms_build(df, "w", d=3, width=64)
    assert sk.count() <= 3 * 64
