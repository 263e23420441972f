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


def test_hll_estimate_accuracy_and_merge(spark):
    n = 20000
    df = _items(spark, [f"item{i}" for i in range(n)])
    sk = SK.hll_registers(df, "w", p=10)
    regs = [(r.bucket, r.rho) for r in sk.collect()]
    est = SK.hll_estimate(regs, p=10)
    assert abs(est - n) / n < 0.10, est  # ~3.25%/sqrt(m) expected error
    # merge of two halves == full build
    a = _items(spark, [f"item{i}" for i in range(0, n, 2)])
    b = _items(spark, [f"item{i}" for i in range(1, n, 2)])
    merged = SK.hll_merge(
        SK.hll_registers(a, "w", p=10), SK.hll_registers(b, "w", p=10)
    )
    m = {(r.bucket, r.rho) for r in merged.collect()}
    assert m == set(regs)


def test_hll_duplicates_do_not_inflate(spark):
    uniq = [f"u{i}" for i in range(500)]
    once = SK.hll_registers(_items(spark, uniq), "w", p=8)
    tenx = SK.hll_registers(_items(spark, uniq * 10), "w", p=8)
    assert {(r.bucket, r.rho) for r in once.collect()} == \
           {(r.bucket, r.rho) for r in tenx.collect()}
