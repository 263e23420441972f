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


# --- bloom filter ---


def test_bloom_no_false_negatives(spark):
    inserted = [f"k{i}" for i in range(200)]
    df = _items(spark, inserted)
    bl = SK.bloom_build(df, "w", k=4, m_bits=4096)
    got = {r.w: r.maybe for r in SK.bloom_probe(bl, df, "w", k=4, m_bits=4096).collect()}
    assert all(got[w] == 1 for w in inserted)


def test_bloom_fp_rate_sane_and_word_range(spark):
    inserted = [f"k{i}" for i in range(200)]
    bl = SK.bloom_build(_items(spark, inserted), "w", k=4, m_bits=4096)
    rows = bl.collect()
    # packed 32-bit words: every value positive, word index within m/32
    assert all(0 <= r.word < 4096 // 32 for r in rows)
    assert all(0 < r.bits < (1 << 32) for r in rows)
    probes = _items(spark, [f"absent{i}" for i in range(500)])
    fp = sum(
        r.maybe for r in SK.bloom_probe(bl, probes, "w", k=4, m_bits=4096).collect()
    )
    # kn/m ≈ 0.2 → fp ≈ (1-e^-0.2)^4 ≈ 0.1%; 500 probes → expect ~0, allow slack
    assert fp <= 10


def test_bloom_merge_equals_union_build(spark):
    a = [f"a{i}" for i in range(80)]
    b = [f"b{i}" for i in range(80)]
    merged = SK.bloom_merge(
        SK.bloom_build(_items(spark, a), "w", k=4, m_bits=2048),
        SK.bloom_build(_items(spark, b), "w", k=4, m_bits=2048),
    )
    whole = SK.bloom_build(_items(spark, a + b), "w", k=4, m_bits=2048)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, whole.collect()))


def test_bloom_probe_matches_python_reference(spark):
    import hashlib

    def h(seed, s):
        return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:15], 16)

    inserted = [f"v{i}" for i in range(50)]
    m, k = 1024, 3
    bits = set()
    for w in inserted:
        for i in range(k):
            bits.add(h(SK._BLOOM_SEED + i, w) % m)
    probes = inserted + [f"p{i}" for i in range(300)]
    expect = {
        w: int(all(h(SK._BLOOM_SEED + i, w) % m in bits for i in range(k)))
        for w in probes
    }
    bl = SK.bloom_build(_items(spark, inserted), "w", k=k, m_bits=m)
    got = {
        r.w: r.maybe
        for r in SK.bloom_probe(bl, _items(spark, probes), "w", k=k, m_bits=m).collect()
    }
    assert got == expect


def test_bloom_null_values_skipped(spark):
    df = spark.createDataFrame([("a",), (None,), ("b",)], "w string")
    bl = SK.bloom_build(df, "w", k=3, m_bits=512)
    assert all(r.word is not None for r in bl.collect())
    # and the filter matches a NULL-free build exactly
    clean = SK.bloom_build(
        spark.createDataFrame([("a",), ("b",)], "w string"), "w", k=3, m_bits=512
    )
    assert sorted(map(tuple, bl.collect())) == sorted(map(tuple, clean.collect()))
