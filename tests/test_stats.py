"""group_quantiles (functions/stats.py) — exact type-1 quantile semantics."""

from pyspark.sql import functions as F

from peerdb_spark.functions.stats import group_quantiles


def test_group_quantiles_exact(spark):
    rows = [("a", v, i) for i, v in enumerate([10, 20, 30, 40])] + [
        ("b", v, 100 + i) for i, v in enumerate([5, 7])
    ]
    df = spark.createDataFrame(rows, "g string, v long, id long")
    out = {
        (r["g"], r["q"]): r["value"]
        for r in group_quantiles(df, "g", "v", [0.25, 0.5, 0.75, 1.0], "id").collect()
    }
    # group a: n=4 -> ranks ceil(q*4) = 1,2,3,4
    assert out[("a", 0.25)] == 10
    assert out[("a", 0.5)] == 20
    assert out[("a", 0.75)] == 30
    assert out[("a", 1.0)] == 40
    # group b: n=2 -> ranks 1,1,2,2
    assert out[("b", 0.25)] == 5 and out[("b", 0.5)] == 5
    assert out[("b", 0.75)] == 7 and out[("b", 1.0)] == 7


def test_group_quantiles_matches_sorted_python(spark):
    import random

    rnd = random.Random(3)
    rows = [(f"g{i%3}", rnd.randint(0, 1000), i) for i in range(500)]
    df = spark.createDataFrame(rows, "g string, v long, id long")
    qs = [0.1, 0.5, 0.9]
    got = {
        (r["g"], r["q"]): r["value"]
        for r in group_quantiles(df, "g", "v", qs, "id").collect()
    }
    import math
    from collections import defaultdict

    byg = defaultdict(list)
    for g, v, i in rows:
        byg[g].append((v, i))
    for g, vals in byg.items():
        vals.sort()
        for q in qs:
            assert got[(g, q)] == vals[math.ceil(q * len(vals)) - 1][0]


# --- histogram quantiles (mergeable, at-scale path) ---


def test_histogram_quantiles_bracket_exact(spark):
    """The [est_lo, est_hi] bin range always contains the exact type-1
    quantile, and narrows with more bins."""
    import random

    from pyspark.sql import Row

    from peerdb_spark.functions.stats import histogram_quantiles

    rng = random.Random(11)
    vals = [rng.randint(0, 100_000) for _ in range(5000)]
    df = spark.createDataFrame([Row(g="a", v=x, i=i) for i, x in enumerate(vals)])
    qs = [100, 2500, 5000, 7500, 9900]
    svals = sorted(vals)
    import math

    exact = {q: svals[math.ceil(q / 10_000 * len(vals)) - 1] for q in qs}
    for nbins in (64, 1024):
        got = {
            r.q_bp: (r.est_lo, r.est_hi)
            for r in histogram_quantiles(df, "v", qs, nbins=nbins).collect()
        }
        for q in qs:
            lo, hi = got[q]
            assert lo <= exact[q] <= hi, (nbins, q, got[q], exact[q])
    wide = {
        r.q_bp: r.est_hi - r.est_lo
        for r in histogram_quantiles(df, "v", qs, nbins=64).collect()
    }
    narrow = {
        r.q_bp: r.est_hi - r.est_lo
        for r in histogram_quantiles(df, "v", qs, nbins=1024).collect()
    }
    assert all(narrow[q] <= wide[q] for q in qs)


def test_histogram_quantiles_constant_column(spark):
    from pyspark.sql import Row

    from peerdb_spark.functions.stats import histogram_quantiles

    df = spark.createDataFrame([Row(v=42)] * 10)
    rows = histogram_quantiles(df, "v", [5000, 10000]).collect()
    assert all(r.est_lo == 42 and r.est_hi == 42 and r.bin == 0 for r in rows)


def test_histogram_quantiles_ignores_nulls(spark):
    from pyspark.sql import Row

    from peerdb_spark.functions.stats import histogram_quantiles

    df = spark.createDataFrame(
        [Row(v=i) for i in range(1, 101)] + [Row(v=None)] * 50
    )
    got = {r.q_bp: (r.est_lo, r.est_hi) for r in histogram_quantiles(df, "v", [5000]).collect()}
    lo, hi = got[5000]
    assert lo <= 50 <= hi


def test_histogram_quantiles_negative_values_property(spark):
    """Hypothesis-style sweep over random integer datasets INCLUDING
    negatives: the bracket always contains the exact type-1 quantile
    (the div/ceil-div arithmetic must stay floor-correct when mn < 0)."""
    import math
    import random

    from pyspark.sql import Row

    from peerdb_spark.functions.stats import histogram_quantiles

    rng = random.Random(17)
    for trial in range(5):
        n = rng.randint(3, 400)
        lo, hi = rng.randint(-100_000, 0), rng.randint(1, 100_000)
        vals = [rng.randint(lo, hi) for _ in range(n)]
        df = spark.createDataFrame([Row(v=x) for x in vals])
        qs = [1, 500, 5000, 9999, 10000]
        svals = sorted(vals)
        got = {
            r.q_bp: (r.est_lo, r.est_hi)
            for r in histogram_quantiles(df, "v", qs, nbins=64).collect()
        }
        for q in qs:
            exact = svals[max(0, math.ceil(q / 10_000 * n) - 1)]
            blo, bhi = got[q]
            assert blo <= exact <= bhi, (trial, q, got[q], exact, n)
