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
