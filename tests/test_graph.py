"""Fixed-point PageRank: pure-python reference equality, centrality sanity,
determinism (functions/graph.py)."""

from pyspark.sql import Row

from peerdb_spark.functions.graph import PR_SCALE, pagerank


def _ref_pagerank(edges, iters=3, scale=PR_SCALE):
    """Same integer arithmetic, plain Python."""
    from collections import defaultdict

    deg = defaultdict(int)
    for s, d in edges:
        deg[s] += 1
    r = {n: scale for n in deg}
    for _ in range(iters):
        s = defaultdict(int)
        for a, b in edges:
            s[b] += r[a] // deg[a]
        r = {n: (15 * scale + 85 * s.get(n, 0)) // 100 for n in deg}
    return r


def _both_dirs(pairs):
    return [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]


def test_pagerank_matches_python_reference(spark):
    import random

    rng = random.Random(5)
    pairs = {(rng.randint(0, 30), rng.randint(0, 30)) for _ in range(80)}
    edges = _both_dirs([(a, b) for a, b in pairs if a != b])
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    got = {r.node: r.rank_q for r in pagerank(df, iters=3, materialize=False).collect()}
    assert got == _ref_pagerank(edges, iters=3)


def test_pagerank_star_center_dominates(spark):
    edges = _both_dirs([(0, i) for i in range(1, 9)])
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges])
    got = {r.node: r.rank_q for r in pagerank(df, iters=4, materialize=False).collect()}
    assert got[0] > max(got[i] for i in range(1, 9))
    # leaves are symmetric -> identical ranks
    assert len({got[i] for i in range(1, 9)}) == 1


def test_pagerank_deterministic_across_runs(spark):
    edges = _both_dirs([(i, (i * 7 + 3) % 20) for i in range(20) if i != (i * 7 + 3) % 20])
    df = spark.createDataFrame([Row(src=a, dst=b) for a, b in edges]).repartition(16)
    a = sorted(map(tuple, pagerank(df, iters=3).collect()))
    b = sorted(map(tuple, pagerank(df, iters=3).collect()))
    assert a == b
