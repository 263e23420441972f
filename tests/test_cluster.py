"""Distributed fixed-point k-means (functions/cluster.py).

The declared query `kmeans_clusters` is value-verified against the unrolled
DuckDB oracle by the gate; these tests pin the algorithmic contract on
hand-built inputs: a pure-Python reference implementation must agree
exactly (same quantization / trunc-div / tiebreak rules), runs must be
deterministic, and empty clusters must retire.
"""

from __future__ import annotations

import random

from peerdb_spark.functions.cluster import SCALE, _trunc_div, kmeans_assign


def _ref_kmeans(vecs: dict[int, list[float]], k: int, iters: int, scale: int = SCALE):
    """Single-node reference of the exact fixed-point rules."""
    q = {
        i: [int(round_half_away(x * scale)) for x in v] for i, v in vecs.items()
    }
    ids = sorted(q)
    cents = [(j, [x * scale for x in q[ids[j]]]) for j in range(k)]

    def assign(cents):
        out = {}
        for i in ids:
            best = min(
                (
                    (
                        sum((a * scale - b) ** 2 for a, b in zip(q[i], m)),
                        cell,
                    )
                    for cell, m in cents
                )
            )
            out[i] = best[1]
        return out

    for _ in range(iters - 1):
        a = assign(cents)
        by_cell: dict[int, list[int]] = {}
        for i, c in a.items():
            by_cell.setdefault(c, []).append(i)
        cents = [
            (
                cell,
                [
                    _trunc_div(sum(q[i][d] for i in members) * scale, len(members))
                    for d in range(len(q[ids[0]]))
                ],
            )
            for cell, members in sorted(by_cell.items())
        ]
    return assign(cents)


def round_half_away(x: float) -> float:
    import math

    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


def test_matches_pure_python_reference(spark):
    rng = random.Random(7)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(6)] for i in range(40)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()], "vec_id long, embedding array<float>"
    )
    # reference quantizes from the FLOAT32 values the DataFrame stores
    stored = {r["vec_id"]: list(r["embedding"]) for r in df.collect()}
    got = {
        r["vec_id"]: r["cell"]
        for r in kmeans_assign(df, k=4, iters=3).collect()
    }
    assert got == _ref_kmeans(stored, k=4, iters=3)


def test_deterministic_and_total(spark):
    rng = random.Random(11)
    df = spark.createDataFrame(
        [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(30)],
        "vec_id long, embedding array<float>",
    )
    a = sorted(kmeans_assign(df, k=3, iters=2).collect())
    b = sorted(kmeans_assign(df, k=3, iters=2).collect())
    assert a == b
    assert len(a) == 30
    assert {r["cell"] for r in a} <= {0, 1, 2}


def test_empty_cluster_retires(spark):
    # ids 0 and 1 share a vector: the duplicate ties to cell 0 (lowest-cell
    # tiebreak), cluster 1 receives no members and is retired; remaining
    # rounds run with k-1 centroids.
    rows = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [10.0, 10.0])] + [
        (i, [10.0 + (i % 3) * 0.01, 10.0]) for i in range(3, 12)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["cell"] for r in kmeans_assign(df, k=3, iters=3).collect()}
    assert set(out.values()) == {0, 2}
    assert out[0] == 0 and out[1] == 0 and out[2] == 2


def test_assign_strategy_join_equals_literal(spark):
    """The broadcast-join E-step must reproduce the literal-centroid path
    exactly — including lowest-cell tiebreaks on duplicate vectors."""
    rng = random.Random(23)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(50)]
    rows += [(100 + i, rows[i][1]) for i in range(8)]  # exact duplicates
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    lit = sorted(
        kmeans_assign(df, k=5, iters=3, assign_strategy="literal").collect()
    )
    jn = sorted(kmeans_assign(df, k=5, iters=3, assign_strategy="join").collect())
    assert lit == jn and len(lit) == 58


def test_assign_join_plan_flat_at_large_k(spark):
    """k=4096 codebook: the literal plan would embed k·dim constants (codegen
    blowup); the join plan's size and build time are flat in k, and 'auto'
    switches to it above LITERAL_CODEBOOK_MAX."""
    import time

    from peerdb_spark.functions.cluster import LITERAL_CODEBOOK_MAX, assign_cells

    qdf = spark.createDataFrame(
        [(i, [i % 7, -(i % 5), 3, 1]) for i in range(20)],
        "vec_id long, qv array<bigint>",
    )

    def build(k):
        cents = [(j, [j % 11, j % 13, -j % 7, 5]) for j in range(k)]
        t0 = time.time()
        df = assign_cells(qdf, cents, SCALE, "auto")
        plan = df._jdf.queryExecution().executedPlan().toString()
        return time.time() - t0, len(plan), plan

    assert 64 * 4 <= LITERAL_CODEBOOK_MAX < 4096 * 4
    t_small, n_small, _ = build(2048 // 4)  # still literal path
    t_big, n_big, plan_big = build(4096)
    assert "BroadcastNestedLoopJoin" in plan_big  # deliberate k-row broadcast
    assert n_big < max(n_small, 20_000)  # join plan never scales with k
    assert t_big < max(t_small * 3, 10.0)
    # output stays correct at large k: every row assigned exactly once
    small_out = assign_cells(qdf, [(j, [j, j, j, j]) for j in range(4096)],
                             SCALE, "join")
    assert small_out.count() == 20


def test_kmeans_hypothesis_random_inputs(spark):
    """Property: distributed fixed-point k-means == the pure-Python
    reference on random vector sets, k, and round counts."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    vec = st.lists(
        st.floats(min_value=-4, max_value=4, allow_nan=False, width=32),
        min_size=3, max_size=3,
    )

    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        vecs=st.lists(vec, min_size=4, max_size=20),
        k=st.integers(min_value=2, max_value=4),
        iters=st.integers(min_value=1, max_value=3),
    )
    def check(vecs, k, iters):
        if k > len(vecs):
            return
        df = spark.createDataFrame(
            [(i, v) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>",
        )
        stored = {r["vec_id"]: list(r["embedding"]) for r in df.collect()}
        got = {r["vec_id"]: r["cell"] for r in kmeans_assign(df, k=k, iters=iters).collect()}
        assert got == _ref_kmeans(stored, k=k, iters=iters)

    check()


# --- PCA power iteration ---


def test_pca_aligns_with_numpy_on_planted_direction(spark):
    import numpy as np
    from pyspark.sql import Row

    from peerdb_spark.functions.cluster import (
        PCA_SCALE,
        PCA_VSCALE,
        pca_project,
        power_iteration,
        gramian,
    )

    rng = np.random.RandomState(7)
    direction = rng.randn(16)
    direction /= np.linalg.norm(direction)
    # strong planted component + small noise
    data = np.outer(rng.randn(300) * 2.0, direction) + rng.randn(300, 16) * 0.05
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in row]) for i, row in enumerate(data)]
    )

    got = {r.vec_id: r.pc1_q for r in pca_project(df, dim=16, iters=5).collect()}

    centered = data - data.mean(axis=0)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    true_pc = vt[0]
    true_proj = centered @ true_pc
    fixed = np.array([got[i] for i in range(300)], dtype=float)
    corr = abs(np.corrcoef(fixed, true_proj)[0, 1])
    assert corr > 0.999, corr


def test_power_iteration_zero_matrix_keeps_seed(spark):
    from peerdb_spark.functions.cluster import PCA_VSCALE, power_iteration

    assert power_iteration({}, 4, iters=3) == [PCA_VSCALE] * 4


def test_pca_matches_pure_python_reference(spark):
    """Spark distributed Gram+projection ≡ a NumPy-free integer reference."""
    import numpy as np
    from pyspark.sql import Row

    from peerdb_spark.functions.cluster import (
        PCA_SCALE,
        PCA_VSCALE,
        _trunc_div,
        pca_project,
        power_iteration,
    )

    rng = np.random.RandomState(3)
    data = rng.randn(40, 8) * 0.4
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in row]) for i, row in enumerate(data)]
    )
    got = {r.vec_id: r.pc1_q for r in pca_project(df, dim=8, iters=4).collect()}

    def q(x):
        # round half away from zero, like Spark/DuckDB round()
        import decimal

        return int(
            decimal.Decimal(x * PCA_SCALE).quantize(0, rounding=decimal.ROUND_HALF_UP)
        )

    qv = [[q(x) for x in row] for row in data]
    n, d = len(qv), 8
    G = {
        (i, j): sum(r[i - 1] * r[j - 1] for r in qv)
        for i in range(1, d + 1)
        for j in range(1, d + 1)
    }
    s = {i: sum(r[i - 1] for r in qv) for i in range(1, d + 1)}
    cmat = {(i, j): n * G[(i, j)] - s[i] * s[j] for (i, j) in G}
    v = power_iteration(cmat, d, iters=4)
    expect = {i: sum(a * b for a, b in zip(qv[i], v)) for i in range(n)}
    assert got == expect


def test_pca2_second_component_aligns_with_numpy(spark):
    import numpy as np
    from pyspark.sql import Row

    from peerdb_spark.functions.cluster import pca_project2

    rng = np.random.RandomState(21)
    d1 = rng.randn(16); d1 /= np.linalg.norm(d1)
    # second direction orthogonal to the first, weaker but clearly above noise
    d2 = rng.randn(16); d2 -= d2 @ d1 * d1; d2 /= np.linalg.norm(d2)
    data = (
        np.outer(rng.randn(400) * 3.0, d1)
        + np.outer(rng.randn(400) * 1.2, d2)
        + rng.randn(400, 16) * 0.03
    )
    df = spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in row]) for i, row in enumerate(data)]
    )
    got = {r.vec_id: (r.pc1_q, r.pc2_q) for r in pca_project2(df, dim=16, iters=6).collect()}
    centered = data - data.mean(axis=0)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    p1 = centered @ vt[0]
    p2 = centered @ vt[1]
    f1 = np.array([got[i][0] for i in range(400)], dtype=float)
    f2 = np.array([got[i][1] for i in range(400)], dtype=float)
    assert abs(np.corrcoef(f1, p1)[0, 1]) > 0.999
    assert abs(np.corrcoef(f2, p2)[0, 1]) > 0.99
