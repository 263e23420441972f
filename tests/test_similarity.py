"""Similarity search tests over the embeddings table."""

import pytest
from pyspark.sql import functions as F

from peerdb_spark.functions import similarity as S


@pytest.fixture(scope="module")
def emb(spark, tables):
    return tables["embeddings"].cache()


def test_cosine_self_is_one(spark, emb):
    row = emb.limit(1)
    out = row.select(S.cosine(F.col("embedding"), F.col("embedding")).alias("c")).collect()[0]["c"]
    assert abs(out - 1.0) < 1e-9


def test_brute_force_topk(spark, emb):
    queries = emb.where("vec_id < 3").select(F.col("vec_id").alias("query_id"), "embedding")
    out = S.brute_force_topk(emb, queries, k=5)
    rows = out.collect()
    assert len(rows) == 15
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        # rank 1 should be the query vector itself (cosine 1)
        assert rs[0]["vec_id"] == qid and abs(rs[0]["score"] - 1.0) < 1e-9
        # scores non-increasing
        assert all(a["score"] >= b["score"] for a, b in zip(rs, rs[1:]))


def test_ann_lsh_topk_recall(spark, emb):
    queries = emb.where("vec_id < 10").select(F.col("vec_id").alias("query_id"), "embedding")
    exact = S.brute_force_topk(emb, queries, k=3)
    approx = S.ann_lsh_topk(emb, queries, dim=64, k=3, bits=4)
    # self-match always survives (identical vector → identical bucket)
    self_hits = approx.where("rank = 1 AND vec_id = query_id").count()
    assert self_hits == 10
    # recall@3 vs exact should be reasonable for 4-bit buckets
    e = {(r["query_id"], r["vec_id"]) for r in exact.collect()}
    a = {(r["query_id"], r["vec_id"]) for r in approx.collect()}
    assert len(e & a) / len(e) > 0.3


def test_srp_signature_deterministic(spark, emb):
    s1 = {r["vec_id"]: r["b"] for r in emb.select("vec_id", S.srp_signature(F.col("embedding"), 64, 8).alias("b")).collect()}
    s2 = {r["vec_id"]: r["b"] for r in emb.select("vec_id", S.srp_signature(F.col("embedding"), 64, 8).alias("b")).collect()}
    assert s1 == s2


def test_cosine_near_dup_pairs_runs(spark, emb):
    out = S.cosine_near_dup_pairs(emb, dim=64, threshold=0.8, bits=4)
    for r in out.collect():
        assert r["cos_sim"] >= 0.8 and r["id_a"] < r["id_b"]


def test_sq8_codes_in_range_and_deterministic(spark):
    from peerdb_spark.functions.similarity import sq8_encode, sq8_stats

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    stats = sq8_stats(emb, "embedding")
    codes = sq8_encode(emb, stats, "embedding", "vec_id")
    from pyspark.sql import functions as F

    bad = codes.where(
        F.exists("codes", lambda c: (c < -127) | (c > 127))
        | (F.size("codes") != 64)
    ).count()
    assert bad == 0
    a = {r["vec_id"]: r["codes"] for r in codes.collect()}
    b = {r["vec_id"]: r["codes"] for r in sq8_encode(emb, stats, "embedding", "vec_id").collect()}
    assert a == b


def test_sq8_topk_recall_vs_exact(spark):
    """Quantized top-10 must substantially overlap exact float top-10 —
    the compression is supposed to approximate the inner-product ranking."""
    from pyspark.sql import functions as F

    from peerdb_spark.functions.similarity import (
        dot,
        sq8_encode,
        sq8_stats,
        sq8_topk,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    stats = sq8_stats(emb, "embedding")
    codes = sq8_encode(emb, stats, "embedding", "vec_id")
    approx = sq8_topk(codes, codes.where(F.col("vec_id") < 8), k=10)
    got = {}
    for r in approx.collect():
        got.setdefault(r["query_id"], set()).add(r["vec_id"])
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    exact = (
        emb.crossJoin(F.broadcast(q))
        .select("query_id", "vec_id", dot(F.col("embedding"), F.col("qv")).alias("s"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.desc("s"), F.col("vec_id"))
    ex = exact.withColumn("rk", F.row_number().over(w)).where(F.col("rk") <= 10)
    want = {}
    for r in ex.collect():
        want.setdefault(r["query_id"], set()).add(r["vec_id"])
    overlaps = [len(got[k] & want[k]) for k in want]
    assert sum(overlaps) / len(overlaps) >= 5  # ≥50% mean top-10 recall


def test_knn_graph_mutual_and_bounded(spark):
    from pyspark.sql import functions as F

    from peerdb_spark.functions.similarity import knn_graph

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")).alias("qv"),
    )
    edges = knn_graph(c, "vec_id", "qv", dim=64, bits=8, k=3).collect()
    assert len(edges) > 0
    # ordered pairs, no self loops
    assert all(r["id_a"] < r["id_b"] for r in edges)
    # degree bound: each node appears in at most k mutual edges
    from collections import Counter

    deg = Counter()
    for r in edges:
        deg[r["id_a"]] += 1
        deg[r["id_b"]] += 1
    assert max(deg.values()) <= 3


def test_hard_negatives_are_cross_label(spark):
    from pyspark.sql import functions as F

    from peerdb_spark.functions.similarity import hard_negative_mining

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")).alias("qv"),
        "label",
    )
    out = hard_negative_mining(c, k=3)
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    rows = out.collect()
    assert rows
    for r in rows:
        assert labels[r["anchor_id"]] != labels[r["negative_id"]]
        assert 1 <= r["rank"] <= 3


def test_knn_label_consistency_beats_chance(spark):
    from pyspark.sql import functions as F

    from peerdb_spark.functions.similarity import knn_label_consistency

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: F.round(x.cast("double") * 1000).cast("long")).alias("qv"),
        "label",
    )
    rows = knn_label_consistency(c, k=5).collect()
    n_labels = len(rows)
    match = sum(r["n_matching"] for r in rows) / sum(r["n_neighbors"] for r in rows)
    # the fixture's labels are UNCORRELATED with the vectors, and the probe
    # must say so: consistency lands at the 1/n_labels chance rate
    assert abs(match - 1.0 / n_labels) < 0.05
    # planted clusters: label determines the vector -> consistency ~ 1
    import random

    rnd = random.Random(5)
    rowsp = []
    for i in range(300):
        lab = i % 4
        vec = [1000 if d == lab else rnd.randint(-30, 30) for d in range(64)]
        rowsp.append((i, vec, lab))
    planted = spark.createDataFrame(rowsp, "vec_id long, qv array<long>, label int")
    prows = knn_label_consistency(planted, k=5).collect()
    pmatch = sum(r["n_matching"] for r in prows) / sum(r["n_neighbors"] for r in prows)
    assert pmatch > 0.9


# -- product quantization — r9 --------------------------------------------------


def test_pq_roundtrip_on_codeword_vectors(spark):
    """Vectors that ARE codebook seeds must encode to their own cells,
    and ADC distance to themselves must be 0 (exact integers: the
    quantizer is the identity on its own codewords)."""
    from peerdb_spark.functions.pq import pq_adc_topk, pq_train_encode

    import numpy as np
    rng = np.random.RandomState(3)
    vecs = [(i, [float(x) for x in rng.uniform(-1, 1, 8)]) for i in range(8)]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    # k=8 seeds == the 8 vectors; iters=1 keeps codebooks at the seeds
    codes, books = pq_train_encode(df, dim=8, m=2, k=8, iters=1)
    got = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    assert got == {i: [i, i] for i in range(8)}
    q = df.select(df.vec_id.alias("query_id"), "embedding")
    top1 = pq_adc_topk(codes, q, books, dim=8, m=2, k=1).collect()
    for r in top1:
        assert r["query_id"] == r["vec_id"] and r["dist"] == 0


def test_pq_assign_tiebreak_lowest_cell(spark):
    """The E-step argmin (round 12: min(struct(_d, cell)) hash aggregate,
    replacing the row_number window) must keep the documented tie-break:
    equidistant codewords resolve to the LOWEST cell id. Vector [1,0] is
    exactly between seeds [0,0] (cell 0) and [2,0] (cell 1)."""
    from peerdb_spark.functions.pq import pq_train_encode

    df = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [2.0, 0.0]), (2, [1.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    # k=2 seeds = vectors 0 and 1; iters=1 keeps codebooks at the seeds
    codes, _ = pq_train_encode(df, dim=2, m=1, k=2, iters=1)
    got = {r["vec_id"]: list(r["codes"]) for r in codes.collect()}
    assert got == {0: [0], 1: [1], 2: [0]}


def test_pq_mstep_moves_centroids(spark):
    """Two clusters of near-identical vectors, k=2: after one M-step the
    codes must separate the clusters regardless of seed placement."""
    from peerdb_spark.functions.pq import pq_train_encode

    import numpy as np
    rng = np.random.RandomState(4)
    rows = []
    for i in range(20):
        base = 1.0 if i % 2 else -1.0
        rows.append((i, [base + float(e) for e in rng.uniform(-.01, .01, 4)]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    codes, _ = pq_train_encode(df, dim=4, m=2, k=2, iters=3)
    got = {r["vec_id"]: tuple(r["codes"]) for r in codes.collect()}
    even = {got[i] for i in range(0, 20, 2)}
    odd = {got[i] for i in range(1, 20, 2)}
    assert len(even) == 1 and len(odd) == 1 and even != odd


def test_pq_adc_ranks_by_true_neighborhood(spark):
    """ADC over 4 well-separated clusters must rank same-cluster vectors
    first for every query (the recall property PQ exists for)."""
    from peerdb_spark.functions.pq import pq_adc_topk, pq_train_encode

    import numpy as np
    rng = np.random.RandomState(5)
    centers = np.array([[4, 0, 0, 0], [0, 4, 0, 0], [0, 0, 4, 0], [0, 0, 0, 4]],
                       dtype=float)
    rows = []
    for i in range(40):
        c = centers[i % 4] + rng.uniform(-.05, .05, 4)
        rows.append((i, [float(x) for x in c]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    codes, books = pq_train_encode(df, dim=4, m=2, k=8, iters=3)
    q = df.where("vec_id < 4").select(df.vec_id.alias("query_id"), "embedding")
    top5 = pq_adc_topk(codes, q, books, dim=4, m=2, k=5).collect()
    for r in top5:
        assert r["vec_id"] % 4 == r["query_id"] % 4, (
            r["query_id"], r["vec_id"], r["rank"])


def test_ivf_pq_composition(spark):
    """IVF-PQ: coarse IVF cells prune the candidate set, PQ codes score
    the survivors — the billion-scale ANN layout, composed from the two
    gate-verified pieces. On well-separated clusters, probing only the
    query's cell must still rank same-cluster vectors first, and the
    scored candidate count must shrink to ~1/k of the corpus."""
    import numpy as np
    from pyspark.sql import functions as F

    from peerdb_spark.functions.pq import pq_adc_topk, pq_train_encode
    from peerdb_spark.functions.similarity import (
        ivf_assign,
        ivf_train_centroids,
    )

    rng = np.random.RandomState(7)
    centers = np.eye(4) * 6.0
    rows = [
        (i, [float(x) for x in centers[i % 4] + rng.uniform(-0.05, 0.05, 4)])
        for i in range(80)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = ivf_train_centroids(df, dim=4, k=4, iters=3)
    assigned = ivf_assign(df, cents)  # (vec_id, embedding, cell)
    codes, books = pq_train_encode(df, dim=4, m=2, k=8, iters=3)
    coded = codes.join(assigned.select("vec_id", "cell"), "vec_id")

    # query vec 0: probe ONLY its own cell, then ADC over the survivors
    (qcell,) = assigned.where("vec_id = 0").select("cell").first()
    pruned = coded.where(F.col("cell") == qcell).select("vec_id", "codes")
    n_pruned = pruned.count()
    assert n_pruned <= 80 // 4 + 4  # cluster-sized, not corpus-sized
    q = df.where("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), "embedding")
    top5 = pq_adc_topk(pruned, q, books, dim=4, m=2, k=5).collect()
    assert len(top5) == 5
    for r in top5:
        assert r["vec_id"] % 4 == 0  # same true cluster as the query
