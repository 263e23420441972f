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
