"""Every operator must degrade gracefully on EMPTY inputs (a fresh mirror's
first batch, a filtered-to-nothing stratum, an idle stream) — no ANSI
division/overflow errors, no element_at on empty arrays, no driver crashes."""

from pyspark.sql import functions as F

from peerdb_spark.functions import corpus as CP
from peerdb_spark.functions import dedup as DD
from peerdb_spark.functions import sampling as S
from peerdb_spark.functions import similarity as SIM
from peerdb_spark.functions.bpe import bpe_train
from peerdb_spark.functions.stats import group_quantiles
from peerdb_spark.operators import asof_join, interval_join


def test_operators_on_empty_inputs(spark):
    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    empty_emb = spark.createDataFrame(
        [], "vec_id long, embedding array<float>, label int"
    )
    assert DD.exact_dedup(empty_docs, "text", "doc_id").count() == 0
    assert DD.minhash_lsh_pairs(empty_docs, "text", "doc_id").count() == 0
    assert (
        DD.connected_components(
            spark.createDataFrame([], "src long, dst long"), "src", "dst"
        ).count()
        == 0
    )
    assert CP.gopher_quality(empty_docs).count() == 0
    assert CP.scrub_repeated_chunks(empty_docs).count() == 0
    assert CP.redact_pii(empty_docs).count() == 0
    acc, hashes = CP.incremental_clean(
        spark.createDataFrame([], "content_hash long"), empty_docs
    )
    assert acc.count() == 0 and hashes.count() == 0
    assert (
        SIM.sq8_encode(empty_emb, SIM.sq8_stats(empty_emb), "embedding", "vec_id").count()
        == 0
    )
    assert (
        SIM.knn_graph(
            empty_emb.select("vec_id", F.col("embedding").cast("array<long>").alias("qv"))
        ).count()
        == 0
    )
    src = empty_docs.withColumn("source", F.lit("s"))
    assert S.mixture_sample(src, {"s": 0.5}).count() == 0
    assert S.token_budget_sample(src, {"s": 100}).count() == 0
    assert S.length_batch_plan(empty_docs, 16).count() == 0
    assert (
        group_quantiles(
            empty_docs.withColumn("g", F.lit("a")), "g", "doc_id", [0.5], "doc_id"
        ).count()
        == 0
    )
    el = spark.createDataFrame([], "k int, ts timestamp, a int")
    er = spark.createDataFrame([], "k int, ts timestamp, b int")
    assert asof_join(el, er, on="k").count() == 0
    assert (
        interval_join(
            spark.createDataFrame([], "k int, ts timestamp"),
            spark.createDataFrame([], "k int, lo timestamp, hi timestamp"),
            on="k", point_ts="ts", start_col="lo", end_col="hi", bucket_seconds=60,
        ).count()
        == 0
    )
    merges, vocab = bpe_train(empty_docs, "text", 2)
    assert merges == [] and vocab.count() == 0
