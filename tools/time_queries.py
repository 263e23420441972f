"""Time a subset of queries with the EXACT bench.py protocol (fresh session,
same warmups, _clear_lingering_state between queries, warm best-of-2 with the
25% confirmation loop). For A/B measurement during optimization work.

Usage: python tools/time_queries.py name1,name2,... [--sf DIR] [--cpus N]
Prints one JSON line {name: best_sec}.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from peerdb_spark import get_spark
    from peerdb_spark.queries import QUERIES

    spark = get_spark("time_queries", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # bench.py warmups (abridged): JVM text/classloading + python worker
    from pyspark.sql import functions as F

    from peerdb_spark.functions import text as TX

    try:
        QUERIES["passthrough_agg"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
        docs.select(
            TX.lang_id(F.col("text")), TX.quality_score(F.col("text"))
        ).write.format("noop").mode("overwrite").save()

        def _noop_batches(it):
            yield from it

        docs.select("doc_id").mapInPandas(_noop_batches, "doc_id long").write.format(
            "noop"
        ).mode("overwrite").save()
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(50)
        k = emb.select(F.col("vec_id").alias("k"), "embedding")
        k.join(F.broadcast(emb.select(F.col("vec_id").alias("k"))), "k").write.format(
            "noop"
        ).mode("overwrite").save()
    except Exception:  # noqa: BLE001
        pass

    def _clear() -> None:
        try:
            sc = spark.sparkContext
            it = sc._jsc.sc().getPersistentRDDs().iterator()
            while it.hasNext():
                it.next()._2().unpersist(False)
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001
            pass
        gc.collect()

    out = {}
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()

        def _run() -> float:
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return time.time() - t0

        runs = [_run(), _run()]
        while len(runs) < 4:
            b1, b2 = sorted(runs)[:2]
            if b2 / b1 <= 1.25:
                break
            runs.append(_run())
        out[name] = round(min(runs), 3)
        del df
        _clear()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
