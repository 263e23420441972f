"""Text-analysis operator tests on the driver documents table."""

from pyspark.sql import functions as F

from peerdb_spark.functions import text as TX


def test_token_counts(spark):
    df = spark.createDataFrame(
        [("hello world  foo",), ("",), ("   ",), ("one",)], "text string"
    )
    out = [r[0] for r in df.select(TX.token_count("text")).collect()]
    assert out == [3, 0, 0, 1]


def test_bpe_units(spark):
    df = spark.createDataFrame([("ab 12, c!",)], "text string")
    # units: 'ab', '1', '2', ',', 'c', '!'
    assert df.select(TX.bpe_unit_count("text")).collect()[0][0] == 6


def test_quality_and_ratios(spark, tables):
    docs = tables["documents"]
    out = docs.select(
        "doc_id",
        TX.quality_score("text").alias("q"),
        TX.punct_ratio("text").alias("p"),
        TX.stopword_ratio("text").alias("s"),
    )
    rows = out.collect()
    assert all(0.0 <= r["q"] <= 1.0 for r in rows)
    assert all(0.0 <= r["p"] <= 1.0 for r in rows)


def test_lang_id_signals(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog is in the house"),
            (2, "el perro y la casa de los gatos en madrid"),
            (3, "le chat et les maisons des gens du village"),
            (4, "der hund und die katze ist in den bergen mit"),
            (5, "这是一个中文测试文档"),
            (6, "xyzzy qwerty"),
        ],
        "id long, text string",
    )
    out = {r["id"]: r["lang"] for r in df.select("id", TX.lang_id("text").alias("lang")).collect()}
    assert out == {1: "en", 2: "es", 3: "fr", 4: "de", 5: "zh", 6: "und"}


def test_fingerprint_identical_docs_collide(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghijklmnop"), (2, "abcdefghijklmnop"), (3, "completely different!")],
        "id long, text string",
    )
    out = {r["id"]: r["fp"] for r in df.select("id", TX.fingerprint("text").alias("fp")).collect()}
    assert out[1] == out[2] != out[3]


def test_featurizer_runs_on_documents(spark, tables):
    out = TX.add_text_features(tables["documents"])
    row = out.limit(1).collect()[0]
    assert row["n_tokens"] > 0 and row["fingerprint"] is not None
