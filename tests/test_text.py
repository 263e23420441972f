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


def test_pack_plan_chunking(spark):
    """Packing is a per-shard prefix sum: offsets chain, boundaries chunk."""
    from peerdb_spark.functions.sampling import pack_plan

    rows = [(i, "w " * (10 * (i % 3 + 1))) for i in range(12)]  # 10/20/30 toks
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_plan(df, "text", "doc_id", window=25, n_shards=2)
    got = {r["doc_id"]: r.asDict() for r in out.collect()}
    # shard 0: docs 0,2,4,... with token counts 10,30,20,10,30,20
    assert got[0]["shard"] == 0 and got[0]["pack_id"] == 0 and got[0]["pack_offset"] == 0
    assert got[2]["pack_id"] == 0 and got[2]["pack_offset"] == 10  # 10 before
    assert got[4]["pack_id"] == 1 and got[4]["pack_offset"] == 15  # 40 before
    # shard 1: docs 1,3,5,... with counts 20,10,30,...
    assert got[1]["shard"] == 1 and got[1]["pack_id"] == 0
    assert got[3]["pack_id"] == 0 and got[3]["pack_offset"] == 20
    assert got[5]["pack_id"] == 1 and got[5]["pack_offset"] == 5  # 30 before
    # every doc placed exactly once, token counts right
    assert all(got[i]["n_tokens"] == 10 * (i % 3 + 1) for i in range(12))


def test_stratified_sample_deterministic_quota(spark):
    from peerdb_spark.functions.sampling import stratified_sample

    rows = [(i, "en" if i % 3 else "fr") for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    s1 = sorted((r["lang"], r["doc_id"]) for r in
                stratified_sample(df, "lang", "doc_id", quota=5).collect())
    s2 = sorted((r["lang"], r["doc_id"]) for r in
                stratified_sample(df, "lang", "doc_id", quota=5).collect())
    assert s1 == s2  # reproducible
    from collections import Counter

    counts = Counter(lang for lang, _ in s1)
    assert counts == {"en": 5, "fr": 5}
    # different seed → different (with overwhelming probability) selection
    s3 = sorted((r["lang"], r["doc_id"]) for r in
                stratified_sample(df, "lang", "doc_id", quota=5, seed="other").collect())
    assert s3 != s1


def test_text_ops_null_and_unicode_safe(spark):
    from pyspark.sql import functions as F

    from peerdb_spark.functions import corpus as CP
    from peerdb_spark.functions import text as TX

    df = spark.createDataFrame(
        [(1, None), (2, "héllo wörld 你好 🚀 test"), (3, "plain text here ok")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            TX.token_count("text").alias("n"),
            TX.lang_id(F.col("text")).alias("lang"),
            TX.quality_score(F.col("text")).alias("q"),
        ).collect()
    }
    assert rows[1]["n"] is None and rows[1]["q"] is None
    assert rows[1]["lang"] == "und"  # NULL text must not claim a language
    assert rows[2]["n"] == 5  # unicode tokens count fine
    # fingerprint/scrub/pii propagate NULL without crashing
    assert TX.fingerprint_df(df).where(F.col("doc_id") == 1).collect()[0]["fingerprint"] is None
    assert CP.redact_pii(df).count() == 3


def test_pack_plan_hypothesis_matches_reference(spark):
    """Property: per-shard concat-then-chunk placement equals a plain-Python
    prefix-sum over the same deterministic (shard, id) order."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from peerdb_spark.functions.sampling import pack_plan
    from pyspark.sql import functions as F

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        lens=st.lists(st.integers(min_value=0, max_value=30), min_size=1, max_size=25),
        window=st.integers(min_value=1, max_value=40),
        n_shards=st.integers(min_value=1, max_value=4),
    )
    def check(lens, window, n_shards):
        rows = [(i, " ".join(["w"] * n) if n else "") for i, n in enumerate(lens)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["shard"], r["pack_id"], r["pack_offset"])
            for r in pack_plan(df, "text", "doc_id", window=window, n_shards=n_shards).collect()
        }
        want = {}
        for s in range(n_shards):
            cum = 0
            for i, n in enumerate(lens):
                if i % n_shards != s:
                    continue
                want[i] = (s, cum // window, cum % window)
                cum += n
        assert got == want, (lens, window, n_shards)

    check()


# -- crawl extraction (html_to_text / url_normalize) — r9 ----------------------


def test_html_to_text_hand_vectors(spark):
    from pyspark.sql import functions as F

    from peerdb_spark.functions.text import html_to_text

    rows = [
        # script/style bodies vanish even when they contain tags/quotes
        ('<script>var a = "<p>x</p>";</script>ok<style>p{}</style>', "ok"),
        # entity decode order: &amp;lt; must stay a literal '&lt;'
        ("A &amp;lt; B &lt;C&gt; &quot;q&quot; &#39;s&#39;&nbsp;!",
         "A &lt; B <C> \"q\" 's' !"),
        ("<!-- note -->text<br>more\n\n  spaced\tout", "text more spaced out"),
        ("plain", "plain"),
        ("<div><p>nested <b>bold</b></p></div>", "nested bold"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in rows], "html string")
    got = [r["t"] for r in df.select(html_to_text("html").alias("t")).collect()]
    assert got == [w for _, w in rows]


def test_url_normalize_hand_vectors(spark):
    from peerdb_spark.functions.text import url_normalize

    rows = [
        ("HTTP://Example.COM:80/Path?a=1&utm_source=x&b=2#f",
         "http://example.com/Path?a=1&b=2"),
        ("https://Site.org:443", "https://site.org/"),
        ("https://site.org:8443/x?utm_a=1", "https://site.org:8443/x"),
        ("http://a.b/c/d?x=1", "http://a.b/c/d?x=1"),
        ("http://h/?utm_a=1&utm_b=2", "http://h/"),
        ("HTTPS://H.io/p?utm_x=9&keep=1", "https://h.io/p?keep=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in rows], "url string")
    got = [r["u"] for r in df.select(url_normalize("url").alias("u")).collect()]
    assert got == [w for _, w in rows]
