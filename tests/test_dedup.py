"""Dedup family tests: exact, minhash+LSH, simhash, n-gram jaccard."""

import pytest
from pyspark.sql import functions as F

from peerdb_spark.functions import dedup as D


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")
    rows = [
        (1, base),
        (2, base),  # exact dup of 1
        (3, near),  # near dup of 1
        (4, "completely unrelated text about spark query engines and shuffles"),
        (5, "another unrelated document mentioning parquet files and buckets"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup(spark, docs_with_dups):
    out = {r["doc_id"]: r.asDict() for r in D.exact_dedup(docs_with_dups, "text", "doc_id").collect()}
    assert out[1]["is_kept"] and not out[2]["is_kept"]
    assert out[1]["content_hash"] == out[2]["content_hash"]
    assert out[1]["group_size"] == 2
    assert out[3]["is_kept"] and out[3]["group_size"] == 1


def test_minhash_similarity_ordering(spark, docs_with_dups):
    sigs = {r["doc_id"]: r["minhash"] for r in D.minhash_df(docs_with_dups, "text", "doc_id").collect()}
    def est(a, b):
        return sum(x == y for x, y in zip(sigs[a], sigs[b])) / len(sigs[a])
    assert est(1, 2) == 1.0  # identical
    assert est(1, 3) > est(1, 4)  # near-dup beats unrelated


def test_minhash_lsh_pairs_finds_dups(spark, docs_with_dups):
    pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"] for r in D.minhash_lsh_pairs(
        docs_with_dups, "text", "doc_id").collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs  # near-dup lands in a shared band
    assert (1, 4) not in pairs  # unrelated doc does not


def test_simhash_near_dup_distance(spark, docs_with_dups):
    fp = {r["doc_id"]: r["simhash"] for r in D.simhash(docs_with_dups, "text", "doc_id").collect()}
    assert fp[1] == fp[2]
    d13 = bin(fp[1] ^ fp[3]).count("1")
    d14 = bin(fp[1] ^ fp[4]).count("1")
    assert d13 < d14  # near-dup is closer in hamming space


def test_ngram_jaccard(spark, docs_with_dups):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in D.ngram_jaccard_pairs(
        docs_with_dups, "text", "doc_id", min_jaccard=0.0).collect()}
    assert pairs[(1, 2)] == 1.0
    assert pairs[(1, 3)] > 0.7
    assert pairs.get((1, 4), 0.0) < 0.2


def test_exact_dedup_scales_on_documents(spark, tables):
    docs = tables["documents"]
    out = D.exact_dedup(docs, "text", "doc_id")
    kept = out.where("is_kept").count()
    assert 0 < kept <= docs.count()


def test_lsh_verified_pairs_materialized_shingles(spark, tables):
    """The 100-TB path: pass a pre-materialized (did, shh) relation and an
    estimate pre-filter; results equal the self-contained formulation."""
    from pyspark.sql import functions as F

    from peerdb_spark.functions import dedup as DD
    from peerdb_spark.functions.hashing import h64

    docs = tables["documents"]
    base = DD.lsh_verified_pairs(docs, "text", "doc_id", min_jaccard=0.05)
    doc_sh = (
        docs.select(F.col("doc_id").alias("did"),
                    F.explode(DD.shingles("text")).alias("_sh"))
        .select("did", (h64("_sh") % DD.MINHASH_P).alias("shh"))
        .distinct()
    )
    mat = DD.lsh_verified_pairs(docs, "text", "doc_id", min_jaccard=0.05,
                                shingle_hashes=doc_sh)
    key = lambda df: sorted((r["id_a"], r["id_b"], round(r["jaccard"], 9))
                            for r in df.collect())
    assert key(base) == key(mat)
    # estimate pre-filter keeps only strong candidates; surviving pairs match
    filt = DD.lsh_verified_pairs(docs, "text", "doc_id", min_jaccard=0.05,
                                 min_est_jaccard=0.99)
    strong = {(r["id_a"], r["id_b"]) for r in filt.collect()}
    assert strong <= {(a, b) for a, b, _ in key(base)}


def test_incremental_lsh_equals_full_filtered(spark, tables):
    docs = tables["documents"]
    """Incremental candidates (new batch vs maintained signatures) must equal
    the full-corpus LSH pairs restricted to pairs touching a new id."""
    old = docs.where(F.col("doc_id") % 10 != 0)
    new = docs.where(F.col("doc_id") % 10 == 0)
    sigs = D.minhash_df(old, "text", "doc_id")
    _new_sigs, pairs = D.incremental_lsh_pairs(sigs, new, "text", "doc_id")
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    full = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_pairs(docs, "text", "doc_id").collect()
        if r["id_a"] % 10 == 0 or r["id_b"] % 10 == 0
    }
    assert got == full


def test_incremental_lsh_two_batches_maintain_signatures(spark, tables):
    docs = tables["documents"]
    """Signature table appended batch-by-batch: running two incremental
    rounds (appending new_sigs after each) finds the same pairs as one round
    over the combined batch."""
    base = docs.where(F.col("doc_id") % 10 > 1)
    b1 = docs.where(F.col("doc_id") % 10 == 0)
    b2 = docs.where(F.col("doc_id") % 10 == 1)
    sigs = D.minhash_df(base, "text", "doc_id")
    s1, p1 = D.incremental_lsh_pairs(sigs, b1, "text", "doc_id")
    sigs = sigs.unionByName(s1)  # accept batch 1
    _s2, p2 = D.incremental_lsh_pairs(sigs, b2, "text", "doc_id")
    got = {(r["id_a"], r["id_b"]) for r in p1.collect()} | {
        (r["id_a"], r["id_b"]) for r in p2.collect()
    }
    _s12, p12 = D.incremental_lsh_pairs(
        D.minhash_df(base, "text", "doc_id"),
        docs.where(F.col("doc_id") % 10 <= 1), "text", "doc_id",
    )
    combined = {(r["id_a"], r["id_b"]) for r in p12.collect()}
    # two sequential rounds see every combined pair except none: batch-2 round
    # includes batch-1 sigs, and batch-1-internal pairs came from round 1
    assert got == combined


def test_simhash_pairs_banded(spark, docs_with_dups):
    """Exact dups at hamming 0; banding finds them without an all-pairs join;
    every returned pair respects the hamming bound."""
    out = D.simhash_pairs(docs_with_dups, "text", "doc_id", max_hamming=3)
    rows = {(r["id_a"], r["id_b"]): r["hamming"] for r in out.collect()}
    assert rows.get((1, 2)) == 0  # exact dup pair
    assert all(h <= 3 for h in rows.values())


def test_skew_guard_drops_oversized_buckets(spark):
    """Degenerate corpus: N identical docs put every banded bucket at size N.
    With max_bucket_size < N the guard drops all candidate buckets (no pairs,
    no quadratic join); with the default threshold all pairs are found. The
    declared oracle SQL carries the SAME guard (QUALIFY bucket count), so
    both engines compute the guarded relation identically."""
    docs = spark.createDataFrame(
        [(i, "the same exact text content repeated in every document here") for i in range(12)],
        "doc_id long, text string",
    )
    assert D.simhash_pairs(docs, "text", "doc_id").count() == 12 * 11 // 2
    assert D.simhash_pairs(docs, "text", "doc_id", max_bucket_size=5).count() == 0
    assert D.minhash_lsh_pairs(docs, "text", "doc_id").count() == 12 * 11 // 2
    assert D.minhash_lsh_pairs(docs, "text", "doc_id", max_bucket_size=5).count() == 0


def test_connected_components_random_graphs(spark):
    """Alternating-star CC vs a brute-force union-find on random graphs."""
    import random

    rng = random.Random(7)
    for trial in range(4):
        n = rng.randint(2, 40)
        m = rng.randint(1, 60)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        if not edges:
            edges = [(0, 1)]
        # brute force union-find
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        in_graph = {x for e in edges for x in e}
        expected = {}
        for x in in_graph:
            expected[x] = find(x)
        # expected rep must be the component MIN: path compression above can
        # leave a non-min root only if union order broke it — normalize
        comp_min = {}
        for x in in_graph:
            r = find(x)
            comp_min[r] = min(comp_min.get(r, x), x)
        expected = {x: comp_min[find(x)] for x in in_graph}

        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r["node"]: r["rep"]
            for r in D.connected_components(df, "src", "dst").collect()
        }
        assert got == expected, f"trial {trial}: {sorted(got.items())[:10]}"


def test_connected_components_chain_and_star(spark):
    """A long chain (worst case for naive propagation) and a star."""
    chain = [(i, i + 1) for i in range(50)]
    df = spark.createDataFrame(chain, "src long, dst long")
    got = {r["node"]: r["rep"] for r in D.connected_components(df, "src", "dst").collect()}
    assert got == {i: 0 for i in range(51)}
    star = [(100, 100 + i) for i in range(1, 10)]
    got2 = {
        r["node"]: r["rep"]
        for r in D.connected_components(
            spark.createDataFrame(star, "src long, dst long"), "src", "dst"
        ).collect()
    }
    assert got2 == {100 + i: 100 for i in range(10)}


def test_connected_components_distributed_path_matches_driver(spark):
    """driver_threshold=0 forces the star-alternation path; it must agree
    with the (default) driver union-find path on random graphs."""
    import random

    rng = random.Random(13)
    # the two random graphs run as ONE disjoint union (node ids offset by
    # 1000): components never cross the offset, so CC(union) == union of
    # CCs and each iterative star-alternation pass runs once, not twice
    edges = []
    for trial in range(2):
        n = rng.randint(5, 60)
        t_edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(80)]
        t_edges = [(a, b) for a, b in t_edges if a != b] or [(0, 1)]
        edges += [(trial * 1000 + a, trial * 1000 + b) for a, b in t_edges]
    df = spark.createDataFrame(edges, "src long, dst long")
    fast = {
        (r["node"], r["rep"])
        for r in D.connected_components(df, "src", "dst").collect()
    }
    dist = {
        (r["node"], r["rep"])
        for r in D.connected_components(
            df, "src", "dst", driver_threshold=0
        ).collect()
    }
    assert fast == dist


def test_incremental_lsh_ingest_count_log_equals_full_recount(spark, tables):
    """r4 verdict item #1: maintained state (banded table + count log,
    appended over k batches) must be equivalent to a from-scratch recount —
    summed count log == full-corpus bucket counts, and per-batch pairs with
    a tiny max_bucket_size equal the guarded full recompute restricted to
    the batch."""
    docs = tables["documents"]
    base = docs.where(F.col("doc_id") % 10 > 2)
    batches = [
        docs.where(F.col("doc_id") % 10 == 0),
        docs.where(F.col("doc_id") % 10 == 1),
        docs.where(F.col("doc_id") % 10 == 2),
    ]
    maxb = 2  # small enough that the fixture actually trips the guard
    sigs = D.minhash_df(base, "text", "doc_id")
    banded = D.lsh_band_rows(sigs, "doc_id")
    counts = D.lsh_bucket_counts(banded)
    all_pairs = set()
    seen = base
    for nb in batches:
        new_sigs, new_banded, delta, pairs = D.incremental_lsh_ingest(
            sigs, banded, counts, nb, "text", "doc_id", max_bucket_size=maxb
        )
        expect = {
            (r["id_a"], r["id_b"])
            for r in D.minhash_lsh_pairs(
                seen.unionByName(nb), "text", "doc_id",
                max_bucket_size=maxb,
            ).collect()
        }
        new_ids = {r["doc_id"] for r in nb.select("doc_id").collect()}
        expect_batch = {
            (a, b) for a, b in expect
            if (a in new_ids or b in new_ids)
            # pairs between this batch and ALREADY-retired (guard-dropped)
            # history can't re-match pairs among retired old docs; restrict
            # to pairs the incremental run could see
        }
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert got == expect_batch
        all_pairs |= got
        # accept the batch: append to maintained state. Checkpoint the
        # accumulated state so later rounds (and their full-recount
        # expectations) don't re-execute the whole minhash history per
        # action — the recompute was most of this test's wall time.
        sigs = sigs.unionByName(new_sigs).localCheckpoint(eager=True)
        banded = banded.unionByName(new_banded).localCheckpoint(eager=True)
        counts = counts.unionByName(delta).localCheckpoint(eager=True)
        seen = seen.unionByName(nb).localCheckpoint(eager=True)
    # the count LOG (multiple rows per key) sums to the full recount
    log_tot = {
        (r["band"], r["band_hash"]): r["tot"]
        for r in counts.groupBy("band", "band_hash")
        .agg(F.sum("cnt").alias("tot"))
        .collect()
    }
    full_tot = {
        (r["band"], r["band_hash"]): r["cnt"]
        for r in D.lsh_bucket_counts(
            D.lsh_band_rows(D.minhash_df(seen, "text", "doc_id"), "doc_id")
        ).collect()
    }
    assert log_tot == full_tot
    assert any(v > maxb for v in full_tot.values()), "guard never exercised"
    # compaction collapses the log to one row per key with the same totals
    comp = D.compact_bucket_counts(counts)
    assert comp.groupBy("band", "band_hash").count().where("count > 1").count() == 0
    comp_tot = {(r["band"], r["band_hash"]): r["cnt"] for r in comp.collect()}
    assert comp_tot == full_tot


def test_hash64_incremental_equals_full_restricted(spark):
    """Round-10 incremental twin: pairs(state, new) == pairs(state ∪ new)
    restricted to pairs touching a new id — same banding, same skew
    guard sizing, same exact verify."""
    import random

    from peerdb_spark.functions.dedup import (
        hash64_hamming_pairs,
        hash64_hamming_pairs_incremental,
    )

    rng = random.Random(11)
    base = [rng.getrandbits(63) for _ in range(60)]
    rows = []
    for i, h in enumerate(base):
        rows.append((i, h))
        if i % 3 == 0:  # a near-dup within 2 bits
            rows.append((1000 + i, h ^ (1 << rng.randrange(64))))
    df = spark.createDataFrame(rows, "id long, h long")
    state = df.where("id < 500 and id % 2 = 0")
    new = df.subtract(state)
    full = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hash64_hamming_pairs(df, "h", "id", bands=4,
                                      max_hamming=3).collect()
    }
    new_ids = {r["id"] for r in new.collect()}
    want = {p for p in full if p[0] in new_ids or p[1] in new_ids}
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in hash64_hamming_pairs_incremental(
            state, new, "h", "id", bands=4, max_hamming=3).collect()
    }
    assert got == want and len(want) > 10
    # empty batch → no pairs
    assert hash64_hamming_pairs_incremental(
        df, df.where("id < 0"), "h", "id").count() == 0


def test_hamming_pairs_from_equals_simhash_pairs(spark):
    """r12 factoring: simhash_pairs == simhash(df) |> hamming_pairs_from
    (the state-consuming form CorpusStateView's near-dup surface uses),
    including at a wider bands/max_hamming setting."""
    from peerdb_spark.functions import dedup as DD

    rows = [(i, ("spark engine corpus near duplicate detection body "
                 * 4) + (f" tail{i}" if i % 3 else " shared"))
            for i in range(24)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    direct = {tuple(r) for r in DD.simhash_pairs(
        df, "text", "doc_id", bands=8, max_hamming=6).collect()}
    sh = DD.simhash(df, "text", "doc_id")
    via_state = {tuple(r) for r in DD.hamming_pairs_from(
        sh, "simhash", "doc_id", bands=8, max_hamming=6).collect()}
    assert direct == via_state and len(direct) > 0
