"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: the exactness baseline. Broadcast the (small)
  query set against the corpus — a broadcast-nested-loop with JVM-side
  zip_with/aggregate arithmetic; no Python, no shuffle of the corpus.
- LSH-bucketed ANN (random-hyperplane / SRP): the scale path. Each vector gets
  a b-bit signature from sign(v·h_i) for deterministic pseudo-random
  hyperplanes; candidates = same-bucket vectors, then exact cosine re-rank
  within buckets. At 100 TB the corpus shuffles once by bucket key and each
  query probes one bucket (+ optional multi-probe neighbors).
- embedding-cosine near-dup: all corpus pairs above a cosine threshold within
  LSH buckets.

Determinism: hyperplane components derive from h64(seed:i:j), mapped to ±1 —
reproducible in the DuckDB oracle without a shared RNG.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from peerdb_spark.functions.hashing import h64


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right double-precision dot product (JVM-side)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k per query: broadcast(queries) ⨯ corpus → window rank.

    Returns (query_id, rank, vec_id, score). Deterministic tiebreak on vec_id.
    The corpus is scanned once; per-row work is O(|queries| · dim) in
    codegen'd JVM arithmetic. For large query sets, chunk the queries or use
    ann_lsh_topk.
    """
    q = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    )
    scored = corpus.select(F.col(id_col), F.col(vec_col)).crossJoin(F.broadcast(q)).select(
        query_id_col,
        id_col,
        cosine(F.col(vec_col), F.col("_qvec")).alias("score"),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "score")
    )


def srp_hyperplane(dim: int, plane_idx: int, seed: int = 42) -> list[int]:
    """Deterministic ±1 hyperplane components via the shared hash (driver-side
    constants — folded into the plan as literals, reproducible in SQL)."""
    import hashlib

    out = []
    for j in range(dim):
        hx = hashlib.md5(f"{seed}:{plane_idx}:{j}".encode()).hexdigest()[:15]
        out.append(1 if int(hx, 16) & 1 else -1)
    return out


def srp_signature(vec: Column, dim: int, bits: int = 8, seed: int = 42) -> Column:
    """Signed-random-projection bucket id: bit i = sign(v · h_i)."""
    sig = F.lit(0)
    for i in range(bits):
        plane = srp_hyperplane(dim, i, seed)
        # ±1 dot product as a sum of signed components — JVM arithmetic
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(p) for p in plane]),
                lambda x, h: x.cast("double") * h.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj >= 0, F.lit(2**i)).otherwise(F.lit(0))
    return sig.cast("int")


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: SRP bucket join then exact cosine re-rank in-bucket.

    Recall < 1 by design (bucket boundary losses); bits trades recall for
    bucket size (2^bits buckets). The corpus-side signature is computed once
    per row and the join is an equi-join on the bucket id — shuffle scales
    with corpus size, probe cost with bucket occupancy, never |corpus|·|queries|.
    """
    c = corpus.select(
        F.col(id_col), F.col(vec_col), srp_signature(F.col(vec_col), dim, bits, seed).alias("_bkt")
    )
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        srp_signature(F.col(vec_col), dim, bits, seed).alias("_bkt"),
    )
    scored = c.join(F.broadcast(q), "_bkt").select(
        query_id_col, id_col, cosine(F.col(vec_col), F.col("_qvec")).alias("score")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "score")
    )


def ivf_train_centroids(
    corpus: DataFrame,
    dim: int,
    k: int = 16,
    iters: int = 5,
    sample: int = 2000,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> list[list[float]]:
    """Deterministic IVF coarse quantizer: Lloyd iterations on a driver-side
    sample (first `sample` vectors by id; first k as seeds — no RNG, so
    repeated builds produce identical centroids).

    At 100 TB the sample stays driver-sized (centroid training needs only
    thousands of points); the expensive steps — assignment and probing —
    run distributed in ivf_assign/ivf_topk.
    """
    import numpy as np

    rows = corpus.orderBy(id_col).limit(sample).select(vec_col).collect()
    arr = np.array([r[0] for r in rows], dtype=np.float64)
    cent = arr[:k].copy()
    for _ in range(iters):
        d2 = ((arr[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # ties → lowest index (numpy argmin)
        for j in range(k):
            members = arr[assign == j]
            if len(members):
                cent[j] = members.mean(axis=0)
    return [[float(x) for x in c] for c in cent]


def _nearest_cells(vec_col: str, centroids: list[list[float]], nprobe: int) -> Column:
    """Array of the nprobe nearest centroid indices (deterministic tiebreak
    on centroid index via struct ordering). JVM arithmetic only.

    Built as ONE SQL-text expression (a single parse on the JVM):
    instantiating the k×dim literals as individual Column objects costs
    k·dim py4j round-trips — measured in MINUTES of driver time at k=1024
    — while the text form parses in seconds (same trick as
    dot_cell_assign). Double literals use the `D` suffix so Spark SQL does
    not read them as decimals; repr() round-trips the exact float.

    Inputs are validated up front because they are spliced into SQL text:
    a nan/inf centroid would render as `nanD`/`infD` (invalid Spark SQL →
    opaque parse error) and a backtick inside vec_col would escape its
    quoting. Both raise a descriptive ValueError instead."""
    import math

    if "`" in vec_col:
        raise ValueError(f"vec_col must not contain backticks: {vec_col!r}")
    for i, c in enumerate(centroids):
        for x in c:
            if not math.isfinite(float(x)):
                raise ValueError(
                    f"centroid {i} contains non-finite value {x!r}; "
                    "IVF centroids must be finite (check training input)"
                )
    structs = []
    for i, c in enumerate(centroids):
        arr = "array(" + ", ".join(f"{float(x)!r}D" for x in c) + ")"
        d = (
            f"aggregate(zip_with(`{vec_col}`, {arr}, "
            "(a, b) -> (CAST(a AS DOUBLE) - b) * (CAST(a AS DOUBLE) - b)), "
            "0.0D, (acc, x) -> acc + x)"
        )
        structs.append(f"named_struct('d', {d}, 'cell', {i})")
    return F.expr(
        "transform(slice(array_sort(array(" + ", ".join(structs)
        + f")), 1, {nprobe}), s -> s.cell)"
    )


def ivf_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    strategy: str = "auto",
) -> DataFrame:
    """(id, vec, cell): each vector assigned to its nearest centroid. The cell
    id is the IVF partition key — at scale, write the corpus partitioned by
    cell so probes read only nprobe/k of the data.

    `strategy` mirrors cluster.assign_cells: 'literal' embeds k×dim centroid
    constants in the plan (fastest at small k, plan size O(k·dim)); 'join'
    broadcasts the codebook relation and keeps the per-row
    min(struct(dist, cell)) — O(1) plan size for the tens-of-thousands-cell
    codebooks a 100 TB IVF index wants. Identical output (ties → lowest
    cell, both paths)."""
    from peerdb_spark.functions.cluster import LITERAL_CODEBOOK_MAX

    if strategy == "auto":
        kd = len(centroids) * (len(centroids[0]) if centroids else 0)
        strategy = "literal" if kd <= LITERAL_CODEBOOK_MAX else "join"
    if strategy == "literal":
        cell = F.element_at(_nearest_cells(vec_col, centroids, 1), 1)
        return corpus.select(F.col(id_col), F.col(vec_col), cell.alias("cell"))
    if strategy != "join":
        raise ValueError(f"unknown assign strategy: {strategy}")
    spark = corpus.sparkSession
    cent = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, _c array<double>",
    )
    d = F.aggregate(
        F.zip_with(
            F.col(vec_col), F.col("_c"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    narrow = corpus.select(F.col(id_col), F.col(vec_col)).withColumn(
        "_rid", F.monotonically_increasing_id()
    )
    scored = narrow.crossJoin(F.broadcast(cent)).withColumn("_d", d)
    return scored.groupBy("_rid", id_col, vec_col).agg(
        F.min(F.struct(F.col("_d"), F.col("cell")))["cell"].alias("cell")
    ).drop("_rid")


def probe_cells(
    queries: DataFrame,
    centroids: list[list[float]],
    nprobe: int,
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    strategy: str = "auto",
) -> DataFrame:
    """(query_id, _qvec, cell) — each query exploded to its nprobe nearest
    cells. 'literal' sorts a k-struct literal array per row (plan O(k·dim));
    'join' broadcasts the codebook, scores queries×k, and window-ranks the
    top nprobe per query — O(1) plan size, the probe-side twin of
    ivf_assign's large-k path (queries are few, so the k-fanout rows are
    cheap). Identical output: ties → lowest cell index, both paths."""
    from peerdb_spark.functions.cluster import LITERAL_CODEBOOK_MAX

    if strategy == "auto":
        kd = len(centroids) * (len(centroids[0]) if centroids else 0)
        strategy = "literal" if kd <= LITERAL_CODEBOOK_MAX else "join"
    if strategy == "literal":
        return queries.select(
            F.col(query_id_col),
            F.col(vec_col).alias("_qvec"),
            F.explode(
                _nearest_cells(vec_col, centroids, nprobe)
            ).alias("cell"),
        )
    if strategy != "join":
        raise ValueError(f"unknown probe strategy: {strategy}")
    spark = queries.sparkSession
    cent = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, _c array<double>",
    )
    d = F.aggregate(
        F.zip_with(
            F.col("_qvec"), F.col("_c"),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    narrow = queries.select(
        F.col(query_id_col), F.col(vec_col).alias("_qvec")
    ).withColumn("_rid", F.monotonically_increasing_id())
    scored = narrow.crossJoin(F.broadcast(cent)).withColumn("_d", d)
    # rank within the surrogate row id, not query_id: duplicate query rows
    # must each get their nprobe cells (matches the literal explode path)
    w = Window.partitionBy("_rid").orderBy("_d", "cell")
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= nprobe)
        .select(query_id_col, "_qvec", "cell")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    nprobe: int = 4,
    strategy: str = "auto",
) -> DataFrame:
    """IVF approximate top-k: probe the nprobe nearest cells per query, exact
    cosine re-rank within them. Recall grows with nprobe (nprobe=len(centroids)
    degenerates to exact search). Join is an equi-join on the cell id; per-query
    cost scales with nprobe/k of the corpus, never all of it. `strategy`
    selects the literal vs broadcast-codebook formulation for BOTH the
    corpus assignment and the query probe (auto switches above
    LITERAL_CODEBOOK_MAX — codebooks in the tens of thousands of cells)."""
    c = ivf_assign(corpus, centroids, vec_col, id_col, strategy)
    q = probe_cells(queries, centroids, nprobe, vec_col, query_id_col, strategy)
    scored = c.join(F.broadcast(q), "cell").select(
        query_id_col, id_col, cosine(F.col(vec_col), F.col("_qvec")).alias("score")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "score")
    )


def ivf_write_index(
    corpus: DataFrame,
    centroids: list[list[float]],
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Materialize the IVF index: the corpus written partitioned BY CELL.
    This is what makes IVF an index at 100 TB — each cell is its own
    parquet directory, so a probe reads nprobe/k of the files and the rest
    never leave object storage. Rebuild is a full rewrite (centroids are
    frozen at build time, like any IVF index)."""
    ivf_assign(corpus, centroids, vec_col, id_col).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(path)


def ivf_append_index(
    new_vectors: DataFrame,
    centroids: list[list[float]],
    path: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Incrementally add vectors to a materialized IVF index: assign the new
    batch to the frozen centroids and APPEND into the cell partitions — no
    index rebuild, O(new vectors) work, and probes see the additions
    immediately (the ingestion-side twin of dedup.incremental_lsh_pairs:
    per-batch maintenance instead of corpus-scale recompute). Centroid drift
    under sustained appends is the classic IVF trade-off — rebuild when
    recall degrades, exactly like any frozen-coarse-quantizer index."""
    ivf_assign(new_vectors, centroids, vec_col, id_col).write.mode("append").partitionBy(
        "cell"
    ).parquet(path)


def ivf_topk_indexed(
    spark,
    path: str,
    queries: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Probe a materialized IVF index with static partition pruning.

    The probed cell set is |queries|·nprobe ints — a bounded driver-side
    collect (queries are small by contract; large query sets should chunk) —
    and lands in the scan as PartitionFilters, so only the probed cells'
    files are listed or read. Spark's dynamic partition pruning does NOT
    fire for this shape (the build side has no selective predicate), hence
    the explicit literal filter. Results are identical to ivf_topk over the
    same corpus + centroids."""
    q = queries.select(
        F.col(query_id_col),
        F.col(vec_col).alias("_qvec"),
        F.explode(_nearest_cells(vec_col, centroids, nprobe)).alias("cell"),
    )
    cells = sorted(r[0] for r in q.select("cell").distinct().collect())
    c = spark.read.parquet(path).where(F.col("cell").isin(cells))
    scored = c.join(F.broadcast(q), "cell").select(
        query_id_col, id_col, cosine(F.col(vec_col), F.col("_qvec")).alias("score")
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "score")
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within SRP buckets (scale path:
    near-dups almost always share all SRP bits)."""
    c = corpus.select(
        F.col(id_col), F.col(vec_col), srp_signature(F.col(vec_col), dim, bits, seed).alias("_bkt")
    )
    a = c.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), "_bkt")
    b = c.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), "_bkt")
    return (
        a.join(b, "_bkt")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cos_sim"))
        .where(F.col("cos_sim") >= threshold)
    )


def dot_cell_assign(
    centroids: list[list[int]],
    qvec_col: str = "qv",
) -> Column:
    """Cell id by max inner product against an integer codebook (the
    spherical-kmeans E-step on quantized vectors). All-integer arithmetic —
    bit-exact in any engine — and scale-covariant (argmax dot(αv, c) =
    argmax dot(v, c) for α>0), so scaled duplicates of a vector land in the
    same cell. Deterministic tiebreak on the smaller cell index via struct
    ordering on (-dot, cell)."""
    # Built as ONE SQL-text expression (a single parse on the JVM): the
    # codebook inlines k×dim literals, and instantiating those as individual
    # Column objects costs hundreds of py4j round-trips (~30s of driver time
    # for 8×64 — measured). Semantics identical to the Column form.
    structs = []
    for i, cent in enumerate(centroids):
        arr = "array(" + ", ".join(f"{int(x)}L" for x in cent) + ")"
        dot = (
            f"aggregate(zip_with({qvec_col}, {arr}, (a, b) -> a * b), "
            "0L, (acc, x) -> acc + x)"
        )
        structs.append(f"named_struct('negdot', -({dot}), 'cell', {i})")
    return F.expr(
        "element_at(array_sort(array(" + ", ".join(structs) + ")), 1).cell"
    )


def dot_cell_assign_df(
    df: DataFrame,
    centroids: list[list[int]],
    qvec_col: str = "qv",
    strategy: str = "auto",
) -> DataFrame:
    """df → df + `cell` by max inner product against an integer codebook —
    the DataFrame-level twin of dot_cell_assign with a broadcast-join
    strategy for large k (same auto boundary as cluster.assign_cells:
    literal k×dim constants only while they fit the codegen budget).
    Identical output both ways: all-integer dots, ties → lowest cell."""
    from peerdb_spark.functions.cluster import LITERAL_CODEBOOK_MAX

    if strategy == "auto":
        kd = len(centroids) * (len(centroids[0]) if centroids else 0)
        strategy = "literal" if kd <= LITERAL_CODEBOOK_MAX else "join"
    if strategy == "literal":
        return df.select(
            "*", dot_cell_assign(centroids, qvec_col).alias("cell")
        )
    if strategy != "join":
        raise ValueError(f"unknown assign strategy: {strategy}")
    spark = df.sparkSession
    cent = spark.createDataFrame(
        [(i, [int(x) for x in c]) for i, c in enumerate(centroids)],
        "cell int, _m array<bigint>",
    )
    dot = F.aggregate(
        F.zip_with(F.col(qvec_col), F.col("_m"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # surrogate row id keeps duplicate input rows distinct (row-preserving,
    # matching the literal strategy — ADVICE r6)
    tagged = df.withColumn("_rid", F.monotonically_increasing_id())
    scored = tagged.crossJoin(F.broadcast(cent)).withColumn("_negdot", -dot)
    return scored.groupBy("_rid", *df.columns).agg(
        F.min(F.struct(F.col("_negdot"), F.col("cell")))["cell"].alias("cell")
    ).drop("_rid")


def semantic_dedup(
    corpus: DataFrame,
    centroids: list[list[int]],
    qvec_col: str = "qv",
    id_col: str = "vec_id",
    threshold_sq: tuple[int, int] = (361, 400),
    materialize: bool = True,
    max_cell_size: int = 10_000,
    assign_strategy: str = "auto",
) -> DataFrame:
    """SemDeDup-style semantic deduplication: cluster the corpus (inner-
    product cell assignment against a fixed codebook), then within each cell
    mark every vector that has a cosine-near-duplicate with a smaller id as
    a reject; the smallest id of each near-dup neighborhood survives.

    Near-dup test is the exact integer rule cos(a,b) >= t expressed without
    floats: dot > 0 AND den·dot² >= num·|a|²·|b|², with t² = num/den
    (default 361/400 = 0.95²). Input `qvec_col` must be an integer-quantized
    vector (array<long>).

    Scale: candidate pairs exist only inside a cell — the pair join is a cell
    equi-join, never all-pairs; cluster-size skew is governed by the codebook
    granularity (train more centroids for finer cells), and a DEGENERATE
    cell (all-zero embeddings, a dead cluster) is dropped from the pair
    join outright when it exceeds `max_cell_size` — the same
    counted-broadcast-anti-join guard every LSH pair generator uses
    (dedup.py), mirrored in the declared oracle SQL. Members of a dropped
    cell are never rejected (kept=1, dup_of null) — the conservative
    direction for a dedup. Returns (id, cell, dup_of, kept) — dup_of =
    smallest-id near-duplicate (null if none), kept = dup_of IS NULL.

    The celled relation feeds three branches (both pair-join sides + the
    final flag join); Catalyst does not share the k×dim-literal assignment
    expression across them (same non-canonicalization as lsh_verified_pairs,
    dedup.py:330-340), so `materialize` localCheckpoints it — one assignment
    pass, executor-storage reads after. At 100 TB write the assignment to
    parquet instead (it IS the cluster index — ivf_write_index shape).
    """
    num, den = threshold_sq
    c = dot_cell_assign_df(
        corpus.select(F.col(id_col), F.col(qvec_col)),
        centroids,
        qvec_col,
        assign_strategy,
    ).withColumn(
        "_n2",
        F.aggregate(
            F.transform(F.col(qvec_col), lambda x: x * x),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ),
    )
    if materialize:
        c = c.localCheckpoint(eager=True)
    oversized = (
        c.groupBy("cell")
        .agg(F.count(F.lit(1)).alias("_csz"))
        .where(F.col("_csz") > max_cell_size)
        .select("cell")
    )
    sized = c.join(F.broadcast(oversized), ["cell"], "left_anti")
    a = sized.select(
        F.col(id_col).alias("_id_a"), F.col(qvec_col).alias("_va"),
        F.col("_n2").alias("_na"), "cell",
    )
    b = sized.select(
        F.col(id_col).alias("_id_b"), F.col(qvec_col).alias("_vb"),
        F.col("_n2").alias("_nb"), "cell",
    )
    dot = F.aggregate(
        F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    pairs = (
        a.join(b, "cell")
        .where(F.col("_id_a") < F.col("_id_b"))
        .select("_id_a", "_id_b", dot.alias("_dot"), "_na", "_nb")
        .where(
            (F.col("_dot") > 0)
            & (den * F.col("_dot") * F.col("_dot") >= num * F.col("_na") * F.col("_nb"))
        )
    )
    dup = pairs.groupBy("_id_b").agg(F.min("_id_a").alias("dup_of"))
    return (
        c.join(dup, c[id_col] == dup["_id_b"], "left")
        .select(
            F.col(id_col),
            "cell",
            "dup_of",
            F.col("dup_of").isNull().cast("int").alias("kept"),
        )
    )


# ---------------------------------------------------------------------------
# SQ8 scalar quantization (symmetric 8-bit codes, global scale)
# ---------------------------------------------------------------------------


def sq8_stats(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Global max-absolute-value over every vector component (one output
    row). ONE scan with a map-side-combining max aggregate — at 100 TB the
    shuffle is #partitions rows. The stats row is broadcast into the
    encoder, never collected to the driver."""
    comp_max = F.aggregate(
        F.transform(F.col(vec_col), lambda x: F.abs(x.cast("double"))),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    return df.agg(F.max(comp_max).alias("maxabs"))


def sq8_encode(
    df: DataFrame,
    stats: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric scalar quantization to int8-range codes:
    code_j = clamp(round(x_j * 127 / maxabs), -127, 127); zero-point 0.

    4x compression vs float32. The SYMMETRIC scheme (single global scale, no
    per-dim offsets) is what keeps quantized INNER-PRODUCT ranking faithful:
    code(a)·code(b) = (127/s)² · approx(a·b) — one positive constant factor,
    so top-k order is preserved up to rounding error. A per-dim affine
    scheme (x-min)*255/span adds cross offset terms that scramble dot
    ranking (measured: top-10 recall collapsed to ~11% on the test corpus;
    symmetric scores >=80%).

    All arithmetic is double-precision with a fixed evaluation order, so the
    DuckDB oracle reproduces every code bit-exactly (round-half-away-from-
    zero agrees across engines for both signs via the shared round()).
    Codes stay array<long> for JVM-side integer dot products; pack to binary
    at the storage boundary."""

    def code(x):
        raw = F.round(x.cast("double") * F.lit(127.0) / F.col("maxabs")).cast("long")
        capped = F.least(
            F.lit(127).cast("long"), F.greatest(F.lit(-127).cast("long"), raw)
        )
        return F.when(F.col("maxabs") == 0.0, F.lit(0).cast("long")).otherwise(capped)

    return df.crossJoin(F.broadcast(stats)).select(
        F.col(id_col), F.transform(F.col(vec_col), code).alias("codes")
    )


def sq8_topk(
    corpus_codes: DataFrame,
    query_codes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by integer dot product of SQ8 codes (asymmetric-distance
    analogue: ranking by the quantized inner product). The query side is
    broadcast; scoring is a JVM zip_with/aggregate over array<long> — no
    floats anywhere, so ranking ties are impossible to mis-order across
    engines (deterministic (score DESC, id ASC) rank)."""
    q = query_codes.select(
        F.col(id_col).alias("query_id"), F.col("codes").alias("qcodes")
    )
    scored = corpus_codes.crossJoin(F.broadcast(q)).select(
        "query_id",
        F.col(id_col),
        F.aggregate(
            F.zip_with(F.col("codes"), F.col("qcodes"), lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select("query_id", id_col, "score", F.col("_rk").alias("rank"))
    )


# ---------------------------------------------------------------------------
# kNN graph (bucketed self-kNN + mutual edges)
# ---------------------------------------------------------------------------


def srp_bucket_int(qvec_col: str, dim: int, bits: int = 8, seed: int = 42) -> Column:
    """SRP bucket id of an integer-quantized vector: bit i = sign of the
    exact integer projection onto deterministic ±1 hyperplane i. Shared by
    the ANN probe path and the kNN-graph builder; reproducible in SQL."""
    sig = F.lit(0)
    for i in range(bits):
        plane = srp_hyperplane(dim, i, seed)
        proj = F.aggregate(
            F.zip_with(
                F.col(qvec_col),
                F.array(*[F.lit(p) for p in plane]),
                lambda x, h: x * h.cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        sig = sig + F.when(proj >= 0, F.lit(2**i)).otherwise(F.lit(0))
    return sig.cast("int")


def knn_graph(
    corpus: DataFrame,
    id_col: str = "vec_id",
    qvec_col: str = "qv",
    dim: int = 64,
    bits: int = 8,
    k: int = 3,
) -> DataFrame:
    """Mutual-kNN graph over an integer-quantized embedding corpus: each
    vector ranks its same-SRP-bucket neighbours by exact integer dot
    product; an edge (a, b) survives only if each endpoint is in the
    other's top-k (the mutual filter that graph-based dedup/clustering
    pipelines use to kill hub nodes). Returns (id_a, id_b, score), id_a <
    id_b.

    Scale: candidate pairs exist only inside an SRP bucket (2^bits buckets
    — tune bits so buckets stay ~O(corpus/2^bits)); the mutual filter is a
    self-join of the k-bounded top-k relation, i.e. O(k·|corpus|) rows. No
    all-pairs stage anywhere.
    """
    c = corpus.select(
        F.col(id_col), F.col(qvec_col),
        srp_bucket_int(qvec_col, dim, bits).alias("_bkt"),
    ).localCheckpoint(eager=True)
    a = c.select(
        F.col("_bkt"), F.col(id_col).alias("_ida"), F.col(qvec_col).alias("_va")
    )
    b = c.select(
        F.col("_bkt"), F.col(id_col).alias("_idb"), F.col(qvec_col).alias("_vb")
    )
    pairs = a.join(b, "_bkt").where(F.col("_ida") != F.col("_idb"))
    scored = pairs.select(
        "_ida",
        "_idb",
        F.aggregate(
            F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("score"),
    )
    w = Window.partitionBy("_ida").orderBy(F.desc("score"), F.col("_idb"))
    topk = (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select("_ida", "_idb", "score")
    )
    rev = topk.select(
        F.col("_idb").alias("_ida"), F.col("_ida").alias("_idb")
    )
    mutual = topk.join(rev, ["_ida", "_idb"])
    return mutual.where(F.col("_ida") < F.col("_idb")).select(
        F.col("_ida").alias("id_a"), F.col("_idb").alias("id_b"), "score"
    )


# ---------------------------------------------------------------------------
# label-aware operators: hard-negative mining + kNN label consistency
# ---------------------------------------------------------------------------


def hard_negative_mining(
    corpus: DataFrame,
    id_col: str = "vec_id",
    qvec_col: str = "qv",
    label_col: str = "label",
    dim: int = 64,
    bits: int = 8,
    k: int = 3,
) -> DataFrame:
    """Contrastive-training prep: for every anchor vector, the k most
    similar SAME-BUCKET vectors with a DIFFERENT label — the classic
    hard-negative set (close in embedding space, wrong class). Returns
    (anchor_id, negative_id, score, rank).

    Scale shape = knn_graph: SRP-bucketed candidates, exact integer dot
    ranking, k-bounded output — the label inequality is a filter on the
    bucket join, never an all-pairs stage.
    """
    c = corpus.select(
        F.col(id_col), F.col(qvec_col), F.col(label_col),
        srp_bucket_int(qvec_col, dim, bits).alias("_bkt"),
    ).localCheckpoint(eager=True)
    a = c.select(
        F.col("_bkt"), F.col(id_col).alias("anchor_id"),
        F.col(qvec_col).alias("_va"), F.col(label_col).alias("_la"),
    )
    b = c.select(
        F.col("_bkt"), F.col(id_col).alias("negative_id"),
        F.col(qvec_col).alias("_vb"), F.col(label_col).alias("_lb"),
    )
    pairs = a.join(b, "_bkt").where(
        (F.col("anchor_id") != F.col("negative_id")) & (F.col("_la") != F.col("_lb"))
    )
    scored = pairs.select(
        "anchor_id", "negative_id",
        F.aggregate(
            F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("score"),
    )
    w = Window.partitionBy("anchor_id").orderBy(F.desc("score"), F.col("negative_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def knn_label_consistency(
    corpus: DataFrame,
    id_col: str = "vec_id",
    qvec_col: str = "qv",
    label_col: str = "label",
    dim: int = 64,
    bits: int = 8,
    k: int = 5,
) -> DataFrame:
    """Embedding-quality eval: per label, how often a vector's k nearest
    same-bucket neighbours share its label (the standard kNN-consistency
    probe for embedding spaces — no model training needed). Returns
    (label, n_vecs, n_neighbors, n_matching) — matching fraction =
    n_matching / n_neighbors.

    Same bucketed shape as knn_graph; the per-label aggregate output is
    |labels| rows.
    """
    c = corpus.select(
        F.col(id_col), F.col(qvec_col), F.col(label_col),
        srp_bucket_int(qvec_col, dim, bits).alias("_bkt"),
    ).localCheckpoint(eager=True)
    a = c.select(
        F.col("_bkt"), F.col(id_col).alias("_ida"),
        F.col(qvec_col).alias("_va"), F.col(label_col).alias("_la"),
    )
    b = c.select(
        F.col("_bkt"), F.col(id_col).alias("_idb"),
        F.col(qvec_col).alias("_vb"), F.col(label_col).alias("_lb"),
    )
    pairs = a.join(b, "_bkt").where(F.col("_ida") != F.col("_idb"))
    scored = pairs.select(
        "_ida", "_la", "_idb", "_lb",
        F.aggregate(
            F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("_s"),
    )
    w = Window.partitionBy("_ida").orderBy(F.desc("_s"), F.col("_idb"))
    topk = scored.withColumn("_rk", F.row_number().over(w)).where(F.col("_rk") <= k)
    per_vec = topk.groupBy("_ida", "_la").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum((F.col("_lb") == F.col("_la")).cast("long")).alias("_m"),
    )
    return per_vec.groupBy(F.col("_la").alias(label_col)).agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("_n").alias("n_neighbors"),
        F.sum("_m").alias("n_matching"),
    )
