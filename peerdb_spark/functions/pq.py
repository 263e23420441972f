"""Product quantization (PQ) — the standard vector compression for
billion-scale ANN (Jégou et al., "Product Quantization for Nearest
Neighbor Search", public): split each D-dim vector into m subspaces,
train a k-codeword codebook per subspace, store vectors as m small codes
(m bytes at k=256), and answer queries by ADC — one distance table per
query (m·k entries), scores = m table lookups per candidate.

Spark-first shape, mirroring functions/cluster.py's fixed-point k-means:
- ALL subspaces train in the same Lloyd rounds — the E-step is one
  broadcast join on (sub) and the M-step ONE hash aggregation keyed
  (sub, cell, pos), so a round costs one corpus scan regardless of m.
- Fixed-point arithmetic end-to-end (qv = round(x·scale); centroids carry
  an extra ·scale), so every code and every ADC distance is an exact
  integer — the DuckDB oracle unrolls the SAME rounds as CTEs
  (pq_train_encode_sql), certifying the distributed trainer against an
  independent single-node implementation (the kmeans/BPE/PCA pattern).
- At 100 TB: train on a sample (the standard practice — pass a sampled
  DataFrame), encode everything (one broadcast join + narrow projection),
  ADC scoring broadcasts the per-query tables (m·k rows each) and scans
  codes once; with IVF on top (functions/similarity.py) the scan prunes
  to probed cells — IVF-PQ.

Codebook seeds are the first k vectors' sub-slices by id (deterministic,
like kmeans_assign); empty cells keep their previous centroid (same rule
the oracle encodes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SCALE = 256  # fixed-point scale shared with functions/cluster.py

__all__ = ["pq_train_encode", "pq_adc_topk", "pq_train_encode_sql"]


def _subvecs(df: DataFrame, m: int, d2: int, vec_col: str, id_col: str,
             scale: int) -> DataFrame:
    """(id, sub, sv): fixed-point sub-vectors, one row per subspace."""
    qv = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * scale).cast("long"),
    )
    return df.select(F.col(id_col), qv.alias("qv")).select(
        id_col,
        F.posexplode(
            F.array(*[
                F.slice(F.col("qv"), s * d2 + 1, d2) for s in range(m)
            ])
        ).alias("sub", "sv"),
    )


def _assign(sv_df: DataFrame, codebooks: DataFrame, id_col: str) -> DataFrame:
    """E-step: nearest codeword per (id, sub) by exact fixed-point L2
    (centroids carry an extra ·scale). Deterministic tie-break on cell.

    argmin as min(struct(_d, cell)) with a hash aggregate, not a
    row_number window: the scored relation is k rows per (id, sub), and a
    window would shuffle AND sort all of them, where the aggregate's
    map-side combine ships one partial row per group per map task (struct
    min is lexicographic, so (_d, cell) reproduces the ORDER BY _d, cell
    tie-break exactly). `sv` is constant within a group — first() is safe."""
    dist = F.aggregate(
        F.zip_with(
            F.col("sv"), F.col("m"),
            lambda a, b: (a * SCALE - b) * (a * SCALE - b),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = sv_df.join(F.broadcast(codebooks), "sub").select(
        id_col, "sub", "sv", "cell", dist.alias("_d")
    )
    return (
        scored.groupBy(id_col, "sub")
        .agg(F.min(F.struct("_d", "cell")).alias("_w"), F.first("sv").alias("sv"))
        .select(id_col, "sub", "sv", F.col("_w.cell").alias("cell"))
    )


def pq_train_encode(
    corpus: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> tuple[DataFrame, DataFrame]:
    """Train per-subspace codebooks and encode the corpus.

    Returns (codes, codebooks): codes = (id, codes array<long> of m cell
    ids, sub-ordered); codebooks = (sub, cell, m array<long> fixed-point
    centroids). Train on a SAMPLE at scale and encode the full corpus by
    calling this on the sample, then `_assign` via pq_adc_topk's join
    (here corpus==train set, the gate-verified configuration)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d2 = dim // m
    sv = _subvecs(corpus, m, d2, vec_col, id_col, SCALE).localCheckpoint(
        eager=True
    )
    # seeds: the first k ids' sub-slices, centroid = sv·scale. Every id
    # appears once per sub, so "first k per sub" == "the k smallest ids"
    # globally: take them with an orderBy().limit() (map-side partial
    # top-k) and broadcast-join, instead of a Window.partitionBy(sub)
    # row_number — that window funneled the WHOLE subvector relation
    # through m reducers (m is 4-16: a straggler sort by construction).
    wk = Window.orderBy(id_col)  # k-row relation — single tiny partition
    # seed ids come from the checkpointed sv itself (sub 0 holds every id
    # exactly once), not a re-scan of `corpus`: a sampled/nondeterministic
    # corpus input recomputed for the seed job could yield ids absent from
    # sv, silently seeding fewer than k cells (r12 ADVICE). Also strictly
    # cheaper — the seed job reads the 16-byte checkpoint rows.
    seed_ids = (
        sv.where(F.col("sub") == 0).select(id_col).orderBy(id_col).limit(k)
        .withColumn("cell", (F.row_number().over(wk) - 1).cast("long"))
    )
    code0 = sv.join(F.broadcast(seed_ids), id_col).select(
        "sub", "cell",
        F.transform(F.col("sv"), lambda x: x * SCALE).alias("m"),
    )
    books = code0
    for _ in range(iters - 1):
        assigned = _assign(sv, books, id_col)
        # M-step: mean per (sub, cell, pos) — empty cells keep previous
        new = (
            assigned.select(
                "sub", "cell",
                F.posexplode(F.col("sv")).alias("pos", "v"),
            )
            .groupBy("sub", "cell", "pos")
            # `div`: integral division truncating toward zero — DuckDB's
            # `//` on integers, so the oracle reproduces negative means
            .agg(F.expr(f"(sum(v) * {SCALE}) div count(*)").alias("ms"))
            .groupBy("sub", "cell")
            .agg(F.array_sort(
                F.collect_list(F.struct("pos", "ms"))
            ).alias("_pm"))
            .select(
                "sub", "cell",
                F.transform(F.col("_pm"), lambda s: s["ms"]).alias("m"),
            )
        )
        books = (
            books.alias("o")
            .join(new.alias("n"), ["sub", "cell"], "left")
            .select(
                "sub", "cell",
                F.coalesce(F.col("n.m"), F.col("o.m")).alias("m"),
            )
        )
    final = _assign(sv, books, id_col)
    codes = (
        final.groupBy(id_col)
        .agg(F.array_sort(F.collect_list(F.struct("sub", "cell"))).alias("_sc"))
        .select(
            id_col,
            F.transform(F.col("_sc"), lambda s: s["cell"]).alias("codes"),
        )
    )
    return codes, books


def pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int = 4,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Asymmetric-distance top-k: per query, a distance TABLE (sub, cell)
    = exact fixed-point L2 between the query's sub-vector (·scale, to the
    codebooks' scale) and each codeword; candidate score = Σ_sub
    table[sub, code]. The tables broadcast (n_q·m·k rows); codes scan
    once, exploded to (id, sub, cell) and hash-joined — no vector math on
    the corpus side, which is the entire point of PQ at scale. Returns
    (query_id, vec_id, dist, rank) ranked (dist ASC, id ASC)."""
    d2 = dim // m
    qsv = _subvecs(queries, m, d2, vec_col, query_id_col, SCALE)
    dist = F.aggregate(
        F.zip_with(
            F.col("sv"), F.col("m"),
            lambda a, b: (a * SCALE - b) * (a * SCALE - b),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    table = qsv.join(F.broadcast(codebooks), "sub").select(
        query_id_col, "sub", "cell", dist.alias("qd")
    )
    exploded = codes.select(
        id_col, F.posexplode(F.col("codes")).alias("sub", "cell")
    )
    scored = (
        exploded.join(F.broadcast(table), ["sub", "cell"])
        .groupBy(query_id_col, id_col)
        .agg(F.sum("qd").alias("dist"))
    )
    w = Window.partitionBy(query_id_col).orderBy("dist", id_col)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "dist", "rank")
    )


def pq_train_encode_sql(
    table: str = "embeddings",
    dim: int = 64,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = SCALE,
) -> str:
    """DuckDB oracle: the SAME per-subspace Lloyd rounds unrolled as CTEs
    (the kmeans_assign_sql pattern plus a `sub` lane), ending in the
    sub-ordered code array per vector."""
    d2 = dim // m

    def assign(prev_c: str, name: str) -> str:
        return f"""
{name} AS (
  SELECT {id_col}, sub, sv, cell FROM (
    SELECT s.{id_col}, s.sub, s.sv, c.cell,
      row_number() OVER (PARTITION BY s.{id_col}, s.sub ORDER BY
        list_sum(list_transform(list_zip(s.sv, c.m),
                 z -> (z[1]*{scale} - z[2])*(z[1]*{scale} - z[2]))), c.cell) AS rn
    FROM sv s, {prev_c} c WHERE s.sub = c.sub
  ) WHERE rn = 1
)"""

    def mstep(a: str, prev_c: str, name: str) -> str:
        # empty cells keep the previous centroid (LEFT JOIN + coalesce)
        return f"""
{name}_new AS (
  SELECT sub, cell, list(ms ORDER BY pos) AS m FROM (
    SELECT sub, cell, pos, CAST((sum(v)*{scale})//count(*) AS BIGINT) AS ms
    FROM (SELECT sub, cell, unnest(sv) AS v,
                 unnest(range(1, len(sv)+1)) AS pos FROM {a})
    GROUP BY sub, cell, pos
  ) GROUP BY sub, cell
),
{name} AS (
  SELECT o.sub, o.cell, coalesce(n.m, o.m) AS m
  FROM {prev_c} o LEFT JOIN {name}_new n
    ON o.sub = n.sub AND o.cell = n.cell
)"""

    parts = [f"""
WITH q AS (
  SELECT {id_col},
         list_transform({vec_col}, x -> CAST(round(CAST(x AS DOUBLE)*{scale}) AS BIGINT)) AS qv
  FROM {table}
),
sv AS (
  SELECT {id_col}, u.sub, qv[(u.sub*{d2}+1):((u.sub+1)*{d2})] AS sv
  FROM q, unnest(range(0, {m})) u(sub)
),
c0 AS (
  SELECT sub, CAST(rn - 1 AS BIGINT) AS cell,
         list_transform(sv, x -> x*{scale}) AS m
  FROM (SELECT sub, sv,
               row_number() OVER (PARTITION BY sub ORDER BY {id_col}) AS rn
        FROM sv)
  WHERE rn <= {k}
)"""]
    prev = "c0"
    for i in range(1, iters):
        parts.append("," + assign(prev, f"a{i}"))
        parts.append("," + mstep(f"a{i}", prev, f"c{i}"))
        prev = f"c{i}"
    parts.append("," + assign(prev, f"a{iters}"))
    parts.append(f"""
SELECT {id_col}, list(cell ORDER BY sub) AS codes
FROM a{iters} GROUP BY {id_col}
""")
    return "".join(parts)


def pq_adc_topk_sql(
    table: str = "embeddings",
    dim: int = 64,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    topk: int = 5,
    n_queries: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    scale: int = SCALE,
) -> str:
    """DuckDB oracle for the full PQ pipeline: the train/encode CTE chain
    of pq_train_encode_sql, then the ADC scoring — per-query distance
    tables against the FINAL codebook and table-lookup sums — ranked
    (dist, id). Certifies trainer + encoder + scorer in one hash."""
    train = pq_train_encode_sql(table, dim, m, k, iters, vec_col, id_col,
                                scale)
    # strip the final SELECT; keep the CTE chain
    chain = train[: train.rindex("\nSELECT ")]
    final_a = f"a{iters}"
    final_c = f"c{iters - 1}" if iters > 1 else "c0"
    d2 = dim // m
    return chain + f""",
qs AS (
  SELECT {id_col} AS query_id, qv FROM q
  QUALIFY row_number() OVER (ORDER BY {id_col}) <= {n_queries}
),
qsv AS (
  SELECT query_id, u.sub, qv[(u.sub*{d2}+1):((u.sub+1)*{d2})] AS sv
  FROM qs, unnest(range(0, {m})) u(sub)
),
tab AS (
  SELECT s.query_id, s.sub, c.cell,
         list_sum(list_transform(list_zip(s.sv, c.m),
                  z -> (z[1]*{scale} - z[2])*(z[1]*{scale} - z[2]))) AS qd
  FROM qsv s, {final_c} c WHERE s.sub = c.sub
),
sc AS (
  SELECT t.query_id, a.{id_col}, CAST(sum(t.qd) AS BIGINT) AS dist
  FROM {final_a} a JOIN tab t ON a.sub = t.sub AND a.cell = t.cell
  GROUP BY t.query_id, a.{id_col}
)
SELECT query_id, {id_col}, dist, CAST(rank AS INT) AS rank FROM (
  SELECT query_id, {id_col}, dist,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY dist, {id_col}) AS rank
  FROM sc
) WHERE rank <= {topk}
"""
