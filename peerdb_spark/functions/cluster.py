"""Distributed k-means clustering over embedding columns (Lloyd's algorithm).

Reference parity: the reference ships no clustering operator — this belongs to
the LLM-training-data extension set (corpus curation pipelines cluster
embeddings for topic balancing / SemDeDup codebooks / mixture design, e.g.
the k-means stage in SemDeDup, Abbas et al. 2023). `ivf_train_centroids`
(similarity.py:148) trains on a driver-side SAMPLE, which is the right call
for an IVF coarse quantizer; this module is the full-corpus distributed
variant for when cluster assignments of EVERY row are the product.

Cross-engine exactness: float means are order-dependent under distributed
summation, so a naive Lloyd's loop is nondeterministic at the bit level and
can't be oracle-verified. We therefore run FIXED-POINT k-means:

- vectors quantize once: qx = round(x * S) as int64 (S = 1024; exact —
  float->double is exact and S is a power of two, round is half-away-from-
  zero in both Spark and DuckDB)
- centroids live at scale S^2: m_d = trunc_div(sum(qx_d) * S, count) —
  integer sums are exact in ANY summation order, trunc-division matches
  DuckDB's `//` (toward zero)
- the E-step distance is the all-integer sum((qx_d*S - m_d)^2); with
  |x| <= 8 the per-dim term is < 2^47 and a 4096-dim sum still fits int64,
  INDEPENDENT of corpus size — the formulation is 100-TB safe.

Scale shape per iteration: one map-side-combinable hash agg
groupBy(cell, dim) over the corpus (the M-step), with only k*dim tiny rows
collected to the driver; the E-step is per-row JVM codegen against literal
centroid arrays (k*dim constants — broadcast-by-closure, no join). Empty
clusters are retired (the standard degenerate-cluster rule), identically in
the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SCALE = 1024


def quantize_vec(vec: Column, scale: int = SCALE) -> Column:
    """qx = round(x * scale) as bigint, element-wise. Exact and identical in
    Spark and DuckDB (see module docstring)."""
    return F.transform(
        vec, lambda x: F.round(x.cast("double") * scale).cast("long")
    )


def _trunc_div(a: int, b: int) -> int:
    """Integer division truncating toward zero — DuckDB's `//` semantics
    (Python's // floors, which differs on negative numerators)."""
    q = abs(a) // b
    return q if a >= 0 else -q


# codebook-size boundary for the literal-centroid E-step: embedding k×dim
# literals in the plan is fastest at small k (zero joins, whole-stage
# codegen) but plan size grows O(k·dim) — at the codebook sizes a 100 TB
# corpus wants (tens of thousands of cells) the plan blows past JVM codegen
# limits or fails to build. Above this budget the assignment switches to a
# broadcast-join formulation with O(1) plan size (strategy="join").
LITERAL_CODEBOOK_MAX = 4096


def assign_cells(
    qdf: DataFrame,
    centroids: list[tuple[int, list[int]]],
    scale: int,
    strategy: str = "auto",
) -> DataFrame:
    """qdf(…, qv) → qdf + `cell`: nearest centroid by all-integer L2, ties →
    lowest cell id — identical output under both strategies (equivalence-
    tested):

    - ``literal``: per-row codegen against k×dim literal constants. No
      join, no shuffle; plan size O(k·dim).
    - ``join``: broadcast the (cell, m) codebook relation, score the n×k
      cross product, keep the per-row min(struct(dist, cell)). The cross
      join is a deliberate BroadcastNestedLoopJoin of k tiny rows (an
      exact nearest-centroid assignment is O(n·k·dim) under ANY physical
      shape); the min-aggregate is map-side partial, so the shuffle
      carries ~n rows. Plan size O(1) in k.
    - ``auto``: literal while k·dim ≤ LITERAL_CODEBOOK_MAX, else join.
    """
    if strategy == "auto":
        kd = len(centroids) * (len(centroids[0][1]) if centroids else 0)
        strategy = "literal" if kd <= LITERAL_CODEBOOK_MAX else "join"
    if strategy == "literal":
        return qdf.select(
            "*", _assign_cell(F.col("qv"), centroids, scale).alias("cell")
        )
    if strategy != "join":
        raise ValueError(f"unknown assign strategy: {strategy}")
    spark = qdf.sparkSession
    cent = spark.createDataFrame(
        [(int(c), [int(x) for x in m]) for c, m in centroids],
        "cell bigint, _m array<bigint>",
    )
    d = F.aggregate(
        F.zip_with(
            F.col("qv"), F.col("_m"),
            lambda a, b: (a * scale - b) * (a * scale - b),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    # surrogate row id: keeps duplicate input rows distinct through the
    # groupBy so both strategies are row-preserving (ADVICE r6)
    tagged = qdf.withColumn("_rid", F.monotonically_increasing_id())
    scored = tagged.crossJoin(F.broadcast(cent)).withColumn("_d", d)
    return scored.groupBy("_rid", *qdf.columns).agg(
        F.min(F.struct(F.col("_d"), F.col("cell")))["cell"].alias("cell")
    ).drop("_rid")


def _assign_cell(qv: Column, centroids: list[tuple[int, list[int]]], scale: int) -> Column:
    """Nearest-centroid id for a quantized vector, all-integer arithmetic,
    ties -> lowest cell id (array_sort on (dist, cell) structs)."""
    dists = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        qv,
                        F.lit(m),
                        lambda a, b: (a * scale - b) * (a * scale - b),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("d"),
                F.lit(cell).cast("long").alias("cell"),
            )
            for cell, m in centroids
        ]
    )
    return F.element_at(F.array_sort(dists), 1)["cell"]


def kmeans_assign(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    scale: int = SCALE,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    assign_strategy: str = "auto",
) -> DataFrame:
    """(id, cell): full-corpus Lloyd's for `iters` rounds, fixed-point
    arithmetic, deterministic seeds = the first k vectors by id with
    centroid m = qx * scale.

    Per round: E-step is assign_cells (literal codegen at small k,
    broadcast-join codebook above LITERAL_CODEBOOK_MAX — same output);
    M-step is ONE hash aggregation groupBy(cell, dim) — partial
    aggregation map-side, k*dim rows collected (k=8, dim=64 -> 512
    rows/round, the same driver-collect budget as the BPE trainer's 1-row
    argmax). The corpus is scanned iters+1 times; cache/localCheckpoint
    the input upstream when iterating more than a few rounds.
    """
    qdf = corpus.select(F.col(id_col), quantize_vec(F.col(vec_col), scale).alias("qv"))

    seeds = qdf.orderBy(id_col).limit(k).select("qv").collect()
    centroids: list[tuple[int, list[int]]] = [
        (i, [int(x) * scale for x in r["qv"]]) for i, r in enumerate(seeds)
    ]

    for _ in range(iters - 1):
        assigned = assign_cells(
            qdf.select("qv", F.col(id_col)), centroids, scale, assign_strategy
        )
        sums = (
            assigned.select("cell", F.posexplode("qv").alias("pos", "v"))
            .groupBy("cell", "pos")
            .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()
        )
        by_cell: dict[int, dict[int, tuple[int, int]]] = {}
        for r in sums:
            by_cell.setdefault(r["cell"], {})[r["pos"]] = (r["s"], r["c"])
        # empty cells simply vanish (retired); surviving cells keep their id
        centroids = [
            (
                cell,
                [
                    _trunc_div(dims[p][0] * scale, dims[p][1])
                    for p in sorted(dims)
                ],
            )
            for cell, dims in sorted(by_cell.items())
        ]

    return assign_cells(qdf, centroids, scale, assign_strategy).select(
        F.col(id_col), "cell"
    )


def kmeans_assign_sql(
    table: str = "embeddings",
    k: int = 8,
    iters: int = 3,
    scale: int = SCALE,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB oracle: the SAME fixed-point Lloyd's loop unrolled as CTEs —
    an independent single-node implementation certifying the distributed
    one (the bpe_train_merges pattern for iterative algorithms)."""

    def assign(prev_c: str, name: str) -> str:
        return f"""
{name} AS (
  SELECT {id_col}, qv, cell FROM (
    SELECT q.{id_col}, q.qv, c.cell,
      row_number() OVER (PARTITION BY q.{id_col} ORDER BY
        list_sum(list_transform(list_zip(q.qv, c.m),
                 z -> (z[1]*{scale} - z[2])*(z[1]*{scale} - z[2]))), c.cell) AS rn
    FROM q, {prev_c} c
  ) WHERE rn = 1
)"""

    def mstep(a: str, name: str) -> str:
        return f"""
{name} AS (
  SELECT cell, list(ms ORDER BY pos) AS m FROM (
    SELECT cell, pos, CAST((sum(v)*{scale})//count(*) AS BIGINT) AS ms
    FROM (SELECT cell, unnest(qv) AS v, unnest(range(1, len(qv)+1)) AS pos FROM {a})
    GROUP BY cell, pos
  ) GROUP BY cell
)"""

    parts = [
        f"""
WITH q AS (
  SELECT {id_col},
         list_transform({vec_col}, x -> CAST(round(CAST(x AS DOUBLE)*{scale}) AS BIGINT)) AS qv
  FROM {table}
),
c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY {id_col}) - 1 AS BIGINT) AS cell,
         list_transform(qv, x -> x*{scale}) AS m
  FROM q QUALIFY row_number() OVER (ORDER BY {id_col}) <= {k}
)"""
    ]
    prev = "c0"
    for i in range(1, iters):
        parts.append("," + assign(prev, f"a{i}"))
        parts.append("," + mstep(f"a{i}", f"c{i}"))
        prev = f"c{i}"
    parts.append("," + assign(prev, f"a{iters}"))
    parts.append(f"\nSELECT {id_col}, cell FROM a{iters}")
    return "".join(parts)


# ---------------------------------------------------------------------------
# PCA — dominant principal component by fixed-point power iteration
# ---------------------------------------------------------------------------
#
# Training-data pipelines whiten / project embeddings before clustering and
# near-dup detection (SemDeDup normalizes against dominant directions; ANN
# quality improves after decorrelation). Spark MLlib's PCA needs a vector UDT
# and float SVD — order-dependent, not oracle-verifiable. This is the
# fixed-point analogue of the k-means trick above:
#
# 1. Distributed, exact: Gram matrix G[i][j] = Σ qv_i·qv_j and column sums
#    s_i = Σ qv_i — ONE doubly-exploded hash agg (d² cells, map-side
#    partials) + one d-cell agg. With |x| ≤ 2 and scale 256, per-row terms
#    are < 2^20, so int64 holds G exactly up to ~2^43 rows — 100-TB safe.
# 2. Driver, tiny: the centered matrix C = n·G − s·sᵀ (covariance × n²,
#    exact integers) and `iters` rounds of power iteration at scale 2^20
#    with infinity-norm normalization — Python's unbounded ints mirror the
#    oracle's HUGEINT lane exactly; the same rounds unroll as SQL CTEs in
#    pca_project_sql (the kmeans/BPE iterative-oracle pattern).
# 3. Distributed again: per-row integer projection pc1 = ⟨qv, v⟩.
#
# The result after k rounds is the k-round power-iteration ESTIMATE of the
# top eigenvector direction (deterministic, both engines identical); the
# test suite checks it aligns with numpy's true PC1 on planted data.

PCA_SCALE = 256
PCA_VSCALE = 1 << 20


def gramian(corpus: DataFrame, vec_col: str = "embedding", scale: int = PCA_SCALE) -> DataFrame:
    """(i, j, g): exact integer Gram matrix of the quantized vectors,
    1-based indices. d² output rows via one map-side-combinable hash agg."""
    qdf = corpus.select(quantize_vec(F.col(vec_col), scale).alias("qv"))
    a = qdf.select(F.posexplode("qv").alias("i0", "vi"), "qv")
    b = a.select("i0", "vi", F.posexplode("qv").alias("j0", "vj"))
    return b.groupBy(
        (F.col("i0") + 1).alias("i"), (F.col("j0") + 1).alias("j")
    ).agg(F.sum(F.col("vi") * F.col("vj")).alias("g"))


def power_iteration(
    cmat: dict[tuple[int, int], int], dim: int, iters: int = 4, vscale: int = PCA_VSCALE
) -> list[int]:
    """Fixed-point power iteration over an exact integer matrix (driver-side;
    unbounded Python ints ≡ the oracle's HUGEINT lane). Infinity-norm
    normalization: v' = trunc_div(w · vscale, max|w|) — all-integer and
    sign-preserving, so the k-round result is bit-identical across engines."""
    v = [vscale] * dim
    for _ in range(iters):
        w = [
            sum(cmat.get((i, j), 0) * v[j - 1] for j in range(1, dim + 1))
            for i in range(1, dim + 1)
        ]
        m = max(abs(x) for x in w)
        if m == 0:  # zero matrix — direction undefined, keep current v
            return v
        v = [_trunc_div(x * vscale, m) for x in w]
    return v


def pca_project(
    corpus: DataFrame,
    dim: int,
    iters: int = 4,
    scale: int = PCA_SCALE,
    vscale: int = PCA_VSCALE,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, pc1_q): integer projection of every vector onto the k-round
    power-iteration estimate of the top principal component of the CENTERED
    data (C = n·G − s·sᵀ — covariance scaled by n², exact from the Gram
    matrix and column sums, no float mean subtraction).

    Scale shape: two scans (Gram agg + projection); d²+d tiny rows collected
    (64-dim → 4 160 values, the kmeans driver-collect budget); projection is
    per-row codegen against the d literal eigenvector entries."""
    g_rows = gramian(corpus, vec_col, scale).collect()
    qdf = corpus.select(F.col(id_col), quantize_vec(F.col(vec_col), scale).alias("qv"))
    sums = (
        qdf.select(F.posexplode("qv").alias("i0", "v"))
        .groupBy((F.col("i0") + 1).alias("i"))
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    )
    n = sums[0]["c"] if sums else 0
    s = {r["i"]: r["s"] for r in sums}
    cmat = {(r["i"], r["j"]): n * r["g"] - s[r["i"]] * s[r["j"]] for r in g_rows}
    v = power_iteration(cmat, dim, iters, vscale)
    proj = F.aggregate(
        F.zip_with(
            F.col("qv"),
            F.array(*[F.lit(x).cast("long") for x in v]),
            lambda a, b: a * b,
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return qdf.select(F.col(id_col), proj.alias("pc1_q"))


def pca_project_sql(
    table: str = "embeddings",
    dim: int = 64,
    iters: int = 4,
    scale: int = PCA_SCALE,
    vscale: int = PCA_VSCALE,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB oracle: the SAME fixed-point pipeline — exact integer Gram +
    centering + `iters` unrolled power-iteration CTEs in the HUGEINT lane —
    certifying the distributed implementation end-to-end."""
    d1 = dim + 1
    parts = [
        f"""
WITH q AS (
  SELECT {id_col},
         list_transform({vec_col}, x -> CAST(round(CAST(x AS DOUBLE)*{scale}) AS BIGINT)) AS qv
  FROM {table}
),
cells AS (
  SELECT i, j, CAST(sum(qv[i]*qv[j]) AS BIGINT) AS g
  FROM q, range(1,{d1}) r1(i), range(1,{d1}) r2(j) GROUP BY i, j
),
sums AS (
  SELECT i, CAST(sum(qv[i]) AS BIGINT) AS s, count(*) AS n
  FROM q, range(1,{d1}) r1(i) GROUP BY i
),
gc AS (
  SELECT c.i, c.j,
         CAST(si.n AS HUGEINT)*c.g - CAST(si.s AS HUGEINT)*sj.s AS g
  FROM cells c JOIN sums si ON si.i = c.i JOIN sums sj ON sj.i = c.j
),
gmat AS (
  SELECT list(row ORDER BY i) AS G
  FROM (SELECT i, list(g ORDER BY j) AS row FROM gc GROUP BY i)
),
v0 AS (SELECT list_transform(range(1,{d1}), x -> CAST({vscale} AS HUGEINT)) AS v)"""
    ]
    prev = "v0"
    for t in range(1, iters + 1):
        parts.append(
            f""",
w{t} AS (
  SELECT list_transform(range(1,{d1}), i ->
           list_sum(list_transform(range(1,{d1}), j -> G[i][j]*v[j]))) AS w
  FROM gmat, {prev}
),
v{t} AS (
  SELECT list_transform(w, x ->
           (x*{vscale}) // list_max(list_transform(w, y -> abs(y)))) AS v
  FROM w{t}
)"""
        )
        prev = f"v{t}"
    parts.append(
        f"""
SELECT q.{id_col},
       CAST(list_sum(list_transform(range(1,{d1}), j -> CAST(q.qv[j] AS HUGEINT)*v[j])) AS BIGINT) AS pc1_q
FROM q, {prev}"""
    )
    return "".join(parts)


# -- second component via exact integer deflation ---------------------------
#
# Deflating with the Rayleigh quotient keeps everything integer: for the
# power-iteration result v (any scale), C2 = C − (vᵀCv)·vvᵀ/(vᵀv)² has the
# same eigenvectors as d²·C − (vᵀCv)·vvᵀ (d = vᵀv) — scaling a matrix never
# moves its eigenvectors. Bounds force two rescales to stay inside the
# oracle's HUGEINT (< 2^127) lane: v is coarsened to scale 2^10 before
# deflation (vd = v div 2^10), and the deflated matrix is right-shifted by
# 2^53 before the second iteration chain — both trunc-divisions, identical
# in Python (trunc_div) and DuckDB (//).

PCA_DEFL_SHIFT = 1 << 53
PCA_VD_DIV = 1 << 10


def deflate(
    cmat: dict[tuple[int, int], int], v: list[int], dim: int
) -> dict[tuple[int, int], int]:
    """Integer deflation of the dominant direction (module comment above)."""
    vd = [_trunc_div(x, PCA_VD_DIV) for x in v]
    d = sum(x * x for x in vd)
    nr = sum(
        vd[i - 1] * sum(cmat.get((i, j), 0) * vd[j - 1] for j in range(1, dim + 1))
        for i in range(1, dim + 1)
    )
    return {
        (i, j): _trunc_div(
            d * d * cmat.get((i, j), 0) - nr * vd[i - 1] * vd[j - 1], PCA_DEFL_SHIFT
        )
        for i in range(1, dim + 1)
        for j in range(1, dim + 1)
    }


def pca_project2(
    corpus: DataFrame,
    dim: int,
    iters: int = 4,
    scale: int = PCA_SCALE,
    vscale: int = PCA_VSCALE,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, pc1_q, pc2_q): integer projections onto the top TWO power-
    iteration directions (pca_project + one exact integer deflation) — the
    2-D embedding-cloud map (visualization, whitening, stratification by
    dominant axes). Same scale shape as pca_project: the second component
    costs no extra corpus scan — only driver arithmetic on the d² matrix."""
    g_rows = gramian(corpus, vec_col, scale).collect()
    qdf = corpus.select(F.col(id_col), quantize_vec(F.col(vec_col), scale).alias("qv"))
    sums = (
        qdf.select(F.posexplode("qv").alias("i0", "v"))
        .groupBy((F.col("i0") + 1).alias("i"))
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    )
    n = sums[0]["c"] if sums else 0
    s = {r["i"]: r["s"] for r in sums}
    cmat = {(r["i"], r["j"]): n * r["g"] - s[r["i"]] * s[r["j"]] for r in g_rows}
    v1 = power_iteration(cmat, dim, iters, vscale)
    v2 = power_iteration(deflate(cmat, v1, dim), dim, iters, vscale)

    def proj(v: list[int]) -> Column:
        return F.aggregate(
            F.zip_with(
                F.col("qv"),
                F.array(*[F.lit(x).cast("long") for x in v]),
                lambda a, b: a * b,
            ),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    return qdf.select(
        F.col(id_col), proj(v1).alias("pc1_q"), proj(v2).alias("pc2_q")
    )


def pca_project2_sql(
    table: str = "embeddings",
    dim: int = 64,
    iters: int = 4,
    scale: int = PCA_SCALE,
    vscale: int = PCA_VSCALE,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB oracle for pca_project2: the pca_project_sql CTE chain, then
    the deflation (vd coarsen → d, Rayleigh numerator, shifted deflated
    matrix as a second list-of-lists) and a second unrolled iteration chain
    — every step in the HUGEINT lane with the bounds noted above."""
    base = pca_project_sql(table, dim, iters, scale, vscale, vec_col, id_col)
    head, _ = base.rsplit("\nSELECT", 1)
    d1 = dim + 1
    parts = [
        head,
        f""",
vd AS (SELECT list_transform(v, x -> x // {PCA_VD_DIV}) AS vd FROM v{iters}),
defl AS (
  SELECT list_sum(list_transform(vd, x -> x*x)) AS d,
         list_sum(list_transform(range(1,{d1}), i ->
           vd[i] * list_sum(list_transform(range(1,{d1}), j -> G[i][j]*vd[j])))) AS nr
  FROM gmat, vd
),
g2 AS (
  SELECT list_transform(range(1,{d1}), i ->
           list_transform(range(1,{d1}), j ->
             (d*d*G[i][j] - nr*vd[i]*vd[j]) // {PCA_DEFL_SHIFT})) AS G
  FROM gmat, vd, defl
),
u0 AS (SELECT list_transform(range(1,{d1}), x -> CAST({vscale} AS HUGEINT)) AS v)""",
    ]
    prev = "u0"
    for t in range(1, iters + 1):
        parts.append(
            f""",
x{t} AS (
  SELECT list_transform(range(1,{d1}), i ->
           list_sum(list_transform(range(1,{d1}), j -> G[i][j]*v[j]))) AS w
  FROM g2, {prev}
),
u{t} AS (
  SELECT list_transform(w, x ->
           (x*{vscale}) // list_max(list_transform(w, y -> abs(y)))) AS v
  FROM x{t}
)"""
        )
        prev = f"u{t}"
    parts.append(
        f"""
SELECT q.{id_col},
       CAST(list_sum(list_transform(range(1,{d1}), j -> CAST(q.qv[j] AS HUGEINT)*v1.v[j])) AS BIGINT) AS pc1_q,
       CAST(list_sum(list_transform(range(1,{d1}), j -> CAST(q.qv[j] AS HUGEINT)*v2.v[j])) AS BIGINT) AS pc2_q
FROM q, v{iters} v1, {prev} v2"""
    )
    return "".join(parts)
