"""Fixed-point PageRank over an edge list.

Graph-based corpus curation propagates quality through similarity edges
(rank documents by how central they are in the near-dup/kNN graph; down-
weight orphan spam, surface canonical pages). The reference ships no graph
operator (SURVEY §2.5) — this extends the training-data layer next to the
connected-components dedup grouping in functions/dedup.py.

Float PageRank is order-dependent under distributed summation, so — like
k-means and PCA in functions/cluster.py — the iteration runs in FIXED-POINT
integers: ranks at scale 2^20, per-edge contribution r div deg (trunc-div),
update r' = (15·scale + 85·Σ contrib) div 100 (damping 0.85 as exact
integer percentages). Every round is one equi-join (ranks→edges on src) +
one hash agg (sum by dst) — the textbook distributed PageRank shape, with
bit-deterministic arithmetic any engine reproduces; the oracle unrolls the
same rounds as SQL CTEs.

Bounds: Σ contrib over a node's in-edges ≤ scale · indeg, so rank values
stay ≤ ~2^20 · indeg — int64-safe for any realistic degree (< 2^43).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 1 << 20


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iters: int = 3,
    scale: int = PR_SCALE,
    materialize: bool = True,
) -> DataFrame:
    """(node, rank_q): `iters` fixed-point PageRank rounds over a DIRECTED
    edge list (pass both directions for an undirected graph). Nodes are the
    distinct sources (an undirected graph has src set == dst set; a pure
    sink in a directed graph contributes nothing onward and is omitted —
    add self-loops to keep them). `materialize` localCheckpoints each
    round's ranks (keeps lineage flat; at 100 TB write rounds to parquet).
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if materialize:
        e = e.localCheckpoint(eager=True)
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("d"))
    if materialize:
        deg = deg.localCheckpoint(eager=True)
    ranks = deg.select(F.col("src").alias("node"), F.lit(scale).cast("long").alias("r"))
    for _ in range(iters):
        contrib = (
            ranks.join(deg, ranks["node"] == deg["src"])
            .select(F.col("node").alias("cnode"), F.expr("r div d").alias("c"))
            .join(e, F.col("cnode") == e["src"])
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            deg.join(contrib, deg["src"] == contrib["dst"], "left")
            .select(
                F.col("src").alias("node"),
                F.expr(f"(15 * {scale} + 85 * coalesce(s, 0)) div 100").alias("r"),
            )
        )
        if materialize:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.select("node", F.col("r").alias("rank_q"))


def pagerank_sql(
    edges_cte: str,
    iters: int = 3,
    scale: int = PR_SCALE,
) -> str:
    """DuckDB oracle: the same rounds unrolled as CTEs. `edges_cte` is SQL
    text (parenthesized subquery allowed) producing (src, dst), already
    directed both ways for undirected graphs."""
    parts = [
        f"""
WITH e AS (SELECT * FROM {edges_cte}),
deg AS (SELECT src, count(*) AS d FROM e GROUP BY src),
r0 AS (SELECT src AS node, CAST({scale} AS BIGINT) AS r FROM deg)"""
    ]
    prev = "r0"
    for t in range(1, iters + 1):
        parts.append(
            f""",
c{t} AS (
  SELECT e.dst AS node, sum(r // d) AS s
  FROM {prev} JOIN deg ON deg.src = {prev}.node JOIN e ON e.src = {prev}.node
  GROUP BY e.dst
),
r{t} AS (
  SELECT deg.src AS node, (15 * {scale} + 85 * coalesce(s, 0)) // 100 AS r
  FROM deg LEFT JOIN c{t} ON c{t}.node = deg.src
)"""
        )
        prev = f"r{t}"
    parts.append(f"\nSELECT node, CAST(r AS BIGINT) AS rank_q FROM {prev}")
    return "".join(parts)
