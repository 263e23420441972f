"""Exact distribution statistics over grouped data.

Spark's built-in percentile_approx is approximate (t-digest-like) and its
results are not reproducible against another engine; corpus curation wants
EXACT, engine-portable quantiles for documented length/quality cutoffs.

Scale: one hash exchange + per-group sort (the same cost as any windowed
rank); the quantile-rank filter is evaluated per row with a literal quantile
array, so output is |groups| × |qs| rows. For a global (ungrouped) quantile
at 100 TB prefer a two-pass histogram refinement; per-group corpus stats
(sources, languages, shards) keep groups small enough that the windowed sort
is the right plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs: Sequence[float],
    tiebreak_col: str,
) -> DataFrame:
    """Exact type-1 quantiles per group: the q-quantile is the value at rank
    ceil(q·n) in the (value, tiebreak) order — the classic inverse-ECDF
    definition, bit-identical on any engine (no interpolation, no floats
    beyond the literal q). Returns (group, q, value); a value serving two
    quantile levels appears once per level.
    """
    assert all(0 < q <= 1 for q in qs), "quantile levels must be in (0, 1]"
    w = Window.partitionBy(group_col).orderBy(F.col(value_col), F.col(tiebreak_col))
    g = Window.partitionBy(group_col)
    d = (
        df.select(group_col, value_col, tiebreak_col)
        .withColumn("_rk", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(g))
    )
    qarr = F.array(*[F.lit(float(q)) for q in qs])
    hits = F.filter(qarr, lambda q: F.ceil(q * F.col("_n")) == F.col("_rk"))
    return d.select(
        F.col(group_col),
        F.explode(hits).alias("q"),
        F.col(value_col).alias("value"),
    )


def histogram_quantiles(
    df: DataFrame,
    value_col: str,
    qs_bp: Sequence[int],
    nbins: int = 256,
) -> DataFrame:
    """Approximate global quantiles at scale — the two-pass histogram plan
    the group_quantiles docstring points at for 100 TB: pass 1 is a 1-row
    (min, max, count) agg; pass 2 is an nbins-cell histogram hash agg
    (mergeable by summing cells once (min, max) are fixed, map-side
    partials, bounded output). No global sort anywhere — the exact windowed
    rank in group_quantiles costs a full per-group sort, which is the thing
    this avoids.

    All-integer bin math over an INTEGER value column, so both engines agree
    bit-for-bit: bin(v) = (v − mn)·nbins div (range+1); the q-quantile (q in
    BASIS POINTS — integer, no float literal drift) lands in the first bin
    whose cumulative count reaches rank ceil(q·n/10⁴). Returns
    (q_bp, bin, est_lo, est_hi): the true quantile is GUARANTEED inside
    [est_lo, est_hi] (the bin's exact value range, width ≈ range/nbins —
    tighten by recursing into the bin with a second histogram pass).
    """
    assert all(0 < q <= 10_000 for q in qs_bp)
    v = F.col(value_col)
    stats = df.agg(
        F.min(v).cast("long").alias("_mn"),
        F.max(v).cast("long").alias("_mx"),
        F.count(v).alias("_n"),
    )
    # NULLs: count(v) already skips them; drop them from the histogram too —
    # otherwise the NULL bin sorts FIRST in Spark's window and LAST in
    # DuckDB's, silently shifting every cumulative count
    binned = (
        df.select(v.cast("long").alias("_v"))
        .where(F.col("_v").isNotNull())
        .crossJoin(F.broadcast(stats))
        .select(
            F.expr(f"(_v - _mn) * {nbins} div (_mx - _mn + 1)").alias("bin")
        )
    )
    hist = binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt"))
    cum = hist.select(
        "bin",
        F.sum("cnt").over(Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    )
    qrows = (
        stats.select(
            F.explode(F.array(*[F.lit(int(q)).cast("long") for q in qs_bp])).alias("q_bp"),
            "_mn",
            "_mx",
            "_n",
        )
        .withColumn("_rank", F.expr("(q_bp * _n + 9999) div 10000"))
    )
    picked = (
        qrows.join(cum, F.col("cum") >= F.col("_rank"))
        .groupBy("q_bp", "_mn", "_mx")
        .agg(F.min("bin").alias("bin"))
    )
    return picked.select(
        "q_bp",
        "bin",
        F.expr(f"_mn + (bin * (_mx - _mn + 1) + {nbins} - 1) div {nbins}").alias("est_lo"),
        F.expr(
            f"_mn + ((bin + 1) * (_mx - _mn + 1) + {nbins} - 1) div {nbins} - 1"
        ).alias("est_hi"),
    )


def histogram_quantiles_sql(
    src: str, value_expr: str, qs_bp: Sequence[int], nbins: int = 256
) -> str:
    """DuckDB oracle text for histogram_quantiles (same integer bin math)."""
    qs = ", ".join(f"({int(q)})" for q in qs_bp)
    return f"""
WITH stats AS (
  SELECT CAST(min({value_expr}) AS BIGINT) AS mn,
         CAST(max({value_expr}) AS BIGINT) AS mx,
         count({value_expr}) AS n
  FROM {src}
),
hist AS (
  SELECT ((CAST({value_expr} AS BIGINT) - mn) * {nbins}) // (mx - mn + 1) AS bin,
         count(*) AS cnt
  FROM {src}, stats WHERE {value_expr} IS NOT NULL GROUP BY 1
),
cum AS (SELECT bin, sum(cnt) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
qr AS (
  SELECT CAST(q_bp AS BIGINT) AS q_bp, mn, mx,
         (q_bp * n + 9999) // 10000 AS rank
  FROM (VALUES {qs}) t(q_bp), stats
),
picked AS (
  SELECT q_bp, mn, mx, min(bin) AS bin
  FROM qr JOIN cum ON cum.cum >= qr.rank GROUP BY q_bp, mn, mx
)
SELECT q_bp, bin,
       mn + (bin * (mx - mn + 1) + {nbins} - 1) // {nbins} AS est_lo,
       mn + ((bin + 1) * (mx - mn + 1) + {nbins} - 1) // {nbins} - 1 AS est_hi
FROM picked
"""
