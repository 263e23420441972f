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
