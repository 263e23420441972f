"""QRep partitioners — derive parallel read partitions from a watermark column.

Reference semantics (studied, not copied):
- min/max uniform range split: flow/connectors/postgres/qrep_partition.go:85-117
  + flow/connectors/utils/partition.go:246-320 (AddPartitionsWithRange)
- NTILE-balanced bucketing: flow/connectors/postgres/qrep_partition.go:38-79
  (NTILE(n) OVER (ORDER BY wm) → GROUP BY bucket → MIN/MAX)
- partition count: ceil(rows / rows_per_partition), qrep_partition.go:481-560
- NULL watermark rows get their own partition (qrep_partition.go:75-77,110-114)

Scale note: both strategies are a single small aggregation over the source
(min/max: one agg, no shuffle beyond partial-agg combine; ntile: one global
sort of the watermark column only — we project just (wm) before the window so
the sort shuffles a single column, not the row payload). The ranges then drive
predicate-pushdown reads, so each partition scan prunes at the parquet level.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class QRepPartition:
    """One unit of parallel batch replication (ref: protos/flow.proto:459-470).

    start_exclusive marks a half-open range (start, end] — used by NTILE
    partitions after the first bucket, where a non-unique watermark can put
    the same value at bucket N's end AND bucket N+1's start; inclusive ranges
    would double-pull those boundary rows when a partially-resumed run's
    holes prevent span coalescing."""

    partition_id: str
    start: Any  # inclusive unless start_exclusive
    end: Any  # inclusive
    is_null_partition: bool = False
    full_table: bool = False
    start_exclusive: bool = False

    def predicate(self, wm: str, wm_type: str | None = None):
        """Partition predicate on the watermark column.

        Pass `wm_type` (Spark DDL string, e.g. 'timestamp_ntz') when the
        column's type differs from what a bare literal infers — a naive
        datetime literal becomes TIMESTAMP (LTZ), which Spark won't compare
        against a TIMESTAMP_NTZ column; casting the literal is wall-clock
        preserving in any session timezone."""
        lit = (lambda v: F.lit(v).cast(wm_type)) if wm_type else F.lit
        if self.full_table:
            return F.lit(True)
        if self.is_null_partition:
            return F.col(wm).isNull()
        if self.start_exclusive:
            return (F.col(wm) > lit(self.start)) & (F.col(wm) <= lit(self.end))
        return F.col(wm).between(lit(self.start), lit(self.end))


def num_partitions(total_rows: int, rows_per_partition: int) -> int:
    """ceil(rows/rows_per_partition), min 1 (ref: qrep_partition.go:540-560)."""
    if total_rows <= 0:
        return 1
    return max(1, math.ceil(total_rows / max(1, rows_per_partition)))


def minmax_partitions(
    df: DataFrame,
    wm: str,
    rows_per_partition: int = 250_000,
    num_partitions_override: int | None = None,
    add_null_partition: bool = False,
) -> list[QRepPartition]:
    """Uniform range split of [min(wm), max(wm)] into N inclusive ranges.

    One aggregate job over the source (COUNT+MIN+MAX fused); numeric and
    timestamp watermarks supported. num_partitions_override skips nothing here
    (count is fused into the same agg) but is honored for parity with the
    reference's count-free mode (protos/flow.proto:415-417).
    """
    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min(wm).alias("lo"),
        F.max(wm).alias("hi"),
    ).collect()[0]
    n_rows, lo, hi = agg["n"], agg["lo"], agg["hi"]
    parts: list[QRepPartition] = []
    if n_rows and lo is not None:
        n = num_partitions_override or num_partitions(n_rows, rows_per_partition)
        parts = _uniform_ranges(lo, hi, n)
    if add_null_partition:
        parts.append(QRepPartition("p_null", None, None, is_null_partition=True))
    if not parts:
        parts = [QRepPartition("p_full", None, None, full_table=True)]
    return parts


def _uniform_ranges(lo: Any, hi: Any, n: int) -> list[QRepPartition]:
    """Split [lo, hi] into n inclusive, non-overlapping ranges.

    Integer ranges step by ceil(span/n); timestamps split on microseconds.
    (ref: flow/connectors/utils/partition.go:246-320)
    """
    import datetime as dt

    if isinstance(lo, dt.date) and not isinstance(lo, dt.datetime):
        # DATE watermark: day-granularity split (ref range types include Date
        # via the timestamp path; Spark DATE collects as datetime.date).
        # Deliberately the SAME formula as the timestamp branch with days in
        # place of microseconds — step=ceil(span/n), partition i covers
        # [lo + i*(step+1), +step] — so one closed-form oracle
        # (idx = delta // (step+1)) covers both watermark types.
        span = (hi - lo).days
        if span <= 0 or n <= 1:
            return [QRepPartition(f"p0_{lo.isoformat()}_{hi.isoformat()}", lo, hi)]
        step = math.ceil(span / n)
        out = []
        cur = lo
        i = 0
        while cur <= hi:
            nxt = min(cur + dt.timedelta(days=step), hi)
            out.append(QRepPartition(f"p{i}_{cur.isoformat()}_{nxt.isoformat()}", cur, nxt))
            cur = nxt + dt.timedelta(days=1)
            i += 1
        return out
    if isinstance(lo, dt.datetime):
        span = (hi - lo).total_seconds() * 1_000_000
        if span <= 0 or n <= 1:
            return [QRepPartition(f"p0_{lo.isoformat()}_{hi.isoformat()}", lo, hi)]
        step = math.ceil(span / n)
        out = []
        cur = lo
        i = 0
        while cur <= hi:
            nxt = min(cur + dt.timedelta(microseconds=step), hi)
            out.append(QRepPartition(f"p{i}_{cur.isoformat()}_{nxt.isoformat()}", cur, nxt))
            cur = nxt + dt.timedelta(microseconds=1)
            i += 1
        return out
    # integral path
    lo_i, hi_i = int(lo), int(hi)
    if hi_i <= lo_i or n <= 1:
        return [QRepPartition(f"p0_{lo_i}_{hi_i}", lo, hi)]
    step = math.ceil((hi_i - lo_i + 1) / n)
    out = []
    cur = lo_i
    i = 0
    while cur <= hi_i:
        nxt = min(cur + step - 1, hi_i)
        out.append(QRepPartition(f"p{i}_{cur}_{nxt}", cur, nxt))
        cur = nxt + 1
        i += 1
    return out


def ntile_partition_ranges(
    df: DataFrame,
    wm: str,
    num_buckets: int,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Balanced partition ranges via NTILE (ref: qrep_partition.go:38-79).

    Returns DataFrame(bucket, start, end, cnt) — equal-row-count buckets even
    under heavy watermark skew, where uniform range split would produce a few
    giant partitions. Projects only the ordering columns before the global
    window sort so the shuffle payload is minimal; on a cluster the sort is a
    range-partitioned TeraSort-style exchange of a narrow column, which scales.

    A non-unique ORDER BY makes NTILE assignment nondeterministic; callers
    wanting a deterministic result (e.g. the correctness oracle) pass
    tiebreakers making the ordering total.
    """
    order_cols = [F.col(wm)] + [F.col(c) for c in (tiebreakers or [])]
    w = Window.orderBy(*order_cols)
    narrow = df.select(wm, *(tiebreakers or []))
    return (
        narrow.withColumn("bucket", F.ntile(num_buckets).over(w))
        .groupBy("bucket")
        .agg(
            F.min(wm).alias("start"),
            F.max(wm).alias("end"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy("bucket")
    )


def ntile_partitions(
    df: DataFrame, wm: str, num_buckets: int, tiebreakers: list[str] | None = None
) -> list[QRepPartition]:
    """Materialize NTILE ranges as QRepPartition list for the executor.

    Buckets after the first are half-open (prev_end, end]: with a non-unique
    watermark, bucket N's max can equal bucket N+1's min, and two inclusive
    BETWEENs would both pull the boundary rows (double-append on a resumed
    run with holes). Boundary-valued rows belong to the earlier bucket."""
    rows = ntile_partition_ranges(df, wm, num_buckets, tiebreakers).collect()
    out: list[QRepPartition] = []
    prev_end = None
    for i, r in enumerate(rows):
        if i == 0:
            out.append(QRepPartition(f"p{r['bucket']}_{r['start']}_{r['end']}",
                                     r["start"], r["end"]))
        else:
            out.append(QRepPartition(f"p{r['bucket']}_{prev_end}_{r['end']}",
                                     prev_end, r["end"], start_exclusive=True))
        prev_end = r["end"]
    return out
