"""Relational operators Spark lacks natively: as-of join and interval join.

Neither PeerDB nor Spark ships these as first-class operators, but both are
table stakes for the event/time-series analytics this engine's event tables
serve (the reference's warehouse targets — ClickHouse ASOF JOIN, Snowflake
MATCH_CONDITION, DuckDB ASOF — all grew one; a Spark-first engine should
express it without a nested-loop join).

Scale design (100 TB):
- asof_join is the UNION + WINDOW formulation: tag both inputs, sort within
  the key partition by (ts, side), and carry the most recent right-side
  attributes forward with last(ignorenulls). ONE hash exchange per input on
  the join key and a per-key sort — no range join, no BroadcastNestedLoop,
  no per-row binary search. Skewed keys are AQE's problem (same as any
  window); tolerance filtering is a post-hoc column compare.
- interval_join buckets time into fixed-width slots: intervals explode to
  the slots they overlap, points map to exactly one slot, and the match is
  an EQUI-join on (key, slot) + an exact containment filter. The explode
  factor is ceil(interval_len / bucket) + 1 — pick bucket ≈ the typical
  interval length so the blow-up is ~2×. Catalyst plans a shuffled hash /
  sort-merge join on narrow keys; the quadratic inequality-join plan
  (BroadcastNestedLoopJoin) never appears.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    tolerance_seconds: int | None = None,
    suffix: str = "_right",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for every left row, attach the right row with the
    largest right_ts <= left_ts (direction="backward", the default — the
    DuckDB/ClickHouse ASOF semantics) or the smallest right_ts >= left_ts
    (direction="forward"); equal timestamps match in both directions.

    Left rows with no matching right row keep NULL right columns (left join
    semantics). `tolerance_seconds` nulls out matches farther than that many
    seconds from left_ts (pandas merge_asof semantics).

    Ties on (key, right_ts): the right row with the greatest values in its
    remaining sort order wins deterministically only if the caller dedupes
    (key, ts) beforehand; this operator adds a final struct comparison so
    the winner is the max over the full right-row struct — deterministic
    for any input.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    back = direction == "backward"
    keys = [on] if isinstance(on, str) else list(on)
    rcols = [c for c in right.columns if c not in keys]
    # right rows become (keys, _ats, payload struct); left rows carry NULL
    # payload. Sorting by (_ats, _side) puts right rows BEFORE left rows at
    # equal timestamps → inclusive match. The payload struct leads with the
    # timestamp so max_by-style tie-breaking inside last() is deterministic
    # via the pre-window sort on the struct itself.
    pay = F.struct(
        F.col(right_ts).alias("_rts"), *[F.col(c) for c in rcols]
    ).alias("_pay")
    r = right.select(
        *[F.col(k) for k in keys],
        F.col(right_ts).alias("_ats"),
        F.lit(0).alias("_side"),
        pay,
    )
    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    l = left.select(  # noqa: E741
        *[F.col(k) for k in keys],
        F.col(left_ts).alias("_ats"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(r.schema["_pay"].dataType).alias("_pay"),
        *[F.col(c) for c in lcols],
    )
    r2 = r.select(
        *keys, "_ats", "_side", "_pay",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    u = l.unionByName(r2)
    # backward: ascending time, carry the last prior right payload forward.
    # forward: DESCENDING time — the same last(ignorenulls) then carries the
    # nearest FUTURE right payload. Either way right rows sort before left
    # rows at equal timestamps (inclusive match).
    ts_ord = F.col("_ats").asc() if back else F.col("_ats").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_ord, F.col("_side").asc(), F.col("_pay").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = u.withColumn("_m", F.last("_pay", ignorenulls=True).over(w)).where(
        F.col("_side") == 1
    )
    if tolerance_seconds is not None:
        gap = (
            F.expr("timestampdiff(SECOND, _m._rts, _ats)")
            if back
            else F.expr("timestampdiff(SECOND, _ats, _m._rts)")
        )
        in_tol = gap <= F.lit(tolerance_seconds)
        matched = matched.withColumn(
            "_m", F.when(in_tol, F.col("_m"))  # else NULL: match too old
        )
    taken = set(keys) | {left_ts} | set(lcols)
    out_cols = (
        [F.col(k) for k in keys]
        + [F.col("_ats").alias(left_ts)]
        + [F.col(c) for c in lcols]
        + [
            F.col(f"_m.{c}").alias(f"{c}{suffix}" if c in taken else c)
            for c in rcols
        ]
    )
    return matched.select(*out_cols)


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str] | str,
    point_ts: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int,
    suffix: str = "_right",
) -> DataFrame:
    """Point-in-interval join (inclusive bounds) as a bucketed equi-join.

    `points` rows (key, point_ts, ...) match every `intervals` row
    (key, start, end, ...) with start <= ts <= end. Timestamps may be
    TIMESTAMP or TIMESTAMP_NTZ — bucketing uses timestampdiff from a fixed
    epoch, which is defined for both (the driver testdata's event feed is
    NTZ; unix_timestamp-family functions reject NTZ).

    Non-key interval-side columns that collide with a point-side name are
    renamed with `suffix` (mirroring asof_join), so both sides may carry
    e.g. an `event_id` or `ts` without producing ambiguous output columns.

    Scale: intervals explode to ceil(len/bucket)+1 slot rows; points map to
    one slot. The join is an equi-join on (key, slot) — shuffled hash /
    sort-merge under Catalyst, broadcastable when the interval side is small.
    Pick bucket_seconds near the typical interval length: a 2× row blow-up
    on the (usually far smaller) interval side buys the equi-join plan.
    """
    keys = [on] if isinstance(on, str) else list(on)
    taken = set(points.columns)
    ren = {
        c: f"{c}{suffix}" if c in taken else c
        for c in intervals.columns
        if c not in keys
    }
    intervals = intervals.select(
        *[F.col(k) for k in keys], *[F.col(c).alias(a) for c, a in ren.items()]
    )
    start_col, end_col = ren[start_col], ren[end_col]

    def slot(col: str) -> Column:
        secs = F.expr(f"timestampdiff(SECOND, timestamp'1970-01-01 00:00:00', `{col}`)")
        return F.floor(secs / F.lit(bucket_seconds))

    iv = intervals.withColumn(
        "_slot",
        F.explode(F.sequence(slot(start_col), slot(end_col))),
    )
    pt = points.withColumn("_slot", slot(point_ts))
    joined = pt.join(iv, [*keys, "_slot"]).where(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) <= F.col(end_col))
    )
    return joined.drop("_slot")
