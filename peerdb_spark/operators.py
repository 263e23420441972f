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
    salt_bucket_seconds: int | None = None,
) -> DataFrame:
    """As-of join: for every left row, attach the right row with the
    largest right_ts <= left_ts (direction="backward", the default — the
    DuckDB/ClickHouse ASOF semantics) or the smallest right_ts >= left_ts
    (direction="forward"); equal timestamps match in both directions.

    Left rows with no matching right row keep NULL right columns (left join
    semantics). `tolerance_seconds` nulls out matches farther than that many
    seconds from left_ts (pandas merge_asof semantics).

    NULL timestamps never participate in matching (a comparison against
    NULL is undefined): right rows with NULL right_ts are ignored, and a
    left row with NULL left_ts keeps NULL right columns. (DuckDB's native
    ASOF behaves the same way; round-5 review caught the salted path
    carrying NULL-ts right rows into every bucket.)

    Ties on (key, right_ts): the right row with the greatest values in its
    remaining sort order wins deterministically only if the caller dedupes
    (key, ts) beforehand; this operator adds a final struct comparison so
    the winner is the max over the full right-row struct — deterministic
    for any input.

    Skew guard (`salt_bucket_seconds`): the default window sorts each
    key's rows in one partition — a mega-key holding 10% of the events
    serializes on one task. Setting `salt_bucket_seconds=W` switches to a
    two-phase formulation that partitions by (key, time-bucket of width
    W): phase 1 reduces the right side to one last-payload row per (key,
    bucket) and carries the running maximum across buckets (a window over
    #buckets rows per key, not #events); phase 2 runs the as-of window
    WITHIN each (key, bucket) partition, seeding it with the carried
    state as a synthetic row at the bucket boundary. Parallelism per key
    becomes time-range/W; output is identical to the unsalted path
    (property-tested), at the cost of one extra (small) exchange — which
    appears in the plan only when the option is set.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    back = direction == "backward"
    keys = [on] if isinstance(on, str) else list(on)
    rcols = [c for c in right.columns if c not in keys]
    # NULL right timestamps can never satisfy the as-of comparison; dropping
    # them up front also keeps the salted path's bucket/carry state clean
    right = right.where(F.col(right_ts).isNotNull())
    if salt_bucket_seconds is not None:
        return _asof_join_salted(
            left, right, keys, left_ts, right_ts, tolerance_seconds,
            suffix, back, rcols, salt_bucket_seconds,
        )
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
    # NULLS FIRST in both directions: a left row with NULL left_ts must sort
    # before every right row so last(ignorenulls) finds nothing for it
    # (desc's default NULLS LAST would hand it the globally-last payload)
    ts_ord = F.col("_ats").asc_nulls_first() if back else F.col("_ats").desc_nulls_first()
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


def _asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    tolerance_seconds: int | None,
    suffix: str,
    back: bool,
    rcols: list[str],
    width_seconds: int,
) -> DataFrame:
    """Two-phase time-bucketed as-of join (see asof_join docstring).

    Both directions reduce to the BACKWARD algorithm on a monotone long
    axis `_t` (epoch micros, negated for forward — timestampdiff keeps it
    NTZ-safe). Phase 1: right rows collapse to max(struct(_t, payload))
    per (key, bucket) — the same winner the window's (ts asc, payload
    asc, last) order would pick — and a per-key window over the BUCKET
    SUMMARIES (≤ range/W rows, never events) carries the running max of
    strictly earlier buckets. Phase 2: the carried payload enters each
    bucket as a synthetic row at the bucket's start with _side = -1, so
    it sorts before any real row of the bucket and loses to any in-bucket
    right row at or after it — byte-identical results to the unsalted
    window (property-tested in test_operators.py)."""
    width = width_seconds * 1_000_000

    def t_of(col: str) -> Column:
        m = F.expr(
            f"timestampdiff(MICROSECOND, timestamp'1970-01-01 00:00:00', `{col}`)"
        )
        return m if back else -m

    def bucket_of(m: Column) -> Column:
        # exact floor division for negative axes (div truncates toward 0)
        return ((m - F.pmod(m, F.lit(width))) / F.lit(width)).cast("long")

    pay = F.struct(F.col(right_ts).alias("_rts"), *[F.col(c) for c in rcols]).alias("_pay")
    r = right.select(*keys, t_of(right_ts).alias("_t"), pay)
    r = r.withColumn("_b", bucket_of(F.col("_t")))
    lcols = [c for c in left.columns if c not in keys and c != left_ts]
    l = left.select(  # noqa: E741
        *keys,
        t_of(left_ts).alias("_t"),
        F.col(left_ts).alias("_ats"),
        *[F.col(c) for c in lcols],
    ).withColumn("_b", bucket_of(F.col("_t")))

    pay_t = r.schema["_pay"].dataType
    mx = F.struct(F.col("_t").alias("t"), F.col("_pay").alias("p"))
    last_in_bucket = r.groupBy(*keys, "_b").agg(F.max(mx).alias("_mx"))
    left_buckets = l.select(*keys, "_b").distinct().withColumn(
        "_mx", F.lit(None).cast(last_in_bucket.schema["_mx"].dataType)
    )
    # one row per (key, bucket) so the carry window's -1 bound means
    # "strictly earlier buckets", then running max of bucket winners
    bs = (
        last_in_bucket.unionByName(left_buckets)
        .groupBy(*keys, "_b")
        .agg(F.max("_mx").alias("_mx"))
    )
    wc = Window.partitionBy(*keys).orderBy("_b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    carry = (
        bs.select(*keys, "_b", F.max("_mx").over(wc).alias("_c"))
        .where(F.col("_c").isNotNull())
    )
    nulls_l = [F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols]
    carry_rows = carry.select(
        *keys, "_b",
        (F.col("_b") * width).alias("_t"),
        F.lit(-1).alias("_side"),
        F.col("_c.p").alias("_pay"),
        F.lit(None).cast(left.schema[left_ts].dataType).alias("_ats"),
        *nulls_l,
    )
    r_rows = r.select(
        *keys, "_b", "_t", F.lit(0).alias("_side"), "_pay",
        F.lit(None).cast(left.schema[left_ts].dataType).alias("_ats"),
        *nulls_l,
    )
    l_rows = l.select(
        *keys, "_b", "_t", F.lit(1).alias("_side"),
        F.lit(None).cast(pay_t).alias("_pay"), "_ats",
        *[F.col(c) for c in lcols],
    )
    u = l_rows.unionByName(r_rows).unionByName(
        carry_rows.select(*l_rows.columns)
    )
    w = (
        Window.partitionBy(*keys, "_b")
        .orderBy(F.col("_t").asc(), F.col("_side").asc(), F.col("_pay").asc())
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
        matched = matched.withColumn(
            "_m", F.when(gap <= F.lit(tolerance_seconds), F.col("_m"))
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


# ---------------------------------------------------------------------------
# ordered conversion funnel (+ incremental maintenance)
# ---------------------------------------------------------------------------


def funnel_times(
    events: DataFrame,
    steps: list[str],
    window_us: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    es_col: str = "es",
) -> DataFrame:
    """Ordered strict-sequence funnel: per user, step k's time is the
    earliest event of steps[k] strictly AFTER step k−1's time and within
    `window_us` of step 1. Returns (user, t1_us..tk_us, reached) with NULL
    times for unreached steps. Time column `es_col` is integer epoch
    MICROSECONDS (exact on any engine — see q_events_funnel).

    Plan: one min-agg per step over that step's slice, joined on the user
    key — k hash aggs, relations shrink monotonically down the funnel; no
    windows, no explode."""
    ev = events.select(
        F.col(user_col).alias("_u"), F.col(type_col).alias("_ty"), F.col(es_col).alias("_es")
    )
    acc = (
        ev.where(F.col("_ty") == steps[0])
        .groupBy("_u")
        .agg(F.min("_es").alias("t1_us"))
    )
    prev = "t1_us"
    for k, step in enumerate(steps[1:], start=2):
        nxt = (
            ev.where(F.col("_ty") == step)
            .join(acc.select("_u", "t1_us", F.col(prev).alias("_tp")), "_u")
            .where(
                (F.col("_es") > F.col("_tp"))
                & (F.col("_es") <= F.col("t1_us") + window_us)
            )
            .groupBy("_u")
            .agg(F.min("_es").alias(f"t{k}_us"))
        )
        acc = acc.join(nxt, "_u", "left")
        prev = f"t{k}_us"
    reached = F.lit(1)
    for k in range(2, len(steps) + 1):
        reached = reached + F.col(f"t{k}_us").isNotNull().cast("int")
    return acc.select(
        F.col("_u").alias(user_col),
        *[f"t{k}_us" for k in range(1, len(steps) + 1)],
        reached.cast("long").alias("reached"),
    )


def funnel_refresh(
    view: DataFrame | None,
    events_live: DataFrame,
    touched_users: DataFrame,
    steps: list[str],
    window_us: int,
    user_col: str = "user_id",
    type_col: str = "event_type",
    es_col: str = "es",
) -> DataFrame:
    """Incrementally maintain a funnel view — the touched-group
    re-aggregation pattern (mview.minmax_refresh): a funnel is NOT
    algebraically foldable (a late, EARLIER step-1 event shifts t1 and can
    invalidate previously-matched later steps), so the batch's touched
    users are re-derived from the live event history while every other
    user's row streams through untouched.

    `touched_users` is the batch's distinct user set (broadcast); cost is
    bounded by those users' event history, not the events table — at scale
    keep events bucketed by user so the semi-join prunes. Works under
    late/out-of-order arrivals AND CDC deletes (the recompute sees only
    live rows); users whose step-1 events all vanish drop from the view.
    Result ≡ funnel_times over the full live history (pinned by test)."""
    slice_ = events_live.join(F.broadcast(touched_users), user_col, "left_semi")
    fresh = funnel_times(slice_, steps, window_us, user_col, type_col, es_col)
    if view is None:
        return fresh
    cold = view.join(F.broadcast(touched_users), user_col, "left_anti")
    return cold.unionByName(fresh)
