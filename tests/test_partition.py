"""Partitioner tests (ref semantics: flow/connectors/postgres/qrep_partition.go)."""

from pyspark.sql import functions as F

from peerdb_spark.partition import (
    QRepPartition,
    minmax_partitions,
    ntile_partitions,
    num_partitions,
)


def test_num_partitions():
    assert num_partitions(0, 1000) == 1
    assert num_partitions(1000, 1000) == 1
    assert num_partitions(1001, 1000) == 2
    assert num_partitions(60000, 250) == 240


def test_minmax_partitions_cover_all_rows(spark, tables):
    li = tables["lineitem"]
    parts = minmax_partitions(li, "l_orderkey", rows_per_partition=1000)
    assert len(parts) > 1
    total = li.count()
    covered = sum(
        li.where(p.predicate("l_orderkey")).count() for p in parts
    )
    assert covered == total  # disjoint + complete
    # ranges are disjoint
    bounds = sorted((p.start, p.end) for p in parts)
    for (s1, e1), (s2, _e2) in zip(bounds, bounds[1:]):
        assert e1 < s2


def test_minmax_timestamp_watermark(spark, tables):
    od = tables["orders"]
    parts = minmax_partitions(od, "o_orderdate", rows_per_partition=2000)
    total = od.count()
    covered = sum(od.where(p.predicate("o_orderdate")).count() for p in parts)
    assert covered == total


def test_ntile_partitions_balanced(spark, tables):
    li = tables["lineitem"]
    parts = ntile_partitions(li, "l_orderkey", 8, tiebreakers=["l_linenumber"])
    assert len(parts) == 8
    # half-open ranges after the first bucket: counts sum EXACTLY to the total
    # (no boundary double-pull) and stay roughly balanced
    total = li.count()
    counts = [li.where(p.predicate("l_orderkey")).count() for p in parts]
    assert sum(counts) == total
    assert all(c > 0 for c in counts)


def test_null_partition(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30), (4, None)], "id long, wm long"
    ).cache()
    parts = minmax_partitions(df, "wm", rows_per_partition=100, add_null_partition=True)
    nullp = [p for p in parts if p.is_null_partition]
    assert len(nullp) == 1
    assert df.where(nullp[0].predicate("wm")).count() == 2


def test_ntile_partitions_no_boundary_overlap(spark):
    """Non-unique watermark: bucket N's end equals bucket N+1's start. The
    half-open ranges must pull every row exactly once even when partitions
    execute separately (resumed run with holes — no span coalescing)."""
    df = spark.range(200).select((F.col("id") % 5).alias("wm"), F.col("id"))
    parts = ntile_partitions(df, "wm", 4, tiebreakers=["id"])
    total = sum(df.where(p.predicate("wm")).count() for p in parts)
    assert total == 200
    # and the union of predicates covers everything
    import functools
    covered = df.where(functools.reduce(lambda a, b: a | b,
                                        [p.predicate("wm") for p in parts])).count()
    assert covered == 200


def test_minmax_date_watermark(spark):
    """DATE watermark: day-granularity uniform split (dates collect as
    datetime.date, not datetime — separate branch in _uniform_ranges)."""
    df = spark.range(300).select(
        F.col("id"),
        F.date_add(F.lit("2024-01-01").cast("date"), (F.col("id") % 90).cast("int")).alias("wm"),
    ).cache()
    parts = minmax_partitions(df, "wm", rows_per_partition=50)
    assert len(parts) > 1
    covered = sum(df.where(p.predicate("wm", "date")).count() for p in parts)
    assert covered == 300
    bounds = sorted((p.start, p.end) for p in parts)
    for (_s1, e1), (s2, _e2) in zip(bounds, bounds[1:]):
        assert e1 < s2


def test_predicate_wm_type_cast_ntz(spark):
    """Typed literals: predicate(wm, 'timestamp_ntz') compares cleanly against
    a TIMESTAMP_NTZ column regardless of session timezone."""
    df = spark.sql(
        "SELECT id, timestamp_ntz'2024-01-01 00:00:00' + make_interval(0,0,0,0,CAST(id AS INT),0,0) AS wm FROM range(48)"
    ).cache()
    assert dict(df.dtypes)["wm"] == "timestamp_ntz"
    parts = minmax_partitions(df, "wm", rows_per_partition=10)
    covered = sum(df.where(p.predicate("wm", "timestamp_ntz")).count() for p in parts)
    assert covered == 48


def test_partitions_tile_exactly_once_hypothesis(spark):
    """Property: for random watermark datasets (duplicates, negatives, skew)
    BOTH partitioners' predicates pull every row EXACTLY once across
    partitions — no holes, no double-pulls (the hazard half-open NTILE
    ranges exist for)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from peerdb_spark.partition import minmax_partitions, ntile_partitions
    from pyspark.sql import functions as F

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        wms=st.lists(st.integers(min_value=-50, max_value=50), min_size=1, max_size=40),
        rpp=st.integers(min_value=1, max_value=10),
        nb=st.integers(min_value=1, max_value=6),
    )
    def check(wms, rpp, nb):
        df = spark.createDataFrame(
            [(i, w) for i, w in enumerate(wms)], "id long, wm long"
        )
        for parts in (
            minmax_partitions(df, "wm", rows_per_partition=rpp),
            ntile_partitions(df, "wm", nb, tiebreakers=["id"]),
        ):
            pulled = []
            for p in parts:
                pulled += [r["id"] for r in df.where(p.predicate("wm")).collect()]
            assert sorted(pulled) == list(range(len(wms))), (wms, rpp, nb, parts)

    check()
