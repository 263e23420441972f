"""QRep engine end-to-end: partitioned pull → write modes → idempotency.

Mirrors the reference flow (flow/workflows/qrep_flow.go) over parquet:
append mirror on lineitem, upsert mirror on orders, re-run skips synced
partitions, incremental pass picks up only new watermark rows.
"""

import pytest
from pyspark.sql import functions as F

from peerdb_spark.qrep import QRepEngine, get_max_value, has_new_rows
from peerdb_spark.registry import Catalog, MirrorConfig
from peerdb_spark.storage import ParquetTable


@pytest.fixture()
def catalog(tmp_path):
    return Catalog(str(tmp_path / "catalog"))


def test_append_mirror_full_copy(spark, tables, catalog, tmp_path):
    cfg = MirrorConfig(
        name="m_append",
        kind="qrep",
        watermark_column="l_orderkey",
        write_mode="append",
        num_rows_per_partition=1000,
    )
    catalog.create_mirror(cfg)
    eng = QRepEngine(spark, catalog)
    dest = str(tmp_path / "dst")
    stats = eng.run(cfg, tables["lineitem"], dest)
    assert stats["rows"] == tables["lineitem"].count()
    got = spark.read.parquet(dest)
    assert got.count() == stats["rows"]
    # re-run: watermark recorded, no new rows → skip (idempotent)
    stats2 = eng.run(cfg, tables["lineitem"], dest)
    assert stats2["skipped"] and spark.read.parquet(dest).count() == stats["rows"]


def test_append_mirror_incremental(spark, tables, catalog, tmp_path):
    li = tables["lineitem"]
    lo, hi = li.agg(F.min("l_orderkey"), F.max("l_orderkey")).collect()[0]
    mid = (lo + hi) // 2
    first = li.where(F.col("l_orderkey") <= mid)
    cfg = MirrorConfig(
        name="m_incr", kind="qrep", watermark_column="l_orderkey",
        write_mode="append", num_rows_per_partition=1000,
    )
    eng = QRepEngine(spark, catalog)
    dest = str(tmp_path / "dst")
    eng.run(cfg, first, dest)
    assert catalog.get_last_watermark("m_incr") == first.agg(F.max("l_orderkey")).collect()[0][0]
    # second pass sees the full table; must only append wm > last rows
    eng.run(cfg, li, dest)
    assert spark.read.parquet(dest).count() == li.count()


def test_upsert_mirror_dedups_on_key(spark, tables, catalog, tmp_path):
    od = tables["orders"]
    cfg = MirrorConfig(
        name="m_upsert", kind="qrep", watermark_column="o_orderkey",
        write_mode="upsert", upsert_key_columns=["o_orderkey"],
        num_rows_per_partition=5000,
    )
    eng = QRepEngine(spark, catalog)
    dest = str(tmp_path / "dst")
    eng.run(cfg, od, dest)
    t = ParquetTable(spark, dest, ["o_orderkey"], 16)
    assert t.read().count() == od.count()
    # overlap re-sync: clear partition state, run again → still exactly-once rows
    catalog2 = Catalog(str(tmp_path / "cat2"))
    eng2 = QRepEngine(spark, catalog2)
    eng2.run(cfg, od, dest)
    assert t.read().count() == od.count()


def test_overwrite_mode(spark, tables, catalog, tmp_path):
    cfg = MirrorConfig(
        name="m_ow", kind="qrep", watermark_column="o_orderkey",
        write_mode="overwrite", partition_strategy="full",
    )
    eng = QRepEngine(spark, catalog)
    dest = str(tmp_path / "dst")
    eng.run(cfg, tables["orders"], dest)
    n = spark.read.parquet(dest).count()
    assert n == tables["orders"].count()


def test_has_new_rows_and_max(spark, tables):
    od = tables["orders"]
    mx = get_max_value(od, "o_orderkey")
    assert not has_new_rows(od, "o_orderkey", mx)
    assert has_new_rows(od, "o_orderkey", mx - 1)


def test_watermark_from_pulled_partitions_not_rescan(spark, tables, catalog, tmp_path):
    """The recorded watermark must be the max END of partitions actually
    pulled, not a post-pull re-scan of the live source (which races with
    concurrent appends and can skip rows forever). Simulated via a resumed
    run with a hole: the highest partition is already marked done, so the
    pull covers only lower ranges — the watermark must not jump to the
    source max."""
    cfg = MirrorConfig(
        name="m_wmrace", kind="qrep", watermark_column="l_orderkey",
        write_mode="append", num_rows_per_partition=5000,
    )
    catalog.create_mirror(cfg)
    eng = QRepEngine(spark, catalog)
    li = tables["lineitem"]
    parts = eng.get_partitions(cfg, li)
    assert len(parts) >= 2
    top = max(parts, key=lambda p: p.end)
    catalog.mark_partition_done(cfg.name, top.partition_id)
    eng.run(cfg, li, str(tmp_path / "dst"))
    expected = max(p.end for p in parts if p.partition_id != top.partition_id)
    src_max = li.agg(F.max("l_orderkey")).collect()[0][0]
    assert catalog.get_last_watermark(cfg.name) == expected
    assert catalog.get_last_watermark(cfg.name) < src_max


def test_qrep_append_hypothesis_random_growth(spark, catalog, tmp_path):
    """Property: over random source-growth histories (append-only with a
    monotone watermark; arbitrary batch sizes incl. empty growth between
    runs), repeated QRepEngine.run passes leave the destination EQUAL to
    the source — every row exactly once, across any partitioning the
    engine chose."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from peerdb_spark.registry import MirrorConfig

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        growth=st.lists(st.integers(min_value=0, max_value=25), min_size=1, max_size=4),
        rpp=st.integers(min_value=1, max_value=9),
        uid=st.uuids(),
    )
    def check(growth, rpp, uid):
        import shutil

        work = str(tmp_path / f"g{uid.hex[:10]}")
        cfg = MirrorConfig(
            name=f"m_{uid.hex[:10]}", kind="qrep", watermark_column="wm",
            write_mode="append", num_rows_per_partition=rpp,
        )
        catalog.create_mirror(cfg)
        eng = QRepEngine(spark, catalog)
        rows = []
        nxt = 0
        try:
            for g in growth:
                rows += [(nxt + i, (nxt + i) % 7) for i in range(g)]
                nxt += g
                if not rows:
                    continue
                src = spark.createDataFrame(rows, "wm long, val long")
                eng.run(cfg, src, work)
                got = sorted(
                    (r["wm"], r["val"])
                    for r in spark.read.parquet(work).collect()
                )
                assert got == sorted(rows), (growth, rpp, len(got), len(rows))
        finally:
            shutil.rmtree(work, ignore_errors=True)

    check()
