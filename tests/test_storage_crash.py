"""Crash-window recovery for the bucketed destination swap (storage.py).

replace_partitions parks the old bucket dir before moving the staged one in;
these tests simulate every crash window and assert repair() + the idempotent
normalize re-run converge to the correct state (the pre-fix clear-then-move
sequence lost the bucket in the park window)."""

import os
import shutil

from pyspark.sql import functions as F

from peerdb_spark.storage import BUCKET_COL, ParquetTable


def _mk_table(spark, path, rows):
    t = ParquetTable(spark, path, ["id"], n_buckets=4)
    df = spark.createDataFrame(rows, "id long, v string")
    t.overwrite(df)
    return t


def test_repair_restores_parked_bucket(spark, tmp_path):
    """Crash between park and move: the bucket dir is missing and its content
    parked — a read must restore it."""
    path = str(tmp_path / "t")
    t = _mk_table(spark, path, [(i, f"v{i}") for i in range(40)])
    before = sorted((r["id"], r["v"]) for r in t.read().collect())
    # simulate: pick a real bucket dir, park it (what the swap does first)
    bucket_dirs = [d for d in os.listdir(path) if d.startswith(f"{BUCKET_COL}=")]
    victim = bucket_dirs[0]
    os.rename(os.path.join(path, victim), os.path.join(path, f".swap-old-{victim}"))
    after = sorted((r["id"], r["v"]) for r in t.read().collect())
    assert after == before  # repair() restored the parked bucket


def test_repair_drops_leftover_after_completed_swap(spark, tmp_path):
    """Crash between move and cleanup: both target and parked exist — the
    parked (old) copy must be dropped, the new content kept."""
    path = str(tmp_path / "t")
    t = _mk_table(spark, path, [(i, f"v{i}") for i in range(40)])
    bucket_dirs = [d for d in os.listdir(path) if d.startswith(f"{BUCKET_COL}=")]
    victim = bucket_dirs[0]
    shutil.copytree(os.path.join(path, victim), os.path.join(path, f".swap-old-{victim}"))
    before = sorted((r["id"], r["v"]) for r in t.read().collect())
    assert not os.path.isdir(os.path.join(path, f".swap-old-{victim}"))
    # no duplicate rows from the parked copy
    assert len(before) == 40


def test_orphan_staging_cleaned(spark, tmp_path):
    path = str(tmp_path / "t")
    t = _mk_table(spark, path, [(1, "a")])
    orphan = f"{path}.staging-deadbeef"
    os.makedirs(orphan)
    t.repair()
    assert not os.path.isdir(orphan)


def test_merge_after_simulated_crash_converges(spark, tmp_path):
    """Park a bucket (crash window), then re-run the merge for the batch —
    the final state must equal the no-crash outcome."""
    from peerdb_spark import normalize as N

    path = str(tmp_path / "t")
    t = _mk_table(spark, path, [(i, f"old{i}") for i in range(40)])
    changes = spark.createDataFrame(
        [(i, f"new{i}", "update", i, None) for i in range(0, 40, 5)],
        "id long, v string, _kind string, _checkpoint_id long, _commit_ts timestamp",
    )
    expected = sorted(
        (i, f"new{i}" if i % 5 == 0 else f"old{i}") for i in range(40)
    )
    # crash window: one bucket parked mid-swap
    bucket_dirs = [d for d in os.listdir(path) if d.startswith(f"{BUCKET_COL}=")]
    victim = bucket_dirs[0]
    os.rename(os.path.join(path, victim), os.path.join(path, f".swap-old-{victim}"))
    # normalize re-run (the recovery path): repair + idempotent merge
    N.merge_into_table(t, changes)
    got = sorted((r["id"], r["v"]) for r in t.read().collect())
    assert got == expected


def test_overwrite_crash_rolls_forward_to_complete_staging(spark, tmp_path):
    """Crash between park and promote with a COMPLETE staging: repair must
    promote the staged (new) state."""
    path = str(tmp_path / "t")
    t = _mk_table(spark, path, [(i, f"old{i}") for i in range(8)])
    new = spark.createDataFrame([(i, f"new{i}") for i in range(8)], "id long, v string")
    staging = f"{path}.staging-sim"
    new.withColumn(BUCKET_COL, F.pmod(F.xxhash64("id"), F.lit(4)).cast("int")) \
       .write.partitionBy(BUCKET_COL).mode("overwrite").parquet(staging)
    os.rename(path, f"{path}.overwrite-old-sim")  # park happened, promote didn't
    got = sorted((r["id"], r["v"]) for r in t.read().collect())
    assert got == sorted((i, f"new{i}") for i in range(8))
    assert not os.path.isdir(f"{path}.overwrite-old-sim")


def test_overwrite_crash_rolls_back_without_staging(spark, tmp_path):
    """Crash with no complete staging: repair restores the parked state."""
    path = str(tmp_path / "t")
    t = _mk_table(spark, path, [(i, f"old{i}") for i in range(8)])
    os.rename(path, f"{path}.overwrite-old-sim")
    incomplete = f"{path}.staging-sim"
    os.makedirs(incomplete)  # no _SUCCESS → not promotable
    got = sorted((r["id"], r["v"]) for r in t.read().collect())
    assert got == sorted((i, f"old{i}") for i in range(8))
    assert not os.path.isdir(incomplete)


def test_exists_sees_crash_parked_table(spark, tmp_path):
    """exists must repair first: a parked table is not a bootstrap case."""
    path = str(tmp_path / "t")
    t = _mk_table(spark, path, [(1, "a")])
    os.rename(path, f"{path}.overwrite-old-sim")
    assert t.exists  # repaired back into place


def test_resync_crash_window_promotes_fresh_clone(spark, tmp_path):
    """Resync uses the same park-promote markers as overwrite: a crash after
    the park with the staged clone complete must roll FORWARD to the clone."""
    from peerdb_spark.snapshot import resync_table

    path = str(tmp_path / "t")
    t = _mk_table(spark, path, [(i, f"old{i}") for i in range(8)])
    fresh = spark.createDataFrame([(i, f"fresh{i}") for i in range(8)], "id long, v string")
    resync_table(spark, fresh, t)
    got = sorted((r["id"], r["v"]) for r in t.read().collect())
    assert got == sorted((i, f"fresh{i}") for i in range(8))
    # now simulate the crash window on a SECOND resync: stage a clone, park
    # the live table, "crash" before promote
    fresh2 = spark.createDataFrame([(i, f"f2_{i}") for i in range(8)], "id long, v string")
    staging = ParquetTable(spark, f"{path}.staging-resync", ["id"], 4)
    staging.overwrite(fresh2)
    os.rename(path, f"{path}.overwrite-old-resync")
    got = sorted((r["id"], r["v"]) for r in t.read().collect())  # repair: promote
    assert got == sorted((i, f"f2_{i}") for i in range(8))


def test_reader_skips_repair_while_writer_alive(spark, tmp_path):
    """A LIVE writer's in-flight markers must survive concurrent reads: read
    paths repair only when the lease holder is dead (round-3 advice — the
    unconditional read-path repair could destroy an in-flight swap)."""
    path = str(tmp_path / "t")
    t = _mk_table(spark, path, [(i, f"v{i}") for i in range(40)])
    # simulate another (alive) writer mid-replace: bucket parked, lease held.
    # Our own pid stands in for the live writer (same liveness check path).
    bucket_dirs = [d for d in os.listdir(path) if d.startswith(f"{BUCKET_COL}=")]
    victim = bucket_dirs[0]
    os.rename(os.path.join(path, victim), os.path.join(path, f".swap-old-{victim}"))
    staging = f"{path}.staging-inflight"
    os.makedirs(staging)
    t._acquire_lease()
    try:
        assert t.exists  # read path runs, but ...
        assert os.path.isdir(os.path.join(path, f".swap-old-{victim}"))  # untouched
        assert os.path.isdir(staging)  # writer's staging not swept
    finally:
        t._release_lease()
    # writer released (done/dead) → next read repairs as before
    got = sorted((r["id"], r["v"]) for r in t.read().collect())
    assert got == sorted((i, f"v{i}") for i in range(40))
    assert not os.path.isdir(staging)


def test_stale_lease_does_not_block_repair(spark, tmp_path):
    """A lease from a DEAD pid (or an ancient timestamp) must not block
    crash recovery."""
    path = str(tmp_path / "t")
    t = _mk_table(spark, path, [(1, "a")])
    os.rename(path, f"{path}.overwrite-old-sim")
    # dead-pid lease (fork a child that exits immediately)
    pid = os.fork()
    if pid == 0:
        os._exit(0)
    os.waitpid(pid, 0)
    with open(t._lease_path, "w") as f:
        f.write(f"{pid} {__import__('time').time()}")
    assert t.exists  # dead writer → repair proceeded, table restored
    assert os.path.isdir(path)


def test_promoted_staging_regains_schema_sidecar(spark, tmp_path):
    """Roll-forward promotion re-derives the schema sidecar (staging dirs are
    raw Spark writes without one), so a later delete-all still reads empty
    with the right schema instead of failing."""
    path = str(tmp_path / "t")
    t = _mk_table(spark, path, [(i, f"old{i}") for i in range(8)])
    new = spark.createDataFrame([(i, f"new{i}") for i in range(8)], "id long, v string")
    staging = f"{path}.staging-sim"
    new.withColumn(BUCKET_COL, F.pmod(F.xxhash64("id"), F.lit(4)).cast("int")) \
       .write.partitionBy(BUCKET_COL).mode("overwrite").parquet(staging)
    os.rename(path, f"{path}.overwrite-old-sim")
    t.repair()  # promotes the staging
    assert os.path.exists(os.path.join(path, "_peerdb_schema.json"))
    # the empty-table fallback works after a delete-all: keep only the sidecar
    sidecar = open(t._schema_path).read()
    shutil.rmtree(path)
    os.makedirs(path)
    with open(t._schema_path, "w") as f:
        f.write(sidecar)
    assert t.read_raw().count() == 0  # empty read with last-known schema


def test_compact_merges_small_files(spark, tmp_path):
    from pyspark.sql import functions as F

    from peerdb_spark.storage import ParquetTable

    t = ParquetTable(spark, str(tmp_path / "t"), ["pk"], n_buckets=4)
    for i in range(4):
        t.append(
            spark.range(i * 50, (i + 1) * 50).select(
                F.col("id").alias("pk"), (F.col("id") * 2).alias("v")
            )
        )
    before = t.files_per_bucket()
    assert max(before.values()) > 1  # appends accumulated files
    rows_before = sorted((r["pk"], r["v"]) for r in t.read().collect())

    stats = t.compact()
    assert stats["buckets_compacted"] == len([b for b, n in before.items() if n > 1])
    after = t.files_per_bucket()
    assert set(after) == set(before)  # no bucket lost (incl. empty-ish ones)
    assert all(n == 1 for n in after.values())
    rows_after = sorted((r["pk"], r["v"]) for r in t.read().collect())
    assert rows_after == rows_before  # data bit-identical

    # idempotent: second compact is a no-op
    assert t.compact()["buckets_compacted"] == 0


def test_time_travel_stable_across_compaction_and_crash(spark, tmp_path):
    """r4 verdict item #7: state_as_of reconstructs from the raw log while
    compact() rewrites destination bucket files — time-travel answers (and
    the current read) must be identical before compaction, after it, and
    after a crash mid-compaction followed by repair."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from peerdb_spark import cdc
    from peerdb_spark.storage import BUCKET_COL, ParquetTable

    schema = T.StructType(
        [T.StructField("pk", T.LongType()), T.StructField("v", T.StringType())]
    )
    dst_path = str(tmp_path / "dst")
    pipe = cdc.CdcPipeline(
        spark,
        str(tmp_path / "raw"),
        [cdc.CdcTableConfig("t", ["pk"], schema, dst_path, n_buckets=4)],
    )

    def feed(batch, rows):
        df = spark.createDataFrame(
            rows, "_kind string, _checkpoint_id long, pk long, v string"
        ).select(
            "_kind",
            "_checkpoint_id",
            F.timestamp_seconds(F.col("_checkpoint_id") + 1_700_000_000).alias("_commit_ts"),
            F.col("_checkpoint_id").alias("_txid"),
            F.lit("t").alias("_src_table"),
            F.lit("t").alias("_dst_table"),
            F.when(F.col("_kind") != "delete", F.to_json(F.struct("pk", "v"))).alias("_data"),
            F.when(F.col("_kind") == "delete", F.to_json(F.struct("pk", "v"))).alias("_old_data"),
            F.lit(None).cast("array<string>").alias("_unchanged_cols"),
        )
        pipe.sync_batch(df, batch)
        pipe.normalize_batches(batch, batch)

    feed(1, [("insert", 1, i, f"a{i}") for i in range(20)])
    feed(2, [("update", 2, i, f"b{i}") for i in range(0, 20, 2)])
    feed(3, [("delete", 3, i, f"b{i}") for i in range(0, 20, 4)])

    def travel():
        return {
            k: sorted(
                (r["pk"], r["v"])
                for r in pipe.state_as_of("t", k).select("pk", "v").collect()
            )
            for k in (1, 2, 3)
        }

    t = ParquetTable(spark, dst_path, ["pk"], n_buckets=4)
    # normalize rewrites touched buckets to one file each; pile small files
    # the way a real mirror does — out-of-band bulk backfills appended next
    # to the CDC rows (pks disjoint from the CDC keyspace)
    for i in range(3):
        t.append(
            spark.createDataFrame(
                [(100 + 10 * i + j, f"bf{i}-{j}") for j in range(10)],
                "pk long, v string",
            )
        )
    before_tt = travel()
    before_rows = sorted((r["pk"], r["v"]) for r in t.read().collect())
    assert max(t.files_per_bucket().values()) > 1  # backfills piled files

    stats = t.compact()
    assert stats["buckets_compacted"] >= 1
    assert travel() == before_tt
    assert sorted((r["pk"], r["v"]) for r in t.read().collect()) == before_rows

    # crash mid-compaction: re-pile files, then simulate the park window
    feed(4, [("update", 4, i, f"c{i}") for i in range(1, 20, 4)])
    tt4 = travel()
    tt4[4] = sorted(
        (r["pk"], r["v"]) for r in pipe.state_as_of("t", 4).select("pk", "v").collect()
    )
    rows4 = sorted((r["pk"], r["v"]) for r in t.read().collect())
    bucket_dirs = [d for d in os.listdir(dst_path) if d.startswith(f"{BUCKET_COL}=")]
    victim = bucket_dirs[0]
    os.rename(
        os.path.join(dst_path, victim),
        os.path.join(dst_path, f".swap-old-{victim}"),
    )
    # read path repairs the interrupted swap; state must be the pre-crash one
    assert sorted((r["pk"], r["v"]) for r in t.read().collect()) == rows4
    got = travel()
    got[4] = sorted(
        (r["pk"], r["v"]) for r in pipe.state_as_of("t", 4).select("pk", "v").collect()
    )
    assert got == tt4
    # and a rerun of compaction converges
    t.compact()
    assert sorted((r["pk"], r["v"]) for r in t.read().collect()) == rows4


def test_fault_injection_sweep_every_swap_step(spark, tmp_path):
    """REAL fault injection (not hand-built states): interrupt
    replace_partitions at every os.rename / shutil.move call index in turn,
    then run the recovery path (repair via read + idempotent merge re-run)
    and assert the final state always equals the no-crash outcome."""
    from unittest import mock

    from peerdb_spark import normalize as N
    from peerdb_spark import storage as S

    changes_rows = [
        (i, f"new{i}", "update", 100 + i, None) for i in range(0, 40, 3)
    ]
    expected = sorted(
        (i, f"new{i}" if i % 3 == 0 else f"old{i}") for i in range(40)
    )
    chg_schema = "id long, v string, _kind string, _checkpoint_id long, _commit_ts timestamp"

    step = 0
    while True:
        path = str(tmp_path / f"t{step}")
        t = _mk_table(spark, path, [(i, f"old{i}") for i in range(40)])
        changes = spark.createDataFrame(changes_rows, chg_schema)

        calls = {"n": 0}
        real_rename, real_move = os.rename, shutil.move

        def failing_rename(a, b, _step=step, _calls=calls):
            if _calls["n"] == _step:
                raise OSError("injected crash")
            _calls["n"] += 1
            return real_rename(a, b)

        def failing_move(a, b, _step=step, _calls=calls):
            if _calls["n"] == _step:
                raise OSError("injected crash")
            _calls["n"] += 1
            return real_move(a, b)

        crashed = False
        # os is a module-level import in storage; shutil is function-local →
        # patch the global shutil module for the move hook
        with mock.patch.object(S.os, "rename", failing_rename), mock.patch(
            "shutil.move", failing_move
        ):
            try:
                N.merge_into_table(t, changes)
            except OSError:
                crashed = True
        # recovery: repair happens on read; merge re-run is idempotent
        if crashed:
            N.merge_into_table(t, spark.createDataFrame(changes_rows, chg_schema))
        got = sorted((r["id"], r["v"]) for r in t.read().collect())
        assert got == expected, (step, crashed, len(got))
        if not crashed:
            break  # step index beyond the last rename — full sweep done
        step += 1
    assert step >= 2  # the sweep actually exercised multiple crash windows


def test_fault_injection_sweep_overwrite_path(spark, tmp_path):
    """Same real-injection sweep over the full-overwrite park/promote
    protocol: after any crash window, a plain read returns a CONSISTENT
    state (old or new, never lost/mixed) and re-running the overwrite
    converges to the new state."""
    from unittest import mock

    from peerdb_spark import storage as S

    old_rows = [(i, f"old{i}") for i in range(30)]
    new_rows = [(i, f"new{i}") for i in range(30)]
    old_sorted = sorted(old_rows)
    new_sorted = sorted(new_rows)

    step = 0
    while True:
        path = str(tmp_path / f"o{step}")
        t = _mk_table(spark, path, old_rows)
        calls = {"n": 0}
        real_rename = os.rename

        def failing_rename(a, b, _step=step, _calls=calls):
            if _calls["n"] == _step:
                raise OSError("injected crash")
            _calls["n"] += 1
            return real_rename(a, b)

        crashed = False
        with mock.patch.object(S.os, "rename", failing_rename):
            try:
                t.overwrite(spark.createDataFrame(new_rows, "id long, v string"))
            except OSError:
                crashed = True
        mid = sorted((r["id"], r["v"]) for r in t.read().collect())
        assert mid in (old_sorted, new_sorted), (step, len(mid))  # never torn
        t.overwrite(spark.createDataFrame(new_rows, "id long, v string"))
        got = sorted((r["id"], r["v"]) for r in t.read().collect())
        assert got == new_sorted, (step, crashed)
        if not crashed:
            break
        step += 1
    assert step >= 1
