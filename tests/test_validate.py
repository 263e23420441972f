"""Mirror pre-flight validation (validate.py ↔ flow validate pass)."""

import pytest
from pyspark.sql import types as T

from peerdb_spark.cdc import CdcTableConfig
from peerdb_spark.validate import (
    MirrorValidationError,
    raise_on_failure,
    validate_mirror,
    validate_mirror_df,
)

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("qty", T.IntegerType()),
    T.StructField("note", T.StringType()),
])


def _cfg(tmp_path, **kw):
    base = dict(dst_table="t", pk_cols=["id"], value_schema=SCHEMA,
                path=str(tmp_path / "t"))
    base.update(kw)
    return CdcTableConfig(**base)


def _failed(res):
    return {(r.check, r.table) for r in res if not r.ok}


def test_clean_config_passes(spark, tmp_path):
    res = validate_mirror(spark, [_cfg(tmp_path)])
    assert not _failed(res)
    raise_on_failure(res)  # no raise


def test_pk_and_exclude_checks(spark, tmp_path):
    res = validate_mirror(spark, [
        _cfg(tmp_path, pk_cols=["nope"], exclude=["ghost"]),
    ])
    f = _failed(res)
    assert ("pk_in_schema", "t") in f and ("exclude_resolves", "t") in f
    with pytest.raises(MirrorValidationError):
        raise_on_failure(res)


def test_pk_excluded_rejected(spark, tmp_path):
    res = validate_mirror(spark, [_cfg(tmp_path, exclude=["id"])])
    assert ("pk_not_excluded", "t") in _failed(res)


def test_rename_collision(spark, tmp_path):
    # renaming qty onto an existing column name collides
    res = validate_mirror(spark, [_cfg(tmp_path, renames={"qty": "note"})])
    assert ("rename_no_collision", "t") in _failed(res)
    # renaming into a fresh name is fine
    ok = validate_mirror(spark, [_cfg(tmp_path, renames={"qty": "quantity"})])
    assert not _failed(ok)


def test_duplicate_destination(spark, tmp_path):
    res = validate_mirror(spark, [_cfg(tmp_path), _cfg(tmp_path)])
    assert ("unique_destination", "t") in _failed(res)


def test_meta_column_shadowing(spark, tmp_path):
    res = validate_mirror(spark, [_cfg(tmp_path, soft_delete_col="note")])
    assert ("meta_cols_free", "t") in _failed(res)


def test_destination_compat_and_resync_skip(spark, tmp_path):
    # existing destination with qty stored as bigint (widening: ok) but note
    # stored as int (string -> int: incompatible)
    dst = tmp_path / "t"
    spark.createDataFrame([(1, 2, 3)], "id long, qty long, note int").write.parquet(str(dst))
    cfg = _cfg(tmp_path)
    res = validate_mirror(spark, [cfg])
    bad = [r for r in res if r.check == "destination_compatible" and not r.ok]
    assert bad and "note" in bad[0].detail and "qty" not in bad[0].detail
    # resync recreates tables → destination check skipped (reference behavior)
    res2 = validate_mirror(spark, [cfg], resync=True)
    assert all(r.check != "destination_compatible" for r in res2)


def test_source_schema_agreement(spark, tmp_path):
    src = T.StructType([T.StructField("id", T.LongType())])  # qty/note absent
    res = validate_mirror(spark, [_cfg(tmp_path)], source_schemas={"t": src})
    bad = [r for r in res if r.check == "source_has_columns" and not r.ok]
    assert bad and "qty" in bad[0].detail


def test_validate_df_shape(spark, tmp_path):
    df = validate_mirror_df(spark, [_cfg(tmp_path)])
    assert set(df.columns) == {"check", "table", "ok", "detail"}
    assert df.where("NOT ok").count() == 0


def test_table_diff_localizes_mismatches(spark):
    from pyspark.sql import functions as F

    from peerdb_spark.validate import table_diff

    src = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    pk = ["l_orderkey", "l_linenumber"]
    assert table_diff(src, src, pk).count() == 0  # identical -> clean
    r0 = src.limit(1).collect()[0]
    cond = (F.col("l_orderkey") == r0["l_orderkey"]) & (
        F.col("l_linenumber") == r0["l_linenumber"]
    )
    mut = src.withColumn(
        "l_quantity", F.when(cond, F.col("l_quantity") + 1).otherwise(F.col("l_quantity"))
    )
    rows = table_diff(src, mut, pk).collect()
    assert len(rows) == 1  # one bucket flags, counts equal, checksums differ
    assert rows[0]["src_rows"] == rows[0]["dst_rows"]
    assert rows[0]["src_checksum"] != rows[0]["dst_checksum"]
    rows2 = table_diff(src, src.where(~cond), pk).collect()
    # the synthetic lineitem has duplicate (orderkey, linenumber) pairs, so
    # ~cond may drop >1 row; the bucket must flag with fewer dst rows
    assert len(rows2) == 1 and rows2[0]["dst_rows"] < rows2[0]["src_rows"]


def test_table_diff_null_shift_detected(spark):
    """ADVICE r4: (pk, a=NULL, b='x') vs (pk, a='x', b=NULL) must mismatch.

    concat_ws alone SKIPS NULL elements, collapsing both rows to the same
    canonical string; the per-column '1'||v / '0' encoding keeps NULL
    distinct per position."""
    from peerdb_spark.validate import table_diff

    src = spark.createDataFrame([(1, None, "x")], "pk int, a string, b string")
    dst = spark.createDataFrame([(1, "x", None)], "pk int, a string, b string")
    rows = table_diff(src, dst, ["pk"], compare_cols=["a", "b"]).collect()
    assert len(rows) == 1
    assert rows[0]["src_checksum"] != rows[0]["dst_checksum"]
    # NULL vs empty string must also differ
    src2 = spark.createDataFrame([(1, None)], "pk int, a string")
    dst2 = spark.createDataFrame([(1, "")], "pk int, a string")
    assert table_diff(src2, dst2, ["pk"], compare_cols=["a"]).count() == 1
    # and identical NULL-bearing rows still agree
    assert table_diff(src, src, ["pk"], compare_cols=["a", "b"]).count() == 0


def test_rename_swap_is_valid_and_applies_atomically(spark, tmp_path):
    """Renames apply as one atomic projection: a swap (a<->b) validates and
    produces a well-formed destination; only configs whose RESULTING names
    collide are rejected."""
    import datetime as dt
    import json

    from pyspark.sql import types as T

    from peerdb_spark import cdc
    from peerdb_spark.validate import validate_mirror

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("a", T.StringType()),
        T.StructField("b", T.StringType()),
    ])
    cfg = cdc.CdcTableConfig(
        "t", ["id"], schema, str(tmp_path / "t"), n_buckets=2,
        renames={"a": "b", "b": "a"},
    )
    res = validate_mirror(spark, [cfg])
    assert all(r.ok for r in res if r.check == "rename_no_collision")

    pipe = cdc.CdcPipeline(spark, str(tmp_path / "raw"), [cfg])
    data = [{
        "_kind": "insert", "_checkpoint_id": 1,
        "_commit_ts": dt.datetime(2024, 1, 1), "_txid": 1,
        "_src_table": "t", "_dst_table": "t",
        "_data": json.dumps({"id": 1, "a": "A", "b": "B"}),
        "_old_data": None, "_unchanged_cols": None,
    }]
    pipe.sync_batch(spark.createDataFrame(data, cdc.CHANGELOG_SCHEMA), batch_id=1)
    pipe.normalize_batches(1, 1)
    from peerdb_spark.storage import ParquetTable

    row = ParquetTable(spark, cfg.path, ["id"], 2).read().collect()[0]
    assert (row["a"], row["b"]) == ("B", "A")  # swapped, not corrupted

    bad = cdc.CdcTableConfig(
        "t2", ["id"], schema, str(tmp_path / "t2"), n_buckets=2,
        renames={"a": "b"},  # resulting names: id, b, b -> collision
    )
    res = validate_mirror(spark, [bad])
    assert any(
        r.check == "rename_no_collision" and not r.ok for r in res
    )


def test_table_diff_hypothesis_random_drift(spark):
    """Property: table_diff flags a mismatched bucket IFF the tables differ
    — over random tables with NULL-heavy columns and random mutations
    (value edits incl. NULL<->value and NULL column-shifts, row drops, row
    additions). The no-drift direction guards against false positives; the
    drift direction guards against checksum false negatives (the round-4
    concat_ws NULL defect class)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from peerdb_spark.validate import table_diff

    val = st.one_of(st.none(), st.text(alphabet="xy", min_size=0, max_size=2))
    rowst = st.tuples(val, val)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        rows=st.lists(rowst, min_size=1, max_size=12),
        mutation=st.sampled_from(["none", "edit", "swap_nulls", "drop", "add"]),
        idx=st.integers(min_value=0, max_value=11),
        data=st.data(),
    )
    def check(rows, mutation, idx, data):
        src_rows = [(i, a, b) for i, (a, b) in enumerate(rows)]
        dst_rows = list(src_rows)
        i = idx % len(dst_rows)
        pk, a, b = dst_rows[i]
        drifted = False
        if mutation == "edit":
            new_a = data.draw(val, label="new_a")
            drifted = new_a != a
            dst_rows[i] = (pk, new_a, b)
        elif mutation == "swap_nulls":
            # the classic false-negative shape: (NULL, v) vs (v, NULL)
            dst_rows[i] = (pk, b, a)
            drifted = a != b
        elif mutation == "drop":
            dst_rows.pop(i)
            drifted = True
        elif mutation == "add":
            dst_rows.append((1000 + i, a, b))
            drifted = True
        schema = "pk long, a string, b string"
        src = spark.createDataFrame(src_rows, schema)
        dst = spark.createDataFrame(dst_rows, schema)
        n_bad = table_diff(src, dst, ["pk"], ["a", "b"], n_buckets=8).count()
        assert (n_bad > 0) == drifted, (mutation, src_rows, dst_rows)

    check()
