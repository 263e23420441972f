"""Property-based check of the normalize merge: arbitrary I/U/D workloads must
converge to the same state as a sequential dict replay (the reference's
convergence-equality oracle pattern, flow/e2e/test_utils.go)."""

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from peerdb_spark import normalize as N

TS = dt.datetime(2024, 1, 1)

ops = st.lists(
    st.tuples(
        st.sampled_from(["insert", "update", "delete"]),
        st.integers(min_value=1, max_value=6),  # pk — small range forces collisions
        st.one_of(st.none(), st.text(alphabet="abc", max_size=3)),
    ),
    min_size=0,
    max_size=25,
)
base_rows = st.dictionaries(
    st.integers(min_value=1, max_value=6),
    st.one_of(st.none(), st.text(alphabet="xyz", max_size=3)),
    max_size=4,
)


def replay(base: dict, events: list) -> dict:
    """Sequential reference semantics: upsert on insert/update, remove on
    delete (delete of absent key is a no-op)."""
    state = dict(base)
    for kind, pk, val in events:
        if kind == "delete":
            state.pop(pk, None)
        else:
            state[pk] = val
    return state


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(base=base_rows, events=ops)
def test_merge_matches_sequential_replay(spark, base, events):
    dest = (
        spark.createDataFrame(
            [(k, v) for k, v in base.items()], "id long, val string"
        )
        if base
        else None
    )
    chg_rows = [
        {
            "_kind": kind,
            "_checkpoint_id": i,
            "_commit_ts": TS + dt.timedelta(seconds=i),
            "_txid": i,
            "_dst_table": "t",
            "_unchanged_cols": None,
            "id": pk,
            "val": val,
        }
        for i, (kind, pk, val) in enumerate(events)
    ]
    if not chg_rows:
        return
    chg = spark.createDataFrame(
        chg_rows,
        "id long, val string, _kind string, _checkpoint_id long, _commit_ts timestamp,"
        "_txid long, _dst_table string, _unchanged_cols array<string>",
    )
    got = {r["id"]: r["val"] for r in N.merge_changes(dest, chg, ["id"]).collect()}
    assert got == replay(base, events)


# --- PK-changing updates (normalize.split_pk_updates) ----------------------
# Ops now include ("move", old_pk, new_pk, val): an update whose old image
# carries a different primary key. Reference semantics
# (flow/connectors/clickhouse/normalize_query.go:180-214): the old-pk row is
# deleted, the new image upserts under the new pk.

move_ops = st.lists(
    st.one_of(
        st.tuples(
            st.sampled_from(["insert", "update", "delete"]),
            st.integers(min_value=1, max_value=6),
            st.one_of(st.none(), st.text(alphabet="abc", max_size=3)),
        ),
        st.tuples(
            st.just("move"),
            st.tuples(
                st.integers(min_value=1, max_value=6),
                st.integers(min_value=1, max_value=6),
            ),
            st.one_of(st.none(), st.text(alphabet="abc", max_size=3)),
        ),
    ),
    min_size=1,
    max_size=25,
)


def replay_with_moves(base: dict, events: list) -> dict:
    state = dict(base)
    for kind, key, val in events:
        if kind == "delete":
            state.pop(key, None)
        elif kind == "move":
            old_pk, new_pk = key
            if old_pk != new_pk:
                state.pop(old_pk, None)
            state[new_pk] = val
        else:
            state[key] = val
    return state


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(base=base_rows, events=move_ops)
def test_merge_with_pk_updates_matches_replay(spark, base, events):
    dest = (
        spark.createDataFrame(
            [(k, v) for k, v in base.items()], "id long, val string"
        )
        if base
        else None
    )
    chg_rows = []
    for i, (kind, key, val) in enumerate(events):
        if kind == "move":
            old_pk, new_pk = key
            chg_rows.append(
                {
                    "_kind": "update",
                    "_checkpoint_id": i,
                    "_commit_ts": TS + dt.timedelta(seconds=i),
                    "_txid": i,
                    "_dst_table": "t",
                    "_unchanged_cols": None,
                    "_old": {"id": old_pk, "val": None},
                    "id": new_pk,
                    "val": val,
                }
            )
        else:
            chg_rows.append(
                {
                    "_kind": kind,
                    "_checkpoint_id": i,
                    "_commit_ts": TS + dt.timedelta(seconds=i),
                    "_txid": i,
                    "_dst_table": "t",
                    "_unchanged_cols": None,
                    "_old": None,
                    "id": key,
                    "val": val,
                }
            )
    chg = spark.createDataFrame(
        chg_rows,
        "id long, val string, _kind string, _checkpoint_id long, _commit_ts timestamp,"
        "_txid long, _dst_table string, _unchanged_cols array<string>,"
        "_old struct<id: long, val: string>",
    )
    got = {r["id"]: r["val"] for r in N.merge_changes(dest, chg, ["id"]).collect()}
    assert got == replay_with_moves(base, events)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(base=base_rows, events=move_ops)
def test_merge_agg_with_pk_updates_matches_replay(spark, base, events):
    """The agg strategy must apply the same split."""
    dest = (
        spark.createDataFrame(
            [(k, v) for k, v in base.items()], "id long, val string"
        )
        if base
        else None
    )
    chg_rows = []
    for i, (kind, key, val) in enumerate(events):
        if kind == "move":
            old_pk, new_pk = key
            chg_rows.append(("update", i, TS + dt.timedelta(seconds=i), i, "t", None,
                             {"id": old_pk, "val": None}, new_pk, val))
        else:
            chg_rows.append((kind, i, TS + dt.timedelta(seconds=i), i, "t", None,
                             None, key, val))
    chg = spark.createDataFrame(
        [
            {
                "_kind": k, "_checkpoint_id": c, "_commit_ts": ts, "_txid": tx,
                "_dst_table": dt_, "_unchanged_cols": u, "_old": old, "id": pk, "val": v,
            }
            for (k, c, ts, tx, dt_, u, old, pk, v) in chg_rows
        ],
        "id long, val string, _kind string, _checkpoint_id long, _commit_ts timestamp,"
        "_txid long, _dst_table string, _unchanged_cols array<string>,"
        "_old struct<id: long, val: string>",
    )
    got = {
        r["id"]: r["val"]
        for r in N.merge_changes(dest, chg, ["id"], strategy="agg").collect()
    }
    assert got == replay_with_moves(base, events)
