"""Switchboard parity: read-only statement gating + streamed guardrails
(peerdb_spark/switchboard.py vs flow/switchboard/)."""

import pytest

from peerdb_spark.switchboard import (
    GuardrailError,
    Guardrails,
    check_query,
    split_statements,
    stream_query,
)


def test_allowlist_accepts_read_statements():
    for q in [
        "SELECT 1",
        "  with x as (select 1) select * from x",
        "EXPLAIN SELECT 2",
        "SHOW TABLES",
        "VALUES (1), (2)",
        "BEGIN; SELECT 1; COMMIT",
        "RESET search_path",
        "DISCARD PLANS",
    ]:
        check_query(q)  # must not raise


def test_allowlist_rejects_writes_and_ddl():
    for q, kw in [
        ("INSERT INTO t VALUES (1)", "INSERT"),
        ("UPDATE t SET a = 1", "UPDATE"),
        ("DELETE FROM t", "DELETE"),
        ("DROP TABLE t", "DROP"),
        ("CREATE TABLE t (a int)", "CREATE"),
        ("COPY t FROM '/x'", "COPY"),
        ("GRANT ALL ON t TO u", "GRANT"),
        ("SELECT 1; DROP TABLE t", "DROP"),  # smuggled second statement
    ]:
        with pytest.raises(GuardrailError, match=f"not allowed: {kw}"):
            check_query(q)


def test_readonly_bypass_attempts_blocked():
    with pytest.raises(GuardrailError, match="read-only"):
        check_query("SET default_transaction_read_only = off")
    with pytest.raises(GuardrailError, match="set_config"):
        check_query("SELECT set_config('transaction_read_only', 'off', false)")
    with pytest.raises(GuardrailError, match="RESET ALL"):
        check_query("RESET ALL")
    with pytest.raises(GuardrailError, match="DISCARD ALL"):
        check_query("DISCARD all")


def test_read_only_false_is_passthrough():
    check_query("DROP TABLE t", read_only=False)  # no gate


def test_reset_named_guc_allowed():
    # ALL detection is word-boundary: a GUC merely STARTING with "all"
    # ("RESET allow_system_table_mods" is a real PG setting) must pass,
    # while every casing/spacing of the bare ALL keyword is refused.
    check_query("RESET allow_system_table_mods")
    check_query("RESET allowed_custom_guc")
    for bad in ["RESET ALL", "RESET all", "RESET  All", "DISCARD ALL;"]:
        with pytest.raises(GuardrailError, match="ALL not allowed"):
            check_query(bad)


def test_split_respects_dollar_quoting():
    # a ';' inside $$…$$ or $tag$…$tag$ must not split (DO blocks,
    # function bodies — the pgsplit behavior)
    q = "DO $$ BEGIN PERFORM 1; END $$; SELECT 2"
    assert split_statements(q) == ["DO $$ BEGIN PERFORM 1; END $$", "SELECT 2"]
    q = "CREATE FUNCTION f() AS $fn$ SELECT ';'; $fn$ LANGUAGE sql; SELECT 3"
    assert split_statements(q) == [
        "CREATE FUNCTION f() AS $fn$ SELECT ';'; $fn$ LANGUAGE sql",
        "SELECT 3",
    ]
    # nested different tags: inner $$ is literal text inside $a$…$a$
    q = "SELECT $a$ x $$ ; $$ y $a$; SELECT 4"
    assert split_statements(q) == ["SELECT $a$ x $$ ; $$ y $a$", "SELECT 4"]
    # a bare '$' (positional param / money) is not a tag
    assert split_statements("SELECT $1; SELECT 2") == ["SELECT $1", "SELECT 2"]
    # dollar-quote inside a regular string stays inert
    assert split_statements("SELECT '$$;$$'; SELECT 5") == [
        "SELECT '$$;$$'", "SELECT 5",
    ]


def test_split_respects_quotes_and_comments():
    q = "SELECT 'a;b'; SELECT \"c;d\" -- trailing; comment\n; SELECT 'it''s'"
    assert split_statements(q) == [
        "SELECT 'a;b'",
        'SELECT "c;d"',
        "SELECT 'it''s'",
    ]


def test_stream_row_budget_trips_mid_stream(spark):
    g = Guardrails(max_rows=10)
    got = []
    with pytest.raises(GuardrailError, match="row limit exceeded: 11"):
        for r in stream_query(spark, "SELECT id FROM range(100)", g):
            got.append(r.id)
    assert len(got) == 10  # exactly the budget was delivered, then the trip


def test_stream_byte_budget_and_stats(spark):
    g = Guardrails(max_bytes=50)
    with pytest.raises(GuardrailError, match="byte limit exceeded"):
        for _ in stream_query(
            spark, "SELECT repeat('x', 30) AS s FROM range(10)", g
        ):
            pass
    rows, nbytes = g.stats()
    assert rows == 2 and nbytes == 60  # second row crossed the 50-byte cap


def test_stream_unlimited_and_gated(spark):
    assert len(list(stream_query(spark, "SELECT id FROM range(7)"))) == 7
    with pytest.raises(GuardrailError, match="not allowed: DROP"):
        list(stream_query(spark, "DROP TABLE nope"))


def test_sql_surface_read_only_mode(spark):
    from peerdb_spark.registry import Catalog
    from peerdb_spark.sql_surface import SqlSurface

    surf = SqlSurface(spark, Catalog(), read_only=True)
    assert [r[0] for r in surf.execute("SELECT 41 + 1").collect()] == [42]
    with pytest.raises(GuardrailError, match="not allowed: DROP"):
        surf.execute("DROP TABLE victim")
    # introspection stays available in operator mode
    assert surf.execute("SHOW MIRRORS").count() == 0
    # destructive control-plane statements are gated too (the reference's
    # CheckQuery rejects everything outside the read-only allowlist; an
    # accidental DROP MIRROR is the exact fat-finger this mode guards)
    for stmt in [
        "DROP MIRROR m1",
        "RESYNC MIRROR m1",
        "CREATE PEER p FROM postgres WITH (path = '/tmp/x')",
        "DROP PEER p",
    ]:
        with pytest.raises(GuardrailError, match="read-only"):
            surf.execute(stmt)


def test_sql_surface_read_only_allow_control(spark):
    from peerdb_spark.registry import Catalog
    from peerdb_spark.sql_surface import SqlSurface

    surf = SqlSurface(spark, Catalog(), read_only=True, allow_control=True)
    # queries still gated …
    with pytest.raises(GuardrailError, match="not allowed: DELETE"):
        surf.execute("DELETE FROM t")
    # … but the operator keeps mirror-management powers
    r = surf.execute("CREATE PEER p FROM postgres WITH (path = '/tmp/x')")
    assert r == {"ok": True, "peer": "p"}
    assert surf.execute("DROP PEER p") == {"ok": True}


def test_split_statements_property_random_quoting():
    """Property: for randomly generated statement lists whose quoted literals
    may contain ';' and '--', splitting the ';'-joined text recovers exactly
    the original statements."""
    import random

    rng = random.Random(99)
    alphabet = ["abc", "x;y", "it''s", "--not a comment", "se;mi", "plain"]
    for _ in range(200):
        stmts = []
        for _s in range(rng.randint(1, 5)):
            parts = ["SELECT"]
            for _w in range(rng.randint(1, 4)):
                w = rng.choice(alphabet)
                if ";" in w or "-" in w or "'" in w:
                    parts.append(f"'{w}'")
                else:
                    parts.append(w)
            stmts.append(" ".join(parts))
        joined = "; ".join(stmts) + (";" if rng.random() < 0.5 else "")
        assert split_statements(joined) == stmts, (joined, stmts)
