"""Driver-contract invariants: queries/oracles stay in lockstep."""

import __spark_entry__ as entry


def test_every_query_has_an_oracle():
    qs, osql = entry.queries(), entry.oracle_sql()
    assert set(qs) == set(osql), set(qs) ^ set(osql)
    assert len(qs) >= 33


def test_oracle_sql_is_nonempty_text():
    for name, sql in entry.oracle_sql().items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_entry_uses_declared_query(spark):
    df = entry.entry(spark)
    assert set(df.columns) == {"pk", "qty", "price", "flag"}
