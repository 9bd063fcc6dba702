"""Guard the driver contract itself: entry() runs, every oracle key has a
query, and the registry stays import-clean."""


def test_entry_contract(spark):
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.count() > 0
    qs, oracles = E.queries(), E.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 85
    # column-name contract: every oracle is a SELECT (DuckDB-runnable text)
    for name, sql in oracles.items():
        assert "select" in sql.lower(), name
