"""Driver-contract smoke: entry() returns >0 rows with a stable schema."""


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["title", "n_variants", "n_years", "min_year", "max_year"]


def test_queries_oracles_aligned():
    import __spark_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 25
