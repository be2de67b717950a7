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


def test_facade_preserves_checked_window_order():
    """The driver consumes queries() (the facade), so the 50-query
    checked window must survive the wrap — dict order is the contract."""
    import __spark_entry__ as e
    from video_metadata_db_spark.plans import CHECKED_FIRST

    assert list(e.queries())[:50] == CHECKED_FIRST
