"""Oracle-compare every registered parity query at smoke scale."""

from __future__ import annotations

import pytest

from .oracle_utils import compare_query

PARITY = ["variant_report", "update_anti_join", "merge_union_sort"]


@pytest.mark.parametrize("name", PARITY)
def test_parity_query_matches_oracle(spark, sf_dir, name):
    compare_query(spark, name, sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["title", "n_variants", "n_years", "min_year", "max_year"]
