"""Oracle-compare every registered query at smoke scale (sf0.001).

The driver does the same at sf0.01; this catches breakage earlier.
Queries without an oracle get a run-and-count check only.
"""

from __future__ import annotations

import pytest

from video_metadata_db_spark.plans import ORACLES, QUERIES

from .oracle_utils import compare_query


def _names() -> list[str]:
    return sorted(QUERIES)


@pytest.mark.parametrize("name", _names())
def test_query(spark, sf_dir, name):
    if name in ORACLES:
        compare_query(spark, name, sf_dir)
    else:
        df = QUERIES[name](spark, sf_dir)
        assert df.count() >= 0  # runs and has a stable schema
        assert df.columns


def test_no_vacuous_oracle_queries(spark, sf_dir):
    """A 0-row result on both sides passes the driver gate without
    checking anything — every oracle query must be non-empty."""
    empty = [n for n in ORACLES if QUERIES[n](spark, sf_dir).limit(1).count() == 0]
    assert not empty, f"vacuous at {sf_dir}: {empty}"
