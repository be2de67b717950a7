"""Data-quality gate queries: declarative expectations and column
profiling over the corpus — the batch-promotion checks an ingest
pipeline runs before anything downstream trusts the data.

Both are ONE aggregate pass regardless of rule count (see
operators/expectations.py); the oracles recompute each rule as an
independent aggregate, proving the fused pass loses nothing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.expectations import (
    column_profile,
    expect_in,
    expect_matches,
    expect_not_null,
    expect_range,
    expect_unique,
    expectations_report,
)
from ..sources.tables import load_table
from .registry import query

_EXPECT_SQL = """
WITH n AS (SELECT COUNT(*) AS n_rows FROM documents),
rules AS (
  SELECT 'unique(doc_id)' AS rule, 'doc_id' AS "column",
         (SELECT COUNT(doc_id) - COUNT(DISTINCT doc_id) FROM documents) AS violations
  UNION ALL
  SELECT 'not_null(text)', 'text',
         (SELECT COUNT(*) FROM documents WHERE text IS NULL)
  UNION ALL
  SELECT 'range(n_chars,1,400)', 'n_chars',
         (SELECT COUNT(*) FROM documents
          WHERE n_chars IS NULL OR n_chars < 1 OR n_chars > 400)
  UNION ALL
  SELECT 'in(lang)', 'lang',
         (SELECT COUNT(*) FROM documents
          WHERE lang IS NULL OR lang NOT IN ('en', 'de', 'fr'))
  UNION ALL
  SELECT 'matches(source)', 'source',
         (SELECT COUNT(*) FROM documents
          WHERE source IS NULL OR NOT regexp_matches(source, '^[a-z0-9_]+$'))
)
SELECT rule, "column", violations, n.n_rows, violations = 0 AS passed
FROM rules CROSS JOIN n
ORDER BY rule
"""


@query("quality_expectations", oracle=_EXPECT_SQL)
def q_quality_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style batch gate: five declarative constraints (key
    uniqueness, non-null, numeric range, categorical membership, regex
    shape — the range and membership rules DELIBERATELY fail on part
    of the corpus so both report branches are exercised) verified in
    ONE scan + ONE aggregate — violation counts are
    conditional sums riding the same pass, uniqueness is
    count − count_distinct in the same aggregate.  The oracle computes
    every rule independently, proving the fusion exact.  At 100 TB this
    is the difference between one corpus scan and one per rule."""
    docs = load_table(spark, sf_dir, "documents")
    rules = [
        expect_unique("doc_id"),
        expect_not_null("text"),
        expect_range("n_chars", 1, 400),
        expect_in("lang", ["en", "de", "fr"]),
        expect_matches("source", "^[a-z0-9_]+$"),
    ]
    return expectations_report(docs, rules).orderBy("rule")


_PROFILE_SQL = """
WITH n AS (SELECT COUNT(*) AS n_rows FROM documents),
cols AS (
  SELECT 'doc_id' AS "column",
         (SELECT COUNT(*) FROM documents WHERE doc_id IS NULL) AS n_null,
         (SELECT COUNT(DISTINCT doc_id) FROM documents) AS n_distinct,
         (SELECT CAST(MIN(doc_id) AS VARCHAR) FROM documents) AS min_value,
         (SELECT CAST(MAX(doc_id) AS VARCHAR) FROM documents) AS max_value
  UNION ALL
  SELECT 'lang',
         (SELECT COUNT(*) FROM documents WHERE lang IS NULL),
         (SELECT COUNT(DISTINCT lang) FROM documents),
         (SELECT MIN(lang) FROM documents),
         (SELECT MAX(lang) FROM documents)
  UNION ALL
  SELECT 'n_chars',
         (SELECT COUNT(*) FROM documents WHERE n_chars IS NULL),
         (SELECT COUNT(DISTINCT n_chars) FROM documents),
         (SELECT CAST(MIN(n_chars) AS VARCHAR) FROM documents),
         (SELECT CAST(MAX(n_chars) AS VARCHAR) FROM documents)
  UNION ALL
  SELECT 'source',
         (SELECT COUNT(*) FROM documents WHERE source IS NULL),
         (SELECT COUNT(DISTINCT source) FROM documents),
         (SELECT MIN(source) FROM documents),
         (SELECT MAX(source) FROM documents)
)
SELECT "column", n.n_rows, n_null, n_distinct, min_value, max_value
FROM cols CROSS JOIN n
ORDER BY "column"
"""


@query("quality_column_profile", oracle=_PROFILE_SQL)
def q_quality_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column snapshot profile (nulls / distincts / min / max as
    strings so mixed types stack) — one fused aggregate pass; the
    oracle's per-column subqueries prove the fusion exact."""
    docs = load_table(spark, sf_dir, "documents")
    return column_profile(docs, ["doc_id", "lang", "n_chars", "source"]).orderBy(
        "column"
    )
