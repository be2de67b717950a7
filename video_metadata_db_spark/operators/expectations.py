"""Data-quality expectations: declarative constraints checked in ONE
aggregate pass (the Deequ / Great-Expectations shape, Spark-native).

A 100 TB ingest gate needs "is this batch sane?" answered without N
scans for N rules: every constraint here compiles to a conditional
aggregate over the same single pass (violation counts ride the scan as
``sum(case when ...)``); uniqueness compiles to ``count - count_distinct``
in the same aggregate.  The output is one row per rule —
(rule, column, violations, n_rows, passed) — the table a pipeline
gates a batch promotion on.

At scale: one scan + one 1-row-per-rule aggregate; no shuffle beyond
the global aggregate's partial merge.  ``approx`` uniqueness
(``approx_count_distinct``) is the cheap pre-gate for corpus-sized key
columns; exact is the default here because the oracle is exact.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expect:
    """One declarative rule: ``name`` identifies it in the report,
    ``column`` is reporting metadata, ``violation`` is a boolean Column
    that is true where the rule is BROKEN (null-safe: callers decide
    whether null violates).  ``unique_on`` instead marks a uniqueness
    rule on that column (violations = duplicated rows beyond the first
    of each value)."""

    name: str
    column: str
    violation: Column | None = None
    unique_on: str | None = None


def expect_not_null(column: str) -> Expect:
    return Expect(f"not_null({column})", column, F.col(column).isNull())


def expect_range(column: str, lo: float, hi: float) -> Expect:
    c = F.col(column)
    return Expect(
        f"range({column},{lo},{hi})",
        column,
        c.isNull() | (c < lo) | (c > hi),
    )


def expect_in(column: str, allowed: list) -> Expect:
    c = F.col(column)
    return Expect(
        f"in({column})", column, c.isNull() | ~c.isin(allowed)
    )


def expect_matches(column: str, pattern: str) -> Expect:
    c = F.col(column)
    return Expect(
        f"matches({column})", column, c.isNull() | ~c.rlike(pattern)
    )


def expect_unique(column: str) -> Expect:
    return Expect(f"unique({column})", column, unique_on=column)


def expectations_report(df: DataFrame, rules: list[Expect]) -> DataFrame:
    """(rule, column, violations, n_rows, passed) — ALL rules from one
    aggregate over one scan.

    Per-row rules become ``sum(case when violation then 1)``;
    uniqueness becomes ``count(col) - count(distinct col)`` (number of
    rows that are a repeat of an earlier value; nulls are ignored by
    both counts, pair with not_null to forbid them).  The per-rule rows
    are then unpivoted from the single aggregate row — driver-side
    width, corpus-side one pass."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, r in enumerate(rules):
        if r.unique_on is not None:
            aggs.append(
                (F.count(r.unique_on) - F.countDistinct(r.unique_on)).alias(f"_v{i}")
            )
        else:
            aggs.append(
                F.sum(F.when(r.violation, 1).otherwise(0)).cast("long").alias(f"_v{i}")
            )
    row = df.agg(*aggs)
    # one row → one report row per rule via explode of a LITERAL-shaped
    # struct array — NOT a union of per-rule projections of the
    # aggregate: Spark does no cross-branch subplan reuse, so a 5-way
    # union re-executes the aggregate (and the corpus scan) 5 times
    reports = F.array(
        *[
            F.struct(
                F.lit(r.name).alias("rule"),
                F.lit(r.column).alias("column"),
                F.col(f"_v{i}").alias("violations"),
                F.col("_n").alias("n_rows"),
                (F.col(f"_v{i}") == 0).alias("passed"),
            )
            for i, r in enumerate(rules)
        ]
    )
    return row.select(F.explode(reports).alias("r")).select("r.*")


def column_profile(df: DataFrame, columns: list[str]) -> DataFrame:
    """Per-column profile: nulls, distincts, min/max (as strings, so
    heterogenous column types stack into one report table) — the
    what-is-this-data summary a curation run records per snapshot.
    One aggregate pass; min/max/distinct all partial-aggregatable."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(columns):
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).cast("long").alias(f"_nul{i}"),
            F.countDistinct(c).alias(f"_d{i}"),
            F.min(c).cast("string").alias(f"_mn{i}"),
            F.max(c).cast("string").alias(f"_mx{i}"),
        ]
    row = df.agg(*aggs)
    # same explode-not-union shape as expectations_report: one scan
    reports = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").alias("n_rows"),
                F.col(f"_nul{i}").alias("n_null"),
                F.col(f"_d{i}").alias("n_distinct"),
                F.col(f"_mn{i}").alias("min_value"),
                F.col(f"_mx{i}").alias("max_value"),
            )
            for i, c in enumerate(columns)
        ]
    )
    return row.select(F.explode(reports).alias("r")).select("r.*")
