"""Registry mapping query names → (Spark callable, DuckDB oracle SQL).

Every operator family from SURVEY.md §2 registers one named query here;
the driver runs the Spark side and the oracle side-by-side at sf=0.01
and hash-compares values (``__spark_entry__.py`` contract).  Column
names are part of the contract: alias identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query, optionally with its oracle SQL.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator — the
    driver then records a weaker rows-only check (contract §oracle_sql).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
