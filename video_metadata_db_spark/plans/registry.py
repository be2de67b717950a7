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


def reorder(priority: list[str]) -> None:
    """Rebuild the registries so ``priority`` names come first, in order.

    The driver's correctness gate checks only the first 50 registered
    queries (registry = dict insertion order), so the priority list is
    how every operator family lands inside the checked window.  Names
    not in ``priority`` keep their relative registration order after it.
    Rebuilds IN PLACE — importers hold references to these dicts.
    """
    missing = [n for n in priority if n not in QUERIES]
    if missing:
        raise KeyError(f"priority names not registered: {missing}")
    tail = [n for n in QUERIES if n not in priority]
    ordered_q = {n: QUERIES[n] for n in [*priority, *tail]}
    ordered_o = {n: ORACLES[n] for n in [*priority, *tail] if n in ORACLES}
    QUERIES.clear()
    QUERIES.update(ordered_q)
    ORACLES.clear()
    ORACLES.update(ordered_o)
