"""Boundary-formatter queries: the reference's display functions as
oracle-paired computations over corpus columns.

The DuckDB side reimplements the exact semantics with ``round_even``
(Python ``round`` is half-to-even, as is Spark's ``bround``), generated
inline by string templates because the nested carry logic repeats
sub-terms and DuckDB macros can't be assumed in the driver's runner.

Tie-safety: IEC formatting uses ``printf('%3.1f')`` whose half-way
rounding differs between C (half-even) and Java (half-up).  Ties need a
scaled value with an exact binary ``.25``/``.75`` fraction, which
requires the byte count to be divisible by 4 — so the query feeds only
ODD byte counts and no tie can occur.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.scalar import duration_hms, sizeof_fmt
from ..sources.tables import load_table
from .registry import query


def _hms_sql(raw: str) -> str:
    """DuckDB expression replicating duration_hms(raw, concise=True)."""
    secs0 = f"CAST(round_even({raw}, 0) AS BIGINT)"
    m0 = f"(CASE WHEN {secs0} >= 60 THEN CAST(round_even({secs0} / 60.0, 0) AS BIGINT) ELSE 0 END)"
    s1 = f"(CASE WHEN {secs0} >= 60 THEN {secs0} % 60 ELSE {secs0} END)"
    h = f"(CASE WHEN {m0} >= 60 THEN CAST(round_even({m0} / 60.0, 0) AS BIGINT) ELSE 0 END)"
    m = f"(CASE WHEN {m0} >= 60 THEN {m0} % 60 ELSE {m0} END)"
    no_hm = f"({h} = 0 OR {m} = 0)"
    secs_str = (
        f"(CASE WHEN {no_hm} AND {raw} < 1 AND {raw} > 0 THEN CAST(round_even({raw}, 2) AS VARCHAR) "
        f"WHEN {no_hm} AND {raw} < 60 AND {raw} > 1 THEN CAST({secs0} AS VARCHAR) "
        f"ELSE CAST({s1} AS VARCHAR) END)"
    )
    return (
        f"((CASE WHEN {h} > 0 THEN CAST({h} AS VARCHAR) || 'h:' ELSE '' END) || "
        f"(CASE WHEN {m} > 0 THEN CAST({m} AS VARCHAR) || 'm:' ELSE '' END) || "
        f"{secs_str} || 's')"
    )


def _sizeof_sql(num: str) -> str:
    """DuckDB expression replicating sizeof_fmt(num) for < ZiB inputs."""
    units = ["", "Ki", "Mi", "Gi", "Ti", "Pi", "Ei", "Zi"]
    expr = f"printf('%.1f%sB', CAST({num} AS DOUBLE) / 1024.0^{len(units)}, 'Yi')"
    for i in reversed(range(len(units))):
        scaled = f"(CAST({num} AS DOUBLE) / 1024.0^{i})"
        expr = (
            f"(CASE WHEN abs({scaled}) < 1024.0 THEN printf('%3.1f%sB', {scaled}, '{units[i]}') "
            f"ELSE {expr} END)"
        )
    return expr


_RAW = "(l_quantity * 73.7 + l_discount)"  # spans sub-second impossible; hours yes
_SUBSEC = "(l_discount * 9.7)"  # 0 .. ~1 — exercises the 2-decimal branch
_ODD_BYTES = "((l_orderkey * 104729 + l_partkey * 7919) % 1099511627776) * 2 + 1"


@query(
    "fmt_duration_hms",
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       {_hms_sql(_RAW)} AS dur_hms,
       {_hms_sql(_SUBSEC)} AS dur_hms_subsec
FROM lineitem
WHERE l_orderkey % 20 = 0
ORDER BY l_orderkey, l_linenumber
""",
)
def q_fmt_duration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """duration_hms over derived second counts (carry + fractional
    branches all hit).  Reference: video_metadata_db.py:69-110."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 20 == 0)
    raw = F.col("l_quantity") * 73.7 + F.col("l_discount")
    subsec = F.col("l_discount") * 9.7
    return li.select(
        "l_orderkey",
        "l_linenumber",
        duration_hms(raw).alias("dur_hms"),
        duration_hms(subsec).alias("dur_hms_subsec"),
    ).orderBy("l_orderkey", "l_linenumber")


@query(
    "fmt_sizeof_iec",
    oracle=f"""
SELECT l_orderkey, l_linenumber,
       {_sizeof_sql(_ODD_BYTES)} AS size_h
FROM lineitem
WHERE l_orderkey % 20 = 0
ORDER BY l_orderkey, l_linenumber
""",
)
def q_fmt_sizeof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sizeof_fmt over odd byte counts spanning B..TiB.
    Reference: video_metadata_db.py:190-196."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 20 == 0)
    odd = (F.col("l_orderkey") * 104729 + F.col("l_partkey") * 7919) % F.lit(1099511627776) * 2 + 1
    return li.select(
        "l_orderkey", "l_linenumber", sizeof_fmt(odd).alias("size_h")
    ).orderBy("l_orderkey", "l_linenumber")
