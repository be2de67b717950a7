"""Canonical TPC-H-shaped analytics over the synthetic star schema.

Two purposes: (a) exercise the engine's multi-join + agg + top-k path
on the classic shapes a reference user would recognize, and (b) prove
the SQL surface — ``q3_shipping_priority`` runs through
``spark.sql(...)`` over registered views (SURVEY.md §3: the reference
has no SQL layer; the engine exposes Spark's full one).

Revenue sums are rounded to 2 decimals ON BOTH SIDES before ranking so
cross-engine float-summation-order differences can't reorder the top-k
boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table, register_views
from .registry import query

_Q3_SQL = """
SELECT l_orderkey,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       o_orderdate,
       o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15'
  AND l_shipdate > TIMESTAMP '1998-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


@query("q3_shipping_priority", oracle=_Q3_SQL)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape, executed via the SQL API (``spark.sql`` over the
    registered corpus views) — identical text runs on the DuckDB oracle.

    Plan notes at scale: customer is the small side (broadcast under
    AQE), the orders⋈lineitem equi-join shuffles on the orderkey, and
    the top-10 is TakeOrderedAndProject (no global sort materialized).
    """
    register_views(spark, sf_dir)
    return spark.sql(_Q3_SQL)


@query(
    "q5_local_supplier_revenue",
    oracle="""
SELECT n_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name IN ('AMERICA', 'ASIA')
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY n_name
ORDER BY revenue DESC, n_name
""",
)
def q5_local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table star join rolled up to supplier nation.

    The three dimension tables (supplier/nation/region) are explicitly
    ``broadcast()``: at 100 TB the fact-side join must never shuffle on
    a dimension key — only the orders⋈lineitem shuffle survives, and
    AQE coalesces its partitions.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("AMERICA", "ASIA")
    )
    dims = F.broadcast(
        supp.join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(region, F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "n_name")
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(dims, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


_Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       ROUND(SUM(CAST(l_quantity AS DECIMAL(18,2))), 2) AS total_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
    SELECT l_orderkey
    FROM lineitem
    GROUP BY l_orderkey
    HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
LIMIT 100
"""


@query("q18_large_volume_customer", oracle=_Q18_SQL)
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape via the SQL surface: aggregate the fact table,
    semi-join the qualifying keys back onto the fact⋈dims join, then
    re-aggregate — the "find heavy entities, then explain them" pattern.

    Plan notes at scale: the IN-subquery plans as a left-semi join on
    orderkey whose build side is the already-aggregated (small) key
    set; lineitem shuffles on orderkey ONCE and AQE reuses the exchange
    for both the HAVING aggregate and the semi join.  Quantity sums run
    in DECIMAL so the >300 cutoff is summation-order-proof at any
    partition count (same text on the DuckDB oracle)."""
    register_views(spark, sf_dir)
    return spark.sql(_Q18_SQL)


_Q14_SQL = """
SELECT ROUND(
         100.0 * SUM(CASE WHEN p_type = 'PROMO'
                          THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
                          ELSE CAST(0 AS DECIMAL(18,4)) END)
               / SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))),
         6) AS promo_revenue_pct,
       COUNT(*) AS n_lineitems
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1996-02-01'
"""


@query("q14_promo_effect", oracle=_Q14_SQL)
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape via the SQL surface: conditional-aggregate ratio
    over a fact⋈dim join, one month of the fact table.

    Plan notes at scale: the shipdate predicate pushes to the parquet
    scan (one month survives), part broadcasts, and the ratio is a
    single global aggregate — numerator and denominator computed in the
    same pass as exact DECIMAL sums (associative, partition-count-proof)
    and divided once at the end; same text on the DuckDB oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_Q14_SQL)
