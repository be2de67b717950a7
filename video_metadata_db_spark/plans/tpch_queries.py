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


_Q6_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@query("q6_forecast_revenue", oracle=_Q6_SQL)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape via the SQL surface: the pure scan-and-aggregate
    query — no join at all, so it isolates scan efficiency.

    Plan notes at scale: ALL three predicates (shipdate range, discount
    band, quantity cap) must reach the parquet scan as PushedFilters and
    the ReadSchema must be exactly the 4 referenced columns — at 100 TB
    this query is min/max-stat row-group pruning plus a columnar sum;
    any plan that reads more is wrong.  DECIMAL sum, cast at the
    boundary; same text on the DuckDB oracle."""
    register_views(spark, sf_dir)
    return spark.sql(_Q6_SQL)


_Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS revenue,
       CAST(ROUND(CAST(c_acctbal AS DECIMAL(18,2)), 2) AS DOUBLE) AS c_acctbal
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name, c_acctbal
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@query("q10_returned_items", oracle=_Q10_SQL)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape via the SQL surface: who returned the most value
    in a quarter — fact⋈dims join, group by customer, top-20.

    Plan notes at scale: the returnflag and orderdate predicates push to
    their scans (a quarter of orders, a third of lineitem survive);
    nation broadcasts; the top-20 is TakeOrderedAndProject over the
    grouped frame, never a global sort.  Revenue is rounded to 2dp on
    BOTH engines before ranking and ties break on c_custkey, so the
    LIMIT boundary is deterministic cross-engine."""
    register_views(spark, sf_dir)
    return spark.sql(_Q10_SQL)


@query(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY c.c_custkey
)
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the order-count histogram over customers —
    double aggregation with a LEFT join so zero-order customers keep
    their c_count=0 bucket (COUNT over the null-extended side counts
    non-null keys only, matching the SQL semantics exactly).

    Plan notes at scale: one shuffle on custkey for join+first
    aggregate (AQE reuses the exchange), then the second aggregate's
    input is |customers| rows pre-shrunk to |distinct counts| by
    map-side partials — the histogram shuffle is trivially small."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


_Q7_SQL = """
SELECT supp_nation, cust_nation, l_year,
       CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation,
         n2.n_name AS cust_nation,
         EXTRACT(year FROM l.l_shipdate) AS l_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS volume
  FROM supplier s
  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  WHERE n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
    AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
    AND n1.n_name <> n2.n_name
    AND l.l_shipdate >= TIMESTAMP '1996-01-01'
    AND l.l_shipdate < TIMESTAMP '1998-01-01'
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


@query("q7_volume_shipping", oracle=_Q7_SQL)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape via the SQL surface: bilateral trade volume
    between two nations by ship year.

    Plan notes at scale: the nation-set predicates filter BOTH
    broadcast nation dims before the fact join (the pair inequality
    survives as a cheap post-join filter), so only qualifying
    supplier/customer rows reach the two fact shuffles
    (lineitem⋈orders on orderkey); the year extraction is
    post-aggregation-key, not a scan predicate, but the shipdate range
    IS pushed.  DECIMAL volume, cast at the boundary."""
    register_views(spark, sf_dir)
    return spark.sql(_Q7_SQL)


_Q8_SQL = """
SELECT o_year,
       CAST(ROUND(SUM(CASE WHEN nation = 'NATION_1' THEN volume ELSE 0 END)
                  / SUM(volume), 6) AS DOUBLE) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(18,2))
           * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS volume,
         n2.n_name AS nation
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
  WHERE r.r_name = 'ASIA'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01'
    AND o.o_orderdate < TIMESTAMP '1998-01-01'
    AND p.p_type = 'PROMO'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""


@query("q8_market_share", oracle=_Q8_SQL)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape via the SQL surface: one nation's share of PROMO
    part revenue in a region, by order year — the 8-table join with a
    conditional-sum ratio.

    Plan notes at scale: part (filtered to PROMO) and every
    nation/region dim broadcast; lineitem⋈orders is the single big
    shuffle; numerator and denominator are one conditional aggregate
    pass (never two scans).  The orderdate range pushes into the orders
    scan."""
    register_views(spark, sf_dir)
    return spark.sql(_Q8_SQL)


_Q19_SQL = """
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                      * CAST(1 - l_discount AS DECIMAL(18,2))), 2) AS DOUBLE)
         AS revenue,
       COUNT(*) AS n_matched
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#1' AND l.l_quantity BETWEEN 1 AND 11
       AND p.p_size BETWEEN 1 AND 5)
   OR (p.p_brand = 'Brand#2' AND l.l_quantity BETWEEN 10 AND 20
       AND p.p_size BETWEEN 1 AND 10)
   OR (p.p_brand = 'Brand#3' AND l.l_quantity BETWEEN 20 AND 30
       AND p.p_size BETWEEN 1 AND 15)
"""


@query("q19_discounted_revenue", oracle=_Q19_SQL)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape via the SQL surface: the OR-of-ANDs predicate
    stress — three brand/quantity/size bands unioned by OR across the
    join boundary.

    Plan notes at scale: Catalyst factors the common `p_partkey` join
    out of the disjunction (one broadcast hash join, the OR evaluated
    as a post-join filter with the part-only conjuncts ALSO pushed to
    the part scan) — the naive plan would union three joins.  A
    single-row aggregate output, so the whole query is one pass over
    lineitem."""
    register_views(spark, sf_dir)
    return spark.sql(_Q19_SQL)
