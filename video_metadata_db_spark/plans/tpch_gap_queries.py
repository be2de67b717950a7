"""The remaining TPC-H shapes (Q2/4/9/11/12/15/16/17/20/21/22) —
completing the 22-query suite over the synthetic star schema.

The corpus has no ``partsupp`` table and lacks a few columns
(commit/receipt dates, ship mode, phone), so each query is ADAPTED:
the data predicates change, but the defining PLAN SHAPE of each query
— the thing that stresses an optimizer — is preserved exactly:

========  =====================================================
Q2        min-per-group equality self-join (argmin decorrelation)
Q4        correlated EXISTS → left-semi join with interval math
Q9        multi-dim profit expression over a 5-table join
Q11       scalar-aggregate-subquery HAVING threshold
Q12       conditional two-way counts over a date-windowed join
Q15       view + scalar MAX equality (top-1 without LIMIT)
Q16       NOT-IN anti join + COUNT(DISTINCT) per group
Q17       correlated scalar AVG subquery per part
Q20       nested IN/HAVING semi-join chain
Q21       EXISTS + NOT-EXISTS self-joins (strict latest-shipper)
Q22       two scalar subqueries + anti join on recent activity
========  =====================================================

Where lineitem stands in for partsupp, the (l_partkey, l_suppkey)
aggregate IS the part-supplier bridge.  All money arithmetic runs in
DECIMAL so sums are associative (partition-count-proof) and every
boundary comparison (MIN/MAX equality, HAVING threshold, avg
comparison) is exact on both engines; aggregates cast to DOUBLE at the
output boundary so the driver's hasher canonicalizes them.

Reference parity note: the reference tool (video_metadata_db.py) has
no SQL surface at all — this module, like tpch_queries.py, exists to
prove the engine exposes Spark's full one (SURVEY.md §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table, register_views
from .registry import query

# --------------------------------------------------------------- Q2 ---

_Q2_SQL = """
WITH offers AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem
  GROUP BY l_partkey, l_suppkey
),
best AS (
  SELECT l_partkey AS b_partkey, MIN(unit_cost) AS min_cost
  FROM offers
  GROUP BY l_partkey
)
SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey, p.p_type,
       CAST(ROUND(o.unit_cost, 6) AS DOUBLE) AS supply_cost
FROM offers o
JOIN best ON o.l_partkey = b_partkey AND o.unit_cost = min_cost
JOIN part p ON p.p_partkey = o.l_partkey
JOIN supplier s ON s.s_suppkey = o.l_suppkey
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey
WHERE p.p_size BETWEEN 10 AND 30
  AND p.p_type IN ('SMALL', 'MEDIUM')
  AND r.r_name IN ('ASIA', 'AMERICA', 'EUROPE')
ORDER BY s.s_acctbal DESC, n.n_name, s.s_name, p.p_partkey
LIMIT 100
"""


@query("q2_min_cost_supplier", oracle=_Q2_SQL)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) whose
    unit cost equals the part's MINIMUM unit cost — the classic
    correlated-MIN subquery, decorrelated into an aggregate + equality
    self-join.  The (l_partkey, l_suppkey) aggregate is the partsupp
    bridge (the corpus has no partsupp table).

    Plan notes at scale: lineitem shuffles ONCE on (partkey, suppkey);
    the per-part MIN is a map-side-partial re-aggregate of the offers
    frame, and AQE reuses the exchange for the offers⋈best equi-join on
    partkey.  part/supplier/nation/region all broadcast.  The MIN
    equality is exact: both sides compute the same IEEE division on the
    same operands, and MIN is order-independent — no float-summation
    hazard.  Sort key (acctbal DESC, n_name, s_name, p_partkey) is a
    total order, so the LIMIT boundary is deterministic cross-engine;
    top-100 runs as TakeOrderedAndProject, never a global sort."""
    register_views(spark, sf_dir)
    return spark.sql(_Q2_SQL)


# --------------------------------------------------------------- Q4 ---

_Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 60 DAY
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("q4_order_priority", oracle=_Q4_SQL)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority histogram of orders with at least one
    LATE line — correlated EXISTS with interval arithmetic in the
    correlated predicate (ship > order date + 60 days stands in for
    commitdate < receiptdate, which the corpus lacks).

    Plan notes at scale: Catalyst decorrelates the EXISTS into a
    left-semi hash join on orderkey; the one-quarter orderdate window
    pushes into the orders scan (only ~4% of orders survive to the
    join), and the non-equi ship-vs-order-date term rides the semi join
    as its secondary condition — no fallback to a nested loop."""
    register_views(spark, sf_dir)
    return spark.sql(_Q4_SQL)


# --------------------------------------------------------------- Q9 ---

_Q9_SQL = """
SELECT nation, o_year, CAST(ROUND(SUM(amount), 2) AS DOUBLE) AS sum_profit
FROM (
  SELECT n.n_name AS nation,
         EXTRACT(year FROM o.o_orderdate) AS o_year,
         CAST(l.l_extendedprice AS DECIMAL(12,2))
           * CAST(1 - l.l_discount AS DECIMAL(12,2))
           - CAST(0.6 AS DECIMAL(12,2))
             * CAST(p.p_retailprice AS DECIMAL(12,2))
             * CAST(l.l_quantity AS DECIMAL(12,2)) AS amount
  FROM part p
  JOIN lineitem l ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  WHERE p.p_name LIKE '%red%'
) profit
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


@query("q9_product_type_profit", oracle=_Q9_SQL)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on a part-name family by supplier nation
    and order year.  Supply cost is synthesized as 60% of retail price
    × quantity (no partsupp.ps_supplycost in the corpus) — the
    expression keeps Q9's defining trait: a multi-table arithmetic
    amount aggregated across two non-join dimensions.

    Plan notes at scale: the p_name LIKE predicate prunes part BEFORE
    its broadcast (only the matching family ships to executors);
    lineitem⋈orders on orderkey is the single big shuffle;
    supplier/nation broadcast.  DECIMAL(12,2) operands keep the 3-term
    product within both engines' 38-digit precision cap, so the profit
    amounts are bit-exact on both sides."""
    register_views(spark, sf_dir)
    return spark.sql(_Q9_SQL)


# -------------------------------------------------------------- Q11 ---

_Q11_SQL = """
WITH supp_nation AS (
  SELECT s_suppkey
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3',
                   'NATION_4', 'NATION_5')
),
value_by_part AS (
  SELECT l_partkey, SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val
  FROM lineitem JOIN supp_nation ON l_suppkey = s_suppkey
  GROUP BY l_partkey
)
SELECT l_partkey AS p_partkey, CAST(val AS DOUBLE) AS part_value
FROM value_by_part
WHERE val * (SELECT COUNT(*) FROM value_by_part)
      > (SELECT SUM(val) FROM value_by_part) * 2
ORDER BY part_value DESC, p_partkey
"""


@query("q11_important_stock", oracle=_Q11_SQL)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose traded value through a nation group
    exceeds a MULTIPLE OF THE GLOBAL MEAN — the scalar-aggregate-
    subquery HAVING pattern.  ``val * cnt > total * 2`` is the exact-
    arithmetic form of ``val > 2 * avg(val)``: integer multiples of an
    exact DECIMAL sum, so the threshold boundary cannot drift between
    engines — and unlike Q11's fixed FRACTION of the total, the mean
    threshold stays non-vacuous at every scale factor (a fixed fraction
    goes empty once the part count exceeds its reciprocal).

    Plan notes at scale: the supplier-nation filter broadcasts into the
    lineitem scan's join; ONE shuffle on partkey builds value_by_part,
    the global total re-aggregates its partials (tiny), and the scalar
    result broadcasts back as a literal filter — the value_by_part
    exchange is reused by AQE, never recomputed."""
    register_views(spark, sf_dir)
    return spark.sql(_Q11_SQL)


# -------------------------------------------------------------- Q12 ---

_Q12_SQL = """
SELECT l_returnflag AS ship_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


@query("q12_shipping_priority_split", oracle=_Q12_SQL)
def q12_shipping_priority_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per-class urgent-vs-other line counts over a
    one-year ship window (l_returnflag stands in for the absent
    l_shipmode).  The defining trait — TWO complementary conditional
    counts in one aggregation pass — is intact.

    Plan notes at scale: the shipdate year pushes into the lineitem
    scan; one shuffle on orderkey for the join, and both CASE counts
    ride the same aggregate (never two scans).  The 3-group output
    makes the final exchange trivial."""
    register_views(spark, sf_dir)
    return spark.sql(_Q12_SQL)


# -------------------------------------------------------------- Q15 ---

_Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(1 - l_discount AS DECIMAL(18,2))) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       CAST(ROUND(total_revenue, 2) AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


@query("q15_top_supplier", oracle=_Q15_SQL)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with MAXIMUM quarterly revenue,
    selected by scalar-MAX equality against the revenue view — top-1
    WITH ties, which LIMIT 1 cannot express.

    Plan notes at scale: the revenue CTE is one shuffle on suppkey over
    a date-pruned lineitem scan; Spark evaluates it once — the MAX is a
    re-aggregate of the same exchange (AQE reuse) broadcast back as a
    one-row filter.  The equality is safe because revenue is an exact
    DECIMAL sum: two engines cannot disagree about which supplier
    attains the max."""
    register_views(spark, sf_dir)
    return spark.sql(_Q15_SQL)


# -------------------------------------------------------------- Q16 ---

_Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 49, 50)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


@query("q16_parts_supplier_count", oracle=_Q16_SQL)
def q16_parts_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct supplier counts per (brand, type,
    size) with a NOT-IN supplier exclusion (low account balance stands
    in for the absent 'Customer Complaints' comment filter); the
    lineitem bridge stands in for partsupp.

    Built on the DataFrame API to pin the join strategies explicitly:
    the excluded-supplier set is a BROADCAST anti join (the null-aware
    NOT IN decorrelation — safe here because s_suppkey is non-null),
    part is a broadcast hash join with its three predicates pushed to
    the part scan, and the COUNT(DISTINCT) runs as the standard
    two-shuffle expand (partial distinct on (group, suppkey), then
    count) — never a driver-side distinct."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45, 49, 50)
    )
    excluded = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 2000
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(excluded), li["l_suppkey"] == excluded["s_suppkey"], "left_anti")
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# -------------------------------------------------------------- Q17 ---

_Q17_SQL = """
SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) / 7.0, 2)
            AS DOUBLE) AS avg_yearly,
       COUNT(*) AS n_small_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand IN ('Brand#2', 'Brand#3')
  AND l.l_quantity < 0.2 * (
    SELECT AVG(l2.l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
"""


@query("q17_small_quantity_revenue", oracle=_Q17_SQL)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity orders — the
    correlated scalar AVG subquery per part, decorrelated by Catalyst
    into an aggregate + equi-join on partkey.

    Plan notes at scale: the per-part AVG is one shuffle on partkey
    over a 2-column scan (quantity integrality makes the float average
    order-independent: integer sums are exact in doubles, so both
    engines derive the identical threshold); the brand filter prunes
    part before broadcast; the outer join reuses the partkey exchange
    under AQE.  Single-row output: the final aggregate is trivial."""
    register_views(spark, sf_dir)
    return spark.sql(_Q17_SQL)


# -------------------------------------------------------------- Q20 ---

_Q20_SQL = """
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE s_suppkey IN (
  SELECT l_suppkey
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey
  HAVING SUM(l_quantity) > 50
)
ORDER BY s_name
"""


@query("q20_promotion_suppliers", oracle=_Q20_SQL)
def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who moved significant volume of a
    part-name family in one year — the nested IN(GROUP BY ... HAVING)
    semi-join chain (the partsupp/availqty inner layer folds into the
    lineitem aggregate, which is the bridge this corpus has).

    Plan notes at scale: the inner aggregate runs over a scan pruned by
    BOTH pushed predicates (shipdate year) and the broadcast part-family
    join; its HAVING output is a tiny suppkey set that semi-joins
    (broadcast) against supplier — the outer side never shuffles."""
    register_views(spark, sf_dir)
    return spark.sql(_Q20_SQL)


# -------------------------------------------------------------- Q21 ---

_Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey
WHERE o.o_orderstatus = 'F'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate >= l1.l_shipdate
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


@query("q21_waiting_supplier", oracle=_Q21_SQL)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: per supplier, how many finished multi-supplier
    orders it was the STRICTLY LAST shipper on — EXISTS plus NOT EXISTS
    against the same fact table (the receipt/commit-date lateness test
    becomes a ship-date test, preserving the double self-join).

    Plan notes at scale: both correlated subqueries decorrelate to a
    semi and an anti join on orderkey — three scans of lineitem but ONE
    shuffle key, so AQE lines all three up on the same exchange
    layout; supplier broadcasts, and the 'F' status predicate pushes
    into the orders scan.  Ship timestamps are exact values, so the
    strict >=/<> boundary is engine-independent."""
    register_views(spark, sf_dir)
    return spark.sql(_Q21_SQL)


# -------------------------------------------------------------- Q22 ---

_Q22_SQL = """
WITH active AS (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS bal_total,
         COUNT(*) AS bal_cnt
  FROM customer WHERE c_acctbal > 0.0
),
potential AS (
  SELECT substr(c_name, length(c_name) - 1, 2) AS cntrycode,
         c_custkey, c_acctbal
  FROM customer
  WHERE substr(c_name, length(c_name) - 1, 2)
        IN ('01', '12', '23', '34', '45', '56', '67', '78', '89', '90')
)
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS totacctbal
FROM potential p
WHERE CAST(c_acctbal AS DECIMAL(12,2)) * (SELECT bal_cnt FROM active)
      > (SELECT bal_total FROM active)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = p.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY cntrycode
ORDER BY cntrycode
"""


@query("q22_global_sales_opportunity", oracle=_Q22_SQL)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded but RECENTLY INACTIVE customers by
    country code — scalar-average subquery + anti join.  Country code
    is the customer-name suffix (no phone column); "never ordered"
    becomes "no order since 2000" (every customer in this corpus has
    SOME order, which would make the original anti join vacuous).

    The above-average test is in exact arithmetic:
    ``bal * count > total`` avoids the float-division boundary a
    literal AVG comparison would reintroduce (same trick as Q11).

    Plan notes at scale: the balance total is one tiny global
    aggregate broadcast back as a scalar; the anti join on custkey is
    the only customer-side shuffle, against a date-pruned orders scan;
    the substring country code stays in whole-stage codegen."""
    register_views(spark, sf_dir)
    return spark.sql(_Q22_SQL)


def _trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The directed flow-matrix build (one fact pass, four broadcast dim
    joins) BEFORE the lineage cut — exposed so tests/test_plans.py can
    assert the broadcast shape of the build itself, which the
    checkpointed query plan no longer shows."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    ns = nation.select(
        F.col("n_nationkey").alias("ns_key"), F.col("n_name").alias("supp_nation")
    )
    nc = nation.select(
        F.col("n_nationkey").alias("nc_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            li["l_suppkey"] == F.col("s_suppkey"),
        )
        .join(F.broadcast(ns), F.col("s_nationkey") == F.col("ns_key"))
        .join(F.broadcast(nc), F.col("c_nationkey") == F.col("nc_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            F.sum(
                F.round(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
                ).cast("long")
            ).alias("cents")
        )
    )


@query(
    "nation_trade_balance",
    oracle="""
WITH flows AS (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 100, 0)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE ns.n_name <> nc.n_name
  GROUP BY 1, 2
)
SELECT a.supp_nation AS nation_a, a.cust_nation AS nation_b,
       a.cents AS flow_ab_cents,
       COALESCE(b.cents, 0) AS flow_ba_cents,
       a.cents - COALESCE(b.cents, 0) AS net_cents
FROM flows a
LEFT JOIN flows b
  ON a.supp_nation = b.cust_nation AND a.cust_nation = b.supp_nation
WHERE a.supp_nation < a.cust_nation
ORDER BY nation_a, nation_b
""",
)
def q_nation_trade_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilateral trade-balance matrix: for every nation pair, revenue
    flowing A→B (A's suppliers selling to B's customers), the reverse
    flow, and the net balance — the full-matrix generalization of
    TPC-H Q7's two-nation volume (reference scope: Q7 shapes at
    `plans/tpch_queries.py`; this is the report a trade economist
    actually wants).

    Exact integer cents end to end (no float in any flow or the
    net).  Scale shape: ONE pass over the fact table computes every
    directed flow (four broadcast dim joins — supplier/customer/
    nation are all dimension-sized), then the A→B vs B→A pairing is a
    self-join on the |nations|²-bounded flow matrix, never on fact
    rows.  The canonical a < b orientation halves the output without
    losing the sign."""
    # flows (≤ |nations|² rows) feeds both sides of the pairing
    # self-join — without the cut the whole fact-table pass runs
    # twice (the before-plan carried 24 parquet scans).  The build
    # frame is a named helper so tests can pin its broadcast shape
    # PRE-checkpoint (VERDICT r11 item 6: the dim joins execute inside
    # the checkpoint job, invisible to the returned plan).
    flows = _trade_flows(spark, sf_dir).localCheckpoint(eager=True)
    a = flows.alias("a")
    b = flows.alias("b")
    return (
        a.join(
            b,
            (F.col("a.supp_nation") == F.col("b.cust_nation"))
            & (F.col("a.cust_nation") == F.col("b.supp_nation")),
            "left",
        )
        .filter(F.col("a.supp_nation") < F.col("a.cust_nation"))
        .select(
            F.col("a.supp_nation").alias("nation_a"),
            F.col("a.cust_nation").alias("nation_b"),
            F.col("a.cents").alias("flow_ab_cents"),
            F.coalesce(F.col("b.cents"), F.lit(0)).alias("flow_ba_cents"),
            (F.col("a.cents") - F.coalesce(F.col("b.cents"), F.lit(0))).alias(
                "net_cents"
            ),
        )
        .orderBy("nation_a", "nation_b")
    )


@query(
    "fulfillment_latency",
    oracle="""
WITH lat AS (
  SELECT o_orderpriority,
         date_diff('day', CAST(o_orderdate AS DATE),
                   CAST(l_shipdate AS DATE)) AS d
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_shipdate IS NOT NULL AND o_orderdate IS NOT NULL
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lines,
       CAST(round(quantile_cont(d, 0.5), 6) AS DOUBLE) AS p50_days,
       CAST(round(quantile_cont(d, 0.9), 6) AS DOUBLE) AS p90_days,
       CAST(max(d) AS BIGINT) AS max_days
FROM lat GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def q_fulfillment_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship fulfillment latency by order priority — the SLA
    readout (does URGENT actually ship faster?).  Latency is an exact
    integer day difference per line item; percentiles are
    continuous-interpolated on identical integer samples (percentile
    ≡ quantile_cont, the `agg_percentiles`/`funnel_time_to_convert`
    precedent).  One fact-fact equi-join (orderkey, the natural
    co-partition key) and one |priorities|-row rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lat = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(
            F.col("l_shipdate").isNotNull() & F.col("o_orderdate").isNotNull()
        )
        .select(
            "o_orderpriority",
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.col("o_orderdate").cast("date"),
            ).alias("d"),
        )
    )
    return (
        lat.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.expr("percentile(d, 0.5D)"), 6)
            .cast("double")
            .alias("p50_days"),
            F.round(F.expr("percentile(d, 0.9D)"), 6)
            .cast("double")
            .alias("p90_days"),
            F.max("d").cast("long").alias("max_days"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "region_nation_share",
    oracle="""
WITH rev AS (
  SELECT r.r_name AS region, n.n_name AS nation,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n ON c_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  GROUP BY 1, 2
),
tot AS (SELECT SUM(CAST(cents AS HUGEINT)) AS t FROM rev)
SELECT region, nation, cents AS revenue_cents,
       CAST((CAST(cents AS HUGEINT) * 1000000)
            // SUM(CAST(cents AS HUGEINT)) OVER (PARTITION BY region)
            AS BIGINT) AS share_of_region_ppm,
       CAST((SUM(CAST(cents AS HUGEINT)) OVER (PARTITION BY region) * 1000000)
            // (SELECT t FROM tot) AS BIGINT) AS region_share_ppm
FROM rev
ORDER BY region, nation
""",
)
def q_region_nation_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical revenue shares: each nation's share of its region
    and each region's share of the world — the two-level drill-down
    every BI rollup renders, with shares as EXACT integer
    parts-per-million ((x·10⁶) div parent, no float division
    anywhere; `agg_rollup` gives the totals, this gives the
    normalized tree).

    One fact pass with customer/nation/region broadcast-joined, then
    the share windows run on the |nations|-row rollup — dimension-
    bounded, never the corpus."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    rev = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
                "cents"
            )
        )
        # rev (|nations| rows) feeds the world total and the windowed
        # output — the cut bounds the fact pass to one run.
        .localCheckpoint(eager=True)
    )
    wr = Window.partitionBy("region")
    tot = rev.agg(F.sum(F.col("cents").cast("decimal(38,0)")).alias("t"))
    return (
        rev.withColumn(
            "region_cents", F.sum(F.col("cents").cast("decimal(38,0)")).over(wr)
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "region",
            "nation",
            F.col("cents").alias("revenue_cents"),
            F.expr(
                "CAST((CAST(cents AS DECIMAL(38,0)) * 1000000) div region_cents"
                " AS BIGINT)"
            ).alias("share_of_region_ppm"),
            F.expr(
                "CAST((region_cents * 1000000) div t AS BIGINT)"
            ).alias("region_share_ppm"),
        )
        .orderBy("region", "nation")
    )
