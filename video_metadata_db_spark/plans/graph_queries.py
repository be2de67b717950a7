"""Graph / co-occurrence mining queries — PageRank centrality and
frequent-pair (market-basket) mining, both value-oracled.

Neither exists in the reference (its graph-free domain is a flat video
inventory); both are staples of the large-scale curation toolbox this
engine extends into: PageRank ranks domains/entities in a link or
co-occurrence graph (a standard quality prior for web-scale corpora),
frequent pairs surface co-occurrence structure (the A-Priori pruning
shape).  SURVEY.md §6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.graph import pagerank, pagerank_oracle_sql
from ..sources.tables import load_table
from .registry import query

#: Undirected co-purchase bipartite graph: customer —(bought from)—
#: supplier, one edge per DISTINCT (customer, supplier) trade pair.
#: Nodes share one integer domain via parity encoding (2c / 2s+1) so
#: the operator stays single-column — the encode is order-preserving
#: within each class, making tiebreaks deterministic cross-engine.
_EDGES_CTE = """
trade AS (
  SELECT DISTINCT o_custkey * 2 AS cnode, l_suppkey * 2 + 1 AS snode
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
edges AS (
  SELECT cnode AS src, snode AS dst FROM trade
  UNION ALL
  SELECT snode AS src, cnode AS dst FROM trade
)"""


@query(
    "pagerank_copurchase",
    oracle=f"""
WITH {pagerank_oracle_sql(_EDGES_CTE, iterations=3, damping=0.85)}
SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS node_kind,
       node // 2 AS node_id,
       CAST(round(rank, 6) AS DOUBLE) AS rank
FROM pr
ORDER BY pr.rank DESC, node
LIMIT 20
""",
)
def q_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 PageRank over the undirected customer↔supplier
    co-purchase graph, 3 damped rounds (d=0.85).

    Scale shape (``operators/graph.py``): the edge and degree frames
    are loop-invariant and persisted; each round is one co-locatable
    scatter join + one decimal-exact gather aggregate + a node-set
    left join, with lineage cut per round.  The only driver-side value
    is the node COUNT.  Ranks are quantized to 12 dp per round, so the
    unrolled DuckDB recurrence matches bit-for-bit and the iterative
    operator gets a full value oracle (same discipline as k-means).
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    trade = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("cnode"),
            (F.col("l_suppkey") * 2 + 1).alias("snode"),
        )
        .distinct()
    )
    edges = trade.select(
        F.col("cnode").alias("src"), F.col("snode").alias("dst")
    ).unionByName(
        trade.select(F.col("snode").alias("src"), F.col("cnode").alias("dst"))
    )
    pr = pagerank(edges, iterations=3, damping=0.85)
    return (
        pr.orderBy(F.col("rank").desc(), F.col("node"))
        .limit(20)
        .select(
            F.when(F.col("node") % 2 == 0, F.lit("customer"))
            .otherwise(F.lit("supplier"))
            .alias("node_kind"),
            F.floor(F.col("node") / 2).cast("bigint").alias("node_id"),
            F.round("rank", 6).cast("double").alias("rank"),
        )
    )


#: Minimum basket-pair support (absolute order count).  At corpus scale
#: the A-Priori prune drops infrequent ITEMS before the quadratic
#: within-basket expansion — with 25 uniform brands every item survives
#: here, but the prune is structurally in the plan (and is THE reason
#: the expansion is bounded when the item domain is heavy-tailed).
_PAIR_MIN_SUPPORT = 5


@query(
    "frequent_brand_pairs",
    oracle=f"""
WITH baskets AS (
  SELECT DISTINCT l_orderkey AS order_id, p_brand AS item
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
item_counts AS (
  SELECT item, count(*) AS n_item FROM baskets GROUP BY item
),
freq_items AS (
  SELECT item, n_item FROM item_counts WHERE n_item >= {_PAIR_MIN_SUPPORT}
),
fb AS (
  SELECT b.order_id, b.item, f.n_item
  FROM baskets b JOIN freq_items f USING (item)
),
pairs AS (
  SELECT a.item AS brand_a, b.item AS brand_b,
         count(*) AS n_orders,
         any_value(a.n_item) AS n_a, any_value(b.n_item) AS n_b
  FROM fb a JOIN fb b ON a.order_id = b.order_id AND a.item < b.item
  GROUP BY 1, 2
),
total AS (SELECT count(DISTINCT order_id) AS n_baskets FROM baskets)
SELECT brand_a, brand_b, n_orders,
       CAST(round(n_orders / (1.0 * n_baskets), 6) AS DOUBLE) AS support,
       CAST(round((n_orders * 1.0 * n_baskets) / (n_a * 1.0 * n_b), 6)
            AS DOUBLE) AS lift
FROM pairs CROSS JOIN total
WHERE n_orders >= {_PAIR_MIN_SUPPORT}
ORDER BY n_orders DESC, brand_a, brand_b
LIMIT 30
""",
)
def q_frequent_brand_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A-Priori frequent-pair mining over order baskets of part brands:
    support-pruned items → within-basket pair expansion → pair support
    + lift, top 30.

    Scale shape: the quadratic step is PER BASKET (bounded by basket
    size, never corpus size), and the item-level support prune runs
    BEFORE it — the A-Priori downward-closure guarantee means no
    frequent pair is lost.  ``freq_items`` is vocabulary-sized and
    broadcast; the only corpus shuffles are the basket build and the
    pair count.  Lift's two float divisions happen once per output row
    from exact integers, then round — deterministic cross-engine.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    baskets = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .select(F.col("l_orderkey").alias("order_id"), F.col("p_brand").alias("item"))
        .distinct()
    )
    item_counts = baskets.groupBy("item").agg(F.count(F.lit(1)).alias("n_item"))
    freq_items = item_counts.filter(F.col("n_item") >= _PAIR_MIN_SUPPORT)
    fb = baskets.join(F.broadcast(freq_items), "item").select(
        "order_id", "item", "n_item"
    )
    a = fb.alias("a")
    b = fb.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.order_id") == F.col("b.order_id"))
            & (F.col("a.item") < F.col("b.item")),
        )
        .groupBy(
            F.col("a.item").alias("brand_a"), F.col("b.item").alias("brand_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.any_value(F.col("a.n_item")).alias("n_a"),
            F.any_value(F.col("b.n_item")).alias("n_b"),
        )
        .filter(F.col("n_orders") >= _PAIR_MIN_SUPPORT)
    )
    total = baskets.agg(F.count_distinct(F.col("order_id")).alias("n_baskets"))
    return (
        pairs.crossJoin(F.broadcast(total))
        .select(
            "brand_a",
            "brand_b",
            "n_orders",
            F.round(F.col("n_orders") / (F.lit(1.0) * F.col("n_baskets")), 6)
            .cast("double")
            .alias("support"),
            F.round(
                (F.col("n_orders") * F.lit(1.0) * F.col("n_baskets"))
                / (F.col("n_a") * F.lit(1.0) * F.col("n_b")),
                6,
            )
            .cast("double")
            .alias("lift"),
        )
        .orderBy(F.col("n_orders").desc(), "brand_a", "brand_b")
        .limit(30)
    )
