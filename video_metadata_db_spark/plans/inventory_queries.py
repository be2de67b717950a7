"""Operator-inventory queries (SURVEY.md §2 / §7 Phase 2) — all Catalyst
built-ins, each oracle-paired with DuckDB ANSI SQL.

Float discipline: double sums are order-dependent across partitions, so
every money/quantity aggregate casts to ``DECIMAL(18,2)`` first (exact,
associative), aggregates, then casts back to double — both sides do the
identical thing, so values hash-match bit-for-bit. Averages are computed
as ``exact_sum / count`` in double on both sides (never engine-native
``avg`` over doubles).

Determinism discipline: every ``ORDER BY``/window ordering carries a
unique tiebreak key so row order (and rank/lag results) are stable.

Scale notes are per-query docstrings: what shuffles, what broadcasts,
what survives 100×.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import query


def _dec(c: str | Column) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return col.cast("decimal(18,2)")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------- aggs --

@query(
    "q1_pricing_summary",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan → filter (pushed to parquet) → hash agg.

    Scale: partial (map-side) aggregation reduces each task to ≤6 groups
    before the shuffle — the shuffle moves O(groups × partitions), not
    O(rows), at any scale.
    """
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-02")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * (F.lit(1) - F.col("l_discount")).cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_disc_price"),
            (F.sum(_dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "agg_distinct",
    oracle="""
SELECT l_returnflag,
       count(DISTINCT l_suppkey) AS n_suppliers,
       count(DISTINCT l_partkey) AS n_parts,
       count(*) AS n_rows
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregation: Catalyst expands to a two-phase plan
    (dedup shuffle on (group, key) then count) — scales linearly."""
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.countDistinct("l_partkey").alias("n_parts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "agg_rollup",
    oracle="""
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
""",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping-set lattice — Catalyst Expand + single shuffle."""
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@query(
    "agg_cube",
    oracle="""
SELECT o_orderstatus, o_orderpriority,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
""",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over orders: 4 grouping sets in one Expand+shuffle."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.sum(_dec("o_totalprice")).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


@query(
    "agg_stats_exact",
    oracle="""
SELECT c_mktsegment,
       count(*) AS n,
       CAST(min(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS min_bal,
       CAST(max(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS max_bal,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal,
       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2)) * CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_sq
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
""",
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min/max/avg + exact sum-of-squares (the stddev building block,
    kept exact so it hash-matches; stddev itself = derivable)."""
    d = _dec("c_acctbal")
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(d).cast("double").alias("min_bal"),
            F.max(d).cast("double").alias("max_bal"),
            (F.sum(d).cast("double") / F.count(F.lit(1))).alias("avg_bal"),
            F.sum(d * d).cast("double").alias("sum_sq"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "pivot_status",
    oracle="""
SELECT l_returnflag,
       CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_O,
       CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_F
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot = conditional aggregation; fixed value list keeps the plan
    a single pass (no value-discovery job)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.sum(F.when(F.col("l_linestatus") == "O", _dec("l_quantity"))).cast("double").alias("qty_O"),
            F.sum(F.when(F.col("l_linestatus") == "F", _dec("l_quantity"))).cast("double").alias("qty_F"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------- joins --

@query(
    "join_star_revenue",
    oracle="""
SELECT n.n_name AS nation, r.r_name AS region,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       count(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY n.n_name, r.r_name
ORDER BY revenue DESC, nation
""",
)
def q_join_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-schema join: fact (orders) ⋈ three dims, all broadcast.

    Scale: customer/nation/region are ≪ fact; broadcasting them means
    the fact table is scanned once with zero shuffles until the final
    6-group aggregation. At 100 TB the only shuffle is the tiny agg.
    """
    o = _t(spark, sf_dir, "orders")
    c = F.broadcast(_t(spark, sf_dir, "customer"))
    n = F.broadcast(_t(spark, sf_dir, "nation"))
    r = F.broadcast(_t(spark, sf_dir, "region"))
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy(n.n_name.alias("nation"), r.r_name.alias("region"))
        .agg(F.sum(_dec("o_totalprice")).cast("double").alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("revenue").desc(), F.col("nation"))
    )


@query(
    "join_semi",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400)
ORDER BY c_custkey
""",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): no row multiplication, output ≤ left."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_anti",
    oracle="""
SELECT c_custkey, c_name
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
ORDER BY c_custkey
""",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS) — the update-mode primitive, generic."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_outer_counts",
    oracle="""
SELECT c.c_custkey,
       count(o.o_orderkey) AS n_orders,
       CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS spend
FROM customer c
LEFT JOIN orders o ON o.o_custkey = c.c_custkey
GROUP BY c.c_custkey
ORDER BY c.c_custkey
""",
)
def q_join_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join preserving customers with zero orders."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return (
        c.join(o, o.o_custkey == c.c_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(_dec("o_totalprice")), F.lit(0)).cast("double").alias("spend"),
        )
        .orderBy("c_custkey")
    )


@query(
    "join_range_theta",
    oracle="""
SELECT a.n_nationkey AS key_lo, b.n_nationkey AS key_hi,
       a.n_name AS name_lo, b.n_name AS name_hi
FROM nation a JOIN nation b
  ON a.n_nationkey < b.n_nationkey AND b.n_nationkey - a.n_nationkey <= 3
ORDER BY key_lo, key_hi
""",
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta/range self-join (non-equi). Spark executes broadcast
    nested-loop — fine for dims; for large facts the scale path is
    bucketize-the-range-key + equi-join (see similarity module)."""
    a = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("key_lo"), F.col("n_name").alias("name_lo")
    )
    b = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("key_hi"), F.col("n_name").alias("name_hi")
    )
    return (
        a.join(b, (F.col("key_lo") < F.col("key_hi")) & (F.col("key_hi") - F.col("key_lo") <= 3))
        .select("key_lo", "key_hi", "name_lo", "name_hi")
        .orderBy("key_lo", "key_hi")
    )


# ------------------------------------------------------------- windows --

@query(
    "window_topk_per_group",
    oracle="""
SELECT * FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
ORDER BY o_custkey, rn
""",
)
def q_window_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the canonical top-k-per-group window.

    Scale: one shuffle on o_custkey; Spark inserts a WindowGroupLimit
    (rank pushdown) so each partition keeps only 3 rows pre-sort."""
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        _t(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .orderBy("o_custkey", "rn")
    )


@query(
    "window_running_sum",
    oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2)))
            OVER (PARTITION BY l_suppkey
                  ORDER BY l_shipdate, l_orderkey, l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_qty
FROM lineitem
WHERE l_suppkey <= 5
ORDER BY l_suppkey, l_orderkey, l_linenumber
""",
)
def q_window_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with an explicit rows frame; decimal accumulator so
    the prefix sums are order-exact."""
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_suppkey") <= 5)
        .select(
            "l_suppkey",
            "l_orderkey",
            "l_linenumber",
            F.sum(_dec("l_quantity")).over(w).cast("double").alias("running_qty"),
        )
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber")
    )


@query(
    "window_lag_lead",
    oracle="""
SELECT user_id, event_id,
       lag(event_type) OVER w AS prev_type,
       lead(event_type) OVER w AS next_type,
       CAST(CAST(value - lag(value) OVER w AS DECIMAL(18,2)) AS DOUBLE) AS delta_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, event_id
""",
)
def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead navigation per user ordered by event time."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
            (F.col("value") - F.lag("value").over(w)).cast("decimal(18,2)").cast("double").alias("delta_value"),
        )
        .orderBy("user_id", "event_id")
    )


@query(
    "window_sliding_frame",
    oracle="""
SELECT user_id, event_id,
       CAST(sum(CAST(value AS DECIMAL(18,2)))
            OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3
FROM events
ORDER BY user_id, event_id
""",
)
def q_window_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded sliding frame (3-row moving sum)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return (
        _t(spark, sf_dir, "events")
        .select(
            "user_id",
            "event_id",
            F.sum(_dec("value")).over(w).cast("double").alias("moving_sum3"),
        )
        .orderBy("user_id", "event_id")
    )


# ------------------------------------------------------- sort / limit --

@query(
    "topk_global",
    oracle="""
SELECT o_orderkey, o_totalprice, o_orderdate
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k → Catalyst TakeOrderedAndProject: each task keeps a
    k-heap, driver merges k×tasks rows — no full sort at any scale."""
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(10)
    )


# ------------------------------------------------------------ set ops --

@query(
    "set_intersect",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300
ORDER BY custkey
""",
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_totalprice") > 300).select(F.col("o_custkey").alias("custkey"))
    return a.intersect(b).orderBy("custkey")


@query(
    "set_except",
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'F'
ORDER BY custkey
""",
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("custkey"))
    b = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("custkey"))
    return a.subtract(b).orderBy("custkey")  # EXCEPT (set semantics)


# ------------------------------------------- scalar / string / date ----

@query(
    "proj_string_math",
    oracle="""
SELECT p_partkey,
       upper(p_name) AS name_upper,
       substr(p_name, 1, 4) AS name_prefix,
       length(p_name) AS name_len,
       concat(p_brand, ':', p_type) AS brand_type,
       abs(p_size - 25) AS size_dev,
       p_partkey % 7 AS key_mod,
       CAST(round(CAST(p_retailprice * 1.1 AS DECIMAL(18,4)), 2) AS DOUBLE) AS price_up
FROM part
ORDER BY p_partkey
""",
)
def q_proj_string_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar projection battery: string, math, modulo, rounding."""
    return (
        _t(spark, sf_dir, "part")
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.substring("p_name", 1, 4).alias("name_prefix"),
            F.length("p_name").alias("name_len"),
            F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
            F.abs(F.col("p_size") - 25).alias("size_dev"),
            (F.col("p_partkey") % 7).alias("key_mod"),
            F.round((F.col("p_retailprice") * 1.1).cast("decimal(18,4)"), 2)
            .cast("double")
            .alias("price_up"),
        )
        .orderBy("p_partkey")
    )


@query(
    "proj_datetime",
    oracle="""
SELECT o_orderkey,
       CAST(extract(year FROM o_orderdate) AS INT) AS yr,
       CAST(extract(month FROM o_orderdate) AS INT) AS mo,
       CAST(extract(day FROM o_orderdate) AS INT) AS dy,
       CAST(o_orderdate AS DATE) AS odate,
       date_diff('day', CAST(o_orderdate AS DATE), DATE '1996-01-01') AS days_to_1996,
       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
FROM orders
ORDER BY o_orderkey
""",
)
def q_proj_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery over the order timestamps."""
    return (
        _t(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            F.year("o_orderdate").alias("yr"),
            F.month("o_orderdate").alias("mo"),
            F.dayofmonth("o_orderdate").alias("dy"),
            F.to_date("o_orderdate").alias("odate"),
            F.datediff(F.lit("1996-01-01").cast("date"), F.to_date("o_orderdate")).alias(
                "days_to_1996"
            ),
            F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "case_when_buckets",
    oracle="""
SELECT CASE WHEN o_totalprice < 100 THEN 'small'
            WHEN o_totalprice < 300 THEN 'medium'
            ELSE 'large' END AS bucket,
       count(*) AS n,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
FROM orders
GROUP BY 1
ORDER BY bucket
""",
)
def q_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    bucket = (
        F.when(F.col("o_totalprice") < 100, "small")
        .when(F.col("o_totalprice") < 300, "medium")
        .otherwise("large")
        .alias("bucket")
    )
    return (
        _t(spark, sf_dir, "orders")
        .groupBy(bucket)
        .agg(F.count(F.lit(1)).alias("n"), F.sum(_dec("o_totalprice")).cast("double").alias("total"))
        .orderBy("bucket")
    )


# ------------------------------------------------------- JSON / array --

@query(
    "json_extract_props",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_val
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INT) > 50
ORDER BY event_id
""",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-string access (events.props) with a post-extract filter."""
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        _t(spark, sf_dir, "events")
        .select("event_id", k.alias("k_val"))
        .filter(F.col("k_val") > 50)
        .orderBy("event_id")
    )


@query(
    "explode_tokens",
    oracle="""
SELECT token, count(*) AS n
FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
WHERE token <> ''
GROUP BY token
ORDER BY n DESC, token
LIMIT 20
""",
)
def q_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode(split(...)) — the UDTF-shaped lateral view, word-count form.

    Scale: explode multiplies rows ~16×; the following agg partial-
    combines per task so the shuffle carries only distinct tokens."""
    return (
        _t(spark, sf_dir, "documents")
        .select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )


@query(
    "array_functions",
    oracle="""
SELECT vec_id,
       len(embedding) AS dim,
       CAST(round(CAST(embedding[1] AS DOUBLE), 4) AS DOUBLE) AS first_elem,
       CAST(round(CAST(list_aggregate(CAST(embedding AS DOUBLE[]), 'sum') AS DOUBLE), 4) AS DOUBLE) AS vec_sum
FROM embeddings
WHERE vec_id < 100
ORDER BY vec_id
""",
)
def q_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array surface: size, indexing, elementwise aggregate (the
    dot-product building block for similarity search)."""
    emb_d = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 100)
        .select(
            "vec_id",
            F.size("embedding").alias("dim"),
            F.round(F.col("embedding").getItem(0).cast("double"), 4).alias("first_elem"),
            F.round(
                F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x), 4
            ).alias("vec_sum"),
        )
        .orderBy("vec_id")
    )


# --------------------------------------------------- approx (rows-only) --

@query("approx_distinct_users", oracle=None)
def q_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct — approximate by design, so no value
    oracle (driver records rows-only per contract)."""
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.expr("approx_percentile(value, 0.5)").alias("p50_value"),
        )
        .orderBy("event_type")
    )


# ------------------------------------------------- unpivot / sampling ---

@query(
    "unpivot_stats",
    oracle="""
SELECT event_type, metric, round(val, 6) AS val
FROM (
  SELECT event_type,
         round(avg(value), 6) AS avg_value,
         round(min(value), 6) AS min_value,
         round(max(value), 6) AS max_value
  FROM events GROUP BY event_type
) UNPIVOT (val FOR metric IN (avg_value, min_value, max_value))
ORDER BY event_type, metric
""",
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide → long (unpivot/melt) — the inverse of pivot_status."""
    wide = (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
    )
    return (
        wide.unpivot(
            ids=["event_type"],
            values=["avg_value", "min_value", "max_value"],
            variableColumnName="metric",
            valueColumnName="val",
        )
        .withColumn("val", F.round("val", 6))
        .orderBy("event_type", "metric")
    )


@query(
    "sample_deterministic",
    oracle=f"""
SELECT count(*) AS n_rows,
       count(DISTINCT o_custkey) AS n_custs,
       CAST(round(sum(o_totalprice), 2) AS DOUBLE) AS total_price
FROM orders
WHERE CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)
      % {(1 << 31) - 1} % 100 < 5
""",
)
def q_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~5% systematic sample via the engine's 31-bit md5 hash on the
    key — deterministic and engine-independent, unlike TABLESAMPLE
    (whose PRNG never matches across engines).  At scale this is the
    repeatable-sample idiom: same rows on every run, every engine,
    resumable pipelines included."""
    from ..operators.dedup import hash31

    orders = _t(spark, sf_dir, "orders")
    return orders.filter(
        hash31(F.col("o_orderkey").cast("string")) % 100 < 5
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_custs"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("total_price"),
    )


@query(
    "map_functions",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INT) AS k_val,
       2 AS n_entries,
       'k,type_len' AS keys_sorted,
       CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) > 50
            THEN CAST(json_extract_string(props, '$.k') AS INT) ELSE 0 END
         + CASE WHEN length(event_type) > 50 THEN length(event_type) ELSE 0 END
         AS big_vals_sum
FROM events
ORDER BY event_id
""",
)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface (SURVEY §2.8): ``from_json`` to ``map<string,int>``,
    ``map_concat`` with a constructed ``create_map``, ``map_keys`` /
    ``map_values`` / ``map_filter`` / ``element_at``, and a fold over the
    filtered values.

    All map ops are per-row expressions inside whole-stage codegen — no
    shuffle except the final presentation sort, so the operator family
    costs scan-bandwidth only at any scale.
    """
    ev = _t(spark, sf_dir, "events")
    # materialize the parsed map under a name referenced 4×: otherwise
    # CollapseProject inlines the from_json into every consumer and the
    # JSON parse runs 4× per row (same trap as contamination_check)
    withm = ev.select(
        "event_id",
        F.map_concat(
            F.from_json("props", "map<string,int>"),
            F.create_map(F.lit("type_len"), F.length("event_type")),
        ).alias("m"),
    )
    big = F.map_filter(F.col("m"), lambda _, v: v > 50)
    return (
        withm.select(
            "event_id",
            F.element_at(F.col("m"), "k").alias("k_val"),
            F.size(F.col("m")).alias("n_entries"),
            F.concat_ws(",", F.array_sort(F.map_keys(F.col("m")))).alias("keys_sorted"),
            F.aggregate(F.map_values(big), F.lit(0), lambda acc, v: acc + v).alias(
                "big_vals_sum"
            ),
        )
        .orderBy("event_id")
    )


@query(
    "agg_corr_stats",
    oracle="""
SELECT l_returnflag,
       count(*) AS n,
       CAST(round(corr(l_quantity, l_extendedprice), 4) AS DOUBLE) AS corr_qty_price,
       CAST(round(covar_samp(l_quantity, l_extendedprice), 2) AS DOUBLE) AS covar_qty_price,
       CAST(round(stddev_samp(l_quantity), 4) AS DOUBLE) AS stddev_qty,
       CAST(round(var_samp(l_quantity), 4) AS DOUBLE) AS var_qty
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
""",
)
def q_agg_corr_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family (SURVEY §2.5): corr / covar_samp /
    stddev_samp / var_samp per group, rounded to stable precision
    (both engines use single-pass co-moment updates; agreement holds to
    well past 4 decimals at these magnitudes).

    One hash-partition shuffle on the 3-value group key with map-side
    partial co-moments — the same shape as any partial-able aggregate.
    """
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.corr("l_quantity", "l_extendedprice"), 4)
            .cast("double")
            .alias("corr_qty_price"),
            F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2)
            .cast("double")
            .alias("covar_qty_price"),
            F.round(F.stddev_samp("l_quantity"), 4).cast("double").alias("stddev_qty"),
            F.round(F.var_samp("l_quantity"), 4).cast("double").alias("var_qty"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "sample_stratified",
    oracle=f"""
WITH keyed AS (
  SELECT event_type, o.*,
         CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT)
           % {(1 << 31) - 1} % 100 AS bucket
  FROM events o
)
SELECT event_type,
       count(*) AS n_sampled,
       CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS value_sum
FROM keyed
WHERE bucket < CASE event_type WHEN 'error' THEN 50 WHEN 'click' THEN 10 ELSE 2 END
GROUP BY event_type
ORDER BY event_type
""",
)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-stratum rates (``sampleBy``
    semantics) made deterministic: md5-hash bucket per row, per-group
    rate cutoffs — repeatable across runs AND engines, unlike
    ``DataFrame.sampleBy`` whose PRNG never matches an oracle.  The
    training-data idiom: over-sample rare strata (errors at 50%),
    down-sample dominant ones (views at 2%).  Pure map-side filter —
    no shuffle beyond the final group-count."""
    from ..operators.dedup import hash31

    ev = _t(spark, sf_dir, "events")
    rate = (
        F.when(F.col("event_type") == "error", 50)
        .when(F.col("event_type") == "click", 10)
        .otherwise(2)
    )
    return (
        ev.withColumn("bucket", hash31(F.col("event_id").cast("string")) % 100)
        .filter(F.col("bucket") < rate)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.round(F.sum(_dec("value")), 2).cast("double").alias("value_sum"),
        )
        .orderBy("event_type")
    )


@query(
    "split_train_val_test",
    oracle=f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         CAST(concat('0x', substr(md5(concat('split:', CAST(doc_id AS VARCHAR))), 1, 8)) AS BIGINT)
           % {(1 << 31) - 1} % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
       lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM keyed
GROUP BY split, lang
ORDER BY split, lang
""",
)
def q_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment — THE
    load-bearing op of a training-data pipeline.  Salted-key md5 bucket
    (salt isolates this split from any other sampling decision on the
    same key), assignment is a pure projection: every engine, every
    run, every subset of the corpus agrees on each doc's split, so
    leakage can't creep in when the corpus grows.  Per-split×lang
    composition check = one hash-partition aggregate."""
    from ..operators.dedup import hash31

    docs = _t(spark, sf_dir, "documents")
    bucket = hash31(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )


@query(
    "join_range_binned",
    oracle="""
SELECT a.user_id,
       count(*) AS n_pairs,
       CAST(round(sum(round(extract(epoch FROM b.ts - a.ts), 6)), 2) AS DOUBLE)
         AS total_gap_s
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND (a.ts, a.event_id) < (b.ts, b.event_id)
 AND b.ts <= a.ts + INTERVAL 600 SECONDS
GROUP BY a.user_id
ORDER BY a.user_id
""",
)
def q_join_range_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join at scale: same-user event pairs within 10 minutes via
    the BINNED equi-join (time bucketed to the gap width, left side
    emitted into 2 buckets, exact predicate inside the bucket) —
    O(pairs-per-bucket) with a plain shuffle join, where the naive
    non-equi form is a broadcast nested loop.  The oracle runs the
    naive quadratic form; results must agree exactly."""
    from ..operators.asof import time_proximity_pairs

    ev = _t(spark, sf_dir, "events")
    pairs = time_proximity_pairs(ev, key="user_id", ts="ts", id_col="event_id", max_gap_s=600)
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum("gap_s"), 2).cast("double").alias("total_gap_s"),
        )
        .orderBy("user_id")
    )


@query(
    "window_range_frame",
    oracle="""
SELECT event_id, user_id,
       CAST(round(sum(CAST(value AS DECIMAL(18,2)))
                    OVER (PARTITION BY user_id ORDER BY floor(epoch(ts))
                          RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW),
                  2) AS DOUBLE) AS rolling_1h_value
FROM events
ORDER BY event_id
""",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (value-based, not row-based): per-user rolling
    1-hour sum keyed on event-time seconds — the frame the row-count
    variants (`window_sliding_frame`) cannot express when events arrive
    irregularly.  One shuffle on user_id; frame state is bounded by the
    hour span, not row count."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.round(F.sum(_dec("value")).over(w), 2)
            .cast("double")
            .alias("rolling_1h_value"),
        )
        .orderBy("event_id")
    )
