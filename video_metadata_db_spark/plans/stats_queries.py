"""Exact two-sample rank statistics: Kolmogorov–Smirnov D and
Mann–Whitney U / AUC over the events value distributions.

These are the workhorse distribution-shift tests a training-data
pipeline runs between sources, snapshots, or A/B arms when PSI's
binning is too coarse: KS gives the max ECDF gap, Mann–Whitney gives
the probability a random A-value exceeds a random B-value (the AUC of
the 1-D "classifier").  Both are functions of RANKS only, so both are
computable EXACTLY in integer arithmetic on the cents grid — no float
summation order anywhere until one final rounded division.

Nothing like this exists in the reference (video_metadata_db.py stops
at group/sort reports); the shapes extend SURVEY.md §2.5's aggregate
family with the pooled-rank substrate that
:func:`..operators.analytics.two_sample_rank_counts` provides (scale
notes there: distinct-value collapse first, literal-boundary two-pass
prefix sum, never a corpus-wide single-reducer window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import EN_STOPWORDS as _EN_STOPWORDS
from ..operators.analytics import two_sample_rank_counts
from ..sources.tables import load_table
from .registry import query

_CENTS = "CAST(round(value * 100, 0) AS BIGINT)"


def _tagged_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .withColumn("cents", F.round(F.col("value") * 100, 0).cast("long"))
    )


@query(
    "ks_two_sample",
    oracle=f"""
WITH s AS (
  SELECT {_CENTS} AS cents,
         CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS fa,
         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS fb
  FROM events
  WHERE event_type IN ('click', 'view') AND value IS NOT NULL
),
v AS (SELECT cents, SUM(fa) AS cnt_a, SUM(fb) AS cnt_b FROM s GROUP BY cents),
c AS (
  SELECT cents,
         SUM(cnt_a) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum_a,
         SUM(cnt_b) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum_b
  FROM v
),
t AS (SELECT SUM(cnt_a) AS n_a, SUM(cnt_b) AS n_b FROM v)
SELECT CAST(t.n_a AS BIGINT) AS n_a,
       CAST(t.n_b AS BIGINT) AS n_b,
       CAST(MAX(abs(c.cum_a * t.n_b - c.cum_b * t.n_a)) AS BIGINT) AS d_numer,
       CAST(round(MAX(abs(c.cum_a * t.n_b - c.cum_b * t.n_a))
                  / (1.0 * t.n_a * t.n_b), 6) AS DOUBLE) AS ks_stat
FROM c CROSS JOIN t
GROUP BY t.n_a, t.n_b
""",
)
def q_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Kolmogorov–Smirnov D between the click and view value
    distributions: ``D = max_v |ECDF_click(v) − ECDF_view(v)|``.

    The statistic is kept as an INTEGER numerator until the very end:
    at each distinct cents value the ECDF gap is
    ``|cum_a·n_b − cum_b·n_a|`` (both engines agree bit-for-bit on
    integers), the max of those is ``d_numer``, and
    ``D = d_numer / (n_a·n_b)`` is one rounded division of
    exactly-agreed integers.  Cumulative counts come from the
    distributed two-pass prefix sum in
    :func:`..operators.analytics.two_sample_rank_counts` — the corpus
    collapses to distinct-value rows in one partial-aggregatable
    shuffle before any window runs."""
    counts = two_sample_rank_counts(
        _tagged_events(spark, sf_dir), "cents", "event_type", "click", "view"
    )
    tot = counts.agg(
        F.sum("cnt_a").cast("long").alias("n_a"),
        F.sum("cnt_b").cast("long").alias("n_b"),
    )
    gap = F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
    return (
        counts.crossJoin(F.broadcast(tot))
        .groupBy("n_a", "n_b")
        .agg(F.max(gap).cast("long").alias("d_numer"))
        .select(
            "n_a",
            "n_b",
            "d_numer",
            F.round(
                F.col("d_numer") / (F.lit(1.0) * F.col("n_a") * F.col("n_b")), 6
            )
            .cast("double")
            .alias("ks_stat"),
        )
    )


@query(
    "mann_whitney_auc",
    oracle=f"""
WITH s AS (
  SELECT {_CENTS} AS cents,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS fa,
         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS fb
  FROM events
  WHERE event_type IN ('purchase', 'error') AND value IS NOT NULL
),
v AS (SELECT cents, SUM(fa) AS cnt_a, SUM(fb) AS cnt_b FROM s GROUP BY cents),
c AS (
  SELECT cents, cnt_a, cnt_b,
         SUM(cnt_a + cnt_b) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING)
           - (cnt_a + cnt_b) AS prev_pool
  FROM v
),
a AS (
  SELECT SUM(cnt_a) AS n_a, SUM(cnt_b) AS n_b,
         SUM(cnt_a * (2 * prev_pool + cnt_a + cnt_b + 1)) AS twice_r_a
  FROM c
)
SELECT CAST(n_a AS BIGINT) AS n_a,
       CAST(n_b AS BIGINT) AS n_b,
       CAST(twice_r_a AS BIGINT) AS twice_r_a,
       CAST(twice_r_a - n_a * (n_a + 1) AS BIGINT) AS twice_u_a,
       CAST(2 * n_a * n_b - (twice_r_a - n_a * (n_a + 1)) AS BIGINT) AS twice_u_b,
       CAST(round((twice_r_a - n_a * (n_a + 1)) / (2.0 * n_a * n_b), 6)
            AS DOUBLE) AS auc_a
FROM a
""",
)
def q_mann_whitney_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Mann–Whitney U (with the standard average-rank tie
    handling) between purchase and error values, plus the AUC form
    ``U_a / (n_a·n_b)`` = P(random purchase value > random error value)
    counting ties as ½.

    Everything stays integer by carrying DOUBLED quantities: at a
    distinct value with pooled count ``c`` and ``p`` pooled
    observations strictly below it, every tied observation's average
    1-based rank is ``(2p + c + 1) / 2``, so
    ``2·R_a = Σ cnt_a·(2p + c + 1)`` is an exact integer sum, and
    ``2·U_a = 2·R_a − n_a(n_a+1)``.  The identity
    ``2·U_a + 2·U_b = 2·n_a·n_b`` is asserted by the unit tests.  One
    final rounded division produces the AUC.  Same distributed
    rank substrate (and scale shape) as ``ks_two_sample``."""
    counts = two_sample_rank_counts(
        _tagged_events(spark, sf_dir), "cents", "event_type", "purchase", "error"
    )
    prev_pool = (
        F.col("cum_a") - F.col("cnt_a") + F.col("cum_b") - F.col("cnt_b")
    )
    twice_rank = 2 * prev_pool + F.col("cnt_a") + F.col("cnt_b") + 1
    a = counts.agg(
        F.sum("cnt_a").cast("long").alias("n_a"),
        F.sum("cnt_b").cast("long").alias("n_b"),
        F.sum(F.col("cnt_a") * twice_rank).cast("long").alias("twice_r_a"),
    )
    twice_u_a = F.col("twice_r_a") - F.col("n_a") * (F.col("n_a") + 1)
    return a.select(
        "n_a",
        "n_b",
        "twice_r_a",
        twice_u_a.cast("long").alias("twice_u_a"),
        (2 * F.col("n_a") * F.col("n_b") - twice_u_a).cast("long").alias("twice_u_b"),
        F.round(twice_u_a / (F.lit(2.0) * F.col("n_a") * F.col("n_b")), 6)
        .cast("double")
        .alias("auc_a"),
    )


@query(
    "discount_quantity_corr",
    oracle="""
WITH base AS (
  SELECT p_brand,
         CAST(round(l_discount * 100, 0) AS BIGINT) AS x,
         CAST(round(l_quantity, 0) AS BIGINT) AS y
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
m AS (
  SELECT p_brand,
         CAST(count(*) AS HUGEINT) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
         SUM(CAST(x AS HUGEINT) * y) AS sxy,
         SUM(CAST(x AS HUGEINT) * x) AS sxx,
         SUM(CAST(y AS HUGEINT) * y) AS syy
  FROM base GROUP BY p_brand
)
SELECT p_brand, CAST(n AS BIGINT) AS n_lines,
       CAST(round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                  / NULLIF(sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                           * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy), 0),
                  6) AS DOUBLE) AS corr_discount_qty
FROM m ORDER BY p_brand
""",
)
def q_discount_quantity_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand Pearson correlation between discount depth and
    quantity — the price-elasticity proxy merchandising reads (a
    brand whose correlation sits near 0 is being discounted without
    moving volume).  The GROUPED sibling of `correlation_matrix`:
    same exact-moment discipline, but one correlation per group key
    instead of one dense matrix.

    Discounts are exact integer basis points (×100) and quantities
    exact integers, so all five co-moments are DECIMAL(38,0)/HUGEINT
    sums — order-free at any parallelism; per OUTPUT brand there are
    two sqrts and one NULLIF-guarded division, rounded to 6 dp.  One
    broadcast dim join + one partial-aggregatable (brand) rollup —
    no window, no second pass.

    Overflow-safe at any corpus scale (the `cusum_changepoint`
    discipline): the five co-moment SUMS stay exact DECIMAL(38,0) /
    HUGEINT — order-free under any parallelism — and each sum is cast
    to DOUBLE BEFORE the `n·Σxy − Σx·Σy` products, so the combination
    step can never breach the 38-digit decimal width (Spark's
    non-ANSI decimal arithmetic silently NULLs past it).  Both
    engines combine the same IEEE operands with the same operation
    tree, so the 6-dp round still hash-matches."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    dec = "decimal(38,0)"
    base = li.join(
        F.broadcast(part.select("p_partkey", "p_brand")),
        li["l_partkey"] == F.col("p_partkey"),
    ).select(
        "p_brand",
        F.round(F.col("l_discount") * 100, 0).cast("long").alias("x"),
        F.round(F.col("l_quantity"), 0).cast("long").alias("y"),
    )
    m = base.groupBy("p_brand").agg(
        F.count(F.lit(1)).cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("y")).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y")).alias("syy"),
    )
    return m.select(
        "p_brand",
        F.col("n").cast("long").alias("n_lines"),
        F.expr(
            "CAST(round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)"
            " / NULLIF(sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)"
            "          * sqrt(CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy), 0),"
            " 6) AS DOUBLE)"
        ).alias("corr_discount_qty"),
    ).orderBy("p_brand")


@query(
    "return_rate_wilson",
    oracle="""
WITH b AS (
  SELECT p_brand,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS r
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand
)
SELECT p_brand, n, r,
       CAST((r * 1000000) // n AS BIGINT) AS rate_ppm,
       CAST(round((r + 1.9208) / (n + 3.8416)
                  - (1.96 * sqrt((r * (n - r)) / (1.0 * n) + 0.9604))
                    / (n + 3.8416), 6) AS DOUBLE) AS wilson_low,
       CAST(round((r + 1.9208) / (n + 3.8416)
                  + (1.96 * sqrt((r * (n - r)) / (1.0 * n) + 0.9604))
                    / (n + 3.8416), 6) AS DOUBLE) AS wilson_high
FROM b ORDER BY p_brand
""",
)
def q_return_rate_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand return rate with a Wilson-score 95% interval — the
    small-sample-safe CI (the normal/Wald interval collapses at
    extreme p or small n; Wilson is what monitoring dashboards should
    ship) — interval ESTIMATION next to `ab_test_proportions`'
    hypothesis test.

    The point rate is exact integer parts-per-million; the Wilson
    bounds use the z=1.96 closed form with every constant
    pre-multiplied to a literal (1.9208 = z²/2, 3.8416 = z², 0.9604 =
    z²/4), so both engines evaluate the IDENTICAL expression tree
    over exact integers — one sqrt + two divisions per OUTPUT brand,
    6-dp rounded.  One broadcast dim join + one brand rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    b = (
        li.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
            .cast("long")
            .alias("r"),
        )
    )
    return b.select(
        "p_brand",
        "n",
        "r",
        F.expr("CAST((r * 1000000) div n AS BIGINT)").alias("rate_ppm"),
        F.expr(
            "CAST(round((r + 1.9208D) / (n + 3.8416D)"
            " - (1.96D * sqrt((r * (n - r)) / (1.0D * n) + 0.9604D))"
            "   / (n + 3.8416D), 6) AS DOUBLE)"
        ).alias("wilson_low"),
        F.expr(
            "CAST(round((r + 1.9208D) / (n + 3.8416D)"
            " + (1.96D * sqrt((r * (n - r)) / (1.0D * n) + 0.9604D))"
            "   / (n + 3.8416D), 6) AS DOUBLE)"
        ).alias("wilson_high"),
    ).orderBy("p_brand")


@query(
    "price_volume_decomposition",
    oracle="""
WITH li AS (
  SELECT p_brand,
         epoch(CAST(o_orderdate AS TIMESTAMP)) // 86400 AS d,
         CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS cents,
         CAST(round(l_quantity, 0) AS BIGINT) AS qty
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
),
bd AS (
  SELECT CAST(round(quantile_cont(
           epoch(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP)) // 86400,
           0.5), 0) AS BIGINT) AS b
  FROM orders WHERE o_orderdate IS NOT NULL
),
agg AS (
  SELECT p_brand,
         SUM(CASE WHEN d < b THEN cents ELSE 0 END) AS r0,
         SUM(CASE WHEN d < b THEN qty ELSE 0 END) AS q0,
         SUM(CASE WHEN d >= b THEN cents ELSE 0 END) AS r1,
         SUM(CASE WHEN d >= b THEN qty ELSE 0 END) AS q1
  FROM li CROSS JOIN bd GROUP BY p_brand
),
rates AS (
  SELECT p_brand, r0, q0, r1, q1,
         CAST(round(r0 / (1.0 * q0), 2) AS DECIMAL(18,2)) AS rate0,
         CAST(round(r1 / (1.0 * q1), 2) AS DECIMAL(18,2)) AS rate1
  FROM agg WHERE q0 > 0 AND q1 > 0
)
SELECT p_brand,
       CAST(r1 - r0 AS BIGINT) AS delta_cents,
       CAST(round((q1 - q0) * rate0, 0) AS BIGINT) AS volume_effect_cents,
       CAST(round(q1 * (rate1 - rate0), 0) AS BIGINT) AS price_effect_cents,
       CAST(r1 - r0 - round((q1 - q0) * rate0, 0)
            - round(q1 * (rate1 - rate0), 0) AS BIGINT) AS residual_cents
FROM rates ORDER BY p_brand
""",
)
def q_price_volume_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume bridge per brand between the first and second half
    of the order history (split at the MEDIAN order day, so both
    periods are populated at every scale): ΔRevenue = volume effect
    ((ΔQ)·rate₀) + price effect (Q₁·Δrate) + residual — the FP&A
    waterfall explaining WHY revenue moved, not just that it did.

    Determinism: the period boundary is one rounded median of integer
    epoch ORDER days — computed from the pushed-down single-column
    orders scan, NOT from the joined fact rows (the boundary doesn't
    need the join, so its extra pass is cheap at any scale); unit rates are quantized to DECIMAL(18,2) cents BEFORE
    the effect multiplications, so every effect is exact decimal
    arithmetic and the residual reconciles to the exact integer ΔR by
    construction (the decomposition is audit-closed: the four columns
    sum exactly).  One fact pass with broadcast dims + conditional
    aggregation — the two periods never need separate scans."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    base = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            li["l_partkey"] == F.col("p_partkey"),
        )
        .select(
            "p_brand",
            F.expr(
                "unix_seconds(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP))"
                " div 86400"
            ).alias("d"),
            F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
            F.round(F.col("l_quantity"), 0).cast("long").alias("qty"),
        )
    )
    bd = (
        orders.filter(F.col("o_orderdate").isNotNull())
        .select(
            F.expr(
                "unix_seconds(CAST(CAST(o_orderdate AS DATE) AS TIMESTAMP))"
                " div 86400"
            ).alias("d")
        )
        .agg(F.round(F.expr("percentile(d, 0.5D)"), 0).cast("long").alias("b"))
    )
    agg = (
        base.crossJoin(F.broadcast(bd))
        .groupBy("p_brand")
        .agg(
            F.sum(F.when(F.col("d") < F.col("b"), F.col("cents")).otherwise(0)).alias("r0"),
            F.sum(F.when(F.col("d") < F.col("b"), F.col("qty")).otherwise(0)).alias("q0"),
            F.sum(F.when(F.col("d") >= F.col("b"), F.col("cents")).otherwise(0)).alias("r1"),
            F.sum(F.when(F.col("d") >= F.col("b"), F.col("qty")).otherwise(0)).alias("q1"),
        )
        .filter((F.col("q0") > 0) & (F.col("q1") > 0))
    )
    rates = agg.select(
        "p_brand",
        "r0",
        "q0",
        "r1",
        "q1",
        F.expr("CAST(round(r0 / (1.0D * q0), 2) AS DECIMAL(18,2))").alias("rate0"),
        F.expr("CAST(round(r1 / (1.0D * q1), 2) AS DECIMAL(18,2))").alias("rate1"),
    )
    return rates.select(
        "p_brand",
        (F.col("r1") - F.col("r0")).cast("long").alias("delta_cents"),
        F.expr("CAST(round((q1 - q0) * rate0, 0) AS BIGINT)").alias(
            "volume_effect_cents"
        ),
        F.expr("CAST(round(q1 * (rate1 - rate0), 0) AS BIGINT)").alias(
            "price_effect_cents"
        ),
        F.expr(
            "CAST(r1 - r0 - round((q1 - q0) * rate0, 0)"
            " - round(q1 * (rate1 - rate0), 0) AS BIGINT)"
        ).alias("residual_cents"),
    ).orderBy("p_brand")


@query(
    "weekend_welch_ttest",
    oracle="""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         isodow(CAST(o_orderdate AS DATE)) >= 6 AS is_weekend,
         SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS x
  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1, 2
),
m AS (
  SELECT is_weekend,
         CAST(count(*) AS BIGINT) AS n,
         SUM(CAST(x AS HUGEINT)) AS s,
         SUM(CAST(x AS HUGEINT) * x) AS ss
  FROM daily GROUP BY is_weekend
),
w AS (SELECT n AS n1, s AS s1, ss AS ss1 FROM m WHERE is_weekend),
d AS (SELECT n AS n0, s AS s0, ss AS ss0 FROM m WHERE NOT is_weekend)
SELECT n0 AS n_weekday, n1 AS n_weekend,
       CAST(round(s0 / (100.0 * n0), 2) AS DOUBLE) AS mean_weekday_dollars,
       CAST(round(s1 / (100.0 * n1), 2) AS DOUBLE) AS mean_weekend_dollars,
       CAST(round(
         (s1 / (1.0 * n1) - s0 / (1.0 * n0))
         / sqrt((CAST(n1 AS DOUBLE) * ss1 - CAST(s1 AS DOUBLE) * s1)
                  / (1.0 * n1 * (n1 - 1) * n1)
                + (CAST(n0 AS DOUBLE) * ss0 - CAST(s0 AS DOUBLE) * s0)
                  / (1.0 * n0 * (n0 - 1) * n0)), 4) AS DOUBLE) AS welch_t
FROM w CROSS JOIN d
""",
)
def q_weekend_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-test for the weekend effect on daily
    revenue — the MEANS companion to `ab_test_proportions`' rate test
    (is the weekend level shift real, or day-to-day noise?).  Welch,
    not Student: daily-revenue variance differs across day types and
    the unequal-n correction matters.

    Every moment (n, Σx, Σx²) is an exact HUGEINT/DECIMAL(38,0)
    integer per group; the t statistic is one shared closed-form
    expression tree over those six integers — two divisions and one
    sqrt, rounded at 4 dp — so both engines agree to the last digit
    (the `trend_event_values` discipline).  One day rollup + one
    2-row moment aggregate."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .groupBy(
            F.col("o_orderdate").cast("date").alias("day"),
            (F.expr("weekday(CAST(o_orderdate AS DATE))") >= 5).alias(
                "is_weekend"
            ),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("x")
        )
    )
    dec = "decimal(38,0)"
    m = daily.groupBy("is_weekend").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("s"),
        F.sum(F.col("x").cast(dec) * F.col("x")).alias("ss"),
    )
    w = m.filter(F.col("is_weekend")).select(
        F.col("n").alias("n1"), F.col("s").alias("s1"), F.col("ss").alias("ss1")
    )
    d = m.filter(~F.col("is_weekend")).select(
        F.col("n").alias("n0"), F.col("s").alias("s0"), F.col("ss").alias("ss0")
    )
    return w.crossJoin(d).select(
        F.col("n0").alias("n_weekday"),
        F.col("n1").alias("n_weekend"),
        F.expr("CAST(round(s0 / (100.0D * n0), 2) AS DOUBLE)").alias(
            "mean_weekday_dollars"
        ),
        F.expr("CAST(round(s1 / (100.0D * n1), 2) AS DOUBLE)").alias(
            "mean_weekend_dollars"
        ),
        F.expr(
            "CAST(round("
            " (s1 / (1.0D * n1) - s0 / (1.0D * n0))"
            " / sqrt((CAST(n1 AS DOUBLE) * ss1 - CAST(s1 AS DOUBLE) * s1)"
            "          / (1.0D * n1 * (n1 - 1) * n1)"
            "        + (CAST(n0 AS DOUBLE) * ss0 - CAST(s0 AS DOUBLE) * s0)"
            "          / (1.0D * n0 * (n0 - 1) * n0)), 4) AS DOUBLE)"
        ).alias("welch_t"),
    )


@query(
    "basket_size_histogram",
    oracle="""
WITH sz AS (
  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines
  FROM lineitem GROUP BY l_orderkey
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS t FROM sz)
SELECT n_lines,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST((count(*) * 1000000) // t AS BIGINT) AS share_ppm,
       CAST(SUM(count(*) * 1000000) OVER (ORDER BY n_lines
              ROWS UNBOUNDED PRECEDING) // t AS BIGINT) AS cum_share_ppm
FROM sz CROSS JOIN tot
GROUP BY n_lines, t
ORDER BY n_lines
""",
)
def q_basket_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order basket-size distribution: how many line items orders
    carry, with exact ppm shares and the cumulative curve — the
    cardinality profile that sizes per-basket pair expansions
    (`frequent_brand_pairs`' O(k²) step is bounded by THIS
    histogram's tail, so the mining family's cost model cites it).

    One orderkey rollup, then everything runs on the |distinct basket
    sizes|-row histogram (≤ tens of rows at any corpus size); shares
    are integer (x·10⁶) div t — no float."""
    li = load_table(spark, sf_dir, "lineitem")
    sz = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_lines"))
    tot = sz.agg(F.count(F.lit(1)).alias("t"))
    h = (
        sz.groupBy("n_lines")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .crossJoin(F.broadcast(tot))
    )
    w = Window.orderBy("n_lines").rowsBetween(Window.unboundedPreceding, 0)
    return (
        h.withColumn("cum", F.sum(F.col("n_orders") * 1000000).over(w))
        .select(
            "n_lines",
            "n_orders",
            F.expr("CAST((n_orders * 1000000) div t AS BIGINT)").alias(
                "share_ppm"
            ),
            F.expr("CAST(cum div t AS BIGINT)").alias("cum_share_ppm"),
        )
        .orderBy("n_lines")
    )


def _logistic_oracle() -> str:
    from ..operators.glm import newton_step_sql

    return f"""
WITH suff AS (
  SELECT CAST(round(l_discount * 100, 0) AS INT) AS x,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS s
  FROM lineitem GROUP BY 1
),
i0 AS (SELECT CAST(0.0 AS DOUBLE) AS b0, CAST(0.0 AS DOUBLE) AS b1),
i1 AS ({newton_step_sql("i0", "suff")}),
i2 AS ({newton_step_sql("i1", "suff")}),
i3 AS ({newton_step_sql("i2", "suff")})
SELECT (SELECT CAST(SUM(n) AS BIGINT) FROM suff) AS n_obs,
       (SELECT CAST(SUM(s) AS BIGINT) FROM suff) AS n_returned,
       b0 AS intercept,
       b1 AS slope_per_bp,
       CAST(round(1.0 / (1.0 + exp(-(b0))), 6) AS DOUBLE) AS p_at_0bp,
       CAST(round(1.0 / (1.0 + exp(-(b0 + b1 * 10))), 6) AS DOUBLE)
         AS p_at_10bp
FROM i3
"""


@query("logistic_return_model", oracle=_logistic_oracle())
def q_logistic_return_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic regression of P(line returned) on discount depth,
    trained by 3 Newton/IRLS steps — GLM training as a FIRST-CLASS
    distributed query (the convex sibling of the k-means / BPE /
    PageRank iterative family).

    The 100 TB shape (``operators/glm.py``): the corpus is touched
    ONCE to build the per-distinct-discount sufficient statistics
    (x, n, Σy) — an 11-row table — and every Newton step is a 5-cell
    aggregate over THAT, so iteration cost is independent of corpus
    size.  Determinism follows the k-means contract: p and the Newton
    update are SQL-rounded (9 dp) inside each step before the one-row
    collect bakes β into the next step's expressions; the oracle
    replays the identical CTE chain, so the value match proves the
    whole training trajectory, not just the fit."""
    from ..operators.glm import logistic_newton

    li = load_table(spark, sf_dir, "lineitem")
    cents_x = F.round(F.col("l_discount") * 100, 0).cast("int")
    obs = li.select(
        cents_x.alias("x"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    suff = obs.groupBy("x").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    b0, b1 = logistic_newton(suff, n_iter=3)
    return suff.agg(
        F.sum("n").alias("n_obs"),
        F.sum("s").alias("n_returned"),
    ).select(
        "n_obs",
        "n_returned",
        F.lit(b0).alias("intercept"),
        F.lit(b1).alias("slope_per_bp"),
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-F.lit(b0))), 6
        ).alias("p_at_0bp"),
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(b0) + F.lit(b1) * 10))), 6
        ).alias("p_at_10bp"),
    )


@query(
    "dow_revenue_anova",
    oracle="""
WITH g AS (
  SELECT isodow(CAST(o_orderdate AS DATE)) AS dow,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS HUGEINT)
           AS sv,
         CAST(SUM(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                  * CAST(round(o_totalprice * 100, 0) AS BIGINT)) AS HUGEINT)
           AS ssv
  FROM orders WHERE o_orderdate IS NOT NULL
  GROUP BY 1
),
t AS (
  SELECT CAST(count(*) AS BIGINT) AS k,
         CAST(SUM(n) AS BIGINT) AS n_tot,
         SUM(CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n) AS sb_part,
         SUM(CAST(ssv AS DOUBLE)) AS ss_tot,
         CAST(SUM(sv) AS DOUBLE) AS s_tot
  FROM g
)
SELECT k AS k_groups, n_tot AS n_obs,
       CAST(round(((sb_part - s_tot * s_tot / n_tot) / (k - 1))
                  / ((ss_tot - sb_part) / (n_tot - k)), 4) AS DOUBLE)
         AS f_stat,
       CAST(round((sb_part - s_tot * s_tot / n_tot)
                  / (ss_tot - s_tot * s_tot / n_tot), 9) AS DOUBLE)
         AS eta_sq
FROM t
""",
)
def q_dow_revenue_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA of order value across the 7 days of week — the
    k-group generalization of `weekend_welch_ttest` (F-statistic and
    the η² effect size instead of a 2-group t).

    Exactness: per-group moments (n, Σcents, Σcents²) are exact
    integers (DECIMAL(38,0)/HUGEINT sums of bounded BIGINT products);
    the sums-of-squares identities SSB = Σs_g²/n_g − S²/N and
    SSW = Σss_g − Σs_g²/n_g run in DOUBLE over the 7-row group frame
    with BOTH engines evaluating the textually identical tree.  The
    cancellation error budget is pinned: the 1e23-magnitude terms
    carry ~1e7 absolute double error into an SSB ≥ ~1e14, so f_stat is
    stable far below its 4-dp round and η² below its 9-dp round.
    Scale shape: one partial-aggregatable corpus rollup to 7 rows;
    everything after is constant-size."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    dec = "decimal(38,0)"
    g = (
        orders.filter(F.col("o_orderdate").isNotNull())
        .select(
            (F.weekday(F.col("o_orderdate").cast("date")) + 1).alias("dow"),
            cents.alias("c"),
        )
        .groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c").cast(dec)).alias("sv"),
            F.sum((F.col("c") * F.col("c")).cast(dec)).alias("ssv"),
        )
    )
    t = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("n_tot"),
        F.sum(F.expr("CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / n")).alias(
            "sb_part"
        ),
        F.sum(F.expr("CAST(ssv AS DOUBLE)")).alias("ss_tot"),
        F.expr("CAST(SUM(sv) AS DOUBLE)").alias("s_tot"),
    )
    return t.select(
        F.col("k").alias("k_groups"),
        F.col("n_tot").alias("n_obs"),
        F.expr(
            "CAST(round(((sb_part - s_tot * s_tot / n_tot) / (k - 1))"
            " / ((ss_tot - sb_part) / (n_tot - k)), 4) AS DOUBLE)"
        ).alias("f_stat"),
        F.expr(
            "CAST(round((sb_part - s_tot * s_tot / n_tot)"
            " / (ss_tot - s_tot * s_tot / n_tot), 9) AS DOUBLE)"
        ).alias("eta_sq"),
    )


def _poisson_oracle() -> str:
    from ..operators.glm import poisson_step_sql

    return f"""
WITH suff AS (
  SELECT CAST(round(l_discount * 100, 0) AS INT) AS x,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round(l_quantity, 0) AS BIGINT)) AS BIGINT) AS s
  FROM lineitem GROUP BY 1
),
i0 AS (
  SELECT round(ln(SUM(s) / SUM(n)), 9) AS b0, CAST(0.0 AS DOUBLE) AS b1
  FROM suff
),
i1 AS ({poisson_step_sql("i0", "suff")}),
i2 AS ({poisson_step_sql("i1", "suff")}),
i3 AS ({poisson_step_sql("i2", "suff")})
SELECT (SELECT CAST(SUM(n) AS BIGINT) FROM suff) AS n_lines,
       (SELECT CAST(SUM(s) AS BIGINT) FROM suff) AS total_qty,
       b0 AS intercept,
       b1 AS slope_per_bp,
       CAST(round(exp(b0), 6) AS DOUBLE) AS rate_at_0bp,
       CAST(round(exp(b1), 6) AS DOUBLE) AS rate_ratio_per_bp
FROM i3
"""


@query("poisson_quantity_model", oracle=_poisson_oracle())
def q_poisson_quantity_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson (log-link) regression of line quantity on discount depth
    — the count-data demand model beside `logistic_return_model`'s
    binary one, proving ``operators/glm.py`` generalizes across GLM
    families: same one-corpus-scan sufficient statistics, same
    quantized Newton trajectory, different link.

    The Poisson wrinkle (documented at `poisson_newton`): canonical
    Newton diverges from β = 0 when the mean count is far from 1, so
    the trajectory starts at the saturated intercept ln(Σy/Σn) —
    itself SQL-computed and 9-dp-quantized, so the oracle CTE chain
    replays initialization and all three steps bit-identically.
    Output includes the interpretable forms: expected quantity at
    zero discount and the multiplicative rate ratio per basis point."""
    from ..operators.glm import poisson_newton

    li = load_table(spark, sf_dir, "lineitem")
    obs = li.select(
        F.round(F.col("l_discount") * 100, 0).cast("int").alias("x"),
        F.round(F.col("l_quantity"), 0).cast("long").alias("y"),
    )
    suff = obs.groupBy("x").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    b0, b1 = poisson_newton(suff, n_iter=3)
    return suff.agg(
        F.sum("n").alias("n_lines"),
        F.sum("s").alias("total_qty"),
    ).select(
        "n_lines",
        "total_qty",
        F.lit(b0).alias("intercept"),
        F.lit(b1).alias("slope_per_bp"),
        F.round(F.exp(F.lit(b0)), 6).alias("rate_at_0bp"),
        F.round(F.exp(F.lit(b1)), 6).alias("rate_ratio_per_bp"),
    )


#: Two-sided alpha=0.05 and power=0.80 normal quantiles, baked as the
#: same literals on both engines (the return_rate_wilson discipline).
_Z_ALPHA = "1.959963985"
_Z_BETA = "0.841621234"


@query(
    "ab_test_power",
    oracle=f"""
WITH base AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS k
  FROM events
),
rates AS (
  SELECT n, k,
         CAST(k AS DOUBLE) / n AS p1,
         1.1 * (CAST(k AS DOUBLE) / n) AS p2
  FROM base
)
SELECT n AS n_events, k AS n_purchases,
       CAST(round(p1, 6) AS DOUBLE) AS base_rate,
       CAST(round(p2, 6) AS DOUBLE) AS target_rate,
       CAST(ceil(round(
         pow({_Z_ALPHA} * sqrt(2.0 * ((p1 + p2) / 2.0)
                               * (1.0 - (p1 + p2) / 2.0))
             + {_Z_BETA} * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)), 2)
         / pow(p2 - p1, 2), 6)) AS BIGINT) AS n_per_arm
FROM rates
""",
)
def q_ab_test_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B sample-size planning: observations per arm needed to detect
    a 10% relative lift over the observed purchase rate at two-sided
    α = 0.05 with power 0.80 (the pooled-variance normal approximation
    every experimentation platform quotes) — the PLANNING sibling of
    `ab_test_proportions`' after-the-fact z-test.

    Determinism: the base rate comes from exact integer counts and is
    an EXPLICIT double column on both sides (in a Spark SQL string the
    literal 1.0 is DECIMAL(2,1) — `k / (1.0 * n)` silently runs the
    whole formula in decimal arithmetic, 0.003 off the oracle's double
    at sf0.1: enough to flip the ceil); both engines then evaluate the
    textually identical closed-form tree with the z quantiles baked as
    literals, and the raw sample size is 6-dp-quantized before the
    ceil so residual 1-ulp pow/sqrt differences can't straddle an
    integer.  Scale shape: one partial-aggregatable corpus rollup to
    2 integers; the formula is constant-time."""
    events = load_table(spark, sf_dir, "events")
    base = events.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("k"),
    )
    # p1/p2 as explicit DOUBLE columns: in a Spark SQL string the
    # literal 1.0 is DECIMAL(2,1), so `k / (1.0 * n)` silently runs in
    # decimal arithmetic and lands 0.003 away from the oracle's double
    # at sf0.1 — enough to flip the ceil
    rates = base.select(
        "n",
        "k",
        (F.col("k").cast("double") / F.col("n")).alias("p1"),
        (F.lit(1.1) * (F.col("k").cast("double") / F.col("n"))).alias("p2"),
    )
    return rates.select(
        F.col("n").alias("n_events"),
        F.col("k").alias("n_purchases"),
        F.round("p1", 6).alias("base_rate"),
        F.round("p2", 6).alias("target_rate"),
        F.expr(
            f"""CAST(ceil(round(
              pow({_Z_ALPHA} * sqrt(2.0 * ((p1 + p2) / 2.0)
                                    * (1.0 - (p1 + p2) / 2.0))
                  + {_Z_BETA} * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)), 2)
              / pow(p2 - p1, 2), 6)) AS BIGINT)"""
        ).alias("n_per_arm"),
    )


#: Poisson-bootstrap replicate count.  30 replicates gives a stderr on
#: the CI endpoints of ~13% of the interval width — the resolution a
#: drift dashboard needs; production would use 200+.
_BOOT_REPS = 30

#: Poisson(1) CDF thresholds (k = 0..5; heavier counts are capped — at
#: P(>5) ≈ 6e-4 the truncation bias is far below replicate noise).
_POIS_CDF = (
    0.36787944117144233,
    0.7357588823428847,
    0.9196986029286058,
    0.9810118431238462,
    0.9963401531726563,
    0.9994058151824183,
)

_U60 = 1152921504606846976.0  # 2^60, the hash60 domain


def _poisson_bootstrap_oracle() -> str:
    u = ("CAST(concat('0x', substr(md5(concat(CAST(o_orderkey AS VARCHAR), "
         "':', CAST(rep AS VARCHAR))), 1, 15)) AS BIGINT)"
         f" / {_U60}")
    cases = " ".join(
        f"WHEN u < {c} THEN {k}" for k, c in enumerate(_POIS_CDF)
    )
    return f"""
WITH reps AS (SELECT unnest(range(0, {_BOOT_REPS})) AS rep),
w AS (
  SELECT o_orderpriority, rep,
         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
         CASE {cases} ELSE 6 END AS wgt
  FROM orders, reps, LATERAL (SELECT {u} AS u) h
),
boot AS (
  SELECT o_orderpriority, rep,
         sum(wgt * cents) / (100.0 * sum(wgt)) AS mean_r
  FROM w GROUP BY 1, 2 HAVING sum(wgt) > 0
)
SELECT o_orderpriority,
       (SELECT round(sum({_CENTS.replace('value', 'o_totalprice')})
                     / (100.0 * count(*)), 4)
        FROM orders o2
        WHERE o2.o_orderpriority = boot.o_orderpriority) AS point_mean,
       round(quantile_cont(mean_r, 0.025), 4) AS boot_lo,
       round(quantile_cont(mean_r, 0.975), 4) AS boot_hi,
       CAST(count(*) AS BIGINT) AS n_reps
FROM boot
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


@query("poisson_bootstrap_ci", oracle=_poisson_bootstrap_oracle())
def q_poisson_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POISSON BOOTSTRAP confidence intervals — the distributed
    bootstrap (Chamandy et al., Google 2012): classical resampling
    needs n draws WITH replacement from a corpus no executor holds,
    but Poisson(1) per-row replicate weights are iid-independent per
    row, so every replicate is one weighted aggregate over a single
    scan.  Weights come from the 60-bit md5 hash of (row, rep) mapped
    through the Poisson(1) inverse CDF — fully deterministic, zero
    RNG state, identical in both engines.  Reports the 95% percentile
    CI of mean order value per priority class.

    Scale: one scan fans each row into {_BOOT_REPS} (row, rep) pairs
    (a flat projection, no shuffle), then ONE map-side-combinable
    groupBy over groups x reps cells; replicate means are exact
    integer cent sums divided once.  The POINT estimate rides the
    same cells (r11): each cell also carries the unweighted
    sum(cents)/count, and any single replicate's cells hold exactly
    the per-priority totals of the raw table (cents are per-row
    constants across reps), so the rep-0 slice of the eagerly-cut
    ~|priorities|x{_BOOT_REPS}-row cell frame IS the point aggregate —
    the second full orders scan the r10 shape paid is gone.  No
    resample materialization, no driver loop — this is why Poisson
    bootstrap is THE bootstrap that survives 100 TB."""
    orders = load_table(spark, sf_dir, "orders")
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("o_orderkey").cast("string"),
                        F.lit(":"),
                        F.col("rep").cast("string"),
                    )
                ),
                1,
                15,
            ),
            16,
            10,
        ).cast("long")
        / _U60
    )
    wgt = F.lit(6)
    for k in range(len(_POIS_CDF) - 1, -1, -1):
        wgt = F.when(F.col("u") < _POIS_CDF[k], k).otherwise(wgt)
    w = (
        orders.select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("long")
            .alias("cents"),
            F.explode(
                F.sequence(F.lit(0), F.lit(_BOOT_REPS - 1))
            ).alias("rep"),
        )
        .withColumn("u", u)
        .withColumn("wgt", wgt)
    )
    cells = (
        w.groupBy("o_orderpriority", "rep")
        .agg(
            F.sum(F.col("wgt") * F.col("cents")).alias("wc"),
            F.sum("wgt").alias("ws"),
            F.sum("cents").alias("sc"),
            F.count(F.lit(1)).alias("cnt"),
        )
        # bounded (priority x rep) frame; eager localCheckpoint is the
        # local/bench trade — unreplicated, lost on executor failure,
        # and the scan runs at construction time.  A cluster-scale run
        # should use reliable checkpoint()/persist() here (ADVICE r11;
        # recompute-on-loss beats a failed multi-hour job).
        .localCheckpoint(eager=True)
    )
    boot = cells.filter(F.col("ws") > 0).select(
        "o_orderpriority", (F.col("wc") / (100.0 * F.col("ws"))).alias("mean_r")
    )
    point = cells.filter(F.col("rep") == 0).select(
        "o_orderpriority",
        F.round(F.col("sc") / (100.0 * F.col("cnt")), 4).alias("point_mean"),
    )
    return (
        boot.groupBy("o_orderpriority")
        .agg(
            F.round(F.expr("percentile(mean_r, 0.025)"), 4).alias("boot_lo"),
            F.round(F.expr("percentile(mean_r, 0.975)"), 4).alias("boot_hi"),
            F.count(F.lit(1)).cast("long").alias("n_reps"),
        )
        .join(F.broadcast(point), "o_orderpriority")
        .select(
            "o_orderpriority", "point_mean", "boot_lo", "boot_hi", "n_reps"
        )
        .orderBy("o_orderpriority")
    )


#: Split-conformal miscoverage level: intervals target 90% coverage.
_CONF_ALPHA = 0.1


def _conformal_oracle() -> str:
    h = ("CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) "
         "AS BIGINT)")
    return f"""
WITH rows_s AS (
  SELECT c.c_mktsegment AS seg, o.o_orderkey,
         CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents,
         {h} % 2 AS fold
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
),
pred AS (
  SELECT seg, sum(cents) / CAST(count(*) AS DOUBLE) AS mean_cents,
         count(*) AS n_calib
  FROM rows_s WHERE fold = 0 GROUP BY seg
),
scored AS (
  SELECT r.seg, abs(r.cents - p.mean_cents) AS s, r.o_orderkey,
         p.n_calib,
         row_number() OVER (PARTITION BY r.seg
                            ORDER BY abs(r.cents - p.mean_cents),
                                     r.o_orderkey) AS rn
  FROM rows_s r JOIN pred p USING (seg) WHERE r.fold = 0
),
q AS (
  SELECT seg, s AS q_cents FROM scored
  WHERE rn = CAST(ceil((n_calib + 1) * {1 - _CONF_ALPHA}) AS BIGINT)
)
SELECT r.seg,
       CAST(p.n_calib AS BIGINT) AS n_calib,
       CAST(count(*) AS BIGINT) AS n_test,
       round(q.q_cents / 100.0, 4) AS q_width,
       round(sum(CASE WHEN abs(r.cents - p.mean_cents) <= q.q_cents
                      THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6)
         AS coverage
FROM rows_s r
JOIN pred p USING (seg)
JOIN q USING (seg)
WHERE r.fold = 1
GROUP BY r.seg, p.n_calib, q.q_cents
ORDER BY r.seg
"""


@query("conformal_interval_coverage", oracle=_conformal_oracle())
def q_conformal_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT-CONFORMAL prediction intervals (Vovk; Lei et al. 2018):
    the distribution-free coverage guarantee — predict each order's
    value by its segment's calibration mean, take the
    ceil((n+1)(1-alpha))-th smallest absolute residual on the
    calibration fold as the interval half-width, and the test fold is
    then guaranteed >= 90% coverage with NO model or distribution
    assumption.  Reports per-segment width and realized test coverage
    — the honesty check a prediction service publishes next to its
    point forecasts.

    Determinism: folds come from the 60-bit md5 key hash (no RNG); the
    quantile is an EXACT order statistic (row_number = k with a total
    tiebreak), never an interpolated percentile, so both engines pick
    the identical calibration residual.

    Scale: predictions are group means (broadcastable aggregate); the
    k-th order statistic is one ranking window per segment over the
    calibration fold only; coverage is a single conditional aggregate.
    Nothing materializes beyond (rows x 1 window rank)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rows_s = (
        orders.join(
            cust.select(
                F.col("c_custkey").alias("o_custkey"),
                F.col("c_mktsegment").alias("seg"),
            ),
            "o_custkey",
        ).select(
            "seg",
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
            (
                F.conv(
                    F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 15),
                    16,
                    10,
                ).cast("long")
                % 2
            ).alias("fold"),
        )
        # rows_s roots four subtree executions (pred referenced twice,
        # the residual scoring, the test fold) and pred itself two —
        # the before-plan ran the orders⋈customer join + md5 fold hash
        # 4× (16 parquet scans).  The two cuts bound each to one run.
        .localCheckpoint(eager=True)
    )
    calib = rows_s.filter(F.col("fold") == 0)
    pred = (
        calib.groupBy("seg")
        .agg(
            (F.sum("cents") / F.count(F.lit(1)).cast("double")).alias("mean_cents"),
            F.count(F.lit(1)).alias("n_calib"),
        )
        .localCheckpoint(eager=True)
    )
    scored = calib.join(F.broadcast(pred), "seg").select(
        "seg",
        F.abs(F.col("cents") - F.col("mean_cents")).alias("s"),
        "o_orderkey",
        "n_calib",
    )
    rn = F.row_number().over(
        Window.partitionBy("seg").orderBy("s", "o_orderkey")
    )
    q = (
        scored.withColumn("rn", rn)
        .filter(
            F.col("rn")
            == F.ceil((F.col("n_calib") + 1) * (1 - _CONF_ALPHA)).cast("long")
        )
        .select("seg", F.col("s").alias("q_cents"))
    )
    test = rows_s.filter(F.col("fold") == 1)
    covered = F.when(
        F.abs(F.col("cents") - F.col("mean_cents")) <= F.col("q_cents"), 1
    ).otherwise(0)
    return (
        test.join(F.broadcast(pred), "seg")
        .join(F.broadcast(q), "seg")
        .groupBy("seg", "n_calib", "q_cents")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.round(
                F.sum(covered) / F.count(F.lit(1)).cast("double"), 6
            ).alias("coverage"),
        )
        .select(
            "seg",
            F.col("n_calib").cast("long").alias("n_calib"),
            "n_test",
            F.round(F.col("q_cents") / 100.0, 4).alias("q_width"),
            "coverage",
        )
        .orderBy("seg")
    )


def _calibration_oracle() -> str:
    from ..operators.glm import newton_step_sql

    return f"""
WITH suff AS (
  SELECT CAST(round(l_discount * 100, 0) AS INT) AS x,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS s
  FROM lineitem GROUP BY 1
),
i0 AS (SELECT CAST(0.0 AS DOUBLE) AS b0, CAST(0.0 AS DOUBLE) AS b1),
i1 AS ({newton_step_sql("i0", "suff")}),
i2 AS ({newton_step_sql("i1", "suff")}),
i3 AS ({newton_step_sql("i2", "suff")}),
cal AS (
  SELECT s.x, s.n,
         CAST(round(1.0 / (1.0 + exp(-(i.b0 + i.b1 * s.x))), 6) AS DOUBLE)
           AS p_pred,
         CAST(round(s.s / CAST(s.n AS DOUBLE), 6) AS DOUBLE) AS p_obs
  FROM suff s CROSS JOIN i3 i
),
g AS (
  SELECT x, n, p_pred, p_obs,
         CAST(round(abs(p_pred - p_obs) * 1000000, 0) AS BIGINT) AS gap_micro
  FROM cal
)
SELECT x, n, p_pred, p_obs,
       CAST(round(gap_micro / 1000000.0, 6) AS DOUBLE) AS abs_gap,
       (SELECT CAST(round(SUM(n * gap_micro) / (1000000.0 * SUM(n)), 6)
                    AS DOUBLE) FROM g) AS ece
FROM g
ORDER BY x
"""


@query("calibration_return_model", oracle=_calibration_oracle())
def q_calibration_return_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RELIABILITY DIAGRAM + ECE for the fitted return model — the
    audit that decides whether `logistic_return_model`'s probabilities
    can be USED as probabilities (thresholding, expected-cost pricing):
    per discount cell, predicted P(return) vs observed return rate,
    plus the expected calibration error Σ (n_cell/N)·|p̂ − p_obs|
    repeated on every row as the headline number.

    Determinism: the β trajectory is the 9-dp-quantized Newton chain
    shared with `logistic_return_model` (the oracle replays the same
    CTE chain); per-cell gaps round at 6 dp and ECE accumulates them
    as exact integer micro-units, so reduce order cannot flip the
    output rounding.

    Scale: the calibration table IS the sufficient-statistics table —
    11 discount cells regardless of corpus size — so everything after
    the one corpus scan is metadata-sized; grouping by predicted-
    probability deciles instead of x would add one small shuffle, not
    a second scan."""
    from ..operators.glm import logistic_newton

    li = load_table(spark, sf_dir, "lineitem")
    obs = li.select(
        F.round(F.col("l_discount") * 100, 0).cast("int").alias("x"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    suff = obs.groupBy("x").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
    )
    b0, b1 = logistic_newton(suff, n_iter=3)
    cal = suff.select(
        "x",
        "n",
        F.round(
            F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.lit(b0) + F.lit(b1) * F.col("x")))),
            6,
        ).alias("p_pred"),
        F.round(F.col("s") / F.col("n").cast("double"), 6).alias("p_obs"),
    ).withColumn(
        "gap_micro",
        F.round(F.abs(F.col("p_pred") - F.col("p_obs")) * 1000000, 0).cast(
            "long"
        ),
    )
    ece = cal.agg(
        F.round(
            F.sum(F.col("n") * F.col("gap_micro"))
            / (1000000.0 * F.sum("n")),
            6,
        ).alias("ece")
    )
    return (
        cal.join(F.broadcast(ece))
        .select(
            "x",
            "n",
            "p_pred",
            "p_obs",
            F.round(F.col("gap_micro") / 1000000.0, 6).alias("abs_gap"),
            "ece",
        )
        .orderBy("x")
    )


def _pnorm_two_sided(z: str) -> str:
    """Two-sided normal p-value ``2·(1 − Φ(|z|))`` as a SQL expression
    string — Abramowitz & Stegun 26.2.17 (|error| < 7.5e-8), written
    ONCE and embedded verbatim in both engines so every constant,
    parenthesis, and evaluation order is identical; the only
    cross-engine divergence source left is one ``exp`` ulp, orders of
    magnitude under the 6-dp round (the `logistic_return_model`
    precedent for exp parity)."""
    k = f"(1.0 / (1.0 + 0.2316419 * abs({z})))"
    poly = (
        f"({k} * (0.319381530 + {k} * (-0.356563782 + {k} * "
        f"(1.781477937 + {k} * (-1.821255978 + {k} * 1.330274429)))))"
    )
    return (
        f"(2.0 * exp(-((({z}) * ({z})) / 2.0)) * 0.3989422804014327 * {poly})"
    )


#: Per-brand return-rate z-test vs the pooled rate, then BH at q=0.05.
_FDR_ALPHA = 0.05
_FDR_Z = (
    "((x_i / CAST(n_i AS DOUBLE) - p0)"
    " / sqrt(p0 * (1.0 - p0) / CAST(n_i AS DOUBLE)))"
)


@query(
    "fdr_bh_correction",
    oracle=f"""
WITH per_brand AS (
  SELECT p.p_brand AS brand,
         count(*) AS n_i,
         sum(CASE WHEN l.l_returnflag = 'R' THEN 1 ELSE 0 END) AS x_i
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
),
pooled AS (
  SELECT sum(x_i) / CAST(sum(n_i) AS DOUBLE) AS p0, count(*) AS m
  FROM per_brand
),
tested AS (
  SELECT brand, n_i, x_i, m,
         round({_FDR_Z}, 6) AS z,
         round({_pnorm_two_sided(_FDR_Z)}, 6) AS p_value
  FROM per_brand CROSS JOIN pooled
),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY p_value, brand) AS i
  FROM tested
),
adjusted AS (
  SELECT *,
         LEAST(1.0, min(p_value * m / i) OVER (
             ORDER BY i ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
         )) AS p_bh_raw
  FROM ranked
)
SELECT brand, CAST(n_i AS BIGINT) AS n_i, CAST(x_i AS BIGINT) AS x_i,
       CAST(z AS DOUBLE) AS z,
       CAST(p_value AS DOUBLE) AS p_value,
       CAST(round(p_bh_raw, 6) AS DOUBLE) AS p_bh,
       round(p_bh_raw, 6) <= {_FDR_ALPHA} AS rejected
FROM adjusted
ORDER BY p_value, brand
""",
)
def q_fdr_bh_correction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTIPLE-TESTING CONTROL — Benjamini–Hochberg FDR across the
    per-brand return-rate z-tests (each brand vs the pooled rate): the
    correction every metrics platform needs once it runs one test per
    segment (25 brands here; thousands of slices in production, where
    uncorrected p<0.05 "discoveries" arrive by the dozen).  Output per
    brand: z, raw p, BH-adjusted p (the step-up suffix-min
    ``min_{{j>=i}} p_j·m/j`` capped at 1), and the q=0.05 rejection
    flag.

    The normal CDF is the A&S 26.2.17 polynomial emitted VERBATIM into
    both engines (no scipy, no per-engine libm CDF).  Scale: the test
    statistics come from one lineitem⋈part scan into an m-row frame;
    ranking and the suffix-min run on m rows (post-aggregate,
    model-sized — the plan-audit gate's allowed shape).  At millions of
    segments the rank becomes `global_row_number` over the aggregate
    frame; the BH threshold crossing is a running comparison, never a
    corpus operation."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    per_brand = (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_i"),
            F.sum((F.col("l_returnflag") == "R").cast("int")).alias("x_i"),
        )
    )
    pooled = per_brand.agg(
        (F.sum("x_i") / F.sum("n_i").cast("double")).alias("p0"),
        F.count(F.lit(1)).alias("m"),
    )
    tested = per_brand.join(F.broadcast(pooled)).select(
        "brand",
        "n_i",
        "x_i",
        "m",
        F.round(F.expr(_FDR_Z), 6).alias("z"),
        F.round(F.expr(_pnorm_two_sided(_FDR_Z)), 6).alias("p_value"),
    )
    w = Window.orderBy("p_value", "brand")
    ranked = tested.withColumn("i", F.row_number().over(w))
    w_suffix = Window.orderBy("i").rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    adjusted = ranked.withColumn(
        "p_bh_raw",
        F.least(
            F.lit(1.0),
            F.min(F.col("p_value") * F.col("m") / F.col("i")).over(w_suffix),
        ),
    )
    return adjusted.select(
        "brand",
        F.col("n_i").cast("long").alias("n_i"),
        F.col("x_i").cast("long").alias("x_i"),
        F.col("z").cast("double").alias("z"),
        F.col("p_value").cast("double").alias("p_value"),
        F.round("p_bh_raw", 6).cast("double").alias("p_bh"),
        (F.round("p_bh_raw", 6) <= _FDR_ALPHA).alias("rejected"),
    ).orderBy("p_value", "brand")


@query(
    "quantile_treatment_effect",
    oracle="""
WITH o AS (
  SELECT CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents,
         o_orderpriority IN ('1-URGENT', '2-HIGH') AS treated
  FROM orders
),
q AS (
  SELECT quantile_cont(CASE WHEN treated THEN cents END,
                       [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qt,
         quantile_cont(CASE WHEN NOT treated THEN cents END,
                       [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS qc
  FROM o
),
grid AS (SELECT unnest(generate_series(1, 9)) AS dq)
SELECT dq AS decile,
       CAST(round(qt[dq] / 100.0, 6) AS DOUBLE) AS q_treated,
       CAST(round(qc[dq] / 100.0, 6) AS DOUBLE) AS q_control,
       CAST(round((qt[dq] - qc[dq]) / 100.0, 6) AS DOUBLE) AS qte
FROM grid CROSS JOIN q
ORDER BY dq
""",
)
def q_quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QUANTILE TREATMENT EFFECTS — the decile-by-decile difference
    between the treated (urgent/high-priority orders) and control
    outcome distributions: where an average effect hides heterogeneity,
    the QTE curve shows WHO moves (a lift concentrated in the upper
    deciles is a very different product story from a uniform shift).
    τ(q) = Q_treated(q) − Q_control(q) for q = 0.1 … 0.9, exact
    interpolated quantiles on integer cents, so both engines
    interpolate identical exact values (the `theil_sen` median
    convention: Spark `percentile` ≡ DuckDB `quantile_cont`).

    Scale: one scan, two conditional `percentile` aggregates.  The
    exact-percentile merge is counts-map-shaped (fine to ~1M distinct
    values per side); past that the scale path is `exact_median`'s
    range-bucketed kth-selection per decile or a t-digest — the QTE
    arithmetic on top is unchanged.  Pairing with `poisson_bootstrap_ci`
    gives the CI story for the MEAN effect; quantile CIs need the
    order-statistic bootstrap, deliberately not faked here."""
    orders = load_table(spark, sf_dir, "orders")
    o = orders.select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("treated"),
    )
    probs = [i / 10.0 for i in range(1, 10)]
    q = o.agg(
        F.expr(
            f"percentile(CASE WHEN treated THEN cents END,"
            f" array({', '.join(str(p) for p in probs)}))"
        ).alias("qt"),
        F.expr(
            f"percentile(CASE WHEN NOT treated THEN cents END,"
            f" array({', '.join(str(p) for p in probs)}))"
        ).alias("qc"),
    )
    grid = spark.range(1, 10).select(F.col("id").alias("decile"))
    return (
        grid.crossJoin(F.broadcast(q))
        .select(
            F.col("decile").cast("long").alias("decile"),
            F.round(F.element_at("qt", F.col("decile").cast("int")) / 100.0, 6)
            .cast("double")
            .alias("q_treated"),
            F.round(F.element_at("qc", F.col("decile").cast("int")) / 100.0, 6)
            .cast("double")
            .alias("q_control"),
            F.round(
                (
                    F.element_at("qt", F.col("decile").cast("int"))
                    - F.element_at("qc", F.col("decile").cast("int"))
                )
                / 100.0,
                6,
            )
            .cast("double")
            .alias("qte"),
        )
        .orderBy("decile")
    )


@query(
    "kendall_tau_daily",
    oracle="""
WITH daily AS (
  SELECT date_trunc('day', l_shipdate) AS d,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS x,
         CAST(SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS BIGINT) AS y
  FROM lineitem GROUP BY 1
),
agg AS (
  SELECT SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END) AS concordant,
         SUM(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END) AS discordant,
         SUM(CASE WHEN a.x <> b.x THEN 1 ELSE 0 END) AS px,
         SUM(CASE WHEN a.y <> b.y THEN 1 ELSE 0 END) AS py
  FROM daily a JOIN daily b ON a.d < b.d
),
n AS (SELECT count(*) AS n_days FROM daily)
SELECT CAST(n_days AS BIGINT) AS n_days,
       CAST(concordant AS BIGINT) AS concordant,
       CAST(discordant AS BIGINT) AS discordant,
       round((concordant - discordant)
             / sqrt(CAST(px AS DOUBLE) * CAST(py AS DOUBLE)), 6) AS tau_b
FROM agg CROSS JOIN n
""",
)
def q_kendall_tau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KENDALL'S TAU-B between two daily series (shipped quantity vs
    revenue) — the rank-correlation companion to `mann_kendall_trend`
    (which correlates ONE series against time): concordant/discordant
    ordered day pairs with the tie-corrected tau-b denominator
    sqrt(P_x·P_y), where P_x/P_y count pairs distinct in each variable
    (the pairwise-equivalent form of the tie-group formula).  The
    robust "do these two metrics move together" check that Pearson's r
    gets wrong under heavy tails.

    Determinism: daily values are exact integers (quantity units,
    revenue cents), so every comparison, the pair counts, and the
    products are bit-identical across engines; sqrt on an
    exactly-representable integer-valued double is IEEE-correctly
    rounded.  Scale: the O(n²) pair space runs over DAILY AGGREGATES
    (~2.5k rows however many billions feed the groupBy) via the
    broadcast theta-join, same contract as `theil_sen_trend`."""
    li = load_table(spark, sf_dir, "lineitem")
    daily = li.groupBy(F.date_trunc("day", "l_shipdate").alias("d")).agg(
        F.sum(F.col("l_quantity").cast("long")).alias("x"),
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("long")).alias(
            "y"
        ),
    )
    a, b = daily.alias("a"), daily.alias("b")
    agg = a.join(F.broadcast(b), F.col("a.d") < F.col("b.d")).agg(
        F.sum(
            F.when(
                (F.col("a.x") - F.col("b.x")) * (F.col("a.y") - F.col("b.y"))
                > 0,
                1,
            ).otherwise(0)
        ).alias("concordant"),
        F.sum(
            F.when(
                (F.col("a.x") - F.col("b.x")) * (F.col("a.y") - F.col("b.y"))
                < 0,
                1,
            ).otherwise(0)
        ).alias("discordant"),
        F.sum(F.when(F.col("a.x") != F.col("b.x"), 1).otherwise(0)).alias(
            "px"
        ),
        F.sum(F.when(F.col("a.y") != F.col("b.y"), 1).otherwise(0)).alias(
            "py"
        ),
    )
    n = daily.agg(F.count(F.lit(1)).alias("n_days"))
    return agg.crossJoin(F.broadcast(n)).select(
        F.col("n_days").cast("long").alias("n_days"),
        F.col("concordant").cast("long").alias("concordant"),
        F.col("discordant").cast("long").alias("discordant"),
        F.round(
            (F.col("concordant") - F.col("discordant"))
            / F.sqrt(
                F.col("px").cast("double") * F.col("py").cast("double")
            ),
            6,
        ).alias("tau_b"),
    )


@query(
    "cuped_adjusted_ab",
    oracle="""
WITH per_user AS (
  SELECT user_id,
         CAST(user_id % 2 AS BIGINT) AS treated,
         CAST(COALESCE(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                  THEN CAST(round(value * 100, 0) AS BIGINT) END), 0) AS BIGINT) AS x,
         CAST(COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                  THEN CAST(round(value * 100, 0) AS BIGINT) END), 0) AS BIGINT) AS y
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
sums AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(y * y) AS BIGINT) AS syy,
         CAST(SUM(CASE WHEN treated = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
         CAST(SUM(CASE WHEN treated = 1 THEN x ELSE 0 END) AS BIGINT) AS sxt,
         CAST(SUM(CASE WHEN treated = 1 THEN y ELSE 0 END) AS BIGINT) AS syt
  FROM per_user
)
SELECT n AS n_users, nt AS n_treated,
       round((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx), 6) AS theta,
       round(CAST(syt AS DOUBLE) / nt
             - CAST(sy - syt AS DOUBLE) / (n - nt), 4) AS diff_raw_cents,
       round(CAST(syt AS DOUBLE) / nt - CAST(sy - syt AS DOUBLE) / (n - nt)
             - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
               * (CAST(sxt AS DOUBLE) / nt
                  - CAST(sx - sxt AS DOUBLE) / (n - nt)), 4) AS diff_cuped_cents,
       round(100.0 * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   * (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / ((CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
                * (CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)),
             4) AS var_reduction_pct
FROM sums
""",
)
def q_cuped_adjusted_ab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced A/B estimate (Deng et al. 2013, the
    industry-standard experimentation trick): per-user POST-period
    metric Y adjusted by the PRE-period covariate X via
    θ = cov(X,Y)/var(X), reported next to the raw difference and the
    variance reduction ρ²·100 the adjustment buys.  Assignment is the
    deterministic ``user_id % 2`` hash split; the period split is the
    series midpoint.

    Determinism: per-user X/Y are exact integer cents, all moment sums
    (Σx, Σy, Σx², Σxy, Σy², per-arm sums) are exact longs, and θ /
    diff / ρ² are scalar double expressions over those — evaluated
    identically by both engines with zero float accumulation anywhere.
    Scale: one shuffle to per-user aggregates, one combinable moment
    aggregate; the O(1) scalar algebra happens on a one-row frame."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
    )
    cents = F.round(F.col("value") * 100, 0).cast("long")
    split = F.lit("2024-01-16").cast("timestamp")
    per_user = ev.groupBy("user_id").agg(
        F.coalesce(
            F.sum(F.when(F.col("ts") < split, cents)), F.lit(0)
        ).alias("x"),
        F.coalesce(
            F.sum(F.when(F.col("ts") >= split, cents)), F.lit(0)
        ).alias("y"),
    ).withColumn("treated", (F.col("user_id") % 2).cast("long"))
    sums = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.when(F.col("treated") == 1, 1).otherwise(0))
        .cast("long")
        .alias("nt"),
        F.sum(F.when(F.col("treated") == 1, F.col("x")).otherwise(0)).alias(
            "sxt"
        ),
        F.sum(F.when(F.col("treated") == 1, F.col("y")).otherwise(0)).alias(
            "syt"
        ),
    )
    nd = F.col("n").cast("double")
    cov_n = nd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")
    varx_n = nd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx")
    vary_n = nd * F.col("syy") - F.col("sy").cast("double") * F.col("sy")
    theta = cov_n / varx_n
    mean_dy = F.col("syt").cast("double") / F.col("nt") - (
        F.col("sy") - F.col("syt")
    ).cast("double") / (F.col("n") - F.col("nt"))
    mean_dx = F.col("sxt").cast("double") / F.col("nt") - (
        F.col("sx") - F.col("sxt")
    ).cast("double") / (F.col("n") - F.col("nt"))
    return sums.select(
        F.col("n").alias("n_users"),
        F.col("nt").alias("n_treated"),
        F.round(theta, 6).alias("theta"),
        F.round(mean_dy, 4).alias("diff_raw_cents"),
        F.round(mean_dy - theta * mean_dx, 4).alias("diff_cuped_cents"),
        F.round(100.0 * cov_n * cov_n / (varx_n * vary_n), 4).alias(
            "var_reduction_pct"
        ),
    )


#: Vowel-ratio threshold for the McNemar comparison classifier,
#: expressed as an integer cross-multiplication (ratio >= 347/1000).
_VOWEL_NUM, _VOWEL_DEN = 347, 1000

_MC_STOPS = ", ".join(f"'{w}'" for w in _EN_STOPWORDS)


@query(
    "mcnemar_test",
    oracle=f"""
WITH t AS (
  SELECT (lang = 'en') AS truth,
         list_filter(string_split(lower(text), ' '), x -> x <> '') AS ltoks,
         length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS alpha,
         length(regexp_replace(lower(text), '[^aeiou]', '', 'g')) AS vowels
  FROM documents
),
flags AS (
  SELECT ((len(list_filter(ltoks, x -> x IN ({_MC_STOPS}))) * 10
           >= len(ltoks)) = truth) AS a_ok,
         ((vowels * {_VOWEL_DEN} >= {_VOWEL_NUM} * alpha) = truth) AS b_ok
  FROM t
),
cells AS (
  SELECT count(*) AS n_docs,
         SUM(CASE WHEN a_ok THEN 1 ELSE 0 END) AS a_right,
         SUM(CASE WHEN b_ok THEN 1 ELSE 0 END) AS b_right,
         SUM(CASE WHEN a_ok AND NOT b_ok THEN 1 ELSE 0 END) AS n01,
         SUM(CASE WHEN NOT a_ok AND b_ok THEN 1 ELSE 0 END) AS n10
  FROM flags
),
s AS (
  SELECT *,
         round(CASE WHEN n01 + n10 = 0 THEN NULL
               ELSE pow(abs(n01 - n10) - 1.0, 2)
                    / CAST(n01 + n10 AS DOUBLE) END, 6) AS mcnemar_stat
  FROM cells
)
SELECT CAST(n_docs AS BIGINT) AS n_docs,
       round(a_right / CAST(n_docs AS DOUBLE), 6) AS acc_stopword,
       round(b_right / CAST(n_docs AS DOUBLE), 6) AS acc_vowel,
       CAST(n01 AS BIGINT) AS n01,
       CAST(n10 AS BIGINT) AS n10,
       mcnemar_stat,
       round({_pnorm_two_sided("sqrt(mcnemar_stat)")}, 6) AS p_value
FROM s
""",
)
def q_mcnemar_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """McNEMAR'S TEST between two language classifiers on the SAME
    documents — the paired-classifier comparison an eval pipeline runs
    before swapping models (independent-sample accuracy tests are
    WRONG on shared items; McNemar conditions on the discordant pairs
    only): A = the stopword-ratio rule (`text_lang_id`'s decisive
    feature), B = a vowel-letter-frequency rule, truth = the metadata
    ``lang`` label.  Reports both accuracies, the discordant counts
    n01 (A right / B wrong) and n10 (A wrong / B right), the
    continuity-corrected statistic (|n01−n10|−1)²/(n01+n10), and the
    two-sided p via the shared A&S normal-CDF polynomial (χ²(1) ≡ z²).

    Determinism: both decision rules are integer cross-multiplied
    (stops·10 ≥ n_tokens; vowels·1000 ≥ 347·alpha) so no float sits
    under a threshold; the four confusion counts are exact; the p is
    computed FROM the 6-dp-rounded statistic in both engines, so the
    CDF sees identical input.  Scale: one tokenizing scan into a
    4-cell aggregate; everything after is one-row scalar algebra."""
    from ..operators.dedup import tokens_of

    docs = load_table(spark, sf_dir, "documents")
    lt = tokens_of(F.lower(F.col("text")))
    stops = F.size(F.filter(lt, lambda t: t.isin(*_EN_STOPWORDS)))
    alpha = F.length(F.regexp_replace(F.lower(F.col("text")), "[^a-z]", ""))
    vowels = F.length(
        F.regexp_replace(F.lower(F.col("text")), "[^aeiou]", "")
    )
    scored = docs.select(
        (F.col("lang") == "en").alias("truth"),
        (stops * 10 >= F.size(lt)).alias("pred_a"),
        (vowels * _VOWEL_DEN >= _VOWEL_NUM * alpha).alias("pred_b"),
    ).select(
        (F.col("pred_a") == F.col("truth")).alias("a_ok"),
        (F.col("pred_b") == F.col("truth")).alias("b_ok"),
    )
    cells = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.col("a_ok").cast("long")).alias("a_right"),
        F.sum(F.col("b_ok").cast("long")).alias("b_right"),
        F.sum((F.col("a_ok") & ~F.col("b_ok")).cast("long")).alias("n01"),
        F.sum((~F.col("a_ok") & F.col("b_ok")).cast("long")).alias("n10"),
    )
    stat = F.round(
        F.try_divide(
            F.pow(F.abs(F.col("n01") - F.col("n10")) - 1.0, 2),
            (F.col("n01") + F.col("n10")).cast("double"),
        ),
        6,
    )
    withstat = cells.select(
        "n_docs",
        F.round(F.col("a_right") / F.col("n_docs").cast("double"), 6).alias(
            "acc_stopword"
        ),
        F.round(F.col("b_right") / F.col("n_docs").cast("double"), 6).alias(
            "acc_vowel"
        ),
        "n01",
        "n10",
        stat.alias("mcnemar_stat"),
    )
    return withstat.withColumn(
        "p_value",
        F.round(F.expr(_pnorm_two_sided("sqrt(mcnemar_stat)")), 6),
    )


# ------------------------------------------ causal / agreement (r11) ----


@query(
    "did_revenue_estimate",
    oracle="""
WITH cutoff AS (
  SELECT (epoch_us(min(o_orderdate)) + epoch_us(max(o_orderdate))) // 2
           AS mid_us
  FROM orders
),
tagged AS (
  SELECT (c.c_nationkey < 12) AS treat,
         (epoch_us(o.o_orderdate) >= mid_us) AS post,
         CAST(round(o.o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  CROSS JOIN cutoff
),
cells AS (
  SELECT
    SUM(CASE WHEN treat AND post THEN 1 ELSE 0 END) AS n11,
    SUM(CASE WHEN treat AND NOT post THEN 1 ELSE 0 END) AS n10,
    SUM(CASE WHEN NOT treat AND post THEN 1 ELSE 0 END) AS n01,
    SUM(CASE WHEN NOT treat AND NOT post THEN 1 ELSE 0 END) AS n00,
    SUM(CASE WHEN treat AND post THEN cents ELSE 0 END) AS s11,
    SUM(CASE WHEN treat AND NOT post THEN cents ELSE 0 END) AS s10,
    SUM(CASE WHEN NOT treat AND post THEN cents ELSE 0 END) AS s01,
    SUM(CASE WHEN NOT treat AND NOT post THEN cents ELSE 0 END) AS s00
  FROM tagged
)
SELECT CAST(n11 AS BIGINT) AS n_treat_post,
       CAST(n10 AS BIGINT) AS n_treat_pre,
       CAST(n01 AS BIGINT) AS n_ctrl_post,
       CAST(n00 AS BIGINT) AS n_ctrl_pre,
       round(s11 / CAST(n11 AS DOUBLE), 6) AS mean_treat_post,
       round(s10 / CAST(n10 AS DOUBLE), 6) AS mean_treat_pre,
       round(s01 / CAST(n01 AS DOUBLE), 6) AS mean_ctrl_post,
       round(s00 / CAST(n00 AS DOUBLE), 6) AS mean_ctrl_pre,
       round((s11 / CAST(n11 AS DOUBLE) - s10 / CAST(n10 AS DOUBLE))
             - (s01 / CAST(n01 AS DOUBLE) - s00 / CAST(n00 AS DOUBLE)),
             6) AS did_cents
FROM cells
""",
)
def q_did_revenue_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES: the 2x2 pre/post x treat/control
    estimator — the workhorse for launches that hit a cohort at a
    known time with no randomization (a naive post-period comparison
    confounds the launch with whatever both arms drifted by; DiD
    nets the common trend out).  Treatment = customers in nations
    0-11, the period break = the integer midpoint of the order-date
    range (so the query is self-contained at every SF), outcome =
    order value in cents.

    Determinism: the cutoff is integer microseconds ((min+max) div 2
    — no float date math), the eight cell statistics are exact
    conditional longs from ONE aggregate, and the estimate is
    assembled from the four means with the identical expression tree
    in both engines before a single 6-dp round.  Scale: the customer
    dim broadcasts; the fact scan reduces map-side to one 8-number
    row — no shuffle wider than the broadcast join."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", (F.col("c_nationkey") < 12).alias("treat")
    )
    # o_orderdate is TIMESTAMP_NTZ in the parquet; the session runs
    # UTC so the cast is a wall-clock identity in both engines
    od = F.col("o_orderdate").cast("timestamp")
    bounds = orders.agg(
        F.expr(
            "(unix_micros(CAST(min(o_orderdate) AS TIMESTAMP))"
            " + unix_micros(CAST(max(o_orderdate) AS TIMESTAMP))) div 2"
        ).alias("mid_us")
    )
    tagged = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .crossJoin(F.broadcast(bounds))
        .select(
            "treat",
            (F.unix_micros(od) >= F.col("mid_us")).alias("post"),
            F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        )
    )
    t, p = F.col("treat"), F.col("post")
    cells = tagged.agg(
        F.sum((t & p).cast("long")).alias("n11"),
        F.sum((t & ~p).cast("long")).alias("n10"),
        F.sum((~t & p).cast("long")).alias("n01"),
        F.sum((~t & ~p).cast("long")).alias("n00"),
        F.sum(F.when(t & p, F.col("cents")).otherwise(0)).alias("s11"),
        F.sum(F.when(t & ~p, F.col("cents")).otherwise(0)).alias("s10"),
        F.sum(F.when(~t & p, F.col("cents")).otherwise(0)).alias("s01"),
        F.sum(F.when(~t & ~p, F.col("cents")).otherwise(0)).alias("s00"),
    )
    m = {
        k: F.col(f"s{k}") / F.col(f"n{k}").cast("double")
        for k in ("11", "10", "01", "00")
    }
    return cells.select(
        F.col("n11").alias("n_treat_post"),
        F.col("n10").alias("n_treat_pre"),
        F.col("n01").alias("n_ctrl_post"),
        F.col("n00").alias("n_ctrl_pre"),
        F.round(m["11"], 6).alias("mean_treat_post"),
        F.round(m["10"], 6).alias("mean_treat_pre"),
        F.round(m["01"], 6).alias("mean_ctrl_post"),
        F.round(m["00"], 6).alias("mean_ctrl_pre"),
        F.round((m["11"] - m["10"]) - (m["01"] - m["00"]), 6).alias(
            "did_cents"
        ),
    )


@query(
    "ipw_ate_stratified",
    oracle="""
WITH spend AS (
  SELECT c.c_custkey, c.c_mktsegment AS segment,
         (c.c_nationkey % 2 = 0) AS treat,
         COALESCE(SUM(CAST(round(o.o_totalprice * 100, 0) AS BIGINT)), 0)
           AS cents
  FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2, 3
),
cells AS (
  SELECT segment,
         SUM(CASE WHEN treat THEN 1 ELSE 0 END) AS n_t,
         SUM(CASE WHEN NOT treat THEN 1 ELSE 0 END) AS n_c,
         SUM(CASE WHEN treat THEN cents ELSE 0 END) AS s_t,
         SUM(CASE WHEN NOT treat THEN cents ELSE 0 END) AS s_c
  FROM spend GROUP BY segment
),
seg AS (
  SELECT segment, n_t, n_c,
         round(s_t / CAST(n_t AS DOUBLE), 6) AS m_t,
         round(s_c / CAST(n_c AS DOUBLE), 6) AS m_c,
         round(s_t / CAST(n_t AS DOUBLE) - s_c / CAST(n_c AS DOUBLE), 6)
           AS diff
  FROM cells
),
overall AS (
  SELECT 'OVERALL' AS segment,
         SUM(n_t) AS n_t, SUM(n_c) AS n_c,
         round(SUM(s_t) / CAST(SUM(n_t) AS DOUBLE), 6) AS m_t,
         round(SUM(s_c) / CAST(SUM(n_c) AS DOUBLE), 6) AS m_c,
         round(CAST(SUM(CAST(round(s_t / CAST(n_t AS DOUBLE)
                                   - s_c / CAST(n_c AS DOUBLE), 6)
                             AS DECIMAL(24,6)) * (n_t + n_c)) AS DOUBLE)
               / SUM(n_t + n_c), 6) AS diff
  FROM cells
)
SELECT segment, CAST(n_t AS BIGINT) AS n_treat, CAST(n_c AS BIGINT) AS n_ctrl,
       m_t AS mean_treat_cents, m_c AS mean_ctrl_cents, diff AS diff_cents
FROM (SELECT * FROM seg UNION ALL SELECT * FROM overall)
ORDER BY segment
""",
)
def q_ipw_ate_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STRATIFIED (subclassification) average-treatment-effect — the
    propensity-bucket estimator run when arms are imbalanced across a
    confounder: per market segment, the treated-vs-control mean spend
    difference; the OVERALL row reweights those per-stratum
    differences by stratum size, Sum n_s*diff_s / N, which differs
    from the naive overall mean gap (also shown in its mean columns)
    exactly when segment mix differs across arms — the confounding
    the adjustment removes.  Treatment = even nation key; outcome =
    lifetime order value in cents (customers with no orders count 0).

    Determinism: all cell statistics are exact conditional longs; the
    per-stratum diffs are rounded to 6 dp and re-enter the OVERALL
    estimate as DECIMAL(24,6) x integer products summed decimal
    (order-free), so the 5-term reweighting can never see float
    summation order.  Scale: one equi-join shuffle (orders pre-
    aggregated per customer map-side), then a 5x4-cell aggregate;
    the OVERALL row folds the 5-row frame, never row data."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        (F.col("c_nationkey") % 2 == 0).alias("treat"),
    )
    per_order = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    spend = (
        cust.join(per_order, cust.c_custkey == per_order.o_custkey, "left")
        .groupBy("c_custkey", "segment", "treat")
        .agg(F.coalesce(F.sum("cents"), F.lit(0)).alias("cents"))
    )
    t = F.col("treat")
    cells = spend.groupBy("segment").agg(
        F.sum(t.cast("long")).alias("n_t"),
        F.sum((~t).cast("long")).alias("n_c"),
        F.sum(F.when(t, F.col("cents")).otherwise(0)).alias("s_t"),
        F.sum(F.when(~t, F.col("cents")).otherwise(0)).alias("s_c"),
    )
    m_t = F.col("s_t") / F.col("n_t").cast("double")
    m_c = F.col("s_c") / F.col("n_c").cast("double")
    seg = cells.select(
        "segment",
        F.col("n_t").alias("n_treat"),
        F.col("n_c").alias("n_ctrl"),
        F.round(m_t, 6).alias("mean_treat_cents"),
        F.round(m_c, 6).alias("mean_ctrl_cents"),
        F.round(m_t - m_c, 6).alias("diff_cents"),
    )
    overall = cells.agg(
        F.sum("n_t").alias("n_t"),
        F.sum("n_c").alias("n_c"),
        F.sum("s_t").alias("s_t"),
        F.sum("s_c").alias("s_c"),
        F.sum(
            F.expr(
                "CAST(round(s_t / CAST(n_t AS DOUBLE)"
                "           - s_c / CAST(n_c AS DOUBLE), 6)"
                "     AS DECIMAL(24,6)) * (n_t + n_c)"
            )
        ).alias("wsum"),
        F.sum(F.col("n_t") + F.col("n_c")).alias("n_all"),
    ).select(
        F.lit("OVERALL").alias("segment"),
        F.col("n_t").alias("n_treat"),
        F.col("n_c").alias("n_ctrl"),
        F.round(F.col("s_t") / F.col("n_t").cast("double"), 6).alias(
            "mean_treat_cents"
        ),
        F.round(F.col("s_c") / F.col("n_c").cast("double"), 6).alias(
            "mean_ctrl_cents"
        ),
        F.round(F.col("wsum").cast("double") / F.col("n_all"), 6).alias(
            "diff_cents"
        ),
    )
    return seg.unionByName(overall).orderBy("segment")


@query(
    "fleiss_kappa_ratings",
    oracle="""
WITH ratings AS (
  SELECT doc_id,
         CASE WHEN n_chars
                   + (CAST(concat('0x', substr(md5(concat(doc_id, '#', r)),
                                  1, 8)) AS BIGINT) % 241) - 120 < 220 THEN 0
              WHEN n_chars
                   + (CAST(concat('0x', substr(md5(concat(doc_id, '#', r)),
                                  1, 8)) AS BIGINT) % 241) - 120 < 380 THEN 1
              ELSE 2 END AS cat
  FROM documents, (SELECT unnest([0, 1, 2]) AS r)
),
ndc AS (
  SELECT doc_id, cat, count(*) AS cnt FROM ratings GROUP BY 1, 2
),
subj AS (
  SELECT count(DISTINCT doc_id) AS n, SUM(cnt * cnt) AS a FROM ndc
),
cols AS (
  SELECT SUM(CAST(round(pc * pc, 12) AS DECIMAL(16,12))) AS pe_dec
  FROM (SELECT SUM(cnt) / CAST(3 * (SELECT n FROM subj) AS DOUBLE) AS pc
        FROM ndc GROUP BY cat)
)
SELECT CAST(n AS BIGINT) AS n_subjects,
       CAST(3 AS INTEGER) AS n_raters,
       round((a - n * 3) / CAST(n * 3 * 2 AS DOUBLE), 6) AS p_agree,
       round(CAST(pe_dec AS DOUBLE), 6) AS p_chance,
       round(((a - n * 3) / CAST(n * 3 * 2 AS DOUBLE)
              - CAST(pe_dec AS DOUBLE))
             / (1 - CAST(pe_dec AS DOUBLE)), 6) AS kappa
FROM subj CROSS JOIN cols
""",
)
def q_fleiss_kappa_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FLEISS' KAPPA — chance-corrected agreement among m>2 raters,
    the multi-annotator generalization `cohens_kappa_langid`'s paired
    form cannot express (labeling pipelines routinely run 3+ human or
    model judges per item and gate on kappa before training on the
    labels).  Three deterministic synthetic raters each bucket a
    document into short/medium/long after a rater-specific md5 jitter
    of +-120 chars on the length — near-boundary documents draw
    disagreement exactly like real annotators.

    kappa = (P_bar - P_e)/(1 - P_e) with P_bar from A = Sum n_dc^2
    (n_dc <= m, so A <= m^2 N stays exact long at any N) and
    P_e = Sum p_c^2 with each squared share rounded to 12 dp and
    summed as DECIMAL(16,12) — order-free, so the 3-term sum can
    never see float ordering; both engines then run the identical
    one-row kappa expression.  Scale: explode x3, one (doc,cat)
    aggregate, one 3-row column aggregate — all partial-aggregatable,
    no windows, no collect."""
    docs = load_table(spark, sf_dir, "documents")
    jitter = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("doc_id").cast("string"),
                        F.lit("#"),
                        F.col("r").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 241
        - 120
    )
    jittered = F.col("n_chars") + jitter
    ratings = docs.select(
        "doc_id", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2))).alias("r"),
        "n_chars",
    ).select(
        "doc_id",
        F.when(jittered < 220, 0).when(jittered < 380, 1).otherwise(2).alias(
            "cat"
        ),
    )
    ndc = ratings.groupBy("doc_id", "cat").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    subj = ndc.agg(
        F.countDistinct("doc_id").alias("n"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("a"),
    )
    cols = (
        ndc.groupBy("cat")
        .agg(F.sum("cnt").alias("tc"))
        .crossJoin(F.broadcast(subj.select("n")))
        .select(
            (F.col("tc") / (F.lit(3) * F.col("n")).cast("double")).alias("pc")
        )
        .agg(
            F.sum(
                F.expr("CAST(round(pc * pc, 12) AS DECIMAL(16,12))")
            ).alias("pe_dec")
        )
    )
    pbar = (F.col("a") - F.col("n") * 3) / (F.col("n") * 6).cast("double")
    pe = F.col("pe_dec").cast("double")
    return subj.crossJoin(F.broadcast(cols)).select(
        F.col("n").alias("n_subjects"),
        F.lit(3).cast("int").alias("n_raters"),
        F.round(pbar, 6).alias("p_agree"),
        F.round(pe, 6).alias("p_chance"),
        F.round((pbar - pe) / (F.lit(1) - pe), 6).alias("kappa"),
    )
