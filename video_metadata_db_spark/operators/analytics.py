"""Reusable analytic operators: 2-D Pareto frontier (skyline) and the
interval-sweep peak-concurrency operator.

Neither exists in the reference (video_metadata_db.py's reporting stops
at group/sort/top-k); both are standard OLAP extension shapes a
metadata lake's analytics layer needs, implemented as compositions of
built-in DataFrame ops with an eye on the 100 TB plan:

- the skyline avoids the textbook single-reducer global sort via a
  lossless two-level bucket prune (see :func:`pareto_frontier_2d`);
- the concurrency sweep pre-aggregates endpoint deltas per instant so
  the per-key running sum runs over distinct instants, not raw
  endpoints (see :func:`peak_concurrency`).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def round_half_away(v: float, nd: int) -> float:
    """Half-away-from-zero rounding to ``nd`` decimals, matching DuckDB
    ``round()`` and Spark ``F.round`` (both HALF_UP on the shortest
    decimal representation) rather than Python's banker's ``round()``.
    Quantizing ``Decimal(repr(v))`` reproduces exactly what both
    engines see for a double landing on a decimal tie.
    """
    q = Decimal(1).scaleb(-nd)
    return float(Decimal(repr(v)).quantize(q, rounding=ROUND_HALF_UP))


def pareto_frontier_2d(
    pts: DataFrame,
    minimize: str,
    maximize: str,
    *,
    n_buckets: int = 32,
) -> DataFrame:
    """Distinct (minimize, maximize) pairs on the Pareto frontier:
    no returned pair is beaten on BOTH axes (≤ on ``minimize``, ≥ on
    ``maximize``, strict on at least one) by any input pair.  Both
    columns must be integer-comparable (exact dominance — callers
    convert prices to cents first).

    The textbook single-pass skyline is a GLOBAL window (sort by
    minimize asc / maximize desc; a point is dominated iff the running
    max of ``maximize`` over strictly-preceding rows ≥ its own) — a
    one-reducer sort at corpus scale.  This is the lossless two-level
    version: (1) distinct pairs are range-bucketed on ``minimize``
    (``n_buckets`` equi-width integer buckets from one broadcast
    min/max aggregate); (2) the window rule runs PER BUCKET — full
    parallelism — pruning everything dominated within its bucket
    (lossless: a same-bucket dominator is still a dominator); (3) the
    same rule runs once over the survivors, a frame bounded by
    Σ per-bucket frontier sizes, not the corpus.  Transitivity makes
    the survivor pass exact: any pruned dominator is itself dominated
    by a surviving frontier point, which precedes the pruned point in
    the global order.
    """
    pts = pts.select(
        F.col(minimize).alias("_min"), F.col(maximize).alias("_max")
    ).distinct()
    bounds = pts.agg(F.min("_min").alias("lo"), F.max("_min").alias("hi"))
    bucketed = pts.crossJoin(F.broadcast(bounds)).select(
        "_min",
        "_max",
        F.least(
            F.expr(f"((_min - lo) * {n_buckets}) div (hi - lo + 1)"),
            F.lit(n_buckets - 1),
        ).alias("bucket"),
    )
    local_prev = (
        Window.partitionBy("bucket")
        .orderBy(F.col("_min").asc(), F.col("_max").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    survivors = (
        bucketed.withColumn("lmax", F.max("_max").over(local_prev))
        .filter(F.col("lmax").isNull() | (F.col("lmax") < F.col("_max")))
        .select("_min", "_max")
    )
    global_prev = Window.orderBy(
        F.col("_min").asc(), F.col("_max").desc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    return (
        survivors.withColumn("gmax", F.max("_max").over(global_prev))
        .filter(F.col("gmax").isNull() | (F.col("gmax") < F.col("_max")))
        .select(F.col("_min").alias(minimize), F.col("_max").alias(maximize))
    )


def peak_concurrency(
    intervals: DataFrame,
    group: str,
    start: str,
    end: str,
) -> DataFrame:
    """Per-group maximum number of simultaneously-open HALF-OPEN
    intervals ``[start, end)`` and the first instant it is reached:
    ``(group, peak_concurrent, first_peak_ts)``.

    The +1/−1 endpoint sweep: starts emit +1, ends emit −1; net deltas
    are PRE-AGGREGATED per (group, instant) — a partial-aggregatable
    shuffle collapsing the 2·n endpoint stream to distinct instants
    BEFORE any window — then one running sum per group yields the
    concurrency step function, whose max is the peak.  The half-open
    convention (an interval ending at t does not overlap one starting
    at t) is encoded by the per-instant netting itself.  The window
    partitions on ``group``: bounded key cardinality means each
    partition is one executor's sequential pass; at corpus scale,
    sub-split the sweep by (group, day) and carry each day's closing
    sum forward — the same two-pass distributed prefix sum as
    ``operators/packing.py``.
    """
    iv = intervals.select(
        F.col(group).alias("g"), F.col(start).alias("s"), F.col(end).alias("e")
    )
    pts = iv.select("g", F.col("s").alias("t"), F.lit(1).alias("delta")).unionByName(
        iv.select("g", F.col("e").alias("t"), F.lit(-1).alias("delta"))
    )
    net = pts.groupBy("g", "t").agg(F.sum("delta").alias("net"))
    w_run = (
        Window.partitionBy("g")
        .orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = net.select("g", "t", F.sum("net").over(w_run).alias("conc"))
    pk = run.select(
        "g", "t", "conc", F.max("conc").over(Window.partitionBy("g")).alias("peak")
    )
    return (
        pk.filter(F.col("conc") == F.col("peak"))
        .groupBy("g", "peak")
        .agg(F.min("t").alias("first_peak_ts"))
        .select(
            F.col("g").alias(group),
            F.col("peak").cast("long").alias("peak_concurrent"),
            "first_peak_ts",
        )
    )


def two_sample_rank_counts(
    df: DataFrame,
    value_col: str,
    group_col: str,
    label_a: str,
    label_b: str,
    *,
    num_ranges: int = 32,
) -> DataFrame:
    """Distinct-value counts and INCLUSIVE cumulative counts for two
    samples pooled on one integer-comparable value column — the shared
    substrate of the exact rank statistics (Kolmogorov–Smirnov D,
    Mann–Whitney U / AUC): both need, at every distinct value ``v``,
    how many sample-A and sample-B observations are ``≤ v``.

    Output: ``(value_col, cnt_a, cnt_b, cum_a, cum_b)`` — one row per
    distinct value present in either sample.

    Scale shape: the raw stream first collapses to DISTINCT VALUE level
    with one partial-aggregatable shuffle (map-side combine on the
    value key), so everything after runs on ``|distinct values|`` rows,
    not corpus rows.  The cumulative sums then use the same
    literal-boundary two-pass prefix sum as ``operators/packing.py``
    (never a single-reducer global window): range boundaries come from
    one tiny driver-side ``percentile_approx`` collect over the RAW
    value stream (approximate boundaries only affect bucket balance,
    never correctness — the bucket test is strict-less-than, so equal
    values always share a bucket), per-range totals get their running
    offset on a ≤ ``num_ranges``-row window, and within-range windows
    run fully parallel.  BOTH samples' prefixes ride ONE pass — the
    per-range totals aggregate and the in-range window each carry two
    sum expressions.
    """
    tagged = df.filter(F.col(group_col).isin([label_a, label_b])).select(
        F.col(value_col).alias("_v"),
        F.when(F.col(group_col) == label_a, 1).otherwise(0).alias("_fa"),
        F.when(F.col(group_col) == label_b, 1).otherwise(0).alias("_fb"),
    )
    per = tagged.groupBy("_v").agg(
        F.sum("_fa").alias("cnt_a"), F.sum("_fb").alias("cnt_b")
    )

    probs = [i / num_ranges for i in range(1, num_ranges)]
    bounds = (
        tagged.select(F.percentile_approx("_v", probs, 10_000).alias("b")).first()["b"]
        if probs
        else None
    ) or []
    if bounds:
        bucket = F.size(F.filter(F.lit(list(bounds)), lambda b: b < F.col("_v")))
    else:
        bucket = F.lit(0)
    with_pid = per.withColumn("_pid", bucket.cast("int"))

    totals = with_pid.groupBy("_pid").agg(
        F.sum("cnt_a").alias("_ta"), F.sum("cnt_b").alias("_tb")
    )
    off_w = (
        Window.partitionBy(F.lit(1))
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "_pid",
        F.coalesce(F.sum("_ta").over(off_w), F.lit(0)).cast("long").alias("_oa"),
        F.coalesce(F.sum("_tb").over(off_w), F.lit(0)).cast("long").alias("_ob"),
    )
    in_w = (
        Window.partitionBy("_pid")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        with_pid.join(F.broadcast(offsets), "_pid")
        .select(
            F.col("_v").alias(value_col),
            "cnt_a",
            "cnt_b",
            (F.col("_oa") + F.sum("cnt_a").over(in_w)).cast("long").alias("cum_a"),
            (F.col("_ob") + F.sum("cnt_b").over(in_w)).cast("long").alias("cum_b"),
        )
    )


def theil_sen(points: DataFrame, x: str = "x", y: str = "y") -> DataFrame:
    """Theil–Sen estimator over a POINTS frame (columns ``x``, ``y``):
    slope = median of all pairwise slopes, intercept = median of
    ``y − slope·x`` residuals (slope rounded to 6 dp before reuse so a
    libm ulp can never leak into the residual ranking).  Returns one
    row ``(n_points, theil_slope, theil_intercept, ols_slope)`` — the
    OLS slope rides along as the outlier diagnostic.

    Scale contract: callers aggregate to model-sized points FIRST
    (days, buckets, groups — thousands, not rows), so the O(n²) pair
    space is a broadcast nested-loop join over a frame that fits in a
    single executor's cache; the medians are single aggregates.  The
    29% breakdown point is the reason this exists next to
    ``regr_slope``: one corrupted day drags OLS, not the pair median.
    """
    pts = points.select(F.col(x).cast("double").alias("x"),
                        F.col(y).cast("double").alias("y"))
    a, b = pts.alias("a"), pts.alias("b")
    # try_divide, not `/`: the a.x < b.x join guard makes the divisor
    # nonzero on every SURVIVING pair, but Catalyst may fold a
    # downstream null-filter into the join condition and evaluate the
    # division before the guard — under ANSI mode a plain `/` then
    # throws DIVIDE_BY_ZERO on the pairs the guard was about to drop
    slopes = a.join(F.broadcast(b), F.col("a.x") < F.col("b.x")).select(
        F.try_divide(
            F.col("b.y") - F.col("a.y"), F.col("b.x") - F.col("a.x")
        ).alias("slope")
    )
    # the slope median runs over O(points**2) values — the exact-kth
    # selection path (exact_median) instead of the `percentile`
    # aggregate, whose single-reducer counts-map merge measured 12.8 s
    # on 2.9M slopes vs ~2 s for the selection.  Quantized
    # half-away-from-zero (not Python banker's round) so a 6-dp tie
    # matches the DuckDB/Spark round() the oracle applies.
    med = exact_median(slopes, "slope")
    if med is None:  # < 2 distinct x values: no pairwise slope exists
        # var_pop(x) is exactly 0.0 on this branch (single distinct x),
        # so a plain division throws DIVIDE_BY_ZERO under ANSI mode —
        # try_divide yields the null ols_slope the degenerate row wants
        # (ADVICE r9, consistent with the slopes-join try_divide above).
        return pts.agg(
            F.count(F.lit(1)).cast("long").alias("n_points"),
            F.lit(None).cast("double").alias("theil_slope"),
            F.lit(None).cast("double").alias("theil_intercept"),
            F.round(
                F.try_divide(F.covar_pop("y", "x"), F.var_pop("x")), 6
            ).alias("ols_slope"),
        )
    slope = round_half_away(med, 6)
    return pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.lit(slope).alias("theil_slope"),
        F.round(
            F.expr(f"percentile(y - {slope!r} * x, 0.5)"), 6
        ).alias("theil_intercept"),
        F.round(F.covar_pop("y", "x") / F.var_pop("x"), 6).alias("ols_slope"),
    )


def exact_median(df: DataFrame, col: str, num_ranges: int = 32) -> float | None:
    """Exact interpolated median of one column, computed WITHOUT the
    single-reducer ``percentile`` aggregate (whose counts-map merge is
    the bottleneck past ~1M distinct values: measured 12.8 s on 2.9M
    Theil-Sen slopes where this path takes ~2 s).

    Selection shape: persist the value column once, range-bucket it by
    approximate quantile boundaries (driver sees only the <=31
    boundaries and <=32 bucket counts — never row data), locate the
    bucket(s) holding the two middle order statistics, and sort ONLY
    those buckets (~n/num_ranges rows each) to read the values out.
    Ties are safe: equal values always share a bucket (strict-< bucket
    test) and the value at any rank inside a tie run is the tie value
    regardless of arbitrary order.  Median = mean of the k1=(n+1)//2,
    k2=(n+2)//2 order statistics — definitionally equal to linear
    interpolation at p=0.5 (DuckDB ``quantile_cont`` / Spark
    ``percentile``), so oracle parity is preserved.  NULLs are dropped
    up front (matching the ``percentile`` aggregate this replaces —
    without the filter they would inflate ``n`` and sort first).
    """
    vals = (
        df.select(F.col(col).alias("_v"))
        .filter(F.col("_v").isNotNull())
        .persist()
    )
    try:
        n = vals.count()
        if n == 0:
            return None
        k1, k2 = (n + 1) // 2, (n + 2) // 2
        probs = [i / num_ranges for i in range(1, num_ranges)]
        bounds = (
            vals.select(
                F.percentile_approx("_v", probs, 10_000).alias("b")
            ).first()["b"]
            or []
        )
        if bounds:
            bucket = F.size(
                F.filter(F.lit(list(bounds)), lambda b: b < F.col("_v"))
            )
        else:
            bucket = F.lit(0)
        wb = vals.withColumn("_pid", bucket.cast("int"))
        cnts = {
            r["_pid"]: r["c"]
            for r in wb.groupBy("_pid")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        acc, wanted = 0, {}
        for pid in sorted(cnts):
            for k in (k1, k2):
                if acc < k <= acc + cnts[pid]:
                    wanted.setdefault(pid, set()).add(k - acc)
            acc += cnts[pid]
        w = Window.partitionBy("_pid").orderBy("_v")
        sel = (
            wb.filter(F.col("_pid").isin(list(wanted)))
            .withColumn("_rn", F.row_number().over(w))
        )
        cond = None
        for pid, ks in wanted.items():
            c = (F.col("_pid") == pid) & F.col("_rn").isin(list(ks))
            cond = c if cond is None else (cond | c)
        rows = sel.filter(cond).select("_v").collect()
        vs = sorted(r["_v"] for r in rows)
        if k1 == k2:
            return vs[0]
        return (vs[0] + vs[1]) / 2
    finally:
        vals.unpersist()
