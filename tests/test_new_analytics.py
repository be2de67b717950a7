"""Unit tests for the analytics batch: degree-oriented triangle
counting, the two-level Pareto skyline, the interval-concurrency sweep,
and the chi-square independence statistic.

(The full value oracles run in test_registry_queries.py; these pin the
ALGORITHMIC properties a hash compare can't articulate — orientation
correctness vs brute force, skyline losslessness under bucketing,
half-open abutment semantics, and the chi² = 0 fixed point.)
"""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from video_metadata_db_spark.operators.analytics import (
    pareto_frontier_2d,
    peak_concurrency,
)
from video_metadata_db_spark.operators.graph import triangle_counts
from video_metadata_db_spark.plans import QUERIES

# ------------------------------------------------- triangle counting ---


def _tri(spark, edges):
    rows = triangle_counts(
        spark.createDataFrame(edges, "s1 long, s2 long")
    ).collect()
    return {r["node"]: (r["degree"], r["n_triangles"], r["clustering"]) for r in rows}


def test_triangles_k4_all_closed(spark):
    """K4: every node has degree 3, sits in C(3,2)=3 triangles, and has
    clustering exactly 1.0."""
    k4 = [(a, b) for a, b in itertools.combinations(range(4), 2)]
    got = _tri(spark, k4)
    assert got == {i: (3, 3, 1.0) for i in range(4)}


def test_triangles_path_has_none(spark):
    """A path graph is triangle-free; degree-1 endpoints get clustering
    0.0 (not a division error)."""
    got = _tri(spark, [(0, 1), (1, 2), (2, 3)])
    assert got == {0: (1, 0, 0.0), 1: (2, 0, 0.0), 2: (2, 0, 0.0), 3: (1, 0, 0.0)}


def test_triangles_star_plus_chord(spark):
    """Star 0–{1,2,3} plus chord (1,2): exactly one triangle {0,1,2}.
    Hub clustering = 2·1/(3·2) = 1/3; chord endpoints = 1.0; the
    untouched leaf 3 stays at zero."""
    got = _tri(spark, [(0, 1), (0, 2), (0, 3), (1, 2)])
    assert got == {
        0: (3, 1, 0.333333),
        1: (2, 1, 1.0),
        2: (2, 1, 1.0),
        3: (1, 0, 0.0),
    }


def test_triangles_match_brute_force_on_random_graphs(spark):
    """Degree-oriented enumeration must agree with the O(n³) definition
    on seeded random graphs — including hub-heavy ones where the
    orientation actually reorders most wedges."""
    for seed, n, p in ((1, 12, 0.4), (2, 16, 0.25), (3, 10, 0.7)):
        rng = random.Random(seed)
        edges = [
            (a, b)
            for a, b in itertools.combinations(range(n), 2)
            if rng.random() < p
        ]
        adj = {i: set() for i in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        expect = {}
        for v in range(n):
            if not adj[v]:
                continue  # isolated nodes never appear in an edge list
            t = sum(
                1
                for x, y in itertools.combinations(sorted(adj[v]), 2)
                if y in adj[x]
            )
            d = len(adj[v])
            c = round(2.0 * t / (d * (d - 1)), 6) if d >= 2 else 0.0
            expect[v] = (d, t, c)
        assert _tri(spark, edges) == expect, f"seed {seed}"


# ------------------------------------------------------- 2-D skyline ---


def _brute_frontier(pts):
    s = set(pts)
    return sorted(
        (x, y)
        for x, y in s
        if not any(
            (bx <= x and by >= y and (bx < x or by > y)) for bx, by in s
        )
    )


def _spark_frontier(spark, pts, n_buckets=32):
    df = spark.createDataFrame(pts, "c long, v long")
    got = pareto_frontier_2d(df, "c", "v", n_buckets=n_buckets).collect()
    return sorted((r["c"], r["v"]) for r in got)


def test_skyline_matches_brute_force(spark):
    """Two-level bucketed skyline == the dominance definition on seeded
    point sets with heavy duplicate/tie pressure (small integer domains
    force equal-coordinate edge cases)."""
    for seed in (7, 8, 9):
        rng = random.Random(seed)
        pts = [(rng.randrange(20), rng.randrange(20)) for _ in range(300)]
        assert _spark_frontier(spark, pts) == _brute_frontier(pts), f"seed {seed}"


def test_skyline_bucket_count_is_semantically_invisible(spark):
    """The bucket count is a parallelism knob, never a semantics knob:
    1 bucket (pure global pass) and 64 buckets (every point nearly
    alone) must return the identical frontier."""
    rng = random.Random(42)
    pts = [(rng.randrange(1000), rng.randrange(1000)) for _ in range(500)]
    expect = _brute_frontier(pts)
    assert _spark_frontier(spark, pts, n_buckets=1) == expect
    assert _spark_frontier(spark, pts, n_buckets=64) == expect


def test_skyline_degenerate_single_point(spark):
    """All-identical points collapse to one frontier row (duplicates
    must not survive distinct, nor dominate each other)."""
    assert _spark_frontier(spark, [(5, 5)] * 10) == [(5, 5)]


# ------------------------------------------------- concurrency sweep ---


def _peaks(spark, intervals):
    df = spark.createDataFrame(intervals, "g string, s long, e long")
    rows = peak_concurrency(df, "g", "s", "e").collect()
    return {r["g"]: (r["peak_concurrent"], r["first_peak_ts"]) for r in rows}


def test_concurrency_half_open_abutment(spark):
    """[0,10) and [10,20) do NOT overlap under the half-open
    convention: the end at 10 nets against the start at 10."""
    assert _peaks(spark, [("a", 0, 10), ("a", 10, 20)]) == {"a": (1, 0)}


def test_concurrency_nesting_and_first_instant(spark):
    """An umbrella interval plus two disjoint inner ones peaks at 2,
    first reached when the FIRST inner interval opens."""
    iv = [("a", 0, 100), ("a", 30, 40), ("a", 10, 20)]
    assert _peaks(spark, iv) == {"a": (2, 10)}


def test_concurrency_identical_intervals_stack(spark):
    """k copies of the same interval reach concurrency k at its start;
    groups are independent."""
    iv = [("a", 5, 9)] * 3 + [("b", 0, 1)]
    assert _peaks(spark, iv) == {"a": (3, 5), "b": (1, 0)}


# -------------------------------------------- chi-square independence ---


def test_chi_square_zero_on_product_table(spark, tmp_path):
    """A contingency table in exact product form (cell = row·col/N) is
    the independence fixed point: chi² and Cramér's V must both be
    exactly 0.0 — any nonzero here is an arithmetic bug, not noise."""
    rows = (
        [("A", "X")] * 6 + [("A", "Y")] * 2 + [("B", "X")] * 3 + [("B", "Y")] * 1
    )
    sf = str(tmp_path)
    spark.createDataFrame(
        rows, "o_orderstatus string, o_orderpriority string"
    ).write.parquet(f"{sf}/orders.parquet")
    got = QUERIES["chi_square_independence"](spark, sf).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["n_orders"], r["n_statuses"], r["n_priorities"], r["dof"]) == (
        12,
        2,
        2,
        1,
    )
    assert r["chi2"] == 0.0
    assert r["cramers_v"] == 0.0


# ------------------------------- CMS / funnel / seasonal / paths ----


def test_cms_overestimate_is_one_sided(spark):
    """Count-min can only OVER-estimate: every audited heavy hitter's
    sketch estimate must be ≥ its exact count (the defining CMS
    invariant; a single negative overestimate means a hash/bucket/min
    bug, not noise)."""
    rows = QUERIES["heavy_hitters_cms"](spark, "/root/testdata/sf0.001").collect()
    assert rows, "no heavy hitters returned"
    for r in rows:
        assert r["overestimate"] >= 0, r
        assert r["cms_estimate"] >= r["exact_count"], r


def _events(spark, tmp_path, rows):
    """Write a crafted events.parquet (full schema) and return its dir."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, ts, uid, et, v, "{}") for i, (ts, uid, et, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    return sf


def test_funnel_latency_boundaries(spark, tmp_path):
    """Pre-signup purchases must NOT convert; a purchase at exactly the
    signup instant converts with latency 0; latencies are floor-minute
    integers."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    m = dt.timedelta(minutes=1)
    sf = _events(
        spark,
        tmp_path,
        [
            (t0, 1, "signup", 1.0),
            (t0 + 10 * m, 1, "purchase", 1.0),       # 10 min
            (t0, 2, "signup", 1.0),
            (t0, 2, "purchase", 1.0),                # same instant → 0 min
            (t0, 3, "signup", 1.0),                  # never converts
            (t0 - 5 * m, 4, "purchase", 1.0),        # purchase BEFORE signup
            (t0, 4, "signup", 1.0),                  # → not converted
        ],
    )
    r = QUERIES["funnel_time_to_convert"](spark, sf).collect()[0]
    assert (r["n_signup_users"], r["n_converted"]) == (4, 2)
    assert r["conv_rate"] == 0.5
    assert r["p50_min"] == 5.0  # interpolated between 0 and 10
    assert r["p90_min"] == 9.0


def test_seasonal_dow_is_iso(spark, tmp_path):
    """2024-01-01 is a Monday: its profile row must carry ISO dow=1
    (Spark weekday()+1 parity with DuckDB isodow), and a Sunday event
    must land on dow=7."""
    import datetime as dt

    sf = _events(
        spark,
        tmp_path,
        [
            (dt.datetime(2024, 1, 1, 9), 1, "view", 2.0),   # Monday
            (dt.datetime(2024, 1, 7, 9), 1, "view", 4.0),   # Sunday
        ],
    )
    rows = {r["dow"]: r for r in QUERIES["seasonal_dow_profile"](spark, sf).collect()}
    assert set(rows) == {1, 7}
    assert rows[1]["mean_value"] == 2.0 and rows[7]["mean_value"] == 4.0
    assert rows[1]["dow_share"] == 0.5


def test_session_paths_are_per_user_and_ordered(spark, tmp_path):
    """Triples never span users, and ordering follows (ts, event_id):
    one user with a 4-event chain yields exactly its two consecutive
    triples; a second 2-event user contributes none."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    sf = _events(
        spark,
        tmp_path,
        [
            (t0 + 0 * s, 1, "view", 1.0),
            (t0 + 1 * s, 1, "click", 1.0),
            (t0 + 2 * s, 1, "signup", 1.0),
            (t0 + 3 * s, 1, "purchase", 1.0),
            (t0 + 0 * s, 2, "view", 1.0),
            (t0 + 1 * s, 2, "error", 1.0),
        ],
    )
    got = {
        (r["e1"], r["e2"], r["e3"]): r["n_paths"]
        for r in QUERIES["session_paths_top"](spark, sf).collect()
    }
    assert got == {
        ("view", "click", "signup"): 1,
        ("click", "signup", "purchase"): 1,
    }


# ------------------------------------------- shared graph edge cache ---


def test_graph_queries_share_one_edge_materialization(spark):
    """triangle_count, khop_reach, and degree_distribution all root the
    same thresholded supplier edge list: building it twice must hit the
    sameSemantics LRU slot (ONE cached frame), not add a second copy."""
    from video_metadata_db_spark.operators import dedup as D
    from video_metadata_db_spark.plans.graph_queries import _supplier_edges

    D.release_dedup_caches()
    _supplier_edges(spark, "/root/testdata/sf0.001")
    n_after_first = len(D._SCOPED_CACHES)
    _supplier_edges(spark, "/root/testdata/sf0.001")
    assert len(D._SCOPED_CACHES) == n_after_first == 1
    D.release_dedup_caches()


# --------------------------- correlation / IQR / novelty / CMS merge ---


def test_correlation_perfect_and_anti(spark, tmp_path):
    """Two types firing in lockstep every hour must correlate at 1.0;
    a type firing exactly when another is silent (2-hour alternation)
    at -1.0 — signs and magnitudes, not just hash equality."""
    import datetime as dt

    rows = []
    for h in range(6):
        ts = dt.datetime(2024, 1, 1, h)
        n = 1 + (h % 3)
        for _ in range(n):
            rows.append((ts, 1, "click", 1.0))
            rows.append((ts, 1, "view", 1.0))
        # error fires only on even hours, opposite of signup on odd
        if h % 2 == 0:
            rows.append((ts, 1, "error", 1.0))
        else:
            rows.append((ts, 1, "signup", 1.0))
    sf = _events(spark, tmp_path, rows)
    got = {
        (r["type_a"], r["type_b"]): r["corr"]
        for r in QUERIES["correlation_matrix"](spark, sf).collect()
    }
    assert got[("click", "view")] == 1.0
    assert got[("error", "signup")] == -1.0


def test_iqr_fences_and_counts(spark, tmp_path):
    """On 0..100 plus two planted extremes, the Tukey fences must catch
    exactly the planted points (quartile interpolation on a known
    ladder is hand-checkable)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    rows = [(t0, 1, "view", float(v)) for v in range(101)]
    rows += [(t0, 1, "view", 1000.0), (t0, 1, "view", -1000.0)]
    sf = _events(spark, tmp_path, rows)
    r = {
        x["event_type"]: x
        for x in QUERIES["outlier_iqr_events"](spark, sf).collect()
    }["view"]
    assert (r["n_low"], r["n_high"]) == (1, 1)
    assert r["fence_lo"] < 0 < r["fence_hi"] < 1000


def test_novelty_extremes(spark, tmp_path):
    """A doc sharing every shingle with a twin scores 0 novelty; a doc
    with a fully unique vocabulary scores 1.0."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon"),
            (1, "alpha beta gamma delta epsilon"),
            (2, "one two three four five six"),
        ],
        "doc_id long, text string",
    ).write.parquet(f"{sf}/documents.parquet")
    got = {
        r["doc_id"]: r["novelty"]
        for r in QUERIES["text_ngram_novelty"](spark, sf).collect()
    }
    assert got == {0: 0.0, 1: 0.0, 2: 1.0}


def test_cms_merge_equals_oneshot(spark):
    """Sketch mergeability as algebra: cells(A ∪ B) == merge(cells(A),
    cells(B)) cell by cell — the invariant the streaming maintainer
    rides (its oracle equality is the end-to-end form; this is the
    unit form on crafted frames)."""
    from video_metadata_db_spark.operators.sketches import cms_cells, cms_merge

    a = spark.createDataFrame(
        [("x", 3), ("y", 2), ("z", 5)], "term string, cnt long"
    )
    b = spark.createDataFrame(
        [("x", 1), ("w", 7)], "term string, cnt long"
    )
    both = spark.createDataFrame(
        [("x", 4), ("y", 2), ("z", 5), ("w", 7)], "term string, cnt long"
    )
    merged = {
        (r["i"], r["bucket"]): r["cell"]
        for r in cms_merge(cms_cells(a), cms_cells(b)).collect()
    }
    oneshot = {
        (r["i"], r["bucket"]): r["cell"] for r in cms_cells(both).collect()
    }
    assert merged == oneshot


def test_rolling_median_small_series(spark, tmp_path):
    """Hand-checkable 5-frame medians: values 10,20,30,40,50 per user →
    medians 10,15,20,25,30 (growing frame then the full window)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    rows = [(t0 + i * s, 1, "view", float(10 * (i + 1))) for i in range(5)]
    sf = _events(spark, tmp_path, rows)
    got = [
        r["rolling_median"]
        for r in QUERIES["rolling_median_values"](spark, sf).collect()
    ]
    assert got == [10.0, 15.0, 20.0, 25.0, 30.0]


# ------------------------------------------------ gini / ltv deciles ---


def _rev_tables(spark, tmp_path, orders):
    """Crafted customer/orders parquet: customers 1..n, given
    (custkey, totalprice) order rows."""
    sf = str(tmp_path)
    custs = sorted({c for c, _ in orders})
    spark.createDataFrame(
        [(c,) for c in custs], "c_custkey long"
    ).write.parquet(f"{sf}/customer.parquet")
    spark.createDataFrame(
        [(i, c, float(v)) for i, (c, v) in enumerate(orders)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).write.parquet(f"{sf}/orders.parquet")
    return sf


def test_gini_zero_on_equal_revenue(spark, tmp_path):
    """Perfect equality is the Gini fixed point: every customer with
    identical revenue → exactly 0.0."""
    sf = _rev_tables(spark, tmp_path, [(c, 100.0) for c in range(1, 9)])
    r = QUERIES["gini_revenue"](spark, sf).collect()[0]
    assert (r["n_customers"], r["gini"]) == (8, 0.0)


def test_gini_full_concentration(spark, tmp_path):
    """One customer holding ALL revenue among n gives the closed form
    (n−1)/n — here 9/10 with ten customers (the nine others enter at
    rank bottom through the LEFT join, revenue 0)."""
    orders = [(10, 1000.0)]
    sf = _rev_tables(spark, tmp_path, orders)
    # add the nine order-less customers
    spark.createDataFrame(
        [(c,) for c in range(1, 11)], "c_custkey long"
    ).write.mode("overwrite").parquet(f"{sf}/customer.parquet")
    r = QUERIES["gini_revenue"](spark, sf).collect()[0]
    assert r["n_customers"] == 10
    assert r["gini"] == 0.9


def test_ltv_deciles_partition_and_order(spark, tmp_path):
    """Ten customers with strictly decreasing revenue → one customer
    per decile, decile 0 = the top spender, shares sum to 1."""
    orders = [(c, float(1000 - 100 * (c - 1))) for c in range(1, 11)]
    sf = _rev_tables(spark, tmp_path, orders)
    rows = QUERIES["customer_ltv_deciles"](spark, sf).collect()
    assert [r["decile"] for r in rows] == list(range(10))
    assert all(r["n_customers"] == 1 for r in rows)
    assert rows[0]["total_cents"] == 100000  # the 1000.00 top spender
    assert abs(sum(r["revenue_share"] for r in rows) - 1.0) < 1e-9
