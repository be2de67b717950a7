"""Algorithmic-property tests for the end-of-round-5 analytics batch:
CUSUM change-point, Kaplan–Meier conversion, seasonal decomposition,
Lorenz curve, degree assortativity, PMI, and burstiness.

(Full value oracles run in test_registry_queries.py; these pin the
closed-form fixed points and textbook identities a hash compare can't
articulate — the planted level shift lands on the boundary day, KM
matches the product-limit closed form, a pure trend has zero seasonal
component, perfect equality is a straight Lorenz diagonal, a star is
maximally disassortative and a regular graph degenerates to NULL,
independent terms have PMI 0, and Poisson-like terms have VMR 1.)
"""

from __future__ import annotations

import datetime as dt

from video_metadata_db_spark.plans import QUERIES


def _orders(spark, tmp_path, rows):
    """Crafted orders.parquet from (orderdate, totalprice) rows."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, 1, d, float(v)) for i, (d, v) in enumerate(rows)],
        "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice double",
    ).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    return sf


def _events(spark, tmp_path, rows):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, ts, uid, et, 1.0, "{}") for i, (ts, uid, et) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.mode("overwrite").parquet(f"{sf}/events.parquet")
    return sf


# ------------------------------------------------------------ CUSUM ---


def test_cusum_finds_planted_level_shift(spark, tmp_path):
    """10 days at $1.00 then 10 at $2.00: deviations are exactly
    ∓1000 n-scaled cents, so |CUSUM| peaks at the LAST pre-shift day
    with value −10·1000 and per-day mean −500.00 cents."""
    d0 = dt.date(2024, 1, 1)
    rows = [(d0 + dt.timedelta(days=i), 1.0) for i in range(10)]
    rows += [(d0 + dt.timedelta(days=10 + i), 2.0) for i in range(10)]
    sf = _orders(spark, tmp_path, rows)
    top = QUERIES["cusum_changepoint"](spark, sf).collect()[0]
    assert top["day"] == d0 + dt.timedelta(days=9)
    assert top["cusum_n_scaled"] == -10_000
    assert top["cusum_cents"] == -500.0


# ----------------------------------------------------- Kaplan–Meier ---


def test_kaplan_meier_product_limit_closed_form(spark, tmp_path):
    """4 users: conversions at 0 h, 1 h, 1 h, and one past the 48 h
    window (censored).  KM: S(0) = 3/4, S(1) = 3/4 · 1/3 = 1/4, with
    risk sets 4 then 3."""
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    h = dt.timedelta(hours=1)
    sf = _events(
        spark,
        tmp_path,
        [
            (t0, 1, "purchase"),                 # t_h = 0
            (t0, 2, "view"), (t0 + 1.5 * h, 2, "purchase"),   # t_h = 1
            (t0, 3, "view"), (t0 + 1.5 * h, 3, "purchase"),   # t_h = 1
            (t0, 4, "view"), (t0 + 100 * h, 4, "purchase"),   # censored
        ],
    )
    rows = QUERIES["kaplan_meier_conversion"](spark, sf).collect()
    got = [(r["t_hours"], r["n_risk"], r["d_conv"], r["survival"]) for r in rows]
    assert got == [(0, 4, 1, 0.75), (1, 3, 2, 0.25)]


# ------------------------------------------- seasonal decomposition ---


def test_seasonal_decompose_pure_trend_is_zero(spark, tmp_path):
    """A linear ramp has NO weekday seasonality: the centered 7-day MA
    reproduces the trend exactly, so every dow's 7-scaled deviation sum
    and seasonal index are exactly 0."""
    d0 = dt.date(2024, 1, 1)
    rows = [(d0 + dt.timedelta(days=i), 1.0 + 0.01 * i) for i in range(28)]
    sf = _orders(spark, tmp_path, rows)
    rows = QUERIES["seasonal_decompose_dow"](spark, sf).collect()
    assert len(rows) == 7
    for r in rows:
        assert r["sum_dev_7x_cents"] == 0, r
        assert r["seasonal_dollars"] == 0.0, r


def test_seasonal_residual_outliers_flags_planted_spike(spark, tmp_path):
    """A flat series with ONE 100× day: only that day's weekday cohort
    reports an outlier (its dd deviates; every other cohort's
    deviations are identical so MAD fences pass them all)."""
    d0 = dt.date(2024, 1, 1)  # a Monday
    rows = [
        (d0 + dt.timedelta(days=i), 100.0 if i == 14 else 1.0)
        for i in range(35)
    ]
    sf = _orders(spark, tmp_path, rows)
    out = {
        r["dow"]: r["n_outlier_days"]
        for r in QUERIES["seasonal_residual_outliers"](spark, sf).collect()
    }
    spike_dow = (d0 + dt.timedelta(days=14)).isoweekday()
    assert out[spike_dow] >= 1
    # spike leakage into neighbours' MA windows must not flag OTHER
    # cohorts' quiet majority
    assert sum(out.values()) <= 7


# ----------------------------------------------------------- Lorenz ---


def test_lorenz_equal_revenue_is_diagonal(spark, tmp_path):
    """Perfect equality: 20 customers × $1 → every decile holds 2
    customers and the cumulative share is exactly decile·100000 ppm,
    ending at 1_000_000."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [(c,) for c in range(1, 21)], "c_custkey long"
    ).write.parquet(f"{sf}/customer.parquet")
    spark.createDataFrame(
        [(i, c, 1.0) for i, c in enumerate(range(1, 21))],
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).write.parquet(f"{sf}/orders.parquet")
    rows = QUERIES["lorenz_curve"](spark, sf).collect()
    assert [(r["decile"], r["n_customers"], r["cum_share_ppm"]) for r in rows] == [
        (d, 2, d * 100_000) for d in range(1, 11)
    ]


# -------------------------------------------------- assortativity ---


def _trade_tables(spark, tmp_path, edges):
    """orders+lineitem parquet realizing the given (cust, supp) edges."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, c) for i, (c, _) in enumerate(edges)],
        "o_orderkey long, o_custkey long",
    ).write.mode("overwrite").parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        [(i, s) for i, (_, s) in enumerate(edges)],
        "l_orderkey long, l_suppkey long",
    ).write.mode("overwrite").parquet(f"{sf}/lineitem.parquet")
    return sf


def _newman_r(edges):
    """Independent reimplementation of the integer-moment formula."""
    from collections import Counter

    deg = Counter()
    for c, s in edges:
        deg[("c", c)] += 1
        deg[("s", s)] += 1
    m = len(edges)
    jk = [(deg[("c", c)], deg[("s", s)]) for c, s in edges]
    sjk = sum(j * k for j, k in jk)
    sjpk = sum(j + k for j, k in jk)
    ssq = sum(j * j + k * k for j, k in jk)
    den = 2 * m * ssq - sjpk * sjpk
    if den == 0:
        return None
    return round((4 * m * sjk - sjpk * sjpk) / den, 6)


def test_assortativity_star_is_minus_one(spark, tmp_path):
    """A 1-customer star over 4 suppliers is maximally disassortative:
    r = −1 exactly (hub degree 4 always pairs with leaf degree 1)."""
    edges = [(1, s) for s in range(1, 5)]
    r = QUERIES["degree_assortativity"](spark, _trade_tables(spark, tmp_path, edges)).collect()[0]
    assert r["m_edges"] == 4
    assert r["assortativity"] == -1.0 == _newman_r(edges)


def test_assortativity_regular_graph_is_null(spark, tmp_path):
    """K2,2: every endpoint degree is 2 → zero degree variance → the
    coefficient is undefined; the NULLIF guard must yield NULL, not a
    division error or ±inf."""
    edges = [(c, s) for c in (1, 2) for s in (1, 2)]
    r = QUERIES["degree_assortativity"](spark, _trade_tables(spark, tmp_path, edges)).collect()[0]
    assert r["m_edges"] == 4
    assert r["assortativity"] is None
    assert _newman_r(edges) is None


def test_assortativity_matches_brute_force(spark, tmp_path):
    """Mixed two-hub graph agrees with an independent Python
    evaluation of the same exact-integer formula."""
    edges = [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (3, 1)]
    r = QUERIES["degree_assortativity"](spark, _trade_tables(spark, tmp_path, edges)).collect()[0]
    assert r["m_edges"] == 6
    assert r["assortativity"] == _newman_r(edges)


# ------------------------------------------------------ PMI / VMR ---


def _docs(spark, tmp_path, texts):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return sf


def test_pmi_independent_cooccurrence_is_zero(spark, tmp_path):
    """Terms present in EVERY document co-occur exactly at chance:
    PMI = ln(N·N/(N·N)) = 0."""
    sf = _docs(spark, tmp_path, ["alpha beta"] * 8)
    rows = QUERIES["term_pmi_top"](spark, sf).collect()
    assert [(r["term_a"], r["term_b"], r["pmi"]) for r in rows] == [
        ("alpha", "beta", 0.0)
    ]


def test_burstiness_closed_forms(spark, tmp_path):
    """'x' twice in half the docs has VMR exactly 1 (Poisson-like at
    mean 1); 'y' once in half the docs has VMR 0.5 (under-dispersed)."""
    texts = ["x x"] * 10 + ["y"] * 10
    rows = QUERIES["term_burstiness_top"](spark, _docs(spark, tmp_path, texts)).collect()
    got = {r["term"]: (r["df"], r["n_tokens"], r["burstiness"]) for r in rows}
    assert got == {"x": (10, 20, 1.0), "y": (10, 10, 0.5)}


# --------------------------------------------------- burst / occupancy ---


def test_burst_scan_flags_planted_spike(spark, tmp_path):
    """50 uniform 1-count hours plus ONE 30-count hour: λ ≈ 1.58, the
    4√λ fence sits near 6.6 — exactly the spike hour is flagged."""
    t0 = dt.datetime(2024, 1, 1, 0, 30, 0)
    h = dt.timedelta(hours=1)
    rows = [(t0 + i * h, 1, "click") for i in range(50)]
    rows += [(t0 + 25 * h + dt.timedelta(minutes=m), 2, "click") for m in range(29)]
    sf = _events(spark, tmp_path, rows)
    r = QUERIES["burst_hours_scan"](spark, sf).collect()[0]
    assert r["n_burst_hours"] == 1
    assert r["max_hour_count"] == 30


def test_state_occupancy_exact_shares(spark, tmp_path):
    """A(0s)→B(10s)→A(30s)→B(60s): A dwells 10+30 = 40 s, B dwells
    20 s, last event unobserved — shares exactly 666666/333333 ppm."""
    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    sf = _events(
        spark,
        tmp_path,
        [(t0, 1, "A"), (t0 + 10 * s, 1, "B"), (t0 + 30 * s, 1, "A"),
         (t0 + 60 * s, 1, "B")],
    )
    got = {
        r["state"]: (r["occupied_seconds"], r["share_ppm"])
        for r in QUERIES["state_occupancy_share"](spark, sf).collect()
    }
    assert got == {"A": (40, 666666), "B": (20, 333333)}


# ------------------------------------------------------- sampling ---


def _docs2(spark, tmp_path, rows):
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, t, "en", src, n) for i, (t, src, n) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    return sf


def test_neyman_zero_variance_stratum_gets_nothing(spark, tmp_path):
    """Neyman allocation ∝ N·S: a stratum with identical lengths has
    S = 0 → target 0; the varying stratum absorbs the budget capped at
    its size."""
    rows = [("a", "s0", 100)] * 10 + [("b", "s1", 50 + i * 10) for i in range(10)]
    sf = _docs2(spark, tmp_path, rows)
    got = {
        r["source"]: (r["n_target"], r["n_drawn"])
        for r in QUERIES["sample_neyman_allocation"](spark, sf).collect()
    }
    assert got["s0"] == (0, 0)
    assert got["s1"] == (10, 10)  # capped at N_h


def test_negative_sampling_excludes_positives(spark, tmp_path):
    """With brands {X,Y,Z} and customer 1 having bought only X, the
    negatives must be exactly {Y,Z} (budget 3 capped by domain)."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, "Brand#X"), (2, "Brand#Y"), (3, "Brand#Z")],
        "p_partkey long, p_brand string",
    ).write.parquet(f"{sf}/part.parquet")
    spark.createDataFrame([(10, 1)], "o_orderkey long, o_custkey long").write.parquet(
        f"{sf}/orders.parquet"
    )
    spark.createDataFrame([(10, 1)], "l_orderkey long, l_partkey long").write.parquet(
        f"{sf}/lineitem.parquet"
    )
    r = QUERIES["sample_negative_brands"](spark, sf).collect()[0]
    assert r["n_negatives"] == 2
    assert set(r["negative_brands"].split(",")) == {"Brand#Y", "Brand#Z"}


# ------------------------------------------------- shares / intervals ---


def test_region_share_ppm_exact_quarters(spark, tmp_path):
    """Two nations in one region with 1:3 revenue → exactly 250000 and
    750000 ppm of the region, region = 1000000 ppm of the world."""
    sf = str(tmp_path)
    spark.createDataFrame([(0, "R0")], "r_regionkey long, r_name string").write.parquet(
        f"{sf}/region.parquet"
    )
    spark.createDataFrame(
        [(0, "N0", 0), (1, "N1", 0)],
        "n_nationkey long, n_name string, n_regionkey long",
    ).write.parquet(f"{sf}/nation.parquet")
    spark.createDataFrame(
        [(1, 0), (2, 1)], "c_custkey long, c_nationkey long"
    ).write.parquet(f"{sf}/customer.parquet")
    spark.createDataFrame(
        [(1, 1, 100.0), (2, 2, 300.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).write.parquet(f"{sf}/orders.parquet")
    rows = QUERIES["region_nation_share"](spark, sf).collect()
    got = {r["nation"]: (r["share_of_region_ppm"], r["region_share_ppm"]) for r in rows}
    assert got == {"N0": (250_000, 1_000_000), "N1": (750_000, 1_000_000)}


def test_wilson_bounds_degenerate_rates(spark, tmp_path):
    """r = 0 gives wilson_low EXACTLY 0 (1.9208 − 1.96·√0.9604 = 0)
    and r = n gives wilson_high exactly 1 — the closed form's boundary
    identity, which a Wald interval fails."""
    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, "Brand#A"), (2, "Brand#B")], "p_partkey long, p_brand string"
    ).write.parquet(f"{sf}/part.parquet")
    li = [(i, 1, "N") for i in range(8)] + [(i + 8, 2, "R") for i in range(8)]
    spark.createDataFrame(
        li, "l_orderkey long, l_partkey long, l_returnflag string"
    ).write.parquet(f"{sf}/lineitem.parquet")
    got = {
        r["p_brand"]: (r["rate_ppm"], r["wilson_low"], r["wilson_high"])
        for r in QUERIES["return_rate_wilson"](spark, sf).collect()
    }
    assert got["Brand#A"][0] == 0 and got["Brand#A"][1] == 0.0
    assert got["Brand#B"][0] == 1_000_000 and got["Brand#B"][2] == 1.0


def test_separability_null_on_zero_scatter(spark, tmp_path):
    """Two point-mass classes: intra-class scatter is exactly 0, so
    the ratio is undefined — the NULLIF guard must yield NULL with
    between_d2 > 0 (not a division blow-up)."""
    sf = str(tmp_path)
    rows = [(i, [1.0] * 64, 0) for i in range(5)]
    rows += [(i + 5, [2.0] * 64, 1) for i in range(5)]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")
    for r in QUERIES["class_separability"](spark, sf).collect():
        assert r["mean_intra_d2"] == 0.0
        assert r["between_d2"] > 0
        assert r["separability"] is None


# --------------------------------------- late-batch invariants (sf0.001) ---

SF = "/root/testdata/sf0.001"


def test_lsh_threshold_sweep_is_monotone(spark):
    """Pair volume can only shrink as the estimate threshold rises —
    a non-monotone step means the threshold comparison or the shared
    pair stream is broken."""
    rows = QUERIES["lsh_threshold_sweep"](spark, SF).collect()
    counts = [r["n_pairs"] for r in sorted(rows, key=lambda r: r["t10"])]
    assert counts == sorted(counts, reverse=True)
    assert counts[0] > 0  # the 0.5 cut matches dedup_minhash_lsh's stream


def test_basket_histogram_cumulates_to_one(spark):
    """ppm shares must sum to ~1e6 and the cumulative column must end
    there (integer div loses at most 1 ppm per bucket)."""
    rows = QUERIES["basket_size_histogram"](spark, SF).collect()
    total = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= total <= 1_000_000
    assert rows[-1]["cum_share_ppm"] >= 1_000_000 - len(rows)
    cums = [r["cum_share_ppm"] for r in rows]
    assert cums == sorted(cums)


def test_repeat_share_first_month_is_zero(spark):
    """No customer can be 'repeat' in the corpus's first month — its
    repeat share must be exactly 0 ppm."""
    rows = QUERIES["repeat_revenue_share_monthly"](spark, SF).collect()
    assert rows[0]["repeat_share_ppm"] == 0
    assert rows[0]["repeat_cents"] == 0


def test_state_occupancy_shares_sum_to_one(spark):
    """Occupancy ppm shares partition total observed dwell — they must
    sum to 1e6 within integer-division slack."""
    rows = QUERIES["state_occupancy_share"](spark, SF).collect()
    total = sum(r["share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= total <= 1_000_000


def test_shingle_df_histogram_partitions_postings(spark):
    """Bucket posting counts must partition the full posting total
    (shares ≈ 1e6), and bucket lower bounds must be powers of two."""
    rows = QUERIES["shingle_df_histogram"](spark, SF).collect()
    total = sum(r["postings_share_ppm"] for r in rows)
    assert 1_000_000 - len(rows) <= total <= 1_000_000
    for r in rows:
        assert r["df_lo"] == 2 ** r["bucket"]


def test_mobility_matrix_conserves_customers(spark):
    """Every (month m, month m+1) customer pair appears exactly once —
    the matrix total equals the count of consecutive-month presences,
    cross-checked independently."""
    from pyspark.sql import functions as F
    from video_metadata_db_spark.sources.tables import load_table

    rows = QUERIES["spend_decile_mobility"](spark, SF).collect()
    matrix_total = sum(r["n_customers"] for r in rows)
    cm = (
        load_table(spark, SF, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select(
            F.col("o_custkey").alias("cust"),
            F.date_trunc("month", F.col("o_orderdate").cast("date"))
            .cast("date")
            .alias("m"),
        )
        .distinct()
    )
    a, b = cm.alias("a"), cm.alias("b")
    expected = a.join(
        b,
        (F.col("a.cust") == F.col("b.cust"))
        & (F.col("b.m") == F.add_months(F.col("a.m"), 1)),
    ).count()
    assert matrix_total == expected > 0


def test_lang_mismatch_shares_partition_each_label(spark):
    """Within every declared lang, guess shares must partition to
    ~1e6 ppm."""
    rows = QUERIES["lang_mismatch_audit"](spark, SF).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["share_of_label_ppm"])
    for lang, shares in by_lang.items():
        assert 1_000_000 - len(shares) <= sum(shares) <= 1_000_000, lang
