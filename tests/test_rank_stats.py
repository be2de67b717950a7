"""Unit tests for the exact two-sample rank statistics: the shared
rank-count substrate vs a brute-force model, the KS max-gap identity,
and the Mann–Whitney doubled-rank identities (2Ua + 2Ub = 2·na·nb,
AUC symmetry).  Full value oracles run in test_registry_queries.py.
"""

from __future__ import annotations

import random
from fractions import Fraction

from video_metadata_db_spark.operators.analytics import two_sample_rank_counts


def _sample(seed: int, n_a: int, n_b: int, lo: int = -5, hi: int = 12):
    rng = random.Random(seed)
    a = [rng.randint(lo, hi) for _ in range(n_a)]
    b = [rng.randint(lo, hi) for _ in range(n_b)]
    return a, b


def _counts_df(spark, a, b, num_ranges=4):
    rows = [(v, "a") for v in a] + [(v, "b") for v in b]
    df = spark.createDataFrame(rows, "v long, g string")
    return two_sample_rank_counts(df, "v", "g", "a", "b", num_ranges=num_ranges)


def test_rank_counts_match_brute_force(spark):
    """cnt/cum at every distinct value equal the direct O(n²) model —
    with heavy ties and values straddling the range boundaries."""
    a, b = _sample(7, 40, 25)
    got = {
        r["v"]: (r["cnt_a"], r["cnt_b"], r["cum_a"], r["cum_b"])
        for r in _counts_df(spark, a, b).collect()
    }
    for v in sorted(set(a) | set(b)):
        expect = (
            a.count(v),
            b.count(v),
            sum(1 for x in a if x <= v),
            sum(1 for x in b if x <= v),
        )
        assert got[v] == expect, f"value {v}"
    assert set(got) == set(a) | set(b)


def test_rank_counts_single_range_degenerate(spark):
    """num_ranges=1 (no boundaries at all) must still be correct — the
    two-pass collapses to one bucket."""
    a, b = _sample(11, 9, 6, lo=0, hi=3)
    got = {r["v"]: (r["cum_a"], r["cum_b"]) for r in _counts_df(spark, a, b, 1).collect()}
    for v in sorted(set(a) | set(b)):
        assert got[v] == (
            sum(1 for x in a if x <= v),
            sum(1 for x in b if x <= v),
        )


def test_ks_matches_brute_force(spark):
    """d_numer/(na·nb) from the counts frame equals the direct ECDF
    max-gap, computed in exact rational arithmetic."""
    a, b = _sample(23, 60, 45)
    rows = _counts_df(spark, a, b).collect()
    n_a, n_b = len(a), len(b)
    d_numer = max(abs(r["cum_a"] * n_b - r["cum_b"] * n_a) for r in rows)
    expect = max(
        abs(
            Fraction(sum(1 for x in a if x <= v), n_a)
            - Fraction(sum(1 for x in b if x <= v), n_b)
        )
        for v in set(a) | set(b)
    )
    assert Fraction(d_numer, n_a * n_b) == expect


def test_mann_whitney_identities(spark):
    """Doubled-rank arithmetic vs the classic average-rank model:
    2R_a from the counts frame equals twice the tie-averaged rank sum,
    and 2Ua + 2Ub == 2·na·nb."""
    a, b = _sample(41, 35, 50)
    rows = sorted(_counts_df(spark, a, b).collect(), key=lambda r: r["v"])
    twice_r_a = sum(
        r["cnt_a"]
        * (
            2 * (r["cum_a"] - r["cnt_a"] + r["cum_b"] - r["cnt_b"])
            + r["cnt_a"]
            + r["cnt_b"]
            + 1
        )
        for r in rows
    )
    # direct model: average ranks over the pooled sorted sample
    pooled = sorted([(v, "a") for v in a] + [(v, "b") for v in b])
    by_val: dict[int, list[int]] = {}
    for i, (v, _) in enumerate(pooled, start=1):
        by_val.setdefault(v, []).append(i)
    r_a = sum(
        (Fraction(sum(by_val[v]), len(by_val[v])) for v, g in pooled if g == "a"),
        Fraction(0),
    )
    assert Fraction(twice_r_a, 2) == r_a
    n_a, n_b = len(a), len(b)
    twice_u_a = twice_r_a - n_a * (n_a + 1)
    twice_u_b = 2 * n_a * n_b - twice_u_a
    assert twice_u_a + twice_u_b == 2 * n_a * n_b
    assert 0 <= twice_u_a <= 2 * n_a * n_b


def test_logistic_newton_recovers_effect_direction(spark):
    """On constructed sufficient statistics with a monotone-increasing
    success rate the fitted slope must be positive and the fit must
    reproduce the group rates; on flat data the slope must be ~0."""
    from video_metadata_db_spark.operators.glm import logistic_newton

    rising = spark.createDataFrame(
        [(0, 1000, 100), (5, 1000, 300), (10, 1000, 700)], "x int, n long, s long"
    )
    b0, b1 = logistic_newton(rising, n_iter=6)
    assert b1 > 0.1
    # fitted p at the center point tracks the empirical 30% rate
    import math

    p5 = 1.0 / (1.0 + math.exp(-(b0 + b1 * 5)))
    assert abs(p5 - 0.3) < 0.05

    flat = spark.createDataFrame(
        [(0, 1000, 250), (5, 1000, 250), (10, 1000, 250)], "x int, n long, s long"
    )
    _, b1f = logistic_newton(flat, n_iter=6)
    assert abs(b1f) < 1e-6


def test_poisson_newton_recovers_rate_effect(spark):
    """On constructed counts with a rising rate the fitted log-link
    slope must be positive and reproduce the endpoint rates; flat
    counts give slope ~0 and intercept ln(rate)."""
    import math

    from video_metadata_db_spark.operators.glm import poisson_newton

    rising = spark.createDataFrame(
        [(0, 1000, 2000), (5, 1000, 4000), (10, 1000, 8000)],
        "x int, n long, s long",
    )
    b0, b1 = poisson_newton(rising, n_iter=6)
    assert b1 > 0.05
    assert abs(math.exp(b0) - 2.0) < 0.1          # rate at x=0
    assert abs(math.exp(b0 + 10 * b1) - 8.0) < 0.4  # rate at x=10

    flat = spark.createDataFrame(
        [(0, 1000, 3000), (5, 1000, 3000), (10, 1000, 3000)],
        "x int, n long, s long",
    )
    b0f, b1f = poisson_newton(flat, n_iter=6)
    assert abs(b1f) < 1e-6 and abs(math.exp(b0f) - 3.0) < 1e-6


def test_glm_newton_degenerate_inputs_fail_loudly(spark):
    """Singular information matrices must raise, not bake NaN/Inf into
    query output (ADVICE r6): a single distinct x gives det == 0 for
    the logistic solve; saturated data (9-dp p pinned at exactly 0/1)
    zeroes every weight; an all-zero response breaks the Poisson
    ln(mean) init."""
    import pytest

    from video_metadata_db_spark.operators.glm import (
        logistic_newton,
        poisson_newton,
    )

    single_x = spark.createDataFrame([(5, 1000, 300)], "x int, n long, s long")
    with pytest.raises(ValueError, match="degenerate"):
        logistic_newton(single_x, n_iter=2)

    # perfectly separated data: beta diverges until the 9-dp p pins at
    # exactly 0/1, zeroing every weight and the determinant (~25 steps)
    saturated = spark.createDataFrame(
        [(0, 1000, 0), (10, 1000, 1000)], "x int, n long, s long"
    )
    with pytest.raises(ValueError, match="degenerate"):
        logistic_newton(saturated, n_iter=40)

    zero_rate = spark.createDataFrame(
        [(0, 1000, 0), (10, 1000, 0)], "x int, n long, s long"
    )
    with pytest.raises(ValueError, match="degenerate"):
        poisson_newton(zero_rate, n_iter=2)
