"""Property tests for the round-9 additions, beyond the per-query
DuckDB oracles: axioms and invariants the oracle compare cannot state
(it only proves both engines agree).

The KNN-Shapley and MMD tests run the REGISTERED query end-to-end on a
crafted corpus written to a tmp sf_dir (same parquet layout the driver
uses), checked against brute-force subset enumeration / analytic
ground truth.
"""

from __future__ import annotations

import itertools
import math

import pytest

from pyspark.sql import functions as F

from video_metadata_db_spark.plans import QUERIES


# ---------------------------------------------------------------- crafted data


def _write_embeddings(spark, path, rows):
    spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    ).repartition(1).write.mode("overwrite").parquet(f"{path}/embeddings.parquet")


def test_knn_shapley_matches_subset_enumeration(spark, tmp_path):
    """Exact Shapley by definition: for each training point, average the
    marginal utility over all subsets with the combinatorial weights,
    utility(S) = (# label-matching among the K nearest of S) / K.  The
    closed-form suffix-sum recursion in the registered query must land
    on the identical values (Jia et al. Theorem 1)."""
    import numpy as np

    rng = np.random.RandomState(7)
    k = 5  # _SHAP_K in similarity_queries
    val = [(i, rng.randn(4), i % 2) for i in range(10)]
    train = [(10 + j, rng.randn(4), j % 2) for j in range(8)]
    rows = [
        (int(i), [float(x) for x in v], int(lab)) for i, v, lab in val + train
    ]
    _write_embeddings(spark, str(tmp_path), rows)

    out = {
        r["cand_id"]: r["shapley_micro"]
        for r in QUERIES["knn_shapley_values"](spark, str(tmp_path)).collect()
    }

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    n = len(train)
    fact = [math.factorial(x) for x in range(n + 1)]
    expected = {tid: 0.0 for tid, _, _ in train}
    for _qid, qv, qlab in val:
        # rank candidates exactly as the query does: rounded cosine
        # desc, id asc
        ranked = sorted(
            train, key=lambda t: (-round(cos(qv, t[1]), 6), t[0])
        )

        def utility(subset):
            if not subset:
                return 0.0
            chosen = [t for t in ranked if t[0] in subset][:k]
            return sum(1 for t in chosen if t[2] == qlab) / k

        for tid, _tv, _tlab in train:
            others = [t[0] for t in train if t[0] != tid]
            s_val = 0.0
            for r in range(n):
                w = fact[r] * fact[n - r - 1] / fact[n]
                for sub in itertools.combinations(others, r):
                    s_val += w * (
                        utility(set(sub) | {tid}) - utility(set(sub))
                    )
            expected[tid] += s_val
    for tid in expected:
        expected[tid] = expected[tid] / len(val) * 1e6

    assert set(out) == set(expected)
    for tid, micro in out.items():
        assert abs(micro - expected[tid]) <= 2, (
            tid,
            micro,
            expected[tid],
        )


def test_mmd_drift_zero_on_identical_halves(spark, tmp_path):
    """Even/odd halves with identical embeddings ⇒ every per-dim gap
    and the MMD² are exactly zero."""
    vecs = [[float(d % 3 - 1) + 0.25 * d for d in range(64)] for _ in range(4)]
    rows = []
    for i, v in enumerate(vecs):
        rows.append((2 * i, v, 0))  # even (ref)
        rows.append((2 * i + 1, v, 0))  # odd (cur), same vector
    _write_embeddings(spark, str(tmp_path), rows)
    out = QUERIES["embedding_mmd_drift"](spark, str(tmp_path)).collect()
    assert len(out) == 10
    assert all(r["diff_micro"] == 0 for r in out)
    assert all(r["mmd2"] == 0.0 for r in out)


def test_mann_kendall_monotone_series(spark, tmp_path):
    """A strictly increasing daily series must give S = n(n−1)/2,
    tau = 1, and a tiny p-value."""
    import datetime as dt

    rows = [
        (dt.date(2024, 1, 1) + dt.timedelta(days=i), 100.0 + i)
        for i in range(30)
    ]
    spark.createDataFrame(
        rows, "o_orderdate date, o_totalprice double"
    ).repartition(1).write.mode("overwrite").parquet(
        f"{tmp_path}/orders.parquet"
    )
    row = QUERIES["mann_kendall_trend"](spark, str(tmp_path)).first()
    n = 30
    assert row["n_days"] == n
    assert row["s_stat"] == n * (n - 1) // 2
    assert row["kendall_tau"] == 1.0
    assert row["p_value"] < 1e-5


# ------------------------------------------------------------ real-data axioms


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def run(name):
        return QUERIES[name](spark, sf_dir).collect()

    return run


def test_fdr_bh_adjusted_p_is_monotone_step_up(q):
    rows = q("fdr_bh_correction")
    ps = [r["p_value"] for r in rows]
    bhs = [r["p_bh"] for r in rows]
    assert ps == sorted(ps)
    assert bhs == sorted(bhs), "BH step-up must be monotone in p order"
    assert all(b >= p for p, b in zip(ps, bhs)), "adjustment never shrinks p"
    rejected = [r["rejected"] for r in rows]
    assert rejected == sorted(rejected, reverse=True), (
        "rejections must form a prefix of the p-ordering"
    )


def test_domain_cap_invariants(q):
    for r in q("domain_cap_sample"):
        assert r["n_kept"] <= min(r["cap"], r["n_docs"])
        assert r["tokens_kept"] <= r["tokens_total"]
        assert 0.0 < r["kept_token_share"] <= 1.0


def test_join_cardinality_estimate_is_one_sided(q):
    (row,) = q("join_cardinality_estimate")
    assert row["est_pairs"] >= row["true_pairs"] > 0, (
        "CMS inner product is a one-sided overestimate"
    )


def test_stream_left_outer_join_emits_both_matches_and_nulls(q):
    rows = q("stream_left_outer_join")
    matched = [r for r in rows if r["r_event_id"] is not None]
    nulls = [r for r in rows if r["r_event_id"] is None]
    assert matched and nulls, "outer semantics must be non-vacuous"
    assert all(r["l_event_id"] is not None for r in rows)


def test_heaps_curve_monotone_and_exponent_sane(q):
    rows = q("heaps_law_fit")
    toks = [r["cum_tokens"] for r in rows]
    vocab = [r["cum_vocab"] for r in rows]
    assert toks == sorted(toks) and vocab == sorted(vocab)
    assert vocab[-1] <= toks[-1]
    beta = rows[0]["heaps_beta"]
    assert 0.0 < beta <= 1.2, beta


def test_linkpred_flags_and_scores(spark, sf_dir, q):
    from video_metadata_db_spark.plans.graph_queries import _supplier_edges

    edges = {
        (r["s1"], r["s2"])
        for r in _supplier_edges(spark, sf_dir).collect()
    }
    rows = q("linkpred_resource_allocation")
    assert rows
    for r in rows:
        assert r["is_new"] == ((r["supp_a"], r["supp_b"]) not in edges)
        assert r["supp_a"] < r["supp_b"]
        assert r["n_common"] >= 1 and r["ra_micro"] > 0


def test_rbo_bounds_and_final_value(q):
    rows = q("rank_biased_overlap")
    p = 0.9
    d_max = len(rows)
    rbo = rows[0]["rbo_p09"]
    assert all(r["rbo_p09"] == rbo for r in rows)
    # truncated RBO is bounded by the perfect-agreement prefix mass
    assert 0.0 <= rbo <= round(1 - p**d_max, 6) + 1e-9
    for r in rows:
        assert 0.0 <= r["agreement"] <= 1.0


def test_qte_quantiles_monotone(q):
    rows = q("quantile_treatment_effect")
    qt = [r["q_treated"] for r in rows]
    qc = [r["q_control"] for r in rows]
    assert qt == sorted(qt) and qc == sorted(qc)


def test_chained_windows_daily_invariants(q):
    rows = q("stream_chained_windows")
    assert rows, "chained windows must emit closed daily rows"
    days = {r["day_start"] for r in rows}
    assert len(days) > 1, "multi-day corpus must yield multiple days"
    for r in rows:
        assert 1 <= r["n_active_hours"] <= 24
        assert r["peak_hourly_events"] <= r["n_events_day"]
        assert r["n_events_day"] <= r["peak_hourly_events"] * r["n_active_hours"]


def test_cohens_kappa_confusion_consistency(q):
    (r,) = q("cohens_kappa_langid")
    assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == r["n_docs"]
    assert -1.0 <= r["cohens_kappa"] <= 1.0
    assert 0.0 <= r["accuracy"] <= 1.0
