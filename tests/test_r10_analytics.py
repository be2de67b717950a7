"""Property tests for the round-10 additions, beyond the per-query
DuckDB oracles: axioms and invariants the oracle compare cannot state
(it only proves both engines agree).

The Kendall-tau, CUPED, churn, and truncation tests run the REGISTERED
query end-to-end on crafted corpora written to a tmp sf_dir (same
parquet layout the driver uses), checked against hand-computed ground
truth; the rest pin real-data axioms at the smoke SF.
"""

from __future__ import annotations

import datetime as dt

import pytest

from video_metadata_db_spark.plans import QUERIES


# ---------------------------------------------------------------- crafted data


def _write(spark, path, table, rows, schema):
    spark.createDataFrame(rows, schema).repartition(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/{table}.parquet")


def test_kendall_tau_perfect_monotone(spark, tmp_path):
    """Strictly co-monotone daily series -> tau_b = 1; reversing one
    series flips it to -1 (antisymmetry), with zero ties either way."""
    base = dt.datetime(2024, 1, 1)
    up = [
        (base + dt.timedelta(days=i), 1.0 + i, float(10 + i))
        for i in range(25)
    ]
    down = [
        (d, q, float(10 + (24 - i))) for i, (d, q, _p) in enumerate(up)
    ]
    schema = "l_shipdate timestamp, l_quantity double, l_extendedprice double"
    for rows, want in ((up, 1.0), (down, -1.0)):
        _write(spark, tmp_path, "lineitem", rows, schema)
        row = QUERIES["kendall_tau_daily"](spark, str(tmp_path)).first()
        assert row["n_days"] == 25
        assert row["concordant"] + row["discordant"] == 25 * 24 // 2
        assert row["tau_b"] == want


def test_cuped_recovers_effect_exactly(spark, tmp_path):
    """Construct y = 2x + 5·treated with the covariate EQUAL across
    arms (paired users share x): theta must be exactly 2, the raw and
    adjusted differences both exactly 500 cents, and the variance
    reduction = rho**2 must sit in (99, 100) — the analytic value for
    var(y) = 4·var(x) + 25·var(h)."""
    rows = []
    for u in range(100):
        x_dollars = float(10 + u // 2)  # pairs (2k, 2k+1) share x
        y_dollars = 2.0 * x_dollars + 5.0 * (u % 2)
        rows.append((u * 2, dt.datetime(2024, 1, 10), u, "view", x_dollars, "{}"))
        rows.append((u * 2 + 1, dt.datetime(2024, 1, 20), u, "view", y_dollars, "{}"))
    _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id bigint, ts timestamp, user_id bigint,"
        " event_type string, value double, props string",
    )
    row = QUERIES["cuped_adjusted_ab"](spark, str(tmp_path)).first()
    assert row["n_users"] == 100 and row["n_treated"] == 50
    assert row["theta"] == 2.0
    assert row["diff_raw_cents"] == 500.0
    assert row["diff_cuped_cents"] == 500.0
    assert 99.0 < row["var_reduction_pct"] < 100.0


def test_topk_churn_identical_weeks_is_one(spark, tmp_path):
    """Two adjacent ISO weeks with IDENTICAL part sales -> every
    week-over-week Jaccard is exactly 1."""
    mon1 = dt.datetime(2024, 1, 1)  # a Monday
    mon2 = dt.datetime(2024, 1, 8)
    rows = []
    for wk in (mon1, mon2):
        for p in range(25):
            rows.append((wk + dt.timedelta(days=p % 5), float(100 - p), 1000 + p))
    _write(
        spark,
        tmp_path,
        "lineitem",
        rows,
        "l_shipdate timestamp, l_quantity double, l_partkey bigint",
    )
    row = QUERIES["topk_churn_weekly"](spark, str(tmp_path)).first()
    assert row["n_week_pairs"] == 1
    assert row["avg_jaccard"] == 1.0
    assert row["min_jaccard"] == 1.0 and row["max_jaccard"] == 1.0


def test_truncation_waste_exact_small_corpus(spark, tmp_path):
    """Hand-computable corpus: docs of 5 / 20 / 40 tokens against the
    registered length sweep (16/32/64/96)."""
    docs = [
        (0, " ".join(f"a{i}" for i in range(5)), "en", "web", 10),
        (1, " ".join(f"b{i}" for i in range(20)), "en", "web", 10),
        (2, " ".join(f"c{i}" for i in range(40)), "en", "web", 10),
    ]
    _write(
        spark,
        tmp_path,
        "documents",
        docs,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    rows = {
        r["max_len"]: r
        for r in QUERIES["truncation_waste_curve"](
            spark, str(tmp_path)
        ).collect()
    }
    assert rows[16]["tokens_total"] == 65
    assert rows[16]["tokens_lost"] == (20 - 16) + (40 - 16)
    assert rows[16]["docs_truncated"] == 2
    assert rows[32]["tokens_lost"] == 40 - 32
    assert rows[32]["docs_truncated"] == 1
    assert rows[64]["tokens_lost"] == 0
    assert rows[96]["docs_truncated"] == 0


# ------------------------------------------------------------ real-data axioms


@pytest.fixture(scope="module")
def q(spark, sf_dir):
    def run(name):
        return QUERIES[name](spark, sf_dir).collect()

    return run


def test_partition_pruning_granularity_ordering(q):
    rows = {r["granularity"]: r for r in q("partition_pruning_audit")}
    day, week, month = rows["day"], rows["week"], rows["month"]
    # finer partitions: more of them, fewer rows each, tighter pruning
    assert day["partitions_total"] >= week["partitions_total"] >= month["partitions_total"]
    assert day["rows_scanned"] <= week["rows_scanned"] <= month["rows_scanned"]
    assert day["scan_saved"] >= week["scan_saved"] >= month["scan_saved"]
    assert (
        day["avg_rows_per_partition"]
        <= week["avg_rows_per_partition"]
        <= month["avg_rows_per_partition"]
    )
    # the predicate's true matches are granularity-invariant and every
    # matching row lives in a read partition
    assert len({r["rows_matching"] for r in rows.values()}) == 1
    for r in rows.values():
        assert r["rows_scanned"] >= r["rows_matching"] > 0
        assert r["partitions_read"] <= r["partitions_total"]


def test_compaction_bin_plan_invariants(q):
    (row,) = q("compaction_bin_plan")
    assert 0 < row["n_output_files"] <= row["n_input_files"]
    assert row["small_files_after"] <= row["small_files_before"]
    # byte conservation: avg * n re-multiplies to the exact total
    assert abs(row["avg_output_bytes"] * row["n_output_files"] - row["total_bytes"]) < row["n_output_files"]
    assert row["max_output_bytes"] * row["n_output_files"] >= row["total_bytes"]


def test_cms_width_error_is_monotone_one_sided(q):
    rows = sorted(q("cms_width_tradeoff"), key=lambda r: r["width"])
    assert [r["width"] for r in rows] == [256, 1024, 4096]
    # the probe set is min(50, distinct terms) — identical per width
    assert len({r["n_probed"] for r in rows}) == 1
    for r in rows:
        assert r["est_total"] >= r["true_total"] > 0, "CMS is one-sided"
        assert r["max_overcount"] >= 0
        assert 0 < r["n_probed"] <= 50
    errs = [r["rel_err_pct"] for r in rows]
    assert errs[0] >= errs[1] >= errs[2], "wider sketch never hurts"


def test_fairness_parity_flag_consistency(q):
    rows = q("fairness_parity_audit")
    assert max(r["di_ratio"] for r in rows) == 1.0
    for r in rows:
        assert 0.0 <= r["rate"] <= 1.0
        assert 0.0 < r["di_ratio"] <= 1.0
        # the integer 4/5 test must agree with the rounded ratio except
        # within rounding distance of the boundary
        if r["di_ratio"] > 0.8001:
            assert r["four_fifths_pass"]
        if r["di_ratio"] < 0.7999:
            assert not r["four_fifths_pass"]


def test_truncation_curve_monotone(q):
    rows = sorted(q("truncation_waste_curve"), key=lambda r: r["max_len"])
    assert len({r["docs_total"] for r in rows}) == 1
    assert len({r["tokens_total"] for r in rows}) == 1
    lost = [r["tokens_lost"] for r in rows]
    assert lost == sorted(lost, reverse=True), "longer context loses less"
    cut = [r["docs_truncated"] for r in rows]
    assert cut == sorted(cut, reverse=True)
    for r in rows:
        assert 0 <= r["tokens_lost"] < r["tokens_total"]


def test_topk_churn_bounds(q):
    (row,) = q("topk_churn_weekly")
    assert row["n_week_pairs"] > 0
    assert 0.0 <= row["min_jaccard"] <= row["avg_jaccard"] <= row["max_jaccard"] <= 1.0


def test_kendall_tau_real_data_bounds(q):
    (row,) = q("kendall_tau_daily")
    assert row["n_days"] > 100
    assert -1.0 <= row["tau_b"] <= 1.0
    # shipped quantity and revenue must co-move clearly
    assert row["tau_b"] > 0.3
    assert row["concordant"] > row["discordant"]


def test_mcnemar_confusion_mapping_exact(spark, tmp_path):
    """Hand-built 4-doc corpus hitting all four (a_ok, b_ok) cells:
    n01 = n10 = 1, so the continuity-corrected statistic is exactly
    (|0|-1)^2 / 2 = 0.5."""
    docs = [
        (0, "the of and to in", "en", "web", 10),  # both right
        (1, "zzz zzz zzz", "en", "web", 10),       # both wrong
        (2, "the the the", "de", "web", 10),       # A wrong, B right
        (3, "qqq aaa eee", "de", "web", 10),       # A right, B wrong
    ]
    _write(
        spark,
        tmp_path,
        "documents",
        docs,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    row = QUERIES["mcnemar_test"](spark, str(tmp_path)).first()
    assert row["n_docs"] == 4
    assert row["acc_stopword"] == 0.5 and row["acc_vowel"] == 0.5
    assert row["n01"] == 1 and row["n10"] == 1
    assert row["mcnemar_stat"] == 0.5
    assert 0.0 <= row["p_value"] <= 1.0


def test_bloom_fpr_tracks_theory(q):
    (row,) = q("bloom_fpr_audit")
    assert row["m_bits"] == (1 + row["n_existing"] // 4) * 64
    assert row["n_probes"] == row["n_existing"]
    assert 0 <= row["false_positives"] < row["n_probes"]
    assert 0.0 < row["fpr_theory"] < 0.05, "16 bits/key design point"
    # measured FPR is binomial around theory: allow generous slack but
    # catch an order-of-magnitude bug in either direction
    import math

    sd = math.sqrt(row["fpr_theory"] / row["n_probes"])
    assert row["fpr_measured"] <= row["fpr_theory"] + 6 * sd + 1e-6
    assert row["fpr_measured"] >= max(0.0, row["fpr_theory"] - 6 * sd - 1e-6)


def test_shuffle_mixing_near_random(q):
    (row,) = q("shuffle_mixing_audit")
    assert row["n_pairs"] == row["n_docs"] - 1
    assert 0.0 < row["expected_rate"] < 1.0
    assert 0.0 <= row["observed_rate"] < 1.0
    # a seeded hash order must look exchangeable w.r.t. source
    assert 0.6 < row["mixing_ratio"] < 1.4
