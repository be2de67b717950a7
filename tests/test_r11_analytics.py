"""Property tests for the round-11 additions, beyond the per-query
DuckDB oracles: axioms and invariants the oracle compare cannot state
(it only proves both engines agree).

The DiD / ATE / target-encoding / Fleiss / MI / Theil / dynamic-gap /
coreset tests run the REGISTERED query end-to-end on crafted corpora
written to a tmp sf_dir (same parquet layout the driver uses), checked
against hand-computed ground truth; the rest pin real-data axioms at
the smoke SF.
"""

from __future__ import annotations

import datetime as dt

import pytest

from video_metadata_db_spark.plans import QUERIES

SF_SMOKE = "/root/testdata/sf0.001"

ORDER_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
    " o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)
CUST_SCHEMA = (
    "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double,"
    " c_mktsegment string"
)
DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)
EVENT_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string,"
    " value double, props string"
)


def _write(spark, path, table, rows, schema):
    spark.createDataFrame(rows, schema).repartition(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/{table}.parquet")


# ---------------------------------------------------------------- crafted data


def test_did_nets_out_common_trend(spark, tmp_path):
    """Construct a +1.00 common post-period trend on both arms plus a
    +5.00 treatment effect: the naive post-period gap is confounded,
    DiD recovers exactly 500 cents."""
    pre, post = dt.datetime(2024, 1, 1), dt.datetime(2024, 12, 1)
    custs = [(1, "t", 0, 0.0, "BUILDING"), (2, "c", 20, 0.0, "BUILDING")]
    orders = []
    ok = 0
    for _ in range(10):
        for price, cust, when in (
            (20.0, 1, pre),   # treat pre  -> mean 2000 cents
            (26.0, 1, post),  # treat post -> +100 trend +500 effect
            (10.0, 2, pre),   # ctrl pre   -> mean 1000 cents
            (11.0, 2, post),  # ctrl post  -> +100 trend
        ):
            orders.append((ok, cust, "O", price, when, "1-URGENT"))
            ok += 1
    _write(spark, tmp_path, "orders", orders, ORDER_SCHEMA)
    _write(spark, tmp_path, "customer", custs, CUST_SCHEMA)
    row = QUERIES["did_revenue_estimate"](spark, str(tmp_path)).first()
    assert row["n_treat_post"] == 10 and row["n_ctrl_pre"] == 10
    assert row["mean_treat_post"] == 2600.0
    assert row["mean_ctrl_pre"] == 1000.0
    assert row["did_cents"] == 500.0
    # the naive post gap (1500) would overstate the 500-cent effect
    assert row["mean_treat_post"] - row["mean_ctrl_post"] == 1500.0


def test_stratified_ate_removes_mix_confounding(spark, tmp_path):
    """Within every segment treatment adds exactly 100 cents, but the
    treated arm is concentrated in the expensive segment: the raw
    overall gap is inflated; the OVERALL stratified estimate is
    exactly 100."""
    custs, orders = [], []
    ck = ok = 0

    def add(seg, base, n_treat, n_ctrl):
        nonlocal ck, ok
        for i in range(n_treat + n_ctrl):
            treat = i < n_treat
            custs.append((ck, "x", 0 if treat else 1, 0.0, seg))
            cents = base + (100 if treat else 0)
            orders.append(
                (ok, ck, "O", cents / 100.0, dt.datetime(2024, 6, 1), "p")
            )
            ck += 1
            ok += 1

    add("MACHINERY", 5000, 8, 2)  # expensive segment, mostly treated
    add("BUILDING", 1000, 2, 8)   # cheap segment, mostly control
    _write(spark, tmp_path, "orders", orders, ORDER_SCHEMA)
    _write(spark, tmp_path, "customer", custs, CUST_SCHEMA)
    rows = {
        r["segment"]: r
        for r in QUERIES["ipw_ate_stratified"](spark, str(tmp_path)).collect()
    }
    assert rows["MACHINERY"]["diff_cents"] == 100.0
    assert rows["BUILDING"]["diff_cents"] == 100.0
    overall = rows["OVERALL"]
    assert overall["diff_cents"] == 100.0  # stratified ATE
    raw_gap = overall["mean_treat_cents"] - overall["mean_ctrl_cents"]
    assert raw_gap > 2000  # the confounded naive estimate


def test_fleiss_kappa_perfect_agreement(spark, tmp_path):
    """Documents far from both category boundaries: the +-120 jitter
    cannot flip any rater, so P_bar = 1 and kappa = 1 exactly."""
    docs = [(i, "t", "en", "web", 50 if i % 2 == 0 else 560) for i in range(40)]
    _write(spark, tmp_path, "documents", docs, DOC_SCHEMA)
    row = QUERIES["fleiss_kappa_ratings"](spark, str(tmp_path)).first()
    assert row["n_subjects"] == 40 and row["n_raters"] == 3
    assert row["p_agree"] == 1.0
    assert row["kappa"] == 1.0
    assert 0.0 < row["p_chance"] < 1.0


def test_group_holdout_split_no_leakage(spark, tmp_path):
    """100 users x 3 events: user and event totals reconcile, shares
    sum to 1, and the leakage audit reads 0 by construction."""
    t0 = dt.datetime(2024, 3, 1)
    events = [
        (u * 3 + j, t0 + dt.timedelta(minutes=j), u, "view", 1.0, "{}")
        for u in range(100)
        for j in range(3)
    ]
    _write(spark, tmp_path, "events", events, EVENT_SCHEMA)
    rows = QUERIES["group_holdout_split"](spark, str(tmp_path)).collect()
    assert {r["split"] for r in rows} == {"train", "val", "test"}
    assert sum(r["n_users"] for r in rows) == 100
    assert sum(r["n_events"] for r in rows) == 300
    assert all(r["leaked_users"] == 0 for r in rows)
    assert abs(sum(r["event_share"] for r in rows) - 1.0) < 1e-9
    # group split: every user's 3 events land together, so event
    # counts are exact multiples of 3
    assert all(r["n_events"] % 3 == 0 for r in rows)


def test_target_encoding_is_out_of_fold(spark, tmp_path):
    """Five orders, one per fold, target = 100 * fold: each fold's
    encoding is the mean of the OTHER four folds — hand-computed, and
    never equal to the naive whole-data mean (200)."""
    custs = [(1, "x", 0, 0.0, "BUILDING")]
    orders = [
        (k, 1, "O", k % 5 * 100 / 100.0, dt.datetime(2024, 6, 1), "p")
        for k in range(5)
    ]
    _write(spark, tmp_path, "orders", orders, ORDER_SCHEMA)
    _write(spark, tmp_path, "customer", custs, CUST_SCHEMA)
    rows = {
        r["fold"]: r
        for r in QUERIES["target_encode_kfold"](spark, str(tmp_path)).collect()
    }
    assert len(rows) == 5
    total = sum(f * 100 for f in range(5))  # 1000
    for f in range(5):
        want = round((total - f * 100) / 4.0, 6)
        assert rows[f]["n_rows"] == 1 and rows[f]["n_oof"] == 4
        assert rows[f]["encoded_cents"] == want
        if f != 2:  # the symmetric middle fold happens to equal it
            assert rows[f]["encoded_cents"] != 200.0  # leaky naive mean


def test_mutual_info_independence_and_dependence(spark, tmp_path):
    """Uniform lang x source cross product -> MI exactly 0; lang a
    deterministic function of source -> MI = H(lang)."""
    indep = []
    i = 0
    for lang in ("en", "de"):
        for src in ("a", "b"):
            for _ in range(25):
                indep.append((i, "t", lang, src, 10))
                i += 1
    _write(spark, tmp_path, "documents", indep, DOC_SCHEMA)
    row = QUERIES["mutual_info_features"](spark, str(tmp_path)).first()
    assert row["n_docs"] == 100 and row["n_cells"] == 4
    assert row["mi_bits"] == 0.0

    dep = [
        (i, "t", "en" if i % 2 == 0 else "de", "a" if i % 2 == 0 else "b", 10)
        for i in range(100)
    ]
    _write(spark, tmp_path, "documents", dep, DOC_SCHEMA)
    row = QUERIES["mutual_info_features"](spark, str(tmp_path)).first()
    assert row["mi_bits"] == row["h_lang_bits"] == pytest.approx(1.0, abs=1e-5)


def test_theil_decomposition_within_zero(spark, tmp_path):
    """Everyone within a segment earns the same -> within-group Theil
    is exactly 0 and total inequality equals the between component."""
    custs, orders = [], []
    ck = 0
    for seg, cents, n in (("BUILDING", 1000, 10), ("MACHINERY", 9000, 10)):
        for _ in range(n):
            custs.append((ck, "x", 0, 0.0, seg))
            orders.append(
                (ck, ck, "O", cents / 100.0, dt.datetime(2024, 6, 1), "p")
            )
            ck += 1
    _write(spark, tmp_path, "orders", orders, ORDER_SCHEMA)
    _write(spark, tmp_path, "customer", custs, CUST_SCHEMA)
    row = QUERIES["theil_inequality_decomposition"](
        spark, str(tmp_path)
    ).first()
    assert row["theil_within"] == 0.0
    assert row["theil_total"] == pytest.approx(row["theil_between"], abs=2e-6)
    assert row["between_share"] == 1.0
    assert row["theil_total"] > 0


def test_dynamic_gap_respects_event_type(spark, tmp_path):
    """A purchase holds its session open 30 minutes, a view only 10:
    the same 25-minute spacing merges for the purchase user and
    splits for the view user; session_end = max(ts + own gap)."""
    t0 = dt.datetime(2024, 3, 1, 10, 0, 0)
    t25 = dt.datetime(2024, 3, 1, 10, 25, 0)
    events = [
        (0, t0, 3, "purchase", 1.0, "{}"),
        (1, t25, 3, "view", 2.0, "{}"),
        (2, t0, 13, "view", 4.0, "{}"),
        (3, t25, 13, "view", 8.0, "{}"),
    ]
    _write(spark, tmp_path, "events", events, EVENT_SCHEMA)
    got = [
        (
            r["user_id"],
            r["session_start_us"],
            r["session_end_us"],
            r["n_events"],
            r["total_cents"],
        )
        for r in QUERIES["stream_dynamic_gap_sessions"](
            spark, str(tmp_path)
        ).collect()
    ]
    us = lambda d: int(d.replace(tzinfo=dt.timezone.utc).timestamp()) * 1_000_000  # noqa: E731
    mins = 60 * 1_000_000
    assert got == [
        # purchase user: one merged session ending at view ts + 10 min
        (3, us(t0), us(t25) + 10 * mins, 2, 300),
        # view user: two sessions, each 10 minutes after its event
        (13, us(t0), us(t0) + 10 * mins, 1, 400),
        (13, us(t25), us(t25) + 10 * mins, 1, 800),
    ]


def test_kcenter_greedy_farthest_first(spark, tmp_path):
    """Ten points on a line: the traversal must seed at vec_id 0,
    jump to the far end, then bisect; selection radii are
    non-increasing and centers never repeat."""
    rows = [
        (i, [float(i) * 1.0] + [0.0] * 63, 0) for i in range(10)
    ]
    _write(
        spark,
        tmp_path,
        "embeddings",
        rows,
        "vec_id bigint, embedding array<float>, label int",
    )
    got = QUERIES["coreset_kcenter_greedy"](spark, str(tmp_path)).collect()
    order = [r["vec_id"] for r in got]
    assert order[0] == 0
    assert order[1] == 9  # farthest from the seed (81)
    assert order[2] == 4  # min(16, 25) = 16 beats every alternative
    assert len(set(order)) == 8
    radii = [r["min_dist_sq"] for r in got[1:]]
    assert radii == sorted(radii, reverse=True)
    assert got[1]["min_dist_sq"] == 81.0 and got[2]["min_dist_sq"] == 16.0


# ------------------------------------------------------------ real-data axioms


def test_kmv_degenerates_to_exact_below_k(spark):
    """At the smoke SF both audiences hold fewer than k=256 users, so
    the KMV rule returns the exact counts as estimates."""
    row = QUERIES["kmv_distinct_intersect"](spark, SF_SMOKE).first()
    assert row["k"] == 256
    assert row["exact_a"] < 256 and row["exact_b"] < 256
    assert row["est_a"] == float(row["exact_a"])
    assert row["est_b"] == float(row["exact_b"])
    assert row["est_intersect"] == float(row["exact_intersect"])
    assert row["exact_intersect"] <= min(row["exact_a"], row["exact_b"])


def test_mi_bounded_by_marginal_entropies(spark):
    """Real-data information inequalities: 0 <= MI <= min(H(X), H(Y)),
    and H(X,Y) <= H(X) + H(Y)."""
    row = QUERIES["mutual_info_features"](spark, SF_SMOKE).first()
    assert row["mi_bits"] >= 0.0
    assert row["mi_bits"] <= min(row["h_lang_bits"], row["h_source_bits"]) + 1e-6
    assert row["h_joint_bits"] <= row["h_lang_bits"] + row["h_source_bits"] + 1e-6


def test_theil_components_sum(spark):
    """Real-data Theil: both components non-negative and they sum to
    the total (up to the 6-dp quantization)."""
    row = QUERIES["theil_inequality_decomposition"](spark, SF_SMOKE).first()
    assert row["theil_between"] >= 0.0 and row["theil_within"] >= 0.0
    assert row["theil_between"] + row["theil_within"] == pytest.approx(
        row["theil_total"], abs=5e-6
    )


def test_full_outer_join_three_output_paths(spark, tmp_path):
    """Crafted slice (users % 10 == 6): a converting view, an orphan
    click (no view in the preceding 4 h), and an unconverted view —
    all three full-outer output paths with exact rows."""
    t = lambda h, m=0: dt.datetime(2024, 3, 1, h, m)  # noqa: E731
    events = [
        (0, t(10), 6, "view", 1.0, "{}"),
        (1, t(11), 6, "click", 1.0, "{}"),   # matched (within 4 h)
        (2, t(10), 16, "click", 1.0, "{}"),  # orphan click
        (3, t(23), 16, "view", 1.0, "{}"),   # unconverted view
    ]
    _write(spark, tmp_path, "events", events, EVENT_SCHEMA)
    got = {
        (r["user_id"], r["l_event_id"], r["r_event_id"])
        for r in QUERIES["stream_full_outer_join"](
            spark, str(tmp_path)
        ).collect()
    }
    # one matched pair, one unconverted view (right-null), one orphan
    # click (left-null)
    assert got == {(6, 0, 1), (16, 3, None), (16, None, 2)}


def test_edge_support_k4_plus_pendant(spark, tmp_path):
    """K4 on suppliers 1-4 (every edge in exactly 2 triangles) plus a
    pendant edge (4,5) with support 0."""
    rows = []
    ok = 0
    for _ in range(2):  # two shared orders -> pair counts hit the threshold
        for supp in (1, 2, 3, 4):
            rows.append((ok, supp))
        ok += 1
        rows.append((ok, 4))
        rows.append((ok, 5))
        ok += 1
    _write(
        spark, tmp_path, "lineitem", rows, "l_orderkey bigint, l_suppkey bigint"
    )
    got = {
        (r["s1"], r["s2"]): r["support"]
        for r in QUERIES["edge_triangle_support"](spark, str(tmp_path)).collect()
    }
    k4_edges = {(a, b) for a in range(1, 5) for b in range(a + 1, 5)}
    assert set(got) == k4_edges | {(4, 5)}
    assert all(got[e] == 2 for e in k4_edges)
    assert got[(4, 5)] == 0
