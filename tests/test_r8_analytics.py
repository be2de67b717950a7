"""Semantic / property tests for the round-8 operators — the behavior
the DuckDB oracles can't pin (oracles prove Spark == SQL; these prove
the statistic itself does what it claims)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from video_metadata_db_spark.operators.analytics import theil_sen
from video_metadata_db_spark.plans import QUERIES

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECTNESS = "/root/testdata/sf0.01"


def test_theil_sen_shrugs_off_outlier(spark):
    """One corrupted point (2% contamination) must barely move the
    Theil-Sen slope while visibly dragging OLS — the 29% breakdown
    property that justifies the pair-median cost."""
    pts = [(float(i), 2.0 * i + 1.0) for i in range(50)]
    pts[49] = (49.0, 1000.0)  # corrupted day at max leverage
    df = spark.createDataFrame(pts, "x double, y double")
    row = theil_sen(df).collect()[0]
    assert row.n_points == 50
    assert abs(row.theil_slope - 2.0) < 0.05
    assert row.ols_slope > 2.5  # OLS is dragged by the single outlier
    assert abs(row.theil_intercept - 1.0) < 2.0


def test_theil_sen_degenerate_x(spark):
    """< 2 distinct x values: no pairwise slope exists, so the fallback
    row must come back (n_points, null, null, null-ols) instead of an
    ANSI DIVIDE_BY_ZERO from var_pop(x) == 0 (ADVICE r9 — reproduced
    with a single-point input before the try_divide fix)."""
    for pts in ([(3.0, 7.0)], [(3.0, 7.0), (3.0, 9.0)]):
        df = spark.createDataFrame(pts, "x double, y double")
        row = theil_sen(df).collect()[0]
        assert row.n_points == len(pts)
        assert row.theil_slope is None
        assert row.theil_intercept is None
        assert row.ols_slope is None  # var_pop(x)=0 -> try_divide null


def test_span_dedup_flags_exactly_the_shared_span(spark, tmp_path):
    """Constructed corpus: doc0 and doc1 share one aligned 8-token
    span, doc2 is unique -> exactly 2 of 6 spans flagged."""
    shared = " ".join(f"s{i}" for i in range(8))
    uniq = lambda tag: " ".join(f"{tag}{i}" for i in range(8))  # noqa: E731
    rows = [
        (0, f"{shared} {uniq('a')}", "en", "web", 100),
        (1, f"{shared} {uniq('b')}", "en", "web", 100),
        (2, f"{uniq('c')} {uniq('d')}", "en", "web", 100),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).repartition(1).write.mode("overwrite").parquet(f"{tmp_path}/documents.parquet")
    out = QUERIES["span_dedup_crossdoc"](spark, str(tmp_path)).collect()
    assert len(out) == 1 and out[0].source == "web"
    assert out[0].n_spans == 6
    assert out[0].n_dup_spans == 2  # the shared span, once per doc
    assert out[0].dup_ratio == round(2 / 6, 6)  # output rounds at 6 dp


def test_record_linkage_blocking_has_full_recall(spark):
    """The blocking key (last-3 name digits) is typo-invariant and the
    lev<=2 band admits the injected typo, so every dirty record's true
    master must be recovered: sum(n_true) == |dirty feed|."""
    out = QUERIES["record_linkage_blocking"](spark, SF_SMOKE).collect()
    from video_metadata_db_spark.sources.tables import load_table

    n_dirty = (
        load_table(spark, SF_SMOKE, "customer")
        .filter(F.col("c_custkey") % 7 == 0)
        .count()
    )
    assert sum(r.n_true for r in out) == n_dirty
    # and blocking admits imposters, so precision is a real number
    assert any(r.n_matched > r.n_true for r in out) or all(
        r.match_precision == 1.0 for r in out
    )


def test_zorder_layout_actually_skips(spark):
    """The audit must show the point: natural order skips ~nothing,
    z-order confines the quarter-x-quarter box to a small file set,
    and both layouts agree on the true matching rows."""
    rows = {r.layout: r for r in QUERIES["zorder_skipping_audit"](spark, SF_SMOKE).collect()}
    nat, z = rows["natural"], rows["zorder"]
    assert nat.files_total == z.files_total == 64
    assert z.files_read < nat.files_read / 2
    assert z.rows_matching == nat.rows_matching
    assert z.scan_saved > 0.5 and nat.scan_saved < 0.2


def test_zorder_morton_code_bit_exactness(spark):
    from video_metadata_db_spark.plans.lake_queries import _z16

    expr = _z16("px", "py", "shiftright({x}, {i})")
    df = spark.createDataFrame(
        [(1, 0), (0, 1), (255, 255), (128, 0), (0, 128)], "px int, py int"
    ).select(F.expr(expr).alias("z"))
    assert [r.z for r in df.collect()] == [2, 1, 65535, 32768, 16384]


def test_poisson_cdf_constants_are_poisson_one():
    from video_metadata_db_spark.plans.stats_queries import _POIS_CDF

    cum = 0.0
    for k, c in enumerate(_POIS_CDF):
        cum += math.exp(-1) / math.factorial(k)
        assert abs(c - cum) < 1e-12, k


def test_poisson_bootstrap_interval_brackets_point(spark):
    """The 95% replicate interval must bracket the point estimate and
    have sane width (a few percent of the mean at sf0.01 scale)."""
    out = QUERIES["poisson_bootstrap_ci"](spark, SF_CORRECTNESS).collect()
    assert len(out) == 5
    for r in out:
        assert r.boot_lo <= r.point_mean <= r.boot_hi
        width = r.boot_hi - r.boot_lo
        assert 0 < width < 0.25 * r.point_mean


def test_conformal_coverage_guarantee(spark):
    """Split-conformal marginal guarantee: realized test coverage per
    segment stays near >= 90% (finite-sample slack only)."""
    out = QUERIES["conformal_interval_coverage"](spark, SF_CORRECTNESS).collect()
    assert len(out) == 5
    for r in out:
        slack = 3 * math.sqrt(0.1 * 0.9 / r.n_test)
        assert r.coverage >= 0.9 - slack, (r.seg, r.coverage)
    assert sum(r.coverage for r in out) / len(out) >= 0.89


def test_dsir_targets_the_target_slice(spark):
    """DSIR weights must rank the target ('en') slice first: the
    top-20 selection should be majority-en even on this vocabulary-
    shared synthetic corpus (en is ~44% of docs)."""
    out = QUERIES["dsir_importance_weights"](spark, SF_CORRECTNESS)
    from video_metadata_db_spark.sources.tables import load_table

    docs = load_table(spark, SF_CORRECTNESS, "documents").select("doc_id", "lang")
    top = out.join(docs, "doc_id")
    n_en = top.filter(F.col("lang") == "en").count()
    assert n_en > 10, n_en


def test_versioned_table_is_used_by_stream_cdc(spark):
    """stream_cdc_apply's final snapshot equals the batch cdc oracle's
    shape: monotonically versioned directory with v0 + one version per
    non-empty batch (2 here)."""
    import os
    import re

    df = QUERIES["stream_cdc_apply"](spark, SF_SMOKE)
    n = df.count()
    assert n > 0
    # the work dir is visible in the snapshot's input files
    files = " ".join(df.inputFiles())
    m = re.search(r"(/[^\s]*vmdb_scdc_[^/]*)/table/v(\d+)/", files)
    assert m, files[:500]
    root = m.group(1)
    versions = sorted(
        d for d in os.listdir(f"{root}/table") if re.fullmatch(r"v\d+", d)
    )
    assert versions == ["v0", "v1", "v2"]
    assert not [
        d for d in os.listdir(f"{root}/table") if d.endswith(".staging")
    ]


def _xy2d_reference(x: int, y: int) -> int:
    # pure-Python mirror of plans/lake_queries._hilbert_stage chain
    d, s = 0, 128
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = (s - 1) - x, (s - 1) - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_curve_is_bijective_and_adjacent():
    """The 8-level transform must be a true Hilbert curve: a bijection
    onto [0, 65536) whose consecutive d values are grid-adjacent
    (Manhattan distance exactly 1) — the locality property the
    skipping audit's claim rests on."""
    cells = {}
    for x in range(256):
        for y in range(256):
            cells[_xy2d_reference(x, y)] = (x, y)
    assert len(cells) == 65536
    for i in range(65535):
        (x0, y0), (x1, y1) = cells[i], cells[i + 1]
        assert abs(x0 - x1) + abs(y0 - y1) == 1, i


def test_hilbert_sql_chain_matches_reference(spark):
    from video_metadata_db_spark.plans.lake_queries import (
        _HILBERT_LEVELS,
        _hilbert_stage,
    )

    pts = [(x, y) for x in (0, 1, 7, 63, 128, 200, 255) for y in (0, 5, 99, 255)]
    df = spark.createDataFrame(pts, "px int, py int").selectExpr(
        "px", "py", "px AS hx", "py AS hy", "0 AS hd"
    )
    for s in _HILBERT_LEVELS:
        nx, ny, d = _hilbert_stage(s, lambda a, b: f"({a}) ^ ({b})")
        df = df.selectExpr("px", "py", f"{nx} AS hx", f"{ny} AS hy", f"{d} AS hd")
    got = {(r.px, r.py): r.hd for r in df.collect()}
    assert got == {(x, y): _xy2d_reference(x, y) for x, y in pts}


def test_hilbert_beats_or_ties_zorder_on_box_audit(spark):
    rows = {
        r.layout: r
        for r in QUERIES["hilbert_skipping_audit"](spark, SF_SMOKE).collect()
    }
    assert rows["hilbert"].rows_matching == rows["zorder"].rows_matching
    assert rows["hilbert"].files_read <= rows["zorder"].files_read


def test_exact_median_matches_percentile(spark):
    """exact_median (distributed kth selection) must equal the
    interpolated `percentile` aggregate on odd/even sizes, heavy ties,
    and a single-bucket frame."""
    from video_metadata_db_spark.operators.analytics import exact_median

    cases = [
        [1.0],
        [3.0, 1.0],
        [5.0, 1.0, 3.0],
        [2.0] * 10,
        [float(v) for v in range(101)],
        [float(v % 7) for v in range(1000)],
    ]
    for vals in cases:
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        want = df.agg(F.expr("percentile(v, 0.5)").alias("m")).collect()[0].m
        got = exact_median(df, "v")
        assert got == pytest.approx(want, abs=1e-12), vals[:5]
    assert exact_median(
        spark.createDataFrame([], "v double"), "v"
    ) is None


def test_packing_strategies_are_ordered(spark):
    """Waste must rank contiguous <= sorted_pairing <= one_doc_per_block
    — the tradeoff the comparison exists to show — and every strategy
    must account for the same total tokens."""
    rows = {
        r.strategy: r
        for r in QUERIES["packing_efficiency_compare"](spark, SF_SMOKE).collect()
    }
    c, p, n = (
        rows["contiguous_stream"],
        rows["sorted_pairing"],
        rows["one_doc_per_block"],
    )
    assert c.total_tokens == p.total_tokens == n.total_tokens
    assert c.waste_pct <= p.waste_pct <= n.waste_pct
    assert c.n_blocks <= p.n_blocks <= n.n_blocks
    for r in (c, p, n):
        assert r.n_blocks * 128 == r.total_tokens + r.padded_tokens


def test_nprobe_sweep_is_monotone(spark):
    """More probed lists can only widen the candidate set, so scanned
    pairs and recall must both be non-decreasing in n_probe."""
    rows = QUERIES["ivf_nprobe_tradeoff"](spark, SF_SMOKE).collect()
    probes = [r.n_probe for r in rows]
    assert probes == sorted(probes)
    scanned = [r.n_scanned_pairs for r in rows]
    recall = [r.recall_at_10 for r in rows]
    assert scanned == sorted(scanned)
    assert recall == sorted(recall)
    assert all(0.0 <= x <= 1.0 for x in recall)


def test_horvitz_thompson_is_accurate(spark):
    """Chars and tokens are strongly correlated, so the PPS/HT estimate
    of total chars from a token-weighted sample of ~20 docs should land
    within a few percent of the truth (measured <1% at every SF)."""
    r = QUERIES["horvitz_thompson_total"](spark, SF_SMOKE).collect()[0]
    assert r.n_draws >= r.n_sampled_docs > 0
    assert r.rel_err_pct < 5.0, r


def test_hits_scores_are_max_normalized(spark):
    rows = QUERIES["hits_hubs_authorities"](spark, SF_SMOKE).collect()
    by_kind = {}
    for r in rows:
        by_kind.setdefault(r.kind, []).append(r.score)
    for kind, scores in by_kind.items():
        assert len(scores) == 10, kind
        assert max(scores) == 1.0, kind  # top of each side is the unit
        assert all(0.0 < s <= 1.0 for s in scores), kind
