"""Bloom-prefilter membership + HLL sketch behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from video_metadata_db_spark.operators.membership import (
    DEFAULT_M_BITS,
    bloom_prefiltered_new_keys,
    build_bloom,
)
from video_metadata_db_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_bloom_matches_exact_anti_join(spark):
    orders = load_table(spark, SF, "orders")
    existing = orders.filter(F.col("o_orderkey") % 3 == 0)
    got = sorted(
        r.o_orderkey
        for r in bloom_prefiltered_new_keys(orders, existing, "o_orderkey")
        .select("o_orderkey")
        .collect()
    )
    want = sorted(
        r.o_orderkey
        for r in orders.join(existing.select("o_orderkey"), "o_orderkey", "left_anti")
        .select("o_orderkey")
        .collect()
    )
    assert got == want and got, "bloom path must be exactly the anti-join"


def test_bloom_bitmap_is_broadcastable(spark):
    orders = load_table(spark, SF, "orders")
    bitmap = build_bloom(orders, "o_orderkey")
    n_words = bitmap.count()
    assert n_words <= DEFAULT_M_BITS // 64, "bitmap must be bounded by m/64 words"
    # every word must carry at least one set bit (bit_or of non-zero masks)
    assert bitmap.filter(F.col("bits") == 0).count() == 0


def test_bloom_prunes_most_definite_news(spark):
    """Disjoint incoming keys should be nearly all 'definitely new' —
    the FP rate at these sizes is well under 1%, so the exact anti-join
    sees almost nothing."""
    orders = load_table(spark, SF, "orders")
    existing = orders.select((F.col("o_orderkey")).alias("k"))
    incoming = orders.select((F.col("o_orderkey") + 10_000_000).alias("k"))
    out = bloom_prefiltered_new_keys(incoming, existing, "k")
    assert out.count() == incoming.count(), "disjoint keys: everything is new"


def test_bloom_plan_shape(spark):
    """The probe side must be broadcast joins (never a shuffle of the
    incoming table onto bitmap words)."""
    orders = load_table(spark, SF, "orders")
    existing = orders.filter(F.col("o_orderkey") % 3 == 0)
    plan = bloom_prefiltered_new_keys(orders, existing, "o_orderkey")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 3, "k bitmap probes must broadcast"
    assert "CartesianProduct" not in plan


def test_hll_sketch_accuracy(spark):
    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    est = {
        r.event_type: r.approx_users
        for r in ev.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx_users"))
        .collect()
    }
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for et, n in exact.items():
        assert abs(est[et] - n) <= max(1, 0.05 * n), (et, est[et], n)
