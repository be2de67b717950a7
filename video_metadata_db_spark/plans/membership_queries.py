"""Membership / sketch queries: the update-mode scale path.

``update_bloom_prefilter`` is the Bloom-accelerated version of
``update_anti_join`` — same exact semantics (the oracle is the plain
anti-join), different physical plan at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.membership import bloom_prefiltered_new_keys
from ..sources.tables import load_table
from .registry import query

_CUTOFF = "1997-01-01"


@query(
    "update_bloom_prefilter",
    oracle=f"""
SELECT o.o_orderkey, o.o_orderdate
FROM orders o
ANTI JOIN (SELECT o_orderkey FROM orders
           WHERE o_orderdate < TIMESTAMP '{_CUTOFF}') ex
  ON o.o_orderkey = ex.o_orderkey
ORDER BY o.o_orderkey
""",
)
def q_update_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-update membership at scale: orders probed before the
    cutoff form the existing db; the full feed is Bloom-prefiltered so
    only possibly-present rows pay the exact anti-join.

    Exactness: the result equals the plain ``left_anti`` join (Bloom
    false positives are re-verified), which is what the oracle runs.
    Reference semantics: video_metadata_db.py:427-452 (update check),
    corrected to a full-key match per SURVEY.md §2.4.
    """
    orders = load_table(spark, sf_dir, "orders")
    existing = orders.filter(F.col("o_orderdate") < F.lit(_CUTOFF).cast("timestamp"))
    new_rows = bloom_prefiltered_new_keys(orders, existing, "o_orderkey")
    return new_rows.select("o_orderkey", "o_orderdate").orderBy("o_orderkey")


@query("hll_sketch_users", oracle=None)
def q_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches: Datasketches HLL per event
    type via ``hll_sketch_agg`` → ``hll_sketch_estimate``.

    Unlike ``approx_count_distinct`` this keeps the SKETCH mergeable
    across partitions/days — the building block for incremental rollups
    at 100 TB (store the binary sketch, union later). Rows-only check:
    estimates are implementation-defined (accuracy pinned by
    ``test_hll_sketch_accuracy`` instead).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


@query("wau_hll_rollup", oracle=None)
def q_wau_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users from MERGED per-day HLL sketches —
    the 100 TB architecture for `rolling_active_users`: the corpus is
    touched ONCE to build one mergeable sketch per day (at scale these
    persist as the incremental rollup state), then every report day is
    a union of 7 day-sketches — re-windowing (7→28 days, month ends)
    never rescans raw events, only re-merges day sketches.

    Same exploded-contribution shape as the exact twin, but the shuffle
    payload is |days|·7 fixed-size sketches instead of 7·|user-days|
    user rows.  Rows-only check (estimates are implementation-defined);
    accuracy vs the exact query is pinned by
    ``test_wau_hll_tracks_exact``."""
    ev = load_table(spark, sf_dir, "events")
    day_sk = (
        ev.select(F.date_trunc("day", "ts").cast("date").alias("day"), "user_id")
        .groupBy("day")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
    )
    contrib = day_sk.select(
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 6))).alias(
            "report_day"
        ),
        "sk",
    )
    actual = day_sk.select(F.col("day").alias("report_day"))
    return (
        contrib.join(F.broadcast(actual), "report_day", "left_semi")
        .groupBy("report_day")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sk"))
            .cast("long")
            .alias("wau7_estimate")
        )
        .select(F.col("report_day").alias("day"), "wau7_estimate")
        .orderBy("day")
    )


@query("percentiles_approx_sketch", oracle=None)
def q_percentiles_approx_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB percentile path: ``approx_percentile`` (mergeable
    quantile sketch, map-side combinable — no full per-group sort) for
    the same p50/p90/p99 surface `agg_percentiles` computes exactly.
    Registered rows-only (sketch estimates are implementation-defined);
    accuracy vs the exact twin is pinned by
    ``test_approx_percentile_tracks_exact``, completing the
    exact-twin-plus-sketch pairing the distinct-count family already
    has (`distinct_users_exact` / `hll_sketch_users`)."""
    ev = load_table(spark, sf_dir, "events")
    pct = F.expr("approx_percentile(value, array(0.5D, 0.9D, 0.99D), 10000)")
    return (
        ev.groupBy("event_type")
        .agg(pct.alias("p"))
        .select(
            "event_type",
            F.round(F.col("p")[0], 6).alias("p50"),
            F.round(F.col("p")[1], 6).alias("p90"),
            F.round(F.col("p")[2], 6).alias("p99"),
        )
        .orderBy("event_type")
    )
