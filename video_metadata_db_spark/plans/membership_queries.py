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


#: Hash-count for the FPR audit's bloom (same k as the engine path).
_FPR_K = 3


@query(
    "bloom_fpr_audit",
    oracle=f"""
WITH sized AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         (1 + count(*) // 4) * 64 AS m
  FROM orders
),
seeds AS (SELECT unnest(generate_series(0, {_FPR_K - 1})) AS i),
epos AS (
  SELECT DISTINCT
         CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)
                                       || '#' || i), 1, 8)) AS BIGINT)
           % m AS pos
  FROM orders CROSS JOIN sized CROSS JOIN seeds
),
ppos AS (
  SELECT o_orderkey AS key,
         CAST(concat('0x', substr(md5(CAST(o_orderkey + 10000000 AS VARCHAR)
                                       || '#' || i), 1, 8)) AS BIGINT)
           % m AS pos
  FROM orders CROSS JOIN sized CROSS JOIN seeds
),
flags AS (
  SELECT key,
         min(CASE WHEN e.pos IS NOT NULL THEN 1 ELSE 0 END) AS all_hit
  FROM ppos p LEFT JOIN epos e ON p.pos = e.pos
  GROUP BY key
)
SELECT n AS n_existing,
       CAST(m AS BIGINT) AS m_bits,
       CAST((SELECT count(*) FROM flags) AS BIGINT) AS n_probes,
       CAST((SELECT SUM(all_hit) FROM flags) AS BIGINT)
         AS false_positives,
       round((SELECT SUM(all_hit) FROM flags)
             / CAST((SELECT count(*) FROM flags) AS DOUBLE), 6)
         AS fpr_measured,
       round(pow(1.0 - exp(-{_FPR_K}.0 * n / m), {_FPR_K}), 6)
         AS fpr_theory
FROM sized
""",
)
def q_bloom_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM FALSE-POSITIVE-RATE audit — the sizing check behind
    `update_bloom_prefilter`'s scale story, measured instead of
    trusted: build the (word, bits) bitmap over the existing keys,
    probe with a key set KNOWN absent (keys shifted by 10M), and
    report the measured FPR next to the (1 − e^(−kn/m))^k theory
    value.  The bitmap is sized by pure INTEGER arithmetic
    (m = 64·(1 + n div 4) ≈ 16 bits/key) so both engines compute the
    identical m with no log/ceil, and the ~0.5% design point holds at
    every SF.

    The hash is the repo's replayable md5 recipe (32-bit hex prefix,
    per-row salt), NOT the engine path's xxhash64 — the engine's
    bitmap never needs oracle replay (only its final membership answer
    does, `update_bloom_prefilter`); THIS query's entire point is the
    replay.  Scale: bitmap = one bit_or aggregate into m/64 words
    (broadcastable); probes take one broadcast join per hash row —
    same topology as the production prefilter."""
    orders = load_table(spark, sf_dir, "orders")
    # sized (ONE row) is consumed by both probe builds and the final
    # select — the eager checkpoint bounds the sizing count to one run.
    sized = (
        orders.agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select("n", ((F.lit(1) + F.floor(F.col("n") / 4)) * 64).alias("m"))
        .localCheckpoint(eager=True)
    )

    def positions(key_str: F.Column) -> F.Column:
        # pos per (key, i): md5 32-bit prefix mod m — m rides along as
        # a column from the broadcast sizing row
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat_ws("#", key_str, F.col("i"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % F.col("m")
        )

    seeds = F.expr(f"explode(sequence(0, {_FPR_K - 1}))").alias("i")
    base = orders.select("o_orderkey").crossJoin(F.broadcast(sized))
    epos = (
        base.select("m", F.col("o_orderkey").cast("string").alias("k"), seeds)
        .select(positions(F.col("k")).alias("pos"))
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    ppos = base.select(
        "m",
        "o_orderkey",
        (F.col("o_orderkey") + 10000000).cast("string").alias("k"),
        seeds,
    ).select("o_orderkey", positions(F.col("k")).alias("pos"))
    flags = (
        ppos.join(F.broadcast(epos), "pos", "left")
        .groupBy("o_orderkey")
        .agg(F.min(F.coalesce(F.col("hit"), F.lit(0))).alias("all_hit"))
    )
    counts = flags.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum("all_hit").cast("long").alias("false_positives"),
    )
    return sized.crossJoin(F.broadcast(counts)).select(
        F.col("n").alias("n_existing"),
        F.col("m").cast("long").alias("m_bits"),
        "n_probes",
        "false_positives",
        F.round(
            F.col("false_positives") / F.col("n_probes").cast("double"), 6
        ).alias("fpr_measured"),
        F.round(
            F.pow(
                1.0 - F.exp(-float(_FPR_K) * F.col("n") / F.col("m")),
                _FPR_K,
            ),
            6,
        ).alias("fpr_theory"),
    )
