"""As-of (most-recent-at-or-before) join — an operator Spark lacks.

The naive rendering is a range join (``l.ts >= r.ts`` + argmax), which
Catalyst executes as a broadcast-nested-loop with O(|L|·|R|) compare
cost per key.  The scale-correct rendering used here is the classic
union trick: tag both sides, union, ONE shuffle on the key, sort each
partition by (ts, side), and carry the right side's payload forward
with ``last(..., ignorenulls=True)`` over an unbounded-preceding
window.  Cost is a single sort-shuffle of |L|+|R| rows regardless of
time-range density — the same plan a time-series engine's ASOF JOIN
would pick, expressed entirely in Catalyst operators.

Tie semantics match DuckDB's ``ASOF JOIN`` with ``l.ts >= r.ts``:
right rows sort before left rows at equal timestamps, so an exact-ts
match is visible.  The right side must be unique per (key, ts) —
pre-aggregate it if not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    payload_prefix: str = "asof_",
) -> DataFrame:
    """Left as-of join: every left row + the payload of the latest right
    row with ``right.ts <= left.ts`` for the same ``by`` key (NULLs when
    no prior right row exists).

    All right columns except (by, ts) become ``{payload_prefix}{col}``;
    the matched right timestamp is ``{payload_prefix}{ts}``.
    """
    payload_cols = [c for c in right.columns if c not in (by, ts)]
    r = right.select(
        F.col(by),
        F.col(ts),
        F.col(ts).alias(f"{payload_prefix}{ts}"),
        *[F.col(c).alias(f"{payload_prefix}{c}") for c in payload_cols],
        F.lit(0).alias("__side"),
    )
    l = left.withColumn("__side", F.lit(1))
    unioned = l.unionByName(r, allowMissingColumns=True)

    w = (
        Window.partitionBy(by)
        .orderBy(F.col(ts).asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = [f"{payload_prefix}{ts}"] + [f"{payload_prefix}{c}" for c in payload_cols]
    for c in carried:
        unioned = unioned.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return unioned.filter(F.col("__side") == 1).select(*left.columns, *carried)


def time_proximity_pairs(
    events: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    max_gap_s: int,
) -> DataFrame:
    """All (earlier, later) event pairs on the same ``key`` within
    ``max_gap_s`` seconds — the binned-range-join scale pattern.

    The naive rendering (non-equi ``b.ts BETWEEN a.ts AND a.ts + gap``)
    is a nested-loop join: O(n²) per key, and Catalyst can only
    broadcast-nested-loop it.  Here the range key is BINNED: each left
    row is emitted into its own ``max_gap_s``-wide time bucket AND the
    next one (any partner ≤ gap later lives in one of the two), the
    right side keeps its single bucket, and the join becomes an
    EQUI-join on (key, bucket) — shuffle-partitionable, AQE-skew-
    splittable, O(pairs-in-bucket) instead of O(n²).  The exact
    predicate filters bucket-mates just outside the gap; each
    qualifying pair matches exactly once (the partner's bucket is
    unique).  This is the same trick the similarity module uses for
    LSH bands and IVF cells: turn a range/level predicate into an
    equality on a coarse cell, verify exactly within the cell.
    """
    bucket = F.floor(F.unix_timestamp(F.col(ts)) / F.lit(max_gap_s))
    a = events.select(
        F.col(key).alias("k"),
        F.col(ts).alias("ts_a"),
        F.col(id_col).alias("id_a"),
        F.explode(F.array(bucket, bucket + 1)).alias("bucket"),
    )
    b = events.select(
        F.col(key).alias("k"),
        F.col(ts).alias("ts_b"),
        F.col(id_col).alias("id_b"),
        bucket.alias("bucket"),
    )
    gap_s = (F.unix_micros(F.col("ts_b")) - F.unix_micros(F.col("ts_a"))) / 1e6
    return (
        a.join(b, ["k", "bucket"])
        .filter(
            (F.struct(F.col("ts_a"), F.col("id_a")) < F.struct(F.col("ts_b"), F.col("id_b")))
            & (gap_s <= max_gap_s)
        )
        .select(F.col("k").alias(key), "id_a", "id_b", F.round(gap_s, 6).alias("gap_s"))
    )
