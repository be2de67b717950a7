"""Stream-stream joins: watermarked interval (event-time-bounded) join.

Spark buffers both sides in the state store and the watermarks + the
time-range predicate bound how long: a left row can be evicted once the
right watermark passes ``left.ts + max_delay``.  Without the time bound
the state grows forever — the bound is not an optimization, it IS the
correctness contract at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    max_delay: str = "10 minutes",
    watermark: str = "10 minutes",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
    how: str = "inner",
) -> DataFrame:
    """Join of two event streams on ``key`` where the right event
    happens in ``[left.ts, left.ts + max_delay]``.

    Both sides need watermarks (state eviction); the join condition is
    an equi-key plus an event-time range — the attribution-join shape
    (impression → click within N minutes).  ``how="left_outer"`` adds
    the null-match rows for left events whose window expired with no
    partner — Spark emits those only when the GLOBAL watermark (min
    across sources) passes ``left.ts + max_delay``, i.e. in a LATER
    micro-batch; callers that drain with AvailableNow must ensure
    subsequent batches advance the watermark past the rows they expect
    flushed (see ``stream_left_outer_join``'s sentinel staging).

    ``how="full_outer"`` additionally emits null-matches for RIGHT
    rows no future left partner can reach.  Its eviction horizon is
    EARLIER than the left side's: the range condition
    ``l.ts <= r.ts <= l.ts + max_delay`` means a right row at t only
    matches left rows with ``l.ts in [t - max_delay, t]``, so its
    null-match flushes once the watermark passes ``t`` itself, while
    an unmatched left row waits until ``l.ts + max_delay``.  A
    sentinel staging that advances the watermark past
    ``max(l.ts) + max_delay`` therefore flushes BOTH paths (it is
    past every ``r.ts`` too) — the same staging
    ``stream_left_outer_join`` uses, verified end-to-end by
    ``stream_full_outer_join``'s batch FULL JOIN oracle.  The join
    key is taken from whichever side is non-null so right-only rows
    keep their key.
    """
    if how not in ("inner", "left_outer", "full_outer"):
        # right_outer stays rejected: nothing exercises its (mirror)
        # eviction path, and a silently wrong null-match is worse
        # than a loud error (ADVICE r9)
        raise ValueError(
            f"interval_join supports how in ('inner', 'left_outer',"
            f" 'full_outer'); got {how!r}"
        )
    l = left.withWatermark("ts", watermark).select(
        F.col(key),
        *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns if c != key],
    )
    r = right.withWatermark("ts", watermark).select(
        F.col(key).alias("__rkey"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns if c != key],
    )
    cond = (
        (F.col(key) == F.col("__rkey"))
        & (F.col(f"{right_prefix}ts") >= F.col(f"{left_prefix}ts"))
        & (F.col(f"{right_prefix}ts") <= F.col(f"{left_prefix}ts") + F.expr(f"INTERVAL {max_delay}"))
    )
    joined = l.join(r, cond, how)
    if how == "full_outer":
        # right-only rows carry a null left key — surface the key from
        # whichever side has it before dropping the internal alias
        joined = joined.withColumn(
            key, F.coalesce(F.col(key), F.col("__rkey"))
        )
    return joined.drop("__rkey")
