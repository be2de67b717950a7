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
