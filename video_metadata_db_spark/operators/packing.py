"""Sequence packing for LLM pretraining: concat-and-chunk offsets.

GPT-style pretraining concatenates the token streams of all documents
in a deterministic order and slices the result into fixed-size training
blocks; a document's placement is fully described by its START OFFSET
in the concatenated stream.  That makes packing a prefix-sum problem —
and a naive ``sum() OVER (ORDER BY ...)`` global window is a
single-partition bottleneck (every row through one task), the classic
scale trap for cumulative metrics.

:func:`sequence_offsets` is the distributed two-pass prefix sum:

1. bucket rows into contiguous key ranges with DETERMINISTIC boundaries
   (approx quantiles collected once driver-side, embedded as literals —
   a few dozen longs, not row data);
2. per-range totals (tiny: one row per range) get a running offset on
   the single-partition window over #ranges rows;
3. each row's global offset = its range's offset + the running sum
   WITHIN its range — per-range windows, full parallelism.

Every training example is then ``offset div block_size`` arithmetic —
no further shuffle.

Why literal boundaries instead of ``repartitionByRange`` +
``spark_partition_id``: the range partitioner SAMPLES its boundaries,
so two jobs over the same frame may disagree on partition ids unless
the frame is persisted — and the persist then outlives the call (a
cache leak, and a recompute hazard on executor loss).  With boundaries
frozen into the plan, ``_pid`` is a pure function of the row: the
totals job and the row job always agree, nothing needs pinning, and
the frame is scanned twice (both scans column-pruned) instead of
cached once — the right trade at 100 TB.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequence_offsets(
    df: DataFrame,
    order_col: str = "doc_id",
    weight_col: str = "n_tokens",
    num_ranges: int = 32,
    tiebreak_col: str | Sequence[str] | None = None,
) -> DataFrame:
    """Add ``start_offset``: the exclusive prefix sum of ``weight_col``
    in ``(order_col, *tiebreak_col)`` order, computed with bounded
    parallelism loss.

    ``(order_col, *tiebreak_col)`` must be unique per row (``order_col``
    alone suffices when it is itself unique, e.g. document ids; a list
    of tiebreaks composes a lexicographic order).  Rows equal on
    ``order_col`` always land in the same range bucket (the bucket test
    is strict-less-than against the boundaries), so the tiebreaks only
    ever order WITHIN a bucket — cross-bucket order stays correct.
    Output carries the input columns + ``start_offset``.
    """
    # one tiny driver-side action: num_ranges-1 boundary values — NOT
    # row data.  Embedding them as literals makes _pid deterministic
    # across every job that reads this plan (see module docstring).
    probs = [i / num_ranges for i in range(1, num_ranges)]
    bounds = (
        df.select(F.percentile_approx(order_col, probs, 10_000).alias("b")).first()["b"]
        if probs
        else None
    ) or []
    if bounds:
        # flat bucket search: how many boundaries sit strictly below the
        # key (monotone in the key, so ranges stay contiguous).  A flat
        # array expression, not a nested when-chain — O(num_ranges) per
        # row with no expression-tree depth blowup.
        bucket = F.size(
            F.filter(F.lit(list(bounds)), lambda b: b < F.col(order_col))
        )
    else:
        bucket = F.lit(0)
    with_pid = df.withColumn("_pid", bucket.cast("int"))

    totals = with_pid.groupBy("_pid").agg(F.sum(weight_col).alias("_psum"))
    # running offset over ≤ num_ranges rows — a deliberately tiny
    # single-partition window, NOT the row-level one.  partitionBy(lit)
    # is semantically the no-partition window but documents the bound
    # and silences the misleading WindowExec scale warning.
    off_w = (
        Window.partitionBy(F.lit(1))
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_poff", F.coalesce(F.sum("_psum").over(off_w), F.lit(0)).cast("long")
    ).select("_pid", "_poff")

    if tiebreak_col is None:
        in_order = [order_col]
    elif isinstance(tiebreak_col, str):
        in_order = [order_col, tiebreak_col]
    else:
        in_order = [order_col, *tiebreak_col]
    in_w = (
        Window.partitionBy("_pid")
        .orderBy(*in_order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        with_pid.join(F.broadcast(offsets), "_pid")
        .withColumn(
            "start_offset",
            (
                F.col("_poff")
                + F.coalesce(F.sum(weight_col).over(in_w), F.lit(0))
            ).cast("long"),
        )
        .drop("_pid", "_poff")
    )


def global_row_number(
    df: DataFrame,
    order_col: str,
    tiebreak_col: str | Sequence[str],
    out_col: str = "position",
    num_ranges: int = 32,
) -> DataFrame:
    """0-based global rank of every row in ``(order_col, *tiebreak_col)``
    order WITHOUT the single-reducer global window ``row_number()``
    forces — it is the prefix sum of weight 1 over the same distributed
    two-pass machinery as :func:`sequence_offsets`.

    The motivating use is the seeded training-order shuffle: rank the
    corpus by a deterministic per-row hash and the rank IS the epoch
    read order — computed with full parallelism at any corpus size.
    ``tiebreak_col`` must break hash collisions (any unique id).
    """
    weighted = df.withColumn("_one", F.lit(1))
    return (
        sequence_offsets(weighted, order_col, "_one", num_ranges, tiebreak_col)
        .withColumnRenamed("start_offset", out_col)
        .drop("_one")
    )


def pack_blocks(
    df: DataFrame,
    block_size: int,
    order_col: str = "doc_id",
    weight_col: str = "n_tokens",
    num_ranges: int = 32,
) -> DataFrame:
    """Per-document packing summary for fixed-size training blocks:
    which block the doc starts in, which it ends in, and how many
    blocks it spans.  Zero-weight docs contribute nothing to the stream
    and are dropped (they have no tokens to place)."""
    offs = sequence_offsets(
        df.filter(F.col(weight_col) > 0), order_col, weight_col, num_ranges
    )
    end = F.col("start_offset") + F.col(weight_col) - 1
    return offs.select(
        order_col,
        weight_col,
        "start_offset",
        (F.col("start_offset") / block_size).cast("long").alias("first_block"),
        (end / block_size).cast("long").alias("last_block"),
    ).withColumn("n_blocks", F.col("last_block") - F.col("first_block") + 1)
