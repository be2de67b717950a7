"""Sequence packing for LLM pretraining: concat-and-chunk offsets.

GPT-style pretraining concatenates the token streams of all documents
in a deterministic order and slices the result into fixed-size training
blocks; a document's placement is fully described by its START OFFSET
in the concatenated stream.  That makes packing a prefix-sum problem —
and a naive ``sum() OVER (ORDER BY ...)`` global window is a
single-partition bottleneck (every row through one task), the classic
scale trap for cumulative metrics.

:func:`sequence_offsets` is the distributed two-pass prefix sum:

1. range-partition by the order key (contiguous key ranges per
   partition — the same exchange a global sort would do, minus the
   single-reducer window);
2. per-partition totals (tiny: one row per partition) get a running
   offset on the driver-side-free single-partition window over
   #partitions rows;
3. each row's global offset = its partition's offset + the running sum
   WITHIN its partition — per-partition windows, full parallelism.

Every training example is then ``offset div block_size`` arithmetic —
no further shuffle.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sequence_offsets(
    df: DataFrame,
    order_col: str = "doc_id",
    weight_col: str = "n_tokens",
    num_ranges: int = 32,
) -> DataFrame:
    """Add ``start_offset``: the exclusive prefix sum of ``weight_col``
    in ``order_col`` order, computed with bounded parallelism loss.

    The order key must be unique (document ids are).  Output carries
    the input columns + ``start_offset``.
    """
    # persist BEFORE branching: the partition-totals job and the row
    # job both read this frame, and the range partitioner's sampled
    # boundaries are not guaranteed identical across re-executions — a
    # re-sample would let the two sides disagree on _pid (silent wrong
    # offsets).  The persist pins one materialized partitioning.
    ranged = df.repartitionByRange(num_ranges, F.col(order_col)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    with_pid = ranged.withColumn("_pid", F.spark_partition_id())

    totals = with_pid.groupBy("_pid").agg(F.sum(weight_col).alias("_psum"))
    # running offset over ≤ num_ranges rows — a deliberately tiny
    # single-partition window, NOT the row-level one
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.withColumn(
        "_poff", F.coalesce(F.sum("_psum").over(off_w), F.lit(0)).cast("long")
    ).select("_pid", "_poff")

    in_w = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
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
