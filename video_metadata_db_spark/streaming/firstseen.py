"""Streaming first-seen maintenance: fold each micro-batch's per-user
minimum activity day into a persistent (user_id, first_day) table under
the versioned-snapshot commit protocol of :mod:`.materialized`.

MIN is associative and commutative, so draining the corpus
batch-by-batch lands on exactly the first-seen table a one-shot batch
build produces — the registered streaming query
(`stream_reach_curve`) therefore shares the batch reach oracle's
new-user curve verbatim, making the merge property VERIFIED, not
claimed (the `sketches.py` CMS discipline applied to MIN state).
State is one row per user seen so far; reads anchor strictly below the
replaying batch_id for crash-replay idempotency.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .materialized import read_materialized


def first_seen_maintainer(state_dir: str, ts_col: str = "ts"):
    """foreachBatch callback maintaining ``{state_dir}/first_seen`` as
    versioned (user_id, first_day) snapshots."""

    def step(batch_events: DataFrame, batch_id: int) -> None:
        spark = batch_events.sparkSession
        batch_min = batch_events.groupBy("user_id").agg(
            F.min(F.col(ts_col).cast("date")).alias("first_day")
        )
        prev = read_materialized(spark, f"{state_dir}/first_seen", below=batch_id)
        if prev is None:
            merged = batch_min
        else:
            merged = (
                prev.unionByName(batch_min)
                .groupBy("user_id")
                .agg(F.min("first_day").alias("first_day"))
            )
        merged.write.mode("overwrite").parquet(
            os.path.join(state_dir, "first_seen", f"v={batch_id}")
        )

    return step


def read_first_seen(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """The current (user_id, first_day) table, or None before any batch."""
    return read_materialized(spark, f"{state_dir}/first_seen")
