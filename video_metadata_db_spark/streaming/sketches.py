"""Streaming count-min maintenance: fold each micro-batch's term
counts into a persistent CMS cell table under the versioned-snapshot
commit protocol of :mod:`.materialized`.

Because sketch cells are SUMS (:func:`..operators.sketches.cms_merge`),
draining a corpus batch-by-batch lands on exactly the cell table a
one-shot batch build produces — so the registered streaming query
(`stream_cms_heavy_hitters`) shares the batch query's full value
oracle verbatim, making mergeability a VERIFIED property, not a
claim.  State is DEPTH×WIDTH rows (4 KiB of counters) per snapshot;
reads anchor strictly below the replaying batch_id for crash-replay
idempotency (the r4-advice protocol, inherited for free).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import tokens_of
from ..operators.sketches import cms_cells, cms_merge
from .materialized import read_materialized


def cms_state_maintainer(state_dir: str, text_col: str = "text"):
    """foreachBatch callback maintaining ``{state_dir}/cells`` as
    versioned CMS snapshots.  Pass to ``runner.run_foreach_batch``."""

    def step(batch_docs: DataFrame, batch_id: int) -> None:
        spark = batch_docs.sparkSession
        toks = batch_docs.select(
            F.explode(tokens_of(F.col(text_col))).alias("term")
        )
        freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("cnt"))
        batch_cells = cms_cells(freq)
        prev = read_materialized(spark, f"{state_dir}/cells", below=batch_id)
        merged = batch_cells if prev is None else cms_merge(prev, batch_cells)
        merged.write.mode("overwrite").parquet(
            os.path.join(state_dir, "cells", f"v={batch_id}")
        )

    return step


def read_cms_cells(spark: SparkSession, state_dir: str) -> DataFrame | None:
    """The current (i, bucket, cell) sketch, or None before any batch."""
    return read_materialized(spark, f"{state_dir}/cells")
