"""Training-shard export — the sink end of the curation pipeline.

A training run consumes the corpus as FIXED-SIZE, GLOBALLY-ORDERED
shards (data loaders assign shard files to workers and stream them in
order), plus a manifest the loader uses to plan epochs without opening
files.  This sink produces both from any ordered frame:

- shard assignment is ``position // rows_per_shard`` where ``position``
  is the distributed prefix-sum rank (:func:`~..operators.packing.
  global_row_number`) — NO single-reducer global window at any corpus
  size, and the assignment is deterministic (seeded-hash order +
  unique-id tiebreak), so a re-export reproduces byte-identical shard
  membership;
- the write is ONE shuffle: ``repartition(shard)`` then
  ``partitionBy(shard)`` parquet, each shard its own directory —
  loaders address shards by path, Spark prunes by shard on re-read;
- the manifest is an aggregate (shards × few columns — driver-safe at
  any scale): rows, token sum, and the [first, last] position range
  per shard, written alongside the data.  Position ranges are dense
  and non-overlapping by construction; the test pins it.

The reference has no export surface beyond its TSV writer
(video_metadata_db.py:215-400, `save_video_information`); this is the
extension sink a pretraining pipeline actually feeds.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.packing import global_row_number


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    rows_per_shard: int,
    order_col: str,
    tiebreak_col: str,
    token_col: str | None = None,
) -> DataFrame:
    """Export ``df`` as globally-ordered parquet shards of
    ``rows_per_shard`` rows (last shard ragged) under
    ``out_dir/data/shard=N/``, manifest at ``out_dir/manifest/``.
    Returns the manifest DataFrame (shard, n_rows, first_position,
    last_position[, n_tokens]).

    ``order_col`` must be NUMERIC (the rank's quantile pass samples
    it); for a seeded-hash order, convert the hex digest first —
    ``conv(substring(md5(...), 1, 15), 16, 10).cast('long')`` — the
    same recipe `shuffle_global_order` ships."""
    if rows_per_shard <= 0:
        raise ValueError(f"rows_per_shard must be positive, got {rows_per_shard}")
    ranked = global_row_number(df, order_col, tiebreak_col).withColumn(
        "shard", (F.col("position") / rows_per_shard).cast("long")
    )
    (
        ranked.repartition("shard")
        .sortWithinPartitions("position")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(out_dir, "data"))
    )
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.min("position").alias("first_position"),
        F.max("position").alias("last_position"),
    ]
    if token_col is not None:
        aggs.append(F.sum(token_col).cast("long").alias("n_tokens"))
    manifest = ranked.groupBy("shard").agg(*aggs).orderBy("shard")
    manifest.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "manifest")
    )
    return manifest


def read_training_shards(
    spark: SparkSession, out_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(data, manifest) back from an export — data carries the shard
    partition column for pruned per-shard reads."""
    return (
        spark.read.parquet(os.path.join(out_dir, "data")),
        spark.read.parquet(os.path.join(out_dir, "manifest")),
    )
