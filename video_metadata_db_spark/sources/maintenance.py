"""Table maintenance: small-file compaction and sort-clustered rewrite.

A 100 TB lake accretes files from every ingest batch and streaming
micro-batch; thousands of small files per partition turn scan planning
and task scheduling into the bottleneck (the metadata analogue of the
reference's per-file ffprobe overhead).  Compaction rewrites a
directory to ~target-size files; clustering additionally range-sorts
rows so each output file owns a disjoint key range — parquet footer
min/max stats then prune whole FILES for key-range predicates, the
poor-engine's zone map.

Sizing reads the Hadoop ``ContentSummary`` of the input path (no data
scan), so the decision "how many output files" costs one namenode
call at any scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def input_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` via the Hadoop FileSystem API — works
    for local paths, HDFS, and object stores alike; never scans data."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def compact_parquet(
    spark: SparkSession,
    in_dir: str,
    out_dir: str,
    target_bytes: int = 128 << 20,
    sort_col: str | None = None,
) -> DataFrame:
    """Rewrite ``in_dir`` into ``out_dir`` as ≈``target_bytes`` files.

    ``sort_col=None``: round-robin ``repartition`` — pure compaction,
    one shuffle.  With ``sort_col``: ``repartitionByRange`` +
    ``sortWithinPartitions`` — same shuffle count, but each output file
    covers a DISJOINT sort-key range, so key-range scans prune at file
    granularity via footer stats.  Returns the frame read back from
    ``out_dir`` (callers verify row parity against the source cheaply).
    """
    df = spark.read.parquet(in_dir)
    n_files = max(1, math.ceil(input_bytes(spark, in_dir) / target_bytes))
    if sort_col is not None:
        out = df.repartitionByRange(n_files, F.col(sort_col)).sortWithinPartitions(
            sort_col
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(out_dir)
    return spark.read.parquet(out_dir)
