"""Incremental materialized aggregates over a stream — foreachBatch
upsert with versioned parquet commits.

The production pattern: a stream keeps a queryable table of lifetime
per-key aggregates fresh (feature store, serving rollup) by MERGING
each micro-batch's partial aggregate into the stored table — without
reprocessing history and without a lakehouse format dependency.

Commit protocol (a deliberately minimal Delta-commit analogue):
each refresh writes a COMPLETE new snapshot under ``v=<batch_id>/``
inside the table directory; readers resolve the highest committed
version and read only it.  Writes never touch a directory a reader
could be mid-scan in (snapshots are immutable once written), and a
failed write leaves only an orphan higher directory with no effect on
readers until its ``_SUCCESS`` marker exists.  Replayed batches (same
``batch_id`` after a restart from the checkpoint) overwrite their own
version directory, and — crucially — the merge reads the highest
committed version STRICTLY BELOW the replaying ``batch_id``, never the
global latest.  Otherwise a crash after snapshot ``v=N`` committed but
before the stream checkpoint recorded batch N would replay batch N on
top of a snapshot that already contains it, double-counting.  Anchoring
the read below ``batch_id`` makes the overwrite truly idempotent, which
together with the source checkpoint gives effective exactly-once table
maintenance.

At scale: per batch, cost = batch partial aggregate (tiny) + one
|keys|-sized merge shuffle + snapshot write.  For key spaces too large
to rewrite per batch, partition the snapshot by a stable key hash and
rewrite only partitions containing updated keys — same protocol, finer
commit units.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VERSION_RE = re.compile(r"^v=(\d+)$")


def _committed_versions(table_dir: str) -> list[int]:
    if not os.path.isdir(table_dir):
        return []
    out = []
    for name in os.listdir(table_dir):
        m = _VERSION_RE.match(name)
        if m and os.path.exists(os.path.join(table_dir, name, "_SUCCESS")):
            out.append(int(m.group(1)))
    return sorted(out)


def read_materialized(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    *,
    below: int | None = None,
) -> DataFrame | None:
    """A committed snapshot: the current one (highest version) by
    default, or TIME TRAVEL to any retained ``version`` — every
    snapshot is a complete immutable table, so historical reads are a
    directory pick, not a log replay.  ``below`` restricts resolution
    to versions strictly less than it (the replay-idempotence anchor
    used by :func:`upsert_user_totals`).  None before the first
    refresh (or when no version < ``below`` exists); ValueError for a
    version that was never committed or was retired by
    :func:`retain_versions`."""
    versions = _committed_versions(table_dir)
    if below is not None:
        versions = [v for v in versions if v < below]
    if not versions:
        return None
    if version is None:
        version = versions[-1]
    elif version not in versions:
        raise ValueError(f"version {version} not committed; have {versions}")
    return spark.read.parquet(os.path.join(table_dir, f"v={version}"))


def retain_versions(table_dir: str, keep_last: int = 2) -> list[int]:
    """Retention: drop all but the newest ``keep_last`` committed
    snapshots (each snapshot is a full copy, so storage is
    versions × |keys| — bounded by retention, exactly like lakehouse
    VACUUM).  Returns the versions removed.  Never touches the current
    snapshot; safe to run concurrently with readers of RETAINED
    versions (removed ones must be outside any reader's pin window —
    the same contract VACUUM has)."""
    import shutil

    versions = _committed_versions(table_dir)
    drop = versions[:-keep_last] if keep_last > 0 else versions
    for v in drop:
        shutil.rmtree(os.path.join(table_dir, f"v={v}"))
    return drop


def upsert_user_totals(table_dir: str):
    """foreachBatch callback maintaining per-user lifetime totals:
    batch partials merged with the previous snapshot into version
    ``v=<batch_id>``.  Pass to ``runner.run_foreach_batch``."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        partial = batch_df.groupBy("user_id").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        # anchor the read below batch_id: on replay after a crash where
        # v=batch_id committed but the stream checkpoint did not, the
        # global latest would BE v=batch_id (already containing this
        # batch) and the merge would double-count it
        prev = read_materialized(spark, table_dir, below=batch_id)
        if prev is not None:
            merged = (
                prev.unionByName(partial)
                .groupBy("user_id")
                .agg(
                    F.sum("n_events").cast("long").alias("n_events"),
                    F.sum("total_value").alias("total_value"),
                )
            )
        else:
            merged = partial
        merged.write.mode("overwrite").parquet(
            os.path.join(table_dir, f"v={batch_id}")
        )

    return merge


def snapshot_diff(
    spark: SparkSession,
    table_dir: str,
    v_old: int,
    v_new: int,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Time-travel CDC: what changed between two committed snapshot
    versions of a materialized table — :func:`~..operators.diff.corpus_diff`
    over two directory picks.  Because snapshots are complete and
    immutable, the diff needs no log replay and is exact for ANY
    version pair (not just adjacent ones); per-key classification is
    added / removed / changed.  The audit surface for "what did batch
    range (a, b] do to the serving table"."""
    from ..operators.diff import corpus_diff

    old = read_materialized(spark, table_dir, v_old)
    new = read_materialized(spark, table_dir, v_new)
    if old is None or new is None:
        raise ValueError(f"both versions must be committed: {v_old}, {v_new}")
    return corpus_diff(old, new, key_cols, compare_cols)
