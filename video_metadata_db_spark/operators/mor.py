"""MERGE INTO / merge-on-read overlays — the lakehouse write-path
semantics (Delta/Iceberg-style) expressed as pure relational plans.

The reference's only mutation is "append rows whose key is new"
(update mode, video_metadata_db.py:443-476); a corpus lake needs the
two richer forms every table format standardizes:

- :func:`merge_upsert` — SQL MERGE: one FULL OUTER equi-join on the
  key; matched keys take the update payload verbatim (NULLs
  overwrite), unmatched-source keys insert, unmatched-target keys
  carry through; duplicate changefeed keys raise like Delta/Iceberg's
  multiple-match error.
- :func:`snapshot_read` — merge-on-read: the CURRENT view of a base
  snapshot overlaid with equality-delete keys and upsert rows, exactly
  what an Iceberg v2 reader assembles from delete files + data files
  without rewriting the base.

Scale shape: each is a single hash-shuffle on the key (zero shuffle
when base and overlay are bucketed on it — the layout
``sources/bucketing.py`` writes); delete-key sets are usually tiny and
broadcast.  No window, no collect, no iteration; AQE picks the join
strategy per side at runtime.  The copy-on-write file rewrite built on
:func:`merge_upsert` lives in ``sources/maintenance.py``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_upsert(
    base: DataFrame,
    updates: DataFrame,
    key_cols: Sequence[str],
    mark_col: str | None = None,
    evolve_schema: bool = False,
) -> DataFrame:
    """SQL ``MERGE INTO base USING updates ON key``: WHEN MATCHED THEN
    UPDATE SET * / WHEN NOT MATCHED THEN INSERT * — as one full-outer
    join.  ``updates`` must carry the same non-key columns as ``base``.
    Matched keys take the update payload VERBATIM — an update row
    carrying a NULL writes that NULL, exactly like ``UPDATE SET *``
    (never coalesced against the base).  Duplicate keys in the
    changefeed raise at execution time, matching the Delta/Iceberg
    multiple-match error — silently multiplying matched base rows
    through the join is never acceptable.  When ``mark_col`` is given,
    an extra string column records each row's provenance: 'updated',
    'inserted', or 'base'.

    ``evolve_schema=True`` is Delta's ``mergeSchema`` / autoMerge
    (delta.io MERGE schema-evolution semantics, public docs):

    - a column only in ``updates`` is ADDED to the output schema;
      base-only rows backfill NULL, matched/inserted rows take the
      update value;
    - a base column missing from ``updates`` is PRESERVED — matched
      rows keep their base value (``UPDATE SET *`` only sets what the
      source carries), inserted rows get NULL.

    Without it, missing payload columns raise (the strict contract)
    and extra update columns are ignored.
    """
    keys = list(key_cols)
    payload = [c for c in base.columns if c not in set(keys)]
    missing = [c for c in payload if c not in updates.columns]
    if missing and not evolve_schema:
        raise ValueError(f"updates missing payload columns: {missing}")
    #: payload columns the changefeed can overwrite vs base-preserved
    upd_payload = [c for c in payload if c in updates.columns]
    new_cols = (
        [c for c in updates.columns if c not in base.columns and c not in keys]
        if evolve_schema
        else []
    )
    b = base.select(*keys, F.lit(1).alias("_in_base"), *payload)
    # Per-key cardinality check over the CHANGEFEED only (one shuffle of
    # the small side, never the base); folded into ``_in_upd`` so the
    # optimizer can't prune the assertion out of the plan.
    dup_msg = F.concat(
        F.lit("merge_upsert: duplicate update key ("),
        F.concat_ws(",", *[F.col(k).cast("string") for k in keys]),
        F.lit(")"),
    )
    u = (
        updates.select(
            *keys,
            *[F.col(c).alias(f"_u_{c}") for c in upd_payload + new_cols],
        )
        .withColumn(
            "_k_cnt", F.count(F.lit(1)).over(Window.partitionBy(*keys))
        )
        .select(
            *keys,
            F.when(
                F.assert_true(F.col("_k_cnt") == 1, dup_msg).isNull(),
                F.lit(1),
            ).alias("_in_upd"),
            *[f"_u_{c}" for c in upd_payload + new_cols],
        )
    )
    joined = b.join(u, on=keys, how="full_outer")
    out = [
        *keys,
        # gate on the match flag, not COALESCE: NULL payloads overwrite;
        # base columns the changefeed doesn't carry are preserved
        *[
            F.when(F.col("_in_upd").isNotNull(), F.col(f"_u_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            if c in set(upd_payload)
            else F.col(c).alias(c)
            for c in payload
        ],
        # evolved columns: update value where the changefeed has the
        # key (matched/inserted), NULL backfill on base-only rows
        *[F.col(f"_u_{c}").alias(c) for c in new_cols],
    ]
    if mark_col is not None:
        out.append(
            F.when(F.col("_in_upd").isNull(), "base")
            .when(F.col("_in_base").isNull(), "inserted")
            .otherwise("updated")
            .alias(mark_col)
        )
    return joined.select(*out)


def snapshot_read(
    base: DataFrame,
    key_cols: Sequence[str],
    delete_keys: DataFrame | None = None,
    upserts: DataFrame | None = None,
) -> DataFrame:
    """The merge-on-read CURRENT view: ``base``, minus rows whose key
    appears in ``delete_keys`` (equality deletes), with rows whose key
    appears in ``upserts`` replaced by the upsert payload (and brand-new
    upsert keys appended).  Deletes apply to the base AND to upserts —
    a delete written after an upsert wins, matching table-format
    sequence-number semantics when the caller passes the already
    net-effective key sets.

    Plan: at most two left-anti joins (broadcast when the key sets are
    small) + one union — the base is never rewritten.
    """
    keys = list(key_cols)
    cur = base
    if upserts is not None:
        cur = cur.join(
            upserts.select(*keys).distinct(), on=keys, how="left_anti"
        ).unionByName(upserts.select(*cur.columns))
    if delete_keys is not None:
        cur = cur.join(
            delete_keys.select(*keys).distinct(), on=keys, how="left_anti"
        )
    return cur


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    op_col: str = "op",
    mark_col: str | None = None,
) -> DataFrame:
    """Apply a CDC changefeed with explicit row operations in ONE pass:
    ``changes`` carries ``op_col`` ∈ {'I','U','D'} plus the full
    payload — the Debezium/Delta-CDF-shaped batch every replication
    pipeline lands (the reference's update mode,
    video_metadata_db.py:443-476, is the I-only special case).

    Semantics (one full-outer equi-join on the key, the merge_upsert
    plan shape):

    - 'D' removes the key (a delete for an absent key is a no-op);
    - 'I'/'U' both upsert — the payload replaces the base row or
      inserts a new one (idempotent re-delivery safe: replaying the
      same changefeed yields the same table);
    - base rows untouched by the changefeed carry through;
    - duplicate keys in one batch raise, exactly like merge_upsert —
      a changefeed must be key-netted before apply (CDC compaction),
      silently applying two ops to one key in an unordered batch is
      never deterministic.

    ``mark_col`` tags survivors 'base' / 'updated' / 'inserted'
    (deleted rows are gone, so no tag).  Scale: one hash shuffle on
    the key (zero when both sides are bucketed on it); the op filter
    is a projection, not a second join.
    """
    keys = list(key_cols)
    payload = [c for c in base.columns if c not in set(keys)]
    missing = [c for c in payload if c not in changes.columns]
    if missing:
        raise ValueError(f"changes missing payload columns: {missing}")
    b = base.select(*keys, F.lit(1).alias("_in_base"), *payload)
    dup_msg = F.concat(
        F.lit("cdc_apply: duplicate change key ("),
        F.concat_ws(",", *[F.col(k).cast("string") for k in keys]),
        F.lit(")"),
    )
    op_msg = F.concat(F.lit("cdc_apply: unknown op '"), F.col("_op"), F.lit("'"))
    c = (
        changes.select(
            *keys, F.col(op_col).alias("_op"),
            *[F.col(x).alias(f"_u_{x}") for x in payload],
        )
        .withColumn("_k_cnt", F.count(F.lit(1)).over(Window.partitionBy(*keys)))
        .select(
            *keys,
            # both asserts folded into the flag so the optimizer can't
            # prune them (the merge_upsert discipline)
            F.when(
                F.assert_true(F.col("_k_cnt") == 1, dup_msg).isNull()
                & F.assert_true(F.col("_op").isin("I", "U", "D"), op_msg).isNull(),
                F.lit(1),
            ).alias("_in_chg"),
            "_op",
            *[f"_u_{x}" for x in payload],
        )
    )
    joined = b.join(c, on=keys, how="full_outer")
    survivors = joined.filter(
        F.col("_in_chg").isNull() | (F.col("_op") != "D")
    )
    out = [
        *keys,
        *[
            F.when(F.col("_in_chg").isNotNull(), F.col(f"_u_{x}"))
            .otherwise(F.col(x))
            .alias(x)
            for x in payload
        ],
    ]
    if mark_col is not None:
        out.append(
            F.when(F.col("_in_chg").isNull(), "base")
            .when(F.col("_in_base").isNull(), "inserted")
            .otherwise("updated")
            .alias(mark_col)
        )
    return survivors.select(*out)


class VersionedParquetTable:
    """Minimal versioned-table commit protocol for foreachBatch CDC
    replication: ``{root}/v{N}`` directories, each a complete snapshot
    (copy-on-write, the Delta/Iceberg snapshot discipline with the
    manifest replaced by the version number itself).

    Retry safety (ADVICE r7): ``read_for_batch(batch_id)`` resolves the
    highest committed version <= batch_id, so a batch retried after (or
    during) its own ``v{batch_id+1}`` commit re-applies against the
    PRE-batch snapshot rather than its own output; ``commit`` writes to
    a dot-prefixed staging directory and atomically renames, so a crash
    mid-write never leaves a half-version that a later read resolves as
    the latest snapshot.  Exactly-once therefore needs no idempotent
    apply function — replay always recomputes the same v{batch_id+1}
    from the same base.

    Scale: versions are metadata-only bookkeeping; each commit costs
    exactly the apply plan's write.  A production lake would layer file
    pruning / compaction on top (``sources/maintenance.py``); the
    protocol here is the part Structured Streaming's foreachBatch
    contract actually requires.
    """

    def __init__(self, spark, root: str) -> None:
        import os

        self._spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _versions(self) -> list[int]:
        import os

        return sorted(
            int(d[1:])
            for d in os.listdir(self.root)
            if d.startswith("v") and d[1:].isdigit()
        )

    def init(self, df: DataFrame) -> None:
        """Write the v0 snapshot."""
        df.coalesce(1).write.mode("overwrite").parquet(f"{self.root}/v0")

    def latest(self) -> DataFrame:
        return self._spark.read.parquet(f"{self.root}/v{self._versions()[-1]}")

    def read_for_batch(self, batch_id: int) -> DataFrame:
        """The base snapshot batch `batch_id` must apply against: the
        highest committed version <= batch_id (v0 for the first batch)."""
        vs = [v for v in self._versions() if v <= batch_id]
        if not vs:
            raise FileNotFoundError(
                f"no committed version <= {batch_id} under {self.root}"
            )
        return self._spark.read.parquet(f"{self.root}/v{vs[-1]}")

    def commit(self, df: DataFrame, batch_id: int) -> None:
        """Stage + atomically rename ``v{batch_id + 1}``; a re-commit of
        the same batch id replaces the previous attempt."""
        import os
        import shutil

        stage = f"{self.root}/.v{batch_id + 1}.staging"
        final = f"{self.root}/v{batch_id + 1}"
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        if os.path.isdir(final):
            shutil.rmtree(final)
        os.rename(stage, final)
