"""Resumable staged execution for long batch pipelines.

A multi-hour 100 TB curation job (filter → dedup → pack → …) that dies
in stage 4 must NOT redo stages 1-3: each stage here materializes its
output as parquet under ``<workdir>/<idx>_<name>/`` and a rerun skips
every stage whose output is already committed (``_SUCCESS`` present),
resuming from the first missing one.  This is the batch counterpart of
the streaming checkpoint — recovery priced at one stage, not the job —
and the generalization of the single stage boundary inside
``curation_pipeline``.

Correctness contract: stages must be deterministic functions of their
input (true of every operator in this engine — pinned registry-wide by
tests/test_determinism.py), so a resumed run equals an uninterrupted
one.  Stage outputs are immutable once committed; re-running with a
changed stage list requires a fresh workdir (stage identity is
positional ``<idx>_<name>``, so an edited pipeline never silently
reuses stale outputs of a different stage under the same index-name).

At scale the materialization cost is the point, not overhead: each
boundary is also where you inspect row counts, run the quality gate
(operators/expectations.py), and fan out downstream consumers without
recomputing upstream.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

Stage = tuple[str, Callable[[DataFrame], DataFrame]]


def _stage_dir(workdir: str, idx: int, name: str) -> str:
    return os.path.join(workdir, f"{idx:02d}_{name}")


def _committed(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS"))


def run_staged(
    spark: SparkSession,
    source: DataFrame,
    stages: list[Stage],
    workdir: str,
) -> tuple[DataFrame, list[str]]:
    """Run ``stages`` over ``source`` with per-stage committed outputs.

    Returns (final DataFrame read from the last stage's directory,
    list of stage names EXECUTED this run — committed stages are
    skipped and read back instead).  The returned frame always comes
    from storage, so downstream work never holds the whole pipeline
    lineage."""
    executed: list[str] = []
    current = source
    for idx, (name, fn) in enumerate(stages):
        out_dir = _stage_dir(workdir, idx, name)
        if _committed(out_dir):
            current = spark.read.parquet(out_dir)
            continue
        result = fn(current)
        result.write.mode("overwrite").parquet(out_dir)
        executed.append(name)
        current = spark.read.parquet(out_dir)
    return current, executed
