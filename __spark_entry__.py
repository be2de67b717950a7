"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in :mod:`video_metadata_db_spark`; this module is
the thin driver-facing facade.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
sys.path.insert(0, _REPO)
# Python workers don't inherit driver-side sys.path edits; PYTHONPATH at
# import time covers the common case where the JVM launches after this
# import, _ensure_shipped covers a pre-existing session.
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def _ensure_shipped(spark: SparkSession) -> None:
    """Make ``video_metadata_db_spark`` importable on Python workers.

    The grouped-map / mapInPandas / applyInPandasWithState operators
    pickle module-level functions BY REFERENCE, so workers must import
    the package — which fails when the driver process runs from a cwd
    outside the repo.  ``addPyFile`` ships a zip of the package into
    every worker's sys.path regardless of cwd, env, or whether the
    session predates this module's import.
    """
    sc = spark.sparkContext
    if getattr(sc, "_vmdb_pkg_shipped", False):
        return
    import tempfile
    import zipfile

    pkg = Path(_REPO) / "video_metadata_db_spark"
    zpath = Path(tempfile.gettempdir()) / f"vmdb_pkg_{os.getpid()}.zip"
    with zipfile.ZipFile(zpath, "w") as z:
        for p in sorted(pkg.rglob("*.py")):
            z.write(p, p.relative_to(pkg.parent))
    sc.addPyFile(str(zpath))
    sc._vmdb_pkg_shipped = True


def _tune_session(spark: SparkSession) -> None:
    """Runtime-settable confs for a driver-owned session: AQE on (it
    only ever helps — coalesces the tiny sf0.01 shuffles, splits skew),
    and shuffle parallelism sized to the corpus IF the session still
    carries Spark's out-of-the-box 200 (an explicit driver choice is
    honored).  Our own session.py sets the same values at build time."""
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        if spark.conf.get("spark.sql.shuffle.partitions", "200") == "200":
            spark.conf.set("spark.sql.shuffle.partitions", "32")
    except Exception:
        pass  # a locked-down conf must never fail the query itself


def _wrap(fn: Callable[[SparkSession, str], DataFrame]) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_shipped(spark)
        _tune_session(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The variant report — the reference's one true query
    (video_metadata_db.py:1106-1213): parse titles from filenames,
    group, keep titles with >1 variant.
    """
    from video_metadata_db_spark.plans import QUERIES

    _ensure_shipped(spark)
    _tune_session(spark)
    return QUERIES["variant_report"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from video_metadata_db_spark.plans import QUERIES

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query (omitted → rows-only check)."""
    from video_metadata_db_spark.plans import ORACLES

    return dict(ORACLES)
