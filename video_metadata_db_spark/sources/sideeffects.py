"""Filesystem side-effect sinks (SURVEY.md §2.1).

The reference touches a ``.nomedia`` marker file in every filtered
directory so Kodi skips it (``nomedia_file_create``,
``video_metadata_db.py:947-971``).  A side-effect is not a row, so here
it runs as a ``mapInPandas`` stage that REPORTS what it did — each
marker attempt yields a result row (created / existed / error), giving
the side-effect the same dead-letter discipline as the probe stage
instead of fire-and-forget ``foreach``.
"""

from __future__ import annotations

import os
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..functions.scalar import DIRECTORY_FILTERS

NOMEDIA = ".nomedia"

MARKER_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("dir_path", T.StringType(), False),
        T.StructField("status", T.StringType(), False),  # created | existed | error
        T.StructField("error", T.StringType(), True),
    ]
)


def filtered_dirs(spark: SparkSession, roots: Iterable[str]) -> DataFrame:
    """Directories under ``roots`` whose NAME is in the filter set —
    the prune points the lister refuses to descend into (:993-1014).
    Walks stop at each match (the reference also never recurses into
    filtered dirs)."""
    found: list[tuple[str]] = []
    for root in dict.fromkeys(roots):
        for path_dir, sub_dirs, _ in os.walk(root, topdown=True):
            hits = [d for d in sub_dirs if d in DIRECTORY_FILTERS]
            found.extend((os.path.join(path_dir, d),) for d in hits)
            sub_dirs[:] = [d for d in sub_dirs if d not in DIRECTORY_FILTERS]
    return spark.createDataFrame(found, "dir_path string")


def create_nomedia_markers(dirs: DataFrame) -> DataFrame:
    """Touch ``{dir}/.nomedia`` in every input directory; return a
    result row per attempt.  Distributed: each task touches its own
    partition's directories (only meaningful where tasks share the
    filesystem — driver-collect first on multi-node object storage)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for d in pdf["dir_path"]:
                marker = os.path.join(d, NOMEDIA)
                try:
                    if os.path.exists(marker):
                        out.append((d, "existed", None))
                    else:
                        with open(marker, "a", encoding="utf-8"):
                            pass
                        out.append((d, "created", None))
                except OSError as exc:
                    out.append((d, "error", str(exc)[:200]))
            yield pd.DataFrame(out, columns=["dir_path", "status", "error"])

    return dirs.mapInPandas(run, MARKER_RESULT_SCHEMA)
