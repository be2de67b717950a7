"""The directory scan as a REGISTERED Spark data source (Python Data
Source API, Spark 4): ``spark.read.format("video_listing")``.

Where ``listing.py`` offers the walk as helper functions, this makes it
a first-class source: schema projection, options, and PARTITION-level
parallelism are handled by the engine.  Each immediate subdirectory of
the root becomes an ``InputPartition``, so on shared storage with
millions of directories the metadata RPCs spread across the cluster —
the reference's single-threaded ``os.walk``
(video_metadata_db.py:975-1064) sharded by Spark's own task scheduler.

Usage::

    spark.dataSource.register(VideoListingDataSource)
    df = (spark.read.format("video_listing")
          .option("path", "/mnt/media")
          .option("prune", "true")
          .load())
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType

from ..schemas import LISTING_SCHEMA


class _DirPartition(InputPartition):
    def __init__(self, root: str, volume: str):
        self.root = root
        self.volume = volume


class VideoListingReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.root = options.get("path")
        if not self.root:
            raise ValueError("video_listing requires .option('path', <dir>)")
        self.volume = options.get("volume", "")
        self.prune = str(options.get("prune", "true")).lower() == "true"

    def partitions(self) -> Sequence[InputPartition]:
        # one partition per immediate subdirectory + one for root-level
        # files: the unit of parallelism is a directory subtree, the
        # same sharding a distributed lister uses against a namenode.
        # The prune filter must apply HERE too — a filtered name at the
        # top level would otherwise become its own partition and dodge
        # the in-walk prune entirely.
        from ..functions.scalar import DIRECTORY_FILTERS

        subs = []
        try:
            for entry in sorted(os.listdir(self.root)):
                full = os.path.join(self.root, entry)
                if os.path.isdir(full) and not (
                    self.prune and entry in DIRECTORY_FILTERS
                ):
                    subs.append(_DirPartition(full, self.volume))
        except OSError:
            pass
        return [*subs, _DirPartition(self.root, self.volume)]

    def read(self, partition: _DirPartition) -> Iterator[tuple]:
        from ..sources.listing import _walk_one

        if partition.root == self.root:
            # the root partition lists ONLY its own files (subtrees are
            # owned by the per-directory partitions)
            for entry in os.listdir(self.root):
                full = os.path.join(self.root, entry)
                if os.path.isfile(full):
                    yield from _walk_shallow(full, partition.volume)
        else:
            yield from _walk_one(partition.root, partition.volume, self.prune)


def _walk_shallow(full: str, volume: str) -> Iterator[tuple]:
    from datetime import datetime, timezone

    try:
        st = os.stat(full)
    except OSError:
        return
    fname = os.path.basename(full)
    ext = fname.rpartition(".")[2] if "." in fname else ""
    yield (
        full,
        os.path.basename(os.path.dirname(full)),
        fname,
        ext,
        st.st_size,
        datetime.fromtimestamp(st.st_mtime, tz=timezone.utc).replace(tzinfo=None),
        volume,
    )


class VideoListingStreamReader(SimpleDataSourceStreamReader):
    """Continuous-ingest listing: the reference's ``-u`` update mode
    (video_metadata_db.py:403-460 — rescan, anti-join against the
    existing db, append the new files) as a STREAMING SOURCE.  The
    offset is the set of paths already emitted, so each micro-batch
    delivers exactly the files that appeared since the last one —
    Spark's checkpoint persists the offset, replacing the reference's
    mmap'd TSV membership probe.

    The path-set offset is exact but grows with the library (fine for
    a media catalog: offsets hold paths, not data).  A mtime-watermark
    offset would be O(1) but misses same-timestamp late arrivals —
    exactness is the point of update mode, so the set wins here.
    """

    def __init__(self, options: dict):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("video_listing requires .option('path', <dir>)")
        self.volume = options.get("volume", "")
        self.prune = str(options.get("prune", "true")).lower() == "true"

    def initialOffset(self) -> dict:
        return {"seen": []}

    def _listing(self) -> dict[str, tuple]:
        from ..sources.listing import _walk_one

        return {row[0]: row for row in _walk_one(self.root, self.volume, self.prune)}

    def read(self, start: dict):
        current = self._listing()
        seen = set(start.get("seen", []))
        fresh = [row for path, row in sorted(current.items()) if path not in seen]
        end = {"seen": sorted(current.keys() | seen)}
        return iter(fresh), end

    def readBetweenOffsets(self, start: dict, end: dict):
        # replay for recovery: everything in end's set but not start's
        seen = set(start.get("seen", []))
        current = self._listing()
        wanted = [p for p in end.get("seen", []) if p not in seen]
        return iter([current[p] for p in wanted if p in current])


class VideoListingDataSource(DataSource):
    """``format("video_listing")`` — partition-parallel directory scan
    (batch) and exactly-once new-file ingest (streaming)."""

    @classmethod
    def name(cls) -> str:
        return "video_listing"

    def schema(self) -> StructType:
        return LISTING_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return VideoListingReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return VideoListingStreamReader(self.options)
