"""The Python Data Source API listing: format("video_listing")."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _media_tree(tmp_path) -> str:
    root = tmp_path / "media"
    for sub, files in {
        "movies": ["a.mkv", "b.mp4"],
        "shows": ["c.avi"],
        "Extras": ["junk.mkv"],  # pruned directory name (DIRECTORY_FILTERS)
    }.items():
        d = root / sub
        d.mkdir(parents=True)
        for f in files:
            (d / f).write_bytes(b"x" * 16)
    (root / "loose.mkv").write_bytes(b"y" * 8)
    return str(root)


def test_video_listing_format_reads_tree(spark, tmp_path):
    from video_metadata_db_spark.schemas import LISTING_SCHEMA
    from video_metadata_db_spark.sources.datasource import VideoListingDataSource

    spark.dataSource.register(VideoListingDataSource)
    df = (
        spark.read.format("video_listing")
        .option("path", _media_tree(tmp_path))
        .option("volume", "VOL1")
        .load()
    )
    assert df.schema == LISTING_SCHEMA
    rows = {r["name"]: r for r in df.collect()}
    # pruned directory never listed; root-level file owned by the root
    # partition; sizes stat'ed
    assert set(rows) == {"a.mkv", "b.mp4", "c.avi", "loose.mkv"}
    assert rows["a.mkv"]["size_bytes"] == 16
    assert rows["loose.mkv"]["size_bytes"] == 8
    assert all(r["volume_label"] == "VOL1" for r in rows.values())


def test_video_listing_matches_helper_walk(spark, tmp_path):
    """The registered source and the mapInPandas distributed lister must
    produce identical listings over the same tree."""
    from video_metadata_db_spark.sources.datasource import VideoListingDataSource
    from video_metadata_db_spark.sources.listing import list_files

    root = _media_tree(tmp_path)
    spark.dataSource.register(VideoListingDataSource)
    via_source = (
        spark.read.format("video_listing")
        .option("path", root)
        .option("volume", "V")
        .load()
        .select("path", "name", "size_bytes", "volume_label")
    )
    via_helper = list_files(spark, [root], volume_label="V").select(
        "path", "name", "size_bytes", "volume_label"
    )
    assert sorted(map(tuple, via_source.collect())) == sorted(
        map(tuple, via_helper.collect())
    )


def test_video_listing_prune_off_lists_filtered_dirs(spark, tmp_path):
    from video_metadata_db_spark.sources.datasource import VideoListingDataSource

    spark.dataSource.register(VideoListingDataSource)
    df = (
        spark.read.format("video_listing")
        .option("path", _media_tree(tmp_path))
        .option("prune", "false")
        .load()
    )
    names = {r["name"] for r in df.collect()}
    assert "junk.mkv" in names
