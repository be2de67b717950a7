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


def test_video_listing_stream_emits_only_new_files(spark, tmp_path):
    """The streaming side IS the reference's update mode: run once
    (full library), add files, run again against the SAME checkpoint —
    the second batch must contain exactly the additions, driven by the
    checkpointed path-set offset instead of the reference's TSV
    membership probe."""
    from video_metadata_db_spark.sources.datasource import VideoListingDataSource

    spark.dataSource.register(VideoListingDataSource)
    root = _media_tree(tmp_path)
    cp = str(tmp_path / "cp")
    out = str(tmp_path / "ingested")

    def drain() -> set:
        # parquet sink: the recoverable production sink (memory sink
        # cannot resume from a checkpoint)
        q = (
            spark.readStream.format("video_listing")
            .option("path", root)
            .option("volume", "V")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", cp)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {r["name"] for r in spark.read.parquet(out).collect()}

    first = drain()
    assert first == {"a.mkv", "b.mp4", "c.avi", "loose.mkv"}

    (tmp_path / "media" / "movies" / "new1.mkv").write_bytes(b"z" * 4)
    (tmp_path / "media" / "shows" / "new2.avi").write_bytes(b"z" * 4)
    cumulative = drain()
    assert cumulative == first | {"new1.mkv", "new2.avi"}
    # exactly-once: a third drain with NO new files must append nothing
    assert drain() == cumulative
