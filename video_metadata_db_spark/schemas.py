"""Typed schemas for the parity pipeline.

The reference has no schema objects at all — column order is implied by
the TSV write sequence (``video_metadata_db.py:215-413``) and restated
only in the merge header (``:1402-1421``).  Here every stage has an
explicit ``StructType``; sentinels/padding exist only at the TSV
boundary (SURVEY.md §1.5).
"""

from __future__ import annotations

from pyspark.sql import types as T

#: Output of the directory-scan source (FIXTURES.md A.1).
LISTING_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("parent_dir", T.StringType(), True),
        T.StructField("name", T.StringType(), True),
        T.StructField("ext", T.StringType(), True),
        T.StructField("size_bytes", T.LongType(), True),
        T.StructField("mtime", T.TimestampType(), True),
        T.StructField("volume_label", T.StringType(), True),
    ]
)

#: Output of the probe stage (FIXTURES.md A.2) — one ffprobe JSON call
#: replaces the reference's two positional-text runs (:596-634); the
#: ``error`` field is the dead-letter channel (:635-676).
PROBE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("video_codec", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_streams", T.IntegerType(), True),
        T.StructField("container", T.StringType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("audio_codec", T.StringType(), True),
        T.StructField("audio_channels", T.IntegerType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)

#: Subtitle sidecar listing (FIXTURES.md A.3) for the existence join.
SIDECAR_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("size_bytes", T.LongType(), True),
    ]
)

#: The engine's internal (typed, null-clean) metadata record. TSV quirks
#: (Y/N, "<Title Not Set>", "0000", single-space sizes) are applied only
#: on write — see sources/tsv.py.
METADATA_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("raw_size", T.LongType(), True),
        T.StructField("video_codec", T.StringType(), True),
        T.StructField("n_streams", T.IntegerType(), True),
        T.StructField("container", T.StringType(), True),
        T.StructField("audio_channels", T.IntegerType(), True),
        T.StructField("audio_codec", T.StringType(), True),
        T.StructField("title", T.StringType(), True),
        T.StructField("sub_en", T.BooleanType(), True),
        T.StructField("sub_en_size", T.LongType(), True),
        T.StructField("sub_en_hi", T.BooleanType(), True),
        T.StructField("sub_en_hi_size", T.LongType(), True),
        T.StructField("volume_label", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
    ]
)

#: Exact TSV header text, column order fixed by the write sequence
#: (video_metadata_db.py:244-400) and merge header (:1402-1421).
TSV_HEADER = (
    "Width",
    "Height",
    "Duration (in s)",
    "Size",
    "Raw Size",
    "Video Codec Name",
    "AV1/HEVC Compression Candidate",
    "Total # of Streams",
    "Container Name",
    "# of Audio Channels (@Index 0)",
    "Audio Codec Name (@Index 0)",
    "Title",
    "Ext. English Subtitle Availability",
    "Ext. English Subtitle Size",
    "Ext. Hearing Impaired English Subtitle Availability",
    "Ext. Hearing Impaired English Subtitle Size",
    "Volume Label",
    "Path on Drive Label",
)
