"""video_metadata_db_spark — a PySpark-native analytics engine.

A ground-up re-expression of the capabilities of the reference
``jay-ramani/Video-Metadata-DB`` (a single-file ffprobe→TSV ETL script,
``video_metadata_db.py``, 1,606 lines) as an idiomatic Spark engine:

- file-listing DataFrame source → external-process probe UDF →
  derived-column projection → TSV/Parquet sinks (the parity pipeline),
- the full generic operator surface (joins, aggregations, windows,
  set ops, sorts) as Catalyst-native DataFrame plans,
- large-scale training-data pipeline extensions: dedup (exact /
  MinHash-LSH / SimHash / n-gram Jaccard), embedding similarity search,
  text analysis, multimodal column plumbing.

Nothing in here is a port: the reference's thread pools, mutexes and
external OS ``sort`` are replaced by Spark tasks, shuffles and
range-partitioned sorts (see SURVEY.md §4).
"""

__version__ = "0.1.0"
