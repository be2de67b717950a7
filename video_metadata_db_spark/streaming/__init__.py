"""Structured Streaming surface (SURVEY.md §2.10, §7 Phase 3).

The reference's incremental "update mode" (video_metadata_db.py:579-582,
:1529-1532) is a stream in disguise: discover new rows, skip ones
already in the sink, append.  Here that generalizes to Spark Structured
Streaming: file-source streams, watermarked windowed aggregations,
session windows, stateful dropDuplicates, and foreachBatch sinks.

Design rule: every transformation is written against a plain DataFrame
so the SAME function runs in batch (oracle-checkable by DuckDB) and as
a stream (covered by checkpointed AvailableNow tests).
"""

from .windows import session_stats, sliding_avg, stream_dedup, tumbling_counts  # noqa: F401
from .incremental_dedup import dedup_state_maintainer, read_dedup_labels  # noqa: F401
