"""File-source streams and deterministic stream execution helpers.

``Trigger.AvailableNow`` + a checkpoint dir is the bridge between
streaming semantics and testability: each ``run_available_now`` call
processes exactly the files not yet recorded in the checkpoint, updates
watermark/dedup state, then stops.  Two successive calls with the same
checkpoint ARE the reference's build-then-update lifecycle
(video_metadata_db.py:1529-1532) with exactly-once bookkeeping replacing
the broken mmap membership scan (:427-452).
"""

from __future__ import annotations

import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

#: When a list, every AvailableNow drain below appends its wall seconds
#: (tools/stream_phases.py sets this to split a streaming query's cost
#: into STAGING — the temp-dir writes before the stream starts — vs
#: DRAIN — the start→awaitTermination micro-batch run;
#: staging = query-build wall − Σ drains).  None (the default) records
#: nothing: two perf_counter calls per drain, no behavior change.
DRAIN_SINK: list[float] | None = None


def file_stream(
    spark: SparkSession,
    path: str,
    schema: StructType,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming source over a directory of files.  Schema is mandatory
    for streams (no inference).  ``max_files_per_trigger`` bounds batch
    size — at scale it caps per-batch work; in tests it forces files
    into SEPARATE micro-batches so cross-batch state-store paths are
    actually exercised (AvailableNow otherwise drains everything in one
    batch)."""
    reader = spark.readStream.format(fmt).schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def run_available_now(
    result: DataFrame,
    checkpoint: str,
    output_mode: str = "append",
    timeout_s: int = 120,
) -> DataFrame:
    """Drain everything currently available into a memory sink; return
    the rows THIS run emitted.  The memory sink is test/debug plumbing —
    production sinks are parquet/Delta via the same writeStream."""
    name = f"mem_{uuid.uuid4().hex[:12]}"
    t0 = time.perf_counter()
    q = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if DRAIN_SINK is not None:
        DRAIN_SINK.append(time.perf_counter() - t0)
    return result.sparkSession.table(name)


def run_available_now_to_parquet(
    result: DataFrame,
    checkpoint: str,
    out_dir: str,
    timeout_s: int = 120,
) -> DataFrame:
    """Drain to a parquet file sink (append mode) and return the
    CUMULATIVE sink contents.  Unlike the memory sink, the file sink
    supports checkpoint recovery, so successive calls with the same
    checkpoint continue exactly where the previous run stopped — the
    production-shaped update lifecycle."""
    spark = result.sparkSession
    t0 = time.perf_counter()
    q = (
        result.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if DRAIN_SINK is not None:
        DRAIN_SINK.append(time.perf_counter() - t0)
    return spark.read.parquet(out_dir)


def run_foreach_batch(
    result: DataFrame,
    checkpoint: str,
    batch_fn: Callable[[DataFrame, int], None],
    output_mode: str = "append",
    timeout_s: int = 120,
) -> None:
    """AvailableNow drain through a ``foreachBatch`` callback — the
    escape hatch for sinks Spark lacks natively (the reference's
    toast/notify side-channel, §2.10, maps here)."""
    t0 = time.perf_counter()
    q = (
        result.writeStream.foreachBatch(batch_fn)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if DRAIN_SINK is not None:
        DRAIN_SINK.append(time.perf_counter() - t0)
