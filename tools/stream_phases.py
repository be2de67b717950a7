#!/usr/bin/env python
"""Staging-vs-drain phase split for the AvailableNow streaming family
(VERDICT r11 item 3): each registered streaming query stages its input
as temp-dir parquet files (so maxFilesPerTrigger can slice REAL
micro-batches), then drains through start→awaitTermination, then
post-processes the sink.  This tool splits the bench cost per query:

- ``staging_sec``  — query build minus the drains: the temp-dir write
  jobs + stream construction (a one-time cost a production pipeline
  does not pay; its source dirs already exist),
- ``drain_sec``    — Σ start→awaitTermination: the actual micro-batch
  scheduling + state-store work the query demonstrates,
- ``post_sec``     — materializing the returned frame (noop sink).

Usage: python tools/stream_phases.py [sf_dir] [name ...]
       (defaults: sf0.1, the 10-query AvailableNow bench family)
Writes PHASES.json entries via tools/phases_io.record_phases.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

#: The AvailableNow bench family (every registered query that drives a
#: REAL start→awaitTermination drain).
DEFAULT_NAMES = [
    "stream_cms_heavy_hitters",
    "stream_reach_curve",
    "stream_cdc_apply",
    "stream_late_data_drop",
    "stream_scd2_enrich",
    "stream_left_outer_join",
    "stream_chained_windows",
    "stream_stateful_sessions",
    "stream_dynamic_gap_sessions",
    "stream_full_outer_join",
]

REPEATS = 2


def main() -> None:
    from video_metadata_db_spark.plans import QUERIES
    from video_metadata_db_spark.session import get_spark
    from video_metadata_db_spark.streaming import runner

    names = sys.argv[2:] or DEFAULT_NAMES
    spark = get_spark("stream-phases")
    out: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        best: dict | None = None
        for rep in range(REPEATS):
            runner.DRAIN_SINK = []
            spark.sparkContext.setJobDescription(f"{name} [phase split]")
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            t1 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.perf_counter()
            drains = list(runner.DRAIN_SINK)
            runner.DRAIN_SINK = None
            rec = {
                "staging_sec": round((t1 - t0) - sum(drains), 3),
                "drain_sec": round(sum(drains), 3),
                "n_drains": len(drains),
                "post_sec": round(t2 - t1, 3),
                "total_sec": round(t2 - t0, 3),
                "rep": rep,
            }
            if best is None or rec["total_sec"] < best["total_sec"]:
                best = rec
        out[name] = best
        print(f"# {name}: {json.dumps(best)}", file=sys.stderr)
    print(json.dumps(out))
    from phases_io import record_phases

    record_phases({"sf_dir": SF_DIR, "streaming": out})
    spark.stop()


if __name__ == "__main__":
    main()
