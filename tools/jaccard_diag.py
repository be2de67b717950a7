#!/usr/bin/env python
"""Diagnose the prefix-Jaccard 10× wall anomaly (VERDICT r5 item 6).

SCALE_MEASURE.json recorded dedup_jaccard_prefix wall 8.5 → 99.4 →
171.4 s at 1×/10×/30× corpus inflation — candidates exactly linear but
the wall superlinear at the 10× point.  Hypothesis: spill (the exploded
shingle frame no longer fits the fixed 32 shuffle partitions / the
scoped-persist memory budget at 10×).

This re-runs ONLY the registered `jaccard_prefix_pairs` operator at the
given factors, capturing per-run wall, shuffle bytes, AND memory/disk
spill deltas from the REST status API, at two shuffle-partition
settings.  Each (factor, partitions) combo runs in a FRESH session so
executor memory pressure doesn't leak across runs.

Usage: python tools/jaccard_diag.py [factor ...]   (default: 1 10)
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

BASE = "/root/testdata/sf0.1"
WORK = "/tmp/scale_experiment"  # reuse the scale_experiment corpus cache

from pyspark.sql import SparkSession  # noqa: E402


def get_spark(partitions: int) -> SparkSession:
    return (
        SparkSession.builder.master("local[8]")
        .appName(f"jaccard-diag-p{partitions}")
        .config("spark.sql.shuffle.partitions", str(partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )


def stage_totals(spark: SparkSession) -> dict:
    app_id = spark.sparkContext.applicationId
    url = (
        f"{spark.sparkContext.uiWebUrl}/api/v1/applications/{app_id}"
        "/stages?status=complete"
    )
    with urllib.request.urlopen(url, timeout=10) as r:
        stages = json.load(r)
    return {
        "shuffle_read": sum(s.get("shuffleReadBytes", 0) for s in stages),
        "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "mem_spill": sum(s.get("memoryBytesSpilled", 0) for s in stages),
        "disk_spill": sum(s.get("diskBytesSpilled", 0) for s in stages),
    }


def run_one(factor: int, partitions: int) -> dict:
    from video_metadata_db_spark.operators.dedup import (
        jaccard_prefix_pairs,
        release_dedup_caches,
    )

    spark = get_spark(partitions)
    try:
        corpus = f"{WORK}/f{factor}/documents.parquet"
        if not Path(f"{corpus}/_SUCCESS").exists():
            from video_metadata_db_spark.sources.inflate import inflate_documents

            docs0 = spark.read.parquet(f"{BASE}/documents.parquet")
            inflate_documents(docs0, factor).repartition(32).write.mode(
                "overwrite"
            ).parquet(corpus)
        docs = spark.read.parquet(corpus)
        before = stage_totals(spark)
        t0 = time.perf_counter()
        pairs = jaccard_prefix_pairs(docs, threshold_tenths=6).count()
        wall = time.perf_counter() - t0
        after = stage_totals(spark)
        release_dedup_caches()
        row = {
            "factor": factor,
            "partitions": partitions,
            "wall_s": round(wall, 2),
            "result_pairs": pairs,
            **{
                f"{k}_mb": round((after[k] - before[k]) / 1e6, 1)
                for k in before
            },
        }
        print(json.dumps(row), flush=True)
        return row
    finally:
        spark.stop()


def main() -> None:
    factors = [int(a) for a in sys.argv[1:]] or [1, 10]
    rows = []
    for partitions in (32, 128):
        for factor in factors:
            rows.append(run_one(factor, partitions))
    print(json.dumps({"summary": rows}))


if __name__ == "__main__":
    main()
