#!/usr/bin/env python
"""Split `dedup_components_incremental`'s bench cost into its two
phases (VERDICT r5 item 7): the PREMISE BUILD (pair generation over the
whole corpus + the full star run that constructs the stored old-corpus
labels the query's scenario assumes already exist) versus the
INCREMENTAL MERGE it actually demonstrates (fold the touching pairs
into the stored labels).  At scale, per-ingest cost is the second
phase only — the first is a one-time backfill.

Usage: python tools/components_phases.py [sf_dir]   (default sf0.1)
Prints one JSON line per phase plus a total; paste into PLANS.md.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"


def main() -> None:
    from pyspark.sql import functions as F

    from video_metadata_db_spark.operators.components import (
        components_incremental,
        connected_components_star,
    )
    from video_metadata_db_spark.operators.dedup import (
        release_dedup_caches,
        simhash_near_pairs,
    )
    from video_metadata_db_spark.session import get_spark
    from video_metadata_db_spark.sources.tables import load_table

    spark = get_spark("components-phases")
    results = {}
    best_total = float("inf")
    for rep in range(2):
        release_dedup_caches()
        docs = load_table(spark, SF_DIR, "documents")

        t0 = time.perf_counter()
        pairs = simhash_near_pairs(docs, max_hamming=8).localCheckpoint(
            eager=True
        )
        is_new_a = F.col("doc_a") % 10 == 0
        is_new_b = F.col("doc_b") % 10 == 0
        old_labels = connected_components_star(
            pairs.filter(~is_new_a & ~is_new_b)
        ).localCheckpoint(eager=True)
        t1 = time.perf_counter()

        touching = pairs.filter(is_new_a | is_new_b)
        # identical tail to the registered query (including the sort)
        merged = components_incremental(old_labels, touching).orderBy("doc")
        merged.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()

        total = t2 - t0
        if total < best_total:
            best_total = total
            results = {
                "premise_build_sec": round(t1 - t0, 3),
                "incremental_merge_sec": round(t2 - t1, 3),
                "total_sec": round(total, 3),
                "rep": rep,
            }
    results["sf_dir"] = SF_DIR
    print(json.dumps(results))
    from phases_io import record_phases

    record_phases({"sf_dir": SF_DIR, "dedup_components_incremental": {
        k: v for k, v in results.items() if k != "sf_dir"
    }})
    spark.stop()


if __name__ == "__main__":
    main()
