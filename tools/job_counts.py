#!/usr/bin/env python
"""Spark JOB count per query — the structural evidence for r12's
barrier-halving changes, which live inside checkpoint materialization
jobs and are therefore invisible in the returned frame's explain()
(the plan dumps are byte-identical before/after; the job count is
what changed).

Counts jobs via setJobGroup + statusTracker.getJobIdsForGroup around
(a) the query-build call — eager localCheckpoints run here — and
(b) the noop-sink action.

Usage: python tools/job_counts.py name1 name2 ...
Env: SPARK_GRAFT_SF_DIR (default sf0.1).
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    names = sys.argv[1:]
    from video_metadata_db_spark.plans import QUERIES
    from video_metadata_db_spark.session import get_spark

    spark = get_spark("job-counts")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    out = {}
    for name in names:
        fn = QUERIES[name]
        sc.setJobGroup(f"{name}:build", name)
        df = fn(spark, SF_DIR)
        build_jobs = len(tracker.getJobIdsForGroup(f"{name}:build"))
        sc.setJobGroup(f"{name}:action", name)
        df.write.format("noop").mode("overwrite").save()
        action_jobs = len(tracker.getJobIdsForGroup(f"{name}:action"))
        sc.setJobGroup(None, None)
        out[name] = {
            "build_jobs": build_jobs,
            "action_jobs": action_jobs,
            "total_jobs": build_jobs + action_jobs,
        }
        print(f"# {name}: {json.dumps(out[name])}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
