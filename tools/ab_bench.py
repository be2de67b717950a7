#!/usr/bin/env python
"""Steal-stamped bench wrapper (r12): runs tools/bench_some.py-style
timing for the named queries and stamps /proc/stat steal%, loadavg and
a ``dirty`` flag around EVERY repeat, so a hypervisor steal storm
mid-run is visible per-number instead of poisoning a best-of silently.

Usage: python tools/ab_bench.py name1 name2 ...
Env: SPARK_GRAFT_SF_DIR (default sf0.1), REPEATS (default 3),
     STEAL_DIRTY_PCT (default 1.0 — a repeat whose window exceeds this
     is flagged).
Prints one JSON object: {name: {"times": [...], "steal": [...],
"best_clean": t|null, "best": t}}.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("REPEATS", "3"))
DIRTY = float(os.environ.get("STEAL_DIRTY_PCT", "1.0"))


def ticks():
    with open("/proc/stat") as fh:
        v = [int(x) for x in fh.readline().split()[1:]]
    return v[7], sum(v)


def main():
    names = sys.argv[1:]
    from video_metadata_db_spark.plans import QUERIES
    from video_metadata_db_spark.session import get_spark

    spark = get_spark("ab-bench")
    out = {}
    for name in names:
        fn = QUERIES[name]
        times, steals = [], []
        for _ in range(REPEATS):
            s0, t0 = ticks()
            spark.sparkContext.setJobDescription(name)
            w0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            wall = round(time.perf_counter() - w0, 3)
            s1, t1 = ticks()
            steal = round(100.0 * (s1 - s0) / max(1, t1 - t0), 2)
            times.append(wall)
            steals.append(steal)
        clean = [t for t, s in zip(times, steals) if s <= DIRTY]
        out[name] = {
            "times": times,
            "steal": steals,
            "best": min(times),
            "best_clean": min(clean) if clean else None,
        }
        print(f"# {name}: {json.dumps(out[name])}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
