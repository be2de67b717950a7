#!/usr/bin/env python
"""Bench a subset of registered queries: python bench_some.py name1 name2 ...

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
REPEATS (default 3 — report all times + best).
Times the noop sink like bench.py.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(os.environ.get("REPEATS", "3"))


def main():
    names = sys.argv[1:]
    from video_metadata_db_spark.plans import QUERIES
    from video_metadata_db_spark.session import get_spark

    spark = get_spark("bench-some")
    out = {}
    for name in names:
        fn = QUERIES[name]
        times = []
        for _ in range(REPEATS):
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.perf_counter() - t0, 3))
        out[name] = {"times": times, "best": min(times)}
        print(f"# {name}: best={min(times):.3f} all={times}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
