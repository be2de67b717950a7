#!/usr/bin/env python
"""Dump explain("formatted") for named queries to /root/repo/plans/$VMDB_PLANS_ROUND/<name>_<tag>.txt

Usage: python explain_some.py <tag> name1 name2 ...
Env: SPARK_GRAFT_SF_DIR (default sf0.1), VMDB_PLANS_ROUND (default r12).
"""
import os
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    from video_metadata_db_spark.plans import QUERIES
    from video_metadata_db_spark.session import get_spark

    outdir = Path("/root/repo/plans") / os.environ.get("VMDB_PLANS_ROUND", "r12")
    outdir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("explain-some")
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        (outdir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
