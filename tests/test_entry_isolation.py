"""The driver contract must hold from ANY working directory.

Python workers resolve pickled module references by importing
``video_metadata_db_spark`` themselves — a driver process running from
a cwd outside the repo (as the round driver may) gets
``ModuleNotFoundError`` on every grouped-map / mapInPandas query unless
``__spark_entry__`` ships the package (``_ensure_shipped``).  This test
reproduces that environment: subprocess, cwd=/tmp, no PYTHONPATH.
"""

from __future__ import annotations

import os
import subprocess
import sys

_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
import __spark_entry__ as e
import os
os.environ.pop("PYTHONPATH", None)
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.sql.shuffle.partitions", "2")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
# a grouped-map pandas query: fails without worker-side package shipping
n = e.queries()["udf_grouped_zscore"](spark, "/root/testdata/sf0.001").count()
assert n > 0, n
print("WORKER_IMPORT_OK", n)
"""


def test_python_worker_queries_run_from_foreign_cwd():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=repo)],
        cwd="/tmp",
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "WORKER_IMPORT_OK" in proc.stdout
