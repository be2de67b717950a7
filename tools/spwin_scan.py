"""One-off scan: which registered queries have a Window fed by an
Exchange SinglePartition over a non-aggregated (potentially
corpus-scale) frame?

The detector lives in ``video_metadata_db_spark.plans.plan_audit`` and
is enforced per-query by ``tests/test_plans.py``; this tool sweeps the
whole registry in one session for triage.

Usage: python tools/spwin_scan.py [name ...]   (default: all)
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from video_metadata_db_spark.plans import QUERIES
    from video_metadata_db_spark.plans.plan_audit import (
        single_partition_window_exchanges,
    )
    from video_metadata_db_spark.session import get_spark

    spark = get_spark()
    sf = "/root/testdata/sf0.01"
    names = sorted(QUERIES) if len(sys.argv) < 2 else sys.argv[1:]
    for name in names:
        try:
            df = QUERIES[name](spark, sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            hits = single_partition_window_exchanges(buf.getvalue())
            if hits:
                print(f"FLAG {name} {hits}", flush=True)
        except Exception as e:  # pragma: no cover - diagnostic tool
            print(f"ERR {name}: {e}", flush=True)


if __name__ == "__main__":
    main()
