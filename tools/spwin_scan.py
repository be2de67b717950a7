"""One-off scan: which registered queries have a Window fed by an
Exchange SinglePartition (the single-reducer global-window shape)?

Used to seed the whitelist for the registry-wide plan gate in
tests/test_plans.py (VERDICT r8 item 2).
"""

from __future__ import annotations

import contextlib
import io
import re
import sys

NODE_RE = re.compile(r"^[\s:+\-]*(?:\* )?([A-Za-z][\w ]*?) \((\d+)\)\s*$")


def single_partition_window_exchanges(plan: str) -> list[str]:
    """Ids of Exchange SinglePartition nodes that feed a Window through
    a linear Sort/Project/WindowGroupLimit chain."""
    lines = plan.splitlines()
    nodes = []
    for ln in lines:
        m = NODE_RE.match(ln)
        if m:
            nodes.append((m.group(1).strip(), m.group(2)))
        elif nodes and not ln.strip():
            break  # blank line ends the tree section
    hits = []
    for i, (name, _nid) in enumerate(nodes):
        if name != "Window":
            continue
        j = i + 1
        steps = 0
        while j < len(nodes) and steps < 5:
            nm, nid = nodes[j]
            if nm == "Exchange":
                m = re.search(rf"\({nid}\) Exchange\n((?:[^\n]+\n)*)", plan)
                if m and "SinglePartition" in m.group(1):
                    # post-aggregate frames (groupBy output, e.g. daily
                    # series or the <=num_ranges bucket-offset frames)
                    # are model-sized by construction — allow them;
                    # only a RAW frame through one task is the
                    # scale-killer shape
                    agg_below = any(
                        "Aggregate" in nodes[k][0]
                        for k in range(j + 1, min(j + 4, len(nodes)))
                    )
                    if not agg_below:
                        hits.append(nid)
                break
            if nm in ("Sort", "Project", "WindowGroupLimit", "Filter"):
                j += 1
                steps += 1
                continue
            break
    return hits


def main() -> None:
    from video_metadata_db_spark.plans import QUERIES
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
