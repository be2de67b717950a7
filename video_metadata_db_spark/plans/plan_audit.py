"""Physical-plan audits shared by tests and tools.

:func:`single_partition_window_exchanges` detects the single-reducer
global-window shape (VERDICT r8: a corpus-scale frame serialized
through one task via Exchange SinglePartition → Sort → Window) in a
``df.explain("formatted")`` dump, while allowing the deliberate
model-sized sites: windows over frames that already passed an
aggregate on their own input chain (daily series, bin grids, the
≤ ``num_ranges`` bucket-offset frames of the distributed prefix-sum
machinery in ``operators/packing.py``).
"""

from __future__ import annotations

import re

NODE_RE = re.compile(r"^([\s:+\-]*)(?:\* )?([A-Za-z][\w ]*?) \((\d+)\)\s*$")


def single_partition_window_exchanges(plan: str) -> list[str]:
    """Ids of Exchange SinglePartition nodes that feed a Window through
    a linear Sort/Project/WindowGroupLimit chain AND are not fed by an
    aggregate themselves.

    The post-aggregate allowance: a frame that has already passed a
    groupBy is model-sized by construction in this codebase; only a RAW
    corpus frame through one task is the scale-killer shape.  The
    aggregate must sit on the exchange's own INPUT CHAIN (strictly
    descending indent in the formatted tree) — an aggregate inside a
    joined broadcast side does not make the streamed side small, so
    branch roots stop the walk (validated against both controls in
    tests/test_plans.py).
    """
    lines = plan.splitlines()
    nodes: list[tuple[int, str, str]] = []
    for ln in lines:
        m = NODE_RE.match(ln)
        if m:
            nodes.append((len(m.group(1)), m.group(2).strip(), m.group(3)))
        elif nodes and not ln.strip():
            break  # blank line ends the tree section
    hits: list[str] = []
    for i, (_ind, name, _nid) in enumerate(nodes):
        if name != "Window":
            continue
        j = i + 1
        steps = 0
        while j < len(nodes) and steps < 5:
            _jind, nm, nid = nodes[j]
            if nm == "Exchange":
                m = re.search(rf"\({nid}\) Exchange\n((?:[^\n]+\n)*)", plan)
                if m and "SinglePartition" in m.group(1):
                    agg_below = False
                    k = j
                    while k + 1 < len(nodes) and nodes[k + 1][0] > nodes[k][0]:
                        k += 1
                        if "Aggregate" in nodes[k][1]:
                            agg_below = True
                            break
                    if not agg_below:
                        hits.append(nid)
                break
            if nm in ("Sort", "Project", "WindowGroupLimit", "Filter"):
                j += 1
                steps += 1
                continue
            break
    return hits
