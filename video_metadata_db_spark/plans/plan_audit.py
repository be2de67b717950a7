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
    # Parse EVERY tree section of the formatted dump — the main plan
    # AND each tree under '===== Subqueries =====' (ADVICE r9: breaking
    # at the first blank line left scalar/IN-subquery trees unscanned).
    # A blank line or a '='-header ends one tree; node-DETAIL blocks
    # ("(12) Exchange") put the id first so NODE_RE never matches them.
    sections: list[list[tuple[int, str, str]]] = []
    nodes: list[tuple[int, str, str]] = []
    for ln in plan.splitlines():
        m = NODE_RE.match(ln)
        if m:
            nodes.append((len(m.group(1)), m.group(2).strip(), m.group(3)))
        elif nodes and (not ln.strip() or ln.lstrip().startswith("=")):
            sections.append(nodes)
            nodes = []
    if nodes:
        sections.append(nodes)
    hits: list[str] = []
    for nodes in sections:
        hits.extend(_window_hits(nodes, plan))
    return hits


def _window_hits(nodes: list[tuple[int, str, str]], plan: str) -> list[str]:
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
