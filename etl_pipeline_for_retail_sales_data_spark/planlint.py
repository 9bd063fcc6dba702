"""Structural physical-plan lint helpers shared by the test suite and
ad-hoc tooling.

The one rule that lives here (r10 verdict #2): find every ``Exchange
SinglePartition`` whose output feeds a ``Window`` (possibly through the
``Sort`` the planner inserts for the window's ordering, and through AQE
shuffle-read wrappers). That shape funnels the window's ENTIRE input
through one task — the scale-killer class that bit ``heaps_fit`` (r9),
``ks_drift`` (r10) and ``zipf_fit`` (r10 verdict, fixed r11). Humans
missed an instance in the same file two rounds running, so the check is
automated over every registered query, with a per-query allowlist whose
entries must name the argument that BOUNDS the window's input (top-k
pools, O(n_buckets) bucket-offset frames, O(periods) calendars…).

Detection is over ``executedPlan().toString()`` — the same text surface
``tests/test_plan_lint.py`` already greps — but tree-aware: the plan
string's indentation encodes parent/child, so we climb from each
single-partition exchange through order-preserving wrappers and flag
only when the consumer is a Window. A single-partition exchange under a
final scalar ``HashAggregate`` or a ``GlobalLimit`` is normal Spark and
is NOT flagged.
"""

from __future__ import annotations

import re

# node kinds that sit between a window and its shuffle without changing
# what flows through the single partition: the planner's Sort, AQE's
# shuffle-read wrappers, and codegen boundary adapters. Matched as WORD
# prefixes ("Sort " / "Sort["), never bare startswith — "Sort" would
# also swallow SortAggregate and SortMergeJoin, which are CONSUMERS
# that bound their output (a scalar SortAggregate over a
# single-partition exchange is normal Spark, not a window funnel).
_PASS_THROUGH = ("Sort", "AQEShuffleRead", "ShuffleQueryStage", "InputAdapter")


def _is_pass_through(node: str) -> bool:
    for kind in _PASS_THROUGH:
        if node == kind or node.startswith((kind + " ", kind + "[")):
            return True
    return False

_CODEGEN = re.compile(r"^\*?\(\d+\)\s*")


def _split_line(line: str) -> tuple[int, str]:
    """(depth, node_text) for one rendered plan line: depth is the
    column of the ``+- ``/``:- `` connector (-1 for a root line, whose
    children's connectors sit at column 0). The connector's own ':'
    doubles as a sibling-continuation character, so this is an explicit
    scan, not a regex — at each prefix position a connector is tried
    BEFORE the character is consumed as tree scaffolding."""
    i = 0
    while i < len(line):
        ch = line[i]
        if ch in "+:" and line.startswith("- ", i + 1):
            return i, line[i + 3 :]
        if ch in " :|":
            i += 1
            continue
        break
    return -1, line.strip()


def _parse_tree(plan_text: str):
    """Yield (depth, node_text) for each operator line of a plan string.

    Depth is the column of the ``+- `` / ``:- `` connector — children are
    strictly deeper than their parent in Spark's tree rendering. A root
    line (no connector) gets depth -1, since its first child's connector
    sits at column 0. Lines that carry no operator (blank,
    ``== Physical Plan ==`` headers, subquery banners) are skipped.
    """
    out = []
    for raw in plan_text.splitlines():
        if not raw.strip() or raw.lstrip().startswith("=="):
            continue
        depth, node = _split_line(raw)
        out.append((depth, _CODEGEN.sub("", node)))
    return out


def single_partition_window_feeds(plan_text: str) -> list[str]:
    """Return the Window operator lines fed by an Exchange SinglePartition.

    Empty list ⇒ the plan has no single-task window. Each returned string
    is the offending ``Window …`` node text, so a caller can show WHICH
    window funnels its input through one partition.
    """
    nodes = _parse_tree(plan_text)
    hits = []
    for i, (depth, node) in enumerate(nodes):
        if not node.startswith("Exchange SinglePartition"):
            continue
        # climb the ancestor chain (nearest shallower line above)
        d = depth
        for j in range(i - 1, -1, -1):
            pd, pn = nodes[j]
            if pd >= d:
                continue
            if pn.startswith("Window"):
                hits.append(pn)
                break
            if _is_pass_through(pn):
                d = pd
                continue
            break  # scalar agg, limit, join build side… — not a window
    return hits
