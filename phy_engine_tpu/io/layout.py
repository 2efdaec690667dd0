"""Auto-layout for PhysicsLab scenes.

Counterpart of ``phy_lab_wrapper/auto_layout/auto_layout.h:70-160``:
grid placement inside a bounding box with IO-aware columns (input-like
elements left, output-like right, auto_layout.h:908-910) and BFS
signal-flow levelling in between (the reference's spectral-ish weighted
embedding is the 'quality' mode; this is the 'fast' mode).
"""

from __future__ import annotations

from collections import deque, defaultdict
from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

INPUT_LIKE = {"Logic Input", "8bit Input", "Battery Source",
              "Sinewave Source", "Square Source", "Sawtooth Source",
              "Triangle Source", "Pulse Source"}
OUTPUT_LIKE = {"Logic Output", "8bit Display"}


@dataclass
class LayoutStats:
    columns: int = 0
    rows: int = 0
    placed: int = 0


def auto_layout(ex, spacing: float = 0.16, origin=(0.0, 0.0),
                max_rows: int = 32) -> LayoutStats:
    """Place ex.elements on a grid by signal-flow level."""
    n = len(ex.elements)
    if n == 0:
        return LayoutStats()
    idx = {el.identifier: i for i, el in enumerate(ex.elements)}
    succ: Dict[int, List[int]] = defaultdict(list)
    pred: Dict[int, List[int]] = defaultdict(list)
    for w in ex.wires:
        a = idx.get(w.source)
        b = idx.get(w.target)
        if a is None or b is None or a == b:
            continue
        succ[a].append(b)
        pred[b].append(a)

    level = [-1] * n
    dq = deque()
    for i, el in enumerate(ex.elements):
        if el.model_id in INPUT_LIKE or not pred[i]:
            level[i] = 0
            dq.append(i)
    while dq:
        i = dq.popleft()
        for j in succ[i]:
            if level[j] < level[i] + 1:
                level[j] = level[i] + 1
                if level[j] < n:
                    dq.append(j)
    maxl = max((l for l in level if l >= 0), default=0)
    for i, el in enumerate(ex.elements):
        if level[i] < 0:
            level[i] = maxl
        if el.model_id in OUTPUT_LIKE:
            level[i] = maxl + 1

    by_level: Dict[int, List[int]] = defaultdict(list)
    for i in range(n):
        by_level[level[i]].append(i)
    ox, oy = origin
    cols = 0
    rows = 0
    for li, col in enumerate(sorted(by_level)):
        members = by_level[col]
        cols += 1
        for r, i in enumerate(members):
            el = ex.elements[i]
            step = spacing * (2.0 if el.is_big else 1.0)
            x = ox + li * spacing * 2.0
            y = oy + (r % max_rows) * step + (r // max_rows) * 0.02
            el.position = (round(x, 3), round(y, 3), 0.0)
            rows = max(rows, r + 1)
    return LayoutStats(columns=cols, rows=rows, placed=n)
