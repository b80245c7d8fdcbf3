"""Bin-edge / interval label formatting.

Labels must be byte-identical to the reference because the WoE lookup in
transform() joins on the label string (MOBPY/binning/mob.py:412-420,
449-465). Formatting rules: MOBPY/binning/mob.py:30-48.
"""

from __future__ import annotations

import math


def format_edge(val: float) -> str:
    """-inf/+inf; scientific %.2e outside [0.01, 1000]; else %.4g."""
    if math.isinf(val):
        return "-inf" if val < 0 else "+inf"
    if abs(val) < 0.01 or abs(val) > 1000:
        return f"{val:.2e}"
    return f"{val:.4g}"


def interval_label(left: float, right: float) -> str:
    """Half-open label ``[l, r)``; the first (-inf) bin opens with ``(``
    (MOBPY/binning/mob.py:455-459)."""
    label = f"[{format_edge(left)}, {format_edge(right)})"
    if math.isinf(left) and left < 0:
        label = "(" + label[1:]
    return label
