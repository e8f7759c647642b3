"""Exact integer ray-casting point-in-polygon test (pure NumPy).

Integer-only boundary decisions (SURVEY §7.3): coordinates are fixed-point
e7 longs; the crossing test uses the sign of the integer edge cross product
(no division), and the boundary tie rule is **on-edge = inside**. The
DuckDB oracle (operators/pip.py) evaluates the identical integer predicates
(in HUGEINT), so join rows match exactly across engines and parallelism.

Semantics per candidate (point p, ring v0..v{n-1}, closed implicitly):
  cross_i = (x_{i+1}-x_i)*(py-y_i) - (px-x_i)*(y_{i+1}-y_i)
  on_edge = any i: cross_i == 0 and px within [min(x_i,x_{i+1}),max(..)]
                              and py within [min(y_i,y_{i+1}),max(..)]
  crossing_i = (y_i > py) != (y_{i+1} > py)
               and ((y_{i+1} > y_i and cross_i > 0)
                    or (y_{i+1} < y_i and cross_i < 0))
  inside = on_edge or (count(crossing_i) odd)

Overflow note: products are computed only for bbox-prefiltered candidates,
so |px-x_i| etc. are bounded by the polygon extent (<~1e7) and products fit
int64 with 5 decades of headroom.
"""

from __future__ import annotations

import numpy as np


def inside_ring(
    px: np.ndarray, py: np.ndarray, ring_x: np.ndarray, ring_y: np.ndarray
) -> np.ndarray:
    """Vectorized over points for one ring: bool[len(px)]."""
    x1 = ring_x.astype(np.int64)
    y1 = ring_y.astype(np.int64)
    x2 = np.roll(x1, -1)
    y2 = np.roll(y1, -1)
    # points (n,1) against edges (1,m)
    pxc = px.astype(np.int64)[:, None]
    pyc = py.astype(np.int64)[:, None]
    ex1, ey1, ex2, ey2 = x1[None, :], y1[None, :], x2[None, :], y2[None, :]
    cross = (ex2 - ex1) * (pyc - ey1) - (pxc - ex1) * (ey2 - ey1)
    on_edge = (
        (cross == 0)
        & (pxc >= np.minimum(ex1, ex2))
        & (pxc <= np.maximum(ex1, ex2))
        & (pyc >= np.minimum(ey1, ey2))
        & (pyc <= np.maximum(ey1, ey2))
    ).any(axis=1)
    straddle = (ey1 > pyc) != (ey2 > pyc)
    crossing = straddle & (
        ((ey2 > ey1) & (cross > 0)) | ((ey2 < ey1) & (cross < 0))
    )
    odd = (crossing.sum(axis=1) % 2) == 1
    return on_edge | odd
