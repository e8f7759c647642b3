"""Distributed convex hulls — per-group spatial footprints at any group
size.

``trajectory.segment_hulls`` computes a hull per (entity, segment) with
ONE task holding the whole segment — the right contract for tracks, where
a segment is bounded. This module is the SCALE path for hull-per-group
when a group can be arbitrarily large (all images in a zone, a DBSCAN
cluster spanning a continent, a whole corpus footprint): no task ever
holds a group's full point set.

Two stages, exact by the hull-merge identity
``hull(A ∪ B) == hull(hull(A) ∪ hull(B))`` (every extreme point of the
union is extreme in any subset containing it, so stage 1 can never drop
a final hull vertex; applied recursively it also covers mapInPandas
batch splits within a partition):

1. map-side PARTIAL hulls — one ``mapInPandas`` pass emits, per (group,
   arrow batch), only that batch's hull vertices. Zero shuffle; the
   surviving frame is tiny for any realistically-shaped group (a batch's
   hull of k uniform points has O(log k) expected vertices; the
   adversarial worst case — all points on one circle — degrades to a
   pass-through, never to wrong answers).
2. one ``groupBy(group).applyInPandas`` reduce — hull of the union of
   partial vertices, plus the ring stats. The ONLY shuffle in the plan,
   carrying hull vertices instead of raw points.

Exactness: orientation tests and the shoelace sum run in Python
arbitrary-precision ints (a cross product of e7 deltas already needs 62
bits; the shoelace SUM overflows int64 at continental extents —
so ``area2`` is emitted as decimal(38,0): unlike the track-local
segment_hulls, whose int64 bound is fine for physically moving entities,
a whole-planet group's doubled area reaches ~1.3e19 > 2^63). The hull is
a pure function of the point
SET, so results are identical under any partitioning, batch size, or row
order.

Output ring contract: strict hull (collinear boundary points dropped),
vertices in counter-clockwise order starting at the lexicographically
smallest (lon, lat) point; degenerate sets yield 1-vertex (point) or
2-vertex (segment) rings with area 0. ``area2`` is the doubled shoelace
area, ``perim_len`` the floor'd-integer perimeter (order-canonical
``isqrt`` per edge, chord counted once for 2-vertex rings) — formulas
shared with trajectory.segment_hulls so the two operators agree on every
group both can compute.
"""

from __future__ import annotations

import math
from decimal import Decimal
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame


def _chain_sorted(pts: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Monotone-chain half scans over an already sorted, deduplicated
    point list — exact Python-int cross products (a cross of e7 deltas
    needs 62 bits; Python ints never overflow)."""
    if len(pts) <= 2:
        return list(pts)

    def half(seq):
        out: list[tuple[int, int]] = []
        for p in seq:
            while len(out) >= 2:
                ox, oy = out[-2]
                ax, ay = out[-1]
                if (ax - ox) * (p[1] - oy) - (ay - oy) * (p[0] - ox) <= 0:
                    out.pop()
                else:
                    break
            out.append(p)
        return out

    lower = half(pts)
    upper = half(pts[::-1])
    return lower[:-1] + upper[:-1]


def monotone_chain(pts: Sequence[tuple[int, int]]) -> list[tuple[int, int]]:
    """Strict convex hull (Andrew's monotone chain) over exact ints,
    counter-clockwise, starting at min (x, y). Public algorithm; same
    strict-turn discipline as trajectory.segment_hulls' kernel."""
    return _chain_sorted(sorted(set(pts)))


def _hull_xy(xs: np.ndarray, ys: np.ndarray) -> list[tuple[int, int]]:
    """Exact hull from int64 coordinate arrays — the r6 fast path for
    the per-batch partial stage, which was spending ~140us/row building
    Python tuples and sorting them for EVERY input point (guide §4.2).

    Two vectorized pre-passes, both exactness-preserving:

    1. Akl–Toussaint interior pruning: points strictly inside the
       quadrilateral of the four axis-extreme points can never be hull
       vertices. The four half-plane tests run in float64 with a
       CONSERVATIVE margin derived from the group's own coordinate
       span (the float cross's absolute error is ~2^-52 * |cross|; the
       margin is ~1e4x that), so only decisively-interior points drop
       and borderline points are kept for the exact scan — the hull is
       identical by construction, pruning only changes how many points
       reach it.
    2. np.unique row sort == ``sorted(set(pts))`` for integer pairs.

    The exact integer half scans then run over the few survivors.
    """
    n = xs.size
    if n > 16:
        xf = xs.astype(np.float64)
        yf = ys.astype(np.float64)
        s = xs + ys  # |coord| <= ~1.8e9 in this engine: no int64 overflow
        d = xs - ys
        # CCW octagon of the 8 directional extremes (Akl–Toussaint);
        # consecutive duplicate corners would degenerate an edge to
        # zero length (cr == 0 everywhere -> nothing prunes), so they
        # collapse first
        ring = [
            int(xs.argmin()), int(s.argmin()), int(ys.argmin()),
            int(d.argmax()), int(xs.argmax()), int(s.argmax()),
            int(ys.argmax()), int(d.argmin()),
        ]
        corners = []
        for idx in ring:
            p = (int(xs[idx]), int(ys[idx]))
            if not corners or (corners[-1][1] != p and corners[0][1] != p):
                corners.append((idx, p))
        if len(corners) >= 3:
            span = float(
                max(
                    int(xs.max()) - int(xs.min()),
                    int(ys.max()) - int(ys.min()),
                    1,
                )
            )
            margin = span * span * 1e-12
            inside = np.ones(n, dtype=bool)
            for k in range(len(corners)):
                i = corners[k][0]
                j = corners[(k + 1) % len(corners)][0]
                ex, ey = xf[j] - xf[i], yf[j] - yf[i]
                cr = ex * (yf - yf[i]) - ey * (xf - xf[i])
                inside &= cr > margin
            keep = ~inside
            xs, ys = xs[keep], ys[keep]
    # sorted(set(pts)) vectorized: lexsort by (x, y), drop adjacent dups
    order = np.lexsort((ys, xs))
    xs, ys = xs[order], ys[order]
    if xs.size > 1:
        uniq = np.empty(xs.size, dtype=bool)
        uniq[0] = True
        np.logical_or(xs[1:] != xs[:-1], ys[1:] != ys[:-1], out=uniq[1:])
        xs, ys = xs[uniq], ys[uniq]
    return _chain_sorted(list(zip(xs.tolist(), ys.tolist())))


def ring_stats(hull: list[tuple[int, int]]) -> tuple[int, int]:
    """(abs doubled shoelace area, floor'd integer perimeter) of a ring —
    the exact formulas of trajectory.segment_hulls."""
    m = len(hull)
    area2 = 0
    perim = 0
    if m >= 2:
        for i in range(m):
            x1, y1 = hull[i]
            x2, y2 = hull[(i + 1) % m]
            area2 += x1 * y2 - x2 * y1
            perim += math.isqrt((x2 - x1) ** 2 + (y2 - y1) ** 2)
        if m == 2:
            perim //= 2  # the 2-vertex "ring" walks the chord twice
    return abs(area2), perim


def group_hulls(
    df: DataFrame,
    group_cols: Sequence[str],
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
) -> DataFrame:
    """Per-group exact convex hull ring + stats, two-stage.

    Returns one row per group: ``hull_lon``/``hull_lat`` (parallel
    arrays, the CCW ring), ``n_points`` (rows reaching the reduce — the
    partial-hull count, NOT the input count; hulls are size-oblivious),
    ``hull_n``, ``area2``, ``perim_len``.
    """
    gcols = list(group_cols)
    src = df.select(*gcols, lat_col, lon_col)
    narrow_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields
    )

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # per-batch shape matters (r6): materializing a sub-DataFrame
        # per group and concat'ing thousands of them cost ~300ms per
        # 2048-row Arrow batch — 17x the actual hull work. groupby
        # .indices + slicing the two coordinate arrays + ONE output
        # frame per batch is the same computation at ~17ms.
        for pdf in batches:
            if not len(pdf):
                continue
            xs = pdf[lon_col].to_numpy(np.int64)
            ys = pdf[lat_col].to_numpy(np.int64)
            grouper = pdf.groupby(gcols, sort=False, dropna=False)
            keys: dict[str, list] = {c: [] for c in gcols}
            lon_out: list[int] = []
            lat_out: list[int] = []
            for key, idx in grouper.indices.items():
                hull = _hull_xy(xs[idx], ys[idx])
                if not isinstance(key, tuple):
                    key = (key,)
                for c, kv in zip(gcols, key):
                    keys[c].extend([kv] * len(hull))
                lon_out.extend(p[0] for p in hull)
                lat_out.extend(p[1] for p in hull)
            if lon_out:
                yield pd.DataFrame(
                    {**keys, lat_col: lat_out, lon_col: lon_out}
                )

    partials = src.mapInPandas(partial, narrow_schema)

    out_schema = (
        ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in src.schema.fields[: len(gcols)])
        + ", n_points long, hull_n long, area2 decimal(38,0), perim_len long,"
        " hull_lon array<long>, hull_lat array<long>"
    )

    def reduce_group(pdf: pd.DataFrame) -> pd.DataFrame:
        hull = _hull_xy(
            pdf[lon_col].to_numpy(np.int64),
            pdf[lat_col].to_numpy(np.int64),
        )
        area2, perim = ring_stats(hull)
        return pd.DataFrame(
            {
                **{c: [pdf[c].iloc[0]] for c in gcols},
                "n_points": [len(pdf)],
                "hull_n": [len(hull)],
                "area2": [Decimal(area2)],
                "perim_len": [perim],
                "hull_lon": [[p[0] for p in hull]],
                "hull_lat": [[p[1] for p in hull]],
            }
        )

    return partials.groupBy(*gcols).applyInPandas(reduce_group, out_schema)
