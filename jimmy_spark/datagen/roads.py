"""Deterministic road-segment network for the map-matching operator.

Schema: (road_id int64, seg_id int64, ax int64, ay int64, bx int64,
by int64) — x = lon_e7, y = lat_e7 on the same fixed-point plane as the
tracks. The network is a jittered grid: north-south and east-west
polylines at ``SPACING`` intervals across the track extent plus a few
diagonals, each polyline a chain of ~``STEP``-long segments whose
vertices carry perpendicular jitter so segment directions vary (an
axis-parallel-only network would never exercise the projection math).

Sizing contract with operators/mapmatch.py D_MAX: the grid spacing is
6e7 while D_MAX is 2.2e7, so a ping's distance to the nearest ideal grid
line is uniform in [0, 3e7] per axis — entities whose (tightly clustered)
track falls far from both a NS and an EW line, with no diagonal nearby,
stay unmatched, exercising the no-match lane. FIXTURES.md: no external
data; numpy default_rng only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

EXTENT = 640_000_000  # lines span [-EXTENT, EXTENT]
SPACING = 60_000_000  # grid line spacing
STEP = 8_000_000  # nominal segment length along the line
JITTER = 1_000_000  # perpendicular vertex jitter
N_DIAG = 10


def write_roads(path: str, seed: int) -> None:
    rng = np.random.default_rng(seed ^ 0x726F6164)  # "road"
    roads: list[tuple[int, np.ndarray, np.ndarray]] = []  # (id, xs, ys)
    rid = 0
    n_t = 2 * EXTENT // STEP + 1
    t = np.linspace(-EXTENT, EXTENT, int(n_t))
    offsets = np.arange(-EXTENT, EXTENT + 1, SPACING)
    for off in offsets:  # north-south lines (x ~ off)
        xs = off + rng.uniform(-JITTER, JITTER, t.size)
        roads.append((rid, xs, t.copy()))
        rid += 1
    for off in offsets:  # east-west lines (y ~ off)
        ys = off + rng.uniform(-JITTER, JITTER, t.size)
        roads.append((rid, t.copy(), ys))
        rid += 1
    for _ in range(N_DIAG):  # diagonals through random anchors
        x0 = float(rng.integers(-EXTENT // 2, EXTENT // 2))
        y0 = float(rng.integers(-EXTENT // 2, EXTENT // 2))
        ang = float(rng.uniform(0, np.pi))
        half = float(rng.integers(EXTENT // 4, EXTENT // 2))
        s = np.linspace(-half, half, int(2 * half / STEP) + 2)
        xs = x0 + s * np.cos(ang) + rng.uniform(-JITTER, JITTER, s.size)
        ys = y0 + s * np.sin(ang) + rng.uniform(-JITTER, JITTER, s.size)
        roads.append((rid, xs, ys))
        rid += 1
    road_col, seg_col, ax_col, ay_col, bx_col, by_col = [], [], [], [], [], []
    for r, xs, ys in roads:
        xi = np.clip(xs, -8.0e8, 8.0e8).astype(np.int64)
        yi = np.clip(ys, -8.0e8, 8.0e8).astype(np.int64)
        for i in range(xi.size - 1):
            road_col.append(r)
            seg_col.append(i)
            ax_col.append(int(xi[i]))
            ay_col.append(int(yi[i]))
            bx_col.append(int(xi[i + 1]))
            by_col.append(int(yi[i + 1]))
    table = pa.table(
        {
            "road_id": pa.array(road_col, pa.int64()),
            "seg_id": pa.array(seg_col, pa.int64()),
            "ax": pa.array(ax_col, pa.int64()),
            "ay": pa.array(ay_col, pa.int64()),
            "bx": pa.array(bx_col, pa.int64()),
            "by": pa.array(by_col, pa.int64()),
        }
    )
    pq.write_table(table, path)
