"""Deterministic polygon table for the PIP join (FIXTURES.md §2).

Schema: (polygon_id string, category string,
         ring list<struct<lat_e7 int64, lon_e7 int64>>,
         min_lat/max_lat/min_lon/max_lon int64  — precomputed bbox).

Rings are integer fixed-point, CCW, closed implicitly. The set includes
convex and concave (star) rings around seeded centroids, one far-away
polygon containing no points, polygons over the skew fixture's hot centers,
and an axis-aligned rectangle whose edges pass through exact grid points
(exercises the on-edge = inside tie rule, SURVEY §7.3).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from jimmy_spark.datagen.core import splitmix64
from jimmy_spark.datagen.images import HOT_CENTERS

CATEGORIES = ("admin", "park", "water")


def _ring(cx: int, cy: int, rmax: float, k: int, concave: bool, rng_vals: np.ndarray):
    """CCW integer ring around (cy=lat, cx=lon)."""
    ang = 2.0 * np.pi * np.arange(k) / k
    radii = rmax * (0.55 + 0.45 * (rng_vals % 1000) / 999.0)
    if concave:
        radii = np.where(np.arange(k) % 2 == 0, radii, radii * 0.45)
    lat = (cy + radii * np.sin(ang)).astype(np.int64)
    lon = (cx + radii * np.cos(ang)).astype(np.int64)
    return lat, lon


def generate_polygons(n: int = 40, seed: int = 42) -> pa.Table:
    ids, cats, rings = [], [], []
    h = splitmix64(np.arange(n * 16, dtype=np.uint64) ^ np.uint64(seed * 104729))
    j = 0

    def add(lat: np.ndarray, lon: np.ndarray, cat: str):
        nonlocal j
        ids.append(f"poly_{j:04d}")
        cats.append(cat)
        rings.append(
            [{"lat_e7": int(a), "lon_e7": int(o)} for a, o in zip(lat, lon)]
        )
        j += 1

    # 1) polygons over hot centers (guaranteed matches incl. skew fixture)
    for ci, (clat, clon) in enumerate(HOT_CENTERS):
        k = 6 + ci * 2
        lat, lon = _ring(clon, clat, 60_000 + 20_000 * ci, k, ci % 2 == 1,
                         h[ci * 16 : ci * 16 + k])
        add(lat, lon, CATEGORIES[ci % 3])

    # 2) grid-aligned rectangle with integer-crossing edges (tie rule)
    clat, clon = HOT_CENTERS[0]
    add(
        np.array([clat - 30_000, clat - 30_000, clat + 30_000, clat + 30_000]),
        np.array([clon - 30_000, clon + 30_000, clon + 30_000, clon - 30_000]),
        "admin",
    )

    # 3) far-away empty polygon (matches 0 points: mid-Pacific nowhere)
    add(
        np.array([-640000000, -640000000, -639000000, -639000000]),
        np.array([-1200000000, -1199000000, -1199000000, -1200000000]),
        "water",
    )

    # 4) seeded scatter across the globe (convex + concave)
    m = n - j
    for t in range(m):
        hv = h[(3 + t) * 16 : (3 + t) * 16 + 12]
        clat = int(hv[0] % np.uint64(1_400_000_000)) - 700_000_000
        clon = int(hv[1] % np.uint64(3_400_000_000)) - 1_700_000_000
        k = 5 + int(hv[2] % np.uint64(8))
        lat, lon = _ring(clon, clat, 150_000 + float(hv[3] % np.uint64(350_000)),
                         k, bool(int(hv[4]) % 2), hv[:k])
        add(lat, lon, CATEGORIES[t % 3])

    lat_arrs = [np.array([p["lat_e7"] for p in r]) for r in rings]
    lon_arrs = [np.array([p["lon_e7"] for p in r]) for r in rings]
    ring_type = pa.list_(
        pa.struct([("lat_e7", pa.int64()), ("lon_e7", pa.int64())])
    )
    return pa.table(
        {
            "polygon_id": pa.array(ids, pa.string()),
            "category": pa.array(cats, pa.string()),
            "ring": pa.array(rings, ring_type),
            "min_lat": pa.array([int(a.min()) for a in lat_arrs], pa.int64()),
            "max_lat": pa.array([int(a.max()) for a in lat_arrs], pa.int64()),
            "min_lon": pa.array([int(o.min()) for o in lon_arrs], pa.int64()),
            "max_lon": pa.array([int(o.max()) for o in lon_arrs], pa.int64()),
        }
    )


def write_polygons(path: str, n: int = 40, seed: int = 42) -> None:
    pq.write_table(generate_polygons(n, seed), path, compression="zstd")
