"""Deterministic geofence zones over the co-moving contacts table.

Same schema as the PIP polygon table (datagen/polygons.py), so the
broadcast R-tree join and the integer ray-cast DuckDB oracle work
unchanged. The base polygon fixture never intersects the track plane
(it targets the image hot centers), so geofencing gets its own zone set
ANCHORED to actual track positions read from the contacts parquet:

- zone_0: square around entity 0's position at seq 30 (a guaranteed
  visit — the anchor ping is strictly inside by construction).
- zone_1: concave star around entity 1's position at seq 80.
- zone_2: wide/short rectangle around entity 2's position at seq 10
  (asymmetric extents exercise the bbox prefilter on both axes).
- zone_3: large central square over the city origin (catches many
  entities — the multi-visitor zone).
- zone_4: far-away empty zone (zero visits, the no-match lane).

Anchoring zones to generated positions keeps everything deterministic
(the contacts table is itself seeded) without hand-tuning coordinates
against the random walk. FIXTURES.md: no external data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _anchor(pdf, entity: int, seq: int) -> tuple[int, int]:
    row = pdf[(pdf["entity_id"] == entity) & (pdf["seq"] == seq)].iloc[0]
    return int(row["lat_e7"]), int(row["lon_e7"])


def write_zones(path: str, contacts_path: str) -> None:
    import pandas as pd

    pdf = pd.read_parquet(
        contacts_path, columns=["entity_id", "seq", "lat_e7", "lon_e7"]
    )
    ids, rings = [], []

    def add(name: str, lat: np.ndarray, lon: np.ndarray) -> None:
        ids.append(name)
        rings.append(
            [{"lat_e7": int(a), "lon_e7": int(o)} for a, o in zip(lat, lon)]
        )

    a0 = _anchor(pdf, 0, 30)
    r = 200_000
    add(
        "zone_0",
        np.array([a0[0] - r, a0[0] - r, a0[0] + r, a0[0] + r]),
        np.array([a0[1] - r, a0[1] + r, a0[1] + r, a0[1] - r]),
    )
    a1 = _anchor(pdf, 1, 80)
    k, r1 = 10, 250_000.0
    ang = 2.0 * np.pi * np.arange(k) / k
    radii = np.where(np.arange(k) % 2 == 0, r1, r1 * 0.45)
    add(
        "zone_1",
        (a1[0] + radii * np.sin(ang)).astype(np.int64),
        (a1[1] + radii * np.cos(ang)).astype(np.int64),
    )
    a2 = _anchor(pdf, 2, 10)
    add(
        "zone_2",
        np.array([a2[0] - 150_000, a2[0] - 150_000,
                  a2[0] + 150_000, a2[0] + 150_000]),
        np.array([a2[1] - 400_000, a2[1] + 400_000,
                  a2[1] + 400_000, a2[1] - 400_000]),
    )
    c = 1_000_000
    add(
        "zone_3",
        np.array([-c, -c, c, c]),
        np.array([-c, c, c, -c]),
    )
    add(
        "zone_4",
        np.array([900_000_000, 900_000_000, 910_000_000, 910_000_000]),
        np.array([900_000_000, 910_000_000, 910_000_000, 900_000_000]),
    )

    lat_arrs = [np.array([p["lat_e7"] for p in rr]) for rr in rings]
    lon_arrs = [np.array([p["lon_e7"] for p in rr]) for rr in rings]
    ring_type = pa.list_(
        pa.struct([("lat_e7", pa.int64()), ("lon_e7", pa.int64())])
    )
    table = pa.table(
        {
            "polygon_id": pa.array(ids, pa.string()),
            "category": pa.array(["fence"] * len(ids), pa.string()),
            "ring": pa.array(rings, ring_type),
            "min_lat": pa.array([int(a.min()) for a in lat_arrs], pa.int64()),
            "max_lat": pa.array([int(a.max()) for a in lat_arrs], pa.int64()),
            "min_lon": pa.array([int(o.min()) for o in lon_arrs], pa.int64()),
            "max_lon": pa.array([int(o.max()) for o in lon_arrs], pa.int64()),
        }
    )
    pq.write_table(table, path)
