"""Deterministic moving-object tracks for the trajectory operators.

Schema: (entity_id int64, seq int64, ts timestamp[naive UTC], lat_e7 int64,
lon_e7 int64). Each entity is a random walk with planted structure the
operators must recover exactly:

- STAY episodes: runs of >= ``stay_pings`` pings jittering within a tight
  radius (far under the detector's eps) while time keeps advancing past
  the minimum stay duration.
- JUMPS: occasional steps far beyond the segmenter's jump threshold
  (teleport/noise in a real feed) — must open a new segment.
- TIME GAPS: occasional inter-ping gaps beyond the session gap — must
  also open a new segment.

Everything is integer e7 fixed-point on the same plane as the image
georefs; coordinates stay within ±8e8 so squared step lengths fit int64
with 10x headroom. FIXTURES.md: no external data; numpy default_rng(seed)
only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# planted magnitudes (e7 units / seconds) — the operator defaults in
# operators/trajectory.py are chosen to recover exactly these
WALK_STEP = 40_000  # normal inter-ping movement scale (~4.4 km)
STAY_JITTER = 2_000  # stay-episode wobble, far under STAY_EPS
JUMP_STEP = 4_000_000  # planted teleport, far over JUMP_E7
GAP_S = 3_600  # planted time gap (1 h), far over the 30-min session gap
BASE_DT_S = 60  # regular ping cadence


def write_tracks(
    path: str,
    n_entities: int,
    pings_per: int,
    seed: int,
    stay_pings: int = 12,
) -> None:
    rng = np.random.default_rng(seed ^ 0x7261636B)  # "rack"
    ent_col, seq_col, ts_col, lat_col, lon_col = [], [], [], [], []
    t0 = np.int64(1_700_000_000)  # fixed epoch base
    for e in range(n_entities):
        lat = float(rng.integers(-600_000_000, 600_000_000))
        lon = float(rng.integers(-600_000_000, 600_000_000))
        t = t0 + int(rng.integers(0, 86_400))
        # plant 2 stays and 1-2 jumps and 1-2 gaps at random seq positions
        stays = set()
        for s in rng.integers(5, max(6, pings_per - stay_pings - 5), size=2):
            stays.update(range(int(s), int(s) + stay_pings))
        jumps = set(int(j) for j in rng.integers(1, pings_per, size=int(rng.integers(1, 3))))
        gaps = set(int(g) for g in rng.integers(1, pings_per, size=int(rng.integers(1, 3))))
        for i in range(pings_per):
            if i in jumps:
                ang = rng.uniform(0, 2 * np.pi)
                lat += JUMP_STEP * np.sin(ang)
                lon += JUMP_STEP * np.cos(ang)
            elif i in stays:
                lat += rng.uniform(-STAY_JITTER, STAY_JITTER)
                lon += rng.uniform(-STAY_JITTER, STAY_JITTER)
            elif i > 0:
                lat += rng.normal(0, WALK_STEP)
                lon += rng.normal(0, WALK_STEP)
            if i in gaps:
                t += GAP_S + int(rng.integers(0, 1_800))
            elif i > 0:
                t += BASE_DT_S + int(rng.integers(0, 30))
            lat = float(np.clip(lat, -8.0e8, 8.0e8))
            lon = float(np.clip(lon, -8.0e8, 8.0e8))
            ent_col.append(e)
            seq_col.append(i)
            ts_col.append(int(t))
            lat_col.append(int(lat))
            lon_col.append(int(lon))
    table = pa.table(
        {
            "entity_id": pa.array(ent_col, pa.int64()),
            "seq": pa.array(seq_col, pa.int64()),
            "ts": pa.array(
                np.array(ts_col, dtype="int64") * 1_000_000, pa.timestamp("us")
            ),
            "lat_e7": pa.array(lat_col, pa.int64()),
            "lon_e7": pa.array(lon_col, pa.int64()),
        }
    )
    pq.write_table(table, path)
