"""Deterministic co-moving entity tracks for the spatio-temporal contact
join (operators/stjoin.py).

The base tracks table (datagen/tracks.py) spreads entities across the whole
±6e8 plane, so cross-entity proximity is a measure-zero accident there.
This table plants the structure a contact/convoy detector must recover:

- All entities walk inside one shared "city" square (±3e6 e7-units), so
  chance encounters exist — the brute-force differential tests treat those
  as truth, not noise.
- CONVOY episodes: a follower copies its leader's position (jitter far
  under the join distance) for a planted run of consecutive pings, then
  walks independently. One pair and one triple are planted, giving runs of
  known minimum length for the convoy miner.
- A GHOST pair: the follower replays the leader's exact spatial path with
  every timestamp shifted far beyond the join's time tolerance — spatially
  identical, temporally disjoint. A space-only join would pair them; the
  spatio-temporal join must not (from their planted overlap; random
  city-square encounters remain possible and are covered by brute force).

Schema matches the tracks table: (entity_id int64, seq int64,
ts timestamp[us, naive UTC], lat_e7 int64, lon_e7 int64); everything stays
integer e7 fixed-point on the image-georef plane. FIXTURES.md: no external
data; numpy default_rng(seed) only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

CITY_HALF = 3_000_000  # shared square: starts within ±0.3 deg
WALK_STEP = 30_000  # normal inter-ping movement scale
CONVOY_JITTER = 8_000  # follower wobble, far under the join's d
CADENCE_S = 60  # regular ping cadence
GHOST_SHIFT_S = 1_200  # ghost-pair time shift, far over the join's tau

# planted episodes: (follower, leader, first ping idx, last ping idx)
CONVOYS = [
    (1, 0, 20, 59),  # pair, 40 consecutive pings
    (3, 2, 60, 95),  # triple ...
    (4, 2, 60, 95),  # ... (3 and 4 both shadow 2, so 3-4 also co-move)
]
GHOST = (6, 5)  # entity 6 replays 5's path, time-shifted


def write_contacts(
    path: str, n_entities: int, pings_per: int, seed: int
) -> None:
    rng = np.random.default_rng(seed ^ 0x636F6E74)  # "cont"
    t0 = np.int64(1_700_000_000)
    # leaders first: every entity gets an independent walk + timestamps
    lats = np.empty((n_entities, pings_per), dtype=np.int64)
    lons = np.empty((n_entities, pings_per), dtype=np.int64)
    tss = np.empty((n_entities, pings_per), dtype=np.int64)
    for e in range(n_entities):
        lat = float(rng.integers(-CITY_HALF, CITY_HALF))
        lon = float(rng.integers(-CITY_HALF, CITY_HALF))
        t = int(t0 + rng.integers(0, CADENCE_S))
        for i in range(pings_per):
            if i > 0:
                lat += rng.normal(0, WALK_STEP)
                lon += rng.normal(0, WALK_STEP)
                t += CADENCE_S
            lats[e, i] = int(lat)
            lons[e, i] = int(lon)
            tss[e, i] = t
    # planted convoys: follower shadows the leader ping-for-ping
    for follower, leader, i0, i1 in CONVOYS:
        for i in range(i0, i1 + 1):
            lats[follower, i] = lats[leader, i] + int(
                rng.integers(-CONVOY_JITTER, CONVOY_JITTER)
            )
            lons[follower, i] = lons[leader, i] + int(
                rng.integers(-CONVOY_JITTER, CONVOY_JITTER)
            )
            tss[follower, i] = tss[leader, i] + int(rng.integers(0, 20))
    # ghost pair: identical path, timestamps far outside tau
    g_f, g_l = GHOST
    lats[g_f, :] = lats[g_l, :]
    lons[g_f, :] = lons[g_l, :]
    tss[g_f, :] = tss[g_l, :] + GHOST_SHIFT_S

    ents = np.repeat(np.arange(n_entities, dtype=np.int64), pings_per)
    seqs = np.tile(np.arange(pings_per, dtype=np.int64), n_entities)
    table = pa.table(
        {
            "entity_id": pa.array(ents, pa.int64()),
            "seq": pa.array(seqs, pa.int64()),
            "ts": pa.array(tss.reshape(-1) * 1_000_000, pa.timestamp("us")),
            "lat_e7": pa.array(lats.reshape(-1), pa.int64()),
            "lon_e7": pa.array(lons.reshape(-1), pa.int64()),
        }
    )
    pq.write_table(table, path)
