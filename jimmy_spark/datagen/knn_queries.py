"""Deterministic kNN query table (FIXTURES.md §4).

Schema: (query_id string, lat_e7 int64, lon_e7 int64, k int32).
Mix of dense-cell (near hot centers), uniform, and empty-region points.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from jimmy_spark.datagen.core import splitmix64
from jimmy_spark.datagen.images import HOT_CENTERS

K_CYCLE = (1, 5, 20)


def generate_knn_queries(m: int = 60, seed: int = 42) -> pa.Table:
    idx = np.arange(m, dtype=np.uint64)
    h = splitmix64(idx ^ np.uint64(seed * 65537))
    kind = idx.astype(np.int64) % 3  # 0: hot-center jitter, 1: uniform, 2: sparse
    which = (h % np.uint64(len(HOT_CENTERS))).astype(np.int64)
    jit_lat = ((h >> np.uint64(8)) % np.uint64(200_000)).astype(np.int64) - 100_000
    jit_lon = ((h >> np.uint64(24)) % np.uint64(200_000)).astype(np.int64) - 100_000
    hot_lat = np.choose(which, [c[0] for c in HOT_CENTERS]) + jit_lat
    hot_lon = np.choose(which, [c[1] for c in HOT_CENTERS]) + jit_lon
    uni_lat = ((h >> np.uint64(4)) % np.uint64(1_700_000_000)).astype(np.int64) - 850_000_000
    uni_lon = ((h >> np.uint64(20)) % np.uint64(3_600_000_000 // 2)).astype(np.int64) * 2 - 1_800_000_000
    # "sparse": southern-ocean band where few phash-derived points fall
    sp_lat = -820_000_000 + (h % np.uint64(10_000_000)).astype(np.int64)
    sp_lon = ((h >> np.uint64(16)) % np.uint64(3_000_000_000)).astype(np.int64) - 1_500_000_000
    lat = np.select([kind == 0, kind == 1], [hot_lat, uni_lat], sp_lat)
    lon = np.select([kind == 0, kind == 1], [hot_lon, uni_lon], sp_lon)
    k = np.array(K_CYCLE, dtype=np.int32)[idx.astype(np.int64) % 3]
    return pa.table(
        {
            "query_id": pa.array([f"q_{i:04d}" for i in range(m)], pa.string()),
            "lat_e7": pa.array(lat, pa.int64()),
            "lon_e7": pa.array(lon, pa.int64()),
            "k": pa.array(k, pa.int32()),
        }
    )


def write_knn_queries(path: str, m: int = 60, seed: int = 42) -> None:
    pq.write_table(generate_knn_queries(m, seed), path, compression="zstd")
