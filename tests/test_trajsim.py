"""Trajectory similarity join (operators/trajsim.py) — verification:

- brute-force all-pairs pure-Python DP twin (an independent recursive
  formulation with memoization, vs the operator's batched iterative
  row DP): the join's pair SET is exact (nothing missed by the
  endpoint-grid candidate pruning, nothing extra) and the int64
  frechet2 / haus2 metrics are bit-identical;
- planted geometry: a track and its rigid translate pair at exactly
  delta^2 (coupling lower bound == aligned-coupling upper bound);
- Hausdorff <= Frechet invariant on every emitted pair;
- exactly-once (a < b, no self pairs, no duplicates);
- partitioning invariance;
- the pair-batch chunking path (batch_pairs=1) is byte-identical.
"""

from __future__ import annotations

import sys
from functools import lru_cache

import pandas as pd
import pytest
from pyspark.sql import functions as F

from jimmy_spark.operators import trajectory as tj
from jimmy_spark.operators import trajsim


@pytest.fixture(scope="module")
def small_tracks(spark):
    # bespoke carpool-shaped fixture: 4 base routes, each traversed by 4
    # entities under a small rigid shift + per-point jitter (real near
    # pairs within a base, far across bases), plus 4 independent random
    # walks (outliers), plus mid-track time gaps on every third entity
    # so segmentation genuinely splits some tracks. Brute force is
    # O(T^2 * n * m) Python — 20 entities x 24 pings keeps it fast.
    import random

    rng = random.Random(7)
    rows = []
    ent = 0
    for base in range(4):
        ox0 = 10_000_000 + base * 40_000_000
        oy0 = -5_000_000 + base * 25_000_000
        route = [
            (
                ox0 + i * 9000 + rng.randint(-400, 400),
                oy0 + int(i * i * 310) + rng.randint(-400, 400),
            )
            for i in range(24)
        ]
        for v in range(4):
            sx, sy = rng.randint(-3000, 3000), rng.randint(-3000, 3000)
            t = 1_700_000_000 + ent * 100_000
            for i, (lon, lat) in enumerate(route):
                if ent % 3 == 0 and i == 12:
                    t += 7200  # gap: splits this entity into 2 segments
                rows.append(
                    (
                        ent, i, t + i * 60,
                        lat + sy + rng.randint(-250, 250),
                        lon + sx + rng.randint(-250, 250),
                    )
                )
            ent += 1
    for _ in range(4):  # outlier walks, far from every base
        lon = rng.randint(-170, -120) * 10_000_000
        lat = rng.randint(-60, 60) * 10_000_000
        t = 1_700_000_000 + ent * 100_000
        for i in range(24):
            lon += rng.randint(-40_000, 40_000)
            lat += rng.randint(-40_000, 40_000)
            rows.append((ent, i, t + i * 60, lat, lon))
        ent += 1
    pdf = pd.DataFrame(
        rows, columns=["entity_id", "seq", "epoch", "lat_e7", "lon_e7"]
    )
    return spark.createDataFrame(pdf).select(
        "entity_id", "seq",
        F.timestamp_seconds("epoch").alias("ts"),
        "lat_e7", "lon_e7",
    )


@pytest.fixture(scope="module")
def segged(small_tracks):
    return tj.segment_tracks(small_tracks)


def _frechet2_py(a: list[tuple[int, int]], b: list[tuple[int, int]]) -> int:
    """Independent twin: top-down recursive discrete Frechet with
    memoization (the operator is a bottom-up batched row DP)."""
    sys.setrecursionlimit(10_000)

    def d2(i: int, j: int) -> int:
        dx, dy = a[i][0] - b[j][0], a[i][1] - b[j][1]
        return dx * dx + dy * dy

    @lru_cache(maxsize=None)
    def c(i: int, j: int) -> int:
        if i == 0 and j == 0:
            return d2(0, 0)
        if i == 0:
            return max(d2(0, j), c(0, j - 1))
        if j == 0:
            return max(d2(i, 0), c(i - 1, 0))
        return max(d2(i, j), min(c(i - 1, j), c(i, j - 1), c(i - 1, j - 1)))

    out = c(len(a) - 1, len(b) - 1)
    c.cache_clear()
    return out


def _haus2_py(a: list[tuple[int, int]], b: list[tuple[int, int]]) -> int:
    def d2(p, q) -> int:
        return (p[0] - q[0]) ** 2 + (p[1] - q[1]) ** 2

    ab = max(min(d2(p, q) for q in b) for p in a)
    ba = max(min(d2(p, q) for p in a) for q in b)
    return max(ab, ba)


def _all_tracks(segged) -> dict[str, list[tuple[int, int]]]:
    pdf = (
        segged.select("entity_id", "seg_seq", "seq", "lon_e7", "lat_e7")
        .toPandas()
        .sort_values(["entity_id", "seg_seq", "seq"])
    )
    out: dict[str, list[tuple[int, int]]] = {}
    for (ent, seg), g in pdf.groupby(["entity_id", "seg_seq"]):
        out[f"{ent}#{seg}"] = list(zip(g["lon_e7"], g["lat_e7"]))
    return out


def _brute_pairs(tracks: dict, d: int) -> dict[tuple[str, str], tuple[int, int]]:
    keys = sorted(tracks)
    out = {}
    for i, ka in enumerate(keys):
        for kb in keys[i + 1 :]:
            fr2 = _frechet2_py(tracks[ka], tracks[kb])
            if fr2 <= d * d:
                out[(ka, kb)] = (fr2, _haus2_py(tracks[ka], tracks[kb]))
    return out


D = 60_000  # ~6.6 km — wide enough for real pairs on the random walks


class TestFrechetJoin:
    def test_matches_brute_force_exactly(self, segged):
        got = {
            (r["a_track"], r["b_track"]): (r["frechet2"], r["haus2"])
            for r in trajsim.frechet_join(segged, D).collect()
        }
        want = _brute_pairs(_all_tracks(segged), D)
        assert len(want) >= 3, "fixture must produce real pairs"
        assert got == want

    def test_exactly_once_and_ordered(self, segged):
        pdf = trajsim.frechet_join(segged, D).toPandas()
        assert (pdf["a_track"] < pdf["b_track"]).all()
        assert not pdf.duplicated(["a_track", "b_track"]).any()

    def test_hausdorff_bounded_by_frechet(self, segged):
        pdf = trajsim.frechet_join(segged, D).toPandas()
        assert (pdf["haus2"] <= pdf["frechet2"]).all()

    def test_partitioning_invariance(self, segged):
        base = trajsim.frechet_join(segged, D).toPandas()
        shuf = trajsim.frechet_join(segged.repartition(13), D).toPandas()
        key = ["a_track", "b_track"]
        pd.testing.assert_frame_equal(
            base.sort_values(key).reset_index(drop=True),
            shuf.sort_values(key).reset_index(drop=True),
        )

    def test_batch_chunking_identical(self, segged):
        base = trajsim.frechet_join(segged, D).toPandas()
        chunked = trajsim.frechet_join(segged, D, batch_pairs=1).toPandas()
        key = ["a_track", "b_track"]
        pd.testing.assert_frame_equal(
            base.sort_values(key).reset_index(drop=True),
            chunked.sort_values(key).reset_index(drop=True),
        )

    def test_planted_translate_pair(self, spark):
        # entity 2 = entity 1 shifted by (dx, dy): identical shape, so
        # the aligned coupling costs exactly dx^2+dy^2, and the first
        # vertices already realize it as a lower bound -> equality
        dx, dy = 30, 40  # frechet2 = 2500
        pts = [(10_000_000 + 137 * i, 20_000_000 + 211 * i) for i in range(12)]
        rows = []
        for ent, (ox, oy) in ((1, (0, 0)), (2, (dx, dy))):
            for i, (lon, lat) in enumerate(pts):
                rows.append((ent, i, lon + ox, lat + oy))
        df = spark.createDataFrame(
            pd.DataFrame(rows, columns=["entity_id", "seq", "lon_e7", "lat_e7"])
        ).select(
            "entity_id", "seq",
            F.timestamp_seconds(F.lit(1_700_000_000) + F.col("seq")).alias("ts"),
            "lat_e7", "lon_e7",
        )
        out = trajsim.frechet_join(tj.segment_tracks(df), 100).collect()
        assert len(out) == 1
        assert out[0]["a_track"] == "1#1" and out[0]["b_track"] == "2#1"
        assert out[0]["frechet2"] == dx * dx + dy * dy
        assert out[0]["haus2"] == dx * dx + dy * dy


def test_dp_exact_at_full_coordinate_extremes():
    """r6 ADVICE fix: the DP lattice is uint64 — globe-spanning tracks
    (lon -1.8e9..1.8e9) produce off-path cell distances up to ~1.3e19,
    which overflowed the r5 int64 lattice (numpy wraps silently) and
    could corrupt haus2/frechet2 for pairs that legitimately survive
    the gate; the 2^62 sentinel was also smaller than such cells. The
    arbitrary-precision Python twins are the oracle."""
    import numpy as np

    from jimmy_spark.operators.trajsim import _dp_metrics

    # A spans the full longitude range; B is A nudged by (7, -3): the
    # pair survives any d >= ~8, while far-apart vertex pairs produce
    # squared distances above int64 max
    lons = np.linspace(-1_800_000_000, 1_800_000_000, 9).astype(np.int64)
    lats = np.linspace(-850_000_000, 850_000_000, 9).astype(np.int64)
    a = list(zip(lons.tolist(), lats.tolist()))
    b = [(x + 7, y - 3) for x, y in a]
    fr, hs = _dp_metrics(
        [np.array([p[0] for p in a], np.int64)],
        [np.array([p[1] for p in a], np.int64)],
        [np.array([p[0] for p in b], np.int64)],
        [np.array([p[1] for p in b], np.int64)],
    )
    assert int(fr[0]) == _frechet2_py(a, b) == 49 + 9
    assert int(hs[0]) == _haus2_py(a, b)
    # an off-path cell really does exceed int64 (the r5 failure mode)
    assert (a[0][0] - b[-1][0]) ** 2 > 2**63 - 1
