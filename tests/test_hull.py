"""Distributed two-stage convex hulls (operators/hull.py).

Oracle: an INDEPENDENT gift-wrapping (Jarvis march) implementation below —
a different algorithm from the operator's monotone chain, also exact-int.
Cross-checks: the single-task trajectory.segment_hulls twin on the tracks
fixture, the hull-merge identity (two-stage == direct), an exact
all-points-inside verifier, and adversarial/degenerate point sets.
"""

import numpy as np
import pandas as pd
import pytest

from jimmy_spark.operators import hull as H


def _cross(o, a, b):
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def gift_wrap(pts):
    """Strict hull, CCW from min point — Jarvis march, collinear resolved
    to the farthest point so inner collinear points drop out."""
    pts = sorted(set(pts))
    if len(pts) <= 2:
        return list(pts)
    start = pts[0]
    out = [start]
    cur = start
    while True:
        cand = None
        for p in pts:
            if p == cur:
                continue
            if cand is None:
                cand = p
                continue
            cr = _cross(cur, cand, p)
            if cr < 0:
                cand = p
            elif cr == 0:
                da = (p[0] - cur[0]) ** 2 + (p[1] - cur[1]) ** 2
                db = (cand[0] - cur[0]) ** 2 + (cand[1] - cur[1]) ** 2
                if da > db:
                    cand = p
        if cand == start:
            break
        out.append(cand)
        cur = cand
        assert len(out) <= len(pts), "gift wrap runaway"
    return out


def _inside_or_on(hull, p):
    """Exact: p left-of-or-on every CCW edge (1/2-vertex rings: on the
    point / on the segment)."""
    m = len(hull)
    if m == 1:
        return p == hull[0]
    if m == 2:
        a, b = hull
        if _cross(a, b, p) != 0:
            return False
        return min(a[0], b[0]) <= p[0] <= max(a[0], b[0]) and min(
            a[1], b[1]
        ) <= p[1] <= max(a[1], b[1])
    return all(_cross(hull[i], hull[(i + 1) % m], p) >= 0 for i in range(m))


def _mk_df(spark, groups, parts=None):
    rows = [
        (g, int(lat), int(lon)) for g, pts in groups.items() for lon, lat in pts
    ]
    df = spark.createDataFrame(rows, "gid string, lat_e7 long, lon_e7 long")
    return df.repartition(parts) if parts else df


def _collect(df):
    return {
        r.gid: {
            "ring": list(zip(r.hull_lon, r.hull_lat)),
            "hull_n": r.hull_n,
            "area2": r.area2,
            "perim_len": r.perim_len,
        }
        for r in df.collect()
    }


def _rand_groups(seed=3, n_groups=5, n=160, span=1_500_000_000):
    rng = np.random.default_rng(seed)
    return {
        f"g{k}": [
            (int(x), int(y))
            for x, y in zip(
                rng.integers(-span, span, size=n), rng.integers(-span, span, size=n)
            )
        ]
        for k in range(n_groups)
    }


class TestGroupHulls:
    def test_matches_gift_wrap_continental_extents(self, spark):
        # spans force >int64 cross products — exactness is the point
        groups = _rand_groups()
        got = _collect(H.group_hulls(_mk_df(spark, groups), ["gid"]))
        for g, pts in groups.items():
            want = gift_wrap(pts)
            assert got[g]["ring"] == want, g
            a2, per = H.ring_stats(want)
            assert got[g]["area2"] == a2 and got[g]["perim_len"] == per

    @pytest.mark.parametrize("parts", [1, 4, 13])
    def test_partitioning_invariance_and_merge_identity(self, spark, parts):
        groups = _rand_groups(seed=9, n=90)
        got = _collect(H.group_hulls(_mk_df(spark, groups, parts=parts), ["gid"]))
        for g, pts in groups.items():
            assert got[g]["ring"] == H.monotone_chain(pts)

    def test_all_points_inside_and_vertices_are_inputs(self, spark):
        groups = _rand_groups(seed=17, n_groups=2, n=120, span=40_000)
        got = _collect(H.group_hulls(_mk_df(spark, groups, parts=7), ["gid"]))
        for g, pts in groups.items():
            ring = got[g]["ring"]
            assert set(ring) <= set(pts)
            assert all(_inside_or_on(ring, p) for p in pts)

    def test_degenerates(self, spark):
        groups = {
            "point": [(5, 7)] * 4,
            "segment": [(0, 0), (10, 10), (4, 4), (7, 7)],
            "duo": [(3, 1), (-2, 8)],
        }
        got = _collect(H.group_hulls(_mk_df(spark, groups), ["gid"]))
        assert got["point"] == {
            "ring": [(5, 7)], "hull_n": 1, "area2": 0, "perim_len": 0,
        }
        assert got["segment"]["ring"] == [(0, 0), (10, 10)]
        assert got["segment"]["area2"] == 0
        assert got["segment"]["perim_len"] == int((2 * 10**2) ** 0.5)
        assert got["duo"]["ring"] == [(-2, 8), (3, 1)]

    def test_adversarial_all_vertices_survive(self, spark):
        # strictly convex parabola points: reduction impossible, hull = all
        pts = [(i, i * i) for i in range(-25, 26)]
        got = _collect(H.group_hulls(_mk_df(spark, {"par": pts}, parts=5), ["gid"]))
        assert got["par"]["hull_n"] == len(pts)
        assert set(got["par"]["ring"]) == set(pts)

    def test_multi_column_groups(self, spark):
        rows = [
            (a, b, lat, lon)
            for a in ("x", "y")
            for b in (0, 1)
            for lon, lat in [(0, 0), (9, 0), (9, 9), (0, 9), (4, 5)]
        ]
        df = spark.createDataFrame(rows, "ga string, gb int, lat_e7 long, lon_e7 long")
        out = H.group_hulls(df, ["ga", "gb"]).collect()
        assert len(out) == 4
        for r in out:
            assert r.hull_n == 4 and r.area2 == 2 * 81

    def test_agrees_with_segment_hulls_twin(self, spark):
        # the single-task family operator and the scale path must agree
        # on every group both can compute (tracks fixture, per segment)
        from jimmy_spark.datagen import ensure_tracks
        from jimmy_spark.operators import trajectory

        d = ensure_tracks("t2")
        segged = trajectory.segment_tracks(
            spark.read.parquet(f"{d}/tracks.parquet")
        )
        want = {
            (r.entity_id, r.seg_seq): (r.hull_n, r.area2, r.perim_len)
            for r in trajectory.segment_hulls(segged).collect()
        }
        got = {
            (r.entity_id, r.seg_seq): (r.hull_n, r.area2, r.perim_len)
            for r in H.group_hulls(
                segged, ["entity_id", "seg_seq"]
            ).collect()
        }
        assert got == want and len(got) > 10

    def test_single_shuffle_plan(self, spark):
        groups = _rand_groups(seed=1, n_groups=2, n=30)
        plan = (
            H.group_hulls(_mk_df(spark, groups, parts=3), ["gid"])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # exactly one operator shuffle (the reduce groupBy); the other
        # Exchange in the string is the test fixture's own repartition(3)
        assert plan.count("Exchange hashpartitioning") == 1
        # the partial-hull stage runs BELOW the shuffle (map-side)
        assert plan.index("MapInPandas") > plan.index("Exchange hashpartitioning")
