"""S2 region coverer (operators/s2region.py) vs an independent
brute-force twin, plus the structural covering invariants."""

from __future__ import annotations

import numpy as np
import pytest

from jimmy_spark.datagen.polygons import generate_polygons
from jimmy_spark.operators.s2region import (
    MAX_LEVEL,
    _project_ring,
    brute_leaf_cover,
    s2_region_cover,
)

MIN_L, MAX_L = 11, 14


def _fixture_polys(n: int = 14):
    """Single-face polygons from the shared generator (ring as row dicts)."""
    tbl = generate_polygons(n).to_pylist()
    out = []
    for row in tbl:
        proj = _project_ring(row["ring"])
        if proj is not None:
            out.append((row["polygon_id"], row["ring"], proj))
    assert len(out) >= 5, "fixture needs several single-face polygons"
    return out


@pytest.fixture(scope="module")
def cover_rows(spark):
    polys = _fixture_polys()
    df = spark.createDataFrame(
        [(pid, ring) for pid, ring, _ in polys],
        "polygon_id string, ring array<struct<lat_e7: long, lon_e7: long>>",
    )
    rows = (
        s2_region_cover(df, min_level=MIN_L, max_level=MAX_L)
        .collect()
    )
    by_pid: dict[str, list] = {pid: [] for pid, _, _ in polys}
    for r in rows:
        by_pid[r.polygon_id].append((r.cell, r.lvl, r.full))
    return polys, by_pid


def _leaves(cell: int, lvl: int, level: int) -> set[int]:
    """All level-``level`` descendant ids of ``cell`` (pure Python)."""
    b_t = 1 << (2 * (MAX_LEVEL - level))
    lsb = cell & -cell
    return {cell - lsb + (2 * k + 1) * b_t for k in range(lsb // b_t)}


def test_leaf_set_matches_bruteforce(cover_rows):
    polys, by_pid = cover_rows
    checked = 0
    for pid, _ring, (face, ri, rj) in polys:
        expect = brute_leaf_cover(
            [int(v) for v in ri], [int(v) for v in rj], face, MAX_L
        )
        got: set[int] = set()
        for cell, lvl, _full in by_pid[pid]:
            leaves = _leaves(cell, lvl, MAX_L)
            assert not (got & leaves), f"{pid}: overlapping cells"
            got |= leaves
        assert got == expect, f"{pid}: leaf cover mismatch"
        checked += 1
    assert checked >= 5


def test_full_cells_sound_and_maximal(cover_rows):
    polys, by_pid = cover_rows
    saw_coarse_full = False
    for pid, _ring, (face, ri, rj) in polys:
        li = [int(v) for v in ri]
        lj = [int(v) for v in rj]
        fulls = [(c, l) for c, l, f in by_pid[pid] if f]
        # soundness: a FULL cell's own level-L cover of itself must be
        # entirely "hit" AND contain no boundary: every leaf of the cell
        # must appear in the brute cover, and the cell must NOT appear in
        # the brute cover of any level if any square corner were outside.
        expect = brute_leaf_cover(li, lj, face, MAX_L)
        for cell, lvl in fulls:
            assert _leaves(cell, lvl, MAX_L) <= expect
            if lvl < MAX_L:
                saw_coarse_full = True
        # maximality: no complete 4-sibling FULL group survives
        parents: dict[int, int] = {}
        for cell, lvl in fulls:
            lsb = cell & -cell
            new_lsb = lsb << 2
            p = (cell & ~(new_lsb - 1)) | new_lsb
            parents[(p, lvl)] = parents.get((p, lvl), 0) + 1
        assert all(v < 4 for v in parents.values()), f"{pid}: promotable group"
    assert saw_coarse_full, "no interior collapse happened — fixture too small"


def test_cells_pairwise_disjoint(cover_rows):
    _polys, by_pid = cover_rows
    for pid, cells in by_pid.items():
        ivals = []
        for cell, _lvl, _full in cells:
            lsb = cell & -cell
            ivals.append((cell - lsb + 1, cell + lsb - 1))
        ivals.sort()
        for (lo1, hi1), (lo2, _hi2) in zip(ivals, ivals[1:]):
            assert hi1 < lo2, f"{pid}: ancestor/descendant overlap"


def test_partitioning_invariance(spark):
    polys = _fixture_polys(8)
    df = spark.createDataFrame(
        [(pid, ring) for pid, ring, _ in polys],
        "polygon_id string, ring array<struct<lat_e7: long, lon_e7: long>>",
    )
    a = set(
        map(tuple, s2_region_cover(df.repartition(1), MIN_L, MAX_L).collect())
    )
    b = set(
        map(tuple,
            s2_region_cover(df.repartition(7), MIN_L, MAX_L,
                            seed_partitions=3).collect())
    )
    assert a == b and len(a) > 0


def test_multi_face_polygon_yields_nothing(spark):
    # vertices straddling the lon=45 deg face seam (face 0 / face 1)
    ring = [
        {"lat_e7": 0, "lon_e7": 400_000_000},
        {"lat_e7": 0, "lon_e7": 500_000_000},
        {"lat_e7": 100_000_000, "lon_e7": 500_000_000},
        {"lat_e7": 100_000_000, "lon_e7": 400_000_000},
    ]
    df = spark.createDataFrame(
        [("seam", ring)],
        "polygon_id string, ring array<struct<lat_e7: long, lon_e7: long>>",
    )
    assert _project_ring(ring) is None
    assert s2_region_cover(df, MIN_L, MAX_L).count() == 0


def test_boundary_cells_are_max_level(cover_rows):
    _polys, by_pid = cover_rows
    for pid, cells in by_pid.items():
        for _cell, lvl, full in cells:
            assert full or lvl == MAX_L, f"{pid}: partial cell above max_level"
            assert MIN_L <= lvl <= MAX_L


def _twin_point_in(px: int, py: int, ri: list[int], rj: list[int]) -> bool:
    """Independent crossing-number test (float-free, different formulation
    from both the operator's inside_ring and brute_leaf_cover's helper)."""
    n = len(ri)
    inside = False
    for k in range(n):
        x1, y1, x2, y2 = ri[k], rj[k], ri[(k + 1) % n], rj[(k + 1) % n]
        cr = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
        if (cr == 0 and min(x1, x2) <= px <= max(x1, x2)
                and min(y1, y2) <= py <= max(y1, y2)):
            return True
        if y1 <= py < y2 or y2 <= py < y1:
            t_num = py - y1
            # x-intersection comparison without division: px < x1 + t*(dx)
            lhs = (px - x1) * (y2 - y1)
            rhs = t_num * (x2 - x1)
            if (y2 - y1 > 0 and lhs < rhs) or (y2 - y1 < 0 and lhs > rhs):
                inside = not inside
    return inside


def _region_points(polys, rng_seed: int = 7):
    """Deterministic points around each polygon: jittered interior,
    far-outside, and exact ring vertices (the on-edge = inside rule)."""
    rng = np.random.RandomState(rng_seed)
    pts = []
    k = 0
    for _pid, ring, _proj in polys:
        lat = np.array([v["lat_e7"] for v in ring], dtype=np.int64)
        lon = np.array([v["lon_e7"] for v in ring], dtype=np.int64)
        clat, clon = int(lat.mean()), int(lon.mean())
        span = max(int(lat.max() - lat.min()), 1)
        for _ in range(25):
            pts.append((f"pt_{k:05d}",
                        clat + int(rng.randint(-span, span + 1)),
                        clon + int(rng.randint(-span, span + 1))))
            k += 1
        pts.append((f"pt_{k:05d}", clat + 5 * span, clon + 5 * span)); k += 1
        for v in ring[:3]:
            pts.append((f"pt_{k:05d}", int(v["lat_e7"]), int(v["lon_e7"])))
            k += 1
    return pts


@pytest.mark.parametrize("bcast", [True, False])
def test_region_select_matches_pure_twin(spark, bcast):
    from jimmy_spark.functions import s2 as s2f
    from jimmy_spark.operators.s2region import region_select

    polys = _fixture_polys(10)
    pts = _region_points(polys)
    pdf = spark.createDataFrame(pts, "image_id string, lat_e7 long, lon_e7 long")
    poly_df = spark.createDataFrame(
        [(pid, ring) for pid, ring, _ in polys],
        "polygon_id string, ring array<struct<lat_e7: long, lon_e7: long>>",
    )
    got = set(
        (r.image_id, r.polygon_id)
        for r in region_select(
            pdf, poly_df, MIN_L, MAX_L, broadcast_cover=bcast
        ).collect()
    )
    # twin: project each point exactly like the engine, test vs each ring
    lat = np.array([p[1] for p in pts], dtype=np.int64)
    lon = np.array([p[2] for p in pts], dtype=np.int64)
    x, y, z = s2f.xyz_from_latlon_e7(lat, lon)
    face, u, v = s2f.face_uv_from_xyz(x, y, z)
    pi = s2f.ij_from_st(s2f.st_from_uv(u))
    pj = s2f.ij_from_st(s2f.st_from_uv(v))
    expect = set()
    for pid, _ring, (pface, ri, rj) in polys:
        li, lj = [int(w) for w in ri], [int(w) for w in rj]
        for idx, (name, _a, _b) in enumerate(pts):
            if int(face[idx]) != pface:
                continue
            if _twin_point_in(int(pi[idx]), int(pj[idx]), li, lj):
                expect.add((name, pid))
    assert got == expect and len(expect) > 0
    # exactly-once by construction: collect() had no duplicate pairs
    rows = region_select(pdf, poly_df, MIN_L, MAX_L,
                         broadcast_cover=bcast).collect()
    assert len(rows) == len(set((r.image_id, r.polygon_id) for r in rows))


def test_region_select_plan_shape(spark):
    from jimmy_spark.operators.s2region import region_select

    polys = _fixture_polys(8)
    pts = _region_points(polys)
    pdf = spark.createDataFrame(pts, "image_id string, lat_e7 long, lon_e7 long")
    poly_df = spark.createDataFrame(
        [(pid, ring) for pid, ring, _ in polys],
        "polygon_id string, ring array<struct<lat_e7: long, lon_e7: long>>",
    )
    plan = (
        region_select(pdf, poly_df, MIN_L, MAX_L)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan  # covering rides the broadcast
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the ancestor fan-out is a codegen'd explode, not a Python stage
    assert "Generate explode" in plan or "Generate" in plan


def test_compact_identity_on_cover(spark, cover_rows):
    """Composing with s2cover.s2_compact: compacting the cover's leaf
    expansion reproduces a set no larger than the cover (the cover's FULL
    part is already maximal; only boundary sibling groups could merge —
    and those are PARTIAL, whose merge would claim uncovered leaves, so
    compact() of the exact leaf set can never go coarser than the cover
    on the boundary either way at the same min_level)."""
    from jimmy_spark.operators.s2cover import s2_compact

    polys, by_pid = cover_rows
    pid, _ring, _proj = polys[0]
    leaves = set()
    for cell, lvl, _full in by_pid[pid]:
        leaves |= _leaves(cell, lvl, MAX_L)
    df = spark.createDataFrame([(c,) for c in leaves], "cell long")
    compacted = s2_compact(df, level=MAX_L, min_level=MIN_L).collect()
    got = set()
    for r in compacted:
        got |= _leaves(r.cell, r.lvl, MAX_L)
    assert got == leaves
    assert len(compacted) <= len(leaves)
