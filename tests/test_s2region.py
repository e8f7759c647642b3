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
