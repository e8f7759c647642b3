"""Within-distance spatial pair join (operators/distjoin.py).

Differential oracle: brute-force O(n^2) numpy pair scan — independent of
both the Spark plan and the DuckDB SQL twin. Reference semantics anchor:
jimmy's pairwise-proximity op is the fuzzy-title theta join
(/root/reference/src/jimmy/common.py:373-400); the spatial twin keeps the
same "block + exact verify" discipline on the hex plane.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from jimmy_spark.functions import hexgrid
from jimmy_spark.operators import distjoin


def _brute_pairs(ids, lat, lon, d):
    """Set of (a_id, b_id, dist2) with a_id < b_id and dist2 <= d*d."""
    out = set()
    # object dtype = exact Python ints: full-span e7 deltas squared
    # overflow int64 (same reason the DuckDB twin goes through HUGEINT)
    lat = lat.astype(object)
    lon = lon.astype(object)
    for i in range(len(ids)):
        dx = lon - lon[i]
        dy = lat - lat[i]
        dist2 = dx * dx + dy * dy
        for j in np.nonzero(dist2 <= d * d)[0]:
            if ids[i] < ids[j]:
                out.add((ids[i], ids[j], int(dist2[j])))
    return out


def _mk_points(spark, n=400, seed=7, cluster=60):
    """Uniform scatter plus one tight cluster (quadratic local pair mass,
    the shape a real geo corpus has around a hot spot)."""
    rng = np.random.default_rng(seed)
    lat = rng.integers(-800_000_000, 800_000_000, size=n)
    lon = rng.integers(-1_800_000_000, 1_800_000_000, size=n)
    # tight cluster: `cluster` points within ~1.5 * d of a center
    lat[:cluster] = 123_456_789 + rng.integers(-30_000, 30_000, size=cluster)
    lon[:cluster] = -987_654_321 + rng.integers(-30_000, 30_000, size=cluster)
    ids = [f"p{i:05d}" for i in range(n)]
    df = spark.createDataFrame(
        [(ids[i], int(lat[i]), int(lon[i])) for i in range(n)],
        "image_id string, lat_e7 long, lon_e7 long",
    )
    return df, ids, lat, lon


@pytest.mark.parametrize("res", [7, 8, 9, None])
def test_distance_join_matches_brute_force(spark, res):
    d = 20_000
    df, ids, lat, lon = _mk_points(spark)
    got = {
        (r.a_id, r.b_id, r.dist2)
        for r in distjoin.distance_join(df, d=d, res=res).collect()
    }
    assert got == _brute_pairs(np.array(ids), lat, lon, d)


def test_exactly_once_no_distinct(spark):
    """Each qualifying pair is emitted exactly ONCE by construction — the
    plan carries no dedup Aggregate/distinct and no cartesian fallback."""
    d = 20_000
    df, ids, lat, lon = _mk_points(spark, n=200, cluster=80)
    out = distjoin.distance_join(df, d=d, res=9)
    rows = [(r.a_id, r.b_id) for r in out.collect()]
    assert len(rows) == len(set(rows)), "duplicate pair emitted"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pick_resolution_bounds_fanout():
    """Auto-picked resolution keeps the disk within MAX_RINGS, except when
    d dwarfs the coarsest grid (bounded-fanout escape hatch)."""
    for d in (1_000, 20_000, 200_000):
        res, k = distjoin.pick_resolution(d)
        assert res in hexgrid.RESOLUTIONS
        assert k <= distjoin.MAX_RINGS or res == min(hexgrid.RESOLUTIONS)
    # huge d falls back to the coarsest grid rather than exploding fanout
    res, _ = distjoin.pick_resolution(10_000_000_000)
    assert res == min(hexgrid.RESOLUTIONS)


def test_boundary_distance_inclusive(spark):
    """dist2 == d*d is IN (<=, matching the oracle's <=)."""
    d = 1_000
    df = spark.createDataFrame(
        [("a", 0, 0), ("b", 0, d), ("c", 0, d + 1)],
        "image_id string, lat_e7 long, lon_e7 long",
    )
    got = {(r.a_id, r.b_id, r.dist2) for r in distjoin.distance_join(df, d=d).collect()}
    assert ("a", "b", d * d) in got
    assert all(p[:2] != ("a", "c") for p in got)
    assert ("b", "c", 1) in got


@pytest.mark.parametrize("width_mult", [1, 3])
def test_grid_strategy_matches_brute_force_and_hex(spark, width_mult):
    """Square-grid scale path == hex-disk path == brute force, at the
    minimal width (w = d) and a coarser one (w = 3d)."""
    d = 20_000
    df, ids, lat, lon = _mk_points(spark)
    grid = {
        (r.a_id, r.b_id, r.dist2)
        for r in distjoin.distance_join_grid(df, d=d, width=d * width_mult).collect()
    }
    assert grid == _brute_pairs(np.array(ids), lat, lon, d)


def test_grid_small_d_dense_cluster(spark):
    """d far below the finest hex size over a tight cluster — the regime
    the grid strategy exists for. Exact vs brute force; exactly-once."""
    d = 150
    rng = np.random.default_rng(11)
    n = 300
    # all points inside a 2000x2000 box: every hex cell would hold all of
    # them; grid cells at w=150 hold ~2 each
    lat = 500_000_000 + rng.integers(0, 2_000, size=n)
    lon = -700_000_000 + rng.integers(0, 2_000, size=n)
    ids = [f"p{i:05d}" for i in range(n)]
    df = spark.createDataFrame(
        [(ids[i], int(lat[i]), int(lon[i])) for i in range(n)],
        "image_id string, lat_e7 long, lon_e7 long",
    )
    rows = [(r.a_id, r.b_id, r.dist2) for r in distjoin.distance_join_grid(df, d=d).collect()]
    assert len(rows) == len(set(rows)), "duplicate pair emitted"
    assert set(rows) == _brute_pairs(np.array(ids), lat, lon, d)


def test_grid_floor_exact_at_negative_boundaries(spark):
    """Negative coordinates sitting exactly on (and one off) grid-cell
    boundaries — the floor-div correctness the _GRID_OFF shift buys."""
    d = 1_000
    pts = []
    k = 0
    for base in (-d * 3, -d, 0, d):
        for off in (-1, 0, 1):
            pts.append((f"p{k:03d}", base + off, base + off))
            k += 1
    df = spark.createDataFrame(pts, "image_id string, lat_e7 long, lon_e7 long")
    ids = np.array([p[0] for p in pts])
    lat = np.array([p[1] for p in pts])
    lon = np.array([p[2] for p in pts])
    got = {(r.a_id, r.b_id, r.dist2) for r in distjoin.distance_join_grid(df, d=d).collect()}
    assert got == _brute_pairs(ids, lat, lon, d)


def test_grid_width_must_cover_d():
    with pytest.raises(ValueError):
        distjoin.distance_join_grid(None, d=100, width=50)


def test_distance_join_single_cell_join_shuffle(spark):
    """ONE equality join on the cell id — the explode is narrow (no
    Exchange between the scan and the Generate)."""
    df, *_ = _mk_points(spark, n=50, cluster=20)
    plan = distjoin.distance_join(df, d=20_000, res=9)._jdf.queryExecution().executedPlan().toString()
    assert "Generate explode" in plan or "Generate" in plan
    # exactly one join node, keyed (SortMergeJoin or ShuffledHashJoin or BHJ under AQE)
    njoin = sum(plan.count(j) for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin"))
    assert njoin == 1, plan
