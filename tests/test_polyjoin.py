"""Polygon-polygon intersects join (operators/polyjoin.py).

Oracle: an INDEPENDENT pure-Python implementation — point-in-polygon by
half-open horizontal-ray crossing with Fraction-exact intersection
abscissae (vs the operator's sign-of-cross-product formulation) and
segment intersection by Fraction parameter solving (vs the operator's
CLRS orientation test). Same closed-region semantics, disjoint code."""

from fractions import Fraction

import numpy as np
import pytest
from pyspark.sql import Row

from jimmy_spark.operators import polyjoin


# ---------- independent exact geometry (test-only) ----------

def _on_segment(p, a, b) -> bool:
    (px, py), (ax, ay), (bx, by) = p, a, b
    if (bx - ax) * (py - ay) != (by - ay) * (px - ax):
        return False
    return min(ax, bx) <= px <= max(ax, bx) and min(ay, by) <= py <= max(ay, by)


def _point_in_ring(p, ring) -> bool:
    px, py = p
    n = len(ring)
    for i in range(n):
        if _on_segment(p, ring[i], ring[(i + 1) % n]):
            return True  # on-edge = inside
    cnt = 0
    for i in range(n):
        (x1, y1), (x2, y2) = ring[i], ring[(i + 1) % n]
        if (y1 <= py) != (y2 <= py):  # half-open span
            # exact crossing abscissa of the edge at height py
            x_at = Fraction(x1) + Fraction((py - y1) * (x2 - x1), (y2 - y1))
            if x_at > px:
                cnt += 1
    return cnt % 2 == 1


def _segs_cross(p1, p2, p3, p4) -> bool:
    (x1, y1), (x2, y2), (x3, y3), (x4, y4) = p1, p2, p3, p4
    rx, ry = x2 - x1, y2 - y1
    sx, sy = x4 - x3, y4 - y3
    # zero-length (degenerate) segments: the parametric/collinear algebra
    # below is vacuous for them — reduce to point-on-segment
    if (rx, ry) == (0, 0) and (sx, sy) == (0, 0):
        return p1 == p3
    if (rx, ry) == (0, 0):
        return _on_segment(p1, p3, p4)
    if (sx, sy) == (0, 0):
        return _on_segment(p3, p1, p2)
    den = rx * sy - ry * sx
    qpx, qpy = x3 - x1, y3 - y1
    if den == 0:
        if qpx * ry != qpy * rx:
            return False  # parallel, not collinear
        # collinear: 1-D interval overlap along the dominant axis
        if rx != 0 or sx != 0:
            i1 = sorted((x1, x2))
            i2 = sorted((x3, x4))
        else:
            i1 = sorted((y1, y2))
            i2 = sorted((y3, y4))
        return i1[0] <= i2[1] and i2[0] <= i1[1]
    t = Fraction(qpx * sy - qpy * sx, den)
    u = Fraction(qpx * ry - qpy * rx, den)
    return 0 <= t <= 1 and 0 <= u <= 1


def _oracle_intersects(ring_a, ring_b) -> bool:
    if any(_point_in_ring(p, ring_b) for p in ring_a):
        return True
    if any(_point_in_ring(p, ring_a) for p in ring_b):
        return True
    na, nb = len(ring_a), len(ring_b)
    return any(
        _segs_cross(ring_a[i], ring_a[(i + 1) % na], ring_b[j], ring_b[(j + 1) % nb])
        for i in range(na)
        for j in range(nb)
    )


# ---------- fixtures ----------

def _star_poly(rng, cx, cy, r) -> list[tuple[int, int]]:
    """Simple (star-shaped) ring: random radii at sorted angles."""
    k = int(rng.integers(4, 9))
    angles = np.sort(rng.uniform(0, 2 * np.pi, size=k))
    return [
        (int(cx + rng.uniform(0.3, 1.0) * r * np.cos(a)),
         int(cy + rng.uniform(0.3, 1.0) * r * np.sin(a)))
        for a in angles
    ]


def _to_df(spark, polys):
    rows = []
    for pid, ring in polys:
        lats = [y for _, y in ring]
        lons = [x for x, _ in ring]
        rows.append(Row(
            polygon_id=pid,
            category="t",
            ring=[Row(lat_e7=int(y), lon_e7=int(x)) for x, y in ring],
            min_lat=min(lats), max_lat=max(lats),
            min_lon=min(lons), max_lon=max(lons),
        ))
    return spark.createDataFrame(rows)


CRAFTED = [
    # containment, no boundary contact
    ("cont_out", [(0, 0), (100, 0), (100, 100), (0, 100)]),
    ("cont_in", [(40, 40), (60, 40), (60, 60), (40, 60)]),
    # plus-sign: interiors cross, NO vertex of either inside the other
    ("plus_h", [(-50, 210), (50, 210), (50, 240), (-50, 240)]),
    ("plus_v", [(-10, 160), (10, 160), (10, 290), (-10, 290)]),
    # touch at a single point
    ("touch_a", [(300, 300), (400, 300), (400, 400), (300, 400)]),
    ("touch_b", [(400, 400), (500, 400), (500, 500), (400, 500)]),
    # shared edge segment
    ("edge_a", [(600, 0), (700, 0), (700, 100), (600, 100)]),
    ("edge_b", [(700, 20), (800, 20), (800, 80), (700, 80)]),
    # near misses
    ("miss_a", [(900, 0), (950, 0), (950, 50), (900, 50)]),
    ("miss_b", [(951, 0), (1000, 0), (1000, 50), (951, 50)]),
]


def _oracle_pairs(polys, self_join=True):
    out = set()
    for i in range(len(polys)):
        for j in range(len(polys)):
            if self_join and not polys[i][0] < polys[j][0]:
                continue
            if _oracle_intersects(polys[i][1], polys[j][1]):
                out.add((polys[i][0], polys[j][0]))
    return out


def test_crafted_cases_self_join(spark):
    df = _to_df(spark, CRAFTED)
    got = {(r.a_id, r.b_id) for r in polyjoin.poly_join_intersects(df, grid_e7=97).collect()}
    exp = _oracle_pairs(CRAFTED)
    assert got == exp
    assert ("cont_in", "cont_out") in got
    assert ("plus_h", "plus_v") in got
    assert ("touch_a", "touch_b") in got
    assert ("edge_a", "edge_b") in got
    assert not any({a, b} == {"miss_a", "miss_b"} for a, b in got)


@pytest.mark.parametrize("grid", [50, 400, 5000])
def test_random_self_join_matches_oracle_all_grids(spark, grid):
    rng = np.random.default_rng(23)
    polys = [
        (f"p{i:03d}", _star_poly(rng, rng.integers(-2000, 2000),
                                 rng.integers(-2000, 2000), rng.integers(80, 600)))
        for i in range(60)
    ]
    df = _to_df(spark, polys)
    rows = [(r.a_id, r.b_id) for r in
            polyjoin.poly_join_intersects(df, grid_e7=grid).collect()]
    assert len(rows) == len(set(rows)), "pair emitted twice"
    exp = _oracle_pairs(polys)
    assert set(rows) == exp
    assert len(exp) > 30  # dense enough to be a real test


def test_duckdb_twin_matches_fraction_oracle(spark, tmp_path):
    """The driver-gate SQL (duckdb_poly_sql) against the Fraction oracle
    on the random star corpus — three-way agreement with the operator."""
    import duckdb

    rng = np.random.default_rng(41)
    polys = [
        (f"p{i:03d}", _star_poly(rng, rng.integers(-2000, 2000),
                                 rng.integers(-2000, 2000), rng.integers(80, 600)))
        for i in range(50)
    ]
    df = _to_df(spark, polys)
    path = str(tmp_path / "polys.parquet")
    df.coalesce(1).write.parquet(path)
    got = set(duckdb.sql(polyjoin.duckdb_poly_sql(f"{path}/*.parquet")).fetchall())
    exp = _oracle_pairs(polys)
    assert got == exp and len(exp) > 20
    spark_pairs = {
        (r.a_id, r.b_id)
        for r in polyjoin.poly_join_intersects(df, grid_e7=300).collect()
    }
    assert spark_pairs == exp


def test_two_set_join_matches_oracle(spark):
    rng = np.random.default_rng(7)
    pa = [(f"a{i:03d}", _star_poly(rng, rng.integers(-1500, 1500),
                                   rng.integers(-1500, 1500), rng.integers(100, 500)))
          for i in range(25)]
    pb = [(f"b{i:03d}", _star_poly(rng, rng.integers(-1500, 1500),
                                   rng.integers(-1500, 1500), rng.integers(100, 500)))
          for i in range(25)]
    got = {
        (r.a_id, r.b_id)
        for r in polyjoin.poly_join_intersects(
            _to_df(spark, pa), _to_df(spark, pb), grid_e7=300
        ).collect()
    }
    exp = {
        (ida, idb)
        for ida, ra in pa
        for idb, rb in pb
        if _oracle_intersects(ra, rb)
    }
    assert got == exp and len(exp) > 5
