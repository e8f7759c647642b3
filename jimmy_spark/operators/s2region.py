"""S2 region coverer: polygon -> mixed-level S2 cell covering.

Completes the engine's true-quadtree story (functions/s2.py encode/decode,
operators/s2cover.py compact/uncompact): given polygons, produce per
polygon the set of S2 cells between ``min_level`` and ``max_level`` that
covers it — interior collapses to coarse FULL cells, the boundary is
tiled by ``max_level`` PARTIAL cells, the standard ``S2RegionCoverer``
output shape. Downstream this is the polygon's *index form*: a covering
joined against the corpus's S2 cell column answers "which images are in
this region" with a pure cell-range join, no geometry in the hot path.

Geometry contract (exact, documented): each ring vertex is projected
once to S2 leaf (i, j) integer coordinates on its cube face (the
standard lat/lon -> XYZ -> face/uv -> st -> ij pipeline from
functions/s2.py); from there on the polygon's edges are treated as
STRAIGHT IN ij SPACE and every classification below is exact int64
arithmetic (products bounded by 2^60: ij is 30-bit). For the city/
region-scale polygons the engine targets, ij-straight and geodesic
edges diverge by less than one level-16 cell; the pytest twin pins the
ij-space contract bit-exactly. Polygons whose vertices project to more
than one cube face are outside the contract and yield no cells
(documented + tested; the standard fix — clipping to face rectangles —
is orthogonal to the covering algorithm itself).

Cell/polygon classification (per axis-aligned ij square, all integer):

  FULL     — all 4 square corners inside the ring (on-edge = inside,
             matching operators/pip.py) and no ring edge intersects the
             closed square (exact SAT: per-edge bbox overlap + all 4
             corners strictly one side of the edge's supporting line).
  PARTIAL  — some corner inside or an edge hits: subdivide (or emit at
             ``max_level``).
  outside  — dropped.

FULL cells are maximal by construction: if all four children of a cell
are inside the ring, so is the cell, and the parent level classified it
FULL before the children were ever generated — so no complete FULL
sibling group can appear (tested), and the output composes with
operators/s2cover.py s2_compact as the identity on the FULL part.

Scale shape: one narrow mapInPandas over polygons projects rings and
emits the ``min_level`` bbox seed cells (ring riding per seed row, the
operators/pip.py BOUNDARY precedent); ONE repartition spreads seed
subtrees across tasks (a continent-sized polygon's descent is
parallelized per coarse seed cell, not serialized per polygon); one
mapInPandas runs the level descent in-task, vectorized per (polygon,
level) over NumPy — the per-level frontier is the polygon boundary, so
work per seed is O(perimeter / max_level-cell-size), never O(area).
Rings cross exactly one shuffle (coarse seed cardinality), never the
output.

No reference analogue (marph91/jimmy has no spatial surface); engine
addition under the BASELINE.json geospatial axes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from jimmy_spark.functions import s2 as s2f
from jimmy_spark.functions.raycast import inside_ring

MAX_LEVEL = 30

_SEED_SCHEMA = (
    "polygon_id string, face int, i0 long, j0 long, "
    "ring_i array<long>, ring_j array<long>"
)
_COVER_SCHEMA = "polygon_id string, cell long, lvl int, full boolean"


def _project_ring(ring) -> tuple[int, np.ndarray, np.ndarray] | None:
    """Ring (list of {lat_e7, lon_e7}) -> (face, i[], j[]) leaf ints, or
    None when the vertices straddle cube faces (outside the contract)."""
    lat = np.array([v["lat_e7"] for v in ring], dtype=np.int64)
    lon = np.array([v["lon_e7"] for v in ring], dtype=np.int64)
    x, y, z = s2f.xyz_from_latlon_e7(lat, lon)
    face, u, v = s2f.face_uv_from_xyz(x, y, z)
    if len(np.unique(face)) != 1:
        return None
    i = s2f.ij_from_st(s2f.st_from_uv(u))
    j = s2f.ij_from_st(s2f.st_from_uv(v))
    return int(face[0]), i, j


def _classify_squares(
    x0: np.ndarray, y0: np.ndarray, size: int, rx: np.ndarray, ry: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(full, keep) for axis-aligned squares [x0, x0+size] x [y0, y0+size]
    vs one integer ring — exact int64 (coords < 2^30, products < 2^61)."""
    x1, y1 = x0 + size, y0 + size
    corner_in = np.ones(len(x0), dtype=bool)
    corner_any = np.zeros(len(x0), dtype=bool)
    for cx, cy in ((x0, y0), (x1, y0), (x0, y1), (x1, y1)):
        ins = inside_ring(cx, cy, rx, ry)
        corner_in &= ins
        corner_any |= ins
    ex1, ey1 = rx[:, None], ry[:, None]
    ex2, ey2 = np.roll(rx, -1)[:, None], np.roll(ry, -1)[:, None]
    bx0, bx1, by0, by1 = x0[None, :], x1[None, :], y0[None, :], y1[None, :]
    bbox_ov = (
        (np.maximum(ex1, ex2) >= bx0)
        & (np.minimum(ex1, ex2) <= bx1)
        & (np.maximum(ey1, ey2) >= by0)
        & (np.minimum(ey1, ey2) <= by1)
    )
    dx, dy = ex2 - ex1, ey2 - ey1
    allpos = np.ones_like(bbox_ov)
    allneg = np.ones_like(bbox_ov)
    for cx, cy in ((bx0, by0), (bx1, by0), (bx0, by1), (bx1, by1)):
        cr = dx * (cy - ey1) - (cx - ex1) * dy
        allpos &= cr > 0
        allneg &= cr < 0
    edge_hit = (bbox_ov & ~(allpos | allneg)).any(axis=0)
    return corner_in & ~edge_hit, corner_any | edge_hit


def _seed_batch(pdf: pd.DataFrame, min_level: int) -> pd.DataFrame:
    size = 1 << (MAX_LEVEL - min_level)
    rows: dict[str, list] = {k: [] for k in
                             ("polygon_id", "face", "i0", "j0", "ring_i", "ring_j")}
    for row in pdf.itertuples():
        proj = _project_ring(row.ring)
        if proj is None:
            continue  # multi-face: outside the documented contract
        face, ri, rj = proj
        gi0, gi1 = int(ri.min()) // size, int(ri.max()) // size
        gj0, gj1 = int(rj.min()) // size, int(rj.max()) // size
        gis = np.arange(gi0, gi1 + 1, dtype=np.int64) * size
        gjs = np.arange(gj0, gj1 + 1, dtype=np.int64) * size
        ci = np.repeat(gis, len(gjs))
        cj = np.tile(gjs, len(gis))
        li = [int(v) for v in ri]
        lj = [int(v) for v in rj]
        for a, b in zip(ci, cj):
            rows["polygon_id"].append(row.polygon_id)
            rows["face"].append(face)
            rows["i0"].append(int(a))
            rows["j0"].append(int(b))
            rows["ring_i"].append(li)
            rows["ring_j"].append(lj)
    return pd.DataFrame(
        {
            "polygon_id": pd.Series(rows["polygon_id"], dtype=object),
            "face": pd.Series(rows["face"], dtype=np.int32),
            "i0": pd.Series(rows["i0"], dtype=np.int64),
            "j0": pd.Series(rows["j0"], dtype=np.int64),
            "ring_i": pd.Series(rows["ring_i"], dtype=object),
            "ring_j": pd.Series(rows["ring_j"], dtype=object),
        }
    )


def _descend_batch(
    pdf: pd.DataFrame, min_level: int, max_level: int
) -> pd.DataFrame:
    out_pid: list = []
    out_cell: list[np.ndarray] = []
    out_lvl: list[np.ndarray] = []
    out_full: list[np.ndarray] = []

    def emit(pid: str, face: int, i0: np.ndarray, j0: np.ndarray,
             lvl: int, full_flag: bool) -> None:
        if len(i0) == 0:
            return
        leaf = s2f.cell_id_from_face_ij(
            np.full(len(i0), face, dtype=np.int64), i0, j0
        )
        out_pid.extend([pid] * len(i0))
        out_cell.append(s2f.parent(leaf, lvl))
        out_lvl.append(np.full(len(i0), lvl, dtype=np.int64))
        out_full.append(np.full(len(i0), full_flag, dtype=bool))

    for (pid, face), grp in pdf.groupby(["polygon_id", "face"], sort=True):
        rx = np.array(grp["ring_i"].iloc[0], dtype=np.int64)
        ry = np.array(grp["ring_j"].iloc[0], dtype=np.int64)
        ci = grp["i0"].to_numpy(dtype=np.int64)
        cj = grp["j0"].to_numpy(dtype=np.int64)
        for lvl in range(min_level, max_level + 1):
            size = 1 << (MAX_LEVEL - lvl)
            full, keep = _classify_squares(ci, cj, size, rx, ry)
            emit(pid, int(face), ci[full], cj[full], lvl, True)
            part = keep & ~full
            if lvl == max_level:
                emit(pid, int(face), ci[part], cj[part], lvl, False)
                break
            pi, pj = ci[part], cj[part]
            half = size >> 1
            ci = np.concatenate([pi, pi + half, pi, pi + half])
            cj = np.concatenate([pj, pj, pj + half, pj + half])
            if len(ci) == 0:
                break
    return pd.DataFrame(
        {
            "polygon_id": np.array(out_pid, dtype=object),
            "cell": (np.concatenate(out_cell)
                     if out_cell else np.array([], np.int64)),
            "lvl": (np.concatenate(out_lvl).astype(np.int32)
                    if out_lvl else np.array([], np.int32)),
            "full": (np.concatenate(out_full)
                     if out_full else np.array([], bool)),
        }
    )


def s2_region_cover(
    polygons: DataFrame,
    min_level: int = 10,
    max_level: int = 16,
    seed_partitions: int | None = None,
) -> DataFrame:
    """Polygons (polygon_id, ring) -> (polygon_id, cell, lvl, full).

    ``full`` rows are interior cells (levels ``min_level``..``max_level``,
    squares provably inside the ring); ``full = false`` rows are
    ``max_level`` boundary cells. Together the cells are pairwise
    disjoint and their ``max_level`` leaf set is EXACTLY the set of
    leaves whose square intersects the closed polygon (tested against an
    independent brute-force twin).
    """
    if not 0 < min_level <= max_level <= MAX_LEVEL:
        raise ValueError("need 0 < min_level <= max_level <= 30")

    def seed_gen(batches):
        for pdf in batches:
            yield _seed_batch(pdf, min_level)

    def descend_gen(batches):
        for pdf in batches:
            yield _descend_batch(pdf, min_level, max_level)

    seeds = polygons.select("polygon_id", "ring").mapInPandas(
        seed_gen, _SEED_SCHEMA
    )
    n_parts = seed_partitions or polygons.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    seeds = seeds.repartition(int(n_parts), "polygon_id", "i0", "j0")
    return seeds.mapInPandas(descend_gen, _COVER_SCHEMA)


# --- the covering's consumer: region selection by cell join ----------------

_RING_SCHEMA = "polygon_id string, ring_i array<long>, ring_j array<long>"


def _rings_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    rows = {"polygon_id": [], "ring_i": [], "ring_j": []}
    for row in pdf.itertuples():
        proj = _project_ring(row.ring)
        if proj is None:
            continue
        _face, ri, rj = proj
        rows["polygon_id"].append(row.polygon_id)
        rows["ring_i"].append([int(v) for v in ri])
        rows["ring_j"].append([int(v) for v in rj])
    return pd.DataFrame(
        {
            "polygon_id": pd.Series(rows["polygon_id"], dtype=object),
            "ring_i": pd.Series(rows["ring_i"], dtype=object),
            "ring_j": pd.Series(rows["ring_j"], dtype=object),
        }
    )


def region_select(
    points: DataFrame,
    polygons: DataFrame,
    min_level: int = 10,
    max_level: int = 16,
    id_col: str = "image_id",
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
    broadcast_cover: bool = True,
) -> DataFrame:
    """(point, polygon) containment pairs answered THROUGH the covering —
    the operational payoff of ``s2_region_cover``: geometry leaves the hot
    path entirely.

    Each point encodes once to its level-30 S2 leaf (one Arrow-batched
    UDF, the same pipeline as the ``geo_cells`` columns); its ≤
    ``max_level - min_level + 1`` ancestors are pure codegen'd bit
    expressions, and ONE equality join against the covering decides
    membership — the covering's cells are pairwise disjoint, so each
    (point, polygon) matches at most one cell and the pair stream is
    exactly-once BY CONSTRUCTION, no ``distinct``. FULL-cell matches are
    containment outright; only boundary-cell candidates (points in the
    O(perimeter) fringe) pay the exact integer ray-cast, against a
    broadcast of the projected rings. Predicate: the point's ij
    projection lies inside the ij ring (on-edge = inside) — the same
    ij-space contract as the coverer, pinned by an independent
    pure-Python twin in the tests.

    At 10^12 points the plan is: scan + one UDF + explode(≤7) + one
    hash join (broadcast when the covering is small, shuffled otherwise
    via ``broadcast_cover=False``) + ray-cast on the boundary fringe
    only — compare operators/pip.py pip_join_cells, which this matches
    in shape while replacing the ad-hoc lat/lon grid with the reusable,
    compactable S2 index form.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from jimmy_spark.operators.s2cover import _parent_expr

    cover = s2_region_cover(polygons, min_level, max_level)

    @F.pandas_udf(T.LongType())
    def leaf30(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(
            s2f.encode(lat.to_numpy(np.int64), lon.to_numpy(np.int64), MAX_LEVEL)
        )

    pts = points.select(id_col, lat_col, lon_col).withColumn(
        "_leaf", leaf30(F.col(lat_col), F.col(lon_col))
    )
    ancs = F.array(
        *[
            F.expr(_parent_expr("_leaf", lvl))
            for lvl in range(min_level, max_level + 1)
        ]
    )
    cand = pts.withColumn("cell", F.explode(ancs))
    cov = F.broadcast(cover) if broadcast_cover else cover
    hits = cand.join(cov, "cell")

    def ring_gen(batches):
        for pdf in batches:
            yield _rings_batch(pdf)

    rings = polygons.select("polygon_id", "ring").mapInPandas(
        ring_gen, _RING_SCHEMA
    )
    # ONE pass: rings join onto boundary rows only (full-cell rows keep
    # null rings and never pay Arrow mass for them), then a single kernel
    # passes FULL matches through and ray-casts the fringe — no branch
    # split, so the point scan + encode UDF run exactly once.
    withr = hits.join(
        F.broadcast(rings.withColumnRenamed("polygon_id", "_rpid")),
        (F.col("polygon_id") == F.col("_rpid")) & ~F.col("full"),
        "left",
    ).select(id_col, "polygon_id", "_leaf", "full", "ring_i", "ring_j")

    def verify_gen(batches):
        for pdf in batches:
            keep_id: list = []
            keep_pid: list = []
            sure = pdf[pdf["full"]]
            keep_id.extend(sure[id_col].tolist())
            keep_pid.extend(sure["polygon_id"].tolist())
            fringe = pdf[~pdf["full"]]
            for pid, grp in fringe.groupby("polygon_id", sort=True):
                rx = np.array(grp["ring_i"].iloc[0], dtype=np.int64)
                ry = np.array(grp["ring_j"].iloc[0], dtype=np.int64)
                leafs = grp["_leaf"].to_numpy(np.int64)
                _face, pi, pj = s2f.face_ij_from_cell_id(leafs)
                ins = inside_ring(pi, pj, rx, ry)
                keep_id.extend(grp[id_col].to_numpy()[ins])
                keep_pid.extend([pid] * int(ins.sum()))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(keep_id, dtype=object),
                    "polygon_id": pd.Series(keep_pid, dtype=object),
                }
            )

    return withr.mapInPandas(verify_gen, f"{id_col} string, polygon_id string")


# --- independent brute-force twin (tests only) -----------------------------


def brute_leaf_cover(
    ring_i: list[int], ring_j: list[int], face: int, level: int
) -> set[int]:
    """Set of level-``level`` cell ids whose square intersects the closed
    ij polygon — written independently of the operator: per-cell Python
    loop, crossing-number with explicit on-edge short-circuit, and a
    parameter-free segment-vs-square test via orientation signs.
    """
    size = 1 << (MAX_LEVEL - level)
    n = len(ring_i)

    def point_in(px: int, py: int) -> bool:
        inside = False
        for k in range(n):
            x1, y1 = ring_i[k], ring_j[k]
            x2, y2 = ring_i[(k + 1) % n], ring_j[(k + 1) % n]
            cr = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
            if (cr == 0 and min(x1, x2) <= px <= max(x1, x2)
                    and min(y1, y2) <= py <= max(y1, y2)):
                return True  # on edge counts as inside
            if (y1 > py) != (y2 > py):
                # exact crossing test: sign of cr vs edge direction
                if (cr > 0) == (y2 > y1):
                    inside = not inside
        return inside

    def seg_hits_square(x1, y1, x2, y2, sx0, sy0) -> bool:
        sx1, sy1 = sx0 + size, sy0 + size
        if max(x1, x2) < sx0 or min(x1, x2) > sx1:
            return False
        if max(y1, y2) < sy0 or min(y1, y2) > sy1:
            return False
        dx, dy = x2 - x1, y2 - y1
        signs = set()
        for cx, cy in ((sx0, sy0), (sx1, sy0), (sx0, sy1), (sx1, sy1)):
            cr = dx * (cy - y1) - (cx - x1) * dy
            signs.add(0 if cr == 0 else (1 if cr > 0 else -1))
        return not (signs == {1} or signs == {-1})

    gi0, gi1 = min(ring_i) // size, max(ring_i) // size
    gj0, gj1 = min(ring_j) // size, max(ring_j) // size
    out: set[int] = set()
    for gi in range(gi0, gi1 + 1):
        for gj in range(gj0, gj1 + 1):
            sx0, sy0 = gi * size, gj * size
            hit = any(
                point_in(px, py)
                for px, py in (
                    (sx0, sy0), (sx0 + size, sy0),
                    (sx0, sy0 + size), (sx0 + size, sy0 + size),
                )
            ) or any(
                seg_hits_square(
                    ring_i[k], ring_j[k],
                    ring_i[(k + 1) % n], ring_j[(k + 1) % n], sx0, sy0,
                )
                for k in range(n)
            )
            if hit:
                leaf = s2f.cell_id_from_face_ij(
                    np.array([face], dtype=np.int64),
                    np.array([sx0], dtype=np.int64),
                    np.array([sy0], dtype=np.int64),
                )
                out.add(int(s2f.parent(leaf, level)[0]))
    return out
