"""Polygon-polygon intersects join — the vector x vector spatial join.

Reference scope note: jimmy's geometry surface is per-record (one point
per note); the vector-vector join is part of the engine's large-scale
geospatial surface (SURVEY §2.4 engine additions), completing the join
family point x polygon (operators/pip.py) -> point x point
(operators/distjoin.py) -> polygon x polygon (here).

Semantics: (a_id, b_id) for every pair whose CLOSED regions intersect —
interiors overlapping, one containing the other, or boundaries merely
touching at a point/edge (the closed-region rule matching PIP's
on-edge = inside tie).

Plan shape (10^9-polygon design):

1. Each side's polygons explode to the grid cells of their bbox in one
   narrow mapInPandas (ring + bbox ride along) — no shuffle.
2. ONE shuffled equality join on (gx, gy); AQE skew-splits hot cells.
3. Exactly-once BY CONSTRUCTION (no distinct): a candidate survives only
   in its RESPONSIBILITY CELL — the cell containing the bottom-left
   corner of the bbox intersection, ``(max(min_lat), max(min_lon))``.
   That corner exists iff the bboxes overlap (checked in the same JVM
   predicate) and lies in exactly one cell of each side's cover, so each
   bbox-overlapping pair reaches the verify stage exactly once.
4. Exact integer verify per candidate (Arrow-batched, numpy):
   intersects <=> any vertex of A inside B (ray-cast, on-edge = inside)
   OR any vertex of B inside A OR any boundary segments intersect
   (CLRS orientation test incl. collinear touching). Coordinates shift
   to the bbox-intersection origin first, so cross products stay far
   inside int64 for any candidate pair (deltas bounded by the two bbox
   spans + grid, ~1e7 in the data model).

Why all three predicates: vertex-in catches containment with no boundary
contact; segment intersection catches interior crossings where no vertex
of either ring lies inside the other (e.g. a plus-sign overlap).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jimmy_spark.functions.raycast import inside_ring

DEFAULT_GRID_E7 = 250_000

_COVER_SCHEMA = T.StructType(
    [
        T.StructField("gx", T.LongType()),
        T.StructField("gy", T.LongType()),
        T.StructField("pid", T.StringType()),
        T.StructField("min_lat", T.LongType()),
        T.StructField("max_lat", T.LongType()),
        T.StructField("min_lon", T.LongType()),
        T.StructField("max_lon", T.LongType()),
        T.StructField("ring_x", T.ArrayType(T.LongType())),
        T.StructField("ring_y", T.ArrayType(T.LongType())),
    ]
)


def _bbox_cover(polygons: DataFrame, grid: int) -> DataFrame:
    """(gx, gy, pid, bbox, ring) — one row per (polygon, bbox grid cell);
    narrow mapInPandas, no classification (every candidate pair is
    verified exactly anyway, and polygon-polygon has no FULL shortcut)."""

    def gen(batches):
        for pdf in batches:
            rows = {k: [] for k in (
                "gx", "gy", "pid", "min_lat", "max_lat", "min_lon",
                "max_lon", "ring_x", "ring_y",
            )}
            for row in pdf.itertuples():
                rx = [int(v["lon_e7"]) for v in row.ring]
                ry = [int(v["lat_e7"]) for v in row.ring]
                gx0, gx1 = row.min_lon // grid, row.max_lon // grid
                gy0, gy1 = row.min_lat // grid, row.max_lat // grid
                for gx in range(int(gx0), int(gx1) + 1):
                    for gy in range(int(gy0), int(gy1) + 1):
                        rows["gx"].append(gx)
                        rows["gy"].append(gy)
                        rows["pid"].append(row.polygon_id)
                        rows["min_lat"].append(int(row.min_lat))
                        rows["max_lat"].append(int(row.max_lat))
                        rows["min_lon"].append(int(row.min_lon))
                        rows["max_lon"].append(int(row.max_lon))
                        rows["ring_x"].append(rx)
                        rows["ring_y"].append(ry)
            yield pd.DataFrame(rows)

    return polygons.select(
        "polygon_id", "ring", "min_lat", "max_lat", "min_lon", "max_lon"
    ).mapInPandas(gen, _COVER_SCHEMA)


def _segments_intersect_any(ax, ay, bx, by) -> bool:
    """Exact integer test: does ANY closed segment of ring A intersect ANY
    closed segment of ring B? Vectorized CLRS orientation test over the
    full edge cross product set (na x nb)."""
    a1x, a1y = ax, ay
    a2x, a2y = np.roll(ax, -1), np.roll(ay, -1)
    b1x, b1y = bx, by
    b2x, b2y = np.roll(bx, -1), np.roll(by, -1)
    # A edges as rows, B edges as cols
    a1x, a1y, a2x, a2y = (v[:, None] for v in (a1x, a1y, a2x, a2y))
    b1x, b1y, b2x, b2y = (v[None, :] for v in (b1x, b1y, b2x, b2y))

    def cross(ox, oy, px, py, qx, qy):
        return (px - ox) * (qy - oy) - (py - oy) * (qx - ox)

    d1 = cross(b1x, b1y, b2x, b2y, a1x, a1y)
    d2 = cross(b1x, b1y, b2x, b2y, a2x, a2y)
    d3 = cross(a1x, a1y, a2x, a2y, b1x, b1y)
    d4 = cross(a1x, a1y, a2x, a2y, b2x, b2y)
    proper = (
        (((d1 > 0) & (d2 < 0)) | ((d1 < 0) & (d2 > 0)))
        & (((d3 > 0) & (d4 < 0)) | ((d3 < 0) & (d4 > 0)))
    )

    def on_seg(px, py, sx1, sy1, sx2, sy2):
        return (
            (px >= np.minimum(sx1, sx2)) & (px <= np.maximum(sx1, sx2))
            & (py >= np.minimum(sy1, sy2)) & (py <= np.maximum(sy1, sy2))
        )

    touch = (
        ((d1 == 0) & on_seg(a1x, a1y, b1x, b1y, b2x, b2y))
        | ((d2 == 0) & on_seg(a2x, a2y, b1x, b1y, b2x, b2y))
        | ((d3 == 0) & on_seg(b1x, b1y, a1x, a1y, a2x, a2y))
        | ((d4 == 0) & on_seg(b2x, b2y, a1x, a1y, a2x, a2y))
    )
    return bool((proper | touch).any())


def rings_intersect(ax, ay, bx, by) -> bool:
    """Closed-region intersects for two rings (int64 numpy arrays whose
    coordinates are already shifted small)."""
    if inside_ring(ax, ay, bx, by).any():
        return True
    if inside_ring(bx, by, ax, ay).any():
        return True
    return _segments_intersect_any(ax, ay, bx, by)


def duckdb_poly_sql(polygons_path: str) -> str:
    """DuckDB oracle twin of the self-join: bbox-overlapping id pairs
    (a < b), then the same closed-region decomposition in HUGEINT —
    vertex-in (integer ray-cast, both directions) OR segment intersection
    (orientation signs + collinear-touch bbox test). DISTINCT where the
    engine is exactly-once by construction."""
    edges = f"""
  SELECT polygon_id,
         ring[i].lon_e7::HUGEINT AS x1, ring[i].lat_e7::HUGEINT AS y1,
         ring[(i % len(ring)) + 1].lon_e7::HUGEINT AS x2,
         ring[(i % len(ring)) + 1].lat_e7::HUGEINT AS y2
  FROM polys, LATERAL (SELECT unnest(generate_series(1, len(ring))) AS i)
"""
    # point (px,py) vs edge set of `polygon_id`: same predicates as
    # duckdb_pip_sql, parameterized over an arbitrary candidate frame
    vin = """
  SELECT c.pa, c.pb
  FROM vcand c JOIN edges e ON e.polygon_id = c.ring_pid
  GROUP BY c.pa, c.pb, c.px, c.py
  HAVING bool_or(
           ((e.x2 - e.x1) * (c.py - e.y1) - (c.px - e.x1) * (e.y2 - e.y1)) = 0
           AND c.px BETWEEN least(e.x1, e.x2) AND greatest(e.x1, e.x2)
           AND c.py BETWEEN least(e.y1, e.y2) AND greatest(e.y1, e.y2)
         )
      OR (count(*) FILTER (
           ((e.y1 > c.py) != (e.y2 > c.py))
           AND ( (e.y2 > e.y1 AND
                  ((e.x2 - e.x1) * (c.py - e.y1) - (c.px - e.x1) * (e.y2 - e.y1)) > 0)
              OR (e.y2 < e.y1 AND
                  ((e.x2 - e.x1) * (c.py - e.y1) - (c.px - e.x1) * (e.y2 - e.y1)) < 0))
         ) % 2) = 1
"""
    return f"""
WITH polys AS (SELECT * FROM '{polygons_path}'),
edges AS ({edges}),
verts AS (
  SELECT polygon_id, ring[i].lon_e7::HUGEINT AS px, ring[i].lat_e7::HUGEINT AS py
  FROM polys, LATERAL (SELECT unnest(generate_series(1, len(ring))) AS i)
),
bpairs AS (
  SELECT a.polygon_id AS pa, b.polygon_id AS pb
  FROM polys a JOIN polys b
    ON a.polygon_id < b.polygon_id
   AND a.min_lon <= b.max_lon AND b.min_lon <= a.max_lon
   AND a.min_lat <= b.max_lat AND b.min_lat <= a.max_lat
),
vcand AS (
  SELECT pr.pa, pr.pb, pr.pb AS ring_pid, v.px, v.py
  FROM bpairs pr JOIN verts v ON v.polygon_id = pr.pa
  UNION ALL
  SELECT pr.pa, pr.pb, pr.pa AS ring_pid, v.px, v.py
  FROM bpairs pr JOIN verts v ON v.polygon_id = pr.pb
),
vhits AS ({vin}),
seghits AS (
  SELECT pr.pa, pr.pb
  FROM bpairs pr
  JOIN edges ea ON ea.polygon_id = pr.pa
  JOIN edges eb ON eb.polygon_id = pr.pb
  WHERE (
    -- d1..d4: CLRS orientations, HUGEINT exact
    ((((eb.x2-eb.x1)*(ea.y1-eb.y1) - (eb.y2-eb.y1)*(ea.x1-eb.x1)) > 0
      AND ((eb.x2-eb.x1)*(ea.y2-eb.y1) - (eb.y2-eb.y1)*(ea.x2-eb.x1)) < 0)
     OR (((eb.x2-eb.x1)*(ea.y1-eb.y1) - (eb.y2-eb.y1)*(ea.x1-eb.x1)) < 0
      AND ((eb.x2-eb.x1)*(ea.y2-eb.y1) - (eb.y2-eb.y1)*(ea.x2-eb.x1)) > 0))
    AND
    ((((ea.x2-ea.x1)*(eb.y1-ea.y1) - (ea.y2-ea.y1)*(eb.x1-ea.x1)) > 0
      AND ((ea.x2-ea.x1)*(eb.y2-ea.y1) - (ea.y2-ea.y1)*(eb.x2-ea.x1)) < 0)
     OR (((ea.x2-ea.x1)*(eb.y1-ea.y1) - (ea.y2-ea.y1)*(eb.x1-ea.x1)) < 0
      AND ((ea.x2-ea.x1)*(eb.y2-ea.y1) - (ea.y2-ea.y1)*(eb.x2-ea.x1)) > 0))
  )
  OR (((eb.x2-eb.x1)*(ea.y1-eb.y1) - (eb.y2-eb.y1)*(ea.x1-eb.x1)) = 0
      AND ea.x1 BETWEEN least(eb.x1, eb.x2) AND greatest(eb.x1, eb.x2)
      AND ea.y1 BETWEEN least(eb.y1, eb.y2) AND greatest(eb.y1, eb.y2))
  OR (((eb.x2-eb.x1)*(ea.y2-eb.y1) - (eb.y2-eb.y1)*(ea.x2-eb.x1)) = 0
      AND ea.x2 BETWEEN least(eb.x1, eb.x2) AND greatest(eb.x1, eb.x2)
      AND ea.y2 BETWEEN least(eb.y1, eb.y2) AND greatest(eb.y1, eb.y2))
  OR (((ea.x2-ea.x1)*(eb.y1-ea.y1) - (ea.y2-ea.y1)*(eb.x1-ea.x1)) = 0
      AND eb.x1 BETWEEN least(ea.x1, ea.x2) AND greatest(ea.x1, ea.x2)
      AND eb.y1 BETWEEN least(ea.y1, ea.y2) AND greatest(ea.y1, ea.y2))
  OR (((ea.x2-ea.x1)*(eb.y2-ea.y1) - (ea.y2-ea.y1)*(eb.x2-ea.x1)) = 0
      AND eb.x2 BETWEEN least(ea.x1, ea.x2) AND greatest(ea.x1, ea.x2)
      AND eb.y2 BETWEEN least(ea.y1, ea.y2) AND greatest(ea.y1, ea.y2))
)
SELECT DISTINCT pa AS a_id, pb AS b_id
FROM (SELECT pa, pb FROM vhits UNION ALL SELECT pa, pb FROM seghits)
"""


def poly_join_intersects(
    a: DataFrame,
    b: DataFrame | None = None,
    grid_e7: int = DEFAULT_GRID_E7,
) -> DataFrame:
    """(a_id, b_id) pairs of intersecting polygons. With ``b=None``, the
    self-join (a_id < b_id, no self-pairs)."""
    self_join = b is None
    grid = int(grid_e7)
    ca = _bbox_cover(a, grid).withColumnsRenamed(
        {c: f"a_{c}" for c in _COVER_SCHEMA.names if c not in ("gx", "gy")}
    )
    cb = _bbox_cover(a if self_join else b, grid).withColumnsRenamed(
        {c: f"b_{c}" for c in _COVER_SCHEMA.names if c not in ("gx", "gy")}
    )
    cand = ca.join(cb, ["gx", "gy"])
    if self_join:
        cand = cand.filter(F.col("a_pid") < F.col("b_pid"))
    # bbox overlap + responsibility cell: the cell of the intersection's
    # bottom-left corner — unique, and in both covers iff bboxes overlap
    overlap = (
        (F.col("a_min_lon") <= F.col("b_max_lon"))
        & (F.col("b_min_lon") <= F.col("a_max_lon"))
        & (F.col("a_min_lat") <= F.col("b_max_lat"))
        & (F.col("b_min_lat") <= F.col("a_max_lat"))
    )
    def _floor_div(sql_x: str):
        # exact floor for negatives: SQL div truncates toward zero, and
        # % keeps the dividend's sign, so subtract 1 on a negative rest
        return F.expr(
            f"({sql_x}) div {grid} - cast((({sql_x}) % {grid}) < 0 as int)"
        )

    resp = (
        F.col("gx") == _floor_div("greatest(a_min_lon, b_min_lon)")
    ) & (F.col("gy") == _floor_div("greatest(a_min_lat, b_min_lat)"))
    cand = cand.filter(overlap & resp)

    @F.pandas_udf(T.BooleanType())
    def verify(
        arx: pd.Series, ary: pd.Series, brx: pd.Series, bry: pd.Series,
        ox: pd.Series, oy: pd.Series,
    ) -> pd.Series:
        out = np.zeros(len(arx), dtype=bool)
        for i in range(len(arx)):
            sx, sy = int(ox.iloc[i]), int(oy.iloc[i])
            ax = np.asarray(arx.iloc[i], dtype=np.int64) - sx
            ay = np.asarray(ary.iloc[i], dtype=np.int64) - sy
            bx = np.asarray(brx.iloc[i], dtype=np.int64) - sx
            by = np.asarray(bry.iloc[i], dtype=np.int64) - sy
            out[i] = rings_intersect(ax, ay, bx, by)
        return pd.Series(out)

    return (
        cand.withColumn(
            "_hit",
            verify(
                "a_ring_x", "a_ring_y", "b_ring_x", "b_ring_y",
                F.greatest("a_min_lon", "b_min_lon"),
                F.greatest("a_min_lat", "b_min_lat"),
            ),
        )
        .filter("_hit")
        .select(F.col("a_pid").alias("a_id"), F.col("b_pid").alias("b_id"))
    )
