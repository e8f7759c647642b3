"""Point-in-polygon spatial join (broadcast polygon side + shuffled scale path).

Jimmy analogue: every reference join is "build a small dict once, probe it
per record" (SURVEY §2.4) — i.e. a broadcast hash join. Here the broadcast
side is the polygon set and the probe is spatial.

Three physical strategies, identical results:

1. ``pip_join_rtree`` (default, the 100-TB path): polygons are packed into
   an STR R-tree on the driver and shipped inside the ``mapInPandas``
   closure (Spark pickles it once per task, not per row). The points table
   is processed as a narrow map — **zero shuffle, zero join** in the plan;
   candidates come from vectorized R-tree bbox probes, then the exact
   integer ray-cast. Output is the (image_id, polygon_id) pair stream.
   This is exactly the "broadcast R-tree-packed polygon sets" of the
   north_rule, and it scales linearly with executors because no exchange
   exists.

2. ``pip_join_broadcast``: declarative variant — a Catalyst
   BroadcastNestedLoopJoin on the bbox range predicate, then a pandas-UDF
   ray-cast filter. Slower (NLJ row pairing on the JVM) but useful as an
   independent implementation for differential testing.

3. ``pip_join_cells``: the huge-polygon-set scale path. Both rtree and
   broadcast require the polygon set to fit in a task closure / broadcast;
   with millions of polygons (country-scale admin + parcel layers) neither
   does. Here each polygon's bbox is covered by fixed-width grid cells,
   each (polygon, cell) is classified FULL (cell rectangle provably inside
   the ring — accepted with no exact test, ring bytes never enter the
   shuffle) or BOUNDARY (ring rides once per boundary cell), points key by
   exact integer floor division, and the two sides meet in a plain
   equality join on (gx, gy) — a shuffled hash/sort-merge join Catalyst +
   AQE partition and skew-split like any other key join. Nothing is
   broadcast; both sides stream.

The DuckDB oracle (``duckdb_pip_sql``) evaluates the same bbox prefilter +
integer predicates via edge unnesting — exact row-set equality.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jimmy_spark.functions.raycast import inside_ring
from jimmy_spark.functions.rtree import STRtree


def _polygons_to_arrays(poly_pdf: pd.DataFrame):
    """polygon pandas df -> (ids, ring_x list, ring_y list, bbox arrays)."""
    ring_x = [
        np.array([v["lon_e7"] for v in ring], dtype=np.int64)
        for ring in poly_pdf["ring"]
    ]
    ring_y = [
        np.array([v["lat_e7"] for v in ring], dtype=np.int64)
        for ring in poly_pdf["ring"]
    ]
    return (
        poly_pdf["polygon_id"].to_numpy(),
        ring_x,
        ring_y,
        poly_pdf["min_lon"].to_numpy(np.int64),
        poly_pdf["min_lat"].to_numpy(np.int64),
        poly_pdf["max_lon"].to_numpy(np.int64),
        poly_pdf["max_lat"].to_numpy(np.int64),
    )


def pip_join_rtree(
    points: DataFrame,
    polygons: pd.DataFrame,
    id_col: str = "image_id",
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
    carry_cols: tuple = (),
) -> DataFrame:
    """points (id, lat_e7, lon_e7) x broadcast STR-tree polygons ->
    (id, polygon_id) exact PIP pairs. Narrow map, no shuffle.

    ``carry_cols`` are passed through the map onto the matched rows (their
    Spark types preserved) so downstream per-polygon aggregates never need
    to re-join — and therefore never re-plan — the input subtree (Catalyst
    plans trees, not DAGs: a self-join of this output against its own
    input would execute the upstream scan+shuffle twice)."""
    ids, ring_x, ring_y, min_x, min_y, max_x, max_y = _polygons_to_arrays(polygons)
    tree = STRtree(min_x, min_y, max_x, max_y)
    in_cols = [id_col, lat_col, lon_col, *carry_cols]
    carry_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in points.select(*carry_cols).schema.fields
    )
    out_schema = f"{id_col} string, polygon_id string" + (
        f", {carry_fields}" if carry_cols else ""
    )

    def gen(batches):
        for pdf in batches:
            px = pdf[lon_col].to_numpy(np.int64)
            py = pdf[lat_col].to_numpy(np.int64)
            pi, ri = tree.query_points(px, py)
            if len(pi) == 0:
                out = {id_col: pd.Series([], dtype=str),
                       "polygon_id": pd.Series([], dtype=str)}
                for c in carry_cols:
                    out[c] = pdf[c].iloc[:0]
                yield pd.DataFrame(out)
                continue
            keep_p, keep_r = [], []
            for r in np.unique(ri):
                m = ri == r
                sel = pi[m]
                ok = inside_ring(px[sel], py[sel], ring_x[r], ring_y[r])
                keep_p.append(sel[ok])
                keep_r.append(np.full(int(ok.sum()), r, dtype=np.int64))
            kp = np.concatenate(keep_p)
            kr = np.concatenate(keep_r)
            out = {id_col: pdf[id_col].to_numpy()[kp], "polygon_id": ids[kr]}
            for c in carry_cols:
                out[c] = pdf[c].to_numpy()[kp]
            yield pd.DataFrame(out)

    return points.select(*in_cols).mapInPandas(gen, out_schema)


def pip_join_broadcast(
    points: DataFrame,
    polygons: DataFrame,
    id_col: str = "image_id",
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
) -> DataFrame:
    """Declarative variant: broadcast bbox range join + pandas-UDF ray-cast."""
    polys = polygons.select(
        "polygon_id",
        F.transform("ring", lambda v: v["lon_e7"]).alias("ring_x"),
        F.transform("ring", lambda v: v["lat_e7"]).alias("ring_y"),
        "min_lat",
        "max_lat",
        "min_lon",
        "max_lon",
    )
    cand = points.select(id_col, lat_col, lon_col).join(
        F.broadcast(polys),
        (F.col(lat_col) >= F.col("min_lat"))
        & (F.col(lat_col) <= F.col("max_lat"))
        & (F.col(lon_col) >= F.col("min_lon"))
        & (F.col(lon_col) <= F.col("max_lon")),
    )

    @F.pandas_udf("boolean")
    def exact(lat: pd.Series, lon: pd.Series, rx: pd.Series, ry: pd.Series) -> pd.Series:
        out = np.zeros(len(lat), dtype=bool)
        lat_v = lat.to_numpy(np.int64)
        lon_v = lon.to_numpy(np.int64)
        for i in range(len(lat)):
            out[i] = inside_ring(
                lon_v[i : i + 1],
                lat_v[i : i + 1],
                np.asarray(rx[i], dtype=np.int64),
                np.asarray(ry[i], dtype=np.int64),
            )[0]
        return pd.Series(out)

    return cand.filter(
        exact(F.col(lat_col), F.col(lon_col), F.col("ring_x"), F.col("ring_y"))
    ).select(id_col, "polygon_id")


def _cover_cells(
    pdf: pd.DataFrame, grid: int
):
    """Per polygon-batch: exploded (gx, gy, polygon_id, ring_x?, ring_y?).

    Classification per (polygon, cell rectangle), all-integer after
    shifting coordinates to the polygon's bbox origin (products then fit
    int64 whenever the bbox span + grid stays under ~3e9 — every
    non-antimeridian polygon; wider spans skip classification and mark
    every cell BOUNDARY, which is always correct, only slower):

      FULL     — all 4 rect corners inside the ring (on-edge = inside) and
                 no ring edge intersects the closed rect (exact SAT:
                 bbox-overlap on x/y + rect corners strictly one side of
                 the edge's supporting line). Rings are dropped (null).
      BOUNDARY — corners straddle or an edge crosses: ring rides along for
                 the exact per-point ray-cast after the join.
      outside  — no corner inside, no edge intersects: dropped here, so
                 bbox-corner cells never reach the shuffle at all.
    """
    out_gx: list[np.ndarray] = []
    out_gy: list[np.ndarray] = []
    out_id: list[np.ndarray] = []
    out_rx: list[list] = []
    out_ry: list[list] = []
    for row in pdf.itertuples():
        rx = np.array([v["lon_e7"] for v in row.ring], dtype=np.int64)
        ry = np.array([v["lat_e7"] for v in row.ring], dtype=np.int64)
        gx0, gx1 = row.min_lon // grid, row.max_lon // grid
        gy0, gy1 = row.min_lat // grid, row.max_lat // grid
        gxs = np.arange(gx0, gx1 + 1, dtype=np.int64)
        gys = np.arange(gy0, gy1 + 1, dtype=np.int64)
        cgx = np.repeat(gxs, len(gys))
        cgy = np.tile(gys, len(gxs))
        span = max(row.max_lon - row.min_lon, row.max_lat - row.min_lat)
        if span + grid > 2_500_000_000:  # int64 product guard (see docstring)
            full = np.zeros(len(cgx), dtype=bool)
            keep = np.ones(len(cgx), dtype=bool)
        else:
            # shift to bbox origin: every coordinate below is a small delta
            ox, oy = int(row.min_lon), int(row.min_lat)
            lrx, lry = rx - ox, ry - oy
            x0, y0 = cgx * grid - ox, cgy * grid - oy
            x1, y1 = x0 + grid, y0 + grid
            # (a) rect corners inside the ring?
            corner_in = np.ones(len(cgx), dtype=bool)
            corner_any = np.zeros(len(cgx), dtype=bool)
            for cx, cy in ((x0, y0), (x1, y0), (x0, y1), (x1, y1)):
                ins = inside_ring(cx, cy, lrx, lry)
                corner_in &= ins
                corner_any |= ins
            # (b) any ring edge intersecting the closed rect? (edges x cells)
            ex1, ey1 = lrx[:, None], lry[:, None]
            ex2, ey2 = np.roll(lrx, -1)[:, None], np.roll(lry, -1)[:, None]
            bx0, bx1 = x0[None, :], x1[None, :]
            by0, by1 = y0[None, :], y1[None, :]
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
            # touching (cr == 0 corner on the line) counts as intersecting:
            # separated only when ALL corners are STRICTLY one side
            edge_hit = (bbox_ov & ~(allpos | allneg)).any(axis=0)
            full = corner_in & ~edge_hit
            keep = corner_any | edge_hit
        cgx, cgy, full = cgx[keep], cgy[keep], full[keep]
        out_gx.append(cgx)
        out_gy.append(cgy)
        out_id.append(np.full(len(cgx), row.polygon_id, dtype=object))
        ring_x = [int(v) for v in rx]
        ring_y = [int(v) for v in ry]
        out_rx.extend(None if f else ring_x for f in full)
        out_ry.extend(None if f else ring_y for f in full)
    return pd.DataFrame(
        {
            "gx": np.concatenate(out_gx) if out_gx else np.array([], np.int64),
            "gy": np.concatenate(out_gy) if out_gy else np.array([], np.int64),
            "polygon_id": np.concatenate(out_id)
            if out_id
            else np.array([], object),
            "ring_x": pd.Series(out_rx, dtype=object),
            "ring_y": pd.Series(out_ry, dtype=object),
        }
    )


def _pip_exact_or_full_udf():
    """Exact ray-cast verdict; a null ring means a FULL cell -> True.

    Null-tolerant on purpose: branching with F.when around a pandas UDF
    does not short-circuit (Spark may evaluate the UDF on every row), and
    splitting full/boundary into filter branches would recompute the join
    per branch — one null-aware kernel keeps the verify a single pass.
    (Built lazily: pandas_udf needs an active session.)"""

    @F.pandas_udf("boolean")
    def exact_or_full(
        lat: pd.Series, lon: pd.Series, rx: pd.Series, ry: pd.Series
    ) -> pd.Series:
        out = np.zeros(len(lat), dtype=bool)
        lat_v = lat.to_numpy(np.int64)
        lon_v = lon.to_numpy(np.int64)
        for i in range(len(lat)):
            r = rx.iloc[i]
            if r is None:
                out[i] = True
                continue
            out[i] = inside_ring(
                lon_v[i : i + 1],
                lat_v[i : i + 1],
                np.asarray(r, dtype=np.int64),
                np.asarray(ry.iloc[i], dtype=np.int64),
            )[0]
        return pd.Series(out)

    return exact_or_full


def pip_join_cells(
    points: DataFrame,
    polygons: DataFrame,
    grid_e7: int = 250_000,
    id_col: str = "image_id",
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
) -> DataFrame:
    """Shuffled grid-cell PIP join — polygon sets too large to broadcast.

    Exactly-once by construction: a point lies in exactly ONE grid cell
    (integer floor division) and each (polygon, cell) pair is emitted once
    by the cover, so no ``distinct`` is needed on the pair stream. FULL
    cells carry no ring bytes through the shuffle and skip the exact test;
    only BOUNDARY candidates pay the ray-cast. ``grid_e7`` should track the
    median polygon bbox edge (default ~0.025 deg fits the city-scale rings
    of this engine's datasets); a too-fine grid fans out big polygons, a
    too-coarse one turns every cell BOUNDARY.

    Scale shape: one narrow mapInPandas over polygons (cover+classify), one
    JVM projection over points, one equality shuffle join on (gx, gy) —
    AQE handles hot-cell skew like any other join key. Reference analogue:
    this is the same blocking-key discipline as the LSH dedup ladder, with
    the grid cell as the block.
    """
    grid = int(grid_e7)
    cover_schema = (
        "gx long, gy long, polygon_id string, "
        "ring_x array<long>, ring_y array<long>"
    )
    cover = polygons.select(
        "polygon_id", "ring", "min_lat", "max_lat", "min_lon", "max_lon"
    ).mapInPandas(lambda it: (_cover_cells(pdf, grid) for pdf in it), cover_schema)
    pts = points.select(
        id_col,
        lat_col,
        lon_col,
        F.expr(f"({lon_col} - pmod({lon_col}, {grid})) div {grid}").alias("gx"),
        F.expr(f"({lat_col} - pmod({lat_col}, {grid})) div {grid}").alias("gy"),
    )
    cand = pts.join(cover, ["gx", "gy"])
    exact_or_full = _pip_exact_or_full_udf()
    return cand.filter(
        exact_or_full(
            F.col(lat_col), F.col(lon_col), F.col("ring_x"), F.col("ring_y")
        )
    ).select(id_col, "polygon_id")


def duckdb_pip_sql(points_sql: str, polygons_path: str, id_col: str = "image_id") -> str:
    """DuckDB oracle: identical bbox prefilter + integer ray-cast semantics.
    ``points_sql`` must yield (id_col, lat_e7, lon_e7)."""
    return f"""
WITH pts AS ({points_sql}),
polys AS (SELECT * FROM '{polygons_path}'),
edges AS (
  SELECT polygon_id,
         ring[i].lon_e7::HUGEINT AS x1, ring[i].lat_e7::HUGEINT AS y1,
         ring[(i % len(ring)) + 1].lon_e7::HUGEINT AS x2,
         ring[(i % len(ring)) + 1].lat_e7::HUGEINT AS y2
  FROM polys, LATERAL (SELECT unnest(generate_series(1, len(ring))) AS i)
),
cand AS (
  SELECT p.{id_col} AS pid, p.lat_e7::HUGEINT AS py, p.lon_e7::HUGEINT AS px,
         q.polygon_id
  FROM pts p JOIN polys q
    ON p.lat_e7 BETWEEN q.min_lat AND q.max_lat
   AND p.lon_e7 BETWEEN q.min_lon AND q.max_lon
),
tests AS (
  SELECT c.pid, c.polygon_id,
         bool_or(
           ((e.x2 - e.x1) * (c.py - e.y1) - (c.px - e.x1) * (e.y2 - e.y1)) = 0
           AND c.px BETWEEN least(e.x1, e.x2) AND greatest(e.x1, e.x2)
           AND c.py BETWEEN least(e.y1, e.y2) AND greatest(e.y1, e.y2)
         ) AS on_edge,
         count(*) FILTER (
           ((e.y1 > c.py) != (e.y2 > c.py))
           AND ( (e.y2 > e.y1 AND
                  ((e.x2 - e.x1) * (c.py - e.y1) - (c.px - e.x1) * (e.y2 - e.y1)) > 0)
              OR (e.y2 < e.y1 AND
                  ((e.x2 - e.x1) * (c.py - e.y1) - (c.px - e.x1) * (e.y2 - e.y1)) < 0))
         ) AS crossings
  FROM cand c JOIN edges e USING (polygon_id)
  GROUP BY c.pid, c.polygon_id
)
SELECT pid AS {id_col}, polygon_id
FROM tests WHERE on_edge OR (crossings % 2) = 1
"""
