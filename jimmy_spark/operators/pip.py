"""Point-in-polygon spatial join (broadcast polygon side).

Jimmy analogue: every reference join is "build a small dict once, probe it
per record" (SURVEY §2.4) — i.e. a broadcast hash join. Here the broadcast
side is the polygon set and the probe is spatial.

Two physical strategies, identical results:

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
) -> DataFrame:
    """points (id, lat_e7, lon_e7) x broadcast STR-tree polygons ->
    (id, polygon_id) exact PIP pairs. Narrow map, no shuffle."""
    ids, ring_x, ring_y, min_x, min_y, max_x, max_y = _polygons_to_arrays(polygons)
    tree = STRtree(min_x, min_y, max_x, max_y)

    def gen(batches):
        for pdf in batches:
            px = pdf[lon_col].to_numpy(np.int64)
            py = pdf[lat_col].to_numpy(np.int64)
            pi, ri = tree.query_points(px, py)
            if len(pi) == 0:
                yield pd.DataFrame({id_col: pd.Series([], dtype=str),
                                    "polygon_id": pd.Series([], dtype=str)})
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
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy()[kp], "polygon_id": ids[kr]}
            )

    return points.select(id_col, lat_col, lon_col).mapInPandas(
        gen, f"{id_col} string, polygon_id string"
    )


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
