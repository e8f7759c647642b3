"""Raster tile rendering: per-tile heatmap PNGs from point density.

The geospatial x image fusion lane: the engine's point table becomes a
servable XYZ raster tile set (the standard web-map pyramid), rendered
with the repo's own real PNG codec (codecs/png.py, RFC-2083 bytes).

Reference scope note: jimmy handles images as per-note attachments; tile
rendering is engine surface (SURVEY §2 engine additions) — the write-side
counterpart of the tile-assignment operator the north_rule names.

Scale shape (10^12-point design):

1. tile + in-tile pixel coordinates as pure JVM expressions: the pixel is
   the tile coordinate at ``zoom + 8`` minus ``256 *`` the tile coordinate
   at ``zoom`` (256 = 2^8 px tiles, exact by the nested-floor identity —
   same maths as the tile-pyramid rollup).
2. ONE shuffled groupBy (tile, pixel) count — map-side combinable; the
   post-shuffle state is bounded by 65,536 pixel rows per tile no matter
   how many points hit the tile (the renderer never sees raw points).
3. applyInPandas per tile: scatter counts into a 256x256 array, apply the
   deterministic integer tone map, PNG-encode. Python touches only
   O(tiles x occupied pixels), never O(points).

Determinism: the tone map is exact integer math on (count, tile max), so
tile bytes are identical at any partitioning — verified byte-for-byte by
re-rendering from an independent pandas aggregation in the tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jimmy_spark.codecs import png
from jimmy_spark.functions import tiles

TILE_PX = 256  # 2^8 — the web-mercator standard

_TILE_SCHEMA = T.StructType(
    [
        T.StructField("z", T.IntegerType()),
        T.StructField("x", T.LongType()),
        T.StructField("y", T.LongType()),
        T.StructField("n_points", T.LongType()),
        T.StructField("max_count", T.LongType()),
        T.StructField("png", T.BinaryType()),
    ]
)


def tone_map(counts: np.ndarray, max_count: int) -> np.ndarray:
    """(256, 256) int64 counts -> (256, 256, 3) uint8, exact integer math:
    v = 0 for empty pixels else 64 + 191 * count // max (floor) — a fixed
    warm ramp (r=v, g=v//2, b=255-v) so empty stays black and density
    reads hot. Deterministic for any partitioning."""
    v = np.zeros(counts.shape, dtype=np.int64)
    nz = counts > 0
    if max_count > 0:
        v[nz] = 64 + (191 * counts[nz]) // max_count
    rgb = np.zeros((*counts.shape, 3), dtype=np.uint8)
    rgb[..., 0] = v
    rgb[..., 1] = v // 2
    rgb[..., 2] = np.where(nz, 255 - v, 0)
    return rgb


def render_heat_tiles(
    points: DataFrame,
    zoom: int,
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
) -> DataFrame:
    """(z, x, y, n_points, max_count, png) — one rendered 256px heat tile
    per XYZ tile that contains at least one point."""
    fine = zoom + 8
    fx = tiles.x_col(F.col(lon_col), fine)
    fy = tiles.y_col(F.col(lat_col), fine)
    tx = tiles.x_col(F.col(lon_col), zoom)
    ty = tiles.y_col(F.col(lat_col), zoom)
    px_counts = (
        points.select(
            tx.alias("x"),
            ty.alias("y"),
            (fx - tx * TILE_PX).alias("px"),
            (fy - ty * TILE_PX).alias("py"),
        )
        .groupBy("x", "y", "px", "py")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    def render(pdf: pd.DataFrame) -> pd.DataFrame:
        x, y = int(pdf["x"].iloc[0]), int(pdf["y"].iloc[0])
        grid = np.zeros((TILE_PX, TILE_PX), dtype=np.int64)
        grid[pdf["py"].to_numpy(np.int64), pdf["px"].to_numpy(np.int64)] = (
            pdf["cnt"].to_numpy(np.int64)
        )
        mx = int(grid.max())
        data = png.encode(tone_map(grid, mx))
        return pd.DataFrame(
            {
                "z": [zoom],
                "x": [x],
                "y": [y],
                "n_points": [int(pdf["cnt"].sum())],
                "max_count": [mx],
                "png": [data],
            }
        )

    return px_counts.groupBy("x", "y").applyInPandas(render, _TILE_SCHEMA)
