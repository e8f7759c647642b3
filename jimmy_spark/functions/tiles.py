"""XYZ (slippy-map / WebMercator) raster tile assignment.

Standard public formula (OSM slippy tilenames):

    n = 2^z
    xtile = floor((lon_deg + 180) / 360 * n)              clipped to [0, n-1]
    ytile = floor((1 - ln(tan(lat) + 1/cos(lat)) / pi) / 2 * n)   (lat in rad)

Three implementations share the formula: NumPy (oracle / pandas-UDF path),
Spark built-in column expressions (JVM codegen — the hot path), and a DuckDB
SQL fragment (driver oracle). Latitudes are already confined to the Mercator
bound (georef.LAT_MAX_E7), so no pole clamping is needed beyond the floor
clip. Tile ownership is floor semantics (SURVEY §7.3 tie rule).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

ZOOMS = (8, 12, 16)

_DEG = 1.0e7  # e7 fixed point -> degrees


def xy_np(lat_e7: np.ndarray, lon_e7: np.ndarray, z: int):
    n = float(1 << z)
    lon = lon_e7.astype(np.float64) / _DEG
    lat_rad = (lat_e7.astype(np.float64) / _DEG) * (np.pi / 180.0)
    x = np.floor((lon + 180.0) / 360.0 * n).astype(np.int64)
    y = np.floor(
        (1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi) / 2.0 * n
    ).astype(np.int64)
    nmax = (1 << z) - 1
    return np.clip(x, 0, nmax), np.clip(y, 0, nmax)


def x_col(lon_e7: Column, z: int) -> Column:
    n = float(1 << z)
    nmax = (1 << z) - 1
    x = F.floor((lon_e7 / F.lit(_DEG) + F.lit(180.0)) / F.lit(360.0) * F.lit(n))
    return F.least(F.greatest(x, F.lit(0)), F.lit(nmax)).cast("long")


def y_col(lat_e7: Column, z: int) -> Column:
    n = float(1 << z)
    nmax = (1 << z) - 1
    lat_rad = (lat_e7 / F.lit(_DEG)) * F.lit(float(np.pi) / 180.0)
    y = F.floor(
        (
            F.lit(1.0)
            - F.log(F.tan(lat_rad) + F.lit(1.0) / F.cos(lat_rad)) / F.lit(float(np.pi))
        )
        / F.lit(2.0)
        * F.lit(n)
    )
    return F.least(F.greatest(y, F.lit(0)), F.lit(nmax)).cast("long")


def duckdb_xy_sql(lat_col: str, lon_col: str, z: int) -> tuple[str, str]:
    """(x_expr, y_expr) DuckDB fragments; identical formula/op order."""
    n = float(1 << z)
    nmax = (1 << z) - 1
    x = (
        f"least(greatest(floor(({lon_col} / {_DEG!r} + 180.0) / 360.0 * {n!r})::BIGINT,"
        f" 0), {nmax})"
    )
    y = (
        f"least(greatest(floor((1.0 - ln(tan(({lat_col} / {_DEG!r}) * (pi() / 180.0))"
        f" + 1.0 / cos(({lat_col} / {_DEG!r}) * (pi() / 180.0))) / pi()) / 2.0 *"
        f" {n!r})::BIGINT, 0), {nmax})"
    )
    return x, y
