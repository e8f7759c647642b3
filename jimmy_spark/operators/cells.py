"""Cell-ID encoding stages: georef -> hex (H3-style) and S2 columns.

Two execution paths, same bit-exact results:

- ``use_arrow_udf=True`` (default for hex+S2): vectorized pandas/Arrow UDFs
  — NumPy batch kernels, zero per-row Python (the north_rule contract).
- ``use_arrow_udf=False`` (hex only): pure Spark column expressions — the
  whole computation stays inside WholeStageCodegen on the JVM, no Python
  worker at all. Same IEEE double op order as the NumPy kernel, so ids are
  identical; this is the 100-TB hot path (bench.py uses it) because it
  removes the Arrow serialization round-trip entirely.

S2 has no expression path (Hilbert LUT needs array indexing) — it is the
showcase Arrow-UDF stage.

Scale note: these are narrow map stages — no shuffle, no skew exposure;
cost is O(rows) CPU. Column pruning keeps the `bytes` column out of the
Arrow transfer (only lat/lon/phash cross to Python).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jimmy_spark.functions import georef, hexgrid, s2


def with_georef(df: DataFrame, phash_col: str = "phash") -> DataFrame:
    """Add (lat_e7, lon_e7) from phash — pure JVM expressions."""
    c = F.col(phash_col)
    return df.withColumn("lat_e7", georef.lat_e7_col(c)).withColumn(
        "lon_e7", georef.lon_e7_col(c)
    )


# --- hex: Arrow-UDF path --------------------------------------------------


def _hex_udf(res: int):
    @F.pandas_udf(T.LongType())
    def enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(hexgrid.encode(lat.to_numpy(), lon.to_numpy(), res))

    return enc


def _s2_udf(level: int):
    @F.pandas_udf(T.LongType())
    def enc(lat: pd.Series, lon: pd.Series) -> pd.Series:
        return pd.Series(s2.encode(lat.to_numpy(), lon.to_numpy(), level))

    return enc


# --- hex: JVM expression path (same IEEE op order as hexgrid.encode) ------


def hex_cell_expr(lat: Column, lon: Column, res: int) -> Column:
    size = F.lit(hexgrid.SIZES[res])
    qf = (lon.cast("double") * F.lit(hexgrid.C_SQ33) - lat.cast("double") * F.lit(hexgrid.C_13)) / size
    rf = (lat.cast("double") * F.lit(hexgrid.C_23)) / size
    yf = -qf - rf
    rx = F.floor(qf + F.lit(0.5)).cast("long")
    ry = F.floor(yf + F.lit(0.5)).cast("long")
    rz = F.floor(rf + F.lit(0.5)).cast("long")
    fx = F.abs(rx.cast("double") - qf)
    fy = F.abs(ry.cast("double") - yf)
    fz = F.abs(rz.cast("double") - rf)
    fix_x = (fx > fy) & (fx > fz)
    fix_y = (~fix_x) & (fy > fz)
    q = F.when(fix_x, -ry - rz).otherwise(rx)
    r = F.when((~fix_x) & (~fix_y), -rx - ry).otherwise(rz)
    off = F.lit(1 << 29)
    return (
        F.shiftleft(F.lit(res - hexgrid._BIAS).cast("long"), 60)
        .bitwiseOR(F.shiftleft(q + off, 30))
        .bitwiseOR(r + off)
    )


def hex_center_exprs(cell: Column, res: int) -> tuple[Column, Column]:
    """(lat_e7, lon_e7) lattice-rounded center of a fixed-resolution hex
    cell id — the JVM twin of ``hexgrid.center_lattice`` /
    ``hexgrid.duckdb_center_sql`` (same IEEE op order, same literals)."""
    mask = F.lit(hexgrid._QR_MASK)
    off = F.lit(1 << 29)
    q = (F.shiftright(cell, 30).bitwiseAND(mask) - off).cast("double")
    r = (cell.bitwiseAND(mask) - off).cast("double")
    size = F.lit(hexgrid.SIZES[res])
    lat = F.floor(size * F.lit(1.5) * r + F.lit(0.5)).cast("long")
    lon = F.floor(
        size * (F.lit(hexgrid.SQ3) * (q + r * F.lit(0.5))) + F.lit(0.5)
    ).cast("long")
    return lat, lon


def with_hex_cells(
    df: DataFrame,
    resolutions=hexgrid.RESOLUTIONS,
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
    use_arrow_udf: bool = True,
) -> DataFrame:
    lat, lon = F.col(lat_col), F.col(lon_col)
    for res in resolutions:
        col = (
            _hex_udf(res)(lat, lon)
            if use_arrow_udf
            else hex_cell_expr(lat, lon, res)
        )
        df = df.withColumn(f"hex_r{res}", col)
    return df


def with_s2_cells(
    df: DataFrame,
    levels=(12, 14, 16),
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
) -> DataFrame:
    lat, lon = F.col(lat_col), F.col(lon_col)
    for level in levels:
        df = df.withColumn(f"s2_l{level}", _s2_udf(level)(lat, lon))
    return df
