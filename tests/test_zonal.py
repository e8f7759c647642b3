"""Raster zonal statistics (operators/raster.py zonal_stats): the
cell-center inverse contract (NumPy == JVM expression, center lands in its
own cell), a pure-pandas differential oracle (encode + exact ray-cast +
aggregate), and partitioning invariance."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from jimmy_spark.functions import hexgrid
from jimmy_spark.functions.raycast import inside_ring
from jimmy_spark.operators import cells, raster


@pytest.fixture(scope="module")
def vpts(spark, t2_dir):
    imgs = spark.read.parquet(f"{t2_dir}/images.parquet")
    return cells.with_georef(imgs.select("image_id", "phash", "w", "h")).withColumn(
        "px", F.col("w").cast("long") * F.col("h").cast("long")
    )


@pytest.fixture(scope="module")
def poly_pdf(t2_dir):
    return pd.read_parquet(f"{t2_dir}/polygons.parquet")


def test_sq3_literal_is_sqrt3():
    assert hexgrid.SQ3 == float(np.sqrt(3.0))


@pytest.mark.parametrize("res", [7, 8, 9])
def test_center_lattice_roundtrips_into_own_cell(vpts, res):
    """The lattice-rounded center must re-encode to the cell it came from —
    the property that makes it a valid zone-membership representative."""
    pdf = vpts.select("lat_e7", "lon_e7").toPandas()
    cell = hexgrid.encode(
        pdf["lat_e7"].to_numpy(np.int64), pdf["lon_e7"].to_numpy(np.int64), res
    )
    uniq = np.unique(cell)
    cy, cx = hexgrid.center_lattice(uniq)
    again = hexgrid.encode(cy, cx, res)
    assert (again == uniq).all()


@pytest.mark.parametrize("res", [8, 9])
def test_center_exprs_match_numpy(spark, vpts, res):
    """JVM hex_center_exprs == NumPy center_lattice, bit-exact longs."""
    with_cell = vpts.select(
        cells.hex_cell_expr(F.col("lat_e7"), F.col("lon_e7"), res).alias("cell")
    ).distinct()
    clat, clon = cells.hex_center_exprs(F.col("cell"), res)
    got = (
        with_cell.select("cell", clat.alias("clat"), clon.alias("clon"))
        .toPandas()
        .sort_values("cell")
        .reset_index(drop=True)
    )
    cy, cx = hexgrid.center_lattice(got["cell"].to_numpy(np.int64))
    assert (got["clat"].to_numpy(np.int64) == cy).all()
    assert (got["clon"].to_numpy(np.int64) == cx).all()


def _zonal_pandas(pdf: pd.DataFrame, poly_pdf: pd.DataFrame, res: int):
    """Independent zonal stats: NumPy encode, lattice centers, exact
    integer ray-cast per polygon, pandas aggregate."""
    cell = hexgrid.encode(
        pdf["lat_e7"].to_numpy(np.int64), pdf["lon_e7"].to_numpy(np.int64), res
    )
    r = pd.DataFrame({"cell": cell, "px": pdf["px"].to_numpy(np.int64)})
    raster_pdf = r.groupby("cell").agg(
        n_pts=("px", "size"), sum_v=("px", "sum")
    ).reset_index()
    cy, cx = hexgrid.center_lattice(raster_pdf["cell"].to_numpy(np.int64))
    rows = []
    for _, poly in poly_pdf.iterrows():
        rx = np.array([v["lon_e7"] for v in poly["ring"]], dtype=np.int64)
        ry = np.array([v["lat_e7"] for v in poly["ring"]], dtype=np.int64)
        m = inside_ring(cx, cy, rx, ry)
        if not m.any():
            continue
        sel = raster_pdf[m]
        rows.append(
            {
                "polygon_id": poly["polygon_id"],
                "n_cells": int(m.sum()),
                "n_pts": int(sel["n_pts"].sum()),
                "sum_v": int(sel["sum_v"].sum()),
                "max_cell_pts": int(sel["n_pts"].max()),
            }
        )
    return pd.DataFrame(rows).sort_values("polygon_id").reset_index(drop=True)


@pytest.mark.parametrize("res", [8, 9])
def test_zonal_stats_matches_pandas_oracle(spark, vpts, poly_pdf, res):
    got = (
        raster.zonal_stats(vpts, poly_pdf, res=res, value_col="px")
        .toPandas()
        .sort_values("polygon_id")
        .reset_index(drop=True)
    )
    exp = _zonal_pandas(vpts.toPandas(), poly_pdf, res)
    pd.testing.assert_frame_equal(got.astype("int64", errors="ignore"), exp,
                                  check_dtype=False)


def test_zonal_stats_partitioning_invariant(spark, vpts, poly_pdf):
    a = (
        raster.zonal_stats(vpts, poly_pdf, res=9, value_col="px")
        .toPandas().sort_values("polygon_id").reset_index(drop=True)
    )
    b = (
        raster.zonal_stats(vpts.repartition(13), poly_pdf, res=9, value_col="px")
        .toPandas().sort_values("polygon_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
