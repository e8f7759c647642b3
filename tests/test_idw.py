"""IDW raster interpolation tests (operators/raster.py idw_raster):
fully integer semantics — Spark == DuckDB twin == pure-Python reference
exactly, plus locality/monotonicity sanity and partitioning invariance."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from jimmy_spark.functions import hexgrid
from jimmy_spark.operators import raster

RES = 8
K = 2


def py_idw(pdf: pd.DataFrame) -> dict[int, tuple[int, int, int | None]]:
    """Independent reference: numpy hex encode + disk offsets on unpacked
    (q, r) + lattice centers + Python big-int division."""
    cells_arr = hexgrid.encode(
        pdf["lat_e7"].to_numpy(np.int64), pdf["lon_e7"].to_numpy(np.int64), RES
    )
    acc: dict[int, list[int]] = {}
    offs = hexgrid.disk_offsets(K)
    for home, v, py, px in zip(
        cells_arr, pdf["v"], pdf["lat_e7"], pdf["lon_e7"]
    ):
        res_bits = int(home) >> 60
        q = ((int(home) >> 30) & ((1 << 30) - 1)) - (1 << 29)
        r = (int(home) & ((1 << 30) - 1)) - (1 << 29)
        for dq, dr in offs:
            cell = (
                (res_bits << 60)
                | ((q + int(dq) + (1 << 29)) << 30)
                | (r + int(dr) + (1 << 29))
            )
            clat, clon = hexgrid.center_lattice(np.asarray([cell], np.int64))
            d2 = (int(px) - int(clon[0])) ** 2 + (int(py) - int(clat[0])) ** 2
            w = raster.IDW_W0 // (raster.IDW_D0 + d2)
            st = acc.setdefault(cell, [0, 0, 0])
            st[0] += 1
            st[1] += w
            st[2] += w * int(v)
    return {
        c: (n, sw, (1000 * swv) // sw if sw > 0 else None)
        for c, (n, sw, swv) in acc.items()
    }


@pytest.fixture(scope="module")
def samples():
    rng = np.random.default_rng(21)
    n = 1500
    return pd.DataFrame(
        {
            "lat_e7": rng.integers(-200_000_000, 200_000_000, n),
            "lon_e7": rng.integers(-200_000_000, 200_000_000, n),
            "v": rng.integers(0, 5000, n),
        }
    ).astype("int64")


class TestIdw:
    def test_three_twins_exact(self, spark, samples):
        got = (
            raster.idw_raster(spark.createDataFrame(samples).repartition(7), res=RES, k=K)
            .toPandas().sort_values("cell").reset_index(drop=True)
        )
        ref = py_idw(samples)
        assert len(got) == len(ref)
        for cell, n, sw, val in zip(
            got["cell"], got["n_samples"], got["sum_w"], got["val_e3"]
        ):
            en, esw, eval_ = ref[int(cell)]
            assert (int(n), int(sw)) == (en, esw)
            assert (None if pd.isna(val) else int(val)) == eval_
        con = duckdb.connect()
        con.register("samples_in", samples)
        odf = (
            con.sql(
                raster.duckdb_idw_sql(
                    "SELECT lat_e7, lon_e7, v FROM samples_in", res=RES, k=K
                )
            )
            .df().sort_values("cell").reset_index(drop=True)
        )
        for c in ("cell", "n_samples", "sum_w", "val_e3"):
            assert got[c].astype("Int64").equals(odf[c].astype("Int64")), c

    def test_locality_constant_field(self, spark):
        # constant-valued samples -> every interpolated cell reads exactly
        # that constant (weights cancel; integer floor keeps it exact
        # because (1000 * c * sw) // sw == 1000 * c)
        rng = np.random.default_rng(5)
        pdf = pd.DataFrame(
            {
                "lat_e7": rng.integers(0, 50_000_000, 300),
                "lon_e7": rng.integers(0, 50_000_000, 300),
                "v": np.full(300, 42),
            }
        ).astype("int64")
        got = raster.idw_raster(spark.createDataFrame(pdf)).toPandas()
        assert (got["val_e3"] == 42_000).all()

    def test_near_sample_dominates(self, spark):
        # one big-valued sample at a cell center, one small far away: the
        # big sample's own cell must interpolate near the big value
        c = hexgrid.encode(np.asarray([10_000_000]), np.asarray([10_000_000]), RES)
        clat, clon = hexgrid.center_lattice(c)
        pdf = pd.DataFrame(
            {
                "lat_e7": [int(clat[0]), int(clat[0]) + 200_000],
                "lon_e7": [int(clon[0]), int(clon[0]) + 200_000],
                "v": [1000, 0],
            }
        ).astype("int64")
        got = raster.idw_raster(spark.createDataFrame(pdf)).toPandas()
        own = got[got["cell"] == int(c[0])]
        assert len(own) == 1
        assert int(own["val_e3"].iloc[0]) > 900_000  # ~the near value (1000e3)

    def test_partitioning_invariance(self, spark, samples):
        a = (
            raster.idw_raster(spark.createDataFrame(samples).repartition(1))
            .toPandas().sort_values("cell").reset_index(drop=True)
        )
        b = (
            raster.idw_raster(spark.createDataFrame(samples).repartition(31))
            .toPandas().sort_values("cell").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
