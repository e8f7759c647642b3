"""Operator-level tests: cells (both execution paths), decode isolation,
PIP (two Spark strategies + DuckDB oracle, exact set equality)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from jimmy_spark.functions import georef, hexgrid, s2
from jimmy_spark.operators import cells, decode, pip


@pytest.fixture(scope="module")
def images(spark, t1_dir):
    return spark.read.parquet(f"{t1_dir}/images.parquet")


@pytest.fixture(scope="module")
def points(spark, images):
    return cells.with_georef(images.select("image_id", "phash")).cache()


class TestCells:
    def test_hex_udf_vs_expr_vs_numpy(self, points):
        pdf = points.toPandas().sort_values("image_id").reset_index(drop=True)
        lat = pdf["lat_e7"].to_numpy(np.int64)
        lon = pdf["lon_e7"].to_numpy(np.int64)
        udf_df = (
            cells.with_hex_cells(points, use_arrow_udf=True)
            .toPandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        expr_df = (
            cells.with_hex_cells(points, use_arrow_udf=False)
            .toPandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        for res in hexgrid.RESOLUTIONS:
            expected = hexgrid.encode(lat, lon, res)
            np.testing.assert_array_equal(udf_df[f"hex_r{res}"].to_numpy(), expected)
            np.testing.assert_array_equal(expr_df[f"hex_r{res}"].to_numpy(), expected)

    def test_s2_udf_vs_numpy(self, points):
        got = (
            cells.with_s2_cells(points)
            .toPandas()
            .sort_values("image_id")
            .reset_index(drop=True)
        )
        lat = got["lat_e7"].to_numpy(np.int64)
        lon = got["lon_e7"].to_numpy(np.int64)
        for lvl in (12, 14, 16):
            np.testing.assert_array_equal(
                got[f"s2_l{lvl}"].to_numpy(), s2.encode(lat, lon, lvl)
            )

    def test_expr_plan_stays_jvm(self, points):
        """The expression path must not contain a Python worker stage."""
        plan = (
            cells.with_hex_cells(points, use_arrow_udf=False)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


class TestDecode:
    def test_all_ok_on_clean_data(self, spark, images):
        out = decode.decode_stage(images).cache()
        n = images.count()
        assert out.count() == n
        assert out.filter("ok").count() == n
        row = out.filter("image_id = 'img_000000000000'").first()
        assert row.dec_w == row.w and row.dec_h == row.h
        assert row.px_checksum != 0

    def test_error_isolation(self, spark, t2err_dir):
        imgs = spark.read.parquet(f"{t2err_dir}/images.parquet")
        out = decode.decode_stage(imgs).cache()
        bad = out.filter(~F.col("ok"))
        n_bad = bad.count()
        assert n_bad > 0  # corrupt fixtures exist
        assert out.count() == imgs.count()  # nothing dropped, job survived
        assert bad.filter(F.col("error").isNull()).count() == 0
        # corrupt rows are exactly the planted ones (i % 50 in {3, 5})
        ids = sorted(r.image_id for r in bad.collect())
        planted = sorted(
            f"img_{i:012d}" for i in range(400) if i % 50 in (3, 5)
        )
        assert ids == planted

    def test_checksums_deterministic_across_runs(self, spark, images):
        a = decode.decode_stage(images).select("image_id", "px_checksum")
        b = decode.decode_stage(images.repartition(7)).select(
            "image_id", "px_checksum"
        )
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


class TestPIP:
    @pytest.fixture(scope="class")
    def poly_pdf(self, t1_dir):
        return pq.read_table(f"{t1_dir}/polygons.parquet").to_pandas()

    @pytest.fixture(scope="class")
    def expected_pairs(self, points, t1_dir):
        pts = points.select("image_id", "lat_e7", "lon_e7").toPandas()
        duckdb.register("pts_reg", pts)
        sql = pip.duckdb_pip_sql(
            "SELECT image_id, lat_e7, lon_e7 FROM pts_reg",
            f"{t1_dir}/polygons.parquet",
        )
        return {
            (r[0], r[1]) for r in duckdb.sql(sql).fetchall()
        }

    def test_rtree_matches_oracle(self, points, poly_pdf, expected_pairs):
        got = {
            (r.image_id, r.polygon_id)
            for r in pip.pip_join_rtree(points, poly_pdf).collect()
        }
        assert got == expected_pairs
        assert len(expected_pairs) > 0  # hot-center polygons guarantee matches

    def test_broadcast_matches_oracle(self, spark, points, t1_dir, expected_pairs):
        polys = spark.read.parquet(f"{t1_dir}/polygons.parquet")
        got = {
            (r.image_id, r.polygon_id)
            for r in pip.pip_join_broadcast(points, polys).collect()
        }
        assert got == expected_pairs

    def test_on_edge_is_inside(self, spark, poly_pdf):
        """Corner + edge midpoint of the grid-aligned rectangle count inside."""
        rect = poly_pdf[poly_pdf["polygon_id"] == "poly_0003"].iloc[0]
        lat0, lon0 = rect["min_lat"], rect["min_lon"]
        lat1, lon1 = rect["max_lat"], rect["max_lon"]
        probes = pd.DataFrame(
            {
                "image_id": ["corner", "edge_mid", "center", "outside"],
                "lat_e7": [lat0, lat0, (lat0 + lat1) // 2, lat0 - 1],
                "lon_e7": [lon0, (lon0 + lon1) // 2, (lon0 + lon1) // 2, lon0],
            }
        )
        sdf = spark.createDataFrame(probes)
        got = {
            (r.image_id, r.polygon_id)
            for r in pip.pip_join_rtree(sdf, poly_pdf).collect()
            if r.polygon_id == "poly_0003"
        }
        assert ("corner", "poly_0003") in got
        assert ("edge_mid", "poly_0003") in got
        assert ("center", "poly_0003") in got
        assert ("outside", "poly_0003") not in got

    def test_empty_polygon_matches_nothing(self, points, poly_pdf, expected_pairs):
        assert not any(p == "poly_0004" for _, p in expected_pairs)

    @pytest.mark.parametrize("grid", [50_000, 250_000, 1_000_000])
    def test_cells_matches_oracle_grid_invariant(
        self, spark, points, t1_dir, expected_pairs, grid
    ):
        """Shuffled cell-grid strategy == oracle at every grid width: the
        grid only shapes the physical plan, never the row set."""
        polys = spark.read.parquet(f"{t1_dir}/polygons.parquet")
        got = {
            (r.image_id, r.polygon_id)
            for r in pip.pip_join_cells(points, polys, grid_e7=grid).collect()
        }
        assert got == expected_pairs

    def test_cells_exactly_once(self, spark, points, t1_dir):
        """No distinct in the plan, so prove no duplicate pairs are born."""
        polys = spark.read.parquet(f"{t1_dir}/polygons.parquet")
        out = pip.pip_join_cells(points, polys, grid_e7=100_000)
        dup = out.groupBy("image_id", "polygon_id").count().filter("count > 1")
        assert dup.count() == 0

    def test_cells_on_edge_is_inside(self, spark, t1_dir, poly_pdf):
        """Tie-rule probes through the cell-join path (grid chosen so the
        rectangle spans several cells and FULL cells exist inside it)."""
        rect = poly_pdf[poly_pdf["polygon_id"] == "poly_0003"].iloc[0]
        lat0, lon0 = rect["min_lat"], rect["min_lon"]
        lat1, lon1 = rect["max_lat"], rect["max_lon"]
        probes = pd.DataFrame(
            {
                "image_id": ["corner", "edge_mid", "center", "outside"],
                "lat_e7": [lat0, lat0, (lat0 + lat1) // 2, lat0 - 1],
                "lon_e7": [lon0, (lon0 + lon1) // 2, (lon0 + lon1) // 2, lon0],
            }
        )
        polys = spark.read.parquet(f"{t1_dir}/polygons.parquet")
        got = {
            (r.image_id, r.polygon_id)
            for r in pip.pip_join_cells(
                spark.createDataFrame(probes), polys, grid_e7=20_000
            ).collect()
            if r.polygon_id == "poly_0003"
        }
        assert got == {
            ("corner", "poly_0003"),
            ("edge_mid", "poly_0003"),
            ("center", "poly_0003"),
        }

    def test_cover_classification(self, poly_pdf):
        """FULL cells carry no ring bytes; every FULL cell's interior
        sample points are genuinely inside; outside-bbox corner cells of a
        concave ring are dropped before the shuffle."""
        from jimmy_spark.functions.raycast import inside_ring
        from jimmy_spark.operators.pip import _cover_cells

        grid = 20_000
        one = poly_pdf[poly_pdf["polygon_id"] == "poly_0003"]
        cov = _cover_cells(one, grid)
        full = cov[cov["ring_x"].isna()]
        boundary = cov[~cov["ring_x"].isna()]
        assert len(full) > 0 and len(boundary) > 0
        rect = one.iloc[0]
        rx = np.array([v["lon_e7"] for v in rect["ring"]], dtype=np.int64)
        ry = np.array([v["lat_e7"] for v in rect["ring"]], dtype=np.int64)
        for row in full.itertuples():
            # all four corners + center of a FULL cell must be inside
            xs = np.array(
                [row.gx * grid, (row.gx + 1) * grid, row.gx * grid,
                 (row.gx + 1) * grid, row.gx * grid + grid // 2],
                dtype=np.int64,
            )
            ys = np.array(
                [row.gy * grid, row.gy * grid, (row.gy + 1) * grid,
                 (row.gy + 1) * grid, row.gy * grid + grid // 2],
                dtype=np.int64,
            )
            assert inside_ring(xs, ys, rx, ry).all()
        # concave star ring: bbox-corner cells fully outside are dropped
        star = poly_pdf[poly_pdf["polygon_id"] == "poly_0001"]
        cov_star = _cover_cells(star, 10_000)
        srow = star.iloc[0]
        n_bbox = (
            (srow["max_lon"] // 10_000 - srow["min_lon"] // 10_000 + 1)
            * (srow["max_lat"] // 10_000 - srow["min_lat"] // 10_000 + 1)
        )
        assert len(cov_star) < n_bbox


class TestTilePyramid:
    def test_pyramid_equals_per_zoom_counts(self, spark, t2_dir):
        """One-scan datacube rollup == naive per-zoom groupBys, exactly —
        incl. the skewed hot cells (t2 skew_frac=0.3)."""
        from jimmy_spark.functions import tiles
        from jimmy_spark.operators import cells, tiling

        imgs = spark.read.parquet(f"{t2_dir}/images.parquet")
        pts = cells.with_georef(imgs.select("image_id", "phash"))
        got = {
            (r.z, r.x, r.y): r.cnt
            for r in tiling.pyramid_counts(pts, zooms=(8, 12, 16)).collect()
        }
        exp = {}
        for z in (8, 12, 16):
            lvl = pts.select(
                tiles.x_col(F.col("lon_e7"), z).alias("x"),
                tiles.y_col(F.col("lat_e7"), z).alias("y"),
            )
            for r in tiling.plain_counts(lvl, ["x", "y"]).collect():
                exp[(z, r.x, r.y)] = r.cnt
        assert got == exp
        # totals conserved per level
        n = pts.count()
        for z in (8, 12, 16):
            assert sum(c for (zz, _, _), c in got.items() if zz == z) == n

    def test_pyramid_single_scan_plan(self, spark, t2_dir):
        """The points table is scanned ONCE: exactly one parquet scan node
        in the whole multi-zoom plan (the naive form has one per zoom)."""
        from jimmy_spark.operators import cells, tiling

        imgs = spark.read.parquet(f"{t2_dir}/images.parquet")
        pts = cells.with_georef(imgs.select("image_id", "phash"))
        df = tiling.pyramid_counts(pts, zooms=(8, 12, 16))
        df.count()  # materializes the persisted finest-level frame
        plan = df._jdf.queryExecution().executedPlan().toString()
        # every union branch reads the persisted finest-level counts
        # (InMemoryTableScan), so the parquet source is materialized once;
        # the raw FileScan string also appears inside each cached-plan
        # printout, so count the cache reads, not the scan text
        assert plan.count("InMemoryTableScan") >= 2, plan
