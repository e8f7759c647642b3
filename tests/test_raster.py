"""Raster heat-tile rendering (operators/raster.py): tile bytes verified
byte-for-byte against an independent pandas+math re-rendering, PNG decoded
back with the repo's own decoder, partitioning invariance."""

import math

import numpy as np
import pytest

from jimmy_spark.codecs import png
from jimmy_spark.operators import cells, raster


def _py_tile_xy(lat_e7: int, lon_e7: int, z: int):
    """Independent slippy-map formula (math module, not the Spark cols)."""
    n = 1 << z
    lon = lon_e7 / 1e7
    lat = lat_e7 / 1e7
    x = math.floor((lon + 180.0) / 360.0 * n)
    rad = math.radians(lat)
    y = math.floor((1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad)) / math.pi) / 2.0 * n)
    return min(max(x, 0), n - 1), min(max(y, 0), n - 1)


@pytest.fixture(scope="module")
def pts(spark, t2_dir):
    imgs = spark.read.parquet(f"{t2_dir}/images.parquet")
    return cells.with_georef(imgs.select("image_id", "phash")).select(
        "image_id", "lat_e7", "lon_e7"
    )


ZOOM = 8


def _expected_tiles(pdf):
    """{(z,x,y): (n_points, max_count, rgb array)} via the independent
    formula + the same published tone map."""
    buckets = {}
    for lat, lon in zip(pdf.lat_e7, pdf.lon_e7):
        tx, ty = _py_tile_xy(lat, lon, ZOOM)
        fx, fy = _py_tile_xy(lat, lon, ZOOM + 8)
        px, py = fx - tx * 256, fy - ty * 256
        buckets.setdefault((tx, ty), {}).setdefault((px, py), 0)
        buckets[(tx, ty)][(px, py)] += 1
    out = {}
    for (tx, ty), pix in buckets.items():
        grid = np.zeros((256, 256), dtype=np.int64)
        for (px, py), c in pix.items():
            grid[py, px] = c
        out[(ZOOM, tx, ty)] = (int(grid.sum()), int(grid.max()),
                               raster.tone_map(grid, int(grid.max())))
    return out


def test_tiles_match_independent_render(spark, pts):
    got = {
        (r.z, r.x, r.y): r
        for r in raster.render_heat_tiles(pts, zoom=ZOOM).collect()
    }
    exp = _expected_tiles(pts.toPandas())
    assert set(got) == set(exp)
    for key, (n, mx, rgb) in exp.items():
        r = got[key]
        assert (r.n_points, r.max_count) == (n, mx)
        decoded = png.decode(bytes(r.png))
        assert decoded.shape == (256, 256, 3)
        assert np.array_equal(decoded, rgb), key
    # every input point landed in exactly one tile
    assert sum(r.n_points for r in got.values()) == pts.count()


def test_render_partitioning_invariant(spark, pts):
    a = {(r.z, r.x, r.y): bytes(r.png)
         for r in raster.render_heat_tiles(pts.repartition(1), zoom=ZOOM).collect()}
    b = {(r.z, r.x, r.y): bytes(r.png)
         for r in raster.render_heat_tiles(pts.repartition(17), zoom=ZOOM).collect()}
    assert a == b


def test_tone_map_bounds():
    g = np.zeros((256, 256), dtype=np.int64)
    g[0, 0] = 1
    g[1, 1] = 100
    rgb = raster.tone_map(g, 100)
    assert rgb[0, 0, 0] == 64 + 191 // 100  # floor ramp
    assert rgb[1, 1, 0] == 255
    assert rgb[2, 2].tolist() == [0, 0, 0]  # empty stays black


class TestHeatPyramid:
    def test_pyramid_levels_byte_equal_single_zoom(self, spark, pts):
        """Every pyramid level's tile bytes == the per-zoom renderer's
        (which test_tiles_match_independent_render pins to the
        independent re-render)."""
        got = {
            (r.z, r.x, r.y): (r.n_points, r.max_count, bytes(r.png))
            for r in raster.render_heat_pyramid(pts, z_max=6, z_min=3).collect()
        }
        total = None
        for z in range(3, 7):
            exp = {
                (r.z, r.x, r.y): (r.n_points, r.max_count, bytes(r.png))
                for r in raster.render_heat_tiles(pts, zoom=z).collect()
            }
            lvl = {k: v for k, v in got.items() if k[0] == z}
            assert lvl == exp, f"zoom {z}"
            n = sum(v[0] for v in lvl.values())
            if total is None:
                total = n
            assert n == total  # every level conserves the point count
