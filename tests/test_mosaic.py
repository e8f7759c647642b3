"""Image mosaic tile tests (operators/raster.py render_mosaic_tiles):
tile bytes verified byte-for-byte against an independent per-pixel
re-render (separate slippy formula, separate thumbnail/blit loops),
cap selection, edge clipping, corrupt-image skip, partitioning
invariance."""

import math

import numpy as np
import pytest

from jimmy_spark.codecs import decode_image, png
from jimmy_spark.operators import cells, raster


def _py_tile_xy(lat_e7: int, lon_e7: int, z: int):
    n = 1 << z
    lon = lon_e7 / 1e7
    lat = lat_e7 / 1e7
    x = math.floor((lon + 180.0) / 360.0 * n)
    rad = math.radians(lat)
    y = math.floor((1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad)) / math.pi) / 2.0 * n)
    return min(max(x, 0), n - 1), min(max(y, 0), n - 1)


def _py_thumb(arr, s):
    """Per-pixel loop twin of thumb_nn (independent formulation)."""
    h, w = arr.shape[:2]
    out = np.zeros((s, s, 3), dtype=np.uint8)
    for i in range(s):
        for j in range(s):
            out[i, j] = arr[(i * h) // s, (j * w) // s]
    return out


def _expected_mosaics(pdf, zoom, cap):
    """{(x, y): (n_imgs, n_drawn, canvas)} via independent per-pixel
    placement (no numpy slicing tricks shared with the engine)."""
    buckets = {}
    for row in pdf.itertuples():
        tx, ty = _py_tile_xy(row.lat_e7, row.lon_e7, zoom)
        fx, fy = _py_tile_xy(row.lat_e7, row.lon_e7, zoom + 8)
        buckets.setdefault((tx, ty), []).append(
            (row.image_id, row.bytes, row.fmt, fx - tx * 256, fy - ty * 256)
        )
    out = {}
    s = raster.THUMB_PX
    half = s // 2
    for key, rows in buckets.items():
        rows.sort(key=lambda r: r[0])
        canvas = np.zeros((256, 256, 3), dtype=np.uint8)
        drawn = 0
        for _iid, blob, fmt, px, py in rows[:cap]:
            try:
                arr = decode_image(blob, fmt)
            except ValueError:
                continue
            th = _py_thumb(arr, s)
            any_px = False
            for i in range(s):
                for j in range(s):
                    r, c = py - half + i, px - half + j
                    if 0 <= r < 256 and 0 <= c < 256:
                        canvas[r, c] = th[i, j]
                        any_px = True
            if any_px:
                drawn += 1
        out[key] = (len(rows), drawn, canvas)
    return out


ZOOM = 4
CAP = 3


@pytest.fixture(scope="module")
def imgs(spark, t2_dir):
    df = spark.read.parquet(f"{t2_dir}/images.parquet")
    return cells.with_georef(df).select(
        "image_id", "bytes", "fmt", "lat_e7", "lon_e7"
    )


class TestMosaicTiles:
    def test_byte_equal_independent_render(self, spark, imgs):
        got = {
            (r.x, r.y): r
            for r in raster.render_mosaic_tiles(imgs, zoom=ZOOM, cap=CAP).collect()
        }
        pdf = imgs.toPandas()
        exp = _expected_mosaics(pdf, ZOOM, CAP)
        assert set(got) == set(exp)
        multi = 0
        for key, (n_imgs, n_drawn, canvas) in exp.items():
            r = got[key]
            assert r.z == ZOOM
            assert r.n_imgs == n_imgs, key
            assert r.n_drawn == n_drawn, key
            assert bytes(r.png) == png.encode(canvas), key
            if n_imgs > CAP:
                multi += 1
        assert multi > 0  # the cap path actually ran somewhere

    def test_decoded_roundtrip_nonblack(self, spark, imgs):
        rows = raster.render_mosaic_tiles(imgs, zoom=ZOOM, cap=CAP).collect()
        painted = 0
        for r in rows:
            arr = png.decode(bytes(r.png))
            assert arr.shape == (256, 256, 3)
            if arr.any():
                painted += 1
        assert painted > 0

    def test_corrupt_images_skipped(self, spark, t2err_dir):
        df = spark.read.parquet(f"{t2err_dir}/images.parquet")
        pts = cells.with_georef(df).select(
            "image_id", "bytes", "fmt", "lat_e7", "lon_e7"
        )
        rows = raster.render_mosaic_tiles(pts, zoom=2, cap=1000).collect()
        n_imgs = sum(r.n_imgs for r in rows)
        n_drawn = sum(r.n_drawn for r in rows)
        assert n_imgs == df.count()
        assert n_drawn < n_imgs  # corrupt rows skipped...
        assert n_drawn > 0  # ...but good rows still drew

    def test_partitioning_invariance(self, spark, imgs):
        a = {
            (r.x, r.y): bytes(r.png)
            for r in raster.render_mosaic_tiles(
                imgs.repartition(1), zoom=ZOOM, cap=CAP
            ).collect()
        }
        b = {
            (r.x, r.y): bytes(r.png)
            for r in raster.render_mosaic_tiles(
                imgs.repartition(23), zoom=ZOOM, cap=CAP
            ).collect()
        }
        assert a == b
