"""Unit tests for georef / hexgrid / s2 / tiles kernels, including the
NumPy <-> DuckDB float-determinism contracts the driver oracle relies on."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from jimmy_spark.functions import georef, hexgrid, s2, tiles


@pytest.fixture(scope="module")
def coords():
    rng = np.random.default_rng(7)
    phash = rng.integers(-(2**63), 2**63, 5000, dtype=np.int64)
    lat, lon = georef.latlon_e7_np(phash)
    return phash, lat, lon


class TestGeoref:
    def test_bounds(self, coords):
        _, lat, lon = coords
        assert lat.min() >= -georef.LAT_MAX_E7 and lat.max() <= georef.LAT_MAX_E7
        assert lon.min() >= -georef.LON_MAX_E7 and lon.max() <= georef.LON_MAX_E7

    def test_duckdb_parity(self, coords):
        phash, lat, lon = coords
        pdf = pd.DataFrame({"phash": phash})
        lat_sql, lon_sql = georef.duckdb_lat_lon_sql("phash")
        got = duckdb.sql(
            f"SELECT {lat_sql} AS lat, {lon_sql} AS lon FROM pdf"
        ).df()
        np.testing.assert_array_equal(got["lat"].to_numpy(), lat)
        np.testing.assert_array_equal(got["lon"].to_numpy(), lon)

    def test_invert_close(self):
        lat = np.array([407128000, -330000000], dtype=np.int64)
        lon = np.array([-740060000, 1511000000], dtype=np.int64)
        ph = georef.invert_latlon_e7(lat, lon)
        lat2, lon2 = georef.latlon_e7_np(ph)
        assert np.abs(lat2 - lat).max() <= 2
        assert np.abs(lon2 - lon).max() <= 2


class TestHexgrid:
    def test_pack_unpack(self, coords):
        _, lat, lon = coords
        for res in hexgrid.RESOLUTIONS:
            cell = hexgrid.encode(lat, lon, res)
            r2, q, r = hexgrid.unpack(cell)
            assert (r2 == res).all()
            np.testing.assert_array_equal(hexgrid.pack(res, q, r), cell)

    def test_center_distance(self, coords):
        """Every point is within circumradius of its cell center."""
        _, lat, lon = coords
        for res in hexgrid.RESOLUTIONS:
            cell = hexgrid.encode(lat, lon, res)
            cy, cx = hexgrid.center(cell)
            d = np.sqrt((cy - lat) ** 2 + (cx - lon) ** 2)
            assert d.max() <= hexgrid.SIZES[res] * 1.0000001

    def test_duckdb_parity(self, coords):
        _, lat, lon = coords
        pdf = pd.DataFrame({"id": np.arange(len(lat)), "lat": lat, "lon": lon})
        q = hexgrid.duckdb_hex_query("SELECT * FROM pdf", "id", "lat", "lon")
        got = duckdb.sql(q + " ORDER BY id").df()
        for res in hexgrid.RESOLUTIONS:
            np.testing.assert_array_equal(
                got[f"hex_r{res}"].to_numpy(), hexgrid.encode(lat, lon, res)
            )

    def test_disk_sizes(self):
        for radius in (0, 1, 2, 5):
            assert len(hexgrid.disk_offsets(radius)) == 3 * radius * (radius + 1) + 1

    def test_disk_contains_neighbors(self):
        cell = int(hexgrid.encode(np.array([407128000]), np.array([-740060000]), 8)[0])
        d1 = set(hexgrid.disk(cell, 1).tolist())
        assert cell in d1 and len(d1) == 7

    def test_min_center_distance_bound(self):
        """Centers of cells at hex distance D are >= 1.5*s*D apart."""
        res = 8
        s = hexgrid.SIZES[res]
        offs = hexgrid.disk_offsets(6)
        q, r = offs[:, 0], offs[:, 1]
        d = hexgrid.hex_distance(q, r, 0, 0)
        x = s * (np.sqrt(3.0) * (q + r * 0.5))
        y = s * 1.5 * r
        eu = np.sqrt(x * x + y * y)
        m = d > 0
        assert (eu[m] >= 1.5 * s * d[m] - 1e-6).all()

    @staticmethod
    def _polyfill_lattice(rx, ry, res):
        """Independent polyfill: enumerate candidate cells by ENCODING a
        dense point lattice over the bbox (spacing < inradius, so every
        cell whose center could be in the bbox is hit), then apply the
        same rounded-center ray-cast. Shares no axial-range arithmetic
        with hexgrid.polyfill."""
        from jimmy_spark.functions.raycast import inside_ring

        s = hexgrid.SIZES[res]
        step = s * np.sqrt(3.0) / 4.0
        xs = np.arange(rx.min() - 2 * s, rx.max() + 2 * s, step)
        ys = np.arange(ry.min() - 2 * s, ry.max() + 2 * s, step)
        gx, gy = np.meshgrid(xs, ys)
        cells = np.unique(
            hexgrid.encode(gy.ravel().astype(np.int64),
                           gx.ravel().astype(np.int64), res)
        )
        cy, cx = hexgrid.center(cells)
        px = np.floor(cx + 0.5).astype(np.int64)
        py = np.floor(cy + 0.5).astype(np.int64)
        return np.sort(cells[inside_ring(px, py, rx, ry)])

    @pytest.mark.parametrize("poly_id", ["poly_0000", "poly_0001", "poly_0003"])
    @pytest.mark.parametrize("res", [8, 9])
    def test_polyfill_matches_lattice_enumeration(self, t1_dir, poly_id, res):
        """Axial-range enumeration == independent lattice enumeration on
        convex, concave-star and rectangle rings."""
        import pyarrow.parquet as pq

        polys = pq.read_table(f"{t1_dir}/polygons.parquet").to_pandas()
        p = polys[polys["polygon_id"] == poly_id].iloc[0]
        rx = np.array([v["lon_e7"] for v in p["ring"]], dtype=np.int64)
        ry = np.array([v["lat_e7"] for v in p["ring"]], dtype=np.int64)
        got = hexgrid.polyfill(rx, ry, res)
        exp = self._polyfill_lattice(rx, ry, res)
        np.testing.assert_array_equal(got, exp)
        assert len(got) > 0

    def test_polyfill_roundtrip_and_empty(self, t1_dir):
        """Every polyfill cell's rounded center re-encodes to itself, and
        a ring smaller than one cell can legitimately fill zero cells."""
        import pyarrow.parquet as pq

        polys = pq.read_table(f"{t1_dir}/polygons.parquet").to_pandas()
        p = polys[polys["polygon_id"] == "poly_0000"].iloc[0]
        rx = np.array([v["lon_e7"] for v in p["ring"]], dtype=np.int64)
        ry = np.array([v["lat_e7"] for v in p["ring"]], dtype=np.int64)
        cells = hexgrid.polyfill(rx, ry, 9)
        cy, cx = hexgrid.center(cells)
        px = np.floor(cx + 0.5).astype(np.int64)
        py = np.floor(cy + 0.5).astype(np.int64)
        np.testing.assert_array_equal(hexgrid.encode(py, px, 9), cells)
        # tiny triangle far from any res-7 center: empty is valid, no crash
        tiny = hexgrid.polyfill(
            np.array([3, 6, 6], dtype=np.int64),
            np.array([3, 3, 6], dtype=np.int64),
            7,
        )
        assert tiny.dtype == np.int64


# ---------------------------------------------------------------------------
# Independent S2 twin: a scalar, per-point encoder derived from FIRST
# PRINCIPLES of the published S2 scheme — the Hilbert child order is
# reconstructed at runtime from the canonical U-order [(0,0),(0,1),(1,1),
# (1,0)], the swap/invert orientation transforms, and the child orientation
# deltas [swap, 0, 0, swap|invert]; each level searches that order instead
# of using the production module's precomputed 4-bit lookup tables
# (functions/s2.py:_init_lookup). Shares no Hilbert code with production —
# agreement on random points is the anti-circularity check the golden twin
# cannot provide.

_SB_SWAP, _SB_INVERT = 1, 2
_SB_BASE = [(0, 0), (0, 1), (1, 1), (1, 0)]
_SB_DELTA = [_SB_SWAP, 0, 0, _SB_SWAP | _SB_INVERT]


def _sb_child_ij(orient: int, pos: int) -> tuple[int, int]:
    i, j = _SB_BASE[pos]
    if orient & _SB_SWAP:
        i, j = j, i
    if orient & _SB_INVERT:
        i, j = 1 - i, 1 - j
    return i, j


def _s2_leaf_independent(lat_e7: int, lon_e7: int) -> int:
    import math

    lat = lat_e7 * math.pi / 180.0 / 1e7
    lon = lon_e7 * math.pi / 180.0 / 1e7
    x = math.cos(lat) * math.cos(lon)
    y = math.cos(lat) * math.sin(lon)
    z = math.sin(lat)
    ax, ay, az = abs(x), abs(y), abs(z)
    face = (0 if ax >= az else 2) if ax >= ay else (1 if ay >= az else 2)
    comp = (x, y, z)[face]
    if comp < 0:
        face += 3
    u, v = {
        0: (y / x, z / x),
        1: (-x / y, z / y),
        2: (-x / z, -y / z),
        3: (z / x, y / x),
        4: (z / y, -x / y),
        5: (-y / z, -x / z),
    }[face]

    def st(w: float) -> float:
        return 0.5 * math.sqrt(1.0 + 3.0 * w) if w >= 0 else 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * w)

    def ij(w: float) -> int:
        return min(max(int(w * (1 << 30)), 0), (1 << 30) - 1)

    i, j = ij(st(u)), ij(st(v))
    orient = face & _SB_SWAP
    pos = 0
    for k in range(29, -1, -1):
        bits = ((i >> k) & 1, (j >> k) & 1)
        p = next(p for p in range(4) if _sb_child_ij(orient, p) == bits)
        pos = (pos << 2) | p
        orient ^= _SB_DELTA[p]
    return (face << 61) | (pos << 1) | 1


def _s2_parent_independent(leaf: int, level: int) -> int:
    lsb = 1 << (2 * (30 - level))
    return (leaf & ~(lsb - 1)) | lsb


class TestS2:
    def test_known_values(self):
        """Canonical S2 anchors: face centers and the NYC 89c2... prefix."""
        lat = np.array([0, 407128000], dtype=np.int64)
        lon = np.array([0, -740060000], dtype=np.int64)
        leaf = s2.encode(lat, lon, 30).view(np.uint64)
        assert leaf[0] == np.uint64(0x1000000000000001)  # center of face 0
        assert (leaf[1] >> np.uint64(48)) == np.uint64(0x89C2)  # NYC S2 prefix

    def test_all_face_center_anchors(self):
        """The center point of every cube face encodes to the structural
        leaf id (face << 61) | (1 << 60) | 1 — the published S2 id layout
        (3 face bits, Hilbert position, trailing lsb)."""
        centers = [
            (0, 0), (0, 900000000), (900000000, 0),
            (0, 1800000000), (0, -900000000), (-900000000, 0),
        ]
        lat = np.array([c[0] for c in centers], dtype=np.int64)
        lon = np.array([c[1] for c in centers], dtype=np.int64)
        leaf = s2.encode(lat, lon, 30).view(np.uint64)
        for f in range(6):
            if f == 3:
                # (0, 180) is not exactly representable on face 3's center:
                # sin(pi) ~ 1.2e-16 shifts the point one leaf off center
                # (the real s2geometry lat/lng path rounds identically), so
                # the exact anchor only holds at the face level
                continue
            want = (np.uint64(f) << np.uint64(61)) | np.uint64(1 << 60) | np.uint64(1)
            assert leaf[f] == want, f"face {f}"
        # level-0 anchor holds exactly for ALL six faces: the face cell id
        # is (face << 61) | (1 << 60) in the published layout
        lvl0 = s2.encode(lat, lon, 0).view(np.uint64)
        for f in range(6):
            assert lvl0[f] == (np.uint64(f) << np.uint64(61)) | np.uint64(1 << 60)

    def test_matches_independent_first_principles_encoder(self, coords):
        """Production (LUT-based, vectorized) vs the scalar from-first-
        principles twin above, on 1500 seeded random points at leaf and
        at the engine's three levels."""
        _, lat, lon = coords
        lat, lon = lat[:1500], lon[:1500]
        got_leaf = s2.encode(lat, lon, 30).view(np.uint64)
        for n in range(1500):
            want = _s2_leaf_independent(int(lat[n]), int(lon[n]))
            assert int(got_leaf[n]) == want, (lat[n], lon[n])
        for level in (12, 14, 16):
            got = s2.encode(lat, lon, level).view(np.uint64)
            for n in range(0, 1500, 7):
                want = _s2_parent_independent(
                    _s2_leaf_independent(int(lat[n]), int(lon[n])), level
                )
                assert int(got[n]) == want

    def test_levels_and_hierarchy(self, coords):
        _, lat, lon = coords
        c12 = s2.encode(lat, lon, 12)
        c14 = s2.encode(lat, lon, 14)
        c16 = s2.encode(lat, lon, 16)
        assert (s2.level_of(c12) == 12).all()
        assert (s2.level_of(c16) == 16).all()
        np.testing.assert_array_equal(s2.parent(c16, 12), c12)
        np.testing.assert_array_equal(s2.parent(c14, 12), c12)

    def test_face_distribution(self, coords):
        """Uniform-ish sphere coverage should hit all 6 faces."""
        _, lat, lon = coords
        faces = s2.encode(lat, lon, 12).view(np.uint64) >> np.uint64(61)
        assert set(np.unique(faces).tolist()) == {0, 1, 2, 3, 4, 5}


class TestTiles:
    def test_known_tiles(self):
        # Public slippy-map example: lat=51.5074 lon=-0.1278 z=12 -> x=2046, y=1362
        x, y = tiles.xy_np(np.array([515074000]), np.array([-1278000]), 12)
        assert (int(x[0]), int(y[0])) == (2046, 1362)
        # Origin at z=0 and z=1
        x, y = tiles.xy_np(np.array([0]), np.array([0]), 0)
        assert (int(x[0]), int(y[0])) == (0, 0)
        x, y = tiles.xy_np(np.array([1]), np.array([1]), 1)
        assert (int(x[0]), int(y[0])) == (1, 0)

    def test_duckdb_parity(self, coords):
        _, lat, lon = coords
        pdf = pd.DataFrame({"lat": lat, "lon": lon})
        for z in tiles.ZOOMS:
            xs, ys = tiles.duckdb_xy_sql("lat", "lon", z)
            got = duckdb.sql(f"SELECT {xs} AS x, {ys} AS y FROM pdf").df()
            ex, ey = tiles.xy_np(lat, lon, z)
            np.testing.assert_array_equal(got["x"].to_numpy(), ex)
            np.testing.assert_array_equal(got["y"].to_numpy(), ey)

    def test_range(self, coords):
        _, lat, lon = coords
        for z in tiles.ZOOMS:
            x, y = tiles.xy_np(lat, lon, z)
            assert x.min() >= 0 and x.max() < (1 << z)
            assert y.min() >= 0 and y.max() < (1 << z)
