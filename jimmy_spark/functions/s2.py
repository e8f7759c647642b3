"""S2 cell IDs (levels 12-16), vectorized pure NumPy.

A faithful implementation of the public S2 geometry cell-id scheme
(s2geometry.io: lat/lon -> unit sphere XYZ -> cube face -> (u,v) ->
quadratic (s,t) -> 30-bit (i,j) -> Hilbert-curve position -> 64-bit id),
using the standard 4-bit lookup-table iteration. No ``s2sphere`` wheel
exists in this container (SURVEY §7.2), so this module is the build-time
fallback; IDs follow the real S2 bit layout (face(3) | Hilbert pos | 1-lsb).

Vectorization: all stages are NumPy array ops; the Hilbert stage is a fixed
8-iteration loop of table lookups over the whole batch (no per-row Python).
"""

from __future__ import annotations

import numpy as np

LOOKUP_BITS = 4
SWAP_MASK = 1
INVERT_MASK = 2
MAX_LEVEL = 30
POS_BITS = 2 * MAX_LEVEL + 1

# Canonical S2 traversal-order tables (public s2geometry constants).
POS_TO_IJ = np.array(
    [[0, 1, 3, 2], [0, 2, 3, 1], [3, 2, 0, 1], [3, 1, 0, 2]], dtype=np.int64
)
POS_TO_ORIENTATION = np.array(
    [SWAP_MASK, 0, 0, INVERT_MASK + SWAP_MASK], dtype=np.int64
)

_LOOKUP_POS = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.int64)
_LOOKUP_IJ = np.zeros(1 << (2 * LOOKUP_BITS + 2), dtype=np.int64)


def _init_lookup(level: int, i: int, j: int, orig_orientation: int, pos: int, orientation: int):
    if level == LOOKUP_BITS:
        ij = (i << LOOKUP_BITS) + j
        _LOOKUP_POS[(ij << 2) + orig_orientation] = (pos << 2) + orientation
        _LOOKUP_IJ[(pos << 2) + orig_orientation] = (ij << 2) + orientation
        return
    level += 1
    i <<= 1
    j <<= 1
    pos <<= 2
    r = POS_TO_IJ[orientation]
    for index in range(4):
        _init_lookup(
            level,
            i + (int(r[index]) >> 1),
            j + (int(r[index]) & 1),
            orig_orientation,
            pos + index,
            orientation ^ int(POS_TO_ORIENTATION[index]),
        )


for _o in range(4):
    _init_lookup(0, 0, 0, _o, 0, _o)


def xyz_from_latlon_e7(lat_e7: np.ndarray, lon_e7: np.ndarray):
    lat = lat_e7.astype(np.float64) * (np.pi / 180.0 / 1e7)
    lon = lon_e7.astype(np.float64) * (np.pi / 180.0 / 1e7)
    cos_lat = np.cos(lat)
    return cos_lat * np.cos(lon), cos_lat * np.sin(lon), np.sin(lat)


def face_uv_from_xyz(x: np.ndarray, y: np.ndarray, z: np.ndarray):
    ax, ay, az = np.abs(x), np.abs(y), np.abs(z)
    face = np.where(ax >= ay, np.where(ax >= az, 0, 2), np.where(ay >= az, 1, 2))
    comp = np.choose(face, [x, y, z])
    face = np.where(comp < 0, face + 3, face)
    # u/v per face (standard S2 table)
    u = np.empty_like(x)
    v = np.empty_like(x)
    for f, (ue, ve) in enumerate(
        [
            (lambda: y / x, lambda: z / x),
            (lambda: -x / y, lambda: z / y),
            (lambda: -x / z, lambda: -y / z),
            (lambda: z / x, lambda: y / x),
            (lambda: z / y, lambda: -x / y),
            (lambda: -y / z, lambda: -x / z),
        ]
    ):
        m = face == f
        if m.any():
            with np.errstate(divide="ignore", invalid="ignore"):
                u = np.where(m, ue(), u)
                v = np.where(m, ve(), v)
    return face.astype(np.int64), u, v


def st_from_uv(uv: np.ndarray) -> np.ndarray:
    """S2's quadratic projection."""
    with np.errstate(invalid="ignore"):  # unused np.where branch may sqrt(<0)
        return np.where(
            uv >= 0.0,
            0.5 * np.sqrt(1.0 + 3.0 * uv),
            1.0 - 0.5 * np.sqrt(1.0 - 3.0 * uv),
        )


def ij_from_st(st: np.ndarray) -> np.ndarray:
    return np.clip((st * (1 << MAX_LEVEL)).astype(np.int64), 0, (1 << MAX_LEVEL) - 1)


def cell_id_from_face_ij(face: np.ndarray, i: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Level-30 S2 cell id, vectorized Hilbert-position computation."""
    n = face.astype(np.uint64) << np.uint64(POS_BITS - 1)
    bits = (face & np.int64(SWAP_MASK)).astype(np.int64)
    mask = (1 << LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        bits += ((i >> (k * LOOKUP_BITS)) & mask) << (LOOKUP_BITS + 2)
        bits += ((j >> (k * LOOKUP_BITS)) & mask) << 2
        bits = _LOOKUP_POS[bits]
        n |= (bits >> np.int64(2)).astype(np.uint64) << np.uint64(k * 2 * LOOKUP_BITS)
        bits &= SWAP_MASK | INVERT_MASK
    return (n * np.uint64(2) + np.uint64(1)).view(np.int64)


def parent(cell_id: np.ndarray, level: int) -> np.ndarray:
    """Truncate a level-30 id to ``level`` (standard S2 lsb arithmetic)."""
    u = cell_id.view(np.uint64) if cell_id.dtype == np.int64 else cell_id
    new_lsb = np.uint64(1) << np.uint64(2 * (MAX_LEVEL - level))
    return ((u & ~(new_lsb - np.uint64(1))) | new_lsb).view(np.int64)


def encode(lat_e7: np.ndarray, lon_e7: np.ndarray, level: int) -> np.ndarray:
    """Fixed-point coords -> int64 S2 cell id at ``level``."""
    x, y, z = xyz_from_latlon_e7(lat_e7, lon_e7)
    face, u, v = face_uv_from_xyz(x, y, z)
    i = ij_from_st(st_from_uv(u))
    j = ij_from_st(st_from_uv(v))
    leaf = cell_id_from_face_ij(face, i, j)
    return parent(leaf, level)


def level_of(cell_id: np.ndarray) -> np.ndarray:
    """Level from lsb position (S2 invariant: lsb at bit 2*(30-level))."""
    u = cell_id.view(np.uint64)
    lsb = u & (~u + np.uint64(1))
    lvl = np.zeros(len(cell_id), dtype=np.int64)
    b = lsb.copy()
    while (b > np.uint64(1)).any():
        m = b > np.uint64(1)
        lvl[m] += 1
        b = np.where(m, b >> np.uint64(2), b)
    return MAX_LEVEL - lvl


def face_ij_from_cell_id(cell_id: np.ndarray):
    """Inverse Hilbert decode: cell id -> (face, i, j) of a leaf inside
    the cell (the standard ToFaceIJ iteration with the inverse lookup
    table). For a level-L id the trailing lsb bits decode to a leaf in
    the cell's interior; align with ``>> (30-L) << (30-L)`` for bounds."""
    u = cell_id.view(np.uint64)
    face = (u >> np.uint64(POS_BITS)).astype(np.int64)
    bits = (face & np.int64(SWAP_MASK)).astype(np.int64)
    i = np.zeros(len(face), dtype=np.int64)
    j = np.zeros(len(face), dtype=np.int64)
    mask4 = (1 << LOOKUP_BITS) - 1
    for k in range(7, -1, -1):
        # top chunk holds only 2 bits per axis (i,j are 30-bit): mask to
        # 4 pos bits or the face bits (id bits 61-63) leak into the lookup
        cmask = np.uint64(0xF if k == 7 else 0xFF)
        chunk = ((u >> np.uint64(k * 2 * LOOKUP_BITS + 1)) & cmask).astype(
            np.int64
        )
        bits = bits + (chunk << 2)
        bits = _LOOKUP_IJ[bits]
        i = i + ((bits >> (LOOKUP_BITS + 2)) << (k * LOOKUP_BITS))
        j = j + (((bits >> 2) & mask4) << (k * LOOKUP_BITS))
        bits = bits & (SWAP_MASK | INVERT_MASK)
    return face, i, j


def uv_from_st(st: np.ndarray) -> np.ndarray:
    """Inverse of ``st_from_uv`` (the quadratic projection)."""
    return np.where(
        st >= 0.5,
        (1.0 / 3.0) * (4.0 * st * st - 1.0),
        (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - st) * (1.0 - st)),
    )


def xyz_from_face_uv(face: np.ndarray, u: np.ndarray, v: np.ndarray):
    """Standard S2 face frame: unit-cube point for (face, u, v)."""
    one = np.ones_like(u)
    xs = [one, -u, -u, -one, v, v]
    ys = [u, one, -v, -v, -one, u]
    zs = [v, v, one, -u, -u, -one]
    x = np.choose(face, xs)
    y = np.choose(face, ys)
    z = np.choose(face, zs)
    return x, y, z


def center_latlon_e7(cell_id: np.ndarray):
    """cell id -> lattice-rounded (lat_e7, lon_e7) of the cell center
    (the center of its aligned ij block, exact ij arithmetic, then the
    inverse projections; the e7 rounding uses the grid's floor(v + 0.5)
    half-rule like hexgrid.center_lattice)."""
    lvl = level_of(cell_id)
    face, i, j = face_ij_from_cell_id(cell_id)
    s = (MAX_LEVEL - lvl).astype(np.int64)
    half = np.where(s > 0, np.int64(1) << np.maximum(s - 1, 0), 0)
    ic = ((i >> s) << s) + half
    jc = ((j >> s) << s) + half
    st_i = ic.astype(np.float64) / float(1 << MAX_LEVEL)
    st_j = jc.astype(np.float64) / float(1 << MAX_LEVEL)
    u = uv_from_st(st_i)
    v = uv_from_st(st_j)
    x, y, z = xyz_from_face_uv(face, u, v)
    lat = np.arctan2(z, np.hypot(x, y)) * (180.0 / np.pi)
    lon = np.arctan2(y, x) * (180.0 / np.pi)
    return (
        np.floor(lat * 1e7 + 0.5).astype(np.int64),
        np.floor(lon * 1e7 + 0.5).astype(np.int64),
    )


def children(cell_id: np.ndarray) -> np.ndarray:
    """(n, 4) int64: the four child ids one level down (standard lsb
    arithmetic: child_k = id - lsb + (2k + 1) * (lsb >> 2))."""
    u = cell_id.view(np.uint64)
    lsb = u & (~u + np.uint64(1))
    child = lsb >> np.uint64(2)
    ks = np.arange(4, dtype=np.uint64)
    out = (u[:, None] - lsb[:, None]) + (np.uint64(2) * ks[None, :] + np.uint64(1)) * child[:, None]
    return out.view(np.int64)
