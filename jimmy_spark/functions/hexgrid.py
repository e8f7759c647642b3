"""H3-style hierarchical hexagonal cell index (res 7-9), pure NumPy.

No ``h3`` wheel exists in this container (SURVEY §7.2 fallback clause), so
the engine defines its own hexagonal grid with H3's *semantics* — pointy-top
hexagons, aperture-≈7 resolution scaling with cell sizes matching H3's
published average edge lengths at res 7/8/9 (~1.22 km / 461 m / 174 m), a
64-bit cell id carrying (resolution, axial q, axial r), and k-ring /
disk neighborhood generation (the primitive behind kNN ring expansion).

The grid lives on the fixed-point plane x = lon_e7, y = lat_e7 (planar
approximation; the kNN distance metric is squared Euclidean in the same
plane, so ring-expansion distance bounds are geometrically valid — see
operators/knn.py). Antimeridian wrap is out of scope by definition of the
plane; the oracle shares the definition.

Float determinism contract: the axial transform + cube rounding is written
as one fixed sequence of IEEE-754 double ops using the exact decimal
literals in ``C_SQ33/C_13/C_23``; the DuckDB oracle SQL (``duckdb_hex_sql``)
evaluates the *same* expression tree, so both sides produce bit-identical
cell ids.

Cell id layout (int64):  (res-5, 3 bits) << 60 | (q + 2^29) << 30 | (r + 2^29)
(res biased by 5 so ids stay positive and DuckDB's checked << never overflows).
"""

from __future__ import annotations

import numpy as np

# Exact decimal literals (17 sig digits -> identical doubles in Python,
# Java, and DuckDB's strtod).
C_SQ33 = 0.5773502691896258  # sqrt(3)/3
C_13 = 0.3333333333333333  # 1/3
C_23 = 0.6666666666666666  # 2/3

# Circumradius ("size") per resolution, in e7 fixed-point units.
# 1 e7-unit ≈ 1.11 cm of latitude; H3 avg hex edge: r7≈1.22km, r8≈461m,
# r9≈174m  →  sizes below ≈ those edges expressed in degrees * 1e7.
# res 7-9 are the published North-Rule resolutions; 5-6 are coarser grids
# used internally (e.g. the kNN density grid at 10^12 scale, where res-7
# occupied-cell counts would exceed what a driver can hold).
SIZES = {
    5: 770_000.0,
    6: 291_041.0,
    7: 110_000.0,
    8: 41_577.0,
    9: 15_715.0,
}
RESOLUTIONS = (7, 8, 9)
_BIAS = 5  # res stored as (res - _BIAS) in 3 bits -> res 5..12, ids positive

_OFF = 1 << 29
_QR_MASK = (1 << 30) - 1


def _axial_float(x: np.ndarray, y: np.ndarray, size: float):
    qf = (x * C_SQ33 - y * C_13) / size
    rf = (y * C_23) / size
    return qf, rf


def _cube_round(qf: np.ndarray, rf: np.ndarray):
    """Standard cube rounding; floor(v + 0.5) as the half-rule (identical in
    NumPy and SQL — NOT banker's rounding)."""
    xf, zf = qf, rf
    yf = -xf - zf
    rx = np.floor(xf + 0.5)
    ry = np.floor(yf + 0.5)
    rz = np.floor(zf + 0.5)
    dx = np.abs(rx - xf)
    dy = np.abs(ry - yf)
    dz = np.abs(rz - zf)
    fix_x = (dx > dy) & (dx > dz)
    fix_y = ~fix_x & (dy > dz)
    rx = np.where(fix_x, -ry - rz, rx)
    ry = np.where(fix_y, -rx - rz, ry)
    rz = np.where(~fix_x & ~fix_y, -rx - ry, rz)
    return rx.astype(np.int64), rz.astype(np.int64)


def encode(lat_e7: np.ndarray, lon_e7: np.ndarray, res: int) -> np.ndarray:
    """Fixed-point coords -> int64 hex cell id at resolution ``res``."""
    size = SIZES[res]
    x = lon_e7.astype(np.float64)
    y = lat_e7.astype(np.float64)
    qf, rf = _axial_float(x, y, size)
    q, r = _cube_round(qf, rf)
    return (np.int64(res - _BIAS) << 60) | ((q + _OFF) << 30) | (r + _OFF)


def pack(res: int, q: np.ndarray, r: np.ndarray) -> np.ndarray:
    return (np.int64(res - _BIAS) << 60) | ((q.astype(np.int64) + _OFF) << 30) | (
        r.astype(np.int64) + _OFF
    )


def unpack(cell: np.ndarray):
    """cell id -> (res, q, r)."""
    cell = cell.astype(np.int64)
    res = ((cell >> 60) & 0x7) + _BIAS
    q = ((cell >> 30) & _QR_MASK) - _OFF
    r = (cell & _QR_MASK) - _OFF
    return res, q, r


def center(cell: np.ndarray):
    """cell id -> float64 (y=lat_e7, x=lon_e7) hex centers."""
    res, q, r = unpack(cell)
    size = np.choose(res - 5, [SIZES[r] for r in (5, 6, 7, 8, 9)])
    x = size * (SQ3 * (q + r * 0.5))
    y = size * 1.5 * r
    return y, x


# sqrt(3) as the exact decimal literal (== float(np.sqrt(3.0)); asserted in
# tests) so the center inverse shares the float-determinism contract of the
# forward encode: NumPy, the JVM expression, and DuckDB all evaluate the
# same IEEE-754 expression tree from the same literals.
SQ3 = 1.7320508075688772


def center_lattice(cell: np.ndarray):
    """cell id -> int64 (lat_e7, lon_e7) of the center rounded onto the
    fixed-point lattice with the grid's floor(v + 0.5) half-rule — the
    deterministic representative point used by polyfill and zonal stats."""
    cy, cx = center(cell)
    return (
        np.floor(cy + 0.5).astype(np.int64),
        np.floor(cx + 0.5).astype(np.int64),
    )


def duckdb_center_sql(cell_expr: str, res: int) -> tuple[str, str]:
    """(lat_e7_sql, lon_e7_sql) DuckDB fragments for the lattice-rounded
    center of a fixed-resolution cell id; identical expression tree (and
    literal spellings) to ``center_lattice`` / ``cells.hex_center_exprs``."""
    s = repr(SIZES[res])
    q = f"((({cell_expr} >> 30) & {_QR_MASK}) - {_OFF})"
    r = f"(({cell_expr} & {_QR_MASK}) - {_OFF})"
    lat = f"floor({s} * 1.5 * {r} + 0.5)::BIGINT"
    lon = f"floor({s} * ({SQ3!r} * ({q} + {r} * 0.5)) + 0.5)::BIGINT"
    return lat, lon


def hex_distance(q1, r1, q2, r2):
    dq = q1 - q2
    dr = r1 - r2
    return (np.abs(dq) + np.abs(dr) + np.abs(dq + dr)) // 2


def disk_offsets(radius: int) -> np.ndarray:
    """All (dq, dr) with hex distance <= radius: 3R(R+1)+1 cells, int64
    array shape (n, 2), deterministic order (dq asc, dr asc)."""
    out = []
    for dq in range(-radius, radius + 1):
        lo = max(-radius, -dq - radius)
        hi = min(radius, -dq + radius)
        for dr in range(lo, hi + 1):
            out.append((dq, dr))
    return np.asarray(out, dtype=np.int64)


def disk(cell: int, radius: int) -> np.ndarray:
    """int64 cell ids of the full disk around one cell."""
    res, q, r = unpack(np.asarray([cell]))
    offs = disk_offsets(radius)
    return pack(int(res[0]), q[0] + offs[:, 0], r[0] + offs[:, 1])


# --- kNN geometry bounds (see operators/knn.py) ---------------------------
# Pointy-top, circumradius s: adjacent centers are sqrt(3)*s apart; the
# minimum Euclidean center distance over cells at hex distance D is 1.5*s*D
# (attained on the "diagonal" axis). Any point of a cell is within s of its
# center, so points in cells at hex distance D are at distance
# >= 1.5*s*D - 2*s from any point of the origin cell.


def min_dist_for_ring(res: int, d: np.ndarray) -> np.ndarray:
    s = SIZES[res]
    return np.maximum(1.5 * s * d - 2.0 * s, 0.0)


def rings_needed(res: int, dist: np.ndarray) -> np.ndarray:
    """Smallest disk radius guaranteed to contain every point within
    Euclidean distance ``dist`` of any point in the query's cell."""
    s = SIZES[res]
    return np.ceil((dist + 2.0 * s) / (1.5 * s)).astype(np.int64)


def polyfill(ring_x: np.ndarray, ring_y: np.ndarray, res: int) -> np.ndarray:
    """Cells whose CENTER lies inside the ring — H3 ``polyfill`` semantics.

    Candidate cells are enumerated directly in axial space from the ring's
    bbox (centers: x = s*sqrt(3)*(q + r/2), y = 1.5*s*r, so the r range
    follows from the y extent and, per r row, the q range from the x
    extent — no lattice sampling, no missed cells). Each center is rounded
    to the e7 fixed-point lattice with the grid's floor(v + 0.5) half-rule
    and tested with the exact integer ray-cast (on-edge = inside), so the
    result is deterministic bit-for-bit.

    Returns sorted int64 cell ids. Note the standard H3 caveat: polyfill
    covers the polygon's *centers*, not its area — cells intersecting the
    ring with centers outside are not included (use a dilated ring for a
    cover).
    """
    from jimmy_spark.functions.raycast import inside_ring

    s = SIZES[res]
    rx = np.asarray(ring_x, dtype=np.int64)
    ry = np.asarray(ring_y, dtype=np.int64)
    min_x, max_x = float(rx.min()), float(rx.max())
    min_y, max_y = float(ry.min()), float(ry.max())
    # ranges widened by one row/col each side: float rounding on the bbox
    # boundary must never drop a borderline center — the exact ray-cast
    # below discards the extras
    r_lo = int(np.ceil(min_y / (1.5 * s))) - 1
    r_hi = int(np.floor(max_y / (1.5 * s))) + 1
    sq3 = np.sqrt(3.0)
    rows = np.arange(r_lo, r_hi + 1, dtype=np.int64)
    # per row: s*sqrt(3)*(q + r/2) in [min_x, max_x]
    q_lo = np.ceil(min_x / (s * sq3) - rows * 0.5).astype(np.int64) - 1
    q_hi = np.floor(max_x / (s * sq3) - rows * 0.5).astype(np.int64) + 1
    n_per = np.maximum(q_hi - q_lo + 1, 0)
    if n_per.sum() == 0:
        return np.array([], dtype=np.int64)
    r_all = np.repeat(rows, n_per)
    q_all = np.concatenate(
        [np.arange(lo, hi + 1, dtype=np.int64) for lo, hi in zip(q_lo, q_hi) if hi >= lo]
    )
    cells = pack(res, q_all, r_all)
    cy, cx = center(cells)
    px = np.floor(cx + 0.5).astype(np.int64)
    py = np.floor(cy + 0.5).astype(np.int64)
    keep = inside_ring(px, py, rx, ry)
    return np.sort(cells[keep])


# --- DuckDB oracle SQL ----------------------------------------------------


def duckdb_hex_layers(lat_col: str, lon_col: str, resolutions=RESOLUTIONS):
    """Build layered SELECT expression lists for the DuckDB oracle.

    Returns (layers, finals): ``layers`` is a list of expression lists, each
    applied as a nested ``SELECT *, <exprs> FROM (...)`` so later layers can
    reference earlier aliases; ``finals`` maps ``hex_r{res}`` to its cell-id
    expression. Per-step expression trees are identical to ``encode``.
    """
    layers: list[list[str]] = [[], [], [], []]
    finals: dict[str, str] = {}
    for res in resolutions:
        s = repr(SIZES[res])
        t = f"_{res}"
        layers[0] += [
            f"(({lon_col} * {C_SQ33!r} - {lat_col} * {C_13!r}) / {s}) AS qf{t}",
            f"(({lat_col} * {C_23!r}) / {s}) AS rf{t}",
        ]
        layers[1] += [
            f"(-qf{t} - rf{t}) AS yf{t}",
            f"floor(qf{t} + 0.5)::BIGINT AS rx{t}",
            f"floor(rf{t} + 0.5)::BIGINT AS rz{t}",
        ]
        layers[2] += [
            f"floor(yf{t} + 0.5)::BIGINT AS ry{t}",
            f"abs(floor(qf{t} + 0.5) - qf{t}) AS fx{t}",
            f"abs(floor(yf{t} + 0.5) - yf{t}) AS fy{t}",
            f"abs(floor(rf{t} + 0.5) - rf{t}) AS fz{t}",
        ]
        layers[3] += [
            f"CASE WHEN fx{t} > fy{t} AND fx{t} > fz{t} THEN -ry{t} - rz{t} "
            f"ELSE rx{t} END AS q{t}",
            f"CASE WHEN NOT (fx{t} > fy{t} AND fx{t} > fz{t}) AND NOT (fy{t} > fz{t}) "
            f"THEN -rx{t} - ry{t} ELSE rz{t} END AS r{t}",
        ]
        finals[f"hex_r{res}"] = (
            f"(({res - 5}::BIGINT << 60) | ((q{t} + {_OFF}) << 30) | (r{t} + {_OFF}))"
        )
    return layers, finals


def duckdb_hex_query(
    source_sql: str, key_cols: str, lat_col: str, lon_col: str,
    resolutions=RESOLUTIONS,
) -> str:
    """Full DuckDB SELECT producing (key_cols, hex_r{res}...) from a source
    relation exposing integer e7 ``lat_col``/``lon_col`` columns."""
    layers, finals = duckdb_hex_layers(lat_col, lon_col, resolutions)
    inner = source_sql
    for layer in layers:
        inner = f"SELECT *, {', '.join(layer)} FROM ({inner})"
    sel = ", ".join(f"{expr} AS {name}" for name, expr in finals.items())
    return f"SELECT {key_cols}, {sel} FROM ({inner})"
