"""Within-distance spatial pair join (the classic geospatial "distance
join"): all pairs of points at squared planar distance <= d^2.

North_rule family: spatial join over the (lat_e7, lon_e7) fixed-point plane
shared by the hex grid, kNN, and PIP stages (functions/hexgrid.py docstring).
Reference analogue: jimmy's only pairwise-proximity operator is the O(n^2)
fuzzy-title theta join (/root/reference/src/jimmy/common.py:373-400); the
scalable shape is the same blocking discipline used by operators/knn.py —
hex-cell blocking key + bounded candidate join + exact integer verify.

Plan shape (built for the 10^12-row design point):

1. Home cell per point at resolution ``res`` — pure JVM expression
   (``cells.hex_cell_expr``), no Python worker.
2. The LEFT side explodes each point to its full hex disk of radius
   ``k = rings_needed(res, d)`` (``functions/hexgrid.py``: any point within
   Euclidean distance d of a point in a cell lies within k rings of it).
   The disk offsets are a compile-time literal array of packed
   ``(dq << 30) + dr`` deltas, so neighbor ids are plain int64 adds —
   the expansion is a narrow codegen'd explode, no shuffle.
3. The RIGHT side keeps each point at its home cell only. ONE shuffled
   equality join on the cell id.
4. Verify: exact int64 squared distance (join-matched deltas are bounded
   by ~(k+2)*sqrt(3)*size, far inside int64-exact range) and the
   ``a_id < b_id`` total order.

Exactly-once BY CONSTRUCTION (no distinct): a true pair (a, b) with
``a_id < b_id`` is emitted iff b's home cell is in a's disk — b has exactly
ONE home cell and the disk enumerates distinct cells, so each qualifying
pair matches exactly one (disk-cell, home-cell) row pair. The ring bound
makes membership certain, so recall is exact, not approximate.

Scale/skew: the single Exchange is the cell-keyed join; hot cells get AQE
skew-join splitting, and true output over a hot spot is inherently
quadratic in its population (every emitted pair is a real result, the
candidate set is bounded by the disk area times local density — never
all-pairs). Fanout is 3k(k+1)+1 rows per left point; ``res`` defaults to
the finest grid whose disk radius stays <= MAX_RINGS so the explode factor
is bounded and known at plan time.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jimmy_spark.functions import hexgrid
from jimmy_spark.operators.cells import hex_cell_expr

# Largest disk radius the left-side explode may use when auto-picking the
# resolution: fanout 3k(k+1)+1 <= 37 rows/point at k=3.
MAX_RINGS = 3


def pick_resolution(d: float) -> tuple[int, int]:
    """Finest resolution whose guaranteed disk radius is <= MAX_RINGS
    (finer cells = tighter candidates, but the disk must stay bounded);
    falls back to the coarsest grid when d dwarfs every cell size."""
    coarsest = min(hexgrid.RESOLUTIONS)
    for res in sorted(hexgrid.RESOLUTIONS, reverse=True):
        k = int(hexgrid.rings_needed(res, np.asarray([float(d)]))[0])
        if k <= MAX_RINGS or res == coarsest:
            return res, k
    raise AssertionError("unreachable")


def _disk_deltas(k: int) -> list[int]:
    """Packed int64 cell-id deltas for the radius-k disk (bit layout in
    functions/hexgrid.py: q in bits 30-59, r in bits 0-29, so a neighbor
    id is home + (dq << 30) + dr; offsets never leave the 30-bit fields
    because |q|,|r| stay far below the 2^29 bias)."""
    offs = hexgrid.disk_offsets(k)
    return [int((dq << 30) + dr) for dq, dr in offs]


def distance_join(
    points: DataFrame,
    d: int,
    res: int | None = None,
    id_col: str = "image_id",
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
) -> DataFrame:
    """All pairs (a_id < b_id) with squared planar distance <= d*d.

    Output: (a_id, b_id, dist2:long), each qualifying pair exactly once.
    ``d`` is in e7 fixed-point units (the hex grid's plane).
    """
    if res is None:
        res, k = pick_resolution(d)
    else:
        k = int(hexgrid.rings_needed(res, np.asarray([float(d)]))[0])
    deltas = F.array(*[F.lit(x) for x in _disk_deltas(k)])
    home: Column = hex_cell_expr(F.col(lat_col), F.col(lon_col), res)

    # generators can't nest inside expressions: explode to a column, then add
    left = points.select(
        F.col(id_col).alias("a_id"),
        F.col(lat_col).alias("a_lat"),
        F.col(lon_col).alias("a_lon"),
        home.alias("_home"),
        F.explode(deltas).alias("_delta"),
    ).select(
        "a_id", "a_lat", "a_lon",
        (F.col("_home") + F.col("_delta")).alias("cell"),
    )
    right = points.select(
        F.col(id_col).alias("b_id"),
        F.col(lat_col).alias("b_lat"),
        F.col(lon_col).alias("b_lon"),
        home.alias("cell"),
    )
    dx = (F.col("a_lon") - F.col("b_lon")).cast("long")
    dy = (F.col("a_lat") - F.col("b_lat")).cast("long")
    dist2 = dx * dx + dy * dy
    return (
        left.join(right, "cell")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(dist2 <= F.lit(int(d) * int(d)))
        .select("a_id", "b_id", dist2.alias("dist2"))
    )


# Shift that makes every e7 coordinate non-negative before the integer
# floor-div (SQL `div` truncates toward zero, which is NOT floor for
# negatives; double-division floor risks off-by-one at exact multiples).
_GRID_OFF = 2_000_000_000


def distance_join_grid(
    points: DataFrame,
    d: int,
    width: int | None = None,
    id_col: str = "image_id",
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Square-grid strategy behind the same `distance_join` semantics —
    the SCALE path when ``d`` is far below the finest hex cell size.

    The hex grids stop at res 9 (size 15,715 e7-units ≈ 174 m,
    functions/hexgrid.py SIZES); for a small ``d`` over a dense hot spot
    every cluster point shares one cell and the hex-disk candidate set
    goes quadratic in the cell population. Here the grid width tracks
    ``d`` itself (default ``width = 2d``, r6 width sweep), so the 3x3
    neighborhood area is ~36*d^2 and candidates stay proportional to ``density * d^2`` — the
    output-optimal bound for a distance join, at any density. Same
    discipline as pip_join_cells' (gx, gy) cover (operators/pip.py).

    Exactly-once BY CONSTRUCTION (no distinct), same argument as the hex
    disk: with ``width >= d``, any qualifying partner's home cell differs
    by at most 1 in each axis, the 9 neighbor cells are distinct, and a
    point has exactly one home cell — so each qualifying (a, b) matches
    exactly one (neighbor-cell, home-cell) row pair.

    ONE shuffled equality join on (gx, gy); the 9-way explode is a narrow
    codegen'd Generate. Hot cells ride AQE skew splitting.

    ``carry_cols`` rides extra columns through the join (output
    ``a_<col>`` / ``b_<col>``) so a consumer's verify (e.g. the Hamming
    gate in operators/imagedup.scene_dup_pairs) runs inside the joined
    stage instead of re-shuffling the pair stream through id-joins.
    """
    # default width 2d (r6): measured sweep on the bench hot-spot lane
    # (4M pts, d=100, 8.35M pairs) — w=d 7.1s / 1.5d 6.3 / 2d 6.2-6.8 /
    # 3d 6.4 / 5d 7.0 / 8d 7.8, identical pairs at every width (blocking
    # never changes semantics). Same 3x3 explode either way; wider cells
    # mean fewer distinct join keys and the larger verify set is a
    # codegen'd int64 filter. Candidates stay proportional to
    # density*d^2 (the output-proportional contract) at any fixed w/d.
    w = int(width if width is not None else 2 * d)
    if w < int(d):
        raise ValueError(f"grid width {w} must be >= d {d}")
    gx = F.expr(f"({lon_col} + {_GRID_OFF}) div {w}")
    gy = F.expr(f"({lat_col} + {_GRID_OFF}) div {w}")

    a_carry = [F.col(c).alias(f"a_{c}") for c in carry_cols]
    a_carry_names = [f"a_{c}" for c in carry_cols]
    left = points.select(
        F.col(id_col).alias("a_id"),
        F.col(lat_col).alias("a_lat"),
        F.col(lon_col).alias("a_lon"),
        *a_carry,
        gx.alias("_gx"),
        gy.alias("_gy"),
        F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])).alias("_dx"),
    ).select(
        "a_id", "a_lat", "a_lon", *a_carry_names,
        (F.col("_gx") + F.col("_dx")).alias("gx"),
        "_gy",
        F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])).alias("_dy"),
    ).select(
        "a_id", "a_lat", "a_lon", *a_carry_names, "gx",
        (F.col("_gy") + F.col("_dy")).alias("gy"),
    )
    right = points.select(
        F.col(id_col).alias("b_id"),
        F.col(lat_col).alias("b_lat"),
        F.col(lon_col).alias("b_lon"),
        *[F.col(c).alias(f"b_{c}") for c in carry_cols],
        gx.alias("gx"),
        gy.alias("gy"),
    )
    dx = (F.col("a_lon") - F.col("b_lon")).cast("long")
    dy = (F.col("a_lat") - F.col("b_lat")).cast("long")
    dist2 = dx * dx + dy * dy
    return (
        left.join(right, ["gx", "gy"])
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(dist2 <= F.lit(int(d) * int(d)))
        .select(
            "a_id",
            "b_id",
            dist2.alias("dist2"),
            *a_carry_names,
            *[f"b_{c}" for c in carry_cols],
        )
    )


def distance_join_grid_incremental(
    new: DataFrame,
    old: DataFrame,
    d: int,
    width: int | None = None,
    id_col: str = "image_id",
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Pairs within distance ``d`` touching at least one NEW point —
    exactly the delta ``pairs(old ∪ new) - pairs(old)`` — each pair once,
    output ordered (a_id < b_id). The incremental kernel behind the
    streaming proximity maintenance (streaming/spatial.py): per
    micro-batch, only new x (new ∪ old) work is done; the old x old pair
    mass is never recomputed.

    Construction (exactly-once without distinct, extending
    ``distance_join_grid``'s argument): the LEFT side explodes NEW points
    to their 3x3 grid neighborhoods; the RIGHT side holds ALL points at
    home cells, flagged ``_new``. A new-new pair is accepted only under
    the a < b total order (it would otherwise match from both sides); a
    new-old pair matches exactly once (old points never appear on the
    left), so it is always accepted.

    ``carry_cols`` rides extra columns through the join like the batch
    kernel's (output ``a_<col>`` / ``b_<col>``). A new-old pair can
    surface with the NEW point on either side of the final (least,
    greatest) id order, so carried values are swap-aligned to their ids.
    """
    w = int(width if width is not None else 2 * d)  # r6 default, see above
    if w < int(d):
        raise ValueError(f"grid width {w} must be >= d {d}")
    gx = F.expr(f"({lon_col} + {_GRID_OFF}) div {w}")
    gy = F.expr(f"({lat_col} + {_GRID_OFF}) div {w}")

    def _base(df: DataFrame, is_new: bool) -> DataFrame:
        return df.select(
            F.col(id_col).alias("b_id"),
            F.col(lat_col).alias("b_lat"),
            F.col(lon_col).alias("b_lon"),
            *[F.col(c).alias(f"b_{c}") for c in carry_cols],
            gx.alias("gx"),
            gy.alias("gy"),
            F.lit(is_new).alias("_new"),
        )

    a_carry = [F.col(c).alias(f"a_{c}") for c in carry_cols]
    a_carry_names = [f"a_{c}" for c in carry_cols]
    left = new.select(
        F.col(id_col).alias("a_id"),
        F.col(lat_col).alias("a_lat"),
        F.col(lon_col).alias("a_lon"),
        *a_carry,
        gx.alias("_gx"),
        gy.alias("_gy"),
        F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])).alias("_dx"),
    ).select(
        "a_id", "a_lat", "a_lon", *a_carry_names,
        (F.col("_gx") + F.col("_dx")).alias("gx"),
        "_gy",
        F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])).alias("_dy"),
    ).select(
        "a_id", "a_lat", "a_lon", *a_carry_names, "gx",
        (F.col("_gy") + F.col("_dy")).alias("gy"),
    )
    right = _base(new, True).unionByName(_base(old, False))
    dx = (F.col("a_lon") - F.col("b_lon")).cast("long")
    dy = (F.col("a_lat") - F.col("b_lat")).cast("long")
    dist2 = dx * dx + dy * dy
    in_order = F.col("a_id") < F.col("b_id")
    return (
        left.join(right, ["gx", "gy"])
        .filter(~F.col("_new") | in_order)
        .filter(F.col("a_id") != F.col("b_id"))
        .filter(dist2 <= F.lit(int(d) * int(d)))
        .select(
            F.least("a_id", "b_id").alias("a_id"),
            F.greatest("a_id", "b_id").alias("b_id"),
            dist2.alias("dist2"),
            *[
                F.when(in_order, F.col(f"a_{c}"))
                .otherwise(F.col(f"b_{c}"))
                .alias(f"a_{c}")
                for c in carry_cols
            ],
            *[
                F.when(in_order, F.col(f"b_{c}"))
                .otherwise(F.col(f"a_{c}"))
                .alias(f"b_{c}")
                for c in carry_cols
            ],
        )
    )


def duckdb_dist_sql(points_sql: str, d: int, id_col: str = "image_id") -> str:
    """Oracle twin: brute-force self theta-join. Squares go through HUGEINT
    (full-span e7 deltas overflow int64 — DuckDB reorders predicates, so a
    bbox prefilter cannot be relied on to run first); the surviving dist2
    is <= d^2 and casts back to BIGINT to match Spark's long."""
    dist2 = (
        f"(a.lon_e7 - b.lon_e7)::HUGEINT * (a.lon_e7 - b.lon_e7) + "
        f"(a.lat_e7 - b.lat_e7)::HUGEINT * (a.lat_e7 - b.lat_e7)"
    )
    return (
        f"SELECT a.{id_col} AS a_id, b.{id_col} AS b_id, "
        f"({dist2})::BIGINT AS dist2 "
        f"FROM ({points_sql}) a JOIN ({points_sql}) b "
        f"ON a.{id_col} < b.{id_col} AND {dist2} <= {int(d)}::HUGEINT * {int(d)}"
    )
