"""Map matching: snap GPS pings to the nearest road segment within D_MAX.

The geospatial tier's classic trajectory join — each (entity, seq) ping
finds its nearest segment of a polyline road network (point-to-segment
Euclidean distance on the e7 fixed-point plane), plus the along-segment
projection parameter for linear referencing. No reference analogue
(marph91/jimmy has no spatial surface); engine addition under the
BASELINE.json geospatial axes, alongside the trajectory family.

Scale shape (10^12 pings x 10^8 segments design point):

- Square-grid blocking with width = D_MAX, the same cover discipline as
  distance_join_grid: each segment registers in every grid cell its
  bbox EXPANDED BY D_MAX touches (a short-segment network ≈ a handful of
  cells each, enumerated by a codegen'd ``sequence`` explode — no Python
  anywhere); each ping registers in its ONE home cell. Any ping within
  D_MAX of a segment lies inside the expanded bbox, so the single
  shuffled (gx, gy) equality join is complete — no distinct needed since
  a (ping, segment) pair meets in exactly the ping's home cell.
- The per-ping argmin is a groupBy min(struct(d2, road_id, seg_id, ...))
  — lexicographic struct ordering encodes the distance-then-id rank, and
  the agg (unlike a window) gets map-side partial aggregation, so each
  task pre-folds its candidates before the shuffle.
- Unmatched pings survive via a left join back to the ping set (n = 0
  lane) — a matcher that silently drops off-network pings corrupts
  downstream trip statistics.

Exactness contract: branch conditions (which of the three point-segment
regimes applies) and the endpoint distances are exact int64; only the
interior-projection distance needs division and runs as ONE fixed
IEEE-754 double tree (vv - dot*dot/ww), mirrored token-for-token in the
DuckDB twin — the driver hash gate rides on floor(d2) and the e6-scaled
projection parameter. Coordinate domain |coord| <= 8e8 keeps every
integer product within int64 (see the audit in the code comments).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

D_MAX = 22_000_000  # 2.2 deg ~ 245 km of latitude — see datagen/roads.py sizing
_OFF = 2_000_000_000  # floor-div shift (SQL div truncates toward zero)


def _d2_cols(px, py, ax, ay, bx, by):
    """(d2 double, dot long, ww long) for point->segment; the fixed tree.

    int64 audit (post-join, |p - a| <= seg_len + D_MAX + 2*width < 1.2e8):
    vx*vx <= 1.5e16; dot <= |v||w| <= 1.2e8 * 2e7 = 2.4e15; ww <= 4e14 —
    all far inside int64. Degenerate a == b segments fall into the
    dot <= 0 branch (dot = 0), so no division by ww = 0 ever runs.
    """
    vx, vy = px - ax, py - ay
    wx, wy = bx - ax, by - ay
    ux, uy = px - bx, py - by
    dot = vx * wx + vy * wy
    ww = wx * wx + wy * wy
    vv = vx * vx + vy * vy
    vb = ux * ux + uy * uy
    d2 = (
        F.when(dot <= 0, vv.cast("double"))
        .when(dot >= ww, vb.cast("double"))
        .otherwise(
            vv.cast("double") - dot.cast("double") * dot.cast("double") / ww.cast("double")
        )
    )
    return d2, dot, ww


def _t_e6(dot: Column, ww: Column) -> Column:
    """Projection parameter scaled to e6: 0 at a, 1e6 at b; interior via
    the same double division as d2 (floor of t * 1e6)."""
    return (
        F.when(dot <= 0, F.lit(0).cast("long"))
        .when(dot >= ww, F.lit(1_000_000).cast("long"))
        .otherwise(F.floor(dot.cast("double") / ww.cast("double") * F.lit(1000000.0)))
    )


def map_match(
    pings: DataFrame, segments: DataFrame, d_max: int = D_MAX
) -> DataFrame:
    """Nearest-segment match per ping.

    pings: (entity_id, seq, ts, lat_e7, lon_e7); segments: (road_id,
    seg_id, ax, ay, bx, by) with x = lon_e7, y = lat_e7. Output one row
    per ping: (entity_id, seq, ts, n_cand, road_id, seg_id, d2_floor,
    t_e6) — the last four null (n_cand = 0) for off-network pings.
    """
    w = int(d_max)
    d = int(d_max)
    # segment side: every (gx, gy) its expanded bbox touches; the +_OFF
    # shift makes every bound positive so `div` == floor
    seg_cells = segments.select(
        "road_id", "seg_id", "ax", "ay", "bx", "by",
        F.explode(
            F.expr(
                f"sequence((least(ax, bx) - {d} + {_OFF}) div {w},"
                f" (greatest(ax, bx) + {d} + {_OFF}) div {w})"
            )
        ).alias("gx"),
        F.expr(
            f"sequence((least(ay, by) - {d} + {_OFF}) div {w},"
            f" (greatest(ay, by) + {d} + {_OFF}) div {w})"
        ).alias("_gys"),
    ).select(
        "road_id", "seg_id", "ax", "ay", "bx", "by", "gx",
        F.explode("_gys").alias("gy"),
    )
    ping_cells = pings.select(
        "entity_id", "seq",
        F.col("lon_e7").alias("px"), F.col("lat_e7").alias("py"),
        F.expr(f"(lon_e7 + {_OFF}) div {w}").alias("gx"),
        F.expr(f"(lat_e7 + {_OFF}) div {w}").alias("gy"),
    )
    d2, dot, ww = _d2_cols(
        F.col("px"), F.col("py"),
        F.col("ax"), F.col("ay"), F.col("bx"), F.col("by"),
    )
    cand = (
        ping_cells.join(seg_cells, ["gx", "gy"])
        .withColumn("d2", d2)
        .filter(F.col("d2") <= F.lit(float(d) * float(d)))
        .withColumn("t_e6", _t_e6(dot, ww))
    )
    # argmin as min(struct(...)): lexicographic struct ordering IS the
    # (d2, road_id, seg_id) rank, and a groupBy agg (unlike a window)
    # gets map-side partial aggregation — each task pre-folds its ~k
    # candidates per ping before the shuffle
    best = cand.groupBy("entity_id", "seq").agg(
        F.count("*").alias("n_cand"),
        F.min(F.struct("d2", "road_id", "seg_id", "t_e6")).alias("_b"),
    ).select(
        "entity_id", "seq", "n_cand",
        F.col("_b.road_id").alias("road_id"),
        F.col("_b.seg_id").alias("seg_id"),
        F.floor(F.col("_b.d2")).alias("d2_floor"),
        F.col("_b.t_e6").alias("t_e6"),
    )
    return (
        pings.select("entity_id", "seq", "ts")
        .join(best, ["entity_id", "seq"], "left")
        .withColumn("n_cand", F.coalesce("n_cand", F.lit(0).cast("long")))
    )


_D2_SQL = """CASE
  WHEN (px - ax) * (bx - ax) + (py - ay) * (by - ay) <= 0
    THEN CAST((px - ax) * (px - ax) + (py - ay) * (py - ay) AS DOUBLE)
  WHEN (px - ax) * (bx - ax) + (py - ay) * (by - ay)
       >= (bx - ax) * (bx - ax) + (by - ay) * (by - ay)
    THEN CAST((px - bx) * (px - bx) + (py - by) * (py - by) AS DOUBLE)
  ELSE CAST((px - ax) * (px - ax) + (py - ay) * (py - ay) AS DOUBLE)
       - CAST((px - ax) * (bx - ax) + (py - ay) * (by - ay) AS DOUBLE)
         * CAST((px - ax) * (bx - ax) + (py - ay) * (by - ay) AS DOUBLE)
         / CAST((bx - ax) * (bx - ax) + (by - ay) * (by - ay) AS DOUBLE)
END"""

_T_E6_SQL = """CASE
  WHEN (px - ax) * (bx - ax) + (py - ay) * (by - ay) <= 0 THEN 0::BIGINT
  WHEN (px - ax) * (bx - ax) + (py - ay) * (by - ay)
       >= (bx - ax) * (bx - ax) + (by - ay) * (by - ay) THEN 1000000::BIGINT
  ELSE CAST(floor(
    CAST((px - ax) * (bx - ax) + (py - ay) * (by - ay) AS DOUBLE)
    / CAST((bx - ax) * (bx - ax) + (by - ay) * (by - ay) AS DOUBLE)
    * 1000000.0) AS BIGINT)
END"""


def duckdb_match_sql(tracks_rel: str, roads_rel: str, d_max: int = D_MAX) -> str:
    """Brute-force twin, independent of the grid blocking: candidate
    generation is a bbox inequality join (DuckDB IEJoin) over ALL
    segments, then the same fixed IEEE double tree and the same
    (d2, road_id, seg_id) argmin. Agreement proves the grid cover is
    complete, not just that two copies of one plan agree."""
    d = int(d_max)
    return f"""
WITH p AS (
  SELECT entity_id, seq, ts, lon_e7 AS px, lat_e7 AS py FROM {tracks_rel}
),
cand AS (
  SELECT p.entity_id, p.seq, s.road_id, s.seg_id,
         {_D2_SQL} AS d2, {_T_E6_SQL} AS t_e6
  FROM p JOIN {roads_rel} s
    ON p.px BETWEEN least(s.ax, s.bx) - {d} AND greatest(s.ax, s.bx) + {d}
   AND p.py BETWEEN least(s.ay, s.by) - {d} AND greatest(s.ay, s.by) + {d}
),
best AS (
  SELECT entity_id, seq, road_id, seg_id, d2, t_e6,
         row_number() OVER (PARTITION BY entity_id, seq
                            ORDER BY d2, road_id, seg_id) AS rn,
         count(*) OVER (PARTITION BY entity_id, seq)::BIGINT AS n_cand
  FROM cand WHERE d2 <= {float(d) * float(d)!r}
)
SELECT p.entity_id, p.seq, p.ts,
       coalesce(b.n_cand, 0::BIGINT) AS n_cand,
       b.road_id, b.seg_id,
       CAST(floor(b.d2) AS BIGINT) AS d2_floor, b.t_e6
FROM p LEFT JOIN (SELECT * FROM best WHERE rn = 1) b
  USING (entity_id, seq)
"""
