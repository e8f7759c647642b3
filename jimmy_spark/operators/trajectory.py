"""Moving-object trajectory analytics over (entity, seq, ts, lat, lon)
ping streams: gap/jump track segmentation, per-segment stats with an
order-canonical integer path length, dwell (stay-point) detection, and
the origin-destination cell matrix.

This is spatial sessionization — the same lag + cumulative-flag-sum shape
as streaming/windows.sessionize_batch, extended with a spatial break
predicate (squared step length in exact int64) and spatial aggregates.
The whole family is pure JVM window/aggregate expressions: no Python in
the path, one shuffle per entity-window plus the tiny per-segment
aggregates.

Scale notes (10^12-ping design):

- Every window partitions by entity (plus segment): task state is one
  TRACK, never the table. Hot entities bound task size by track length —
  the operator's documented contract (same class as the reference's
  per-notebook grouping); a 10^9-ping single entity would need a
  time-sliced pre-split upstream.
- ``path_len`` is the sum of per-step ``floor(sqrt(step2))`` — each term
  exact from int64 inputs, so the SUM is an integer: order-independent,
  partitioning-invariant, and bit-identical in the DuckDB twin (a
  double-sum path length would be order-dependent and could never sit
  behind a hash gate).
- Coordinates are e7 fixed-point; |coord| <= 8e8 keeps ``step2`` within
  int64 with 10x headroom (datagen/tracks.py enforces this for the
  engine tables; callers with global-extent data should pre-split the
  antimeridian as with the rest of the planar operators).

No reference analogue (marph91/jimmy has no trajectory surface); engine
addition under the BASELINE.json geospatial axes.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jimmy_spark.operators import cells as cells_mod

GAP_S = 1_800  # time break: 30 min without a ping opens a new segment
JUMP_E7 = 1_000_000  # spatial break: a >= ~111 km step opens a new segment
STAY_STEP_E7 = 10_000  # dwell: consecutive steps under ~1.1 km
STAY_MIN_S = 600  # ... lasting at least 10 minutes


def _epoch(c):
    # parquet naive timestamps are NTZ; under the pinned UTC session tz the
    # NTZ->LTZ cast is the identity, ->long is epoch seconds (floors) —
    # matching DuckDB floor(epoch(ts)) (same discipline as sessionize_batch)
    return c.cast("timestamp_ltz").cast("long")


def segment_tracks(
    tracks: DataFrame, gap_s: int = GAP_S, jump_e7: int = JUMP_E7
) -> DataFrame:
    """Per-ping segmentation: adds ``seg_seq`` (1-based per entity) and
    ``step_len`` (floor'd Euclidean step from the previous ping, 0 at
    segment starts so segment path lengths never cross a break)."""
    w = Window.partitionBy("entity_id").orderBy("seq")
    pl_ts = F.lag("ts").over(w)
    dx = F.col("lat_e7") - F.lag("lat_e7").over(w)
    dy = F.col("lon_e7") - F.lag("lon_e7").over(w)
    step2 = dx * dx + dy * dy
    new_seg = (
        pl_ts.isNull()
        | ((_epoch(F.col("ts")) - _epoch(pl_ts)) > F.lit(gap_s))
        | (step2 > F.lit(jump_e7 * jump_e7))
    )
    return (
        tracks.withColumn("_new", new_seg.cast("int"))
        .withColumn("_step2", step2)
        .withColumn(
            "seg_seq",
            F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn(
            "step_len",
            F.when(F.col("_new") == 1, F.lit(0))
            .otherwise(F.floor(F.sqrt(F.col("_step2"))))
            .cast("long"),
        )
        .drop("_new", "_step2")
    )


def segment_stats(segged: DataFrame, res: int = 8) -> DataFrame:
    """Per-segment: ping count, time span, integer path length, and the
    origin/destination hex cells (first/last ping by seq)."""
    agg = segged.groupBy("entity_id", "seg_seq").agg(
        F.count(F.lit(1)).alias("n_pings"),
        F.min("ts").alias("t_start"),
        F.max("ts").alias("t_end"),
        F.sum("step_len").alias("path_len"),
        F.min_by("lat_e7", "seq").alias("_olat"),
        F.min_by("lon_e7", "seq").alias("_olon"),
        F.max_by("lat_e7", "seq").alias("_dlat"),
        F.max_by("lon_e7", "seq").alias("_dlon"),
    )
    return agg.select(
        "entity_id",
        "seg_seq",
        "n_pings",
        "t_start",
        "t_end",
        "path_len",
        cells_mod.hex_cell_expr(F.col("_olat"), F.col("_olon"), res).alias("o_cell"),
        cells_mod.hex_cell_expr(F.col("_dlat"), F.col("_dlon"), res).alias("d_cell"),
    )


def stay_points(
    segged: DataFrame,
    step_eps_e7: int = STAY_STEP_E7,
    min_dur_s: int = STAY_MIN_S,
) -> DataFrame:
    """Dwell detection: maximal runs of consecutive small steps (arriving
    step <= eps, within one segment) lasting >= ``min_dur_s``. A run's
    pings are those whose ARRIVING step is small; the centroid is the
    exact integer mean (sum div n) of those pings."""
    small = (F.col("step_len") > F.lit(0)) & (
        F.col("step_len") <= F.lit(step_eps_e7)
    )
    w = Window.partitionBy("entity_id", "seg_seq").orderBy("seq")
    marked = segged.withColumn("_brk", (~small).cast("int")).withColumn(
        "run_id", F.sum("_brk").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    runs = (
        marked.filter(small)
        .groupBy("entity_id", "seg_seq", "run_id")
        .agg(
            F.count(F.lit(1)).alias("n_pings"),
            F.min("ts").alias("t_start"),
            F.max("ts").alias("t_end"),
            F.sum("lat_e7").alias("_slat"),
            F.sum("lon_e7").alias("_slon"),
        )
        .filter(
            (_epoch(F.col("t_end")) - _epoch(F.col("t_start")))
            >= F.lit(min_dur_s)
        )
    )
    sw = Window.partitionBy("entity_id").orderBy("seg_seq", "run_id")
    return runs.select(
        "entity_id",
        F.row_number().over(sw).cast("long").alias("stay_seq"),
        "n_pings",
        "t_start",
        "t_end",
        F.expr("_slat div n_pings").alias("c_lat"),
        F.expr("_slon div n_pings").alias("c_lon"),
    )


def od_matrix(stats: DataFrame) -> DataFrame:
    """Origin-destination flows between segment endpoint cells: trip count
    plus the flow's observed time window (first departure, last arrival)."""
    return stats.groupBy("o_cell", "d_cell").agg(
        F.count(F.lit(1)).alias("n_trips"),
        F.min("t_start").alias("t_first"),
        F.max("t_end").alias("t_last"),
    )


RESAMPLE_STEP_S = 30  # resampling cadence (datagen pings arrive at 60-90s)

# coordinate shifts making interpolation numerators non-negative so the
# engines' integer divisions agree (Spark `div` truncates toward zero,
# DuckDB `//` floors — equal only for non-negative numerators; the same
# discipline as distjoin's +2e9 grid shift)
_SHIFT_LAT = 900_000_000
_SHIFT_LON = 1_800_000_000


def resample_tracks(
    segged: DataFrame, step_s: int = RESAMPLE_STEP_S
) -> DataFrame:
    """(entity_id, seg_seq, e, r_lat, r_lon): the entity's position at
    every step-aligned epoch (``e % step_s == 0``) covered by each
    segment, linearly interpolated between the bracketing pings — the
    alignment operator that puts every entity on one shared clock (the
    prerequisite for cross-entity joins at matching timestamps, cadence
    normalization across heterogeneous feeds, and fixed-rate model
    inputs).

    EXACT INTEGER: the interpolated coordinate is
    ``(shift(p0)*(t1-e) + shift(p1)*(e-t0)) div (t1-t0) - shift`` — both
    weights are non-negative and the shift makes both coordinates
    non-negative, so the truncating/flooring division split between the
    engines cannot diverge, and results are bit-stable everywhere.
    Headroom: shifted lon < 2^32 and (t1-e)+(e-t0) = t1-t0 <= gap_s (a
    larger gap opens a new segment), so the numerator is < 2^32 * gap_s
    — int64-safe for any sane gap. Epoch ownership is half-open
    [t0, t1) per consecutive-ping interval (the segment's last ping owns
    only its own epoch, emitted exactly when aligned), so each aligned
    epoch is produced exactly once per segment.

    Scale shape: one lead() over the (entity, seg) window the segment
    family already pays, then a pure projection — the sequence explode
    fans out by at most gap_s/step_s per ping and never reshuffles.
    """
    w = Window.partitionBy("entity_id", "seg_seq").orderBy("seq")
    t0 = _epoch(F.col("ts"))
    base = segged.select(
        "entity_id",
        "seg_seq",
        t0.alias("t0"),
        F.lead(t0).over(w).alias("t1"),
        "lat_e7",
        "lon_e7",
        F.lead("lat_e7").over(w).alias("nlat"),
        F.lead("lon_e7").over(w).alias("nlon"),
    )
    e0 = F.expr(f"((t0 + {step_s - 1}) div {step_s}) * {step_s}")
    hi = F.coalesce(F.col("t1") - 1, F.col("t0"))
    epochs = F.when(
        e0 <= hi, F.sequence(e0, hi, F.lit(step_s))
    ).otherwise(F.array().cast("array<long>"))
    ex = base.select(
        "entity_id", "seg_seq", "t0", "t1", "lat_e7", "lon_e7",
        "nlat", "nlon", F.explode(epochs).alias("e"),
    )

    def interp(p0: str, p1: str, shift: int):
        return F.when(F.col("t1").isNull(), F.col(p0)).otherwise(
            F.expr(
                f"(({p0} + {shift}) * (t1 - e) + ({p1} + {shift}) * (e - t0))"
                f" div (t1 - t0) - {shift}"
            )
        )

    return ex.select(
        "entity_id",
        "seg_seq",
        "e",
        interp("lat_e7", "nlat", _SHIFT_LAT).alias("r_lat"),
        interp("lon_e7", "nlon", _SHIFT_LON).alias("r_lon"),
    )


SIMPLIFY_EPS_E7 = 20_000  # simplification tolerance (~2.2 km)


def _pt_seg_dist2(px, py, ax, ay, bx, by, dx, dy, chord2):
    """Exact squared point-to-segment distance as a rational (num, den):
    endpoint distance (den 1) when P projects outside AB, else cross²/|AB|²."""
    ux, uy = px - ax, py - ay
    if chord2 == 0:
        return ux * ux + uy * uy, 1
    t = ux * dx + uy * dy
    if t <= 0:
        return ux * ux + uy * uy, 1
    if t >= chord2:
        vx, vy = px - bx, py - by
        return vx * vx + vy * vy, 1
    cr = ux * dy - uy * dx
    return cr * cr, chord2


def simplify_tracks(segged: DataFrame, eps_e7: int = SIMPLIFY_EPS_E7) -> DataFrame:
    """Douglas-Peucker polyline simplification per (entity, segment):
    keeps segment endpoints plus every ping whose perpendicular deviation
    from the current chord exceeds ``eps_e7``, guaranteeing every dropped
    ping lies within eps of the simplified polyline.

    DP's recursion splits on a data-dependent farthest point, so this is
    the documented custom-operator path (applyInPandas per segment group
    — task state is one segment, the family's standard contract). The
    farthest-point metric is true point-to-SEGMENT distance — NOT the
    textbook perpendicular-to-infinite-line shortcut, which silently
    forfeits the within-eps guarantee for points projecting beyond the
    chord (the tests' exact verifier catches exactly that). Distances are
    EXACT rationals ``(num, den)`` compared by cross-multiplication in
    arbitrary-precision Python ints (cross² overflows int64 at planar
    coordinate spans), ties broken toward the lowest seq — deterministic
    and partitioning-invariant, like everything else behind the hash
    gates. Pure-Python recursive oracle + exact within-eps verifier in
    tests/test_trajectory.py."""

    def _dp(pdf):
        pdf = pdf.sort_values("seq").reset_index(drop=True)
        xs = [int(v) for v in pdf["lat_e7"]]
        ys = [int(v) for v in pdf["lon_e7"]]
        n = len(xs)
        keep = [False] * n
        keep[0] = keep[n - 1] = True
        eps2 = eps_e7 * eps_e7
        stack = [(0, n - 1)]
        while stack:
            a, b = stack.pop()
            if b - a < 2:
                continue
            ax, ay = xs[a], ys[a]
            dx, dy = xs[b] - ax, ys[b] - ay
            chord2 = dx * dx + dy * dy
            bn, bd, bi = -1, 1, -1  # best dist² as num/den
            for i in range(a + 1, b):
                num, den = _pt_seg_dist2(
                    xs[i], ys[i], ax, ay, xs[b], ys[b], dx, dy, chord2
                )
                if num * bd > bn * den:
                    bn, bd, bi = num, den, i
            if bn > eps2 * bd:
                keep[bi] = True
                stack.append((a, bi))
                stack.append((bi, b))
        return pdf[keep]

    cols = ["entity_id", "seg_seq", "seq", "ts", "lat_e7", "lon_e7"]
    src = segged.select(*cols)
    return src.groupBy("entity_id", "seg_seq").applyInPandas(
        lambda pdf: _dp(pdf), schema=src.schema
    )


def route_signatures(segged: DataFrame, res: int = 8) -> DataFrame:
    """Per-segment route signature: the ordered sequence of DISTINCT
    CONSECUTIVE hex cells the track traverses (map-matching to the cell
    lattice). Change points come from a lag over the same (entity, seq)
    window the segmenter already established — no new shuffle shape —
    and the ordered array is built shuffle-safely as
    ``array_sort(collect_list(struct(seq, cell)))`` then projected
    (collect_list alone is not order-deterministic). Pure JVM."""
    cell = cells_mod.hex_cell_expr(F.col("lat_e7"), F.col("lon_e7"), res)
    w = Window.partitionBy("entity_id", "seg_seq").orderBy("seq")
    marked = segged.select("entity_id", "seg_seq", "seq", cell.alias("cell"))
    prev = F.lag("cell").over(w)
    changes = marked.withColumn("_prev", prev).filter(
        F.col("_prev").isNull() | (F.col("_prev") != F.col("cell"))
    )
    return changes.groupBy("entity_id", "seg_seq").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("seq", "cell"))),
            lambda x: x["cell"],
        ).alias("route"),
        F.count(F.lit(1)).cast("long").alias("n_cells"),
    )


def route_frequency(routes: DataFrame) -> DataFrame:
    """Route mining: how many segments traverse each exact cell sequence.
    One shuffle keyed by the route array itself."""
    return routes.groupBy("route").agg(
        F.count(F.lit(1)).cast("long").alias("n_segments")
    )


# --- DuckDB oracle ---------------------------------------------------------


def _duckdb_segged_sql(tracks_rel: str, gap_s: int, jump_e7: int) -> str:
    j2 = jump_e7 * jump_e7
    return f"""
SELECT *,
       CASE WHEN _new = 1 THEN 0
            ELSE floor(sqrt(_step2))::BIGINT END AS step_len,
       sum(_new) OVER (PARTITION BY entity_id ORDER BY seq
                       ROWS UNBOUNDED PRECEDING)::BIGINT AS seg_seq
FROM (
  SELECT *,
         CASE WHEN _pts IS NULL
                   OR floor(epoch(ts))::BIGINT - floor(epoch(_pts))::BIGINT > {gap_s}
                   OR _step2 > {j2}
              THEN 1 ELSE 0 END AS _new
  FROM (
    SELECT *,
           lag(ts) OVER (PARTITION BY entity_id ORDER BY seq) AS _pts,
           (lat_e7 - lag(lat_e7) OVER (PARTITION BY entity_id ORDER BY seq))
             * (lat_e7 - lag(lat_e7) OVER (PARTITION BY entity_id ORDER BY seq))
           + (lon_e7 - lag(lon_e7) OVER (PARTITION BY entity_id ORDER BY seq))
             * (lon_e7 - lag(lon_e7) OVER (PARTITION BY entity_id ORDER BY seq))
             AS _step2
    FROM {tracks_rel}
  )
)
"""


def duckdb_segment_stats_sql(
    tracks_rel: str,
    res: int = 8,
    gap_s: int = GAP_S,
    jump_e7: int = JUMP_E7,
) -> str:
    from jimmy_spark.functions import hexgrid

    seg = _duckdb_segged_sql(tracks_rel, gap_s, jump_e7)
    ends = f"""
SELECT entity_id, seg_seq, count(*) AS n_pings,
       min(ts) AS t_start, max(ts) AS t_end,
       sum(step_len)::BIGINT AS path_len,
       arg_min(lat_e7, seq) AS olat, arg_min(lon_e7, seq) AS olon,
       arg_max(lat_e7, seq) AS dlat, arg_max(lon_e7, seq) AS dlon
FROM ({seg}) GROUP BY entity_id, seg_seq
"""
    o_hex = hexgrid.duckdb_hex_query(ends, "entity_id, seg_seq", "olat", "olon", (res,))
    d_hex = hexgrid.duckdb_hex_query(ends, "entity_id, seg_seq", "dlat", "dlon", (res,))
    return f"""
SELECT e.entity_id, e.seg_seq, e.n_pings, e.t_start, e.t_end, e.path_len,
       o.hex_r{res} AS o_cell, d.hex_r{res} AS d_cell
FROM ({ends}) e
JOIN ({o_hex}) o USING (entity_id, seg_seq)
JOIN ({d_hex}) d USING (entity_id, seg_seq)
"""


def duckdb_resample_sql(
    tracks_rel: str,
    step_s: int = RESAMPLE_STEP_S,
    gap_s: int = GAP_S,
    jump_e7: int = JUMP_E7,
) -> str:
    """Independent twin of ``resample_tracks``: same half-open epoch
    ownership via a lateral generate_series, same shifted non-negative
    interpolation (DuckDB ``//`` floors, Spark ``div`` truncates — equal
    on the non-negative numerators the shift guarantees)."""
    seg = _duckdb_segged_sql(tracks_rel, gap_s, jump_e7)
    return f"""
WITH p AS (
  SELECT entity_id, seg_seq, floor(epoch(ts))::BIGINT AS t0, lat_e7, lon_e7,
         lead(floor(epoch(ts))::BIGINT) OVER w AS t1,
         lead(lat_e7) OVER w AS nlat, lead(lon_e7) OVER w AS nlon
  FROM ({seg})
  WINDOW w AS (PARTITION BY entity_id, seg_seq ORDER BY seq)
), g AS (
  SELECT *, ((t0 + {step_s - 1}) // {step_s}) * {step_s} AS e0,
         CASE WHEN t1 IS NULL THEN t0 ELSE t1 - 1 END AS hi
  FROM p
), x AS (
  -- scalar-range unnest: DuckDB's table-function range rejects lateral
  -- column parameters, and both series functions error (not empty) on
  -- start > stop, hence the CASE guard
  SELECT entity_id, seg_seq, t0, t1, lat_e7, lon_e7, nlat, nlon,
         unnest(CASE WHEN hi >= e0 THEN range(e0, hi + 1, {step_s})
                     ELSE CAST([] AS BIGINT[]) END) AS e
  FROM g
)
SELECT entity_id, seg_seq, e,
       CASE WHEN t1 IS NULL THEN lat_e7
            ELSE ((lat_e7 + {_SHIFT_LAT}) * (t1 - e)
                  + (nlat + {_SHIFT_LAT}) * (e - t0)) // (t1 - t0)
                 - {_SHIFT_LAT} END AS r_lat,
       CASE WHEN t1 IS NULL THEN lon_e7
            ELSE ((lon_e7 + {_SHIFT_LON}) * (t1 - e)
                  + (nlon + {_SHIFT_LON}) * (e - t0)) // (t1 - t0)
                 - {_SHIFT_LON} END AS r_lon
FROM x
"""


def duckdb_route_signatures_sql(
    tracks_rel: str,
    res: int = 8,
    gap_s: int = GAP_S,
    jump_e7: int = JUMP_E7,
) -> str:
    from jimmy_spark.functions import hexgrid

    seg = _duckdb_segged_sql(tracks_rel, gap_s, jump_e7)
    cells = hexgrid.duckdb_hex_query(
        seg, "entity_id, seg_seq, seq", "lat_e7", "lon_e7", (res,)
    )
    return f"""
WITH cells AS ({cells}),
marked AS (
  SELECT *, lag(hex_r{res}) OVER (PARTITION BY entity_id, seg_seq
                                  ORDER BY seq) AS _prev
  FROM cells
)
SELECT entity_id, seg_seq,
       list(hex_r{res} ORDER BY seq) AS route,
       count(*)::BIGINT AS n_cells
FROM marked
WHERE _prev IS NULL OR _prev != hex_r{res}
GROUP BY entity_id, seg_seq
"""


def duckdb_route_frequency_sql(tracks_rel: str, res: int = 8) -> str:
    return f"""
SELECT route, count(*)::BIGINT AS n_segments
FROM ({duckdb_route_signatures_sql(tracks_rel, res)})
GROUP BY route
"""


def duckdb_stay_points_sql(
    tracks_rel: str,
    step_eps_e7: int = STAY_STEP_E7,
    min_dur_s: int = STAY_MIN_S,
    gap_s: int = GAP_S,
    jump_e7: int = JUMP_E7,
) -> str:
    seg = _duckdb_segged_sql(tracks_rel, gap_s, jump_e7)
    return f"""
WITH segged AS ({seg}),
marked AS (
  SELECT *,
         sum(CASE WHEN step_len > 0 AND step_len <= {step_eps_e7}
                  THEN 0 ELSE 1 END)
           OVER (PARTITION BY entity_id, seg_seq ORDER BY seq
                 ROWS UNBOUNDED PRECEDING) AS run_id
  FROM segged
),
runs AS (
  SELECT entity_id, seg_seq, run_id, count(*) AS n_pings,
         min(ts) AS t_start, max(ts) AS t_end,
         sum(lat_e7) AS slat, sum(lon_e7) AS slon
  FROM marked
  WHERE step_len > 0 AND step_len <= {step_eps_e7}
  GROUP BY entity_id, seg_seq, run_id
  HAVING floor(epoch(max(ts)))::BIGINT - floor(epoch(min(ts)))::BIGINT >= {min_dur_s}
)
SELECT entity_id,
       row_number() OVER (PARTITION BY entity_id ORDER BY seg_seq, run_id)::BIGINT
         AS stay_seq,
       n_pings, t_start, t_end,
       (slat // n_pings)::BIGINT AS c_lat, (slon // n_pings)::BIGINT AS c_lon
FROM runs
"""


def segment_hulls(segged: DataFrame) -> DataFrame:
    """Convex hull per (entity, segment): the footprint summary of a
    track segment — hull vertex count, doubled shoelace area, and the
    floor'd-integer hull perimeter (same order-canonical discipline as
    ``path_len``).

    Monotone chain on exact integer coordinates: orientation tests and
    the shoelace sum run in arbitrary-precision Python ints (a cross
    product of e7 deltas already needs 62 bits; the shoelace SUM would
    overflow int64 at continental extents), then ``area2`` is emitted as
    int64 — valid while footprint_extent^2 * hull_size < 2^63, true for
    any physically moving entity (a 1000 km x 1000 km footprint with a
    100-vertex hull is ~1e16). Collinear segments degrade to a 2-vertex
    hull with area 0; single-ping segments to 1 vertex. applyInPandas
    per segment group (task state = one segment, the family's standard
    contract); deterministic for any partitioning since the hull is a
    pure function of the point SET. Independent gift-wrapping oracle +
    exact all-points-inside verifier in tests/test_trajectory.py.
    """

    def _hull(pts):
        # Andrew's monotone chain over the deduplicated sorted point set;
        # strict turns only, so collinear boundary points drop out
        pts = sorted(set(pts))
        if len(pts) <= 2:
            return pts
        def half(seq):
            out = []
            for p in seq:
                while len(out) >= 2:
                    ox, oy = out[-2]
                    ax, ay = out[-1]
                    if (ax - ox) * (p[1] - oy) - (ay - oy) * (p[0] - ox) <= 0:
                        out.pop()
                    else:
                        break
                out.append(p)
            return out
        lower = half(pts)
        upper = half(pts[::-1])
        return lower[:-1] + upper[:-1]

    def _stats(pdf):
        hull = _hull(
            list(zip((int(v) for v in pdf["lon_e7"]), (int(v) for v in pdf["lat_e7"])))
        )
        m = len(hull)
        area2 = 0
        perim = 0
        if m >= 2:
            for i in range(m):
                x1, y1 = hull[i]
                x2, y2 = hull[(i + 1) % m]
                area2 += x1 * y2 - x2 * y1
                perim += math.isqrt((x2 - x1) ** 2 + (y2 - y1) ** 2)
            if m == 2:
                perim //= 2  # the 2-vertex "ring" walks the chord twice
        return pd.DataFrame(
            {
                "entity_id": [int(pdf["entity_id"].iloc[0])],
                "seg_seq": [int(pdf["seg_seq"].iloc[0])],
                "n_pings": [len(pdf)],
                "hull_n": [m],
                "area2": [abs(area2)],
                "perim_len": [perim],
            }
        )

    return segged.select("entity_id", "seg_seq", "lat_e7", "lon_e7").groupBy(
        "entity_id", "seg_seq"
    ).applyInPandas(
        _stats,
        "entity_id long, seg_seq long, n_pings long, hull_n long, "
        "area2 long, perim_len long",
    )
