"""Spatio-temporal contact join + convoy mining over moving-object tracks.

The missing member of the engine's join family: distance_join pairs STATIC
points (operators/distjoin.py); moving objects need pairs close in space
AND time — the "contact" / co-location join of moving-object databases
(contact tracing, co-travel analysis, convoy detection). Reference
analogue: jimmy's only pairwise operator is the O(n^2) fuzzy-title theta
join (/root/reference/src/jimmy/common.py:373-400); the scalable shape
extends the square-grid blocking of distance_join_grid with a third,
temporal, key axis.

Semantics
---------
A CONTACT is a ping pair (a, b) with a.entity_id < b.entity_id,
|epoch(a.ts) - epoch(b.ts)| <= tau, and squared planar distance <= d^2
(both bounds inclusive, matching distance_join). Contacts aggregate per
(pair, time bucket); a CONVOY is a maximal run of consecutive contact
buckets of length >= k_min for one pair.

Plan shape (10^12-ping design point)
------------------------------------
1. Key = (gx, gy, tb): square grid of width ``w >= d`` (the same
   output-proportional blocking as distance_join_grid — candidates scale
   with density * d^2 * tau, never all-pairs) plus a time-bucket axis of
   width ``2 * tau``.
2. LEFT explodes each ping to its exact reachable key BOX — per axis a
   codegen'd ``sequence(floor((x - d) / w), floor((x + d) / w))``, the
   precise set of blocking keys a qualifying partner's home can occupy.
   At the default ``w = 4d`` / bucket ``2*tau`` the expected fanout is
   1.5 x 1.5 x 2 = 4.5 rows per ping (a fixed ±1 neighborhood at
   ``w = d`` would be 27; the r5 default ``w = 2d`` was 8 — the r6 width
   sweep on the dense contacts fixture measured 4d ~12% faster end to
   end, identical output). The wider cell pays with a larger verify
   set, which is a codegen'd int64 filter, not shuffle. RIGHT keeps each ping at its home key. ONE
   shuffled equality join on the composite key; exact int64 verify.
3. Bucket aggregation is one map-side-combinable groupBy; convoy mining
   is the gaps-and-islands window over the (already tiny) per-pair bucket
   frame — the window partitions by pair, and a pair's bucket count is
   bounded by the feed's time span / tau, never by ping volume.

Exactly-once BY CONSTRUCTION (no distinct): the per-axis sequence bounds
are monotone floors, so a qualifying partner's home key lies inside the
left ping's enumerated box (per axis: x' in [x-d, x+d] implies
floor(x'/w) in [floor((x-d)/w), floor((x+d)/w)]); the box keys are
consecutive integers per axis — all distinct — and a ping has exactly one
home key, so each qualifying ordered pair matches exactly one
(box-key, home-key) row pair. The ``a.entity < b.entity`` filter keeps
one orientation and drops same-entity pairs. The aggregation bucket
``tb = epoch div tau`` is decoupled from the blocking bucket (``2*tau``),
so tuning the blocking never changes result semantics.

Skew: hot (cell, bucket) keys ride AQE skew-join splitting; true output
over a crowd is inherently quadratic in its instantaneous population —
every emitted pair is a real contact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jimmy_spark.operators.distjoin import _GRID_OFF


def contact_join(
    pings: DataFrame,
    d: int,
    tau: int,
    width: int | None = None,
    id_col: str = "entity_id",
    ts_col: str = "ts",
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
) -> DataFrame:
    """All contact ping pairs, each exactly once.

    Output: (a_id, b_id, tb, a_ts, b_ts, dist2) with a_id < b_id; ``tb``
    is the LEFT (lower-entity) ping's time bucket ``epoch(a_ts) div tau``
    — the deterministic bucket key the aggregation and the DuckDB twin
    both use. ``d`` is in e7 fixed-point units, ``tau`` in seconds.
    """
    # default width 4d (r6): measured sweep on the dense contacts
    # fixture (1M co-moving pings, 207k real contacts) — 2d 11.0s /
    # 3d 10.4 / 4d 9.4-9.8 / 6d 9.7 / 8d 10.6 / 12d 14.2, identical
    # output at every width (blocking never changes semantics).
    # Wider cells cut the explode fanout (expected cells/axis
    # 1 + 2d/w: 2.0 -> 1.5) and shuffle bytes; the larger verify set
    # is a codegen'd int64 filter. Beyond ~6d verify volume wins.
    w = int(width if width is not None else 4 * d)
    if w < int(d):
        raise ValueError(f"grid width {w} must be >= d {d}")
    if tau <= 0:
        raise ValueError(f"tau must be positive, got {tau}")
    d, tau = int(d), int(tau)
    tb_w = 2 * tau  # blocking bucket; decoupled from the output tb
    # parquet naive timestamps are NTZ; under the pinned UTC session tz the
    # NTZ->LTZ cast is the identity, ->long is epoch seconds — matching
    # DuckDB floor(epoch(ts)) (same discipline as trajectory._epoch)
    ep_sql = f"cast(cast({ts_col} as timestamp_ltz) as long)"
    epoch = F.expr(ep_sql)
    gx = F.expr(f"({lon_col} + {_GRID_OFF}) div {w}")
    gy = F.expr(f"({lat_col} + {_GRID_OFF}) div {w}")
    tb = F.expr(f"{ep_sql} div {tb_w}")

    def _span(expr: str, reach: int, width_: int):
        # the exact per-axis key range a partner within `reach` can home in
        return F.expr(
            f"sequence(({expr} - {reach}) div {width_}, "
            f"({expr} + {reach}) div {width_})"
        )

    left = pings.select(
        F.col(id_col).alias("a_id"),
        epoch.alias("a_ep"),
        F.col(ts_col).alias("a_ts"),
        F.col(lat_col).alias("a_lat"),
        F.col(lon_col).alias("a_lon"),
        _span(f"{lat_col} + {_GRID_OFF}", d, w).alias("_gys"),
        _span(ep_sql, tau, tb_w).alias("_tbs"),
        F.explode(_span(f"{lon_col} + {_GRID_OFF}", d, w)).alias("gx"),
    ).select(
        "a_id", "a_ep", "a_ts", "a_lat", "a_lon", "gx", "_tbs",
        F.explode("_gys").alias("gy"),
    ).select(
        "a_id", "a_ep", "a_ts", "a_lat", "a_lon", "gx", "gy",
        F.explode("_tbs").alias("tb"),
    )
    right = pings.select(
        F.col(id_col).alias("b_id"),
        epoch.alias("b_ep"),
        F.col(ts_col).alias("b_ts"),
        F.col(lat_col).alias("b_lat"),
        F.col(lon_col).alias("b_lon"),
        gx.alias("gx"),
        gy.alias("gy"),
        tb.alias("tb"),
    )
    dx = (F.col("a_lon") - F.col("b_lon")).cast("long")
    dy = (F.col("a_lat") - F.col("b_lat")).cast("long")
    dist2 = dx * dx + dy * dy
    dt = F.col("a_ep") - F.col("b_ep")
    return (
        left.join(right, ["gx", "gy", "tb"])
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(F.abs(dt) <= F.lit(int(tau)))
        .filter(dist2 <= F.lit(int(d) * int(d)))
        .select(
            "a_id", "b_id",
            F.expr(f"a_ep div {int(tau)}").alias("tb"),
            "a_ts", "b_ts",
            dist2.alias("dist2"),
        )
    )


def contact_buckets(contacts: DataFrame) -> DataFrame:
    """Contacts aggregated per (pair, bucket): one map-side-combinable
    groupBy. Output: (a_id, b_id, tb, n_contacts, t_start, t_end,
    min_dist2)."""
    return contacts.groupBy("a_id", "b_id", "tb").agg(
        F.count(F.lit(1)).alias("n_contacts"),
        F.min(F.least("a_ts", "b_ts")).alias("t_start"),
        F.max(F.greatest("a_ts", "b_ts")).alias("t_end"),
        F.min("dist2").alias("min_dist2"),
    )


def convoys(buckets: DataFrame, k_min: int) -> DataFrame:
    """Maximal runs of CONSECUTIVE contact buckets per pair, length >=
    ``k_min`` — gaps-and-islands: within a pair, ``tb - row_number`` is
    constant along a consecutive run and changes across every gap. The
    window partitions by pair over the bucket frame (already aggregated,
    bounded by time span / tau per pair — ping volume never reaches it).

    Output: (a_id, b_id, n_buckets, tb_first, tb_last, n_contacts,
    t_start, t_end)."""
    rn = F.row_number().over(
        Window.partitionBy("a_id", "b_id").orderBy("tb")
    )
    island = (F.col("tb") - rn).alias("_island")
    return (
        buckets.withColumn("_island", island)
        .groupBy("a_id", "b_id", "_island")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.min("tb").alias("tb_first"),
            F.max("tb").alias("tb_last"),
            F.sum("n_contacts").alias("n_contacts"),
            F.min("t_start").alias("t_start"),
            F.max("t_end").alias("t_end"),
        )
        .filter(F.col("n_buckets") >= F.lit(int(k_min)))
        .drop("_island")
    )


def contact_join_incremental(
    new: DataFrame,
    old: DataFrame,
    d: int,
    tau: int,
    width: int | None = None,
    id_col: str = "entity_id",
    ts_col: str = "ts",
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
) -> DataFrame:
    """Contacts touching at least one NEW ping — exactly the delta
    ``contacts(old ∪ new) - contacts(old)``, each pair once, normalized
    to the ``contact_join`` output contract (a_id < b_id, tb = the
    lower-entity ping's ``epoch div tau``). The incremental kernel behind
    the streaming contact maintenance (streaming/spatial.py
    run_contact_stream): per micro-batch only new x (new ∪ old) work
    runs; old x old contact mass is never recomputed.

    Construction mirrors ``distance_join_grid_incremental`` on the 3-axis
    box cover: the LEFT side box-explodes NEW pings only; the RIGHT side
    holds all pings at home keys, flagged ``_new``. A new-new pair would
    match from both orientations, so it is accepted only under the
    entity order; a new-old pair matches exactly once (old pings never
    appear on the left) and is accepted in whichever orientation it
    arrived, then normalized.
    """
    # default width 4d (r6): measured sweep on the dense contacts
    # fixture (1M co-moving pings, 207k real contacts) — 2d 11.0s /
    # 3d 10.4 / 4d 9.4-9.8 / 6d 9.7 / 8d 10.6 / 12d 14.2, identical
    # output at every width (blocking never changes semantics).
    # Wider cells cut the explode fanout (expected cells/axis
    # 1 + 2d/w: 2.0 -> 1.5) and shuffle bytes; the larger verify set
    # is a codegen'd int64 filter. Beyond ~6d verify volume wins.
    w = int(width if width is not None else 4 * d)
    if w < int(d):
        raise ValueError(f"grid width {w} must be >= d {d}")
    if tau <= 0:
        raise ValueError(f"tau must be positive, got {tau}")
    d, tau = int(d), int(tau)
    tb_w = 2 * tau
    ep_sql = f"cast(cast({ts_col} as timestamp_ltz) as long)"
    epoch = F.expr(ep_sql)
    gx = F.expr(f"({lon_col} + {_GRID_OFF}) div {w}")
    gy = F.expr(f"({lat_col} + {_GRID_OFF}) div {w}")
    tb = F.expr(f"{ep_sql} div {tb_w}")

    def _span(expr: str, reach: int, width_: int):
        return F.expr(
            f"sequence(({expr} - {reach}) div {width_}, "
            f"({expr} + {reach}) div {width_})"
        )

    left = new.select(
        F.col(id_col).alias("a_id"),
        epoch.alias("a_ep"),
        F.col(ts_col).alias("a_ts"),
        F.col(lat_col).alias("a_lat"),
        F.col(lon_col).alias("a_lon"),
        _span(f"{lat_col} + {_GRID_OFF}", d, w).alias("_gys"),
        _span(ep_sql, tau, tb_w).alias("_tbs"),
        F.explode(_span(f"{lon_col} + {_GRID_OFF}", d, w)).alias("gx"),
    ).select(
        "a_id", "a_ep", "a_ts", "a_lat", "a_lon", "gx", "_tbs",
        F.explode("_gys").alias("gy"),
    ).select(
        "a_id", "a_ep", "a_ts", "a_lat", "a_lon", "gx", "gy",
        F.explode("_tbs").alias("tb"),
    )

    def _base(df: DataFrame, is_new: bool) -> DataFrame:
        return df.select(
            F.col(id_col).alias("b_id"),
            epoch.alias("b_ep"),
            F.col(ts_col).alias("b_ts"),
            F.col(lat_col).alias("b_lat"),
            F.col(lon_col).alias("b_lon"),
            gx.alias("gx"),
            gy.alias("gy"),
            tb.alias("tb"),
            F.lit(is_new).alias("_new"),
        )

    right = _base(new, True).unionByName(_base(old, False))
    dx = (F.col("a_lon") - F.col("b_lon")).cast("long")
    dy = (F.col("a_lat") - F.col("b_lat")).cast("long")
    dist2 = dx * dx + dy * dy
    dt = F.col("a_ep") - F.col("b_ep")
    swap = F.col("a_id") > F.col("b_id")
    lo_ep = F.when(swap, F.col("b_ep")).otherwise(F.col("a_ep"))
    return (
        left.join(right, ["gx", "gy", "tb"])
        .filter(~F.col("_new") | (F.col("a_id") < F.col("b_id")))
        .filter(F.col("a_id") != F.col("b_id"))
        .filter(F.abs(dt) <= F.lit(tau))
        .filter(dist2 <= F.lit(d * d))
        .select(
            F.least("a_id", "b_id").alias("a_id"),
            F.greatest("a_id", "b_id").alias("b_id"),
            lo_ep.alias("_lo_ep"),
            F.when(swap, F.col("b_ts")).otherwise(F.col("a_ts")).alias("a_ts"),
            F.when(swap, F.col("a_ts")).otherwise(F.col("b_ts")).alias("b_ts"),
            dist2.alias("dist2"),
        )
        .withColumn("tb", F.expr(f"_lo_ep div {tau}"))
        .drop("_lo_ep")
        .select("a_id", "b_id", "tb", "a_ts", "b_ts", "dist2")
    )


# --------------------------------------------------------------------------
# DuckDB oracle twins: brute-force theta join (no blocking), same
# aggregation / islands arithmetic — an independent formulation.


def duckdb_contacts_sql(pings_rel: str, d: int, tau: int) -> str:
    """Brute-force contact pairs. Squares go through HUGEINT (DuckDB may
    reorder predicates, so int64 overflow on far pairs must be impossible
    rather than avoided); the surviving dist2 <= d^2 casts back to
    BIGINT."""
    dist2 = (
        "(a.lon_e7 - b.lon_e7)::HUGEINT * (a.lon_e7 - b.lon_e7) + "
        "(a.lat_e7 - b.lat_e7)::HUGEINT * (a.lat_e7 - b.lat_e7)"
    )
    return f"""
SELECT a.entity_id AS a_id, b.entity_id AS b_id,
       floor(epoch(a.ts))::BIGINT // {int(tau)} AS tb,
       a.ts AS a_ts, b.ts AS b_ts, ({dist2})::BIGINT AS dist2
FROM {pings_rel} a JOIN {pings_rel} b
  ON a.entity_id < b.entity_id
 AND abs(floor(epoch(a.ts))::BIGINT - floor(epoch(b.ts))::BIGINT)
       <= {int(tau)}
 AND {dist2} <= {int(d)}::HUGEINT * {int(d)}
"""


def duckdb_buckets_sql(pings_rel: str, d: int, tau: int) -> str:
    return f"""
SELECT a_id, b_id, tb, count(*)::BIGINT AS n_contacts,
       min(least(a_ts, b_ts)) AS t_start,
       max(greatest(a_ts, b_ts)) AS t_end,
       min(dist2) AS min_dist2
FROM ({duckdb_contacts_sql(pings_rel, d, tau)})
GROUP BY a_id, b_id, tb
"""


def duckdb_convoys_sql(pings_rel: str, d: int, tau: int, k_min: int) -> str:
    return f"""
WITH b AS ({duckdb_buckets_sql(pings_rel, d, tau)}),
isl AS (
  SELECT *, tb - row_number() OVER (
      PARTITION BY a_id, b_id ORDER BY tb) AS island
  FROM b
)
SELECT a_id, b_id, count(*)::BIGINT AS n_buckets,
       min(tb) AS tb_first, max(tb) AS tb_last,
       sum(n_contacts)::BIGINT AS n_contacts,
       min(t_start) AS t_start, max(t_end) AS t_end
FROM isl GROUP BY a_id, b_id, island
HAVING count(*) >= {int(k_min)}
"""
