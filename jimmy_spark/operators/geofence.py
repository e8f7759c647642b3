"""Geofencing: zone-visit detection over moving-object tracks.

The fleet-analytics composite the engine's spatial + temporal primitives
were built for: which entities entered which polygon zones, when, and for
how long. Reference analogue: jimmy has no moving-object surface; the
polygon-membership half reuses the PIP join's exact integer ray-cast
(operators/pip.py — SURVEY §2.4's broadcast map join), and the episode
half is the same gaps-and-islands discipline as trajectory segmentation
and convoy mining.

Semantics
---------
A VISIT is a maximal run of consecutive-``seq`` pings of one entity
inside one zone (on-edge = inside, the engine's PIP tie rule). Visits
carry entry/exit timestamps, dwell seconds, and a per-(entity, zone)
visit ordinal. A gap in the ping feed's per-entity ``seq`` ends the run
(missing data = unknown whereabouts — a conservative visit split, never
a fabricated dwell).

Plan shape (10^12-ping design point)
------------------------------------
1. PIP: the broadcast R-tree lane (``pip_join_rtree``) — a narrow
   mapInPandas, NO shuffle; ``carry_cols`` pushes (entity_id, seq, ts)
   through the match so the visit stage never re-joins the ping scan.
   (For zone sets too large to broadcast, swap in ``pip_join_cells`` —
   same output contract, one shuffled grid join.)
2. Islands: one shuffle on (entity_id, zone); within a pair,
   ``seq - row_number`` is constant along a consecutive run. The window
   partitions by (entity, zone) over MATCHED pings only — bounded by
   time inside zones, not ping volume (an entity that never enters a
   zone contributes zero rows to the shuffle).
3. The visit frame is tiny; the per-(entity, zone) visit ordinal is a
   second window over it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jimmy_spark.operators import pip


def zone_visits(
    pings: DataFrame,
    zones_pdf: pd.DataFrame,
    id_col: str = "entity_id",
    seq_col: str = "seq",
    ts_col: str = "ts",
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
) -> DataFrame:
    """Visits per (entity, zone): (entity_id, zone_id, visit_seq,
    seq_first, seq_last, n_pings, t_enter, t_exit, dwell_s)."""
    keyed = pings.select(
        F.concat_ws("_", F.col(id_col), F.col(seq_col)).alias("_pid"),
        F.col(lat_col),
        F.col(lon_col),
        F.col(id_col).alias("entity_id"),
        F.col(seq_col).alias("seq"),
        F.col(ts_col).alias("ts"),
    )
    matched = pip.pip_join_rtree(
        keyed,
        zones_pdf,
        id_col="_pid",
        lat_col=lat_col,
        lon_col=lon_col,
        carry_cols=("entity_id", "seq", "ts"),
    ).withColumnRenamed("polygon_id", "zone_id").drop("_pid")
    rn = F.row_number().over(
        Window.partitionBy("entity_id", "zone_id").orderBy("seq")
    )
    ep = lambda c: F.col(c).cast("timestamp_ltz").cast("long")  # noqa: E731
    visits = (
        matched.withColumn("_island", F.col("seq") - rn)
        .groupBy("entity_id", "zone_id", "_island")
        .agg(
            F.min("seq").alias("seq_first"),
            F.max("seq").alias("seq_last"),
            F.count(F.lit(1)).alias("n_pings"),
            F.min("ts").alias("t_enter"),
            F.max("ts").alias("t_exit"),
        )
        .drop("_island")
    )
    vseq = F.row_number().over(
        Window.partitionBy("entity_id", "zone_id").orderBy("seq_first")
    )
    return visits.select(
        "entity_id",
        "zone_id",
        vseq.cast("long").alias("visit_seq"),
        "seq_first",
        "seq_last",
        "n_pings",
        "t_enter",
        "t_exit",
        (ep("t_exit") - ep("t_enter")).alias("dwell_s"),
    )


def duckdb_visits_sql(pings_rel: str, zones_path: str) -> str:
    """Oracle twin: the PIP integer ray-cast SQL (bbox prefilter + HUGEINT
    crossing counts, operators/pip.py duckdb_pip_sql) keyed by a synthetic
    ping id, joined back to the feed, then the same islands arithmetic."""
    pts = (
        "SELECT entity_id::VARCHAR || '_' || seq::VARCHAR AS pid, "
        f"lat_e7, lon_e7 FROM {pings_rel}"
    )
    return f"""
WITH inz AS ({pip.duckdb_pip_sql(pts, zones_path, id_col="pid")}),
m AS (
  SELECT p.entity_id, p.seq, p.ts, z.polygon_id AS zone_id
  FROM {pings_rel} p
  JOIN inz z ON p.entity_id::VARCHAR || '_' || p.seq::VARCHAR = z.pid
),
isl AS (
  SELECT *, seq - row_number() OVER (
      PARTITION BY entity_id, zone_id ORDER BY seq) AS island
  FROM m
),
v AS (
  SELECT entity_id, zone_id,
         min(seq) AS seq_first, max(seq) AS seq_last,
         count(*)::BIGINT AS n_pings,
         min(ts) AS t_enter, max(ts) AS t_exit,
         floor(epoch(max(ts)))::BIGINT - floor(epoch(min(ts)))::BIGINT
           AS dwell_s
  FROM isl GROUP BY entity_id, zone_id, island
)
SELECT entity_id, zone_id,
       row_number() OVER (
         PARTITION BY entity_id, zone_id ORDER BY seq_first
       )::BIGINT AS visit_seq,
       seq_first, seq_last, n_pings, t_enter, t_exit, dwell_s
FROM v
"""
