"""Density-based spatial clustering (DBSCAN) over the fixed-point
geo plane — hot-spot / region discovery for a geo-tagged image corpus.

Reference scope note: jimmy has no clustering operator; this is part of
the engine's large-scale geospatial surface (SURVEY §2 engine additions),
composed entirely from operators that already carry driver-green oracles:
the within-distance pair join (operators/distjoin.py) and the
large-star/small-star connected components (operators/dedup.py:563).

Semantics (deterministic DBSCAN variant):

- ``N_eps(p)`` = points within Euclidean distance eps of p, p included.
- CORE point: ``|N_eps(p)| >= min_pts``.
- Clusters = connected components of the core-core within-eps graph;
  the cluster id is the minimum numeric point id in the component
  (the same min-label rule the dedup CC uses).
- BORDER point: non-core with at least one core point in ``N_eps``;
  it joins the MINIMUM cluster id among its core neighbors. (Textbook
  DBSCAN assigns borders to whichever cluster scans them first — scan-
  order-dependent; the min rule is the deterministic refinement, making
  output invariant to partitioning. Core/noise labels are identical to
  textbook DBSCAN; only multi-cluster border ties differ.)
- NOISE: everything else (cluster_id NULL).

Scale shape (10^12-point design):

1. eps-pair graph: ``distance_join_grid`` — grid width tracks eps, so
   candidates are output-proportional at any density; exactly-once, so
   degrees need no dedup.
2. degrees: one groupBy on the symmetrized pair stream (map-side
   combine; a hot spot's degree rows are its real neighbor mass).
3. components: alternating large-star/small-star — O(log^2 n) rounds
   regardless of cluster diameter (a city-length road of points is a
   long-diameter component; label propagation would need O(diameter)).
4. border attach: one broadcast-eligible join from non-core points to
   the core label frame via the pair stream, aggregated by min.

No collect, no crossJoin; every stage is a keyed shuffle or a bounded
iteration over checkpointed edges.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jimmy_spark.operators import dedup
from jimmy_spark.operators.distjoin import distance_join_grid


def dbscan(
    points: DataFrame,
    eps: int,
    min_pts: int,
    id_col: str = "image_id",
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
    num_id: Column | None = None,
    max_iter: int = 100,
) -> DataFrame:
    """(id_col, role, cluster_id) per input point.

    ``role`` in ('core', 'border', 'noise'); ``cluster_id`` is the
    minimum numeric id in the point's cluster, NULL for noise.
    ``num_id`` maps the id column to a unique long (defaults to a plain
    cast; 'img_%012d' ids pass a substring expression).
    """
    nid = (num_id if num_id is not None else F.col(id_col).cast("long")).alias("_nid")
    base = points.select(F.col(id_col), nid, F.col(lat_col), F.col(lon_col))

    pairs = distance_join_grid(
        base, d=eps, id_col="_nid", lat_col=lat_col, lon_col=lon_col
    ).select(F.col("a_id").alias("a"), F.col("b_id").alias("b"))
    # pairs are exactly-once, so the symmetrized stream IS the neighbor
    # multiset (minus self, folded into the threshold below)
    sym = pairs.select(F.col("a").alias("n"), F.col("b").alias("nbr")).unionByName(
        pairs.select(F.col("b").alias("n"), F.col("a").alias("nbr"))
    )
    deg = sym.groupBy("n").agg(F.count(F.lit(1)).alias("_deg"))

    labeled = base.join(deg, base["_nid"] == deg["n"], "left").select(
        id_col,
        "_nid",
        (F.coalesce("_deg", F.lit(0)) + F.lit(1) >= F.lit(int(min_pts))).alias("_core"),
    )

    core_ids = labeled.filter("_core").select("_nid")
    core_edges = (
        pairs.join(core_ids.withColumnRenamed("_nid", "a"), "a")
        .join(core_ids.withColumnRenamed("_nid", "b"), "b")
    )
    cc = dedup.connected_components(
        core_ids, core_edges, id_col="_nid", a_col="a", b_col="b", max_iter=max_iter
    ).withColumnsRenamed({"_nid": "_cid", "cluster_id": "_cluster"})

    core_out = (
        labeled.filter("_core")
        .join(cc, F.col("_nid") == F.col("_cid"))
        .select(id_col, F.lit("core").alias("role"), F.col("_cluster").alias("cluster_id"))
    )

    # border: min core-neighbor cluster via the (already materialized-shape)
    # pair stream; noise: no core neighbor
    core_labels = cc.withColumnRenamed("_cid", "nbr")
    border_min = (
        sym.join(labeled.filter(~F.col("_core")).select(F.col("_nid").alias("n")), "n")
        .join(core_labels, "nbr")
        .groupBy("n")
        .agg(F.min("_cluster").alias("_bcluster"))
    )
    noncore_out = (
        labeled.filter(~F.col("_core"))
        .join(border_min, labeled["_nid"] == border_min["n"], "left")
        .select(
            id_col,
            F.when(F.col("_bcluster").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.col("_bcluster").alias("cluster_id"),
        )
    )
    return core_out.unionByName(noncore_out)


def cluster_stats(
    points: DataFrame,
    labels: DataFrame,
    id_col: str = "image_id",
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
) -> DataFrame:
    """Per-cluster spatial profile from ``dbscan`` output: member count
    (core + border), core count, integer bbox, double centroid, and RMS
    radius from the centroid — one groupBy over the labeled join, fully
    map-side-combinable, no window. Noise rows (NULL cluster) drop out."""
    j = points.select(id_col, lat_col, lon_col).join(
        labels.filter(F.col("cluster_id").isNotNull()), id_col
    )
    return j.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum(F.when(F.col("role") == "core", 1).otherwise(0)).alias("n_core"),
        F.min(lat_col).alias("lat_min"),
        F.max(lat_col).alias("lat_max"),
        F.min(lon_col).alias("lon_min"),
        F.max(lon_col).alias("lon_max"),
        F.avg(lat_col).alias("lat_centroid"),
        F.avg(lon_col).alias("lon_centroid"),
        # RMS distance from the centroid = sqrt(var_pop(lat)+var_pop(lon));
        # var_pop's central-moment aggregation is numerically stable where
        # the naive E[x^2]-E[x]^2 cancels catastrophically for tight
        # clusters far from the origin (lat^2 ~ 1e18 vs double's ~9e15
        # integer resolution)
        F.sqrt(F.var_pop(lat_col) + F.var_pop(lon_col)).alias("rms_radius"),
    )


def duckdb_dbscan_sql(
    points_sql: str,
    eps: int,
    min_pts: int,
    id_col: str = "image_id",
    num_id_sql: str | None = None,
) -> str:
    """Independent DuckDB twin: brute-force HUGEINT eps-graph + recursive-
    CTE min-label components + the same border min rule. Quadratic — an
    oracle for test scale, not an execution path."""
    nid = num_id_sql or f"{id_col}::BIGINT"
    d2 = (
        "(a.lon_e7 - b.lon_e7)::HUGEINT * (a.lon_e7 - b.lon_e7) + "
        "(a.lat_e7 - b.lat_e7)::HUGEINT * (a.lat_e7 - b.lat_e7)"
    )
    return f"""
WITH RECURSIVE pts AS (SELECT {nid} AS nid, {id_col} AS pid, lat_e7, lon_e7 FROM ({points_sql})),
nbr AS (
  SELECT a.nid AS n, b.nid AS m FROM pts a JOIN pts b
  ON a.nid <> b.nid AND {d2} <= {int(eps)}::HUGEINT * {int(eps)}
),
deg AS (SELECT n, count(*) AS d FROM nbr GROUP BY n),
core AS (
  SELECT p.nid FROM pts p LEFT JOIN deg ON deg.n = p.nid
  WHERE coalesce(deg.d, 0) + 1 >= {int(min_pts)}
),
ce AS (
  SELECT n, m FROM nbr WHERE n IN (SELECT nid FROM core) AND m IN (SELECT nid FROM core)
),
walk AS (
  SELECT nid AS n, nid AS lbl FROM core
  UNION
  SELECT ce.m, walk.lbl FROM walk JOIN ce ON ce.n = walk.n
),
comp AS (SELECT n AS nid, min(lbl) AS cluster_id FROM walk GROUP BY n),
border AS (
  SELECT nbr.n AS nid, min(comp.cluster_id) AS cluster_id
  FROM nbr JOIN comp ON comp.nid = nbr.m
  WHERE nbr.n NOT IN (SELECT nid FROM core)
  GROUP BY nbr.n
)
SELECT p.pid AS {id_col},
       CASE WHEN c.nid IS NOT NULL THEN 'core'
            WHEN b.nid IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       coalesce(c2.cluster_id, b.cluster_id) AS cluster_id
FROM pts p
LEFT JOIN core c ON c.nid = p.nid
LEFT JOIN comp c2 ON c2.nid = p.nid
LEFT JOIN border b ON b.nid = p.nid
"""
