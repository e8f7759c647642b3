"""kNN via hex-cell ring expansion + window top-k, with completeness proof.

North_rule: "kNN via cell-ring expansion + secondary distance sort".
Reference analogue: the Evernote fuzzy-title join (SURVEY §2.4,
/root/reference/src/jimmy/common.py:373-400) is an O(n^2) theta join; the
scalable shape is *blocking key + candidate join + exact score sort* —
here the blocking key is the hex cell and the score is planar distance.

Algorithm (candidate generation and ranking are DataFrame ops; the driver
loop only adjusts per-query radii and gathers the tiny top-k result rows):

1. radius r := 1 for every query.
2. candidates := explode(disk cells of each query at radius r) ⋈ points
   (hash join on the precomputed point cell id; the query side is tiny and
   broadcast, so the points side never shuffles).
3. rank candidates per query by (dist2, image_id); collect rank <= k rows
   (at most sum(k) rows — driver-safe at any scale).
4. A query is *settled* when it has >= k candidates AND the disk provably
   covers every point within its k-th distance:
   r >= rings_needed(d_k)  (hexgrid bound: any point of a cell at hex
   distance D is >= 1.5*s*D - 2*s away). Unsettled queries grow
   r := max(2r, rings_needed(d_k)) and repeat from 2.
5. Queries still unsettled at r > MAX_RADIUS (genuinely empty regions)
   take one brute-force pass over the full points table, shared by all
   such queries: a double-precision prune keeps every candidate within
   kth_double + MARGIN (MARGIN = 4096 >> the <=2048 ulp error of double
   dist2 at planetary magnitude, so no true top-k row can be pruned),
   then DECIMAL(38,0)-exact dist2 ranks the survivors.

Determinism: ranking key is (dist2, image_id) — a total order; results are
identical at any parallelism. Ring-path dist2 fits int64 exactly (deltas
bounded by the disk extent); the DuckDB oracle uses HUGEINT.

Output: (query_id, rank, image_id), rank 1..k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jimmy_spark.functions import hexgrid

DEFAULT_RES = 7
MAX_RADIUS = 64
_PRUNE_MARGIN = 4096.0


def _initial_radii(
    queries_pdf: pd.DataFrame, counts_pdf: pd.DataFrame, res: int
) -> dict[str, int]:
    """Pick each query's starting disk radius from per-cell point counts:
    the smallest radius whose disk holds >= k points (so the first join
    pass already yields k candidates — one iteration instead of log-many).
    Queries whose MAX_RADIUS disk holds < k points go straight to the
    brute-force fallback (radius -1).

    Driver-side cost is O(|queries| * disk(MAX_RADIUS)) numpy lookups; at
    production scale the counts table is a coarse density grid kept as a
    broadcast aggregate (one groupBy over the points table, reused across
    query batches).
    """
    counts = dict(
        zip(counts_pdf["cell"].to_numpy(), counts_pdf["cnt"].to_numpy())
    )
    cell = hexgrid.encode(
        queries_pdf["lat_e7"].to_numpy(np.int64),
        queries_pdf["lon_e7"].to_numpy(np.int64),
        res,
    )
    _, q0, r0 = hexgrid.unpack(cell)
    offs = hexgrid.disk_offsets(MAX_RADIUS)
    ring_of = hexgrid.hex_distance(offs[:, 0], offs[:, 1], 0, 0)
    order = np.argsort(ring_of, kind="stable")
    offs, ring_of = offs[order], ring_of[order]
    out: dict[str, int] = {}
    for i, row in enumerate(queries_pdf.itertuples()):
        cells_i = hexgrid.pack(res, q0[i] + offs[:, 0], r0[i] + offs[:, 1])
        cum = 0
        radius = -1
        k = int(row.k)
        for ring_start in range(len(cells_i)):
            cum += counts.get(cells_i[ring_start], 0)
            if cum >= k:
                radius = int(ring_of[ring_start])
                break
        out[str(row.query_id)] = radius
    return out


def _disk_cells_pdf(
    queries: pd.DataFrame, radius_by_query: dict[str, int], res: int
) -> pd.DataFrame:
    qids: list[np.ndarray] = []
    cells_out: list[np.ndarray] = []
    cell = hexgrid.encode(
        queries["lat_e7"].to_numpy(np.int64), queries["lon_e7"].to_numpy(np.int64), res
    )
    _, q0, r0 = hexgrid.unpack(cell)
    for i, qid in enumerate(queries["query_id"]):
        offs = hexgrid.disk_offsets(radius_by_query[qid])
        cells_out.append(hexgrid.pack(res, q0[i] + offs[:, 0], r0[i] + offs[:, 1]))
        qids.append(np.full(len(offs), qid, dtype=object))
    return pd.DataFrame(
        {"query_id": np.concatenate(qids), "cell": np.concatenate(cells_out)}
    )


def knn_join(
    points: DataFrame,
    queries_pdf: pd.DataFrame,
    res: int = DEFAULT_RES,
    id_col: str = "image_id",
) -> DataFrame:
    """points(id, lat_e7, lon_e7) x queries(query_id, lat_e7, lon_e7, k)
    -> (query_id, rank, image_id), exact planar kNN."""
    spark = points.sparkSession
    from jimmy_spark.operators.cells import hex_cell_expr

    pts = points.select(
        F.col(id_col),
        F.col("lat_e7").alias("p_lat"),
        F.col("lon_e7").alias("p_lon"),
        hex_cell_expr(F.col("lat_e7"), F.col("lon_e7"), res).alias("cell"),
    ).persist()

    qmeta = spark.createDataFrame(
        queries_pdf[["query_id", "lat_e7", "lon_e7", "k"]]
    ).select(
        "query_id",
        F.col("lat_e7").alias("q_lat"),
        F.col("lon_e7").alias("q_lon"),
        "k",
    )

    counts_pdf = (
        pts.groupBy("cell").agg(F.count("*").alias("cnt")).toPandas()
    )
    unsettled = _initial_radii(queries_pdf, counts_pdf, res)
    qpdf = queries_pdf.set_index("query_id", drop=False)
    k_of = {str(r.query_id): int(r.k) for r in queries_pdf.itertuples()}
    result_rows: list[pd.DataFrame] = []

    while unsettled:
        active = [q for q, r in unsettled.items() if r >= 0]
        fallback = [q for q, r in unsettled.items() if r == -1]
        if fallback:
            fb = _brute_force(pts, qmeta, fallback, id_col)
            result_rows.append(fb)
            for qid in fallback:
                del unsettled[qid]
            if not active:
                break
        sub = qpdf.loc[active]
        cand_cells = spark.createDataFrame(_disk_cells_pdf(sub, unsettled, res))
        cand = (
            F.broadcast(cand_cells)
            .join(pts, "cell")
            .join(F.broadcast(qmeta), "query_id")
            .withColumn(
                "dist2",
                (F.col("p_lat") - F.col("q_lat")) * (F.col("p_lat") - F.col("q_lat"))
                + (F.col("p_lon") - F.col("q_lon"))
                * (F.col("p_lon") - F.col("q_lon")),
            )
        )
        w = Window.partitionBy("query_id").orderBy("dist2", id_col)
        topk = (
            cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= F.col("k"))
            .select("query_id", "rank", id_col, "dist2")
            .toPandas()
        )
        by_q = dict(tuple(topk.groupby("query_id", sort=False)))
        for qid in active:
            rad = unsettled[qid]
            rows = by_q.get(qid)
            n = 0 if rows is None else len(rows)
            k = k_of[qid]
            if n >= k:
                dk = float(rows["dist2"].max())
                need = int(hexgrid.rings_needed(res, np.array([np.sqrt(dk)]))[0])
                if rad >= need:
                    result_rows.append(rows[["query_id", "rank", id_col]])
                    del unsettled[qid]
                    continue
                unsettled[qid] = max(need, rad * 2, 1)
            else:
                unsettled[qid] = max(rad * 2, 1)
            if unsettled[qid] > MAX_RADIUS:
                unsettled[qid] = -1

    pts.unpersist()
    if not result_rows:
        return spark.createDataFrame(
            [], f"query_id string, rank int, {id_col} string"
        )
    out = pd.concat(result_rows, ignore_index=True)
    out["rank"] = out["rank"].astype("int32")
    return spark.createDataFrame(out[["query_id", "rank", id_col]])


def _brute_force(
    pts: DataFrame, qmeta: DataFrame, qids: list[str], id_col: str
) -> pd.DataFrame:
    """Exact shared pass for empty-region queries, two-phase:

    Phase 1 (parallel local top-k): candidates are split into hash buckets
    (pts' existing partition key via xxhash64); each (query, bucket) keeps
    rows within its local k-th double-distance + MARGIN. The union of
    bucket-local top-k supersets provably contains the global top-k (the
    double-vs-exact MARGIN argument applies bucket-wise).

    Phase 2 (tiny, exact): DECIMAL(38,0) dist2 ranks the survivors —
    BigDecimal math touches only ~|queries| * buckets * k rows.
    """
    q = F.broadcast(qmeta.filter(F.col("query_id").isin(qids)))
    dlat = (F.col("p_lat") - F.col("q_lat")).cast("double")
    dlon = (F.col("p_lon") - F.col("q_lon")).cast("double")
    cand = (
        pts.withColumn("bkt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(64)))
        .crossJoin(q)
        .withColumn("dist2d", dlat * dlat + dlon * dlon)
    )
    wd = Window.partitionBy("query_id", "bkt").orderBy("dist2d", id_col)
    kth = Window.partitionBy("query_id", "bkt")
    pruned = (
        cand.withColumn("rankd", F.row_number().over(wd))
        .withColumn(
            "kth_d",
            F.max(F.when(F.col("rankd") == F.col("k"), F.col("dist2d"))).over(kth),
        )
        .filter(
            F.col("dist2d")
            <= F.coalesce(F.col("kth_d"), F.lit(float("inf"))) + F.lit(_PRUNE_MARGIN)
        )
    )
    dlat_e = F.col("p_lat").cast("decimal(20,0)") - F.col("q_lat").cast("decimal(20,0)")
    dlon_e = F.col("p_lon").cast("decimal(20,0)") - F.col("q_lon").cast("decimal(20,0)")
    exact = pruned.withColumn("dist2", dlat_e * dlat_e + dlon_e * dlon_e)
    w = Window.partitionBy("query_id").orderBy("dist2", id_col)
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", id_col)
        .toPandas()
    )


def duckdb_knn_sql(points_sql: str, queries_path: str, id_col: str = "image_id") -> str:
    """Brute-force oracle: exact HUGEINT distances, same tie-break."""
    return f"""
WITH pts AS ({points_sql}),
q AS (SELECT * FROM '{queries_path}'),
d AS (
  SELECT q.query_id, q.k, p.{id_col},
         (p.lat_e7::HUGEINT - q.lat_e7) * (p.lat_e7::HUGEINT - q.lat_e7)
       + (p.lon_e7::HUGEINT - q.lon_e7) * (p.lon_e7::HUGEINT - q.lon_e7) AS dist2
  FROM q CROSS JOIN pts p
),
r AS (
  SELECT query_id, k, {id_col}, dist2,
         row_number() OVER (PARTITION BY query_id ORDER BY dist2, {id_col}) AS rank
  FROM d
)
SELECT query_id, rank, {id_col} FROM r WHERE rank <= k
"""
