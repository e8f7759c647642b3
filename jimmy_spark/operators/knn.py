"""kNN via hex-cell ring expansion + window top-k, with completeness proof.

North_rule: "kNN via cell-ring expansion + secondary distance sort".
Reference analogue: the Evernote fuzzy-title join (SURVEY §2.4,
/root/reference/src/jimmy/common.py:373-400) is an O(n^2) theta join; the
scalable shape is *blocking key + candidate join + exact score sort* —
here the blocking key is the hex cell and the score is planar distance.

Algorithm (all DataFrame ops; the driver loop only adjusts a per-query
radius — queries table is tiny relative to points):

1. radius r := 1 for every query.
2. candidates := explode(disk cells of each query at radius r) ⋈ points
   (hash join on cell id) — the points side is scanned with the cell id
   precomputed, so this is one shuffle-free broadcast join when the query
   side is small, or a shuffle hash join keyed by cell at scale.
3. per query: k-th smallest distance d_k over candidates (window).
4. A query is *settled* when it has >= k candidates AND
   disk(r) provably covers every point within d_k:
   r >= rings_needed(d_k)  (hexgrid bound: min dist to ring-D cell is
   1.5*s*D - 2*s). Unsettled queries double r and repeat from 2.
5. Queries still unsettled at r > MAX_RADIUS (genuinely empty regions)
   fall back to one brute-force pass — a single broadcast of those few
   queries against the full points table (exact, DECIMAL distance to avoid
   overflow at planetary deltas).

Determinism: ranking key is (dist2, image_id) — a total order, so results
are identical at any parallelism. dist2 fits int64 for ring candidates
(deltas bounded by disk extent); the oracle compares with HUGEINT.

Output: (query_id, rank, image_id) with rank 1..k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from jimmy_spark.functions import hexgrid

DEFAULT_RES = 7
MAX_RADIUS = 64


def _disk_cells_pdf(queries: pd.DataFrame, radius_by_query: dict[str, int], res: int) -> pd.DataFrame:
    """Explode each query into its disk cells at its current radius."""
    qids: list[np.ndarray] = []
    cells_out: list[np.ndarray] = []
    cell = hexgrid.encode(
        queries["lat_e7"].to_numpy(np.int64), queries["lon_e7"].to_numpy(np.int64), res
    )
    _, q0, r0 = hexgrid.unpack(cell)
    for i, qid in enumerate(queries["query_id"]):
        rad = radius_by_query[qid]
        offs = hexgrid.disk_offsets(rad)
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
    # Precompute the point cell id once (JVM expression path — no UDF).
    from jimmy_spark.operators.cells import hex_cell_expr

    pts = points.select(
        F.col(id_col),
        F.col("lat_e7").alias("p_lat"),
        F.col("lon_e7").alias("p_lon"),
        hex_cell_expr(F.col("lat_e7"), F.col("lon_e7"), res).alias("cell"),
    )
    pts.cache()

    qmeta = spark.createDataFrame(
        queries_pdf[["query_id", "lat_e7", "lon_e7", "k"]]
    ).select(
        "query_id",
        F.col("lat_e7").alias("q_lat"),
        F.col("lon_e7").alias("q_lon"),
        "k",
    )

    unsettled = {str(q): 1 for q in queries_pdf["query_id"]}
    results: list[DataFrame] = []
    qpdf = queries_pdf.set_index("query_id", drop=False)

    while unsettled:
        sub = qpdf.loc[list(unsettled)]
        cells_pdf = _disk_cells_pdf(sub, unsettled, res)
        cand_cells = spark.createDataFrame(cells_pdf)
        cand = (
            F.broadcast(cand_cells)
            .join(pts, "cell")
            .join(F.broadcast(qmeta), "query_id")
            .withColumn(
                "dist2",
                (F.col("p_lat") - F.col("q_lat")) * (F.col("p_lat") - F.col("q_lat"))
                + (F.col("p_lon") - F.col("q_lon")) * (F.col("p_lon") - F.col("q_lon")),
            )
        )
        w = Window.partitionBy("query_id").orderBy("dist2", id_col)
        ranked = cand.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= F.col("k")
        )
        got = ranked.groupBy("query_id").agg(
            F.count("*").alias("n"), F.max("dist2").alias("dk")
        )
        stats = {r.query_id: (r.n, r.dk) for r in got.collect()}
        settled_now: list[str] = []
        for qid in list(unsettled):
            rad = unsettled[qid]
            n, dk = stats.get(qid, (0, None))
            k = int(qpdf.at[qid, "k"])
            if n >= k:
                need = int(hexgrid.rings_needed(res, np.array([np.sqrt(float(dk))]))[0])
                if rad >= need:
                    settled_now.append(qid)
                    continue
                unsettled[qid] = min(max(need, rad * 2), MAX_RADIUS + 1)
            else:
                unsettled[qid] = rad * 2
            if unsettled[qid] > MAX_RADIUS:
                unsettled[qid] = -1  # brute-force fallback marker
        if settled_now:
            keep = ranked.filter(F.col("query_id").isin(settled_now)).select(
                "query_id", "rank", id_col
            )
            results.append(keep)
            for qid in settled_now:
                del unsettled[qid]
        fallback = [q for q, r in unsettled.items() if r == -1]
        if fallback:
            fb = _brute_force(pts, qmeta, fallback, id_col)
            results.append(fb)
            for qid in fallback:
                del unsettled[qid]

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def _brute_force(
    pts: DataFrame, qmeta: DataFrame, qids: list[str], id_col: str
) -> DataFrame:
    """Exact fallback for empty-region queries: one pass of ALL points vs
    the (few) fallback queries, DECIMAL distance (no int64 overflow at
    planetary deltas)."""
    q = F.broadcast(qmeta.filter(F.col("query_id").isin(qids)))
    cand = pts.crossJoin(q).withColumn(
        "dist2",
        (F.col("p_lat").cast("decimal(20,0)") - F.col("q_lat"))
        * (F.col("p_lat").cast("decimal(20,0)") - F.col("q_lat"))
        + (F.col("p_lon").cast("decimal(20,0)") - F.col("q_lon"))
        * (F.col("p_lon").cast("decimal(20,0)") - F.col("q_lon")),
    )
    w = Window.partitionBy("query_id").orderBy("dist2", id_col)
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= F.col("k"))
        .select("query_id", "rank", id_col)
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
