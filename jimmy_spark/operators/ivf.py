"""IVF (inverted-file) approximate nearest neighbor over embeddings.

The classic two-level ANN index (public IVF design) built with DataFrame
primitives:

- ``fit_centroids``  — deterministic sample k-means: the training sample
  is the min(N, sample_n) smallest-id vectors, Lloyd runs driver-side in
  NumPy with fixed iteration order, so the centroids are BIT-STABLE
  across parallelism and partitioning (required for the golden-parquet
  oracle; also standard IVF practice at 10^12 scale — train on a sample,
  index everything). Seeds are the k sample vectors with the smallest
  splitmix64(vec_id) (hash-spread, reproducible in plain NumPy).
- ``ann_topk_ivf`` — every vector is assigned to its nearest centroid (one
  narrow pass); a query probes its ``nprobe`` nearest centroid buckets and
  reranks candidates with exact cosine via a broadcast hash join on the
  centroid id.

Note on the assignment kernel: a pure-JVM argmin expression over k
centroids x dim literal arrays compiles into a 10^4-node Catalyst tree and
stalls planning — the vectorized NumPy UDF (one matmul per batch) is the
right tool (same lesson as the codecs: Python is fine when it is one Arrow
batch crossing doing real vector math).

Scale notes: at 10^12 vectors the lists are the partitioning (write the
assignment as the table's bucket column); k grows to ~sqrt(N) and fitting
runs on a sample. Approximate by construction — tests measure recall vs
the brute-force baseline and that probing every list degenerates to exact.
Deterministic end to end (seeded init, argmin lowest-index ties).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jimmy_spark.datagen.core import splitmix64
from jimmy_spark.operators.similarity import _as_double, _cosine


def lloyd_numpy(
    ids: np.ndarray, X: np.ndarray, k: int, iters: int
) -> np.ndarray:
    """Pure-NumPy Lloyd on a (sorted-by-id) sample — the single source of
    truth for centroid fitting, shared by the Spark operator and the
    golden-oracle generator so both get bit-identical centroids."""
    order = np.argsort(splitmix64(ids.astype(np.uint64)), kind="stable")
    centroids = X[order[:k]].astype(np.float64).copy()
    for _ in range(iters):
        c2 = (centroids * centroids).sum(axis=1)
        d = -2.0 * (X @ centroids.T) + c2[None, :]
        cid = np.argmin(d, axis=1)
        new = centroids.copy()
        for c in range(len(centroids)):
            members = X[cid == c]
            if len(members):
                new[c] = members.mean(axis=0)
        if np.allclose(new, centroids, atol=1e-12):
            break
        centroids = new
    return centroids


def _assign_udf(centroids: np.ndarray):
    c = centroids.copy()
    c2 = (c * c).sum(axis=1)

    @F.pandas_udf("int")
    def assign(vec: pd.Series) -> pd.Series:
        m = np.stack(vec.to_numpy())  # (n, dim)
        # argmin ||v - c||^2 = argmin (-2 v.c + ||c||^2); ||v||^2 is
        # constant per row. np.argmin breaks ties at the lowest index.
        d = -2.0 * (m @ c.T) + c2[None, :]
        return pd.Series(np.argmin(d, axis=1).astype(np.int32))

    return assign


SAMPLE_N = 2048


def fit_centroids(
    embeddings: DataFrame,
    k: int = 16,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_n: int = SAMPLE_N,
) -> np.ndarray:
    """Collect the smallest-id sample once (bounded: sample_n x dim) and
    run the shared NumPy Lloyd on it. The previous full-corpus Spark-agg
    fit computed centroid means with partition-order-dependent float
    summation — correct but not bit-reproducible across cluster sizes,
    which a golden oracle (and a resumable 10^12-row index build) needs."""
    rows = (
        embeddings.select(F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"))
        .orderBy("id")
        .limit(sample_n)
        .collect()
    )
    ids = np.array([r.id for r in rows], dtype=np.int64)
    X = np.array([r.v for r in rows], dtype=np.float64)
    return lloyd_numpy(ids, X, k, iters)


def ann_topk_ivf(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, vec_id, cos_r) — IVF-probed approximate top-k."""
    from pyspark.sql import Window

    centroids = fit_centroids(embeddings, n_centroids, iters, id_col, vec_col)
    emb = embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    assigned = emb.withColumn("cid", _assign_udf(centroids)(F.col("v")))

    # probe lists per query: nprobe nearest centroids (driver-side numpy)
    q_rows = assigned.filter(F.col(id_col).isin(query_ids)).collect()
    spark = embeddings.sparkSession
    probe_rows = []
    for r in q_rows:
        qv = np.array(r.v)
        d = ((centroids - qv) ** 2).sum(axis=1)
        for cid in np.argsort(d, kind="stable")[:nprobe]:
            probe_rows.append((r[id_col], r.v, int(cid)))
    probes = spark.createDataFrame(
        probe_rows, "query_id long, qv array<double>, cid int"
    )
    cand = (
        F.broadcast(probes)
        .join(assigned, "cid")
        .filter(F.col(id_col) != F.col("query_id"))
    )
    scored = cand.withColumn("cos_r", F.round(_cosine(F.col("qv"), F.col("v")), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_r"), id_col)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), id_col, "cos_r")
    )
