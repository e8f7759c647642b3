"""kNN ring-expansion vs brute-force DuckDB oracle: exact equality.

This is the strongest correctness check in the suite — the engine only
looks at ring candidates, the oracle at every point; equality proves the
ring-expansion completeness bound.
"""

from __future__ import annotations

import duckdb
import pyarrow.parquet as pq
import pytest

from jimmy_spark.operators import cells, knn


@pytest.fixture(scope="module")
def points(spark, t1_dir):
    imgs = spark.read.parquet(f"{t1_dir}/images.parquet")
    return cells.with_georef(imgs.select("image_id", "phash")).cache()


def test_knn_matches_bruteforce_oracle(spark, points, t1_dir):
    queries_pdf = pq.read_table(f"{t1_dir}/knn_queries.parquet").to_pandas()
    got = {
        (r.query_id, r.rank, r.image_id)
        for r in knn.knn_join(points, queries_pdf).collect()
    }
    pts = points.toPandas()
    duckdb.register("knn_pts", pts)
    sql = knn.duckdb_knn_sql(
        "SELECT image_id, lat_e7, lon_e7 FROM knn_pts",
        f"{t1_dir}/knn_queries.parquet",
    )
    expected = {(r[0], r[1], r[2]) for r in duckdb.sql(sql).fetchall()}
    assert len(expected) > 0
    assert got == expected


def test_knn_deterministic_across_partitioning(spark, points, t1_dir):
    queries_pdf = pq.read_table(f"{t1_dir}/knn_queries.parquet").to_pandas().head(9)
    a = {
        (r.query_id, r.rank, r.image_id)
        for r in knn.knn_join(points, queries_pdf).collect()
    }
    b = {
        (r.query_id, r.rank, r.image_id)
        for r in knn.knn_join(points.repartition(13), queries_pdf).collect()
    }
    assert a == b


def test_knn_exact_on_coarse_grid(spark, points, t1_dir, monkeypatch):
    """Force the driver-cell cap so the blocking grid auto-coarsens to
    res 5 — results must stay exactly equal to the brute-force oracle
    (the d_bound math only depends on the grid's cell radius)."""
    monkeypatch.setattr(knn, "MAX_DRIVER_CELLS", 10)
    queries_pdf = pq.read_table(f"{t1_dir}/knn_queries.parquet").to_pandas()
    got = {
        (r.query_id, r.rank, r.image_id)
        for r in knn.knn_join(points, queries_pdf).collect()
    }
    pts = points.toPandas()
    duckdb.register("knn_pts_coarse", pts)
    sql = knn.duckdb_knn_sql(
        "SELECT image_id, lat_e7, lon_e7 FROM knn_pts_coarse",
        f"{t1_dir}/knn_queries.parquet",
    )
    expected = {(r[0], r[1], r[2]) for r in duckdb.sql(sql).fetchall()}
    assert got == expected


def test_knn_big_matches_driver_path_and_oracle(spark, points, t1_dir):
    """knn_join_big (distributed query planning, shuffled candidate join)
    must equal both the driver-planned knn_join and the brute-force oracle
    exactly — same ranks, same ids."""
    queries_pdf = pq.read_table(f"{t1_dir}/knn_queries.parquet").to_pandas()
    queries_df = spark.createDataFrame(
        queries_pdf[["query_id", "lat_e7", "lon_e7", "k"]]
    )
    got_big = {
        (r.query_id, r.rank, r.image_id)
        for r in knn.knn_join_big(points, queries_df).collect()
    }
    got_drv = {
        (r.query_id, r.rank, r.image_id)
        for r in knn.knn_join(points, queries_pdf).collect()
    }
    assert got_big == got_drv
    pts = points.toPandas()
    duckdb.register("knn_pts_big", pts)
    sql = knn.duckdb_knn_sql(
        "SELECT image_id, lat_e7, lon_e7 FROM knn_pts_big",
        f"{t1_dir}/knn_queries.parquet",
    )
    expected = {(r[0], r[1], r[2]) for r in duckdb.sql(sql).fetchall()}
    assert got_big == expected


def test_knn_big_no_auto_broadcast(spark, points, t1_dir):
    """The big path must not depend on Catalyst auto-broadcast: with the
    threshold off (simulating a query set too large to broadcast) results
    are unchanged. (knn_join's explicit F.broadcast hints are absent from
    this path by design — this executes the fully shuffled plan.)"""
    queries_pdf = pq.read_table(f"{t1_dir}/knn_queries.parquet").to_pandas().head(7)
    qdf = spark.createDataFrame(
        queries_pdf[["query_id", "lat_e7", "lon_e7", "k"]]
    )
    expected = {
        (r.query_id, r.rank, r.image_id)
        for r in knn.knn_join(points, queries_pdf).collect()
    }
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        got = {
            (r.query_id, r.rank, r.image_id)
            for r in knn.knn_join_big(points, qdf).collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert got == expected


def test_knn_big_partitioned_queries(spark, points, t1_dir):
    """Planning runs per query-partition; result must be invariant to the
    query-side partitioning (each query plans independently)."""
    queries_pdf = pq.read_table(f"{t1_dir}/knn_queries.parquet").to_pandas()
    qdf = spark.createDataFrame(
        queries_pdf[["query_id", "lat_e7", "lon_e7", "k"]]
    )
    a = {
        (r.query_id, r.rank, r.image_id)
        for r in knn.knn_join_big(points, qdf).collect()
    }
    b = {
        (r.query_id, r.rank, r.image_id)
        for r in knn.knn_join_big(points, qdf.repartition(11)).collect()
    }
    assert a == b
