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
