"""Ripley's K (operators/hotspot.ripleys_k) — verification:

- DuckDB HUGEINT brute-force twin (blocking-independent full theta-join)
  is row-identical on the t2 points;
- pure-Python bigint differential (third formulation: nested loops +
  exact // floor) agrees on a small random set;
- CSR sanity: uniform points sit near pi*r^2; a planted cluster pushes
  k_hat far above it at the cluster scale;
- n_pairs monotone in r; partitioning invariance; degenerate guards.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from jimmy_spark.operators import hotspot

RADII = [5_000, 10_000, 20_000]


def _brute_py(pts, radii):
    n = len(pts)
    spany = max(p[0] for p in pts) - min(p[0] for p in pts)
    spanx = max(p[1] for p in pts) - min(p[1] for p in pts)
    out = []
    for r in sorted(radii):
        p = 0
        for i in range(n):
            for j in range(i + 1, n):
                dy = pts[i][0] - pts[j][0]
                dx = pts[i][1] - pts[j][1]
                if dx * dx + dy * dy <= r * r:
                    p += 1
        k = (spany * spanx * 2 * p) // (n * (n - 1)) if n >= 2 else 0
        if spany <= 0 or spanx <= 0:
            k = 0
        out.append((r, p, k))
    return out


@pytest.fixture(scope="module")
def t2_points(spark, t2_dir):
    from jimmy_spark.operators import cells

    return cells.with_georef(
        spark.read.parquet(f"{t2_dir}/images.parquet").select(
            "image_id", "phash"
        )
    ).select("image_id", "lat_e7", "lon_e7")


class TestRipleysK:
    def test_matches_duckdb_twin_on_t2(self, spark, t2_points, t2_dir):
        got = [
            (r["r"], r["n_pairs"], r["k_hat"])
            for r in hotspot.ripleys_k(t2_points, RADII).collect()
        ]
        pdf = t2_points.toPandas()
        con = duckdb.connect()
        con.register("pts", pdf)
        want = con.sql(
            hotspot.duckdb_ripley_sql("SELECT * FROM pts", RADII)
        ).fetchall()
        assert got == [tuple(w) for w in want]
        assert got[-1][1] > 0  # live lane at the widest radius

    def test_matches_pure_python_bigint(self, spark):
        rng = random.Random(5)
        pts = [
            (rng.randint(-800_000_000, 800_000_000),
             rng.randint(-800_000_000, 800_000_000))
            for _ in range(60)
        ]
        # densify one spot so small radii fire
        pts += [(1000 + rng.randint(-8000, 8000),
                 -2000 + rng.randint(-8000, 8000)) for _ in range(40)]
        pdf = pd.DataFrame(
            [(f"p{i:04d}", la, lo) for i, (la, lo) in enumerate(pts)],
            columns=["image_id", "lat_e7", "lon_e7"],
        )
        df = spark.createDataFrame(pdf)
        got = [
            (r["r"], r["n_pairs"], r["k_hat"])
            for r in hotspot.ripleys_k(df, RADII).collect()
        ]
        assert got == _brute_py(pts, RADII)

    def test_csr_band_and_cluster_excess(self, spark):
        import math

        rng = random.Random(11)
        side = 1_000_000
        uni = [
            (rng.randint(0, side), rng.randint(0, side)) for _ in range(3000)
        ]
        r = 50_000
        pdf = pd.DataFrame(
            [(f"u{i}", la, lo) for i, (la, lo) in enumerate(uni)],
            columns=["image_id", "lat_e7", "lon_e7"],
        )
        k_uni = hotspot.ripleys_k(
            spark.createDataFrame(pdf), [r]
        ).collect()[0]["k_hat"]
        csr = math.pi * r * r
        assert 0.5 * csr < k_uni < 2.0 * csr
        # same points plus a tight 300-point blob: at the BLOB scale
        # (r=20k, blob extent ~10k) the 45k planted pairs dwarf the ~6k
        # uniform ones and K must blow far past CSR
        blob = [
            (500_000 + rng.randint(-5_000, 5_000),
             500_000 + rng.randint(-5_000, 5_000))
            for _ in range(300)
        ]
        pdf2 = pd.DataFrame(
            [(f"c{i}", la, lo) for i, (la, lo) in enumerate(uni + blob)],
            columns=["image_id", "lat_e7", "lon_e7"],
        )
        r2 = 20_000
        k_blob = hotspot.ripleys_k(
            spark.createDataFrame(pdf2), [r2]
        ).collect()[0]["k_hat"]
        assert k_blob > 3 * math.pi * r2 * r2

    def test_monotone_and_partitioning_invariant(self, t2_points):
        base = hotspot.ripleys_k(t2_points, RADII).collect()
        pairs = [r["n_pairs"] for r in base]
        assert pairs == sorted(pairs)
        shuf = hotspot.ripleys_k(t2_points.repartition(13), RADII).collect()
        assert [tuple(r) for r in base] == [tuple(r) for r in shuf]

    def test_degenerate_guards(self, spark):
        one = spark.createDataFrame(
            pd.DataFrame(
                [("a", 5, 5)], columns=["image_id", "lat_e7", "lon_e7"]
            )
        )
        rows = hotspot.ripleys_k(one, [1000]).collect()
        assert rows[0]["n_pairs"] == 0 and rows[0]["k_hat"] == 0
        with pytest.raises(ValueError):
            hotspot.ripleys_k(one, [])
        with pytest.raises(ValueError):
            hotspot.ripleys_k(one, [0])
