"""Map-matching tests (operators/mapmatch.py).

The engine's grid-blocked nearest-segment join is checked against (a) a
brute-force NumPy reference (independent geometry code, no blocking —
proves the grid cover is complete), (b) the DuckDB bbox-join twin, and
(c) crafted geometries pinning the three point-segment regimes, the
deterministic tie-break, and the degenerate zero-length segment.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from jimmy_spark.operators import mapmatch


def np_match(pings: pd.DataFrame, segs: pd.DataFrame, d: int) -> pd.DataFrame:
    """Brute force: vectorized point-segment distance over ALL segments,
    written with numpy clip (different formulation from the engine's
    three-branch CASE)."""
    px = pings["lon_e7"].to_numpy(np.float64)[:, None]
    py = pings["lat_e7"].to_numpy(np.float64)[:, None]
    ax = segs["ax"].to_numpy(np.float64)[None, :]
    ay = segs["ay"].to_numpy(np.float64)[None, :]
    bx = segs["bx"].to_numpy(np.float64)[None, :]
    by = segs["by"].to_numpy(np.float64)[None, :]
    wx, wy = bx - ax, by - ay
    ww = wx * wx + wy * wy
    dot = (px - ax) * wx + (py - ay) * wy
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.clip(np.where(ww > 0, dot / ww, 0.0), 0.0, 1.0)
    cx, cy = ax + t * wx, ay + t * wy
    d2 = (px - cx) ** 2 + (py - cy) ** 2
    rows = []
    rid = segs["road_id"].to_numpy()
    sid = segs["seg_id"].to_numpy()
    for i in range(px.shape[0]):
        ok = d2[i] <= float(d) * float(d) + 1e-3  # fp slack; ties re-checked below
        n = int(ok.sum())
        if n == 0:
            rows.append((int(pings["entity_id"].iloc[i]), int(pings["seq"].iloc[i]), 0, None, None))
            continue
        cand = np.flatnonzero(ok)
        order = np.lexsort((sid[cand], rid[cand], d2[i][cand]))
        j = cand[order[0]]
        rows.append(
            (int(pings["entity_id"].iloc[i]), int(pings["seq"].iloc[i]), n, int(rid[j]), int(sid[j]))
        )
    return pd.DataFrame(rows, columns=["entity_id", "seq", "n_cand", "road_id", "seg_id"])


def _run(spark, pings_pdf, segs_pdf, d):
    p = spark.createDataFrame(pings_pdf).repartition(5)
    s = spark.createDataFrame(segs_pdf).repartition(3)
    return (
        mapmatch.map_match(p, s, d_max=d)
        .toPandas()
        .sort_values(["entity_id", "seq"])
        .reset_index(drop=True)
    )


def _mk_pings(rng, n, lo=-300_000_000, hi=300_000_000):
    return pd.DataFrame(
        {
            "entity_id": np.arange(n, dtype=np.int64) % 7,
            "seq": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(1_700_000_000 + np.arange(n), unit="s"),
            "lat_e7": rng.integers(lo, hi, n),
            "lon_e7": rng.integers(lo, hi, n),
        }
    )


def _mk_segs(rng, n, lo=-300_000_000, hi=300_000_000, max_len=8_000_000):
    ax = rng.integers(lo, hi, n)
    ay = rng.integers(lo, hi, n)
    return pd.DataFrame(
        {
            "road_id": np.arange(n, dtype=np.int64) // 10,
            "seg_id": np.arange(n, dtype=np.int64) % 10,
            "ax": ax,
            "ay": ay,
            "bx": ax + rng.integers(-max_len, max_len, n),
            "by": ay + rng.integers(-max_len, max_len, n),
        }
    )


class TestMapMatch:
    def test_brute_force_differential(self, spark):
        rng = np.random.default_rng(11)
        pings = _mk_pings(rng, 400)
        segs = _mk_segs(rng, 600)
        d = 20_000_000
        got = _run(spark, pings, segs, d)
        ref = np_match(pings, segs, d).sort_values(["entity_id", "seq"]).reset_index(drop=True)
        assert got["n_cand"].astype(int).tolist() == ref["n_cand"].astype(int).tolist()
        for c in ("road_id", "seg_id"):
            assert got[c].astype("Int64").equals(ref[c].astype("Int64")), c
        assert (got["n_cand"] == 0).any()  # off-network lane exercised

    def test_duckdb_twin_exact(self, spark):
        rng = np.random.default_rng(12)
        pings = _mk_pings(rng, 300)
        segs = _mk_segs(rng, 500)
        d = 50_000_000
        got = _run(spark, pings, segs, d)
        con = duckdb.connect()
        con.register("tracks_in", pings)
        con.register("roads_in", segs)
        odf = (
            con.sql(mapmatch.duckdb_match_sql("tracks_in", "roads_in", d))
            .df().sort_values(["entity_id", "seq"]).reset_index(drop=True)
        )
        for c in ("n_cand", "road_id", "seg_id", "d2_floor", "t_e6"):
            assert got[c].astype("Int64").equals(odf[c].astype("Int64")), c

    def test_three_regimes_exact(self, spark):
        # horizontal segment a=(0,0) b=(1000,0); pings beyond a, beyond b,
        # and over the interior — distances and t known in closed form
        segs = pd.DataFrame(
            {"road_id": [1], "seg_id": [0], "ax": [0], "ay": [0],
             "bx": [1000], "by": [0]}
        ).astype("int64")
        pings = pd.DataFrame(
            {
                "entity_id": [1, 1, 1],
                "seq": [0, 1, 2],
                "ts": pd.to_datetime([0, 1, 2], unit="s"),
                "lat_e7": [40, 30, 50],            # y
                "lon_e7": [-30, 250, 1100],        # x: before a / interior / past b
            }
        ).astype({"entity_id": "int64", "seq": "int64", "lat_e7": "int64", "lon_e7": "int64"})
        got = _run(spark, pings, segs, 5000)
        assert got["d2_floor"].tolist() == [30 * 30 + 40 * 40, 30 * 30, 100 * 100 + 50 * 50]
        assert got["t_e6"].tolist() == [0, 250_000, 1_000_000]

    def test_tie_break_deterministic(self, spark):
        # ping equidistant (dist 100) from two parallel segments; lower
        # (road_id, seg_id) must win in engine AND twin
        segs = pd.DataFrame(
            {"road_id": [7, 3], "seg_id": [1, 9], "ax": [0, 0],
             "ay": [100, -100], "bx": [1000, 1000], "by": [100, -100]}
        ).astype("int64")
        pings = pd.DataFrame(
            {"entity_id": [0], "seq": [0], "ts": pd.to_datetime([0], unit="s"),
             "lat_e7": [0], "lon_e7": [500]}
        ).astype({"entity_id": "int64", "seq": "int64", "lat_e7": "int64", "lon_e7": "int64"})
        got = _run(spark, pings, segs, 5000)
        assert got["road_id"].tolist() == [3] and got["seg_id"].tolist() == [9]
        con = duckdb.connect()
        con.register("tracks_in", pings)
        con.register("roads_in", segs)
        odf = con.sql(mapmatch.duckdb_match_sql("tracks_in", "roads_in", 5000)).df()
        assert odf["road_id"].tolist() == [3] and odf["seg_id"].tolist() == [9]

    def test_zero_length_segment(self, spark):
        segs = pd.DataFrame(
            {"road_id": [0], "seg_id": [0], "ax": [10], "ay": [20],
             "bx": [10], "by": [20]}
        ).astype("int64")
        pings = pd.DataFrame(
            {"entity_id": [0], "seq": [0], "ts": pd.to_datetime([0], unit="s"),
             "lat_e7": [23], "lon_e7": [14]}
        ).astype({"entity_id": "int64", "seq": "int64", "lat_e7": "int64", "lon_e7": "int64"})
        got = _run(spark, pings, segs, 1000)
        assert got["d2_floor"].tolist() == [4 * 4 + 3 * 3]
        assert got["t_e6"].tolist() == [0]

    def test_partitioning_invariance(self, spark):
        rng = np.random.default_rng(13)
        pings = _mk_pings(rng, 200)
        segs = _mk_segs(rng, 300)
        a = _run(spark, pings, segs, 40_000_000)
        b = (
            mapmatch.map_match(
                spark.createDataFrame(pings).repartition(1),
                spark.createDataFrame(segs).repartition(17),
                d_max=40_000_000,
            )
            .toPandas().sort_values(["entity_id", "seq"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)
