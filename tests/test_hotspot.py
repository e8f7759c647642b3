"""Getis-Ord Gi* hotspot tests (operators/hotspot.py).

Three independent twins agree bit-for-bit: the Spark JVM expression tree,
the DuckDB SQL twin, and a pure-Python reference written directly from the
Gi* formula (math.sqrt on Python floats IS the same correctly-rounded IEEE
pipeline, so exact equality of gi_e6 is the contract, not a tolerance).
"""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from jimmy_spark.functions import hexgrid
from jimmy_spark.operators import hotspot


def py_gi_star(counts: dict[int, int]) -> dict[int, tuple[int, int, int | None]]:
    """Pure-Python Gi* from the formula; neighbor disk via hexgrid.disk_offsets
    on unpacked (q, r) — NOT the packed-delta arithmetic under test."""
    n = len(counts)
    sumx = sum(counts.values())
    sumx2 = sum(x * x for x in counts.values())
    out = {}
    for cell, _x in counts.items():
        res_bits = cell >> 60
        q = ((cell >> 30) & ((1 << 30) - 1)) - (1 << 29)
        r = (cell & ((1 << 30) - 1)) - (1 << 29)
        w, s = 0, 0
        for dq, dr in hexgrid.disk_offsets(1):
            nb = (res_bits << 60) | ((q + int(dq) + (1 << 29)) << 30) | (
                r + int(dr) + (1 << 29)
            )
            if nb in counts:
                w += 1
                s += counts[nb]
        gi = None
        xbar = float(sumx) / float(n)
        s2v = float(sumx2) / float(n) - xbar * xbar
        if n >= 2 and s2v > 0 and n * w - w * w > 0:
            num = float(s) - xbar * float(w)
            den = math.sqrt(s2v) * math.sqrt(float(n * w - w * w) / float(n - 1))
            gi = math.floor(num / den * 1000000.0)
        out[cell] = (w, s, gi)
    return out


def py_moran(counts: dict[int, int]) -> int | None:
    """Pure-Python global Moran's I (disk-1 binary weights, self excluded),
    same fixed double tree as the engine/SQL."""
    ref = py_gi_star(counts)
    n = len(counts)
    sumx = sum(counts.values())
    sumx2 = sum(x * x for x in counts.values())
    A = B = C = D = 0
    for cell, x in counts.items():
        w_all, s_all, _ = ref[cell]
        s_ex, w_ex = s_all - x, w_all - 1
        A += x * s_ex
        B += x * w_ex
        C += s_ex
        D += w_ex
    if n < 2 or D <= 0:
        return None
    xbar = float(sumx) / float(n)
    num = float(A) - xbar * float(B) - xbar * float(C) + xbar * xbar * float(D)
    den = float(sumx2) - xbar * float(sumx)
    if den <= 0:
        return None
    return math.floor(float(n) / float(D) * (num / den) * 1000000.0)


def py_lisa(counts: dict[int, int]) -> dict[int, int | None]:
    """Pure-Python local Moran per cell, same fixed tree."""
    ref = py_gi_star(counts)
    n = len(counts)
    sumx = sum(counts.values())
    sumx2 = sum(x * x for x in counts.values())
    xbar = float(sumx) / float(n) if n else 0.0
    m2 = float(sumx2) / float(n) - xbar * xbar if n else 0.0
    out: dict[int, int | None] = {}
    for cell, x in counts.items():
        w_all, s_all, _ = ref[cell]
        if n < 2 or m2 <= 0:
            out[cell] = None
            continue
        num = (float(x) - xbar) * (
            float(s_all - x) - xbar * float(w_all - 1)
        )
        out[cell] = math.floor(num / m2 * 1000000.0)
    return out


def _spark_gi(spark, counts: dict[int, int]) -> pd.DataFrame:
    pdf = pd.DataFrame(
        {"cell": list(counts), "cnt": [counts[c] for c in counts]}
    ).astype("int64")
    df = spark.createDataFrame(pdf).repartition(4)
    out = hotspot.gi_star(df, "cell").toPandas()
    return out.sort_values("cell").reset_index(drop=True)


def _check_all_twins(spark, counts: dict[int, int]) -> pd.DataFrame:
    got = _spark_gi(spark, counts)
    ref = py_gi_star(counts)
    assert len(got) == len(ref)
    # column-wise access, NOT iterrows: a NaN in gi_e6 would promote the
    # whole row to float64 and corrupt 62-bit cell ids (> 2^53)
    for cell, w_g, s_g, gi_g in zip(
        got["cell"], got["nbr_w"], got["nbr_sum"], got["gi_e6"]
    ):
        w, s, gi = ref[int(cell)]
        assert int(w_g) == w
        assert int(s_g) == s
        got_gi = None if pd.isna(gi_g) else int(gi_g)
        assert got_gi == gi, (int(cell), got_gi, gi)
    # Moran's I: a constant column matching the Python twin
    exp_m = py_moran(counts)
    got_m = got["moran_e6"]
    if exp_m is None:
        assert got_m.isna().all()
    else:
        assert (got_m == exp_m).all()
    # LISA per cell
    exp_l = py_lisa(counts)
    for cell, l_g in zip(got["cell"], got["lisa_e6"]):
        got_l = None if pd.isna(l_g) else int(l_g)
        assert got_l == exp_l[int(cell)], int(cell)
    # DuckDB twin on the same counts
    con = duckdb.connect()
    pdf = pd.DataFrame(
        {"cell": list(counts), "cnt": [counts[c] for c in counts]}
    ).astype("int64")
    con.register("counts_in", pdf)
    odf = con.sql(
        hotspot.duckdb_gi_sql("SELECT cell, cnt FROM counts_in", "cell")
    ).df().sort_values("cell").reset_index(drop=True)
    for c in ("cell", "cnt", "nbr_w", "nbr_sum", "gi_e6", "moran_e6", "lisa_e6"):
        a = got[c].astype("Int64")
        b = odf[c].astype("Int64")
        assert a.equals(b), c
    return got


def _mk_counts(lat: np.ndarray, lon: np.ndarray, res: int = 8) -> dict[int, int]:
    cells_arr = hexgrid.encode(lat.astype(np.int64), lon.astype(np.int64), res)
    vals, cnts = np.unique(cells_arr, return_counts=True)
    return {int(v): int(c) for v, c in zip(vals, cnts)}


class TestGiStar:
    def test_random_counts_three_twins(self, spark):
        rng = np.random.default_rng(42)
        lat = rng.integers(-800_000_000, 800_000_000, 3000)
        lon = rng.integers(-1_800_000_000, 1_800_000_000, 3000)
        # plant a hot blob so high-z cells exist
        lat = np.concatenate([lat, rng.integers(400_000_000, 400_500_000, 500)])
        lon = np.concatenate([lon, rng.integers(100_000_000, 100_500_000, 500)])
        counts = _mk_counts(lat, lon)
        got = _check_all_twins(spark, counts)
        assert got["gi_e6"].max() > 2_000_000  # blob cells are hot (z > 2)
        # the blob makes the surface positively autocorrelated
        assert int(got["moran_e6"].iloc[0]) > 0

    def test_hot_cell_scores_highest(self, spark):
        # a dense blob inside sparse noise: the blob's center cell must
        # carry the maximum Gi* (its whole disk is saturated)
        rng = np.random.default_rng(7)
        lat = rng.integers(0, 500_000_000, 400)
        lon = rng.integers(0, 500_000_000, 400)
        blob_lat = np.full(300, 250_000_000)
        blob_lon = np.full(300, 250_000_000)
        counts = _mk_counts(
            np.concatenate([lat, blob_lat]), np.concatenate([lon, blob_lon])
        )
        got = _spark_gi(spark, counts)
        hot_cell = int(got.loc[got["gi_e6"].idxmax(), "cell"])
        blob_cell = int(
            hexgrid.encode(
                np.asarray([250_000_000]), np.asarray([250_000_000]), 8
            )[0]
        )
        assert hot_cell == blob_cell

    def test_uniform_counts_null_guard(self, spark):
        # s = 0 -> denominator 0 -> gi_e6 NULL in every engine (not garbage)
        offs = hexgrid.disk_offsets(2)
        base_q, base_r = 100, 200
        counts = {}
        for dq, dr in offs:
            cid = (3 << 60) | ((base_q + int(dq) + (1 << 29)) << 30) | (
                base_r + int(dr) + (1 << 29)
            )
            counts[cid] = 5
        got = _check_all_twins(spark, counts)
        assert got["gi_e6"].isna().all()
        # interior cell of the radius-2 disk has the full 7-cell disk
        assert got["nbr_w"].max() == 7

    def test_single_cell_null(self, spark):
        counts = {int(hexgrid.encode(np.asarray([0]), np.asarray([0]), 8)[0]): 9}
        got = _check_all_twins(spark, counts)
        assert got["gi_e6"].isna().all()
        assert int(got["nbr_w"].iloc[0]) == 1 and int(got["nbr_sum"].iloc[0]) == 9

    def test_partitioning_invariance(self, spark):
        rng = np.random.default_rng(3)
        counts = _mk_counts(
            rng.integers(0, 100_000_000, 2000), rng.integers(0, 100_000_000, 2000)
        )
        pdf = pd.DataFrame(
            {"cell": list(counts), "cnt": [counts[c] for c in counts]}
        ).astype("int64")
        a = (
            hotspot.gi_star(spark.createDataFrame(pdf).repartition(1), "cell")
            .toPandas().sort_values("cell").reset_index(drop=True)
        )
        b = (
            hotspot.gi_star(spark.createDataFrame(pdf).repartition(13), "cell")
            .toPandas().sort_values("cell").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


def test_lisa_decomposes_global_moran(spark):
    """The LISA numerators sum (exactly, in rational arithmetic) to the
    global Moran numerator: sum_i x'_i * (s_ex_i - xbar*w_ex_i) equals
    A - xbar(B + C) + xbar^2 D — verified here with Fractions so the
    identity is exact, not approximate."""
    from fractions import Fraction

    rng = np.random.default_rng(9)
    counts = _mk_counts(
        rng.integers(0, 150_000_000, 2500), rng.integers(0, 150_000_000, 2500)
    )
    ref = py_gi_star(counts)
    n = len(counts)
    xbar = Fraction(sum(counts.values()), n)
    lhs = sum(
        (Fraction(x) - xbar)
        * (Fraction(ref[c][1] - x) - xbar * Fraction(ref[c][0] - 1))
        for c, x in counts.items()
    )
    A = sum(x * (ref[c][1] - x) for c, x in counts.items())
    B = sum(x * (ref[c][0] - 1) for c, x in counts.items())
    C = sum(ref[c][1] - x for c, x in counts.items())
    D = sum(ref[c][0] - 1 for c in counts)
    rhs = Fraction(A) - xbar * (B + C) + xbar * xbar * D
    assert lhs == rhs
