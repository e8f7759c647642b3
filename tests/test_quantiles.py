"""Exact distributed quantiles (operators/quantiles.py).

Oracles, independent of the two-stage plan and of each other: a
pure-Python sorted() order-statistic twin (the rank definition applied
literally), and the DuckDB row_number twin (a second engine, explicit
sort). Skew/degenerate fixtures drive the scale claims: a group holding
90% of all rows, and a group whose every row carries ONE value (the
whole group lands in one bucket — stage 3 must still see one value row,
not one row per input row)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from jimmy_spark.operators import quantiles as qt

QS = (0.1, 0.5, 0.9, 1.0)
SEED = 31


def _py_twin(pdf: pd.DataFrame, qs=QS) -> set:
    out = set()
    for g, sub in pdf.dropna(subset=["v"]).groupby("g"):
        vs = sorted(int(v) for v in sub["v"])
        n = len(vs)
        for q in qs:
            qm = int(round(q * 1000))
            r = (qm * n + 999) // 1000  # ceil(q*n), integer milli form
            out.add((g, qm, vs[r - 1]))
    return out


@pytest.fixture(scope="module")
def fixture_pdf():
    rng = np.random.default_rng(SEED)
    rows = []
    # hot group: 90% of all rows, wide value range crossing bucket edges
    rows += [("hot", int(v)) for v in rng.integers(-2_000_000, 150_000, 45_000)]
    # normal groups
    for g in range(6):
        n = int(rng.integers(50, 900))
        rows += [
            (f"g{g}", int(v))
            for v in rng.integers(-(10 ** 9), 10 ** 9, n)
        ]
    # degenerate: every row the same value (one bucket holds the group)
    rows += [("const", 424_242)] * 2_500
    # tiny groups: n=1 and n=2 exercise the rank edges (r = n at q=1.0)
    rows += [("one", -7), ("two", 5), ("two", -5)]
    pdf = pd.DataFrame(rows, columns=["g", "v"])
    # nulls must be excluded identically everywhere
    pdf.loc[len(pdf)] = ("hot", None)
    return pdf


@pytest.fixture(scope="module")
def result(spark, fixture_pdf):
    df = spark.createDataFrame(fixture_pdf.astype({"v": "Int64"}))
    got = qt.group_quantiles(df, ["g"], "v", qs=QS)
    return {(r.g, r.q_milli, r.v) for r in got.collect()}


def test_matches_pure_python_twin(result, fixture_pdf):
    exp = _py_twin(fixture_pdf)
    assert result == exp
    # every (group, q) answered exactly once
    assert len(result) == len({(g, q) for g, q, _ in result})
    assert len(result) == 10 * len(QS)


def test_matches_duckdb_twin(result, fixture_pdf):
    con = duckdb.connect()
    con.register("t", fixture_pdf)
    exp = {
        (r[0], int(r[1]), int(r[2]))
        for r in con.sql(
            qt.duckdb_group_quantiles_sql("t", ["g"], "v", qs=QS)
        ).fetchall()
    }
    assert result == exp


def test_small_bucket_width_same_answer(spark, fixture_pdf, result):
    # bucket width never changes the answer, only the frame shapes —
    # W=97 forces multi-bucket traversal everywhere incl. negatives
    df = spark.createDataFrame(fixture_pdf.astype({"v": "Int64"}))
    got = qt.group_quantiles(df, ["g"], "v", qs=QS, bucket_w=97)
    assert {(r.g, r.q_milli, r.v) for r in got.collect()} == result


def test_partitioning_invariance(spark, fixture_pdf, result):
    df = spark.createDataFrame(fixture_pdf.astype({"v": "Int64"})).repartition(11)
    got = qt.group_quantiles(df, ["g"], "v", qs=QS)
    assert {(r.g, r.q_milli, r.v) for r in got.collect()} == result


def test_stage3_state_is_value_bounded(spark, fixture_pdf):
    # the degenerate group's 2500 equal rows must reach the final window
    # as ONE (group, bucket, value) row — the O(sqrt domain) state claim;
    # checked on the executed plan's aggregate output, via the same
    # value-level aggregation the operator builds
    df = spark.createDataFrame(fixture_pdf.astype({"v": "Int64"}))
    vals = df.select("g", F.col("v").alias("_v")).where("_v IS NOT NULL")
    shift = 1 << 40
    vc = (
        vals.withColumn("_bkt", F.expr(f"(_v + {shift}) div {qt.DEFAULT_BUCKET_W}"))
        .groupBy("g", "_bkt", "_v")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter("g = 'const'")
        .collect()
    )
    assert len(vc) == 1 and vc[0]["n"] == 2500


def test_rejects_bad_q(spark, fixture_pdf):
    df = spark.createDataFrame(fixture_pdf.astype({"v": "Int64"}))
    with pytest.raises(ValueError):
        qt.group_quantiles(df, ["g"], "v", qs=(0.0,))
    with pytest.raises(ValueError):
        qt.group_quantiles(df, ["g"], "v", qs=())


def test_from_counts_equals_raw_row_operator(spark, fixture_pdf, result):
    # the histogram-input variant (the streaming state form) resolves
    # identically to the raw-row operator, including duplicated
    # (group, value) rows whose counts must sum
    hist = (
        fixture_pdf.dropna(subset=["v"])
        .groupby(["g", "v"], as_index=False)
        .size()
        .rename(columns={"size": "n"})
    )
    half = hist.copy()
    half["n"] = half["n"] - (half["n"] + 1) // 2
    hist["n"] = (hist["n"] + 1) // 2
    split = pd.concat([hist, half[half["n"] > 0]], ignore_index=True)
    df = spark.createDataFrame(split.astype({"v": "int64", "n": "int64"}))
    got = qt.group_quantiles_from_counts(df, ["g"], "v", "n", qs=QS)
    assert {(r.g, r.q_milli, r.v) for r in got.collect()} == result


def test_q_milli_contract_rejected_not_rounded():
    """r6 ADVICE fix: qs that are not exact multiples of 0.001 used to
    be silently rounded (computing a different quantile than asked),
    and two qs rounding to the same milli emitted duplicate q_milli
    rows. Both now raise, in every formulation."""
    import pytest as _pytest

    from jimmy_spark.operators.quantiles import (
        duckdb_group_quantiles_sql,
        q_millis,
    )

    assert q_millis((0.5, 0.9)) == [500, 900]
    assert q_millis((0.001, 1.0)) == [1, 1000]
    for bad in ((1 / 3,), (0.1234,), (0.5001, 0.5002)):
        with _pytest.raises(ValueError):
            q_millis(bad)
        with _pytest.raises(ValueError):
            duckdb_group_quantiles_sql("t", ["g"], "v", qs=bad)
    with _pytest.raises(ValueError):
        q_millis((0.5, 0.5))  # duplicate milli key
    with _pytest.raises(ValueError):
        q_millis((0.0,))
