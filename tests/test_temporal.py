"""As-of and range joins: tie/boundary semantics and bin losslessness."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from jimmy_spark.operators import temporal


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_asof_ties_and_missing(spark):
    left = spark.createDataFrame(
        [(1, _ts(9), 100), (1, _ts(10), 101), (1, _ts(12), 102),
         (2, _ts(9), 200)],
        "user_id long, ts timestamp, event_id long",
    )
    right = spark.createDataFrame(
        [(1, _ts(10), 5.0), (1, _ts(11), 7.0)],
        "user_id long, ts timestamp, r_value double",
    )
    got = {r.event_id: r.r_value
           for r in temporal.asof_join(left, right).collect()}
    assert got[100] is None        # no prior right row
    assert got[101] == 5.0         # equal-ts right row serves the left row
    assert got[102] == 7.0         # latest at-or-before wins
    assert got[200] is None        # other key untouched


def test_range_join_boundaries_and_bin_spans(spark):
    ev = spark.createDataFrame(
        [(1, _ts(9, 0), 1), (1, _ts(10, 30), 2), (1, _ts(12, 0), 3),
         (1, _ts(8, 59), 4)],
        "user_id long, ts timestamp, event_id long",
    )
    iv = spark.createDataFrame(
        [(1, 7, _ts(9, 0), _ts(12, 0))],  # [09:00, 12:00): 3-bin span
        "user_id long, interval_id long, i_start timestamp, i_end timestamp",
    )
    for bin_seconds in (3600, 600, 7200):
        got = sorted(
            r.event_id
            for r in temporal.range_join(ev, iv, bin_seconds=bin_seconds).collect()
        )
        # start inclusive, end exclusive, pre-start excluded — for EVERY
        # bin width (binning must be lossless)
        assert got == [1, 2], bin_seconds


def test_range_join_overlapping_intervals(spark):
    ev = spark.createDataFrame(
        [(1, _ts(10), 1)], "user_id long, ts timestamp, event_id long"
    )
    iv = spark.createDataFrame(
        [(1, 1, _ts(9), _ts(11)), (1, 2, _ts(10), _ts(12)), (1, 3, _ts(11), _ts(12))],
        "user_id long, interval_id long, i_start timestamp, i_end timestamp",
    )
    got = sorted(r.interval_id for r in temporal.range_join(ev, iv).collect())
    assert got == [1, 2]  # event belongs to BOTH overlapping intervals


def test_asof_one_shuffle_plan(spark):
    """The as-of join must cost ONE exchange on the key (plus the window
    sort) — never an inequality/cross join."""
    left = spark.createDataFrame(
        [(1, _ts(9), 1)], "user_id long, ts timestamp, event_id long"
    )
    right = spark.createDataFrame(
        [(1, _ts(8), 1.0)], "user_id long, ts timestamp, r_value double"
    )
    plan = temporal.asof_join(left, right)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
