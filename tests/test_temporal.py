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


def test_range_join_skewed_interval_fanout_bound(spark):
    """Skew fixture (round-3 verdict #8): one user holds a YEARS-long
    interval among ordinary hours-long ones. The bin explode is the only
    fan-out in the plan, it is exactly ceil(interval_len / bin) rows per
    interval — a measured knob, not an unbounded per-key cross product —
    and the join result is identical at every bin width (losslessness
    under skew)."""
    import datetime as dt

    base = dt.datetime(2022, 1, 1)
    # 50 normal users: a few events inside a 2h interval each
    ev_rows, iv_rows = [], []
    for u in range(50):
        t0 = base + dt.timedelta(hours=u)
        iv_rows.append((u, 1, t0, t0 + dt.timedelta(hours=2)))
        for k in range(3):
            ev_rows.append((u, t0 + dt.timedelta(minutes=20 * k), u * 10 + k))
    # the skewed user: one 3-YEAR interval, events sprinkled across it
    skew_start = base
    skew_end = base + dt.timedelta(days=3 * 365)
    iv_rows.append((999, 1, skew_start, skew_end))
    for k in range(40):
        ev_rows.append((999, skew_start + dt.timedelta(days=27 * k), 99000 + k))
    ev = spark.createDataFrame(ev_rows, "user_id long, ts timestamp, event_id long")
    iv = spark.createDataFrame(
        iv_rows, "user_id long, interval_id long, i_start timestamp, i_end timestamp"
    )

    def fanout(bin_seconds: int) -> int:
        s = F.col("i_start").cast("timestamp_ltz").cast("long")
        e = F.col("i_end").cast("timestamp_ltz").cast("long")
        return (
            iv.select(
                (F.floor((e - 1) / bin_seconds) - F.floor(s / bin_seconds) + 1)
                .alias("n_bins")
            ).agg(F.sum("n_bins")).first()[0]
        )

    results = {}
    for bin_seconds in (3600, 86_400, 30 * 86_400):
        got = sorted(
            (r.event_id, r.interval_id)
            for r in temporal.range_join(ev, iv, bin_seconds=bin_seconds).collect()
        )
        results[bin_seconds] = got
        # fan-out bound: the 3-year interval costs ceil(len/bin) exploded
        # rows — ~26k at 1h bins, ~1.1k at 1d, 38 at 30d
        skew_bins = -(-int((skew_end - skew_start).total_seconds()) // bin_seconds)
        assert fanout(bin_seconds) <= skew_bins + 50 * 3
    # identical matches at every knob setting
    assert results[3600] == results[86_400] == results[30 * 86_400]
    assert len(results[3600]) == 50 * 3 + 40
