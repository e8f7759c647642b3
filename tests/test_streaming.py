"""Streaming window aggregation: stream == batch == DuckDB oracle;
sessionization vs oracle."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from jimmy_spark.streaming import windows

SF_DIR = "/root/testdata/sf0.001"
EVENTS = f"{SF_DIR}/events.parquet"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(EVENTS)


def _norm(pdf: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(pdf.columns)
    out = pdf[cols].copy()
    for c in cols:
        if str(out[c].dtype).startswith("datetime"):
            out[c] = pd.to_datetime(out[c]).dt.tz_localize(None)
    return out.sort_values(cols).reset_index(drop=True)


def test_windowed_counts_batch_vs_oracle(events):
    got = _norm(windows.windowed_counts_batch(events).toPandas())
    exp = _norm(duckdb.sql(windows.duckdb_windows_sql(f"'{EVENTS}'")).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_stream_equals_batch(spark, events, tmp_path):
    d = tmp_path / "events_stream"
    d.mkdir()
    events.write.mode("overwrite").parquet(str(d))
    got = _norm(windows.windowed_counts_stream(spark, str(d)).toPandas())
    exp = _norm(windows.windowed_counts_batch(events).toPandas())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_sessionize_vs_oracle(events):
    got = _norm(windows.sessionize_batch(events).toPandas())
    exp = _norm(duckdb.sql(windows.duckdb_sessionize_sql(f"'{EVENTS}'")).df())
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_hourly_rollup_cascade_invariant(spark, events):
    """The continuous-aggregate invariant: the hour level computed FROM
    the 5-minute partials equals the hour level computed from raw events
    — exactly for counts, to float tolerance for the rounded totals."""
    fine = windows.windowed_counts_batch(events)
    from_fine = {
        (r._h, r.event_type): (r.n_hour, r.total_hour)
        for r in windows.hourly_rollup(fine).collect()
    }
    from_raw = {
        (r._h, r.event_type): (r.n_hour, float(r.total_hour))
        for r in windows.hourly_rollup(
            windows.windowed_counts_batch(events, minutes=60)
            .withColumnRenamed("n", "n0")
            .selectExpr("w_start", "w_end", "event_type", "n0 as n", "total")
        ).collect()
    }
    assert set(from_fine) == set(from_raw)
    for k, (n, tot) in from_fine.items():
        assert n == from_raw[k][0]
        assert abs(tot - from_raw[k][1]) < 1e-4
