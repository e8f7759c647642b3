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
