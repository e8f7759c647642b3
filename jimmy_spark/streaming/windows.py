"""Structured Streaming operators over the events stream.

The reference is batch-only (SURVEY §2.9) — its incremental pieces are the
ET.iterparse bounded-memory scan and idempotent writes, which the engine
maps to checkpoint.py. This module adds the genuinely-streaming analogues
a large-scale ingest pipeline needs: watermarked tumbling/sliding window
aggregation and gap-based sessionization, runnable in this sandbox against
file sources with the memory sink (synchronous via processAllAvailable).

The batch twins (``windowed_counts_batch`` / ``sessionize_batch``) compute
identical results with the same expressions — used for the driver's SQL
oracle and for differential tests streaming-vs-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def windowed_counts_batch(events: DataFrame, minutes: int = 5) -> DataFrame:
    """Tumbling-window per-type counts/sums (batch semantics)."""
    return (
        events.groupBy(
            F.window("ts", f"{minutes} minutes").alias("w"), "event_type"
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
            "total",
        )
    )


def windowed_counts_stream(
    spark: SparkSession,
    events_dir: str,
    minutes: int = 5,
    query_name: str = "wc_out",
    glob: str | None = None,
) -> DataFrame:
    """Same aggregation as a streaming query over a file source; returns the
    completed result from the memory sink (synchronous for tests). The file
    source requires a DIRECTORY: passing a file path streams its parent
    directory filtered to that filename (how the driver's single-file
    testdata tables are streamed)."""
    import os

    if glob is None and not os.path.isdir(events_dir):
        events_dir, glob = os.path.dirname(events_dir), os.path.basename(events_dir)
    reader = spark.readStream.schema(EVENTS_SCHEMA).format("parquet")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    stream = reader.load(events_dir)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", f"{minutes} minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 6).alias("total"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
            "total",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")


def hourly_rollup(fine: DataFrame, coarse_minutes: int = 60) -> DataFrame:
    """Hypertable-style continuous-aggregate cascade (the task brief's
    'hypertable rollup'): the coarse level aggregates FROM the fine
    level's partials — counts merge exactly (sum of sums), monetary
    totals are defined as the rounded sum of the rounded fine partials
    (the cascade's own semantic, mirrored verbatim in the oracle). At
    100 TB this is the whole point of a continuous aggregate: the hourly
    table reads |fine| rows, never the raw events."""
    secs = coarse_minutes * 60
    epoch_h = F.floor(
        F.col("w_start").cast("timestamp_ltz").cast("long") / secs
    )
    return (
        fine.withColumn("_h", epoch_h)
        .groupBy("_h", "event_type")
        .agg(
            F.sum("n").alias("n_hour"),
            F.round(F.sum("total"), 6).alias("total_hour"),
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization (batch): lag + cumulative session ids —
    the classic Window formulation (guide §OLAP patterns)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.lag("ts").over(w)
    # parquet naive timestamps load as TIMESTAMP_NTZ; Spark 4 forbids a
    # direct NTZ->long cast. Under the pinned UTC session tz the NTZ->LTZ
    # cast is the identity, then ->long is epoch seconds (floors), matching
    # the oracle's floor(epoch(ts)).
    epoch = lambda c: c.cast("timestamp_ltz").cast("long")
    new_sess = (
        F.when(gap.isNull(), 1)
        .when(epoch(F.col("ts")) - epoch(gap) > gap_minutes * 60, 1)
        .otherwise(0)
    )
    with_id = events.withColumn(
        "session_seq", F.sum(new_sess).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return (
        with_id.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
    )


def duckdb_windows_sql(events_rel: str = "events", minutes: int = 5) -> str:
    """Oracle for windowed_counts_batch (epoch-floor window math).

    ``events_rel`` is a DuckDB relation expression — the driver's
    pre-registered ``events`` view by default, or a quoted parquet path
    (``"'/path/events.parquet'"``) in tests.
    """
    secs = minutes * 60
    return f"""
SELECT TIMESTAMP '1970-01-01' + ((floor(epoch(ts))::BIGINT // {secs}) * {secs}) * INTERVAL 1 SECOND AS w_start,
       TIMESTAMP '1970-01-01' + ((floor(epoch(ts))::BIGINT // {secs}) * {secs} + {secs}) * INTERVAL 1 SECOND AS w_end,
       event_type, count(*) AS n, round(sum(value), 6) AS total
FROM {events_rel}
GROUP BY 1, 2, 3
"""


def duckdb_sessionize_sql(events_rel: str = "events", gap_minutes: int = 30) -> str:
    """Oracle for sessionize_batch. ``session_seq`` is cast to BIGINT:
    DuckDB's windowed sum(int) yields HUGEINT, which pandas maps to
    float64 and the driver's typed hash would mismatch Spark's int64."""
    g = gap_minutes * 60
    return f"""
WITH o AS (
  SELECT *, lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM {events_rel}
),
m AS (
  SELECT *, CASE WHEN prev IS NULL OR floor(epoch(ts))::BIGINT - floor(epoch(prev))::BIGINT > {g}
                 THEN 1 ELSE 0 END AS new_sess
  FROM o
),
s AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING)::BIGINT AS session_seq
  FROM m
)
SELECT user_id, session_seq, count(*) AS n_events,
       min(ts) AS session_start, max(ts) AS session_end
FROM s GROUP BY user_id, session_seq
"""
