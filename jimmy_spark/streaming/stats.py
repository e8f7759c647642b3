"""Continuous per-group statistics maintenance: exact quantiles stay
current as rows stream in, with per-batch work proportional to the
groups the batch touched.

Exact order statistics need the value distribution, so the minimal
sufficient state IS the value histogram — and per-(group, value) counts
are a MONOID: fold the batch's delta counts into the previous state and
the result is exactly the histogram of every row seen. Quantiles then
read off the folded state through the histogram-input quantile operator
(operators/quantiles.group_quantiles_from_counts — the same two-stage
no-sort plan), so after any number of micro-batches the latest quantile
table equals the batch ``group_quantiles`` over all rows, exactly.

State discipline is streaming/raster.py's, with GROUPS as the dirty
unit instead of tiles:

- ``<out>/hist/b=<id>``: the UPDATED complete histogram rows
  (group..., value, n) for the groups batch ``id`` touched — a group's
  current histogram is its rows in the highest batch dir containing it;
- ``<out>/quantiles/b=<id>``: re-resolved quantile rows for those
  groups.

State is O(distinct values per group) — the information-theoretic
minimum for exactness over unbounded streams; for the integer domains
this engine carries (char counts, dwell seconds, fixed-point scores)
that is the bounded-histogram regime. Idempotence: replays read state
strictly below their own id and overwrite deterministically; compaction
(latest-per-group rewrite) is observationally a no-op.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from jimmy_spark.operators import quantiles as qt


def _state_ids(dir_: str, below: int | None = None) -> list[int]:
    if not os.path.isdir(dir_):
        return []
    ids = [
        int(e.split("=", 1)[1]) for e in os.listdir(dir_) if e.startswith("b=")
    ]
    if below is not None:
        ids = [i for i in ids if i < below]
    return sorted(ids)


def _latest_per_group(
    spark: SparkSession, dir_: str, ids: list[int], group_cols: Sequence[str]
) -> DataFrame | None:
    """Rows of the highest batch dir per group across the given ids —
    every write carries a dirty group's COMPLETE rows, so the max id
    per group owns them all. Explicit dir list: a replaying batch never
    reads ids at-or-above its own half-written output."""
    if not ids:
        return None
    df = spark.read.option("basePath", dir_).parquet(
        *[f"{dir_}/b={i}" for i in ids]
    )
    w = Window.partitionBy(*group_cols)
    return (
        df.withColumn("_mb", F.max("b").over(w))
        .filter(F.col("b") == F.col("_mb"))
        .drop("b", "_mb")
    )


def latest_quantiles(
    spark: SparkSession, out_dir: str, group_cols: Sequence[str]
) -> DataFrame | None:
    """The current per-group quantile table (latest rows per group), or
    None before the first batch. Equal to batch ``group_quantiles`` over
    every row arrived so far."""
    d = f"{out_dir}/quantiles"
    return _latest_per_group(spark, d, _state_ids(d), group_cols)


def run_quantile_stream(
    spark: SparkSession,
    src_dir: str,
    source_schema: str,
    group_cols: Sequence[str],
    val_col: str,
    out_dir: str,
    checkpoint_dir: str,
    qs: tuple[float, ...] = (0.5, 0.9),
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain everything currently in ``src_dir``, folding each
    micro-batch's value counts into the per-group histogram state and
    re-resolving quantiles for the dirty groups only; exactly-once
    across restarts (source offsets in ``checkpoint_dir``, batch-id-
    keyed overwrite under ``out_dir``), then return. Nothing new is a
    no-op."""
    gcols = list(group_cols)
    hist_dir = f"{out_dir}/hist"
    q_dir = f"{out_dir}/quantiles"

    def _process(batch_df, batch_id: int) -> None:
        delta = (
            batch_df.select(*gcols, val_col)
            .where(F.col(val_col).isNotNull())
            .groupBy(*gcols, val_col)
            .agg(F.count(F.lit(1)).alias("n"))
        )
        prev = _latest_per_group(
            spark, hist_dir, _state_ids(hist_dir, below=batch_id), gcols
        )
        if prev is not None:
            dirty = delta.select(*gcols).distinct()
            carried = prev.join(dirty, gcols, "left_semi")
            delta = (
                delta.unionByName(carried)
                .groupBy(*gcols, val_col)
                .agg(F.sum("n").alias("n"))
            )
        delta = delta.persist()
        delta.write.mode("overwrite").parquet(f"{hist_dir}/b={batch_id}")
        qt.group_quantiles_from_counts(
            delta, gcols, val_col, "n", qs=qs
        ).write.mode("overwrite").parquet(f"{q_dir}/b={batch_id}")
        delta.unpersist()

    reader = spark.readStream.schema(source_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(src_dir)
    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
