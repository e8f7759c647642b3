"""Structured-Streaming twin of the spatial hot path: continuous ingest.

North_rule ties the engine to "resumes idempotently mid-tier"; the batch
side is streaming/checkpoint.py's bucket-committed StageRunner. This module
is the §2.9 continuous-arrival twin: at 10^12-image scale the images table
is never "done" — new partitions land while the job runs. Here new parquet
files under the source directory arrive as micro-batches through a file
stream, flow through the SAME fused spatial kernel as the batch job
(operators/fused.py — decode -> georef -> hex/S2 cells -> XYZ tiles ->
broadcast R-tree PIP, one Arrow crossing, zero shuffle, so the streaming
plan is stateless and append-only), and land in a parquet file sink whose
``_spark_metadata`` transaction log gives exactly-once file commits across
restarts (Spark's own sink guarantee — the streaming analogue of the
StageRunner's write-then-commit rows).

Reference analogue: jimmy converts one export at a time and re-running is
safe by idempotent naming (common.py:171-202); here re-running the stream
is safe by source offsets + sink log.

Trigger discipline: ``availableNow`` processes everything currently in the
source then stops — the deployment shape for incremental backfill ("drain
what has arrived, exit, resume later"), and what the tests drive. A
production continuous deployment drops the trigger for micro-batching.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from jimmy_spark.operators import fused
from jimmy_spark.sources.images import IMAGES_SCHEMA


def spatial_ingest_stream(
    spark: SparkSession,
    images_dir: str,
    polygons: pd.DataFrame,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming DataFrame: fused spatial enrichment over arriving files.

    The fused stage is stateless (mapInPandas + closure-broadcast R-tree),
    so it composes with a streaming source unchanged — one definition
    serves batch job, bench, and stream (no semantic twin to drift).
    """
    reader = spark.readStream.schema(IMAGES_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    images = reader.parquet(images_dir)
    return fused.fused_spatial_stage(images, polygons)


def run_spatial_ingest(
    spark: SparkSession,
    images_dir: str,
    polygons: pd.DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Drain everything currently in ``images_dir`` into the parquet sink,
    exactly-once across restarts (source offsets in ``checkpoint_dir``,
    file commits in the sink's ``_spark_metadata`` log), then return.

    Calling again after more files arrive processes ONLY the new files;
    calling again with nothing new is a no-op — both are the idempotent
    resume semantics of the batch StageRunner, inherited from Spark's
    source/sink logs instead of a hand-kept bucket table.
    """
    enriched = spatial_ingest_stream(
        spark, images_dir, polygons, max_files_per_trigger
    )
    q = (
        enriched.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


POINTS_SCHEMA = "image_id string, lat_e7 long, lon_e7 long"


def run_proximity_stream(
    spark: SparkSession,
    points_dir: str,
    d: int,
    out_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> None:
    """Continuous within-distance pair maintenance: as point files arrive,
    emit exactly the NEW pairs (new x new ∪ new x old) via
    ``distance_join_grid_incremental`` — after any number of batches the
    union of emitted pairs equals the batch ``distance_join_grid`` over
    all points, each pair exactly once. Old x old mass is never
    recomputed: per-batch work is proportional to the new points' own
    neighborhoods (the streaming analogue of the grid join's
    output-proportional candidate bound).

    Exactly-once across restarts WITHOUT a sink transaction log:
    ``foreachBatch`` is at-least-once, so both writes are keyed by the
    deterministic batch id and use overwrite — a replayed batch (same
    source offsets -> same rows) overwrites itself byte-identically:

    - ``<out_dir>/b=<id>``   new pairs of this batch
    - ``<state_dir>/b=<id>`` this batch's points (the OLD side of later
      batches; a replayed batch reads only ids < its own, so its own
      half-written state never leaks into its OLD side)

    Reference analogue: jimmy's idempotent re-run naming
    (common.py:171-202) — here idempotence comes from source offsets +
    deterministic batch-keyed overwrite.
    """
    import os

    from jimmy_spark.operators.distjoin import distance_join_grid_incremental

    def _process(batch_df, batch_id: int) -> None:
        pts = batch_df.select("image_id", "lat_e7", "lon_e7")
        older = sorted(
            int(e.split("=", 1)[1])
            for e in os.listdir(state_dir)
            if e.startswith("b=") and int(e.split("=", 1)[1]) < batch_id
        ) if os.path.isdir(state_dir) else []
        if older:
            old = spark.read.parquet(*[f"{state_dir}/b={i}" for i in older])
        else:
            old = spark.createDataFrame([], POINTS_SCHEMA)
        pairs = distance_join_grid_incremental(pts, old, d=d)
        pairs.write.mode("overwrite").parquet(f"{out_dir}/b={batch_id}")
        pts.write.mode("overwrite").parquet(f"{state_dir}/b={batch_id}")

    reader = spark.readStream.schema(POINTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(points_dir)
    q = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
