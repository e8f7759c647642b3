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
