"""SparkSession factory with scale-oriented defaults.

Design point is a 1000-executor cluster reading 100 TB; the local[N] session
used in this sandbox applies the same conf knobs (AQE, Arrow, skew join,
bounded Arrow batches for binary-heavy rows) so plans tested here are the
plans that would run there.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    # Adaptive execution: runtime re-plan, partition coalescing, skew split.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas UDF / toPandas crossing.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Binary image rows are wide; cap Arrow batch row count so a batch of
    # (bytes, ...) rows stays well under executor memory (SURVEY §7.3).
    "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
    # Deterministic timestamp semantics vs the DuckDB oracle.
    "spark.sql.session.timeZone": "UTC",
    # Broadcast threshold: polygon/dim tables are small; let Catalyst
    # broadcast aggressively (we also hint explicitly where it matters).
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Quieter local runs.
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def shuffle_partitions_of(spark) -> int:
    """Numeric shuffle-partition count for explicit ``repartition(n)``
    calls (the exactly-once LSH probes). ``spark.sql.shuffle.partitions``
    is not guaranteed numeric — managed platforms set it to ``'auto'``
    under AQE advisory sizing — so fall back to the cluster's default
    parallelism rather than crashing at plan-build time."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def get_spark(
    app_name: str = "jimmy-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's tuned defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]``; shuffle partitions
    default to the core count (local mode) — on a real cluster this is set
    per-job from input size; AQE coalesces down from there.
    """
    cores = default_parallelism()
    if master is None:
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cores}]")
    if shuffle_partitions is None:
        # local[N] → N; "local[*]" → machine cores
        inner = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cores if inner in ("", "*") else int(inner)

    builder = SparkSession.builder.appName(app_name).master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    conf["spark.default.parallelism"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
