"""Custom stateful streaming operator: first-seen dedup over a stream.

``applyInPandasWithState`` keeps a per-key seen-set so duplicate content
hashes (phash — jimmy's Resource md5 equality, intermediate_format.py:
123-131) are emitted exactly once across micro-batches: the streaming twin
of ``dedup.exact_dedup``. Keys are hash-bucketed so state per key stays
bounded; at production scale this is RocksDB-backed state store territory
(spark.sql.streaming.stateStore.providerClass).

The batch twin (``first_seen_batch``) and a synchronous two-micro-batch
test (tests/test_streaming_state.py) pin the semantics: emitted =
earliest (by image_id) row per phash, and a duplicate arriving in a LATER
micro-batch is suppressed even though the batch twin cannot see batch
boundaries.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "bucket long, phash long, image_id string"
STATE_SCHEMA = "seen array<long>"
N_BUCKETS = 32


def _dedup_fn(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    seen = set(state.get[0]) if state.exists else set()
    # The iterator yields the group's micro-batch in Arrow CHUNKS
    # (maxRecordsPerBatch); first-seen must be decided over the WHOLE
    # micro-batch — per-chunk dedup would let an early chunk's larger
    # image_id beat a later chunk's smaller one. Group state is already
    # bounded per bucket, so one concat holds the same rows the chunks do.
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = pd.concat(chunks, ignore_index=True)
        pdf = pdf.sort_values(["phash", "image_id"], kind="stable")
        fresh = pdf[~pdf["phash"].isin(seen)].drop_duplicates("phash")
        if len(fresh):
            seen.update(int(p) for p in fresh["phash"])
            state.update((list(seen),))
            yield fresh[["bucket", "phash", "image_id"]]
            return
    state.update((list(seen),))


def first_seen_stream(images_stream: DataFrame) -> DataFrame:
    """streaming images -> first-seen (bucket, phash, image_id) rows."""
    keyed = images_stream.select(
        F.pmod(F.xxhash64("phash"), F.lit(N_BUCKETS)).alias("bucket"),
        "phash",
        "image_id",
    )
    return keyed.groupBy("bucket").applyInPandasWithState(
        _dedup_fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def first_seen_batch(images: DataFrame) -> DataFrame:
    """Batch twin: earliest image_id per phash."""
    return (
        images.groupBy("phash")
        .agg(F.min("image_id").alias("image_id"))
        .select(
            F.pmod(F.xxhash64("phash"), F.lit(N_BUCKETS)).alias("bucket"),
            "phash",
            "image_id",
        )
    )


def run_first_seen(
    spark: SparkSession, stream_dir: str, query_name: str = "dedup_out"
) -> DataFrame:
    """Drive the stateful query over a file-source directory to completion
    (one micro-batch per file listing round) and return the sink table."""
    schema = (
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash long"
    )
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)  # several micro-batches -> state matters
        .format("parquet")
        .load(stream_dir)
    )
    q = (
        first_seen_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {query_name}")
