"""Temporal joins Spark lacks as built-ins: as-of and range/interval.

The reference has none of these (SURVEY §2.4: "No sort-merge, range,
as-of, or interval joins exist in the reference") — they are engine
additions the task brief names explicitly, implemented as compositions of
existing DataFrame ops (no UDFs, no cross joins):

- ``asof_join`` — for every left row, the latest right row with
  ``right.ts <= left.ts`` per key. The classic distributed formulation:
  UNION the two streams with a side tag, sort per key by (ts, side) so a
  right row at the same timestamp precedes the left rows it should serve,
  and carry the right payload forward with ``last(..., ignorenulls)`` over
  an unbounded-preceding window. ONE shuffle on the key — the same cost
  as a plain equi-join — versus the naive inequality join's per-key
  cross product. DuckDB ships a native ASOF JOIN, which makes the oracle
  an independent implementation of the semantics.

- ``range_join`` — events matched to the interval(s) [start, end) that
  contain them, per key. A raw inequality join degenerates to a per-key
  cross product; the scale shape bins the time axis: intervals explode to
  the fixed-width bins they overlap, events compute their single bin, the
  join is EQUALITY on (key, bin), and the exact containment predicate
  filters the handful of per-bin candidates. Bin width trades explode
  fan-out (long intervals -> many bins) against candidate volume; the
  oracle is the plain inequality join, so the binning must be lossless.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    payload: str = "r_value",
) -> DataFrame:
    """Left rows + the payload of the latest right row at-or-before their
    timestamp (null when no prior right row exists). Ties on ts: the
    right row serves left rows with the SAME timestamp (<= semantics,
    matching DuckDB ASOF). ``right`` must be unique per (key, ts)."""
    payload_type = dict(right.dtypes)[payload]
    l_tag = left.select(
        key, ts, F.lit(0).alias("_side"),
        F.lit(None).cast(payload_type).alias(payload),
        *[F.col(c) for c in left.columns if c not in (key, ts)],
    )
    r_tag = right.select(
        key, ts, F.lit(1).alias("_side"), F.col(payload),
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left.columns
            if c not in (key, ts)
        ],
    )
    # right (_side=1) sorts BEFORE left (_side=0) at equal ts via desc —
    # the window then carries the right payload into same-ts left rows
    w = (
        Window.partitionBy(key)
        .orderBy(F.col(ts), F.desc("_side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).withColumn(
        "_asof", F.last(payload, ignorenulls=True).over(w)
    )
    keep = [c for c in left.columns]
    return (
        carried.filter(F.col("_side") == 0)
        .select(*keep, F.col("_asof").alias(payload))
    )


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    start: str = "i_start",
    end: str = "i_end",
    interval_id: str = "interval_id",
    bin_seconds: int = 3600,
) -> DataFrame:
    """Inner join: event rows x the intervals [start, end) containing
    them, via time-bin bucketing (equality join on (key, bin) + exact
    containment filter). Epoch arithmetic is integer, so bin assignment
    is deterministic on both engines."""
    e_epoch = F.col(ts).cast("timestamp_ltz").cast("long")
    s_epoch = F.col(start).cast("timestamp_ltz").cast("long")
    # end is exclusive: an interval touching a bin boundary at its end
    # does not occupy the next bin
    end_epoch = F.col(end).cast("timestamp_ltz").cast("long")
    binned_iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(s_epoch / bin_seconds),
                F.floor((end_epoch - 1) / bin_seconds),
            )
        ),
    )
    binned_ev = events.withColumn("_bin", F.floor(e_epoch / bin_seconds))
    joined = binned_ev.join(binned_iv, [key, "_bin"]).filter(
        (e_epoch >= s_epoch) & (e_epoch < end_epoch)
    )
    return joined.drop("_bin")
