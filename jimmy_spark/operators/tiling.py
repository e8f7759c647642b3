"""XYZ raster-tile assignment + per-tile/per-cell aggregation with salting.

Tile assignment is pure JVM column math (functions/tiles.py) — one narrow
map producing (z, x, y) per zoom; the raster<->vector overlay is then an
equi-join or groupBy on the tile key.

Skew: phash-derived points are near-uniform, but the *skew fixture*
(datagen ``skew_frac``) concentrates 30-40% of rows into 3 hot cells —
modeling urban clustering at 10^12 scale. A plain ``groupBy(cell)`` then
bottlenecks on 3 reducer partitions. ``salted_counts`` implements the
north_rule's salted two-stage aggregation:

    stage 1: groupBy(cell, salt = pmod(xxhash64(id), S)) -> partial counts
    stage 2: groupBy(cell) -> sum(partial)

Stage 1 spreads each hot key over S reducers; stage 2 combines S tiny rows
per key. (For algebraic aggregates Spark's map-side partial aggregation
already mitigates count skew — the salt matters once per-key state is
non-trivial (collect_list/distinct) or when AQE is off; we keep both paths
and verify equality. AQE skew-join splitting stays on in session.py.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jimmy_spark.functions import tiles


def with_tiles(
    df: DataFrame,
    zooms=tiles.ZOOMS,
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
) -> DataFrame:
    """Add tile_z{z}_x / tile_z{z}_y columns (JVM expressions)."""
    for z in zooms:
        df = df.withColumn(f"tile_z{z}_x", tiles.x_col(F.col(lon_col), z))
        df = df.withColumn(f"tile_z{z}_y", tiles.y_col(F.col(lat_col), z))
    return df


def tile_assignments(
    df: DataFrame,
    zooms=tiles.ZOOMS,
    id_col: str = "image_id",
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
) -> DataFrame:
    """Long form: (id, z, x, y) — one row per (image, zoom)."""
    pairs = []
    for z in zooms:
        pairs.append(
            F.struct(
                F.lit(z).cast("int").alias("z"),
                tiles.x_col(F.col(lon_col), z).alias("x"),
                tiles.y_col(F.col(lat_col), z).alias("y"),
            )
        )
    return (
        df.select(id_col, F.explode(F.array(*pairs)).alias("t"))
        .select(id_col, "t.z", "t.x", "t.y")
    )


def salted_counts(
    df: DataFrame, key_cols: list[str], salt_buckets: int = 32, id_col: str = "image_id"
) -> DataFrame:
    """Two-stage salted count per key: exact, skew-resistant."""
    salted = df.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(F.count("*").alias("_partial"))
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias("cnt"))


def plain_counts(df: DataFrame, key_cols: list[str]) -> DataFrame:
    return df.groupBy(*key_cols).agg(F.count("*").alias("cnt"))


def pyramid_counts(
    df: DataFrame,
    zooms=tiles.ZOOMS,
    id_col: str = "image_id",
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
    salt_buckets: int = 32,
) -> DataFrame:
    """Per-tile counts at EVERY zoom from ONE scan of the points: the
    finest zoom aggregates the data (salted, skew-resistant), then each
    coarser level is derived from the finer COUNTS frame via the exact
    nested-floor identity ``x_{z-k} = x_z div 2^k`` (floor(floor(a*2^z) /
    2^k) == floor(a*2^(z-k)) for the normalized [0,1) tile fraction; the
    pole clamp commutes with the division). At 10^12 points the naive
    per-zoom plan scans and shuffles the full table once per level;
    here the rollup inputs shrink to the finest tile-count frame
    (bounded by 4^z_max cells, in practice by occupancy) — the classic
    datacube rollup, exact by construction, differential-tested equal
    to the naive per-zoom counts.

    Output: (z:int, x:long, y:long, cnt:long), all zooms unioned.
    """
    zs = sorted(zooms, reverse=True)
    finest = zs[0]
    pts = df.select(
        id_col,
        tiles.x_col(F.col(lon_col), finest).alias("x"),
        tiles.y_col(F.col(lat_col), finest).alias("y"),
    )
    level = salted_counts(pts, ["x", "y"], salt_buckets=salt_buckets, id_col=id_col)
    if len(zs) > 1:
        # every coarser level reads this frame: persist it or the Union
        # branches each re-execute the full scan+aggregation (verified —
        # Catalyst's ReuseExchange does not fire across these branches).
        # The frame is bounded by occupied finest tiles, far below the
        # input; MEMORY_AND_DISK so a huge occupancy degrades, not OOMs.
        from pyspark import StorageLevel

        level = level.persist(StorageLevel.MEMORY_AND_DISK)
    out = level.select(F.lit(finest).cast("int").alias("z"), "x", "y", "cnt")
    prev_z, prev = finest, level
    for z in zs[1:]:
        k = prev_z - z
        prev = (
            prev.groupBy(
                F.shiftright("x", k).alias("x"), F.shiftright("y", k).alias("y")
            )
            .agg(F.sum("cnt").alias("cnt"))
        )
        out = out.unionByName(
            prev.select(F.lit(z).cast("int").alias("z"), "x", "y", "cnt")
        )
        prev_z = z
    return out
