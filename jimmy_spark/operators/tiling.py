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
