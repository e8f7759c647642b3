"""Z-order (Morton) spatial clustering for the write path.

At 100 TB a spatial query's cost is decided before any operator runs: by
how many files/row-groups the scan can SKIP on parquet min/max statistics.
Rows written in ingest order scatter every region across every file, so a
bbox predicate prunes nothing; rows clustered along a space-filling curve
give each file a tight lat/lon envelope, so the same predicate skips the
overwhelming majority of the data (the same reason Delta/Iceberg expose
Z-ORDER clustering — here it is plain DataFrame ops, no table format
needed).

``morton_col`` interleaves the bits of the XYZ tile coordinates at a fixed
zoom — pure JVM shift/mask expressions, whole-stage codegen, no Python —
and ``spatial_sorted_write`` range-partitions + sorts by that key before
writing, which is exactly a distributed Z-order cluster: repartitionByRange
samples the key distribution, so hot spots get MORE files (each still
tight) instead of skewing one reducer.

Reference scope note: jimmy writes one file per note in converter order
(writer.py); the engine's write path is where the 10^12-row design departs
— clustering is what makes the spatial read path (dist_join, PIP, kNN over
a bbox) sublinear in table size on a real lake.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jimmy_spark.functions import tiles

# zoom whose tile grid feeds the Morton interleave: 2^16 x 2^16 cells —
# one key step ~600 m at the equator, far finer than a file's row span
DEFAULT_ZOOM = 16


def morton_col(x: Column, y: Column, bits: int = DEFAULT_ZOOM) -> Column:
    """Interleave the low ``bits`` of x (even positions) and y (odd):
    the standard Morton/Z curve key, as a single codegen'd expression."""
    out = F.lit(0).cast("long")
    for i in range(bits):
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        )
        out = out.bitwiseOR(
            F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return out


def zorder_key(
    lat_col: str = "lat_e7", lon_col: str = "lon_e7", zoom: int = DEFAULT_ZOOM
) -> Column:
    """Morton key of the point's tile at ``zoom`` (JVM-only)."""
    return morton_col(
        tiles.x_col(F.col(lon_col), zoom),
        tiles.y_col(F.col(lat_col), zoom),
        bits=zoom,
    )


def spatial_sorted_write(
    df: DataFrame,
    out_dir: str,
    n_files: int,
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
    zoom: int = DEFAULT_ZOOM,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as ``n_files`` parquet files Z-order-clustered on
    (lat, lon). Every output file covers a contiguous Morton range, so its
    parquet min/max stats on the coordinate columns form a tight envelope
    — the skip index for every later spatial scan. The key column does
    not survive into the files."""
    keyed = df.withColumn("_z", zorder_key(lat_col, lon_col, zoom))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(out_dir)
    )
