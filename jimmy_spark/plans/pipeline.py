"""End-to-end flagship pipeline (SURVEY §3.4).

    read images -> decode+validate (error isolation) -> georef
    -> hex/S2 cells -> broadcast R-tree PIP join -> tile assignment
    -> per-cell salted counts -> result

Every stage is a DataFrame -> DataFrame function; Catalyst plans the
physical execution. The binary column is consumed inside the decode stage
only (column pruning keeps it out of every shuffle). With
``runner=StageRunner(...)`` the decode stage goes through the checkpoint
table and is resumable; the later stages are cheap narrow maps/joins
recomputed from the decoded table.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from jimmy_spark.operators import cells, decode, pip, tiling
from jimmy_spark.streaming.checkpoint import StageRunner


def run_pipeline(
    spark: SparkSession,
    images_path: str,
    polygons_path: str,
    runner: StageRunner | None = None,
    checkpoint_out: str | None = None,
    use_arrow_udf_cells: bool = False,
) -> dict[str, DataFrame]:
    """Returns the materialized stage outputs keyed by name."""
    images = spark.read.parquet(images_path)

    if runner is not None:
        decoded = runner.run_stage(
            "decode", images, decode.decode_stage, checkpoint_out
        )
    else:
        decoded = decode.decode_stage(images)

    good = decoded.filter(F.col("ok"))
    pts = cells.with_georef(good)
    pts = cells.with_hex_cells(pts, use_arrow_udf=use_arrow_udf_cells)
    pts = cells.with_s2_cells(pts)

    poly_pdf = pd.read_parquet(polygons_path)
    pip_pairs = pip.pip_join_rtree(pts, poly_pdf)

    tiles_long = tiling.tile_assignments(pts)
    cell_counts = tiling.salted_counts(pts, ["hex_r8"])
    tile_counts = tiling.plain_counts(tiles_long, ["z", "x", "y"])

    overlay = pip_pairs.join(tiles_long, "image_id")

    return {
        "decoded": decoded,
        "points": pts,
        "pip_pairs": pip_pairs,
        "tiles": tiles_long,
        "cell_counts": cell_counts,
        "tile_counts": tile_counts,
        "overlay": overlay,
    }
