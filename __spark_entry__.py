"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship pipeline slice on the small t1 dataset;
``queries()``/``oracle_sql()`` expose every implemented operator with its
DuckDB oracle (see jimmy_spark/queries.py and SURVEY.md §2).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the jimmy_spark package importable regardless of the caller's cwd.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: decode -> georef -> hex/S2 cells -> broadcast R-tree
    PIP join -> z12 tile -> (image_id, cell, tile, polygon_id, caption)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from jimmy_spark.datagen import ensure_dataset
    from jimmy_spark.functions import tiles
    from jimmy_spark.operators import cells, decode, pip

    d = ensure_dataset("t1")
    images = spark.read.parquet(f"{d}/images.parquet")
    decoded = decode.decode_stage(images).filter(F.col("ok"))
    pts = cells.with_s2_cells(
        cells.with_hex_cells(cells.with_georef(decoded), (8,), use_arrow_udf=True),
        (12,),
    )
    poly_pdf = pd.read_parquet(f"{d}/polygons.parquet")
    pairs = pip.pip_join_rtree(pts, poly_pdf)
    return (
        pts.join(pairs, "image_id", "left")
        .select(
            "image_id",
            "hex_r8",
            "s2_l12",
            tiles.x_col(F.col("lon_e7"), 12).alias("tile_x"),
            tiles.y_col(F.col("lat_e7"), 12).alias("tile_y"),
            F.coalesce(F.col("polygon_id"), F.lit("none")).alias("polygon_id"),
            "caption",
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from jimmy_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (engine tables by absolute path,
    driver tables by pre-registered view name). Omitted keys (s2_cells,
    decode_stats) are non-SQL-expressible -> rows-only check."""
    from jimmy_spark.queries import oracle_sql as _oracle

    return _oracle()
