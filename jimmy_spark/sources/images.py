"""Image-table source: Iceberg in production, parquet adapter here.

The reference's 40-converter source zoo (SURVEY §2.1) collapses to one
columnar scan whose per-row ``fmt`` column drives the decode registry. In
production the table is Iceberg (hidden partitioning + min/max pruning on
``bucket(N, image_id)``); this sandbox has no Iceberg runtime jar, so the
reader falls back to a parquet path with identical semantics (SURVEY §7.2
"Iceberg fallback"). The import-try keeps the production path testable the
moment the jar is on the classpath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

IMAGES_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType()),
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.source.SparkTable"
        )
        return True
    except Exception:
        return False


def read_images(spark: SparkSession, source: str) -> DataFrame:
    """``source`` is either an Iceberg table name (``catalog.db.images``)
    or a parquet path. Validates the input_hint schema either way."""
    if "/" not in source and iceberg_available(spark):
        df = spark.read.table(source)
    else:
        df = spark.read.schema(IMAGES_SCHEMA).parquet(source)
    missing = set(f.name for f in IMAGES_SCHEMA.fields) - set(df.columns)
    if missing:
        raise ValueError(f"images table missing columns: {sorted(missing)}")
    return df


def write_images_sink(df: DataFrame, target: str, mode: str = "append") -> None:
    """Sink twin: Iceberg ``writeTo`` in production, parquet here."""
    spark = df.sparkSession
    if "/" not in target and iceberg_available(spark):
        df.writeTo(target).append()
    else:
        df.write.mode(mode).parquet(target)
