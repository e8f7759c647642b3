"""Trajectory family (operators/trajectory.py): gap/jump segmentation,
per-segment stats, stay-point detection, OD matrix.

Three layers: planted-structure recovery on the deterministic tracks
table (datagen/tracks.py plants jumps, time gaps, and stays the operators
must find), DuckDB-twin parity (the same checks the driver gate runs via
``session_windows``, here directly on each operator), and the
partitioning-invariance argument behind the integer path length.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from jimmy_spark.operators import trajectory as tj


@pytest.fixture(scope="module")
def tracks_path():
    from jimmy_spark.datagen import ensure_tracks

    return f"{ensure_tracks('t2')}/tracks.parquet"


@pytest.fixture(scope="module")
def segged(spark, tracks_path):
    df = tj.segment_tracks(spark.read.parquet(tracks_path))
    df.cache().count()
    yield df
    df.unpersist()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="stable").reset_index(drop=True)


class TestPlantedStructure:
    def test_every_entity_has_multiple_segments(self, segged):
        # datagen plants >=1 jump and >=1 time gap per entity, so every
        # entity splits into >=2 segments (start break + at least one more)
        per_ent = segged.groupBy("entity_id").agg(
            F.max("seg_seq").alias("n_segs")
        )
        assert per_ent.filter("n_segs < 2").count() == 0

    def test_segment_starts_have_zero_step(self, segged):
        firsts = (
            segged.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("entity_id", "seg_seq").orderBy("seq")
                ),
            )
            .filter("rn = 1")
        )
        assert firsts.filter("step_len != 0").count() == 0

    def test_most_entities_have_a_stay(self, segged):
        # 2 planted stays per entity; a stay dies only when a planted jump
        # or gap lands inside its run, so demand stays in >=90% of entities
        n_ent = segged.select("entity_id").distinct().count()
        with_stay = (
            tj.stay_points(segged).select("entity_id").distinct().count()
        )
        assert with_stay >= 0.9 * n_ent

    def test_stay_centroid_is_inside_jitter_box(self, spark, tracks_path, segged):
        # every detected stay's centroid must sit within the stay's own
        # ping bounding box (exact integer mean of member coordinates)
        stays = tj.stay_points(segged)
        tr = spark.read.parquet(tracks_path)
        j = stays.alias("s").join(
            tr.alias("t"),
            (F.col("s.entity_id") == F.col("t.entity_id"))
            & (F.col("t.ts") >= F.col("s.t_start"))
            & (F.col("t.ts") <= F.col("s.t_end")),
        )
        box = j.groupBy("s.entity_id", "s.stay_seq", "s.c_lat", "s.c_lon").agg(
            F.min("t.lat_e7").alias("lo_lat"),
            F.max("t.lat_e7").alias("hi_lat"),
            F.min("t.lon_e7").alias("lo_lon"),
            F.max("t.lon_e7").alias("hi_lon"),
        )
        bad = box.filter(
            (F.col("c_lat") < F.col("lo_lat"))
            | (F.col("c_lat") > F.col("hi_lat"))
            | (F.col("c_lon") < F.col("lo_lon"))
            | (F.col("c_lon") > F.col("hi_lon"))
        )
        assert bad.count() == 0


class TestDuckdbParity:
    def test_segment_stats(self, spark, tracks_path, segged):
        got = tj.segment_stats(segged).toPandas()
        exp = duckdb.sql(
            tj.duckdb_segment_stats_sql(f"'{tracks_path}'")
        ).df()
        pd.testing.assert_frame_equal(
            _norm(got), _norm(exp), check_dtype=False, check_exact=True
        )

    def test_stay_points(self, spark, tracks_path, segged):
        got = tj.stay_points(segged).toPandas()
        exp = duckdb.sql(tj.duckdb_stay_points_sql(f"'{tracks_path}'")).df()
        pd.testing.assert_frame_equal(
            _norm(got), _norm(exp), check_dtype=False, check_exact=True
        )


class TestScaleInvariance:
    def test_path_len_partitioning_invariant(self, spark, tracks_path):
        # the integer path length must not depend on input partitioning —
        # the property that lets the driver hash-gate it (a double sum
        # would be reorder-sensitive)
        tr = spark.read.parquet(tracks_path)
        a = (
            tj.segment_stats(tj.segment_tracks(tr.repartition(1)))
            .toPandas()
        )
        b = (
            tj.segment_stats(tj.segment_tracks(tr.repartition(17, "seq")))
            .toPandas()
        )
        pd.testing.assert_frame_equal(
            _norm(a), _norm(b), check_dtype=False, check_exact=True
        )

    def test_od_matrix_conserves_trips(self, segged):
        stats = tj.segment_stats(segged).cache()
        try:
            od = tj.od_matrix(stats)
            total = od.agg(F.sum("n_trips")).first()[0]
            assert total == stats.count()
        finally:
            stats.unpersist()
