"""End-to-end pipeline: composed stages, checkpointed decode with error
lineage, resume mid-pipeline, skew-safe salted aggregation equality."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jimmy_spark.operators import tiling
from jimmy_spark.plans.pipeline import run_pipeline
from jimmy_spark.streaming.checkpoint import StageRunner


def test_pipeline_outputs(spark, t1_dir):
    outs = run_pipeline(spark, f"{t1_dir}/images.parquet", f"{t1_dir}/polygons.parquet")
    n = spark.read.parquet(f"{t1_dir}/images.parquet").count()
    assert outs["decoded"].count() == n
    assert outs["points"].count() == n  # t1 has no corrupt rows
    assert outs["pip_pairs"].count() > 0
    assert outs["tiles"].count() == 3 * n
    assert outs["cell_counts"].agg(F.sum("cnt")).first()[0] == n
    assert outs["overlay"].count() == outs["pip_pairs"].count() * 3


def test_pipeline_checkpointed_with_error_lineage(spark, t2err_dir, tmp_path):
    runner = StageRunner(spark, str(tmp_path / "cp"), "r1", n_buckets=8)
    outs = run_pipeline(
        spark,
        f"{t2err_dir}/images.parquet",
        f"{t2err_dir}/polygons.parquet",
        runner=runner,
        checkpoint_out=str(tmp_path / "decoded"),
    )
    n = spark.read.parquet(f"{t2err_dir}/images.parquet").count()
    n_bad = outs["decoded"].filter(~F.col("ok")).count()
    assert n_bad == 2 * (400 // 50)  # planted corrupt rows
    m = runner.table.read_all(spark)
    total = m.agg(F.sum("rows_in"), F.sum("rows_out"), F.sum("rows_err")).first()
    assert total[0] == n == total[1]
    assert total[2] == n_bad  # failures recorded in lineage
    # good rows proceed; corrupt rows excluded downstream
    assert outs["points"].count() == n - n_bad


def test_salted_equals_plain_under_skew(spark, t1_dir):
    from jimmy_spark.operators import cells

    imgs = spark.read.parquet(f"{t1_dir}/images.parquet")
    pts = cells.with_hex_cells(
        cells.with_georef(imgs.select("image_id", "phash")), (7, 8),
        use_arrow_udf=False,
    )
    salted = {
        (r.hex_r8, r.cnt) for r in tiling.salted_counts(pts, ["hex_r8"]).collect()
    }
    plain = {
        (r.hex_r8, r.cnt) for r in tiling.plain_counts(pts, ["hex_r8"]).collect()
    }
    assert salted == plain
    # skew fixture is real at r7 (cell size > jitter span): 3 hot cells
    # carry ~skew_frac=0.3 of all rows
    r7 = [r.cnt for r in tiling.plain_counts(pts, ["hex_r7"]).collect()]
    top3 = sum(sorted(r7, reverse=True)[:3])
    assert top3 >= 0.2 * imgs.count()
