"""Resume/idempotence: kill mid-stage, rerun, outputs byte-identical to an
uninterrupted run; every bucket committed exactly once (FIXTURES.md §6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jimmy_spark.operators import cells
from jimmy_spark.streaming.checkpoint import StageRunner


def _stage(df):
    out = cells.with_georef(df.select("image_id", "phash"))
    return cells.with_hex_cells(out, (8,), use_arrow_udf=False)


@pytest.fixture()
def images(spark, t1_dir):
    return spark.read.parquet(f"{t1_dir}/images.parquet")


def _collect(df):
    return sorted(tuple(r) for r in df.select("image_id", "hex_r8").collect())


def test_resume_identical_to_clean_run(spark, images, tmp_path):
    clean = StageRunner(spark, str(tmp_path / "cp"), "clean", n_buckets=16)
    out_a = clean.run_stage(
        "georef", images, _stage, str(tmp_path / "out_clean")
    )
    a = _collect(out_a)

    crash = StageRunner(spark, str(tmp_path / "cp"), "crashy", n_buckets=16)
    with pytest.raises(RuntimeError, match="injected failure"):
        crash.run_stage(
            "georef",
            images,
            _stage,
            str(tmp_path / "out_crash"),
            chunk_buckets=4,
            fail_after_chunks=2,
        )
    # partial progress recorded
    done = crash.table.committed_buckets("georef")
    assert 0 < len(done) < 16

    resumed = StageRunner(spark, str(tmp_path / "cp"), "crashy", n_buckets=16)
    out_b = resumed.run_stage(
        "georef", images, _stage, str(tmp_path / "out_crash"), chunk_buckets=4
    )
    assert _collect(out_b) == a

    # exactly one committed row per bucket; lineage counts conserved
    m = resumed.table.read_all(spark).filter(F.col("stage") == "georef")
    per_bucket = m.groupBy("bucket").count().collect()
    assert len(per_bucket) == 16 and all(r["count"] == 1 for r in per_bucket)
    total = m.agg(F.sum("rows_in"), F.sum("rows_out")).first()
    assert total[0] == images.count() == total[1]


def test_rerun_after_completion_is_noop(spark, images, tmp_path):
    r = StageRunner(spark, str(tmp_path / "cp"), "done", n_buckets=8)
    out1 = r.run_stage("s", images, _stage, str(tmp_path / "o"))
    a = _collect(out1)
    r2 = StageRunner(spark, str(tmp_path / "cp"), "done", n_buckets=8)
    out2 = r2.run_stage("s", images, _stage, str(tmp_path / "o"))
    assert _collect(out2) == a
    m = r2.table.read_all(spark).filter(F.col("stage") == "s")
    assert m.count() == 8  # no duplicate commits from the no-op rerun
