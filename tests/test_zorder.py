"""Z-order clustered write (operators/zorder.py): key correctness vs a
pure-Python Morton reference, and the property the operator exists for —
file-level min/max envelopes tight enough that a bbox predicate skips
most files, where an ingest-order write skips ~none."""

import numpy as np
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from jimmy_spark.operators import cells, zorder


def _py_morton(x: int, y: int, bits: int) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_morton_key_matches_python(spark):
    rng = np.random.default_rng(2)
    xs = rng.integers(0, 2**16, size=200)
    ys = rng.integers(0, 2**16, size=200)
    df = spark.createDataFrame(
        [(int(x), int(y)) for x, y in zip(xs, ys)], "x long, y long"
    )
    got = [r.z for r in df.select(zorder.morton_col(F.col("x"), F.col("y")).alias("z")).collect()]
    exp = [_py_morton(int(x), int(y), 16) for x, y in zip(xs, ys)]
    assert got == exp


def test_morton_locality():
    """Adjacent tiles share long key prefixes: the curve is contiguous
    within any power-of-two-aligned quad."""
    # all 4 cells of an aligned 2x2 quad land in one contiguous key range
    for qx, qy in ((0, 0), (10, 22), (2**10, 2**9)):
        keys = [
            _py_morton(2 * qx + dx, 2 * qy + dy, 16)
            for dx in (0, 1)
            for dy in (0, 1)
        ]
        assert max(keys) - min(keys) == 3


@pytest.fixture(scope="module")
def pts(spark, t2_dir):
    imgs = spark.read.parquet(f"{t2_dir}/images.parquet")
    return cells.with_georef(imgs.select("image_id", "phash")).select(
        "image_id", "lat_e7", "lon_e7"
    )


def _file_envelopes(out_dir):
    """[(lat_min, lat_max, lon_min, lon_max)] per parquet file, from the
    footer statistics — what any engine's file-skip consults."""
    import glob

    envs = []
    for f in glob.glob(f"{out_dir}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        la = [
            (md.row_group(g).column(c).statistics.min,
             md.row_group(g).column(c).statistics.max)
            for g in range(md.num_row_groups)
            for c in range(md.num_columns)
            if md.schema.column(c).name == "lat_e7"
        ]
        lo = [
            (md.row_group(g).column(c).statistics.min,
             md.row_group(g).column(c).statistics.max)
            for g in range(md.num_row_groups)
            for c in range(md.num_columns)
            if md.schema.column(c).name == "lon_e7"
        ]
        if la and lo:
            envs.append((
                min(a for a, _ in la), max(b for _, b in la),
                min(a for a, _ in lo), max(b for _, b in lo),
            ))
    return envs


def test_zorder_write_enables_file_skipping(spark, pts, tmp_path):
    n_files = 16
    z_dir = str(tmp_path / "zsorted")
    raw_dir = str(tmp_path / "raw")
    zorder.spatial_sorted_write(pts, z_dir, n_files=n_files)
    # ingest-order twin: same file count, no clustering
    pts.repartition(n_files).write.parquet(raw_dir)

    # rows preserved exactly
    a = sorted(r.image_id for r in spark.read.parquet(z_dir).collect())
    b = sorted(r.image_id for r in pts.collect())
    assert a == b

    # bbox: the densest coarse-grid region (one t2 planted hot cluster)
    pdf = pts.toPandas()
    # find the hot cell: mode of coarse grid
    g = (pdf.lat_e7 // 1_000_000).astype(str) + ":" + (pdf.lon_e7 // 1_000_000).astype(str)
    top = g.value_counts().index[0]
    glat, glon = (int(v) for v in top.split(":"))
    bbox = (glat * 1_000_000, (glat + 1) * 1_000_000,
            glon * 1_000_000, (glon + 1) * 1_000_000)

    def overlapping(envs):
        return sum(
            1
            for la0, la1, lo0, lo1 in envs
            if not (la1 < bbox[0] or la0 > bbox[1] or lo1 < bbox[2] or lo0 > bbox[3])
        )

    z_envs = _file_envelopes(z_dir)
    r_envs = _file_envelopes(raw_dir)
    assert len(z_envs) >= n_files // 2 and len(r_envs) >= n_files // 2
    z_hit = overlapping(z_envs)
    r_hit = overlapping(r_envs)
    # ingest order: essentially every file intersects the bbox; z-order:
    # the bbox touches only the files whose morton range covers it
    assert r_hit >= len(r_envs) - 1, (r_hit, len(r_envs))
    assert z_hit <= len(z_envs) // 4, (z_hit, len(z_envs))

    # and the skip is SOUND: files outside the envelope hold no bbox rows
    inside = spark.read.parquet(z_dir).filter(
        f"lat_e7 BETWEEN {bbox[0]} AND {bbox[1]} AND lon_e7 BETWEEN {bbox[2]} AND {bbox[3]}"
    ).count()
    exp_inside = pts.filter(
        f"lat_e7 BETWEEN {bbox[0]} AND {bbox[1]} AND lon_e7 BETWEEN {bbox[2]} AND {bbox[3]}"
    ).count()
    assert inside == exp_inside and exp_inside > 0
