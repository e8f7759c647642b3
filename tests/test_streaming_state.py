"""Stateful streaming dedup: cross-micro-batch suppression == batch twin."""

from __future__ import annotations

import pyarrow.parquet as pq

from jimmy_spark.streaming import stateful


def test_first_seen_stream_matches_batch(spark, t1_dir, tmp_path):
    imgs = spark.read.parquet(f"{t1_dir}/images.parquet")
    # two micro-batch files with overlapping phash values: duplicates of
    # batch-1 rows arrive again in batch 2 under different image_ids
    a = imgs.limit(300)
    b = imgs.limit(300)  # identical phashes, will re-arrive in a later file
    d = tmp_path / "stream"
    d.mkdir()
    a.toPandas().to_parquet(d / "batch1.parquet")
    bb = b.toPandas()
    bb["image_id"] = "zzz_" + bb["image_id"]  # later ids, same phash
    bb.to_parquet(d / "batch2.parquet")

    got = stateful.run_first_seen(spark, str(d))
    rows = {(r.phash, r.image_id) for r in got.collect()}

    union = spark.read.parquet(str(d))
    exp = {
        (r.phash, r.image_id)
        for r in stateful.first_seen_batch(union).collect()
    }
    assert rows == exp
    # and specifically: no zzz_ duplicate survived (suppressed by state)
    assert not any(i.startswith("zzz_") for _, i in rows)
