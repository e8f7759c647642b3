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


class _FakeState:
    """Minimal GroupState stand-in (exists/get/update) for unit-driving
    _dedup_fn with controlled Arrow chunking."""

    def __init__(self):
        self.exists = False
        self._v = None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v
        self.exists = True


def test_dedup_fn_first_seen_spans_chunks():
    """A later Arrow chunk carrying the SMALLER image_id for a phash must
    win within the micro-batch (regression: per-chunk dedup let the
    earlier chunk's larger id through)."""
    import pandas as pd

    chunk1 = pd.DataFrame({"bucket": [0, 0], "phash": [7, 8], "image_id": ["b", "x"]})
    chunk2 = pd.DataFrame({"bucket": [0], "phash": [7], "image_id": ["a"]})
    state = _FakeState()
    out = pd.concat(list(stateful._dedup_fn((0,), iter([chunk1, chunk2]), state)))
    got = {(r.phash, r.image_id) for r in out.itertuples()}
    assert got == {(7, "a"), (8, "x")}
    assert set(state.get[0]) == {7, 8}
    # second micro-batch: everything suppressed, state kept
    out2 = list(stateful._dedup_fn((0,), iter([chunk1]), state))
    assert not out2 or all(len(p) == 0 for p in out2)
    assert set(state.get[0]) == {7, 8}
