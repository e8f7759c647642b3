"""Deterministic synthetic audio/video tables (QWAV/QVID containers).

Same discipline as images.py: content derives from splitmix64 of the row
index, no RNG objects, marker-cached by datasets.ensure_media. The media
bytes feed the multimodal audio/video operators — the decode step is a
deterministic fake codec (codecs/qwav.py, qvid.py STUB NOTICE), the Spark
plumbing around it is real.

Schemas:
  audios (media_id string, bytes binary, sample_rate int32,
          n_samples int32, caption string)
  videos (media_id string, bytes binary, w int32, h int32,
          n_frames int32, fps int32, caption string)
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from jimmy_spark.codecs import qvid, qwav
from jimmy_spark.datagen.core import splitmix64


def make_samples(i: int, n: int) -> np.ndarray:
    """Deterministic int16 waveform: a hash-seeded integer random walk
    (has realistic zero crossings / RMS without any float ops)."""
    steps = splitmix64(
        np.arange(i * 1_000_003, i * 1_000_003 + n, dtype=np.uint64)
    )
    walk = np.cumsum((steps % np.uint64(2001)).astype(np.int64) - 1000)
    return (walk % 60001 - 30000).astype(np.int16)


def make_frames(i: int, n: int, h: int, w: int) -> np.ndarray:
    """Deterministic (n,h,w,3) uint8 frames: per-frame shifted gradients."""
    f = np.arange(n, dtype=np.int64)[:, None, None, None]
    ys = np.arange(h, dtype=np.int64)[None, :, None, None]
    xs = np.arange(w, dtype=np.int64)[None, None, :, None]
    cs = np.arange(3, dtype=np.int64)[None, None, None, :]
    phase = int(splitmix64(np.array([i], dtype=np.uint64))[0] & np.uint64(0xFFFF))
    return ((phase + 11 * f + 3 * xs + 7 * ys + 37 * cs) % 256).astype(np.uint8)


def write_audios(path: str, n_rows: int, seed: int) -> None:
    h = splitmix64(np.arange(n_rows, dtype=np.uint64) ^ np.uint64(seed * 7919))
    ids, blobs, srs, lens, captions = [], [], [], [], []
    for i in range(n_rows):
        sr = 8000 if h[i] % np.uint64(2) == 0 else 16000
        n = int(2000 + h[i] % np.uint64(6000))
        samples = make_samples(i, n)
        ids.append(f"aud{i:06d}")
        blobs.append(qwav.encode(samples, sr))
        srs.append(sr)
        lens.append(n)
        captions.append(f"audio clip {i} ({n} samples @ {sr} Hz)")
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(ids),
                "bytes": pa.array(blobs, type=pa.binary()),
                "sample_rate": pa.array(srs, type=pa.int32()),
                "n_samples": pa.array(lens, type=pa.int32()),
                "caption": pa.array(captions),
            }
        ),
        path,
    )


def write_videos(path: str, n_rows: int, seed: int) -> None:
    h = splitmix64(np.arange(n_rows, dtype=np.uint64) ^ np.uint64(seed * 104729))
    ids, blobs, ws, hs, nfs, fpss, captions = [], [], [], [], [], [], []
    for i in range(n_rows):
        w, ht = 32, 24
        nf = int(4 + h[i] % np.uint64(9))
        fps = 10 if h[i] % np.uint64(3) else 24
        frames = make_frames(i, nf, ht, w)
        ids.append(f"vid{i:06d}")
        blobs.append(qvid.encode(frames, fps))
        ws.append(w)
        hs.append(ht)
        nfs.append(nf)
        fpss.append(fps)
        captions.append(f"video clip {i} ({nf} frames @ {fps} fps)")
    pq.write_table(
        pa.table(
            {
                "media_id": pa.array(ids),
                "bytes": pa.array(blobs, type=pa.binary()),
                "w": pa.array(ws, type=pa.int32()),
                "h": pa.array(hs, type=pa.int32()),
                "n_frames": pa.array(nfs, type=pa.int32()),
                "fps": pa.array(fpss, type=pa.int32()),
                "caption": pa.array(captions),
            }
        ),
        path,
    )
