"""Deterministic synthetic image+caption table (FIXTURES.md §1).

Schema exactly per BASELINE.json ``input_hint``:
(image_id string, bytes binary, w int32, h int32, fmt string,
 caption string, phash int64).

Pixel content is a deterministic per-row gradient + hash-seeded phase (no
RNG objects in the hot loop, compresses well so bench tables stay small);
captions include unicode/markdown edge cases mirroring jimmy's caption
fidelity tests. ``skew_frac`` remaps a fraction of rows into 3 hot hex
cells (FIXTURES.md skew fixture); ``corrupt_every`` yields rows with
truncated bytes / mismatched fmt (error-isolation fixture, mirroring
/root/reference/src/jimmy/common.py:66-82 per-record isolation).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from jimmy_spark.codecs.registry import encode_image
from jimmy_spark.datagen.core import phash_for_index, splitmix64
from jimmy_spark.functions.georef import invert_latlon_e7

WIDTHS = (16, 32, 64)
HEIGHTS = (16, 24, 48)
FMTS = ("png", "jpeg", "bmp")

# Hot-cell centers for the skew fixture (lat_e7, lon_e7): three "cities".
HOT_CENTERS = ((407128000, -740060000), (515074000, -1278000), (356895000, 1396917000))


def make_pixels(i: int, w: int, h: int, phase: int) -> np.ndarray:
    """Deterministic (h, w, 3) uint8: linear gradients with per-row phase."""
    ys = np.arange(h, dtype=np.int64)[:, None, None]
    xs = np.arange(w, dtype=np.int64)[None, :, None]
    cs = np.arange(3, dtype=np.int64)[None, None, :]
    p = phase & 0xFFFF
    return ((p + xs * (3 + (phase >> 16) % 5) + ys * (7 + (phase >> 20) % 3) + cs * 37) % 256).astype(
        np.uint8
    )


def make_caption(i: int, phash: int) -> str:
    return (
        f"Caption {i:08d} — “geo” #tag{i % 7} [asset](https://example.org/img/{i}) "
        f"émoji✓ h={phash & 0xFFFF:04x} 'quoted' \\backslash\ttab"
    )


def _skew_phash(idx: np.ndarray, phash: np.ndarray, seed: int, skew_frac: float) -> np.ndarray:
    """Deterministically remap ~skew_frac of rows into jittered hot centers
    (invert the georef bit-split). Pure function of (global index, seed),
    so any slice of indices — a shard, or one base row looked up by a dup
    plant — remaps identically."""
    h2 = splitmix64(idx ^ np.uint64(seed * 7919))
    skewed = (h2 % np.uint64(1_000_000)) < np.uint64(int(skew_frac * 1_000_000))
    which = (h2 >> np.uint64(8)) % np.uint64(len(HOT_CENTERS))
    jit_lat = ((h2 >> np.uint64(16)) % np.uint64(40_000)).astype(np.int64) - 20_000
    jit_lon = ((h2 >> np.uint64(32)) % np.uint64(40_000)).astype(np.int64) - 20_000
    lat = np.choose(which.astype(np.int64), [c[0] for c in HOT_CENTERS]) + jit_lat
    lon = np.choose(which.astype(np.int64), [c[1] for c in HOT_CENTERS]) + jit_lon
    return np.where(skewed, invert_latlon_e7(lat, lon), phash)


def generate_images(
    n: int,
    seed: int = 42,
    skew_frac: float = 0.0,
    corrupt_every: int = 0,
    start: int = 0,
    dup_every: int = 0,
    dup_colocate: bool = False,
) -> pa.Table:
    """Rows [start, start+n) of the (deterministic, global-index-keyed)
    table — sharded generation produces identical rows to a single pass.

    ``dup_every`` plants near-duplicate CONTENT: rows with
    ``gi % dup_every == 1`` (gi >= 1) carry the previous global index's
    pixels with a small deterministic brightness bump on the top-left
    quarter block (measured aHash Hamming distance 0-3 vs the base row —
    under any near-dup threshold >= 3), at the base row's dimensions and
    format. Identity columns (image_id, caption, phash → location) stay
    the row's own, so a planted pair is a content-dup at an unrelated
    location. ``dup_colocate=True`` additionally gives the plant the BASE
    row's phash (→ identical georef location): a "same scene photographed
    twice" pair — spatially coincident AND content-near — for the scene
    near-dup lane. Base pixels/phash are re-derived from gi-1 alone,
    keeping sharded generation row-identical."""
    idx = np.arange(start, start + n, dtype=np.uint64)
    phash = phash_for_index(idx, seed)

    if skew_frac > 0.0:
        phash = _skew_phash(idx, phash, seed, skew_frac)

    ws = np.array(WIDTHS, dtype=np.int32)[idx.astype(np.int64) % 3]
    hs = np.array(HEIGHTS, dtype=np.int32)[idx.astype(np.int64) % 3]
    fmts = [FMTS[(start + i) % 3] for i in range(n)]
    phases = splitmix64(idx ^ np.uint64(seed)).astype(np.int64) & np.int64(2**31 - 1)

    blobs: list[bytes] = []
    captions: list[str] = []
    for i in range(n):
        gi = start + i
        if dup_every and gi % dup_every == 1 and gi >= 1:
            # near-dup plant: previous row's pixels (re-derived from gi-1,
            # no cross-row state) + a small bump → tiny aHash Hamming gap
            bi = gi - 1
            bw = int(WIDTHS[bi % 3])
            bh = int(HEIGHTS[bi % 3])
            bphase = int(
                splitmix64(np.array([bi], dtype=np.uint64) ^ np.uint64(seed))[0]
            ) & (2**31 - 1)
            base = make_pixels(bi, bw, bh, bphase).astype(np.int64)
            base[: max(1, bh // 4), : max(1, bw // 4), :] += 24
            arr = np.clip(base, 0, 255).astype(np.uint8)
            ws[i], hs[i] = bw, bh
            fmts[i] = FMTS[bi % 3]
            if dup_colocate:
                bidx = np.array([bi], dtype=np.uint64)
                bph = phash_for_index(bidx, seed)
                if skew_frac > 0.0:
                    bph = _skew_phash(bidx, bph, seed, skew_frac)
                phash[i] = bph[0]
        else:
            arr = make_pixels(gi, int(ws[i]), int(hs[i]), int(phases[i]))
        data = encode_image(arr, fmts[i])
        if corrupt_every and gi % corrupt_every == 3:
            data = data[: max(8, len(data) // 2)]  # truncated stream
        elif corrupt_every and gi % corrupt_every == 5:
            fmts[i] = FMTS[(gi + 1) % 3]  # fmt mismatching payload
        blobs.append(data)
        captions.append(make_caption(gi, int(phash[i])))

    return pa.table(
        {
            "image_id": pa.array(
                [f"img_{start + i:012d}" for i in range(n)], pa.string()
            ),
            "bytes": pa.array(blobs, pa.binary()),
            "w": pa.array(ws, pa.int32()),
            "h": pa.array(hs, pa.int32()),
            "fmt": pa.array(fmts, pa.string()),
            "caption": pa.array(captions, pa.string()),
            "phash": pa.array(phash, pa.int64()),
        }
    )


_PQ_STATS_COLS = ["image_id", "w", "h", "fmt", "caption", "phash"]
_PQ_KW = dict(compression="zstd", row_group_size=4096, write_statistics=_PQ_STATS_COLS)


def _write_shard(args) -> None:
    path, start, count, seed, kw = args
    pq.write_table(generate_images(count, seed, start=start, **kw), path, **_PQ_KW)


def write_images(path: str, n: int, seed: int = 42, shards: int = 1, **kw) -> None:
    """Write the table; ``shards > 1`` writes a directory of part files,
    generated in parallel worker processes (generation is global-index
    keyed, so sharded output is row-identical to a single pass).

    Sharding matters even locally: N tasks scanning ranges of ONE file
    re-parse its (binary-stats-heavy) footer per split and contend on it —
    measured 3x slower than a many-files layout at local[32]. A 100-TB
    table is millions of files; the bench layout should match. Small row
    groups keep splits real; statistics exclude the bytes column (useless
    min/max over image payloads bloat the footer).
    """
    if shards <= 1:
        pq.write_table(generate_images(n, seed, **kw), path, **_PQ_KW)
        return
    import multiprocessing as mp
    import pathlib
    import shutil

    d = pathlib.Path(path)
    if d.exists():
        shutil.rmtree(d)  # no stale parts from a previous (larger) recipe
    d.mkdir(parents=True, exist_ok=True)
    per = (n + shards - 1) // shards
    jobs = []
    for s in range(shards):
        start = s * per
        count = min(per, n - start)
        if count > 0:
            jobs.append((str(d / f"part-{s:05d}.parquet"), start, count, seed, kw))
    with mp.get_context("fork").Pool(min(16, len(jobs))) as pool:
        pool.map(_write_shard, jobs)
