"""Multimodal column operators: images are opaque ``binary`` + typed
metadata; decode/feature/resize run as Arrow-batched ``mapInPandas``.

Real here (pure NumPy on our codecs): image decode, per-channel stats,
histogram features, nearest-neighbor thumbnailing, aHash perceptual hash;
audio features and video frame sampling over DETERMINISTIC FAKE codecs
(codecs/qwav.py, qvid.py — no libsndfile/ffmpeg in this container; the
STUB NOTICE lives in the codec modules and swapping a real decoder in
changes only them, the Spark plumbing here is real and tested).
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from jimmy_spark.codecs import decode_image

FEATURE_SCHEMA = (
    "image_id string, ok boolean, error string, "
    "mean_r double, mean_g double, mean_b double, "
    "std_lum double, edge_energy double, "
    "ahash long, thumb_crc long, sharp_e3 long, clip_e3 long"
)


def _quality_ints(arr_u8: np.ndarray) -> tuple[int, int]:
    """Exact-integer image-quality pair (training-data filter features):

    ``sharp_e3``  — 1000x the population variance of the 4-neighbor
                    Laplacian of the 8-bit integer luma ((299r+587g+114b)
                    div 1000), the classic variance-of-Laplacian focus
                    measure; blur drives it toward 0. Interior pixels
                    only; images thinner than 3px score 0.
    ``clip_e3``   — 1000x the fraction of pixels with ANY channel clipped
                    at 0 or 255 (over/under-exposure), floor-divided.

    All arithmetic is int64-bounded NumPy + arbitrary-precision Python for
    the variance numerator, so results are bit-identical across hosts —
    the same no-IEEE contract as operators/raster.py idw_raster.
    """
    a = arr_u8.astype(np.int64)
    luma = (299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]) // 1000
    h, w = luma.shape
    if h >= 3 and w >= 3:
        lap = (
            4 * luma[1:-1, 1:-1]
            - luma[:-2, 1:-1] - luma[2:, 1:-1]
            - luma[1:-1, :-2] - luma[1:-1, 2:]
        )
        m = int(lap.size)
        s1 = int(lap.sum())
        s2 = int((lap * lap).sum())
        sharp = (1000 * (m * s2 - s1 * s1)) // (m * m)
    else:
        sharp = 0
    clipped = int(((a == 0) | (a == 255)).any(axis=2).sum())
    return sharp, (1000 * clipped) // (h * w)


def _ahash(gray: np.ndarray) -> np.int64:
    """8x8 average hash (public aHash algorithm) — the engine's computed
    perceptual hash (the input table's ``phash`` column is the precomputed
    analogue, jimmy's Resource.md5)."""
    t = _resize_nn(gray, 8, 8)
    bits = (t > t.mean()).astype(np.uint64).ravel()
    val = np.uint64(0)
    for i in range(64):
        if bits[i]:
            val |= np.uint64(1) << np.uint64(i)
    return np.int64(val.view(np.int64))


def _resize_nn(arr: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize (deterministic integer index math)."""
    sh, sw = arr.shape[:2]
    ys = (np.arange(h) * sh) // h
    xs = (np.arange(w) * sw) // w
    return arr[ys][:, xs]


def _features_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-row feature kernel (module-level so the golden-oracle generator
    can run it locally on the same rows — all ops are per-row, so batch
    boundaries cannot change results)."""
    n = len(pdf)
    cols = {
        "image_id": pdf["image_id"].to_numpy(),
        "ok": np.zeros(n, dtype=bool),
        "error": np.full(n, None, dtype=object),
        "mean_r": np.zeros(n), "mean_g": np.zeros(n), "mean_b": np.zeros(n),
        "std_lum": np.zeros(n), "edge_energy": np.zeros(n),
        "ahash": np.zeros(n, dtype=np.int64),
        "thumb_crc": np.zeros(n, dtype=np.int64),
        "sharp_e3": np.zeros(n, dtype=np.int64),
        "clip_e3": np.zeros(n, dtype=np.int64),
    }
    blobs = pdf["bytes"].to_numpy()
    fmts = pdf["fmt"].to_numpy()
    for i in range(n):
        try:
            arr = decode_image(blobs[i], fmts[i]).astype(np.float64)
            cols["mean_r"][i] = arr[:, :, 0].mean()
            cols["mean_g"][i] = arr[:, :, 1].mean()
            cols["mean_b"][i] = arr[:, :, 2].mean()
            lum = arr @ np.array([0.299, 0.587, 0.114])
            cols["std_lum"][i] = lum.std()
            gx = np.abs(np.diff(lum, axis=1)).mean() if lum.shape[1] > 1 else 0.0
            gy = np.abs(np.diff(lum, axis=0)).mean() if lum.shape[0] > 1 else 0.0
            cols["edge_energy"][i] = gx + gy
            cols["ahash"][i] = _ahash(lum)
            thumb = _resize_nn(arr.astype(np.uint8), 16, 16)
            cols["thumb_crc"][i] = zlib.crc32(thumb.tobytes())
            sharp, clip = _quality_ints(arr.astype(np.uint8))
            cols["sharp_e3"][i] = sharp
            cols["clip_e3"][i] = clip
            cols["ok"][i] = True
        except ValueError as e:
            cols["error"][i] = str(e)
    return pd.DataFrame(cols)


def image_features(images: DataFrame) -> DataFrame:
    """decode -> per-channel means, luminance std, gradient energy, aHash,
    16x16 thumbnail crc. Error-isolated like operators/decode.py."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _features_batch(pdf)

    return images.select("image_id", "bytes", "fmt").mapInPandas(gen, FEATURE_SCHEMA)


# --- audio / video: real Spark plumbing over deterministic fake codecs ----
# (codecs/qwav.py + qvid.py carry the STUB NOTICE: no libsndfile/ffmpeg in
# this container, so the decode step is a deterministic stand-in; swapping
# a real decoder in changes only the codec module.)

AUDIO_SCHEMA = (
    "media_id string, ok boolean, error string, sample_rate int, "
    "n_samples int, duration_ms long, rms_milli long, peak long, "
    "zero_crossings long"
)


def _audio_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    from jimmy_spark.codecs import qwav

    n = len(pdf)
    cols = {
        "media_id": pdf["media_id"].to_numpy(),
        "ok": np.zeros(n, dtype=bool),
        "error": np.full(n, None, dtype=object),
        "sample_rate": np.zeros(n, dtype=np.int32),
        "n_samples": np.zeros(n, dtype=np.int32),
        "duration_ms": np.zeros(n, dtype=np.int64),
        "rms_milli": np.zeros(n, dtype=np.int64),
        "peak": np.zeros(n, dtype=np.int64),
        "zero_crossings": np.zeros(n, dtype=np.int64),
    }
    blobs = pdf["bytes"].to_numpy()
    for i in range(n):
        try:
            samples, sr = qwav.decode(bytes(blobs[i]))
            x = samples.astype(np.int64)
            cols["sample_rate"][i] = sr
            cols["n_samples"][i] = x.size
            cols["duration_ms"][i] = x.size * 1000 // sr
            # zero-sample streams are legal: all stats degenerate to 0
            # (an unguarded mean() would be NaN and int(NaN) would raise)
            if x.size:
                cols["rms_milli"][i] = int(
                    np.floor(np.sqrt((x * x).mean()) * 1000)
                )
                cols["peak"][i] = int(np.abs(x).max())
                cols["zero_crossings"][i] = int(
                    np.count_nonzero((x[1:] < 0) != (x[:-1] < 0))
                )
            cols["ok"][i] = True
        except Exception as e:  # noqa: BLE001 — zlib/struct errors too
            cols["error"][i] = str(e)
    return pd.DataFrame(cols)


def audio_features(df: DataFrame) -> DataFrame:
    """decode (deterministic fake codec) -> duration / integer-RMS / peak /
    zero-crossing features; error-isolated like image_features."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _audio_batch(pdf)

    return df.select("media_id", "bytes").mapInPandas(gen, AUDIO_SCHEMA)


VIDEO_SCHEMA = (
    "media_id string, ok boolean, error string, frame_idx int, "
    "fps int, mean_milli long, frame_crc long"
)


def _video_batch(pdf: pd.DataFrame, every_n: int) -> pd.DataFrame:
    from jimmy_spark.codecs import qvid

    rows: list[tuple] = []
    for media_id, blob in zip(pdf["media_id"], pdf["bytes"]):
        try:
            frames, fps = qvid.decode(bytes(blob))
            for fi in range(0, frames.shape[0], every_n):
                fr = frames[fi]
                rows.append(
                    (
                        media_id, True, None, fi, fps,
                        int(fr.astype(np.int64).sum() * 1000 // fr.size),
                        int(zlib.crc32(fr)),
                    )
                )
        except Exception as e:  # noqa: BLE001 — per-record isolation
            rows.append((media_id, False, str(e), -1, 0, 0, 0))
    return pd.DataFrame(
        rows,
        columns=[
            "media_id", "ok", "error", "frame_idx", "fps",
            "mean_milli", "frame_crc",
        ],
    )


def video_frame_sample(df: DataFrame, every_n: int = 3) -> DataFrame:
    """decode (deterministic fake container) -> one row per every_n-th
    frame with integer mean + crc; error-isolated per record."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _video_batch(pdf, every_n)

    return df.select("media_id", "bytes").mapInPandas(gen, VIDEO_SCHEMA)
