"""Multimodal column operators: images are opaque ``binary`` + typed
metadata; decode/feature/resize run as Arrow-batched ``mapInPandas``.

Real here (pure NumPy on our codecs): decode, per-channel stats, histogram
features, nearest-neighbor thumbnailing, aHash perceptual hash. Stubbed
here (no libjpeg/libsndfile/ffmpeg in this container — clearly marked,
the Spark-side plumbing is real and tested): audio decode, video frame
sampling. Swapping a real decoder in changes only the codec registry.
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
    "ahash long, thumb_crc long"
)


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


# --- stubs for modalities with no decoder in this container ---------------


def audio_features(df: DataFrame, bytes_col: str = "bytes") -> DataFrame:
    """STUB: no audio codec library exists in this container. The plumbing
    contract (binary column -> mapInPandas -> feature schema) matches
    image_features; plugging libsndfile/ffmpeg in is a registry change."""
    raise NotImplementedError(
        "audio decode requires an audio codec library not present in this "
        "environment; see image_features for the identical plumbing pattern"
    )


def video_frame_sample(df: DataFrame, bytes_col: str = "bytes", every_n: int = 30) -> DataFrame:
    """STUB: no video demuxer in this container (same contract as above)."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg/pyav not present in this "
        "environment; see image_features for the identical plumbing pattern"
    )
