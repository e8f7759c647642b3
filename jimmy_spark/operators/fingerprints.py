"""Perceptual image fingerprints beyond aHash: gradient dHash and an
exact-integer DCT pHash, plus their Hamming near-dup lanes.

Why more than one hash: the curation ladder's content lane
(operators/imagedup.ahash_near_dup) keys on the 8x8 average hash, which
thresholds every cell against the global mean — robust to uniform
brightness/contrast changes but brittle against smooth lighting
gradients (one bright corner drags the mean and flips bits across the
whole frame). The two standard complements (public pHash/dHash family,
the same algorithms the reference's exact Resource.md5 dedup generalizes
to — /root/reference/src/jimmy/intermediate_format.py:120-128):

- ``dhash``: 9x8 downsample, bit = left-to-right adjacent INCREASE.
  Order comparisons are exactly invariant under any per-image strictly
  increasing tone remap (brightness shift, contrast stretch, gamma), and
  a smooth gradient only touches the few bits whose adjacent cells it
  reorders — locality aHash lacks.

- ``phash_dct``: 32x32 downsample -> 2D DCT-II -> the 8x8 low-frequency
  block thresholded against its own median. Concentrates energy into
  coarse structure, so high-frequency retouching (noise, small overlays,
  recompression) barely moves it.

NO-IEEE CONTRACT: the whole pipeline is integer. Luma is the 8-bit
integer luma ((299r+587g+114b) div 1000, the operators/multimodal.py
quality-kernel definition); the DCT basis is a FIXED-POINT table
``round(cos((2x+1)u*pi/64) * 2^14)`` whose entries are derived with
``decimal`` software arithmetic (Taylor series for cos(pi/64), then the
Chebyshev recurrence cos(k*t) = 2cos(t)cos((k-1)t) - cos((k-2)t) at 50
digits) — NOT the platform libm, so every executor on a heterogeneous
cluster derives the bit-identical table; both 1D passes are int64
matmuls with headroom proved in ``_phash`` (max |coeff| < 2^47); the
median threshold compares ``2*v`` against the sum of the two middle
order statistics, so no float division ever happens. Results are
therefore bit-identical across hosts, partitionings, and batch sizes —
the contract operators/raster.py idw_raster and multimodal._quality_ints
already carry.

Scale shape: fingerprints ride the same one-Arrow-crossing mapInPandas
as image_features (decode once per image, no shuffle); the near-dup
lanes reuse the band-LSH Hamming kernel (operators/dedup.hamming_pairs
— pigeonhole recall 1 up to nbands-1, exactly-once, codegen'd
bit_count verify), so candidate volume stays linear in matches, never
quadratic in images.
"""

from __future__ import annotations

from collections.abc import Iterator
from decimal import ROUND_HALF_EVEN, Decimal, getcontext

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from jimmy_spark.codecs import decode_image
from jimmy_spark.operators.dedup import DEFAULT_MAX_BUCKET, hamming_pairs

FINGERPRINT_SCHEMA = (
    "image_id string, ok boolean, error string, "
    "ahash long, dhash long, phash_dct long"
)

DCT_Q = 1 << 14  # fixed-point scale of the cosine table


def _cos_table() -> np.ndarray:
    """The 32x32 DCT-II basis ``round(cos((2x+1)*u*pi/64) * 2^14)`` as
    int64, computed in software ``decimal`` arithmetic (no libm): pi to
    50 digits is a fixed literal (public constant), cos(pi/64) comes
    from its Taylor series (theta ~ 0.049, eight terms reach ~1e-22),
    and cos(k*pi/64) for k = 2..64 follows the Chebyshev recurrence.
    Arguments fold into [0, pi] by the period-128 symmetry
    cos((128 - m)*pi/64) = cos(m*pi/64) and sign flip across pi/2
    (cos((64 + m)*pi/64) = -cos((64 - m)*pi/64))."""
    getcontext().prec = 50
    pi = Decimal("3.1415926535897932384626433832795028841971693993751")
    theta = pi / 64
    # Taylor: cos t = sum (-1)^n t^{2n} / (2n)!
    c1, term = Decimal(1), Decimal(1)
    for n in range(1, 12):
        term = term * theta * theta / (2 * n - 1) / (2 * n)
        c1 += term if n % 2 == 0 else -term
    cos_k = [Decimal(1), c1]  # cos(k * pi/64), k = 0..64
    for _ in range(2, 65):
        cos_k.append(2 * c1 * cos_k[-1] - cos_k[-2])
    q = Decimal(DCT_Q)
    tab = np.zeros((32, 32), dtype=np.int64)
    for u in range(32):
        for x in range(32):
            m = ((2 * x + 1) * u) % 128
            if m > 64:
                m = 128 - m
            val = (cos_k[m] * q).to_integral_value(rounding=ROUND_HALF_EVEN)
            tab[u, x] = int(val)
    return tab


_COS = _cos_table()


def _int_luma(arr_u8: np.ndarray) -> np.ndarray:
    """8-bit integer luma, the multimodal._quality_ints definition."""
    a = arr_u8.astype(np.int64)
    return (299 * a[:, :, 0] + 587 * a[:, :, 1] + 114 * a[:, :, 2]) // 1000


def _resize_nn(arr: np.ndarray, w: int, h: int) -> np.ndarray:
    sh, sw = arr.shape[:2]
    ys = (np.arange(h) * sh) // h
    xs = (np.arange(w) * sw) // w
    return arr[ys][:, xs]


_W64 = np.uint64(1) << np.arange(64, dtype=np.uint64)


def _pack64(bits: np.ndarray) -> int:
    """LSB-first 64-bit pack (the multimodal._ahash bit order),
    vectorized: a uint64 dot against the power weights — distinct powers
    of two sum below 2^64, so no wraparound; the int64 reinterpret keeps
    Spark's signed long representation."""
    val = bits.ravel().astype(np.uint64) @ _W64
    return int(np.uint64(val).view(np.int64))


def _dhash(luma: np.ndarray) -> int:
    """9x8 gradient hash: bit (r, c) set iff cell (r, c+1) is STRICTLY
    brighter than cell (r, c) — a pure integer order comparison, exactly
    invariant under any strictly increasing tone remap."""
    t = _resize_nn(luma, 9, 8)
    return _pack64(t[:, 1:] > t[:, :-1])


def _phash(luma: np.ndarray) -> int:
    """32x32 -> 2D DCT-II (two int64 fixed-point 1D passes) -> 8x8
    low-frequency block thresholded against its own median.

    Headroom: |luma| <= 255, so |C @ t| <= 32 * 2^14 * 255 < 2^28 and
    |(C @ t) @ C^T| <= 32 * 2^14 * 2^28 < 2^47 — no int64 overflow.
    The median of the 64 coefficients is (s[31] + s[32]) / 2; the bit
    test ``2*v > s[31] + s[32]`` keeps it integer."""
    t = _resize_nn(luma, 32, 32)
    u_mat = (_COS @ t) @ _COS.T
    low = u_mat[:8, :8].ravel()
    s = np.sort(low)
    med2 = int(s[31]) + int(s[32])
    return _pack64(2 * low > med2)


def _fingerprints_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-row kernel (module-level so twins/goldens can run it locally;
    per-row ops mean batch boundaries cannot change values)."""
    from jimmy_spark.operators.multimodal import _ahash

    n = len(pdf)
    cols = {
        "image_id": pdf["image_id"].to_numpy(),
        "ok": np.zeros(n, dtype=bool),
        "error": np.full(n, None, dtype=object),
        "ahash": np.zeros(n, dtype=np.int64),
        "dhash": np.zeros(n, dtype=np.int64),
        "phash_dct": np.zeros(n, dtype=np.int64),
    }
    blobs = pdf["bytes"].to_numpy()
    fmts = pdf["fmt"].to_numpy()
    for i in range(n):
        try:
            arr = decode_image(blobs[i], fmts[i])
            # aHash stays on the float luma the features kernel uses, so
            # the two frames agree bit-for-bit on the shared column
            lum_f = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
            cols["ahash"][i] = _ahash(lum_f)
            luma = _int_luma(arr.astype(np.uint8))
            cols["dhash"][i] = _dhash(luma)
            cols["phash_dct"][i] = _phash(luma)
            cols["ok"][i] = True
        except ValueError as e:  # noqa: PERF203 — per-record isolation
            cols["error"][i] = str(e)
    return pd.DataFrame(cols)


def image_fingerprints(images: DataFrame) -> DataFrame:
    """decode -> (ahash, dhash, phash_dct) in ONE Arrow crossing, error
    rows isolated (ok=false) like operators/decode.py."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _fingerprints_batch(pdf)

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        gen, FINGERPRINT_SCHEMA
    )


CURATION_SCHEMA = (
    "image_id string, ok boolean, error string, "
    "ahash long, dhash long, phash_dct long, sharp_e3 long, clip_e3 long"
)


def curation_features(images: DataFrame) -> DataFrame:
    """The curation ladder's feature stage in ONE decode: all three
    perceptual hashes plus the exact-integer quality pair
    (multimodal._quality_ints — variance-of-Laplacian sharpness,
    clipped-pixel fraction). jobs/curate_job.py checkpoints this frame,
    so the scene lane's hash choice (--scene-hash) is a column pick, not
    a re-decode; shared columns are bit-identical to image_features /
    image_fingerprints (asserted in tests/test_fingerprints.py)."""
    from jimmy_spark.operators.multimodal import _ahash, _quality_ints

    def _batch(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        cols = {
            "image_id": pdf["image_id"].to_numpy(),
            "ok": np.zeros(n, dtype=bool),
            "error": np.full(n, None, dtype=object),
            "ahash": np.zeros(n, dtype=np.int64),
            "dhash": np.zeros(n, dtype=np.int64),
            "phash_dct": np.zeros(n, dtype=np.int64),
            "sharp_e3": np.zeros(n, dtype=np.int64),
            "clip_e3": np.zeros(n, dtype=np.int64),
        }
        blobs = pdf["bytes"].to_numpy()
        fmts = pdf["fmt"].to_numpy()
        for i in range(n):
            try:
                arr = decode_image(blobs[i], fmts[i])
                lum_f = arr.astype(np.float64) @ np.array([0.299, 0.587, 0.114])
                cols["ahash"][i] = _ahash(lum_f)
                u8 = arr.astype(np.uint8)
                luma = _int_luma(u8)
                cols["dhash"][i] = _dhash(luma)
                cols["phash_dct"][i] = _phash(luma)
                cols["sharp_e3"][i], cols["clip_e3"][i] = _quality_ints(u8)
                cols["ok"][i] = True
            except ValueError as e:  # noqa: PERF203 — per-record isolation
                cols["error"][i] = str(e)
        return pd.DataFrame(cols)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _batch(pdf)

    return images.select("image_id", "bytes", "fmt").mapInPandas(
        gen, CURATION_SCHEMA
    )


def fingerprint_near_dup(
    images: DataFrame,
    kind: str = "dhash",
    threshold: int = 6,
    nbands: int | None = 8,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    prints: DataFrame | None = None,
) -> DataFrame:
    """(a, b, hamming) pairs under the chosen computed fingerprint —
    the ahash_near_dup lane generalized to ``kind`` in
    {'ahash', 'dhash', 'phash_dct'}. ``prints`` short-circuits the
    decode with an already-computed ok-filtered ``image_fingerprints``
    frame (one decode feeds all three lanes)."""
    if kind not in ("ahash", "dhash", "phash_dct"):
        raise ValueError(f"unknown fingerprint kind {kind!r}")
    if prints is None:
        prints = image_fingerprints(images).filter("ok")
    return hamming_pairs(
        prints.select("image_id", kind),
        max_hamming=threshold,
        id_col="image_id",
        sig_col=kind,
        max_bucket=max_bucket,
        nbands=nbands,
    )
