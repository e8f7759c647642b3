"""Image decode + validate stage (mapInPandas, per-record error isolation).

The Spark analogue of the reference's converter loop with
``@common.catch_all_exceptions`` per-note isolation
(/root/reference/src/jimmy/common.py:66-82): a corrupt record never kills
the job — it flows to the ``ok=false`` side with an ``error`` string, and
all other rows proceed (FIXTURES.md §7).

Output drops ``bytes`` (images are decoded, verified and reduced to pixel
stats in the same pass), so the wide binary column never crosses a shuffle
— at 10^12-row scale this stage is the only reader of ``bytes`` and runs as
a narrow map over the Iceberg/parquet scan with column pruning. Arrow batch
size is capped in session.py so batches of 64x48 BMP rows stay ~20 MB.

Per-row pixel stats are deterministic (crc32 checksum, integer mean*1000)
so downstream comparisons are exact. PSNR-vs-reference validation happens
in tests (tests/test_decode.py) with the pinned codecs.
"""

from __future__ import annotations

import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from jimmy_spark.codecs import decode_image

DECODE_SCHEMA = (
    "image_id string, w int, h int, fmt string, caption string, phash long, "
    "ok boolean, error string, px_checksum long, px_mean_milli long, "
    "dec_w int, dec_h int"
)


def _decode_row(blob, fmt) -> tuple:
    """Blob-determined decode tuple (dec_h, dec_w, crc, mean_milli, err)
    — pure in (fmt, bytes), cacheable per task (the fused-map
    discipline). The shape-vs-declared-(w, h) validation stays PER ROW in
    the batch loop, so two rows sharing bytes but declaring different
    sizes still get their own verdicts."""
    try:
        arr = decode_image(blob, fmt)
        # buffer-protocol crc (decoders return C-contiguous uint8):
        # same value as crc32(tobytes()) minus the copy
        return (
            arr.shape[0], arr.shape[1], zlib.crc32(arr),
            int(arr.astype(np.int64).sum() * 1000 // arr.size), None,
        )
    except ValueError as e:
        return (0, 0, 0, 0, str(e))


def _decode_batch(pdf: pd.DataFrame, cache: dict | None = None) -> pd.DataFrame:
    from jimmy_spark.operators.multimodal import cached_blob_fn

    n = len(pdf)
    ok = np.zeros(n, dtype=bool)
    err = np.full(n, None, dtype=object)
    checksum = np.zeros(n, dtype=np.int64)
    mean_milli = np.zeros(n, dtype=np.int64)
    dec_w = np.zeros(n, dtype=np.int32)
    dec_h = np.zeros(n, dtype=np.int32)
    blobs = pdf["bytes"].to_numpy()
    fmts = pdf["fmt"].to_numpy()
    ws = pdf["w"].to_numpy()
    hs = pdf["h"].to_numpy()
    for i in range(n):
        dh, dw, crc, mean, msg = cached_blob_fn(
            cache, fmts[i], blobs[i], _decode_row
        )
        if msg is not None:
            err[i] = msg
            continue
        dec_w[i], dec_h[i] = dw, dh
        if dw != ws[i] or dh != hs[i]:
            err[i] = f"decoded size {dw}x{dh} != declared {ws[i]}x{hs[i]}"
            continue
        checksum[i] = crc
        mean_milli[i] = mean
        ok[i] = True
    out = pdf[["image_id", "w", "h", "fmt", "caption", "phash"]].copy()
    out["ok"] = ok
    out["error"] = err
    out["px_checksum"] = checksum
    out["px_mean_milli"] = mean_milli
    out["dec_w"] = dec_w
    out["dec_h"] = dec_h
    return out


def decode_stage(images: DataFrame) -> DataFrame:
    """images (input_hint schema) -> decoded/validated stats rows."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            yield _decode_batch(pdf, cache)

    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    return images.select(*cols).mapInPandas(gen, DECODE_SCHEMA)
