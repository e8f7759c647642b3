"""QWAV — deterministic fake audio codec standing in for WAV/FLAC.

**STUB NOTICE**: this container ships no audio library (no libsndfile/
ffmpeg), so audio columns carry this deterministic container instead of
real WAV. The Spark-side plumbing (binary column -> Arrow-batched decode ->
typed features) is real and tested; swapping in a real decoder changes
only this module (same pattern as codecs/qjpg.py for JPEG).

Format: b"QWAV" | u32le sample_rate | u32le n_samples | zlib(int16le PCM).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"QWAV"


def encode(samples: np.ndarray, sample_rate: int) -> bytes:
    if samples.dtype != np.int16 or samples.ndim != 1:
        raise ValueError(f"expected 1-D int16, got {samples.dtype} {samples.shape}")
    payload = zlib.compress(samples.astype("<i2").tobytes(), 6)
    return _MAGIC + struct.pack("<II", sample_rate, samples.size) + payload


def decode(data: bytes) -> tuple[np.ndarray, int]:
    """-> (int16 samples, sample_rate)."""
    if data[:4] != _MAGIC:
        raise ValueError("not a QWAV stream")
    try:
        sample_rate, n = struct.unpack_from("<II", data, 4)
        raw = np.frombuffer(zlib.decompress(data[12:]), dtype="<i2")
    except Exception as e:  # zlib/struct errors on corrupt streams
        raise ValueError(f"corrupt QWAV stream: {e}") from e
    if raw.size != n:
        raise ValueError("bad QWAV payload size")
    return raw, sample_rate
