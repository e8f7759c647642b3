"""QVID — deterministic fake video container standing in for MP4/WebM.

**STUB NOTICE**: no demuxer/decoder (ffmpeg/pyav) exists in this
container, so video columns carry this deterministic frame container.
The Spark-side plumbing (binary column -> Arrow-batched frame sampling ->
one row per sampled frame) is real and tested; swapping in a real
demuxer changes only this module (same pattern as codecs/qjpg.py).

Format: b"QVID" | u16le w | u16le h | u16le n_frames | u8 fps |
        zlib(frames uint8, shape (n_frames, h, w, 3)).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"QVID"


def encode(frames: np.ndarray, fps: int) -> bytes:
    if frames.dtype != np.uint8 or frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError(
            f"expected (n,h,w,3) uint8, got {frames.dtype} {frames.shape}"
        )
    n, h, w, _ = frames.shape
    payload = zlib.compress(frames.tobytes(), 6)
    return _MAGIC + struct.pack("<HHHB", w, h, n, fps) + payload


def decode(data: bytes) -> tuple[np.ndarray, int]:
    """-> (frames (n,h,w,3) uint8, fps)."""
    if data[:4] != _MAGIC:
        raise ValueError("not a QVID stream")
    try:
        w, h, n, fps = struct.unpack_from("<HHHB", data, 4)
        raw = np.frombuffer(zlib.decompress(data[11:]), dtype=np.uint8)
    except Exception as e:  # zlib/struct errors on corrupt streams
        raise ValueError(f"corrupt QVID stream: {e}") from e
    if raw.size != n * h * w * 3:
        raise ValueError("bad QVID payload size")
    return raw.reshape(n, h, w, 3), fps
