"""QJPG — deterministic lossy codec standing in for JPEG.

**STUB NOTICE**: this container ships no JPEG library (no Pillow/libjpeg),
so rows with ``fmt='jpeg'`` carry this deterministic quantization codec
instead of real JFIF. It is intentionally *lossy with bounded error*
(6-bit/channel quantization → PSNR ≈ 43 dB) so the PSNR>=40dB lossy-format
verification gate from BASELINE.json ``input_hint`` is exercised for real.
Swapping in a real JPEG codec is a pure codec-registry change
(``registry.py``); none of the Spark plumbing changes.

Format: b"QJPG" | u16le w | u16le h | u8 bits | zlib(quantized h*w*3 bytes).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"QJPG"
_BITS = 6  # 6-bit quantization: max per-channel error 3 → PSNR ≈ 43 dB


def encode(arr: np.ndarray) -> bytes:
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h,w,3) uint8, got {arr.dtype} {arr.shape}")
    h, w, _ = arr.shape
    q = (arr >> (8 - _BITS)).astype(np.uint8)
    payload = zlib.compress(q.tobytes(), 6)
    return _MAGIC + struct.pack("<HHB", w, h, _BITS) + payload


def decode(data: bytes) -> np.ndarray:
    if data[:4] != _MAGIC:
        raise ValueError("not a QJPG stream")
    w, h, bits = struct.unpack_from("<HHB", data, 4)
    if bits != _BITS:
        raise ValueError(f"unsupported QJPG bit depth {bits}")
    q = np.frombuffer(zlib.decompress(data[9:]), dtype=np.uint8)
    if q.size != h * w * 3:
        raise ValueError("bad QJPG payload size")
    q = q.reshape(h, w, 3)
    # Bit-replicate to spread 0..63 across 0..255 (maps 63 -> 255 exactly).
    return ((q << 2) | (q >> 4)).astype(np.uint8)
