"""Minimal real PNG codec (RGB, 8-bit, filter 0) in NumPy + zlib.

Encoder always emits filter type 0 rows; the decoder implements all five
PNG filter types so foreign filter-0..4 RGB8 images also decode. Format per
the public PNG spec (RFC 2083).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
    return struct.pack(">I", len(payload)) + tag + payload + struct.pack(">I", crc)


def encode(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> PNG bytes (color type 2, bit depth 8, filter 0)."""
    if arr.dtype != np.uint8 or arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h,w,3) uint8, got {arr.dtype} {arr.shape}")
    h, w, _ = arr.shape
    rows = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    rows[:, 1:] = arr.reshape(h, w * 3)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    idat = zlib.compress(rows.tobytes(), 6)
    return _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def decode(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8. Supports RGB8, all filter types."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, w = 8, None
    h = bitdepth = colortype = None
    idat = b""
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated PNG chunk")
        if tag == b"IHDR":
            w, h, bitdepth, colortype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if (bitdepth, colortype, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError("unsupported PNG variant (need RGB8 non-interlaced)")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
        pos += 12 + length
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8)
    stride = 1 + w * 3
    if raw.size != h * stride:
        raise ValueError("bad PNG payload size")
    raw = raw.reshape(h, stride)
    filters = raw[:, 0]
    # Fast path: all-filter-0 images (everything our encoder produces)
    # decode with one vectorized copy instead of a per-row Python loop.
    if not filters.any():
        return raw[:, 1:].reshape(h, w, 3).copy()
    scan = raw[:, 1:].astype(np.int32)
    out = np.zeros((h, w * 3), dtype=np.int32)
    bpp = 3
    for y in range(h):
        f, line = int(filters[y]), scan[y]
        if f == 0:
            out[y] = line
        elif f == 1:  # Sub
            acc = out[y]
            acc[:bpp] = line[:bpp]
            for x in range(bpp, w * 3):
                acc[x] = (line[x] + acc[x - bpp]) & 0xFF
        elif f == 2:  # Up
            out[y] = (line + (out[y - 1] if y else 0)) & 0xFF
        elif f == 3:  # Average
            prev = out[y - 1] if y else np.zeros(w * 3, np.int32)
            acc = out[y]
            for x in range(w * 3):
                left = acc[x - bpp] if x >= bpp else 0
                acc[x] = (line[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            prev = out[y - 1] if y else np.zeros(w * 3, np.int32)
            acc = out[y]
            for x in range(w * 3):
                a = acc[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                acc[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter {f}")
    return out.astype(np.uint8).reshape(h, w, 3)
