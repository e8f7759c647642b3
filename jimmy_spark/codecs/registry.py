"""fmt -> codec dispatch.

The columnar analogue of the reference's per-format converter registry
(/root/reference/src/jimmy/variables.py:10-52 FORMAT_REGISTRY and the
``match format_`` dispatch in converter.py:250-349): one registry keyed by
the per-row ``fmt`` column, probed inside a vectorized decode UDF.
"""

from __future__ import annotations

import numpy as np

from jimmy_spark.codecs import bmp, png, qjpg

_CODECS = {
    "png": (png.encode, png.decode),
    "bmp": (bmp.encode, bmp.decode),
    # Deterministic lossy stand-in for JPEG — see qjpg.py STUB NOTICE.
    "jpeg": (qjpg.encode, qjpg.decode),
}

FORMATS = tuple(_CODECS)
LOSSLESS = frozenset({"png", "bmp"})


def encode_image(arr: np.ndarray, fmt: str) -> bytes:
    try:
        enc, _ = _CODECS[fmt]
    except KeyError:
        raise ValueError(f"unknown image fmt {fmt!r}") from None
    return enc(arr)


_MAGICS = (
    (b"\x89PNG", "png"),
    (b"BM", "bmp"),
    (b"QJPG", "jpeg"),
)


def sniff_format(data: bytes) -> str | None:
    """Magic-byte format detection — the reference's suffix-repair
    fallback (google_keep.py:17-95 re-derives an attachment's real type
    when the export's filename suffix lies). Returns None when no codec's
    signature matches."""
    head = bytes(data[:8])
    for magic, fmt in _MAGICS:
        if head.startswith(magic):
            return fmt
    return None


def decode_image_sniffed(data: bytes, fmt_hint: str | None) -> tuple[np.ndarray, str]:
    """Decode with suffix repair: try the labeled format first, fall back
    to the sniffed one when the label is unknown or its codec rejects the
    bytes. Returns (pixels, actual_fmt)."""
    if fmt_hint in _CODECS:
        try:
            return decode_image(data, fmt_hint), fmt_hint
        except ValueError:
            pass
    sniffed = sniff_format(data)
    if sniffed is None or sniffed == fmt_hint:
        raise ValueError(f"undecodable image (labeled {fmt_hint!r})")
    return decode_image(data, sniffed), sniffed


def decode_image(data: bytes, fmt: str) -> np.ndarray:
    try:
        _, dec = _CODECS[fmt]
    except KeyError:
        raise ValueError(f"unknown image fmt {fmt!r}") from None
    try:
        return dec(bytes(data))
    except ValueError:
        raise
    except Exception as e:  # zlib/struct/index errors on corrupt streams
        raise ValueError(f"corrupt {fmt} stream: {e}") from e
