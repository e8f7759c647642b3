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
