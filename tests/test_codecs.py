"""Codec round-trip + fidelity gates (BASELINE.json input_hint:
lossless exact, lossy PSNR >= 40 dB)."""

from __future__ import annotations

import numpy as np
import pytest

from jimmy_spark.codecs import decode_image, encode_image
from jimmy_spark.codecs.registry import FORMATS, LOSSLESS


def _img(seed: int, w: int, h: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("fmt", FORMATS)
@pytest.mark.parametrize("wh", [(16, 16), (32, 24), (64, 48), (5, 3), (1, 1)])
def test_roundtrip(fmt, wh):
    w, h = wh
    arr = _img(w * 1000 + h, w, h)
    out = decode_image(encode_image(arr, fmt), fmt)
    assert out.shape == (h, w, 3)
    if fmt in LOSSLESS:
        np.testing.assert_array_equal(out, arr)
    else:
        mse = ((arr.astype(np.float64) - out.astype(np.float64)) ** 2).mean()
        psnr = 10 * np.log10(255.0**2 / mse)
        assert psnr >= 40.0, psnr


def test_truncated_raises():
    arr = _img(7, 16, 16)
    for fmt in FORMATS:
        data = encode_image(arr, fmt)
        with pytest.raises(ValueError):
            decode_image(data[: len(data) // 2], fmt)


def test_wrong_fmt_raises():
    arr = _img(8, 16, 16)
    png = encode_image(arr, "png")
    with pytest.raises(ValueError):
        decode_image(png, "bmp")


def test_unknown_fmt():
    with pytest.raises(ValueError):
        encode_image(_img(9, 4, 4), "tiff")


def test_qwav_roundtrip():
    from jimmy_spark.codecs import qwav

    samples = (np.arange(5000) % 30001 - 15000).astype(np.int16)
    data = qwav.encode(samples, 16000)
    out, sr = qwav.decode(data)
    assert sr == 16000
    np.testing.assert_array_equal(out, samples)
    with pytest.raises(ValueError):
        qwav.decode(data[:10] + b"xx")
    with pytest.raises(ValueError):
        qwav.decode(b"RIFFnot-a-qwav")


def test_qvid_roundtrip():
    from jimmy_spark.codecs import qvid

    frames = (np.arange(6 * 8 * 8 * 3) % 256).astype(np.uint8).reshape(6, 8, 8, 3)
    data = qvid.encode(frames, 24)
    out, fps = qvid.decode(data)
    assert fps == 24
    np.testing.assert_array_equal(out, frames)
    with pytest.raises(ValueError):
        qvid.decode(b"QVIDgarbage")


def test_suffix_repair_sniffing():
    """Mislabeled bytes decode via magic-byte sniffing (google_keep.py's
    suffix-repair fallback); hopeless bytes still raise."""
    from jimmy_spark.codecs import registry

    arr = _img(5, 12, 9)
    for true_fmt in registry.FORMATS:
        data = registry.encode_image(arr, true_fmt)
        assert registry.sniff_format(data) == true_fmt
        for lie in ("gif", None, *(f for f in registry.FORMATS if f != true_fmt)):
            px, actual = registry.decode_image_sniffed(data, lie)
            assert actual == true_fmt
            if true_fmt in registry.LOSSLESS:
                np.testing.assert_array_equal(px, arr)
    with pytest.raises(ValueError, match="undecodable"):
        registry.decode_image_sniffed(b"\x00\x01garbage", "gif")
