"""Pure-NumPy image codecs.

This container has no image libraries (no Pillow/libjpeg/libpng python
bindings), so the engine ships its own codecs:

- ``png``  — real PNG (RGB8, filter 0, zlib) encoder/decoder.
- ``bmp``  — real BMP (BI_RGB 24-bit) encoder/decoder.
- ``jpeg`` — **deterministic lossy stand-in** (``qjpg``): 6-bit channel
  quantization + zlib. This is a clearly-marked stub for a real JPEG codec
  (see ``qjpg.py``); it is lossy-with-bounded-error so the PSNR>=40dB
  verification path (BASELINE.json input_hint) is exercised for real, and
  the Spark-side plumbing (binary column in, decode inside mapInPandas,
  batch shapes, error isolation) is identical to what a libjpeg-backed
  decoder would use.

Mirrors the reference's per-format dispatch (``match format_`` in
/root/reference/src/jimmy/converter.py:250-349) collapsed into a per-row
``fmt`` column driving one registry.
"""

from jimmy_spark.codecs.registry import decode_image, encode_image  # noqa: F401
