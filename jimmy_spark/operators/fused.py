"""Fused spatial pipeline stage: ONE narrow map over the images table.

decode -> validate -> georef -> hex r7-9 -> S2 l12/14/16 -> XYZ tiles ->
broadcast R-tree PIP, all inside a single ``mapInPandas`` (one Arrow
crossing, zero shuffle, every kernel NumPy-vectorized over the batch).

This is the 100-TB hot path: the modular operators (decode.py, cells.py,
pip.py, tiling.py) define and verify the semantics — each matched to a
DuckDB oracle — and this stage fuses them so a 10^12-row scan pays one
Python round-trip per batch instead of five chained stages. Shuffles only
happen *after* this map, in the aggregations (salted counts etc.).
tests/test_fused.py asserts fused == composition of the modular operators
row for row.

Output: one row per input image; PIP matches as an array<string> column
(explode downstream when the pair-stream shape is needed).
"""

from __future__ import annotations

import hashlib
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from jimmy_spark.codecs import decode_image
from jimmy_spark.functions import georef, hexgrid, s2, tiles
from jimmy_spark.functions.raycast import inside_ring
from jimmy_spark.functions.rtree import STRtree
from jimmy_spark.operators.pip import _polygons_to_arrays

FUSED_SCHEMA = (
    "image_id string, caption string, ok boolean, error string, "
    "px_checksum long, lat_e7 long, lon_e7 long, "
    "hex_r7 long, hex_r8 long, hex_r9 long, "
    "s2_l12 long, s2_l14 long, s2_l16 long, "
    "tile_z8_x long, tile_z8_y long, tile_z12_x long, tile_z12_y long, "
    "tile_z16_x long, tile_z16_y long, polygon_ids array<string>"
)


def fused_spatial_stage(images: DataFrame, polygons: pd.DataFrame) -> DataFrame:
    ids_arr, ring_x, ring_y, min_x, min_y, max_x, max_y = _polygons_to_arrays(
        polygons
    )
    tree = STRtree(min_x, min_y, max_x, max_y)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Content-addressed decode cache, per task. Web-scale image
        # corpora are duplicate-heavy BY DESIGN (the dedup ladder exists
        # because the same bytes recur millions of times — mirrors,
        # reposts, thumbnails); decode+crc is a pure function of
        # (fmt, bytes), so identical blobs pay it once per task instead
        # of once per row (measured 4.4x blob duplication in the bench
        # corpus -> 6x on the decode loop, the kernel's dominant cost).
        # Only the blob-determined triple (decoded shape, crc, error) is
        # cached — the shape-vs-declared-(w,h) validation stays PER ROW,
        # so two rows sharing bytes but declaring different sizes still
        # get their own verdicts. Keys are (fmt, blake2b-128(bytes)), NOT
        # the bytes themselves: keying on the raw blob would pin up to
        # _CACHE_CAP full images (and their Arrow batch buffers) in
        # executor memory — tens of GB for unique-heavy megapixel tasks.
        # The 16-byte digest keeps each entry ~100 bytes regardless of
        # blob size (128-bit collision odds are negligible at any corpus
        # size), so the cache tops out at a few MB; cleared at the cap.
        cache: dict[tuple, tuple] = {}
        _CACHE_CAP = 65536
        for pdf in batches:
            n = len(pdf)
            ok = np.zeros(n, dtype=bool)
            err = np.full(n, None, dtype=object)
            checksum = np.zeros(n, dtype=np.int64)
            blobs = pdf["bytes"].to_numpy()
            fmts = pdf["fmt"].to_numpy()
            ws = pdf["w"].to_numpy()
            hs = pdf["h"].to_numpy()
            for i in range(n):
                # NULL blob: no digest — key on a sentinel so the decode
                # path raises its usual ValueError and the error row is
                # cached/replayed like any other (per-record isolation:
                # a null must not escape as a task-killing TypeError)
                blob = blobs[i]
                key = (
                    (fmts[i], hashlib.blake2b(blob, digest_size=16).digest())
                    if blob is not None
                    else (fmts[i], None)
                )
                hit = cache.get(key)
                if hit is None:
                    if len(cache) >= _CACHE_CAP:
                        cache.clear()
                    try:
                        arr = decode_image(blob, fmts[i])
                        # crc over the array buffer directly — decoders
                        # return C-contiguous uint8, so this equals
                        # crc32(tobytes()) without the per-image copy
                        hit = (arr.shape[0], arr.shape[1], zlib.crc32(arr), None)
                    except ValueError as e:
                        hit = (0, 0, 0, str(e))
                    cache[key] = hit
                dec_h, dec_w, crc, msg = hit
                if msg is not None:
                    err[i] = msg
                elif dec_w != ws[i] or dec_h != hs[i]:
                    err[i] = (
                        f"decoded size {dec_w}x{dec_h} != "
                        f"declared {ws[i]}x{hs[i]}"
                    )
                else:
                    checksum[i] = crc
                    ok[i] = True

            phash = pdf["phash"].to_numpy(np.int64)
            lat, lon = georef.latlon_e7_np(phash)
            out = {
                "image_id": pdf["image_id"].to_numpy(),
                "caption": pdf["caption"].to_numpy(),
                "ok": ok,
                "error": err,
                "px_checksum": checksum,
                "lat_e7": lat,
                "lon_e7": lon,
            }
            for res in hexgrid.RESOLUTIONS:
                out[f"hex_r{res}"] = hexgrid.encode(lat, lon, res)
            for lvl in (12, 14, 16):
                out[f"s2_l{lvl}"] = s2.encode(lat, lon, lvl)
            for z in tiles.ZOOMS:
                x, y = tiles.xy_np(lat, lon, z)
                out[f"tile_z{z}_x"] = x
                out[f"tile_z{z}_y"] = y

            pi, ri = tree.query_points(lon, lat)
            polys: list[list[str]] = [[] for _ in range(n)]
            for r in np.unique(ri):
                m = ri == r
                sel = pi[m]
                inside = inside_ring(lon[sel], lat[sel], ring_x[r], ring_y[r])
                for p in sel[inside]:
                    polys[p].append(str(ids_arr[r]))
            out["polygon_ids"] = [sorted(p) for p in polys]
            yield pd.DataFrame(out)

    cols = ["image_id", "bytes", "w", "h", "fmt", "caption", "phash"]
    return images.select(*cols).mapInPandas(gen, FUSED_SCHEMA)
