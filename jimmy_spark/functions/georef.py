"""Deterministic georeferencing: phash:int64 -> fixed-point (lat_e7, lon_e7).

The engine input (BASELINE.json ``input_hint``) carries ``phash`` but no
lat/lon; we derive a synthetic-but-stable georeference by bit-splitting the
64-bit hash into the WGS84/WebMercator box — mirroring the reference's
``reference_id = original_id or title`` fallback discipline
(/root/reference/src/jimmy/intermediate_format.py:199-205): a stable
synthetic key when the natural one is absent.

All math is *integer only* (SURVEY §7.3) so the engine (Spark built-in
column expressions — JVM-side, codegen'd), the NumPy oracle, and the DuckDB
SQL oracle produce bit-identical coordinates:

    u     = phash reinterpreted as uint64
    hi32  = u >> 32            lo32 = u & 0xFFFFFFFF
    lat_e7 = hi32 * 850_511_287 // 2^31 - 850_511_287      # ±85.0511287°
    lon_e7 = lo32 * 1_800_000_000 // 2^31 - 1_800_000_000  # ±180°

Both products stay < 2^63 (4.3e9 * 1.8e9 ≈ 7.7e18 < 9.22e18).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

LAT_MAX_E7 = 850_511_287  # floor(85.05112878 * 1e7) — WebMercator latitude bound
LON_MAX_E7 = 1_800_000_000


def latlon_e7_np(phash: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized NumPy derivation; phash is int64 (reinterpreted unsigned)."""
    u = phash.astype(np.int64).view(np.uint64)
    hi = (u >> np.uint64(32)).astype(np.int64)
    lo = (u & np.uint64(0xFFFFFFFF)).astype(np.int64)
    lat = hi * LAT_MAX_E7 // 2**31 - LAT_MAX_E7
    lon = lo * LON_MAX_E7 // 2**31 - LON_MAX_E7
    return lat, lon


def lat_e7_col(phash: Column) -> Column:
    """Spark built-in expression (no UDF — whole-stage codegen).

    Floor-division by 2^31 of a non-negative long == arithmetic shift right
    by 31 (exact; ``/`` would go through DOUBLE and lose bits above 2^53).
    """
    hi = F.shiftrightunsigned(phash, 32)
    return F.shiftright(hi * F.lit(LAT_MAX_E7), 31) - F.lit(LAT_MAX_E7)


def lon_e7_col(phash: Column) -> Column:
    lo = phash.bitwiseAND(F.lit(0xFFFFFFFF))
    return F.shiftright(lo * F.lit(LON_MAX_E7), 31) - F.lit(LON_MAX_E7)


# DuckDB-SQL fragment factory for the oracle (HUGEINT keeps the unsigned
# reinterpretation exact; // is floor division on non-negative operands).
def duckdb_lat_lon_sql(phash_expr: str = "phash") -> tuple[str, str]:
    u = (
        f"((({phash_expr})::HUGEINT + 18446744073709551616) % 18446744073709551616)"
    )
    lat = (
        f"((({u} // 4294967296) * {LAT_MAX_E7}) // 2147483648 - {LAT_MAX_E7})::BIGINT"
    )
    lon = (
        f"((({u} % 4294967296) * {LON_MAX_E7}) // 2147483648 - {LON_MAX_E7})::BIGINT"
    )
    return lat, lon


def invert_latlon_e7(lat_e7: np.ndarray, lon_e7: np.ndarray) -> np.ndarray:
    """Approximate inverse (for generating skewed/hot-cell fixtures): returns
    an int64 phash whose derived coordinates land within 1 e7-unit of the
    target. Used only by datagen, never by the engine."""
    hi = (lat_e7.astype(np.int64) + LAT_MAX_E7 + 1) * 2**31 // LAT_MAX_E7
    lo = (lon_e7.astype(np.int64) + LON_MAX_E7 + 1) * 2**31 // LON_MAX_E7
    hi = np.clip(hi, 0, 2**32 - 1).astype(np.uint64)
    lo = np.clip(lo, 0, 2**32 - 1).astype(np.uint64)
    return ((hi << np.uint64(32)) | lo).view(np.int64)
