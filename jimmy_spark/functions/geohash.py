"""Geohash cell encoding (base32, MSB-first lon/lat bit interleave) as
pure JVM expressions — the fourth cell family next to the hex lattice
(functions/hexgrid.py), S2 (functions/s2.py), and XYZ tiles
(functions/tiles.py). Geohash is the ubiquitous string cell index
(Redis/Elasticsearch/DynamoDB geo layers); a user migrating a geohash
pipeline joins on these columns directly.

Exact integer formulation. For precision ``p`` (p base32 chars = 5p
bits; lon owns ceil, lat floor of them):

    lon_q = (lon_e7 + 1_800_000_000) * 2^nlon div 3_600_000_000
    lat_q = (lat_e7 +   900_000_000) * 2^nlat div 1_800_000_000

(+180 / +90 land exactly on 2^n and are clamped into the last cell,
both engines identically). |coord| <= 1.8e9 and nlon <= 30 keep the
products under 2^62 — exact int64, no doubles anywhere, so the encode
is bit-identical across Spark, DuckDB, and the pure-Python loop-halving
twin. The interleave (lon at even MSB-first positions) and the base32
pick are shift/mask/substr expressions: whole-stage codegen, no Python,
zero shuffle — same class as operators/zorder.morton_col.

The nested-floor identity floor(floor(x*2^a/D)/2^(a-b)) ==
floor(x*2^b/D) makes prefixes exact: the precision-8 geohash of a
point always startswith its precision-6 and precision-4 geohashes, so
coarse cells are substring truncations — no re-encode at scan time.

No reference analogue (marph91/jimmy has no spatial surface); engine
addition under the BASELINE.json geospatial axes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

B32 = "0123456789bcdefghjkmnpqrstuvwxyz"

_LON_SPAN = 3_600_000_000
_LAT_SPAN = 1_800_000_000
_LON_OFF = 1_800_000_000
_LAT_OFF = 900_000_000
MAX_PRECISION = 12  # 60 bits; nlon=30 keeps the quantization in int64


def _nbits(precision: int) -> tuple[int, int]:
    bits = 5 * precision
    return (bits + 1) // 2, bits // 2  # (nlon, nlat) — lon leads


def _quant(col: Column, off: int, span: int, n: int) -> Column:
    # exact non-negative floor division without F.expr (works on any
    # Column expression): a - a%span is exactly divisible, the double
    # quotient is <= 2^31 < 2^53 and integral, so IEEE '/' is exact
    a = (col + F.lit(off)) * F.lit(1 << n)
    q = ((a - a % F.lit(span)) / F.lit(span)).cast("long")
    return F.least(q, F.lit((1 << n) - 1))


def geohash_col(lat: Column, lon: Column, precision: int) -> Column:
    """Geohash string of (lat_e7, lon_e7) at ``precision`` chars, as one
    codegen'd JVM expression (interleave + base32 pick)."""
    if not 1 <= precision <= MAX_PRECISION:
        raise ValueError(f"precision must be in 1..{MAX_PRECISION}")
    nlon, nlat = _nbits(precision)
    bits = 5 * precision
    lon_q = _quant(lon, _LON_OFF, _LON_SPAN, nlon)
    lat_q = _quant(lat, _LAT_OFF, _LAT_SPAN, nlat)
    val = F.lit(0).cast("long")
    for m in range(bits):  # m = MSB-first output position
        src, n_src = (lon_q, nlon) if m % 2 == 0 else (lat_q, nlat)
        src_bit = n_src - 1 - m // 2  # MSB-first within the source
        val = val.bitwiseOR(
            F.shiftleft(
                F.shiftright(src, src_bit).bitwiseAND(F.lit(1)),
                bits - 1 - m,
            )
        )
    chars = [
        F.substring(
            F.lit(B32),
            F.shiftright(val, 5 * (precision - 1 - k))
            .bitwiseAND(F.lit(31))
            .cast("int")
            + F.lit(1),
            F.lit(1),
        )
        for k in range(precision)
    ]
    return F.concat(*chars)


def geohash_decode_cols(
    gh: Column, precision: int
) -> tuple[Column, Column, Column, Column]:
    """Inverse: (lat_lo, lat_hi, lon_lo, lon_hi) e7 cell bounds of a
    precision-``precision`` geohash string, as codegen'd JVM expressions
    (base32 lookup via array_position on a literal array, de-interleave
    as a shift/mask OR chain, exact-integer bound arithmetic). Bounds
    are floors of the exact rational cell endpoints: lo = floor(q * span
    / 2^n) - off, hi the same at q+1. Every integer point of the cell
    satisfies lo <= x <= hi (x == hi only when the upper endpoint is
    fractional); hi + 1 always lies in the adjacent cell, whose lo
    equals this hi; and lo + 1 is always strictly interior (floor(lower)
    + 1 >= lower, and < upper whenever the cell extent exceeds 1 unit —
    true at every precision <= 12), so (lat_lo + 1, lon_lo + 1)
    re-encodes to the same cell. The integer midpoint (lo + hi) / 2 is
    NOT always interior: at precision 12 the lat extent is ~1.68 units,
    so hi can be lo + 1 with midpoint lo below the exact lower endpoint.
    No IEEE anywhere: q * span <= 2^30 * 3.6e9 < 2^62 stays exact
    int64.

    Expression-size note: Column trees inline on every use (Catalyst has
    no plan-level CSE across a projection), so each bound duplicates the
    ~6-node-per-bit de-interleave chain once — flat and cheap on its
    own. Do NOT compose these bounds straight into ``geohash_col`` in
    one plan (the encode re-duplicates its input per interleaved bit,
    multiplying the trees into the 10^5-node range where the optimizer
    crawls); materialize in between, as any real pipeline would."""
    if not 1 <= precision <= MAX_PRECISION:
        raise ValueError(f"precision must be in 1..{MAX_PRECISION}")
    nlon, nlat = _nbits(precision)
    lon_q = F.lit(0).cast("long")
    lat_q = F.lit(0).cast("long")
    for k in range(precision):
        # per-char 5-bit code; instr on the literal alphabet keeps the
        # duplicated-per-bit subtree ~6 nodes (vs a 33-node array lookup)
        code = (
            F.instr(F.lit(B32), F.substring(gh, k + 1, 1)) - F.lit(1)
        ).cast("long")
        for j in range(5):  # j = MSB-first bit within the char
            m = 5 * k + j  # global MSB-first interleave position
            bit = F.shiftright(code, 4 - j).bitwiseAND(F.lit(1))
            if m % 2 == 0:
                lon_q = lon_q.bitwiseOR(F.shiftleft(bit, nlon - 1 - m // 2))
            else:
                lat_q = lat_q.bitwiseOR(F.shiftleft(bit, nlat - 1 - m // 2))

    def bound(q: Column, span: int, off: int, n: int) -> Column:
        # floor(q * span / 2^n) - off, exact: q*span < 2^62, and the
        # shiftright IS the floor division by a power of two (q >= 0)
        return F.shiftright(q * F.lit(span), n) - F.lit(off)

    return (
        bound(lat_q, _LAT_SPAN, _LAT_OFF, nlat),
        bound(lat_q + F.lit(1), _LAT_SPAN, _LAT_OFF, nlat),
        bound(lon_q, _LON_SPAN, _LON_OFF, nlon),
        bound(lon_q + F.lit(1), _LON_SPAN, _LON_OFF, nlon),
    )


def duckdb_geohash_sql(lat_sql: str, lon_sql: str, precision: int) -> str:
    """The same encode as a DuckDB SQL expression (bit-identical twin)."""
    nlon, nlat = _nbits(precision)
    bits = 5 * precision
    lon_q = (
        f"least((({lon_sql}) + {_LON_OFF}) * {1 << nlon} // {_LON_SPAN}, "
        f"{(1 << nlon) - 1})"
    )
    lat_q = (
        f"least((({lat_sql}) + {_LAT_OFF}) * {1 << nlat} // {_LAT_SPAN}, "
        f"{(1 << nlat) - 1})"
    )
    terms = []
    for m in range(bits):
        src, n_src = (lon_q, nlon) if m % 2 == 0 else (lat_q, nlat)
        src_bit = n_src - 1 - m // 2
        terms.append(f"((({src}) >> {src_bit}) & 1) << {bits - 1 - m}")
    val = " | ".join(f"({t})" for t in terms)
    chars = [
        f"substr('{B32}', (((({val}) >> {5 * (precision - 1 - k)}) & 31) "
        f"+ 1)::INT, 1)"
        for k in range(precision)
    ]
    return " || ".join(chars)
