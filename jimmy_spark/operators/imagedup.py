"""Image near-duplicate detection over DECODED content — the geo x image
fusion lanes.

Reference semantics anchor: jimmy dedupes resources by exact content hash
(/root/reference/src/jimmy/intermediate_format.py:120-128 — ``Resource.md5``
equality; /root/reference/src/jimmy/common.py:346-348). The engine
generalizes exact-equality content dedup to NEAR-duplicate pairs under
Hamming distance, so a re-encoded / slightly-retouched copy still pairs
with its original.

The band-LSH Hamming join itself is the shared kernel
``operators/dedup.hamming_pairs`` (pigeonhole recall 1 up to
``nbands - 1``, exactly-once first-uncapped-band emission, codegen'd
``bit_count(xor)`` verify) — already driven over the input table's
precomputed ``phash`` by the ``simhash_pairs`` registry query. This module
adds the two lanes the curation pipeline needs on top of it:

- ``ahash_near_dup`` — CONTENT-first: decode the image bytes, compute the
  64-bit aHash (operators/multimodal.py — the public average-hash
  algorithm), then ``hamming_pairs`` over the COMPUTED hash. Catches
  content duplicates whose stored metadata/phash differ entirely (the
  datagen ``dup_every`` fixture plants exactly that: same pixels, bumped
  brightness block, unrelated identity columns — measured aHash gap 0-3).

- ``scene_dup_pairs`` — SPATIAL-first, for "same scene photographed
  twice": candidates come from the output-proportional square-grid
  distance join (operators/distjoin.distance_join_grid) with the hash
  CARRIED through the grid explode (8 extra bytes per candidate row beats
  two post-hoc id-joins that would re-shuffle the full pair stream), then
  the same bit_count verify inside the join's own codegen stage. Blocking
  by the more selective axis (location) lifts the pigeonhole constraint:
  any threshold 0..64 works, because recall comes from the spatial cover,
  not the band split.

``duckdb_ahash_sql`` is the standalone SQL twin for the banded content
lane (brute-force pair scan + the identical deterministic uncapped-band
emission rule), used by the pytest differentials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from jimmy_spark.operators.dedup import DEFAULT_MAX_BUCKET, hamming_pairs
from jimmy_spark.operators.distjoin import (
    distance_join_grid,
    distance_join_grid_incremental,
)
from jimmy_spark.operators.multimodal import image_features

HASH_BITS = 64


def ahash_near_dup(
    images: DataFrame,
    threshold: int = 6,
    nbands: int | None = 8,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    feats: DataFrame | None = None,
) -> DataFrame:
    """(a, b, hamming) over the aHash of the DECODED image content
    (a < b, Hamming <= threshold). Corrupt rows are dropped by the
    feature stage's per-record error isolation before blocking.

    ``feats`` short-circuits the decode with an already-computed
    ok-filtered ``image_features`` frame (a job that runs several dup
    lanes decodes once and feeds all of them)."""
    if feats is None:
        feats = image_features(images).filter("ok")
    feats = feats.select("image_id", "ahash")
    return hamming_pairs(
        feats,
        max_hamming=threshold,
        id_col="image_id",
        sig_col="ahash",
        max_bucket=max_bucket,
        nbands=nbands,
    )


def scene_dup_pairs(
    points: DataFrame,
    d: int,
    threshold: int = 6,
    width: int | None = None,
    id_col: str = "image_id",
    hash_col: str = "ahash",
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
) -> DataFrame:
    """(a_id, b_id, dist2, hamming): pairs within planar distance ``d``
    (e7 units, inclusive) whose hashes are within ``threshold`` Hamming
    bits — near-duplicate shots of the same place.

    One shuffled (gx, gy) equality join total: the square grid bounds
    candidates at density*d^2 (output-proportional at any hot-spot
    density, exactly-once by construction — distjoin.distance_join_grid),
    and the carried hashes make the Hamming gate a plain filter in the
    joined stage, so the pair stream is never re-shuffled.
    """
    pairs = distance_join_grid(
        points,
        d=d,
        width=width,
        id_col=id_col,
        lat_col=lat_col,
        lon_col=lon_col,
        carry_cols=(hash_col,),
    )
    hamming = F.bit_count(
        F.col(f"a_{hash_col}").bitwiseXOR(F.col(f"b_{hash_col}"))
    )
    return pairs.filter(hamming <= F.lit(int(threshold))).select(
        "a_id", "b_id", "dist2", hamming.alias("hamming")
    )


def scene_dup_pairs_incremental(
    new: DataFrame,
    old: DataFrame,
    d: int,
    threshold: int = 6,
    width: int | None = None,
    id_col: str = "image_id",
    hash_col: str = "ahash",
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
) -> DataFrame:
    """Scene near-dup pairs touching at least one NEW image — exactly the
    delta ``scene_pairs(old ∪ new) - scene_pairs(old)``, each pair once.
    The micro-batch kernel behind ``streaming/spatial.run_scene_dup_stream``:
    per batch, only new x (new ∪ old) candidates are generated (the
    incremental grid join, hashes swap-aligned through the carry), and the
    Hamming gate is the same codegen'd filter as the batch
    ``scene_dup_pairs`` — a subset gate applied per-pair, so the delta
    identity of the underlying join carries over verbatim.
    """
    pairs = distance_join_grid_incremental(
        new,
        old,
        d=d,
        width=width,
        id_col=id_col,
        lat_col=lat_col,
        lon_col=lon_col,
        carry_cols=(hash_col,),
    )
    hamming = F.bit_count(
        F.col(f"a_{hash_col}").bitwiseXOR(F.col(f"b_{hash_col}"))
    )
    return pairs.filter(hamming <= F.lit(int(threshold))).select(
        "a_id", "b_id", "dist2", hamming.alias("hamming")
    )


def duckdb_scene_sql(
    points_sql: str,
    d: int,
    threshold: int,
    id_col: str = "image_id",
    hash_col: str = "ahash",
) -> str:
    """Oracle twin for ``scene_dup_pairs``: brute-force self theta-join
    with BOTH gates. Squares go through HUGEINT (full-span e7 deltas
    overflow int64; DuckDB reorders predicates so a bbox prefilter cannot
    be relied on to run first), matching distjoin.duckdb_dist_sql."""
    dist2 = (
        "(a.lon_e7 - b.lon_e7)::HUGEINT * (a.lon_e7 - b.lon_e7) + "
        "(a.lat_e7 - b.lat_e7)::HUGEINT * (a.lat_e7 - b.lat_e7)"
    )
    ham = f"bit_count(xor(a.{hash_col}, b.{hash_col}))"
    return (
        f"SELECT a.{id_col} AS a_id, b.{id_col} AS b_id, "
        f"({dist2})::BIGINT AS dist2, {ham} AS hamming "
        f"FROM ({points_sql}) a JOIN ({points_sql}) b "
        f"ON a.{id_col} < b.{id_col} "
        f"AND {dist2} <= {int(d)}::HUGEINT * {int(d)} "
        f"AND {ham} <= {int(threshold)}"
    )


def duckdb_ahash_sql(
    threshold: int,
    bands: int = 8,
    max_bucket: int = DEFAULT_MAX_BUCKET,
    table: str = "feats",
    id_col: str = "image_id",
    hash_col: str = "ahash",
) -> str:
    """DuckDB twin for the banded content lane — brute-force pair scan
    with the SAME deterministic emission rule (some band equal in an
    uncapped bucket) and bit_count verify. DuckDB's ``>>`` is arithmetic,
    like Spark's shiftright in hamming_pairs; masking AFTER the shift
    keeps every extracted window identical (sign-fill bits land above the
    mask because shift + width <= 64)."""
    w = HASH_BITS // bands
    mask = (1 << w) - 1
    return f"""
WITH f AS (SELECT {id_col} AS id, {hash_col} AS h FROM {table}),
bandrows AS (
  SELECT f.id, f.h, g.band, ((f.h >> (g.band * {w})) & {mask}) AS bval
  FROM f, (SELECT unnest(range({bands})) AS band) g
),
sizes AS (
  SELECT band, bval, count(*) AS sz FROM bandrows GROUP BY band, bval
),
ok AS (
  SELECT br.id, br.band, br.bval
  FROM bandrows br JOIN sizes s USING (band, bval)
  WHERE s.sz <= {max_bucket}
)
SELECT a.id AS id_a, b.id AS id_b,
       bit_count(xor(a.h, b.h)) AS hamming
FROM f a JOIN f b ON a.id < b.id
WHERE bit_count(xor(a.h, b.h)) <= {threshold}
  AND EXISTS (
    SELECT 1 FROM ok oa JOIN ok ob ON oa.band = ob.band AND oa.bval = ob.bval
    WHERE oa.id = a.id AND ob.id = b.id
  )
ORDER BY id_a, id_b
"""
