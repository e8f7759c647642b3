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

- ``scene_dedup_keep_best`` — the curation POLICY on top of the scene
  pairs: large-star/small-star components turn the pair stream into
  scene groups, and a map-side-combinable struct-max picks the one shot
  to keep per group by (sharpness desc, clipped-fraction asc, id asc) —
  near-dup image dedup that retains the best exemplar, not an arbitrary
  one.

``duckdb_ahash_sql`` / ``duckdb_scene_sql`` / ``duckdb_keep_best_sql``
are the standalone SQL twins (brute-force second-engine formulations of
the same semantics), used by the pytest differentials.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

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


def scene_dedup_keep_best(
    points: DataFrame,
    d: int,
    threshold: int = 6,
    width: int | None = None,
    id_col: str = "image_id",
    hash_col: str = "ahash",
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
    sharp_col: str = "sharp_e3",
    clip_col: str = "clip_e3",
    num_id: Column | None = None,
    max_iter: int = 100,
) -> DataFrame:
    """(id_col, cluster_id, keep): the keep-best curation policy over
    scene near-dup GROUPS — every input row labeled with its scene
    cluster (min numeric id reachable through the ``scene_dup_pairs``
    graph; singletons label themselves), and ``keep`` true for exactly
    one row per cluster: the best shot by (highest ``sharp_col``, then
    lowest ``clip_col``, then lowest numeric id). Dropping ``NOT keep``
    rows is near-dup image dedup that retains the sharpest, least
    blown-out exemplar of each scene instead of an arbitrary one —
    jimmy's Resource.md5 keep-first dedup (intermediate_format.py:120-128)
    upgraded with a quality objective.

    Scale shape: the pair graph comes from the output-proportional grid
    join (hash carried, codegen'd Hamming gate), grouping from the
    O(log^2 n)-round large-star/small-star CC, and best-shot selection is
    a map-side-combinable struct-max aggregation — the quality key is one
    lexicographic struct, so no per-cluster window sort and no task ever
    holds a cluster's full row set. ``num_id`` maps string ids to a
    unique long exactly as in geocluster.dbscan.
    """
    nid = (num_id if num_id is not None else F.col(id_col).cast("long")).alias(
        "_nid"
    )
    base = points.select(
        F.col(id_col), nid, F.col(lat_col), F.col(lon_col),
        F.col(hash_col), F.col(sharp_col), F.col(clip_col),
    )
    pairs = scene_dup_pairs(
        base, d=d, threshold=threshold, width=width,
        id_col="_nid", hash_col=hash_col, lat_col=lat_col, lon_col=lon_col,
    )
    return keep_best_from_pairs(
        base, pairs.select("a_id", "b_id"),
        id_col=id_col, sharp_col=sharp_col, clip_col=clip_col,
        max_iter=max_iter,
    )


def keep_best_from_pairs(
    base: DataFrame,
    pairs: DataFrame,
    id_col: str = "image_id",
    sharp_col: str = "sharp_e3",
    clip_col: str = "clip_e3",
    max_iter: int = 100,
) -> DataFrame:
    """The grouping + argmax half of ``scene_dedup_keep_best``, over an
    already-materialized pair stream: ``base`` carries (id_col, _nid,
    sharp_col, clip_col), ``pairs`` carries (a_id, b_id) in _nid space.
    Shared by the batch operator and the streaming twin (which feeds the
    ACCUMULATED per-batch pair deltas — their union is exactly the batch
    pair set, so this half sees identical inputs either way)."""
    from jimmy_spark.operators.dedup import connected_components

    cc = connected_components(
        base.select("_nid"), pairs,
        id_col="_nid", a_col="a_id", b_col="b_id", max_iter=max_iter,
    )
    labeled = base.join(cc, "_nid")
    # lexicographic struct max == (sharp DESC, clip ASC, nid ASC) argmax;
    # _nid is unique, so the max struct identifies exactly one row
    qkey = F.struct(
        F.col(sharp_col).alias("s"),
        (-F.col(clip_col)).alias("c"),
        (-F.col("_nid")).alias("n"),
    )
    best = labeled.groupBy("cluster_id").agg(F.max(qkey).alias("_best"))
    return labeled.join(best, "cluster_id").select(
        id_col,
        "cluster_id",
        (qkey == F.col("_best")).alias("keep"),
    )


def duckdb_keep_best_sql(
    points_sql: str,
    d: int,
    threshold: int,
    id_col: str = "image_id",
    hash_col: str = "ahash",
    num_id_sql: str | None = None,
) -> str:
    """Independent DuckDB twin for ``scene_dedup_keep_best``: brute-force
    scene pairs (both gates, HUGEINT squares), recursive-CTE min-label
    components over all points (dedup.duckdb_components_sql's shape), and
    a row_number argmax with the identical (sharp DESC, clip ASC, nid ASC)
    order — a disjoint formulation of the struct-max. Quadratic; an
    oracle for test scale, not an execution path."""
    nid = num_id_sql or f"{id_col}::BIGINT"
    d2 = (
        "(a.lon_e7 - b.lon_e7)::HUGEINT * (a.lon_e7 - b.lon_e7) + "
        "(a.lat_e7 - b.lat_e7)::HUGEINT * (a.lat_e7 - b.lat_e7)"
    )
    ham = f"bit_count(xor(a.{hash_col}, b.{hash_col}))"
    return f"""
WITH RECURSIVE
kbp AS (
  SELECT {nid} AS nid, {id_col} AS pid, lat_e7, lon_e7,
         {hash_col}, sharp_e3, clip_e3
  FROM ({points_sql})
),
pairs AS (
  SELECT a.nid AS x, b.nid AS y FROM kbp a JOIN kbp b
  ON a.nid < b.nid
  AND {d2} <= {int(d)}::HUGEINT * {int(d)}
  AND {ham} <= {int(threshold)}
),
edges AS (SELECT x AS src, y AS dst FROM pairs UNION SELECT y, x FROM pairs),
reach(n, r) AS (
  SELECT nid, nid FROM kbp
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.n
),
comp AS (SELECT n AS nid, min(r) AS cluster_id FROM reach GROUP BY n),
ranked AS (
  SELECT p.pid, c.cluster_id,
         row_number() OVER (
           PARTITION BY c.cluster_id
           ORDER BY p.sharp_e3 DESC, p.clip_e3 ASC, p.nid ASC
         ) AS rk
  FROM kbp p JOIN comp c ON c.nid = p.nid
)
SELECT pid AS {id_col}, cluster_id, (rk = 1) AS keep FROM ranked
"""


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
