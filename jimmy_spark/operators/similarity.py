"""Similarity search over embedding columns (array<float>).

- ``ann_topk_bruteforce`` — exact cosine top-k, the correctness baseline:
  JVM higher-order functions (zip_with + aggregate) compute the dot
  product and norms — no Python in the loop. Ranking key is
  (round(cos, 6) DESC, vec_id) so cross-engine float noise below 1e-6
  cannot reorder results (the DuckDB oracle ranks identically).
- ``ann_topk_lsh`` — the scale path: random-hyperplane bit signatures
  over T tables; candidates = union of same-bucket vectors; exact rerank.
  Approximate by construction; tests measure recall vs brute force.
  Bits/tables trade recall vs candidate volume: for weakly-correlated
  neighbors (cos ~0.4, as in random embeddings) 4 bits x 8 tables gives
  ~0.7 expected recall; high-similarity near-dup hunting (cos > 0.9)
  supports 12-16 bits with far smaller buckets.

Scale notes: brute force is O(Q*N*d) — fine for a broadcast query batch
against a partitioned corpus (each task scores its slice, then a global
top-k merge). LSH buckets turn it into a hash join keyed by signature with
per-bucket rerank; skewed buckets salt like any hot key.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jimmy_spark.datagen.core import splitmix64
from jimmy_spark.session import shuffle_partitions_of


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _cosine(a, b):
    return _dot(a, b) / F.sqrt(_dot(a, a) * _dot(b, b))


def ann_topk_bruteforce(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, rank, vec_id) — exact cosine top-k, self-match excluded."""
    from pyspark.sql import Window

    emb = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    )
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv")
    )
    cand = F.broadcast(q).crossJoin(emb).filter(F.col(id_col) != F.col("query_id"))
    scored = cand.withColumn(
        "cos_r", F.round(_cosine(F.col("qv"), F.col("v")), 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_r"), id_col)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), id_col, "cos_r")
    )


def duckdb_ann_sql(
    query_ids: list[int], k: int = 10, table: str = "embeddings"
) -> str:
    ids = ", ".join(str(i) for i in query_ids)
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM {table}),
q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id IN ({ids})),
s AS (
  SELECT q.query_id, e.vec_id,
         round(list_dot_product(q.qv, e.v) /
               sqrt(list_dot_product(q.qv, q.qv) * list_dot_product(e.v, e.v)),
               6) AS cos_r
  FROM q CROSS JOIN e WHERE e.vec_id != q.query_id
)
SELECT query_id, rank, vec_id, cos_r FROM (
  SELECT query_id, vec_id, cos_r,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_r DESC, vec_id) AS rank
  FROM s
) WHERE rank <= {k}
"""


# --- LSH (approximate, scale path) ---------------------------------------


def _hyperplanes(dim: int, n_bits: int, table: int) -> np.ndarray:
    h = splitmix64(
        np.arange(dim * n_bits, dtype=np.uint64)
        ^ np.uint64(0xA1515 + 7919 * table)
    )
    # map uint64 -> (-1, 1) doubles, deterministic
    return (h.astype(np.float64) / 2**63 - 1.0).reshape(n_bits, dim)


def _bucket_udf(dim: int, n_bits: int, n_tables: int):
    """Arrow-batched UDF mapping a double vector to its per-table LSH
    bucket ids (table index folded into the high bits so tables never
    collide). Sign of the hyperplane projection is scale-invariant:
    collinear vectors land in the same bucket in EVERY table."""
    planes = [_hyperplanes(dim, n_bits, t) for t in range(n_tables)]

    @F.pandas_udf("array<long>")
    def buckets(vec: pd.Series) -> pd.Series:
        m = np.stack(vec.to_numpy())
        sigs = []
        for t, pl in enumerate(planes):
            proj = m @ pl.T  # (n, n_bits)
            bits = (proj > 0).astype(np.int64)
            sig = (bits << np.arange(n_bits, dtype=np.int64)).sum(axis=1)
            sigs.append(sig + (t << np.int64(n_bits + 1)))
        stacked = np.stack(sigs, axis=1)
        return pd.Series(list(stacked))

    return buckets


def _dim_of(embeddings: DataFrame, vec_col: str) -> int:
    return int(embeddings.select(F.size(vec_col).alias("d")).first()["d"])


def ann_topk_lsh(
    embeddings: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_bits: int = 4,
    n_tables: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: multi-table hyperplane LSH bucketing + exact
    cosine rerank of the union of same-bucket candidates."""
    from pyspark.sql import Window

    buckets = _bucket_udf(_dim_of(embeddings, vec_col), n_bits, n_tables)
    emb = embeddings.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("bkt", F.explode(buckets(F.col("v"))))
    q = emb.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), F.col("v").alias("qv"), F.col("bkt")
    )
    cand = (
        F.broadcast(q)
        .join(emb, "bkt")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", "qv", id_col, "v")
        .distinct()
    )
    scored = cand.withColumn("cos_r", F.round(_cosine(F.col("qv"), F.col("v")), 6))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_r"), id_col)
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", F.col("rank").cast("long").alias("rank"), id_col, "cos_r")
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    tau_micro: int = 990_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_bits: int = 8,
    n_tables: int = 8,
) -> DataFrame:
    """Near-dup pairs (a < b) passing ``round(cos, 6) * 1e6 >= tau_micro``
    evaluated in double arithmetic — the EXACT expression the DuckDB
    oracle evaluates, so the boundary behaves identically on both engines
    (note this is the as-implemented contract: for tau values whose
    tau_micro/1e6 is not exactly representable, the double product can
    land on either side of the integer, e.g. 0.99*1e6 < 990000 — fine,
    because both engines agree bit-for-bit). Pairs are generated through
    LSH buckets — the pair space is a hash join on the bucket id, never
    an all-pairs crossJoin — then verified with exact cosine.

    Recall contract: hyperplane signs are scale-invariant, so *collinear*
    duplicates (cos = 1: rescaled / renormalized re-encodes, the dominant
    near-dup class) collide in every table — recall is exactly 1 for them,
    which is what makes the all-pairs SQL oracle hold bit-for-bit on
    dup-planted corpora. For cos = c < 1 pairs, per-table collision is
    p = (1 - acos(c)/pi)^n_bits and recall 1-(1-p)^n_tables: at c=0.99
    with 8 bits x 8 tables, p ~ 0.69 and recall ~ 1 - 0.31^8 ~ 1-8e-5.
    The exact-oracle parity therefore additionally assumes the corpus
    has no NON-collinear pair at cos >= tau (true for the generated
    embeddings, whose non-planted pairs sit far below 0.99) — a datagen
    change that introduces such pairs would surface as a recall gap.

    Scale notes: candidates are ~sum of bucket sizes squared; skewed
    buckets (many near-identical vectors) are real duplicates and belong
    together — downstream connected-components collapses them. Vectors are
    joined back by id onto the candidate pairs, so the wide arrays never
    ride through the candidate join; the only per-row payload there is
    the n_tables-long bucket array that powers exactly-once emission.
    """
    emb = embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    buckets = _bucket_udf(_dim_of(embeddings, vec_col), n_bits, n_tables)
    # EXACTLY-ONCE candidate emission (no ``distinct``), the LSH pattern
    # shared with minhash/simhash (operators/dedup.py): a near-dup pair
    # collides in up to n_tables buckets, so the naive bucket self-join
    # emits it once per table and needs a pair-stream distinct. Each row
    # carries its FULL bucket array (n_tables longs; bucket values are
    # table-coded via the t<<(n_bits+1) offset, so cross-table equality
    # is impossible) and a joined pair survives only at the FIRST table
    # where the two rows share a bucket — element_at with literal
    # ordinals, plain codegen-able comparisons, decided row-locally; the
    # raw pair stream never shuffles. Round-robin repartition keeps AQE
    # from collapsing the tiny O(rows) frame to one partition (every
    # join downstream is broadcast-shaped — one task would emit every
    # candidate serially) and balances giant duplicate clusters, whose
    # pairs all land on table 0. The UDF still runs once: both join
    # sides descend from the SAME repartition exchange (ReusedExchange).
    shuf = shuffle_partitions_of(embeddings.sparkSession)
    ids = (
        emb.select(F.col(id_col).alias("id"), buckets(F.col("v")).alias("bkts"))
        .select("id", "bkts", F.posexplode("bkts").alias("t", "bkt"))
        .repartition(shuf)
    )
    a, b = ids.alias("a"), ids.alias("b")
    earlier_clash = reduce(
        lambda acc, j: acc
        | (
            (F.col("a.t") > j)
            & (
                F.element_at(F.col("a.bkts"), j + 1)
                == F.element_at(F.col("b.bkts"), j + 1)
            )
        ),
        range(n_tables - 1),
        F.lit(False),
    )
    cand = (
        a.join(b, (F.col("a.bkt") == F.col("b.bkt")) & (F.col("a.id") < F.col("b.id")))
        .filter(~earlier_clash)
        .select(F.col("a.id").alias("vec_a"), F.col("b.id").alias("vec_b"))
    )
    va = emb.select(F.col(id_col).alias("vec_a"), F.col("v").alias("va"))
    vb = emb.select(F.col(id_col).alias("vec_b"), F.col("v").alias("vb"))
    scored = (
        cand.join(va, "vec_a")
        .join(vb, "vec_b")
        .withColumn("cos_r", F.round(_cosine(F.col("va"), F.col("vb")), 6))
    )
    return scored.filter(
        F.col("cos_r") * 1_000_000 >= F.lit(tau_micro)
    ).select("vec_a", "vec_b", "cos_r")


def embedding_near_dup_pairs_exact(
    embeddings: DataFrame, tau_micro: int = 990_000, id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs exact baseline (tests only — O(n^2); the bucketed operator
    above is the scale path and must agree with this on planted dups)."""
    emb = embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
    a = emb.select(F.col(id_col).alias("vec_a"), F.col("v").alias("va"))
    b = emb.select(F.col(id_col).alias("vec_b"), F.col("v").alias("vb"))
    pairs = a.crossJoin(b).filter(F.col("vec_a") < F.col("vec_b"))
    scored = pairs.withColumn("cos_r", F.round(_cosine(F.col("va"), F.col("vb")), 6))
    return scored.filter(
        F.col("cos_r") * 1_000_000 >= F.lit(tau_micro)
    ).select("vec_a", "vec_b", "cos_r")


def with_rescaled_dups(
    embeddings: DataFrame, id_offset: int = 1_000_000,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> DataFrame:
    """Corpus augmented with a rescaled copy of every vector (x2 in double
    space — exact in IEEE754): the deterministic stand-in for re-encoded /
    renormalized duplicate embeddings, giving each original one planted
    collinear near-dup at cos exactly 1.0."""
    base = embeddings.select(F.col(id_col), _as_double(F.col(vec_col)).alias(vec_col))
    copies = base.select(
        (F.col(id_col) + F.lit(id_offset)).alias(id_col),
        F.transform(F.col(vec_col), lambda x: x * F.lit(2.0)).alias(vec_col),
    )
    return base.unionByName(copies)
