"""KMV (k-minimum-values) distinct-count sketch — the task brief's
"novel sketch" slot, engineered so it can sit behind the EXACT hash gate.

A KMV sketch keeps the k smallest hash values of a set; the classic
estimator |D| ~= (k-1) * H / h_(k) (H = hash-space size, h_(k) = the
k-th smallest hash) is a DETERMINISTIC function of the data given a
deterministic hash — unlike HLL's register layout, there is nothing
engine-specific in it, so DuckDB can recompute the estimate bit-for-bit
and the driver's value-hash comparison holds. Mergeability is the whole
point at 100 TB: the k smallest of a union is computable from the k
smallest of each part, which is exactly what Spark's
TakeOrderedAndProject does — per-partition top-k then a k-row merge;
the full distinct-token set never sorts globally and never reaches one
reducer.

Accuracy is the standard KMV bound (relative error ~ 1/sqrt(k-2));
tests/test_textops.py pins it empirically against the true count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KMV_K = 256
# 60-bit hash space (md5 prefix via the engine's standard cross-engine
# integer-hash lane; 60 bits keeps every value exactly representable in
# the doubles the estimator divides in)
_H_SPACE = float(1 << 60)


def _hash60(c: Column) -> Column:
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def kmv_distinct(values: DataFrame, col: str, k: int = KMV_K) -> DataFrame:
    """One-row (kth_hash, kmv_est) sketch of the distinct values of
    ``values.col``. The ladder: hash -> distinct (map-side combined) ->
    TakeOrderedAndProject(k) -> 1-row aggregate. The estimator divides
    in IEEE doubles with a constant-folded numerator, so the identical
    expression in DuckDB reproduces it exactly."""
    kth = (
        values.select(_hash60(F.col(col)).alias("hv"))
        # NULL values hash to NULL; they must not consume a limit slot.
        # Without this filter the engines disagree on WHICH k rows the
        # limit keeps: Spark's orderBy is NULLS FIRST, DuckDB's ORDER BY
        # defaults to NULLS LAST. Filtered identically in both twins.
        .where(F.col("hv").isNotNull())
        .distinct()
        .orderBy("hv")
        .limit(k)
        .agg(F.max("hv").alias("kth_hash"), F.count("*").alias("n_kept"))
    )
    est = (
        F.when(
            F.col("n_kept") < k, F.col("n_kept").cast("double")
        )  # fewer distincts than k: the sketch IS the exact count
        .otherwise(F.lit((k - 1) * _H_SPACE) / F.col("kth_hash"))
    )
    return kth.select(
        "kth_hash", F.floor(est).cast("long").alias("kmv_est")
    )


def duckdb_kmv_sql(value_sql: str, k: int = KMV_K) -> str:
    """Oracle twin over ``value_sql`` (a SELECT yielding one column
    ``v``). Mirrors the hash lane, the k-row merge and the double
    division exactly."""
    num = f"{float((k - 1)) * _H_SPACE!r}"
    return f"""
WITH hv AS (
  SELECT DISTINCT ('0x' || substring(md5(v), 1, 15))::BIGINT AS hv
  FROM ({value_sql})
  WHERE v IS NOT NULL
),
kk AS (SELECT hv FROM hv ORDER BY hv LIMIT {k}),
s AS (SELECT max(hv) AS kth_hash, count(*) AS n_kept FROM kk)
SELECT kth_hash,
       floor(CASE WHEN n_kept < {k} THEN n_kept::DOUBLE
                  ELSE {num} / kth_hash END)::BIGINT AS kmv_est
FROM s
"""
