"""Exact distributed quantiles over bounded integer domains — order
statistics without a whole-group sort.

``percentile_approx`` trades exactness for one pass; a window sort per
group is exact but re-creates the single-reducer problem two-stage rank
(operators/ranks.py) exists to kill: with a handful of groups over
100 TB, one task sorts the world. For INTEGER-domain values (everything
in this engine: e7 coordinates, epoch seconds, counts, fixed-point
scores) exactness is cheap without any sort:

1. bucket counts: one map-side-combinable groupBy on
   (group, val div W) — the only full-data shuffle, carrying one row
   per non-empty bucket;
2. locate: a cumulative window over the per-group bucket-count frame
   (<= domain/W rows per group) finds, for each requested q, the bucket
   holding the r-th order statistic (r = ceil(q*n), 1-based) and the
   residual rank within it;
3. resolve: a second scan counts (group, val) occurrences INSIDE the
   target buckets only (semi-join prune), and a cumulative window over
   those <= W distinct values per bucket reads the exact value off.

No task ever holds more than max(domain/W, W) rows of state — O(sqrt
domain) at W = sqrt(domain) — independent of group size and skew: a
group where every row carries the same value puts 10^12 rows in one
bucket, and stage 3 still sees ONE (group, val) row for it. Both scans
prune to (group, val) columns. The rank definition (smallest v with
count(<= v) >= ceil(q*n)) is the discrete lower quantile; the DuckDB
twin states it as an explicit row_number selection, so the oracle does
not depend on any engine's quantile-function convention.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BUCKET_W = 65_536


def q_millis(qs: tuple[float, ...]) -> list[int]:
    """Validate and convert ``qs`` to the integer milli keys the whole
    operator family is defined over. The q domain is a CONTRACT, not a
    convenience: a q that is not an exact multiple of 0.001 (1/3,
    0.1234) would silently compute a DIFFERENT quantile than asked
    after rounding, and two qs rounding to the same milli would emit
    duplicate q_milli rows from the exploded targets frame — so both
    are rejected here instead (ADVICE r6 fix; applies to
    group_quantiles, group_quantiles_from_counts, and the DuckDB
    twin alike)."""
    if not qs or any(not 0 < q <= 1 for q in qs):
        raise ValueError(f"qs must be in (0, 1], got {qs}")
    ms = []
    for q in qs:
        m = round(q * 1000)
        if abs(q * 1000 - m) > 1e-9:
            raise ValueError(
                f"q={q!r} is not a multiple of 0.001 — quantiles are "
                "keyed in exact milli units (q_milli); pass e.g. 0.333 "
                "explicitly if that is the quantile you mean"
            )
        ms.append(int(m))
    if len(set(ms)) != len(ms):
        raise ValueError(f"duplicate q_milli keys in qs={qs}")
    return ms


def group_quantiles(
    df: DataFrame,
    group_cols: list[str],
    val_col: str,
    qs: tuple[float, ...] = (0.5, 0.9),
    bucket_w: int = DEFAULT_BUCKET_W,
) -> DataFrame:
    """(group_cols..., q_milli, value): for each group and each q in
    ``qs``, the exact r-th order statistic of ``val_col`` where
    r = ceil(q * n). ``val_col`` must be integral; q is keyed in the
    output as milli-units (0.5 -> 500) to keep the frame integer-typed.

    NULL values are excluded (order statistics over present values —
    both twins filter identically). Negative values are fine: the
    bucket uses a floor shift so bucket order matches value order.

    Scan accounting (the ordered_rank stance — trees, not DAGs, and no
    cache/persist dependency inside the operator): the counts subtree
    is planned twice (under the stage-3 prune and under the final
    residual-rank join) plus the pruned resolve scan — three
    column-pruned, map-side-combined passes total, a constant factor a
    caller can collapse to two by persisting this function's inputs or
    the returned frame's `targets` lineage if the source scan dominates.
    """
    millis = q_millis(qs)
    # floor-div via offset: Spark's div truncates toward zero, so shift
    # values non-negative first (the distjoin/resample discipline); the
    # 2^40 shift admits |val| < 2^40 — two orders past the e7/epoch
    # domains this engine carries
    shift = 1 << 40
    vals = df.select(*group_cols, F.col(val_col).alias("_v")).where(
        F.col("_v").isNotNull()
    )
    bkt = F.expr(f"(_v + {shift}) div {bucket_w}")

    counts = (
        vals.withColumn("_bkt", bkt)
        .groupBy(*group_cols, "_bkt")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    wg = Window.partitionBy(*group_cols)
    wcum = wg.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    located = counts.withColumn("_tot", F.sum("_n").over(wg)).withColumn(
        "_before", F.coalesce(F.sum("_n").over(wcum), F.lit(0))
    )
    # one row per (group, q) whose target rank falls inside this bucket;
    # residual rank is 1-based within the bucket. All qs ride ONE explode
    # over the tiny located frame — a per-q union would make Catalyst
    # re-plan the counts subtree (trees, not DAGs), re-scanning the
    # source once per quantile. r = ceil(q*n) in PURE INTEGER milli
    # arithmetic: float q*n is a trap (0.9 * 10 = 9.000000000000002 ->
    # ceil 10, off by one).
    qarr = F.array(*[F.lit(m) for m in millis])
    r = F.expr("(q_milli * _tot + 999) div 1000")
    targets = (
        located.withColumn("q_milli", F.explode(qarr))
        .filter((F.col("_before") < r) & (r <= F.col("_before") + F.col("_n")))
        .select(
            *group_cols,
            "_bkt",
            "q_milli",
            (r - F.col("_before")).alias("_lrank"),
        )
    )

    # resolve inside target buckets only: value-level counts are bounded
    # by W distinct values per bucket no matter how many rows sit there
    pruned = vals.withColumn("_bkt", bkt).join(
        targets.select(*group_cols, "_bkt").distinct(),
        [*group_cols, "_bkt"],
    )
    vcounts = pruned.groupBy(*group_cols, "_bkt", "_v").agg(
        F.count(F.lit(1)).alias("_vn")
    )
    wv = Window.partitionBy(*group_cols, "_bkt").orderBy("_v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    vcum = vcounts.withColumn(
        "_vbefore", F.coalesce(F.sum("_vn").over(wv), F.lit(0))
    )
    out = targets.join(vcum, [*group_cols, "_bkt"]).filter(
        (F.col("_vbefore") < F.col("_lrank"))
        & (F.col("_lrank") <= F.col("_vbefore") + F.col("_vn"))
    )
    return out.select(
        *group_cols, "q_milli", F.col("_v").alias(val_col)
    )


def group_quantiles_from_counts(
    hist: DataFrame,
    group_cols: list[str],
    val_col: str,
    n_col: str,
    qs: tuple[float, ...] = (0.5, 0.9),
    bucket_w: int = DEFAULT_BUCKET_W,
) -> DataFrame:
    """``group_quantiles`` over a pre-aggregated value HISTOGRAM
    (group_cols..., val_col, n_col) — the monoid form a streaming state
    or a rollup naturally holds. Rows may repeat a (group, value) pair
    (e.g. unfolded state deltas); counts sum. Same rank definition,
    same output schema, and differential-equal to the raw-row operator
    on the histogram of its input (tests/test_quantiles.py)."""
    millis = q_millis(qs)
    shift = 1 << 40
    vals = hist.select(
        *group_cols, F.col(val_col).alias("_v"), F.col(n_col).alias("_hn")
    ).where(F.col("_v").isNotNull())
    bkt = F.expr(f"(_v + {shift}) div {bucket_w}")
    counts = (
        vals.withColumn("_bkt", bkt)
        .groupBy(*group_cols, "_bkt")
        .agg(F.sum("_hn").alias("_n"))
    )
    wg = Window.partitionBy(*group_cols)
    wcum = wg.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    located = counts.withColumn("_tot", F.sum("_n").over(wg)).withColumn(
        "_before", F.coalesce(F.sum("_n").over(wcum), F.lit(0))
    )
    qarr = F.array(*[F.lit(m) for m in millis])
    r = F.expr("(q_milli * _tot + 999) div 1000")
    targets = (
        located.withColumn("q_milli", F.explode(qarr))
        .filter((F.col("_before") < r) & (r <= F.col("_before") + F.col("_n")))
        .select(
            *group_cols, "_bkt", "q_milli", (r - F.col("_before")).alias("_lrank")
        )
    )
    pruned = vals.withColumn("_bkt", bkt).join(
        targets.select(*group_cols, "_bkt").distinct(), [*group_cols, "_bkt"]
    )
    vcounts = pruned.groupBy(*group_cols, "_bkt", "_v").agg(
        F.sum("_hn").alias("_vn")
    )
    wv = Window.partitionBy(*group_cols, "_bkt").orderBy("_v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    vcum = vcounts.withColumn(
        "_vbefore", F.coalesce(F.sum("_vn").over(wv), F.lit(0))
    )
    out = targets.join(vcum, [*group_cols, "_bkt"]).filter(
        (F.col("_vbefore") < F.col("_lrank"))
        & (F.col("_lrank") <= F.col("_vbefore") + F.col("_vn"))
    )
    return out.select(*group_cols, "q_milli", F.col("_v").alias(val_col))


def duckdb_group_quantiles_sql(
    rel: str, group_cols: list[str], val_col: str,
    qs: tuple[float, ...] = (0.5, 0.9),
) -> str:
    """Independent twin: the same rank definition as an explicit
    row_number selection per group (brute-force sort — an oracle, not an
    execution path)."""
    g = ", ".join(group_cols)
    q_rows = ", ".join(f"({m})" for m in q_millis(qs))
    return f"""
WITH v AS (
  SELECT {g}, {val_col} AS v,
         row_number() OVER (PARTITION BY {g} ORDER BY {val_col}) AS rn,
         count(*) OVER (PARTITION BY {g}) AS n
  FROM {rel} WHERE {val_col} IS NOT NULL
), q(q_milli) AS (VALUES {q_rows})
SELECT {g}, q.q_milli, v.v AS {val_col}
FROM v JOIN q ON v.rn = (q.q_milli * v.n + 999) // 1000
"""
