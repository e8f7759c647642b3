"""Getis-Ord Gi* hotspot detection over hex cell counts.

The reference's per-notebook statistics (jimmy converter.py stats counters)
have no spatial analogue; this is an r5 engine addition from the geospatial
tier's standard toolbox: given per-cell point counts, score every occupied
cell with the Gi* z-statistic over its radius-1 hex disk (self + 6
neighbors — the "star" in Gi*), flagging statistically hot/cold cells.

Study region = the OCCUPIED cells (cells with >=1 point); binary weights
w_ij = 1 iff cell j lies in disk(i, 1) and is occupied. With x_j the count
in cell j, n the number of occupied cells:

    xbar = (SUM x) / n          s = sqrt((SUM x^2)/n - xbar^2)
    W_i  = #{occupied j in disk(i)}      S_i = SUM_{j in disk(i)} x_j
    Gi*  = (S_i - xbar*W_i) / (s * sqrt((n*W_i - W_i^2)/(n - 1)))

Scale shape: the neighbor sum needs NO join against the point table — each
occupied cell broadcasts its count to the 7 home cells of its disk via a
compile-time packed-delta literal array (same trick as the distance join,
operators/distjoin.py), then one groupBy(home) + one equality join back to
the counts frame. Everything runs on the already-aggregated counts frame
(|cells| << |points|); the global moments are one tiny auxiliary aggregate
broadcast by AQE. No Python stage anywhere.

Float determinism contract: n, SUM x, SUM x^2, W_i, S_i are exact int64;
the z-score is ONE fixed tree of IEEE-754 double ops (div/mul/sub/sqrt are
all correctly rounded) evaluated in the same order by the JVM expression
and the DuckDB twin (``duckdb_gi_sql``), so ``gi_e6 = floor(z * 1e6)`` is
bit-identical across engines — the driver hash gate rides on it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from jimmy_spark.functions import hexgrid

#: packed int64 cell-id deltas of the radius-1 disk (7 cells incl. home);
#: bit layout per functions/hexgrid.py — neighbor = home + (dq<<30) + dr.
DISK1_DELTAS = [int((dq << 30) + dr) for dq, dr in hexgrid.disk_offsets(1)]


def _gi_e6_expr(n: Column, sumx: Column, sumx2: Column, w: Column, s: Column) -> Column:
    """The fixed IEEE double tree; mirrored token-for-token in the SQL twin.

    Degenerate regions are CASE-guarded BEFORE any division (Spark 4 ANSI
    mode errors on /0 even for doubles; CASE WHEN short-circuits per row):
    n < 2 (no variance), s2v <= 0 (uniform counts — mathematically
    variance >= 0, and near-uniform rounding can only land <= 0), or
    w = n (one disk covers the whole region, second sqrt arg 0). Outside
    those, both sqrt args are > 0 and the denominator is > 0.
    """
    nd = n.cast("double")
    xbar = sumx.cast("double") / nd
    s2v = sumx2.cast("double") / nd - xbar * xbar
    sd = F.sqrt(s2v)
    num = s.cast("double") - xbar * w.cast("double")
    den = sd * F.sqrt((n * w - w * w).cast("double") / (n - F.lit(1)).cast("double"))
    ok = (n >= 2) & (s2v > 0) & (n * w - w * w > 0)
    return F.when(ok, F.floor(num / den * F.lit(1000000.0))).otherwise(
        F.lit(None).cast("long")
    )


def _moran_e6_expr(n, sumx, sumx2, a, b, c, d) -> Column:
    """Global Moran's I from exact integer cross-sums; one fixed tree.

    I = (n / W_tot) * sum_i x'_i (s_i - xbar w_i) / sum_i x'^2 with the
    numerator expanded to A - xbar B - xbar C + xbar^2 D so every SUM is
    an order-independent exact int64 and only this final scalar tree runs
    in doubles. Null when n < 2, no neighbor pairs (D = 0), or zero
    variance (den <= 0).
    """
    nd = n.cast("double")
    xbar = sumx.cast("double") / nd
    num = (
        a.cast("double") - xbar * b.cast("double") - xbar * c.cast("double")
        + xbar * xbar * d.cast("double")
    )
    den = sumx2.cast("double") - xbar * sumx.cast("double")
    i_val = nd / d.cast("double") * (num / den)
    ok = (n >= 2) & (d > 0) & (den > 0)
    return F.when(ok, F.floor(i_val * F.lit(1000000.0))).otherwise(
        F.lit(None).cast("long")
    )


def _lisa_e6_expr(n, sumx, sumx2, x, w_ex, s_ex) -> Column:
    """Per-cell local Moran (LISA); one fixed tree on exact int inputs.

    I_i = x'_i * (SUM_j w_ij x'_j) / m2 with x' = x - xbar, binary disk-1
    weights excluding self (SUM_j w_ij x'_j = s_ex - xbar*w_ex), and
    m2 = SUM x'^2 / n the biased variance — the local decomposition whose
    weight-total-scaled sum reproduces the global Moran numerator (the
    tests assert that identity). Null under the same degenerate guards
    as the global index.
    """
    nd = n.cast("double")
    xbar = sumx.cast("double") / nd
    m2 = sumx2.cast("double") / nd - xbar * xbar
    num = (x.cast("double") - xbar) * (s_ex.cast("double") - xbar * w_ex.cast("double"))
    ok = (n >= 2) & (m2 > 0)
    return F.when(ok, F.floor(num / m2 * F.lit(1000000.0))).otherwise(
        F.lit(None).cast("long")
    )


def gi_star(counts: DataFrame, cell_col: str, cnt_col: str = "cnt") -> DataFrame:
    """Widen a (cell, cnt) frame with Gi* columns + global Moran's I.

    Output: input columns + ``nbr_w`` (occupied disk cells, incl. self),
    ``nbr_sum`` (disk count sum) — both exact int64 — ``gi_e6``
    (floor(Gi* * 1e6), null when n < 2 or the denominator is 0), and
    ``moran_e6`` (floor(global Moran's I * 1e6), binary disk-1 weights
    EXCLUDING self, constant across rows — the spatial-autocorrelation
    summary of the whole count surface under the same hash gate).

    int64 bound: the second moment SUM(cnt^2) (and the Moran cross-sum
    SUM(cnt * disk_sum), ~49x larger) must stay under 2^63 — holds while
    the hottest cell stays below ~1e9 points at any surface size (ANSI
    mode turns a violation into an error, never a silent wrap); beyond
    that, lift the moment aggregates to decimal(38,0) to match the
    oracle's HUGEINT sums.
    """
    deltas = F.array(*[F.lit(x) for x in DISK1_DELTAS])
    # generators can't nest inside expressions (same shape as distjoin):
    # explode to a column first, then add the delta
    contrib = counts.select(
        F.col(cell_col).alias("_cell"),
        F.col(cnt_col).alias("_x"),
        F.explode(deltas).alias("_delta"),
    ).select((F.col("_cell") + F.col("_delta")).alias("_home"), "_x")
    nbr = contrib.groupBy("_home").agg(
        F.count("*").alias("nbr_w"), F.sum("_x").alias("nbr_sum")
    )
    glob = counts.agg(
        F.count("*").alias("_n"),
        F.sum(cnt_col).alias("_sumx"),
        F.sum(F.col(cnt_col) * F.col(cnt_col)).alias("_sumx2"),
    )
    joined = counts.join(nbr, F.col(cell_col) == F.col("_home"))
    # Moran cross-sums over the same joined frame (self excluded); the
    # nbr shuffle is shared between both consumers via ReusedExchange
    x = F.col(cnt_col)
    s_ex = F.col("nbr_sum") - x
    w_ex = F.col("nbr_w") - F.lit(1)
    mor = joined.agg(
        F.sum(x * s_ex).alias("_ma"),
        F.sum(x * w_ex).alias("_mb"),
        F.sum(s_ex).alias("_mc"),
        F.sum(w_ex).alias("_md"),
    )
    gi_e6 = _gi_e6_expr(
        F.col("_n"), F.col("_sumx"), F.col("_sumx2"),
        F.col("nbr_w"), F.col("nbr_sum"),
    )
    moran_e6 = _moran_e6_expr(
        F.col("_n"), F.col("_sumx"), F.col("_sumx2"),
        F.col("_ma"), F.col("_mb"), F.col("_mc"), F.col("_md"),
    )
    lisa_e6 = _lisa_e6_expr(
        F.col("_n"), F.col("_sumx"), F.col("_sumx2"),
        x, w_ex, s_ex,
    )
    return (
        joined
        .crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(mor))
        .withColumn("gi_e6", gi_e6)
        .withColumn("moran_e6", moran_e6)
        .withColumn("lisa_e6", lisa_e6)
        .drop("_home", "_n", "_sumx", "_sumx2", "_ma", "_mb", "_mc", "_md")
    )


def duckdb_gi_sql(counts_sql: str, cell_col: str, cnt_col: str = "cnt") -> str:
    """DuckDB twin: same disk deltas, same exact int64 moments, same IEEE
    double tree (div/mul/sub/sqrt all correctly rounded in both engines)."""
    deltas = ", ".join(f"({d})" for d in DISK1_DELTAS)
    return f"""
WITH c AS ({counts_sql}),
contrib AS (
  SELECT c.{cell_col} + d.delta AS home, c.{cnt_col} AS x
  FROM c CROSS JOIN (VALUES {deltas}) d(delta)
),
nbr AS (
  SELECT home, COUNT(*)::BIGINT AS nbr_w, SUM(x)::BIGINT AS nbr_sum
  FROM contrib GROUP BY home
),
g AS (
  SELECT COUNT(*)::BIGINT AS n, SUM({cnt_col})::BIGINT AS sumx,
         SUM({cnt_col} * {cnt_col})::BIGINT AS sumx2
  FROM c
),
mor AS (
  SELECT SUM(c.{cnt_col} * (nbr.nbr_sum - c.{cnt_col}))::BIGINT AS ma,
         SUM(c.{cnt_col} * (nbr.nbr_w - 1))::BIGINT AS mb,
         SUM(nbr.nbr_sum - c.{cnt_col})::BIGINT AS mc,
         SUM(nbr.nbr_w - 1)::BIGINT AS md
  FROM c JOIN nbr ON nbr.home = c.{cell_col}
),
m AS (
  SELECT c.*, nbr.nbr_w, nbr.nbr_sum, g.n AS _n, g.sumx AS _sx, g.sumx2 AS _sx2,
    mor.ma AS _ma, mor.mb AS _mb, mor.mc AS _mc, mor.md AS _md,
    CAST(g.sumx2 AS DOUBLE) / CAST(g.n AS DOUBLE)
      - (CAST(g.sumx AS DOUBLE) / CAST(g.n AS DOUBLE))
        * (CAST(g.sumx AS DOUBLE) / CAST(g.n AS DOUBLE)) AS _s2v,
    CAST(g.sumx2 AS DOUBLE)
      - (CAST(g.sumx AS DOUBLE) / CAST(g.n AS DOUBLE))
        * CAST(g.sumx AS DOUBLE) AS _mden
  FROM c JOIN nbr ON nbr.home = c.{cell_col} CROSS JOIN g CROSS JOIN mor
)
SELECT * EXCLUDE (_n, _sx, _sx2, _s2v, _ma, _mb, _mc, _md, _mden),
  CASE WHEN _n >= 2 AND _s2v > 0 AND _n * nbr_w - nbr_w * nbr_w > 0 THEN
    CAST(floor(
      (CAST(nbr_sum AS DOUBLE)
         - (CAST(_sx AS DOUBLE) / CAST(_n AS DOUBLE)) * CAST(nbr_w AS DOUBLE))
      / (sqrt(_s2v)
         * sqrt(CAST(_n * nbr_w - nbr_w * nbr_w AS DOUBLE)
                / CAST(_n - 1 AS DOUBLE)))
      * 1000000.0) AS BIGINT)
  ELSE NULL END AS gi_e6,
  CASE WHEN _n >= 2 AND _md > 0 AND _mden > 0 THEN
    CAST(floor(
      CAST(_n AS DOUBLE) / CAST(_md AS DOUBLE)
      * ((CAST(_ma AS DOUBLE)
          - (CAST(_sx AS DOUBLE) / CAST(_n AS DOUBLE)) * CAST(_mb AS DOUBLE)
          - (CAST(_sx AS DOUBLE) / CAST(_n AS DOUBLE)) * CAST(_mc AS DOUBLE)
          + (CAST(_sx AS DOUBLE) / CAST(_n AS DOUBLE))
            * (CAST(_sx AS DOUBLE) / CAST(_n AS DOUBLE)) * CAST(_md AS DOUBLE))
         / _mden)
      * 1000000.0) AS BIGINT)
  ELSE NULL END AS moran_e6,
  CASE WHEN _n >= 2 AND _s2v > 0 THEN
    CAST(floor(
      (CAST({cnt_col} AS DOUBLE) - (CAST(_sx AS DOUBLE) / CAST(_n AS DOUBLE)))
      * (CAST(nbr_sum - {cnt_col} AS DOUBLE)
         - (CAST(_sx AS DOUBLE) / CAST(_n AS DOUBLE))
           * CAST(nbr_w - 1 AS DOUBLE))
      / _s2v * 1000000.0) AS BIGINT)
  ELSE NULL END AS lisa_e6
FROM m
"""


def ripleys_k(
    points: DataFrame,
    radii: list[int],
    id_col: str = "image_id",
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
) -> DataFrame:
    """Ripley's K point-pattern statistic at each radius in ``radii``:
    (r, n_pairs, k_hat) with n_pairs the exact unordered pair count at
    distance <= r and

        k_hat = floor( area * 2 * n_pairs / (n * (n - 1)) )

    the uncorrected K estimator in squared e7 units (area = the point
    set's bounding-box extent, the deterministic window choice; edge
    corrections are multiplicative per-pair weights that would slot into
    the same aggregation and are documented out of scope — the
    uncorrected estimator is the cross-engine-comparable baseline).
    Under CSR, k_hat(r) ~ pi*r^2; clustered data sits above it — this is
    the global companion to the per-cell Gi*/LISA scores.

    Scale shape: ONE output-proportional grid distance join at max(radii)
    (operators/distjoin.distance_join_grid — exactly-once, no crossJoin)
    feeds every radius via conditional aggregation (sum(dist2 <= r^2) in
    one pass over the pair stream, map-side combinable); the n/bbox
    moments are one tiny auxiliary aggregate. All counts exact int64;
    the estimator goes through decimal(38,0) (area * 2P overflows int64)
    with a remainder-subtraction floor division, so k_hat is an exact
    integer, bit-identical to the DuckDB HUGEINT twin
    (``duckdb_ripley_sql``) — hash-gate safe.
    """
    from jimmy_spark.operators import distjoin

    rs = sorted(set(int(r) for r in radii))
    if not rs or rs[0] <= 0:
        raise ValueError("radii must be positive")
    rmax = rs[-1]
    pairs = distjoin.distance_join_grid(
        points, rmax, id_col=id_col, lat_col=lat_col, lon_col=lon_col
    )
    counts = pairs.agg(
        *[
            F.sum((F.col("dist2") <= F.lit(r * r)).cast("long")).alias(f"p{i}")
            for i, r in enumerate(rs)
        ]
    )
    stats = points.agg(
        F.count(F.lit(1)).alias("n"),
        (F.max(lat_col) - F.min(lat_col)).alias("spany"),
        (F.max(lon_col) - F.min(lon_col)).alias("spanx"),
    )
    wide = counts.crossJoin(stats)  # 1 x 1 rows: a literal-sized join
    stacked = wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("r"),
                        F.coalesce(F.col(f"p{i}"), F.lit(0)).alias("n_pairs"),
                    )
                    for i, r in enumerate(rs)
                ]
            )
        ).alias("s"),
        "n",
        "spany",
        "spanx",
    ).select("s.r", "s.n_pairs", "n", "spany", "spanx")
    dec = "decimal(38,0)"
    num = (
        F.col("spany").cast(dec)
        * F.col("spanx").cast(dec)
        * F.col("n_pairs").cast(dec)
        * F.lit(2).cast(dec)
    )
    den = (F.col("n").cast(dec) * (F.col("n") - F.lit(1)).cast(dec))
    k_hat = F.when(
        (F.col("n") >= 2) & (F.col("spany") > 0) & (F.col("spanx") > 0),
        ((num - num % den) / den).cast("long"),
    ).otherwise(F.lit(0))
    return stacked.select(
        "r", "n_pairs", k_hat.alias("k_hat")
    ).orderBy("r")


def duckdb_ripley_sql(
    points_sql: str,
    radii: list[int],
    id_col: str = "image_id",
    lat_col: str = "lat_e7",
    lon_col: str = "lon_e7",
) -> str:
    """Brute-force HUGEINT twin of ``ripleys_k`` (blocking-independent:
    full theta-join, no grid)."""
    rs = sorted(set(int(r) for r in radii))
    dist2 = (
        f"(a.{lon_col} - b.{lon_col})::HUGEINT * (a.{lon_col} - b.{lon_col})"
        f" + (a.{lat_col} - b.{lat_col})::HUGEINT * (a.{lat_col} - b.{lat_col})"
    )
    rmax = rs[-1]
    per_r = ", ".join(
        f"sum(CASE WHEN dist2 <= {r}::HUGEINT * {r} THEN 1 ELSE 0 END)"
        f"::BIGINT AS p{i}"
        for i, r in enumerate(rs)
    )
    rows = ", ".join(f"({r}, p{i})" for i, r in enumerate(rs))
    return f"""
WITH pairs AS (
  SELECT {dist2} AS dist2
  FROM ({points_sql}) a JOIN ({points_sql}) b
  ON a.{id_col} < b.{id_col}
     AND {dist2} <= {rmax}::HUGEINT * {rmax}
),
cnt AS (SELECT {per_r} FROM pairs),
st AS (
  SELECT count(*) AS n,
         max({lat_col}) - min({lat_col}) AS spany,
         max({lon_col}) - min({lon_col}) AS spanx
  FROM ({points_sql})
),
stacked AS (
  SELECT r, coalesce(n_pairs, 0) AS n_pairs, n, spany, spanx
  FROM cnt, st, (VALUES {rows}) v(r, n_pairs)
)
SELECT r::BIGINT AS r, n_pairs::BIGINT AS n_pairs,
       CASE WHEN n >= 2 AND spany > 0 AND spanx > 0
            THEN (spany::HUGEINT * spanx * n_pairs * 2
                  // (n::HUGEINT * (n - 1)))::BIGINT
            ELSE 0 END AS k_hat
FROM stacked
ORDER BY r
"""
