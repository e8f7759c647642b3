"""Trajectory similarity join: pairs of track segments whose DISCRETE
FRECHET distance is within ``d`` (e7 units), with the pair's exact
squared Frechet and Hausdorff distances carried as int64 metrics.

Completes the moving-object family (segmentation -> stats -> stays ->
OD -> map matching -> contacts/convoys -> SIMILARITY): "which entities
repeatedly traverse the same route within d of each other" is the
classic trajectory-mining join (route clustering, carpool detection,
anomalous-path screening against a reference corpus).

Semantics. For ordered vertex sequences A (n pts) and B (m pts), the
discrete Frechet distance is the minimax coupling cost

    c[i][j] = max(d(i,j), min(c[i-1][j], c[i][j-1], c[i-1][j-1]))

(the "dog leash" walked monotonically over both polylines); the join
emits (a, b) iff c[n-1][m-1] <= d^2. All arithmetic is EXACT int64 on
squared e7 distances — the DP is pure min/max over squared inputs, so
``frechet2``/``haus2`` are deterministic integers: partitioning
invariant, bit-identical to the pure-Python differential twin, and
safe behind a hash gate (same discipline as trajectory.path_len,
operators/trajectory.py).

Scale shape (10^12-ping design):

- CANDIDATES, not all pairs: a coupling pairs first-with-first and
  last-with-last vertices, so frechet2 <= d^2 implies BOTH endpoint
  distances <= d^2. Candidates therefore come from the existing
  output-proportional square-grid distance join on FIRST vertices
  (operators/distjoin.distance_join_grid — exactly-once by
  construction, one shuffled (gx, gy) equality join), with the
  last-last gate applied as a codegen'd filter inside the joined
  stage via carry_cols. Pair count is output-proportional at any
  density; no crossJoin exists.
- The O(n*m) DP runs only on survivors, VECTORIZED ACROSS PAIRS in
  one Arrow batch (numpy int64 lockstep over every pair in the
  partition, padded to the batch max length) — the per-step Python
  cost is O(1) per batch, not per pair. Task state is bounded by
  pairs-per-partition x max track length; cap the DP side with
  trajectory.simplify_tracks (Douglas-Peucker) upstream when tracks
  are long — documented contract, same class as the per-entity
  window bound in segment_tracks.
- Vertex arrays ship through ONE shuffle each (the id-join onto the
  pair stream); they never enter the 9-cell candidate explode.

No reference analogue (marph91/jimmy has no trajectory surface);
engine addition under the BASELINE.json geospatial axes. Verification:
tests/test_trajsim.py — brute-force all-pairs pure-Python DP twin
(set-exact pairs AND bit-exact metrics), planted shifted-route pair,
Hausdorff<=Frechet invariant, exactly-once, partitioning invariance.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from jimmy_spark.operators import distjoin

# uint64 sentinel for padded DP cells: the DP's distance lattice is
# uint64 (see _dp_metrics), where the max real squared distance over the
# FULL engine coordinate domain (|lon_e7| <= 1.8e9, |lat_e7| <=
# 8.51e8 — the georef contract) is (3.6e9)^2 + (1.71e9)^2 ~ 1.59e19 <
# 2^64 - 1, so the all-ones sentinel strictly dominates every real
# distance and no arithmetic ever touches it (min/max only). The r5
# int64 lattice both overflowed dx*dx for full-range longitudes and
# used a 2^62 sentinel smaller than its own worst case — ADVICE fix.
_SENT = np.uint64(2**64 - 1)


def track_arrays(segged: DataFrame) -> DataFrame:
    """Per (entity_id, seg_seq): the seq-ordered vertex arrays plus the
    endpoint coordinates the candidate stage needs. One groupBy; the
    sort is array_sort over (seq, lon, lat) structs — JVM-side, task
    state bounded by track length (the family's documented contract)."""
    pts = F.array_sort(
        F.collect_list(F.struct("seq", "lon_e7", "lat_e7"))
    )
    return (
        segged.groupBy("entity_id", "seg_seq")
        .agg(pts.alias("_pts"))
        .select(
            F.concat_ws("#", "entity_id", "seg_seq").alias("track_id"),
            "entity_id",
            "seg_seq",
            F.transform("_pts", lambda s: s["lon_e7"]).alias("xs"),
            F.transform("_pts", lambda s: s["lat_e7"]).alias("ys"),
            F.element_at("_pts", 1)["lon_e7"].alias("first_lon"),
            F.element_at("_pts", 1)["lat_e7"].alias("first_lat"),
            F.element_at("_pts", -1)["lon_e7"].alias("last_lon"),
            F.element_at("_pts", -1)["lat_e7"].alias("last_lat"),
            F.size("_pts").alias("n_pts"),
        )
    )


def _dp_metrics(axs, ays, bxs, bys) -> tuple[np.ndarray, np.ndarray]:
    """Exact (frechet2, haus2) for a BATCH of pairs, vectorized across
    the batch: the sequential (i, j) DP recurrence runs in lockstep over
    every pair (numpy int64 row ops), padded to the batch max lengths
    with a min/max-neutral sentinel. haus2 is the symmetric Hausdorff
    (max of the two directed minimax terms), computed from the same
    padded distance rows."""
    P = len(axs)
    if P == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    na = np.array([len(a) for a in axs], dtype=np.int64)
    nb = np.array([len(b) for b in bxs], dtype=np.int64)
    n_max, m_max = int(na.max()), int(nb.max())

    def pad(arrs, width):
        out = np.zeros((P, width), dtype=np.int64)
        for p, a in enumerate(arrs):
            out[p, : len(a)] = a
        return out

    ax, ay = pad(axs, n_max), pad(ays, n_max)
    bx, by = pad(bxs, m_max), pad(bys, m_max)
    jb = np.arange(m_max)[None, :]
    pad_b = jb >= nb[:, None]  # (P, m) padded B columns

    # the DP lattice is uint64: coordinate deltas fit int64 (|dx| <=
    # 3.6e9), their squares are computed mod 2^64 after a two's-
    # complement reinterpretation — exact, because the true squares and
    # their sum stay below 2^64 over the full engine coordinate domain.
    # Every cell is a real distance or the all-ones sentinel; min/max
    # identities use 0 / _SENT (distances are non-negative, and every
    # pair has n_pts >= 1 on both sides, so the identities are always
    # overwritten at the first live row).
    frechet = np.zeros(P, dtype=np.uint64)
    haus_ab = np.zeros(P, dtype=np.uint64)  # max_i min_j
    haus_ba = np.zeros(P, dtype=np.uint64)  # max_j min_i (via running min)
    min_over_i = np.full((P, m_max), _SENT, dtype=np.uint64)

    c_prev = np.empty((P, m_max), dtype=np.uint64)
    c_cur = np.empty((P, m_max), dtype=np.uint64)
    for i in range(n_max):
        dx = (ax[:, i : i + 1] - bx).astype(np.uint64)
        dy = (ay[:, i : i + 1] - by).astype(np.uint64)
        d_row = dx * dx + dy * dy  # (P, m) exact uint64 (see above)
        d_row[pad_b] = _SENT
        live = i < na  # pairs whose A still has a row i
        # Hausdorff terms from the same row
        row_min = d_row.min(axis=1)  # min over real j (pad is _SENT)
        haus_ab[live] = np.maximum(haus_ab[live], row_min[live])
        min_over_i[live] = np.minimum(min_over_i[live], d_row[live])
        # Frechet row update
        if i == 0:
            np.maximum.accumulate(d_row, axis=1, out=c_cur)
        else:
            m_shift = np.empty_like(c_prev)
            m_shift[:, 0] = c_prev[:, 0]
            np.minimum(c_prev[:, 1:], c_prev[:, :-1], out=m_shift[:, 1:])
            np.maximum(d_row[:, 0], c_prev[:, 0], out=c_cur[:, 0])
            for j in range(1, m_max):
                np.maximum(
                    d_row[:, j],
                    np.minimum(m_shift[:, j], c_cur[:, j - 1]),
                    out=c_cur[:, j],
                )
        done = i == na - 1  # this pair's last A row: read the answer
        if done.any():
            frechet[done] = c_cur[done, nb[done] - 1]
        # swap row buffers, but freeze finished pairs (their c_prev must
        # not advance past the answer row; masked copy keeps them inert)
        adv = live & ~done
        c_prev[adv] = c_cur[adv]
    min_over_i[pad_b] = 0  # padded columns must not win the max
    haus_ba = min_over_i.max(axis=1)
    haus2 = np.maximum(haus_ab, haus_ba)
    return frechet, haus2


_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("a_track", T.StringType()),
        T.StructField("b_track", T.StringType()),
        T.StructField("frechet2", T.LongType()),
        T.StructField("haus2", T.LongType()),
    ]
)


def frechet_join(
    segged: DataFrame,
    d_e7: int,
    width: int | None = None,
    batch_pairs: int = 2048,
) -> DataFrame:
    """Self-join: (a_track, b_track, frechet2, haus2) for all segment
    pairs with discrete Frechet distance <= ``d_e7``, a_track < b_track,
    exactly once. ``width`` is the candidate grid width (>= d, default
    d); ``batch_pairs`` caps the DP batch so padded (P x m) rows stay
    cache-resident."""
    d = int(d_e7)
    tracks = track_arrays(segged)
    firsts = tracks.select(
        "track_id",
        F.col("first_lat").alias("lat_e7"),
        F.col("first_lon").alias("lon_e7"),
        "last_lat",
        "last_lon",
    )
    cand = distjoin.distance_join_grid(
        firsts,
        d,
        width=width,
        id_col="track_id",
        carry_cols=("last_lat", "last_lon"),
    )
    dlx = (F.col("a_last_lon") - F.col("b_last_lon")).cast("long")
    dly = (F.col("a_last_lat") - F.col("b_last_lat")).cast("long")
    cand = cand.filter(dlx * dlx + dly * dly <= F.lit(d * d)).select(
        "a_id", "b_id"
    )
    arrs = tracks.select("track_id", "xs", "ys")
    joined = (
        cand.join(
            arrs.select(
                F.col("track_id").alias("a_id"),
                F.col("xs").alias("a_xs"),
                F.col("ys").alias("a_ys"),
            ),
            "a_id",
        )
        .join(
            arrs.select(
                F.col("track_id").alias("b_id"),
                F.col("xs").alias("b_xs"),
                F.col("ys").alias("b_ys"),
            ),
            "b_id",
        )
        .select("a_id", "b_id", "a_xs", "a_ys", "b_xs", "b_ys")
    )
    d2 = d * d

    def gen(batches):
        for pdf in batches:
            for lo in range(0, len(pdf), batch_pairs):
                ch = pdf.iloc[lo : lo + batch_pairs]
                fr2, hs2 = _dp_metrics(
                    [np.asarray(v, np.int64) for v in ch["a_xs"]],
                    [np.asarray(v, np.int64) for v in ch["a_ys"]],
                    [np.asarray(v, np.int64) for v in ch["b_xs"]],
                    [np.asarray(v, np.int64) for v in ch["b_ys"]],
                )
                keep = fr2 <= d2
                # surviving metrics fit the declared long: haus2 <=
                # frechet2 <= d^2 (Hausdorff <= Frechet invariant)
                yield pd.DataFrame(
                    {
                        "a_track": ch["a_id"].to_numpy()[keep],
                        "b_track": ch["b_id"].to_numpy()[keep],
                        "frechet2": fr2[keep].astype(np.int64),
                        "haus2": hs2[keep].astype(np.int64),
                    }
                )

    return joined.mapInPandas(gen, _PAIR_SCHEMA)
