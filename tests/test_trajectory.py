"""Trajectory family (operators/trajectory.py): gap/jump segmentation,
per-segment stats, stay-point detection, OD matrix.

Three layers: planted-structure recovery on the deterministic tracks
table (datagen/tracks.py plants jumps, time gaps, and stays the operators
must find), DuckDB-twin parity (the same checks the driver gate runs via
``session_windows``, here directly on each operator), and the
partitioning-invariance argument behind the integer path length.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from jimmy_spark.operators import trajectory as tj


@pytest.fixture(scope="module")
def tracks_path():
    from jimmy_spark.datagen import ensure_tracks

    return f"{ensure_tracks('t2')}/tracks.parquet"


@pytest.fixture(scope="module")
def segged(spark, tracks_path):
    df = tj.segment_tracks(spark.read.parquet(tracks_path))
    df.cache().count()
    yield df
    df.unpersist()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="stable").reset_index(drop=True)


class TestPlantedStructure:
    def test_every_entity_has_multiple_segments(self, segged):
        # datagen plants >=1 jump and >=1 time gap per entity, so every
        # entity splits into >=2 segments (start break + at least one more)
        per_ent = segged.groupBy("entity_id").agg(
            F.max("seg_seq").alias("n_segs")
        )
        assert per_ent.filter("n_segs < 2").count() == 0

    def test_segment_starts_have_zero_step(self, segged):
        firsts = (
            segged.withColumn(
                "rn",
                F.row_number().over(
                    Window.partitionBy("entity_id", "seg_seq").orderBy("seq")
                ),
            )
            .filter("rn = 1")
        )
        assert firsts.filter("step_len != 0").count() == 0

    def test_most_entities_have_a_stay(self, segged):
        # 2 planted stays per entity; a stay dies only when a planted jump
        # or gap lands inside its run, so demand stays in >=90% of entities
        n_ent = segged.select("entity_id").distinct().count()
        with_stay = (
            tj.stay_points(segged).select("entity_id").distinct().count()
        )
        assert with_stay >= 0.9 * n_ent

    def test_stay_centroid_is_inside_jitter_box(self, spark, tracks_path, segged):
        # every detected stay's centroid must sit within the stay's own
        # ping bounding box (exact integer mean of member coordinates)
        stays = tj.stay_points(segged)
        tr = spark.read.parquet(tracks_path)
        j = stays.alias("s").join(
            tr.alias("t"),
            (F.col("s.entity_id") == F.col("t.entity_id"))
            & (F.col("t.ts") >= F.col("s.t_start"))
            & (F.col("t.ts") <= F.col("s.t_end")),
        )
        box = j.groupBy("s.entity_id", "s.stay_seq", "s.c_lat", "s.c_lon").agg(
            F.min("t.lat_e7").alias("lo_lat"),
            F.max("t.lat_e7").alias("hi_lat"),
            F.min("t.lon_e7").alias("lo_lon"),
            F.max("t.lon_e7").alias("hi_lon"),
        )
        bad = box.filter(
            (F.col("c_lat") < F.col("lo_lat"))
            | (F.col("c_lat") > F.col("hi_lat"))
            | (F.col("c_lon") < F.col("lo_lon"))
            | (F.col("c_lon") > F.col("hi_lon"))
        )
        assert bad.count() == 0


class TestDuckdbParity:
    def test_segment_stats(self, spark, tracks_path, segged):
        got = tj.segment_stats(segged).toPandas()
        exp = duckdb.sql(
            tj.duckdb_segment_stats_sql(f"'{tracks_path}'")
        ).df()
        pd.testing.assert_frame_equal(
            _norm(got), _norm(exp), check_dtype=False, check_exact=True
        )

    def test_stay_points(self, spark, tracks_path, segged):
        got = tj.stay_points(segged).toPandas()
        exp = duckdb.sql(tj.duckdb_stay_points_sql(f"'{tracks_path}'")).df()
        pd.testing.assert_frame_equal(
            _norm(got), _norm(exp), check_dtype=False, check_exact=True
        )


class TestScaleInvariance:
    def test_path_len_partitioning_invariant(self, spark, tracks_path):
        # the integer path length must not depend on input partitioning —
        # the property that lets the driver hash-gate it (a double sum
        # would be reorder-sensitive)
        tr = spark.read.parquet(tracks_path)
        a = (
            tj.segment_stats(tj.segment_tracks(tr.repartition(1)))
            .toPandas()
        )
        b = (
            tj.segment_stats(tj.segment_tracks(tr.repartition(17, "seq")))
            .toPandas()
        )
        pd.testing.assert_frame_equal(
            _norm(a), _norm(b), check_dtype=False, check_exact=True
        )

    def test_od_matrix_conserves_trips(self, segged):
        stats = tj.segment_stats(segged).cache()
        try:
            od = tj.od_matrix(stats)
            total = od.agg(F.sum("n_trips")).first()[0]
            assert total == stats.count()
        finally:
            stats.unpersist()


def _dp_oracle(pts: list[tuple[int, int]], eps: int) -> list[bool]:
    """Independent recursive Douglas-Peucker over exact Fraction
    point-to-segment distances (the operator is an explicit stack over
    cross-multiplied integer rationals — disjoint formulations)."""
    from fractions import Fraction

    n = len(pts)
    keep = [False] * n
    keep[0] = keep[-1] = True

    def d2(p, a, b) -> Fraction:
        (px, py), (ax, ay), (bx, by) = p, a, b
        dx, dy = bx - ax, by - ay
        l2 = dx * dx + dy * dy
        ux, uy = px - ax, py - ay
        if l2 == 0 or ux * dx + uy * dy <= 0:
            return Fraction(ux * ux + uy * uy)
        if ux * dx + uy * dy >= l2:
            return Fraction((px - bx) ** 2 + (py - by) ** 2)
        return Fraction((ux * dy - uy * dx) ** 2, l2)

    def rec(a: int, b: int) -> None:
        if b - a < 2:
            return
        best, bi = Fraction(-1), -1
        for i in range(a + 1, b):
            s = d2(pts[i], pts[a], pts[b])
            if s > best:
                best, bi = s, i
        if best > eps * eps:
            keep[bi] = True
            rec(a, bi)
            rec(bi, b)

    rec(0, n - 1)
    return keep


def _point_seg_within(px, py, ax, ay, bx, by, eps) -> bool:
    """Exact-int: is P within eps of segment AB? Projection parameter via
    dot products, perpendicular via cross — all arbitrary-precision."""
    dx, dy = bx - ax, by - ay
    l2 = dx * dx + dy * dy
    ux, uy = px - ax, py - ay
    if l2 == 0:
        return ux * ux + uy * uy <= eps * eps
    t = ux * dx + uy * dy
    if t <= 0:
        return ux * ux + uy * uy <= eps * eps
    if t >= l2:
        vx, vy = px - bx, py - by
        return vx * vx + vy * vy <= eps * eps
    cr = ux * dy - uy * dx
    return cr * cr <= eps * eps * l2


class TestSimplify:
    EPS = 20_000

    def test_matches_recursive_oracle(self, segged):
        got = (
            tj.simplify_tracks(segged, self.EPS)
            .select("entity_id", "seg_seq", "seq")
            .toPandas()
        )
        raw = (
            segged.select("entity_id", "seg_seq", "seq", "lat_e7", "lon_e7")
            .toPandas()
            .sort_values(["entity_id", "seg_seq", "seq"])
        )
        kept = set()
        for (e, s), grp in raw.groupby(["entity_id", "seg_seq"]):
            pts = list(zip(grp["lat_e7"].astype(int), grp["lon_e7"].astype(int)))
            flags = _dp_oracle(pts, self.EPS)
            kept.update(
                (e, s, q) for q, f in zip(grp["seq"], flags) if f
            )
        assert set(map(tuple, got.itertuples(index=False))) == kept

    def test_every_dropped_point_within_eps(self, segged):
        # the DP guarantee, checked with exact integer arithmetic: each
        # original ping is within eps of SOME retained chord of its segment
        simp = (
            tj.simplify_tracks(segged, self.EPS)
            .toPandas()
            .sort_values(["entity_id", "seg_seq", "seq"])
        )
        raw = (
            segged.select("entity_id", "seg_seq", "seq", "lat_e7", "lon_e7")
            .toPandas()
            .sort_values(["entity_id", "seg_seq", "seq"])
        )
        simp_g = {
            k: list(zip(g["lat_e7"].astype(int), g["lon_e7"].astype(int)))
            for k, g in simp.groupby(["entity_id", "seg_seq"])
        }
        checked = 0
        for k, grp in raw.groupby(["entity_id", "seg_seq"]):
            chain = simp_g[k]
            for px, py in zip(grp["lat_e7"].astype(int), grp["lon_e7"].astype(int)):
                ok = any(
                    _point_seg_within(px, py, *chain[i], *chain[i + 1], self.EPS)
                    for i in range(len(chain) - 1)
                ) or (len(chain) == 1 and (px, py) == chain[0])
                assert ok, (k, px, py)
                checked += 1
        assert checked > 0

    def test_compresses_and_is_partitioning_invariant(self, spark, tracks_path):
        tr = spark.read.parquet(tracks_path)
        a = (
            tj.simplify_tracks(tj.segment_tracks(tr.repartition(1)), self.EPS)
            .toPandas()
        )
        b = (
            tj.simplify_tracks(
                tj.segment_tracks(tr.repartition(13, "seq")), self.EPS
            ).toPandas()
        )
        cols = sorted(a.columns)
        pd.testing.assert_frame_equal(
            _norm(a), _norm(b), check_dtype=False, check_exact=True
        )
        # planted stays (2k jitter) + 40k walk steps at eps 20k: real
        # compression must happen, but endpoints force >= 2 per segment
        n_raw = tr.count()
        assert 2 * 2 <= len(a) < 0.8 * n_raw


class TestRoutes:
    def test_matches_duckdb(self, tracks_path, segged):
        got = tj.route_signatures(segged).toPandas()
        exp = duckdb.sql(
            tj.duckdb_route_signatures_sql(f"'{tracks_path}'")
        ).df()
        got["route"] = got["route"].map(tuple)
        exp["route"] = exp["route"].map(tuple)
        pd.testing.assert_frame_equal(
            _norm(got), _norm(exp), check_dtype=False, check_exact=True
        )

    def test_frequency_matches_duckdb_and_conserves(self, tracks_path, segged):
        routes = tj.route_signatures(segged).cache()
        try:
            got = tj.route_frequency(routes).toPandas()
            exp = duckdb.sql(
                tj.duckdb_route_frequency_sql(f"'{tracks_path}'")
            ).df()
            got["route"] = got["route"].map(tuple)
            exp["route"] = exp["route"].map(tuple)
            pd.testing.assert_frame_equal(
                _norm(got), _norm(exp), check_dtype=False, check_exact=True
            )
            assert got["n_segments"].sum() == routes.count()
        finally:
            routes.unpersist()

    def test_no_consecutive_duplicates_and_order(self, segged):
        rows = tj.route_signatures(segged).collect()
        assert rows
        for r in rows:
            assert len(r.route) == r.n_cells
            assert all(a != b for a, b in zip(r.route, r.route[1:]))


class TestSegmentStream:
    """Streaming segmentation (streaming/tracks.py) == batch twin across
    micro-batch boundaries, with O(1)-per-entity state."""

    def test_stream_matches_batch(self, spark, tracks_path, tmp_path):
        from jimmy_spark.streaming import tracks as st

        tr = spark.read.parquet(tracks_path).toPandas()
        # ns timestamps land in parquet as raw INT64 (Spark can't read
        # NANOS as ntz); write the waves at us like the source table
        tr["ts"] = tr["ts"].astype("datetime64[us]")
        d = tmp_path / "pings"
        d.mkdir()
        # three in-order waves; boundaries deliberately cut through planted
        # gap/jump positions so the break predicate must consult the state
        # ping, not just the batch-internal lag
        for i, hi in enumerate((50, 110, 10_000)):
            lo = 0 if i == 0 else (50, 110)[i - 1]
            wave = tr[(tr["seq"] >= lo) & (tr["seq"] < hi)]
            wave.to_parquet(d / f"wave{i}.parquet")

        got = st.run_segment_stream(spark, str(d)).toPandas()
        exp = (
            tj.segment_tracks(spark.read.parquet(tracks_path))
            .select(*got.columns)
            .toPandas()
        )
        pd.testing.assert_frame_equal(
            _norm(got), _norm(exp), check_dtype=False, check_exact=True
        )

    def test_out_of_order_rows_dropped_not_corrupting(self, spark, tracks_path, tmp_path):
        from jimmy_spark.streaming import tracks as st

        tr = spark.read.parquet(tracks_path).toPandas()
        tr["ts"] = tr["ts"].astype("datetime64[us]")
        one = tr[tr["entity_id"] == 0]
        d = tmp_path / "pings"
        d.mkdir()
        one[one["seq"] < 80].to_parquet(d / "wave0.parquet")
        # wave 1 replays stale seqs [60,80) plus the genuinely new tail
        one[one["seq"] >= 60].to_parquet(d / "wave1.parquet")

        got = st.run_segment_stream(spark, str(d)).toPandas()
        exp = (
            tj.segment_tracks(
                spark.read.parquet(tracks_path).filter("entity_id = 0")
            )
            .select(*got.columns)
            .toPandas()
        )
        # each ping emitted exactly once (replay dropped), segmentation
        # identical to the batch over the deduplicated feed
        assert got["seq"].is_unique
        pd.testing.assert_frame_equal(
            _norm(got), _norm(exp), check_dtype=False, check_exact=True
        )


class TestSegmentHulls:
    @staticmethod
    def _gift_wrap(pts):
        """Independent O(nh) gift-wrapping hull (Jarvis march) on exact
        ints — a disjoint algorithm from the engine's monotone chain."""
        pts = sorted(set(pts))
        if len(pts) <= 2:
            return pts
        hull = []
        start = min(pts)
        p = start
        while True:
            hull.append(p)
            q = pts[0] if pts[0] != p else pts[1]
            for r in pts:
                if r == p:
                    continue
                cross = (q[0] - p[0]) * (r[1] - p[1]) - (q[1] - p[1]) * (r[0] - p[0])
                if cross < 0 or (
                    cross == 0
                    and (r[0] - p[0]) ** 2 + (r[1] - p[1]) ** 2
                    > (q[0] - p[0]) ** 2 + (q[1] - p[1]) ** 2
                ):
                    q = r
            p = q
            if p == start:
                break
        return hull

    def test_matches_gift_wrapping(self, spark, segged):
        import math as _math

        got = (
            tj.segment_hulls(segged)
            .toPandas().sort_values(["entity_id", "seg_seq"]).reset_index(drop=True)
        )
        pdf = segged.select("entity_id", "seg_seq", "lat_e7", "lon_e7").toPandas()
        assert len(got) == pdf.groupby(["entity_id", "seg_seq"]).ngroups
        by_key = {
            (int(r.entity_id), int(r.seg_seq)): r for r in got.itertuples()
        }
        checked_interior = 0
        for (e, s), grp in pdf.groupby(["entity_id", "seg_seq"]):
            pts = list(zip((int(v) for v in grp["lon_e7"]), (int(v) for v in grp["lat_e7"])))
            hull = self._gift_wrap(pts)
            r = by_key[(int(e), int(s))]
            assert r.n_pings == len(grp)
            assert r.hull_n == len(hull), (e, s)
            m = len(hull)
            area2 = sum(
                hull[i][0] * hull[(i + 1) % m][1] - hull[(i + 1) % m][0] * hull[i][1]
                for i in range(m)
            ) if m >= 3 else 0
            assert r.area2 == abs(area2), (e, s)
            if m >= 3:
                perim = sum(
                    _math.isqrt(
                        (hull[(i + 1) % m][0] - hull[i][0]) ** 2
                        + (hull[(i + 1) % m][1] - hull[i][1]) ** 2
                    )
                    for i in range(m)
                )
                assert r.perim_len == perim
                # exact containment: every ping on or inside the CCW hull
                for x, y in set(pts):
                    for i in range(m):
                        x1, y1 = hull[i]
                        x2, y2 = hull[(i + 1) % m]
                        assert (x2 - x1) * (y - y1) - (y2 - y1) * (x - x1) >= 0, (e, s)
                checked_interior += 1
        assert checked_interior > 10  # real hulls exercised, not all degenerate

    def test_collinear_and_single(self, spark):
        pdf = pd.DataFrame(
            {
                "entity_id": [1] * 4 + [2],
                "seg_seq": [1] * 4 + [1],
                "lat_e7": [0, 10, 20, 30, 5],
                "lon_e7": [0, 20, 40, 60, 7],
            }
        ).astype("int64")
        got = (
            tj.segment_hulls(spark.createDataFrame(pdf))
            .toPandas().sort_values("entity_id").reset_index(drop=True)
        )
        # collinear: 2-vertex hull, zero area, perimeter = one chord length
        import math as _math

        assert got.loc[0, "hull_n"] == 2 and got.loc[0, "area2"] == 0
        assert got.loc[0, "perim_len"] == _math.isqrt(30 * 30 + 60 * 60)
        # single point: 1 vertex, zero everything
        assert got.loc[1, "hull_n"] == 1 and got.loc[1, "area2"] == 0
        assert got.loc[1, "perim_len"] == 0

    def test_partitioning_invariance(self, spark, segged):
        a = (
            tj.segment_hulls(segged.repartition(1))
            .toPandas().sort_values(["entity_id", "seg_seq"]).reset_index(drop=True)
        )
        b = (
            tj.segment_hulls(segged.repartition(19))
            .toPandas().sort_values(["entity_id", "seg_seq"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)


class TestMatchStream:
    """Streaming map matching (streaming/tracks.py run_match_stream):
    two-wave stream union == one-shot batch match, rows exactly once;
    restart with no new files is a no-op."""

    def test_stream_matches_batch(self, spark, tracks_path, tmp_path):
        from jimmy_spark.datagen import ensure_roads
        from jimmy_spark.operators import mapmatch
        from jimmy_spark.streaming import tracks as st

        roads_path = f"{ensure_roads('t2')}/roads.parquet"
        tr = spark.read.parquet(tracks_path).toPandas()
        tr["ts"] = tr["ts"].astype("datetime64[us]")
        d = tmp_path / "pings"
        d.mkdir()
        for i, (lo, hi) in enumerate(((0, 80), (80, 10_000))):
            tr[(tr["seq"] >= lo) & (tr["seq"] < hi)].to_parquet(
                d / f"wave{i}.parquet"
            )
        out = tmp_path / "out"
        cp = tmp_path / "cp"
        st.run_match_stream(
            spark, str(d), roads_path, str(out), str(cp),
            max_files_per_trigger=1,
        )
        got = spark.read.parquet(f"{out}/b=*").toPandas()
        exp = mapmatch.map_match(
            spark.read.parquet(tracks_path),
            spark.read.parquet(roads_path),
        ).toPandas()
        assert len(got) == len(exp)  # exactly once, no dupes across batches
        key = ["entity_id", "seq"]
        cols = sorted(got.columns)
        a = got[cols].sort_values(key).reset_index(drop=True)
        b = exp[cols].sort_values(key).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        # drain with no new files: a no-op, nothing rewritten or added
        import os

        before = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(out) for f in fs
        )
        st.run_match_stream(
            spark, str(d), roads_path, str(out), str(cp),
            max_files_per_trigger=1,
        )
        after = sorted(
            os.path.join(r, f)
            for r, _, fs in os.walk(out) for f in fs
        )
        assert before == after


class TestResample:
    """Exact-integer track resampling (resample_tracks): per-segment
    interpolated positions at step-aligned epochs. Oracles: an
    INDEPENDENT Fraction-exact pure-Python twin (rational interpolation
    floored, no shift trick), the DuckDB SQL twin (the driver-gate
    formulation), and the alignment/coverage/exactness invariants."""

    STEP = 30

    @pytest.fixture(scope="class")
    def resampled(self, spark, segged):
        rows = tj.resample_tracks(segged, step_s=self.STEP).collect()
        return {
            (r.entity_id, r.seg_seq, r.e): (r.r_lat, r.r_lon) for r in rows
        }

    @pytest.fixture(scope="class")
    def seg_pings(self, segged):
        by_seg = {}
        for r in segged.select(
            "entity_id", "seg_seq", "seq",
            F.col("ts").cast("timestamp_ltz").cast("long").alias("t"),
            "lat_e7", "lon_e7",
        ).collect():
            by_seg.setdefault((r.entity_id, r.seg_seq), []).append(
                (r.seq, r.t, r.lat_e7, r.lon_e7)
            )
        for v in by_seg.values():
            v.sort()
        return by_seg

    def test_matches_fraction_exact_twin(self, resampled, seg_pings):
        from fractions import Fraction
        from math import floor

        exp = {}
        for (ent, seg), pings in seg_pings.items():
            for (_, t0, la0, lo0), (_, t1, la1, lo1) in zip(pings, pings[1:]):
                e = ((t0 + self.STEP - 1) // self.STEP) * self.STEP
                while e < t1:
                    la = floor(Fraction(la0 * (t1 - e) + la1 * (e - t0), t1 - t0))
                    lo = floor(Fraction(lo0 * (t1 - e) + lo1 * (e - t0), t1 - t0))
                    exp[(ent, seg, e)] = (la, lo)
                    e += self.STEP
            _, tn, lan, lon_ = pings[-1][0], *pings[-1][1:]
            if tn % self.STEP == 0:
                exp[(ent, seg, tn)] = (lan, lon_)
        assert resampled == exp and len(exp) > 1000

    def test_matches_duckdb_twin(self, resampled, tracks_path):
        exp = {
            (r[0], r[1], r[2]): (r[3], r[4])
            for r in duckdb.sql(
                tj.duckdb_resample_sql(f"'{tracks_path}'", step_s=self.STEP)
            ).fetchall()
        }
        assert resampled == exp

    def test_alignment_coverage_and_ping_exactness(self, resampled, seg_pings):
        # every epoch step-aligned; per segment the aligned epochs in
        # [t_first, t_last] are covered exactly once, none outside
        for (ent, seg), pings in seg_pings.items():
            t_first, t_last = pings[0][1], pings[-1][1]
            got_e = sorted(
                e for (en, sg, e) in resampled if (en, sg) == (ent, seg)
            )
            lo = ((t_first + self.STEP - 1) // self.STEP) * self.STEP
            want = list(range(lo, t_last + 1, self.STEP))
            assert got_e == want
            # an aligned epoch hitting a ping exactly returns that ping's
            # coordinates bit-exactly; all positions stay inside the
            # segment's coordinate envelope (convexity + integer floor)
            lats = [p[2] for p in pings]
            lons = [p[3] for p in pings]
            for (_, t, la, lo_) in pings:
                if t % self.STEP == 0:
                    assert resampled[(ent, seg, t)] == (la, lo_)
            for e in got_e:
                rl, rn = resampled[(ent, seg, e)]
                assert min(lats) <= rl <= max(lats)
                assert min(lons) <= rn <= max(lons)

    def test_partitioning_invariance(self, spark, segged, resampled):
        rows = tj.resample_tracks(
            segged.repartition(13), step_s=self.STEP
        ).collect()
        got = {(r.entity_id, r.seg_seq, r.e): (r.r_lat, r.r_lon) for r in rows}
        assert got == resampled
