"""Geofencing / zone-visit detection (operators/geofence.py).

Layers: brute-force pandas differential (pure-Python point-in-polygon +
islands, formulated independently of both the engine and the SQL twin),
DuckDB twin parity (the session_windows 'fence' lane check, run directly),
anchored-structure guarantees from the zones fixture (anchor pings inside,
empty zone empty, consecutive runs never split), dwell/ordinal arithmetic,
and partitioning invariance."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from jimmy_spark.operators import geofence


@pytest.fixture(scope="module")
def paths():
    from jimmy_spark.datagen import ensure_zones

    d = ensure_zones("t2")
    return f"{d}/contacts.parquet", f"{d}/zones.parquet"


@pytest.fixture(scope="module")
def visits_pdf(spark, paths):
    contacts_path, zones_path = paths
    return geofence.zone_visits(
        spark.read.parquet(contacts_path), pd.read_parquet(zones_path)
    ).toPandas()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="stable").reset_index(drop=True)


def _inside(px: int, py: int, ring) -> bool:
    """Pure-Python ray cast, on-edge = inside — written against the
    half-open upward-crossing formulation (independent of raycast.py's
    sign-of-cross construction)."""
    xs = [int(v["lon_e7"]) for v in ring]
    ys = [int(v["lat_e7"]) for v in ring]
    n = len(xs)
    crossings = 0
    for i in range(n):
        x1, y1 = xs[i], ys[i]
        x2, y2 = xs[(i + 1) % n], ys[(i + 1) % n]
        # on-segment check, exact ints
        cross = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
        if (
            cross == 0
            and min(x1, x2) <= px <= max(x1, x2)
            and min(y1, y2) <= py <= max(y1, y2)
        ):
            return True
        if (y1 > py) != (y2 > py):
            # x coordinate of edge at height py, compared exactly via
            # sign-corrected cross product
            if y2 > y1:
                if cross > 0:
                    crossings += 1
            else:
                if cross < 0:
                    crossings += 1
    return crossings % 2 == 1


def _brute_visits(pings: pd.DataFrame, zones: pd.DataFrame) -> pd.DataFrame:
    rows = []
    for _, z in zones.iterrows():
        ring = list(z["ring"])
        for eid, grp in pings.groupby("entity_id"):
            grp = grp.sort_values("seq")
            run = []
            vseq = 0
            for _, p in grp.iterrows():
                if _inside(int(p["lon_e7"]), int(p["lat_e7"]), ring):
                    if run and p["seq"] != run[-1]["seq"] + 1:
                        vseq += 1
                        rows.append(_emit(eid, z["polygon_id"], vseq, run))
                        run = []
                    run.append(p)
                elif run:
                    vseq += 1
                    rows.append(_emit(eid, z["polygon_id"], vseq, run))
                    run = []
            if run:
                vseq += 1
                rows.append(_emit(eid, z["polygon_id"], vseq, run))
    return pd.DataFrame(
        rows,
        columns=[
            "entity_id", "zone_id", "visit_seq", "seq_first", "seq_last",
            "n_pings", "t_enter", "t_exit", "dwell_s",
        ],
    )


def _emit(eid, zid, vseq, run):
    t0, t1 = run[0]["ts"], run[-1]["ts"]
    return (
        int(eid), zid, vseq, int(run[0]["seq"]), int(run[-1]["seq"]),
        len(run), t0, t1,
        int(t1.value // 10**9) - int(t0.value // 10**9),
    )


class TestDifferential:
    def test_matches_pure_python_brute_force(self, visits_pdf, paths):
        contacts_path, zones_path = paths
        want = _brute_visits(
            pd.read_parquet(contacts_path), pd.read_parquet(zones_path)
        )
        assert len(want) > 5
        pd.testing.assert_frame_equal(_norm(visits_pdf), _norm(want))

    def test_matches_duckdb_twin(self, visits_pdf, paths):
        contacts_path, zones_path = paths
        con = duckdb.connect()
        want = con.execute(
            geofence.duckdb_visits_sql(f"'{contacts_path}'", zones_path)
        ).df()
        con.close()
        pd.testing.assert_frame_equal(_norm(visits_pdf), _norm(want))


class TestAnchoredStructure:
    def test_anchor_pings_are_visited(self, visits_pdf):
        # zones.py anchors zone_0/1/2 at (e0, seq30), (e1, seq80),
        # (e2, seq10): each anchor ping must sit inside SOME visit run
        for eid, zid, seq in [(0, "zone_0", 30), (1, "zone_1", 80),
                              (2, "zone_2", 10)]:
            v = visits_pdf[
                (visits_pdf["entity_id"] == eid)
                & (visits_pdf["zone_id"] == zid)
                & (visits_pdf["seq_first"] <= seq)
                & (visits_pdf["seq_last"] >= seq)
            ]
            assert len(v) == 1, f"anchor ({eid}, {zid}, {seq}) unvisited"

    def test_empty_zone_has_no_visits(self, visits_pdf):
        assert (visits_pdf["zone_id"] == "zone_4").sum() == 0

    def test_central_zone_catches_multiple_entities(self, visits_pdf):
        z3 = visits_pdf[visits_pdf["zone_id"] == "zone_3"]
        assert z3["entity_id"].nunique() >= 3

    def test_visit_runs_are_maximal_and_ordinals_dense(self, visits_pdf):
        for (eid, zid), grp in visits_pdf.groupby(["entity_id", "zone_id"]):
            grp = grp.sort_values("visit_seq")
            assert list(grp["visit_seq"]) == list(range(1, len(grp) + 1))
            # maximality: consecutive visits are separated by a seq gap
            lasts = grp["seq_last"].to_numpy()
            firsts = grp["seq_first"].to_numpy()
            assert (firsts[1:] - lasts[:-1] >= 2).all()

    def test_dwell_matches_timestamps(self, visits_pdf):
        ep = lambda s: s.astype("int64") // 10**9  # noqa: E731
        assert (
            visits_pdf["dwell_s"]
            == ep(visits_pdf["t_exit"]) - ep(visits_pdf["t_enter"])
        ).all()
        single = visits_pdf[visits_pdf["n_pings"] == 1]
        assert (single["dwell_s"] == 0).all()


class TestScaleShape:
    def test_partitioning_invariance(self, spark, paths, visits_pdf):
        contacts_path, zones_path = paths
        zpdf = pd.read_parquet(zones_path)
        again = geofence.zone_visits(
            spark.read.parquet(contacts_path).repartition(16), zpdf
        ).toPandas()
        pd.testing.assert_frame_equal(_norm(again), _norm(visits_pdf))

    def test_pip_stage_is_shuffle_free(self, spark, paths):
        contacts_path, zones_path = paths
        from jimmy_spark.operators import pip

        keyed = spark.read.parquet(contacts_path).selectExpr(
            "concat_ws('_', entity_id, seq) AS _pid",
            "lat_e7", "lon_e7", "entity_id", "seq", "ts",
        )
        plan = (
            pip.pip_join_rtree(
                keyed, pd.read_parquet(zones_path), id_col="_pid",
                carry_cols=("entity_id", "seq", "ts"),
            )
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
