"""Spatio-temporal contact join + convoy mining (operators/stjoin.py).

Layers: brute-force numpy differential (the blocking construction vs an
all-pairs reference — exactly-once as a multiset, not just a set), DuckDB
twin parity (the same formulation the driver gate runs via
``session_windows``), planted-structure recovery on the contacts fixture
(convoys recovered, the time-shifted ghost pair rejected), inclusive
boundary semantics, partitioning invariance, and the plan shape (one
shuffled equality join, no distinct, no broadcast)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from jimmy_spark.operators import stjoin

D_CT = 40_000
TAU = 120


@pytest.fixture(scope="module")
def contacts_path():
    from jimmy_spark.datagen import ensure_contacts

    return f"{ensure_contacts('t2')}/contacts.parquet"


def _brute(pdf: pd.DataFrame, d: int, tau: int) -> pd.DataFrame:
    """All-pairs reference in numpy: every (a, b) ping pair with
    a.entity < b.entity, |dt| <= tau, dist2 <= d^2 — no blocking, no
    Spark, independent bucket arithmetic via python ints."""
    ent = pdf["entity_id"].to_numpy()
    ep = (pdf["ts"].astype("int64") // 10**9).to_numpy()
    lat = pdf["lat_e7"].to_numpy().astype(object)  # exact big-int squares
    lon = pdf["lon_e7"].to_numpy().astype(object)
    rows = []
    n = len(pdf)
    for i in range(n):
        for j in range(n):
            if ent[i] >= ent[j]:
                continue
            if abs(int(ep[i]) - int(ep[j])) > tau:
                continue
            d2 = (int(lon[i]) - int(lon[j])) ** 2 + (
                int(lat[i]) - int(lat[j])
            ) ** 2
            if d2 > d * d:
                continue
            rows.append(
                (int(ent[i]), int(ent[j]), int(ep[i]) // tau,
                 int(ep[i]), int(ep[j]), d2)
            )
    return pd.DataFrame(
        rows, columns=["a_id", "b_id", "tb", "a_ep", "b_ep", "dist2"]
    )


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    for c in df.columns:  # Spark yields ns timestamps, DuckDB us — unify
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="stable").reset_index(drop=True)


def _small(seed: int, n_ent: int = 8, pings: int = 30) -> pd.DataFrame:
    """Dense random cloud: entities packed into a tight square + time span
    of a few buckets, so cross-entity contacts are common."""
    rng = np.random.default_rng(seed)
    rows = []
    for e in range(n_ent):
        t = 1_700_000_000 + int(rng.integers(0, 240))
        la, lo = rng.integers(-120_000, 120_000, size=2)
        for i in range(pings):
            la += int(rng.integers(-30_000, 30_000))
            lo += int(rng.integers(-30_000, 30_000))
            t += int(rng.integers(20, 90))
            rows.append((e, i, t, int(la), int(lo)))
    pdf = pd.DataFrame(
        rows, columns=["entity_id", "seq", "ts", "lat_e7", "lon_e7"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s")
    return pdf


class TestBruteForceDifferential:
    @pytest.mark.parametrize("seed", [7, 11])
    def test_matches_brute_force_multiset(self, spark, seed):
        pdf = _small(seed)
        df = spark.createDataFrame(pdf)
        got = stjoin.contact_join(df, d=D_CT, tau=TAU).toPandas()
        got["a_ep"] = got["a_ts"].astype("int64") // 10**9
        got["b_ep"] = got["b_ts"].astype("int64") // 10**9
        got = got.drop(columns=["a_ts", "b_ts"])
        want = _brute(pdf, D_CT, TAU)
        assert len(want) > 50, "fixture must exercise real contact mass"
        # multiset equality: exactly-once, not just coverage
        pd.testing.assert_frame_equal(_norm(got), _norm(want))

    def test_wider_grid_same_result(self, spark):
        pdf = _small(13)
        df = spark.createDataFrame(pdf)
        a = _norm(stjoin.contact_join(df, d=D_CT, tau=TAU).toPandas())
        b = _norm(
            stjoin.contact_join(df, d=D_CT, tau=TAU, width=3 * D_CT).toPandas()
        )
        pd.testing.assert_frame_equal(a, b)

    def test_width_guard(self, spark):
        df = spark.createDataFrame(_small(5))
        with pytest.raises(ValueError):
            stjoin.contact_join(df, d=D_CT, tau=TAU, width=D_CT - 1)
        with pytest.raises(ValueError):
            stjoin.contact_join(df, d=D_CT, tau=0)


class TestBoundaries:
    def _two(self, spark, dlat: int, dt_s: int):
        pdf = pd.DataFrame(
            {
                "entity_id": [1, 2],
                "seq": [0, 0],
                "ts": pd.to_datetime(
                    [1_700_000_000, 1_700_000_000 + dt_s], unit="s"
                ),
                "lat_e7": [0, dlat],
                "lon_e7": [0, 0],
            }
        )
        return stjoin.contact_join(
            spark.createDataFrame(pdf), d=D_CT, tau=TAU
        )

    def test_exact_distance_boundary_included(self, spark):
        assert self._two(spark, D_CT, 0).count() == 1
        assert self._two(spark, D_CT + 1, 0).count() == 0

    def test_exact_time_boundary_included(self, spark):
        assert self._two(spark, 0, TAU).count() == 1
        assert self._two(spark, 0, TAU + 1).count() == 0

    def test_same_entity_never_pairs(self, spark):
        pdf = pd.DataFrame(
            {
                "entity_id": [3, 3],
                "seq": [0, 1],
                "ts": pd.to_datetime([1_700_000_000, 1_700_000_010], unit="s"),
                "lat_e7": [0, 5],
                "lon_e7": [0, 5],
            }
        )
        assert (
            stjoin.contact_join(
                spark.createDataFrame(pdf), d=D_CT, tau=TAU
            ).count()
            == 0
        )


class TestDuckDBTwin:
    def test_contacts_and_buckets_and_convoys_match(
        self, spark, contacts_path
    ):
        df = spark.read.parquet(contacts_path)
        got_b = stjoin.contact_buckets(
            stjoin.contact_join(df, d=D_CT, tau=TAU)
        ).toPandas()
        got_c = stjoin.convoys(
            stjoin.contact_buckets(stjoin.contact_join(df, d=D_CT, tau=TAU)),
            k_min=5,
        ).toPandas()
        con = duckdb.connect()
        want_b = con.execute(
            stjoin.duckdb_buckets_sql(f"'{contacts_path}'", D_CT, TAU)
        ).df()
        want_c = con.execute(
            stjoin.duckdb_convoys_sql(f"'{contacts_path}'", D_CT, TAU, 5)
        ).df()
        con.close()
        # planted convoys alone contribute ~74 pair-buckets (20 + 3*18)
        assert len(want_b) > 60
        pd.testing.assert_frame_equal(_norm(got_b), _norm(want_b))
        pd.testing.assert_frame_equal(_norm(got_c), _norm(want_c))


class TestPlantedStructure:
    @pytest.fixture(scope="class")
    def convoy_runs(self, spark, contacts_path):
        df = spark.read.parquet(contacts_path)
        return stjoin.convoys(
            stjoin.contact_buckets(stjoin.contact_join(df, d=D_CT, tau=TAU)),
            k_min=10,
        ).toPandas()

    def test_planted_convoys_recovered(self, convoy_runs):
        # pair (0,1): 40 pings at 60s cadence -> ~20 consecutive tau=120s
        # buckets; triple (2,3,4): 36 pings -> ~18; 3-4 co-move transitively
        pairs = {
            (int(r.a_id), int(r.b_id)): int(r.n_buckets)
            for r in convoy_runs.itertuples()
        }
        for want in [(0, 1), (2, 3), (2, 4), (3, 4)]:
            assert want in pairs, f"planted convoy {want} not recovered"
        assert pairs[(0, 1)] >= 18
        assert pairs[(2, 3)] >= 16

    def test_ghost_pair_rejected(self, spark, contacts_path):
        """Entity 6 replays 5's exact path shifted +1200s: a space-only
        join at the same d pairs their planted overlap heavily; the
        spatio-temporal join must reject it (Δt on the identical-position
        pings is 1200 >> tau). No (5,6) contact may involve two pings at
        the same seq (the planted identical positions)."""
        df = spark.read.parquet(contacts_path)
        g = (
            stjoin.contact_join(df, d=D_CT, tau=TAU)
            .filter((F.col("a_id") == 5) & (F.col("b_id") == 6))
            .toPandas()
        )
        # identical-position pings are 1200s apart -> never a contact
        assert (g["a_ts"] == g["b_ts"] - pd.Timedelta(seconds=1200)).sum() == 0
        # and the space-only join DOES see the planted co-location (120
        # identical-position ping pairs at dist 0), so the rejection above
        # is the temporal filter working, not absence of spatial overlap
        from jimmy_spark.operators import distjoin

        pair56 = df.filter(F.col("entity_id").isin(5, 6))
        space_only = distjoin.distance_join_grid(
            pair56.withColumnRenamed("entity_id", "image_id"), d=D_CT
        ).count()
        assert space_only >= 100

    def test_no_convoy_for_ghost_pair(self, convoy_runs):
        pairs = {(int(r.a_id), int(r.b_id)) for r in convoy_runs.itertuples()}
        assert (5, 6) not in pairs


class TestScaleShape:
    def test_partitioning_invariance(self, spark, contacts_path):
        df = spark.read.parquet(contacts_path)
        a = _norm(
            stjoin.contact_buckets(
                stjoin.contact_join(df.repartition(16), d=D_CT, tau=TAU)
            ).toPandas()
        )
        b = _norm(
            stjoin.contact_buckets(
                stjoin.contact_join(df.coalesce(1), d=D_CT, tau=TAU)
            ).toPandas()
        )
        pd.testing.assert_frame_equal(a, b)

    def test_plan_no_distinct_no_cartesian(self, spark, contacts_path):
        """Exactly-once is by construction: the plan carries no dedup
        aggregate and no cartesian/nested-loop fallback, and the one join
        keys on the composite (gx, gy, tb)."""
        df = spark.read.parquet(contacts_path)
        out = stjoin.contact_join(df, d=D_CT, tau=TAU)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Deduplicate" not in plan
        opt = out._jdf.queryExecution().optimizedPlan().toString()
        join_lines = [ln for ln in opt.splitlines() if "Join " in ln]
        assert len(join_lines) == 1
        for key in ("gx", "gy", "tb"):
            assert key in join_lines[0]


class TestContactStream:
    """Incremental contact maintenance (stjoin.contact_join_incremental +
    streaming/spatial.py run_contact_stream) with tau-bounded state."""

    @staticmethod
    def _set(df_or_rows):
        rows = df_or_rows.collect() if hasattr(df_or_rows, "collect") else df_or_rows
        return {
            (r.a_id, r.b_id, r.tb, r.a_ts, r.b_ts, r.dist2) for r in rows
        }

    def test_incremental_kernel_is_exact_delta(self, spark, contacts_path):
        df = spark.read.parquet(contacts_path)
        # split by TIME (the streaming arrival order), not by entity
        old = df.filter("seq < 60")
        new = df.subtract(old)
        inc = self._set(
            stjoin.contact_join_incremental(new, old, d=D_CT, tau=TAU)
        )
        all_c = self._set(stjoin.contact_join(df, d=D_CT, tau=TAU))
        old_c = self._set(stjoin.contact_join(old, d=D_CT, tau=TAU))
        assert inc == all_c - old_c
        assert inc and old_c  # both waves carry real contact mass

    def test_stream_two_waves_equals_batch(self, spark, contacts_path, tmp_path):
        from jimmy_spark.streaming import spatial

        pdf = pd.read_parquet(contacts_path).sort_values(["ts", "entity_id"])
        src = tmp_path / "pings"
        src.mkdir()
        out, st, cp = (str(tmp_path / n) for n in ("contacts", "state", "cp"))

        # waves split on event time: the file-source in-order contract
        cut = pdf["ts"].quantile(0.5)
        pdf[pdf["ts"] <= cut].to_parquet(src / "w0.parquet")
        spatial.run_contact_stream(spark, str(src), D_CT, TAU, out, st, cp)
        first = self._set(spark.read.parquet(f"{out}/b=*"))
        assert first

        # drain with nothing new: no-op
        spatial.run_contact_stream(spark, str(src), D_CT, TAU, out, st, cp)
        assert self._set(spark.read.parquet(f"{out}/b=*")) == first

        pdf[pdf["ts"] > cut].to_parquet(src / "w1.parquet")
        spatial.run_contact_stream(spark, str(src), D_CT, TAU, out, st, cp)

        got = self._set(spark.read.parquet(f"{out}/b=*"))
        exp = self._set(
            stjoin.contact_join(spark.read.parquet(contacts_path), d=D_CT, tau=TAU)
        )
        assert got == exp
        # exactly-once: row count equals set size
        assert spark.read.parquet(f"{out}/b=*").count() == len(exp)

    def test_state_pruning_skips_expired_batches(self, tmp_path):
        import json
        import os

        from jimmy_spark.streaming.spatial import retained_state_batches

        st = tmp_path / "state"
        for bid, max_ep in [(0, 1000), (1, 2000), (2, 3000)]:
            d = st / f"b={bid}"
            os.makedirs(d)
            with open(d / "_max_ts.json", "w") as f:
                json.dump({"max_ep": max_ep}, f)
        # batch 3 with min event time 2500, tau 120 -> cutoff 2380:
        # batches 0 (1000) and 1 (2000) expired, 2 (3000) retained
        keep, skipped = retained_state_batches(str(st), 3, 2500 - 120)
        assert [os.path.basename(k) for k in keep] == ["b=2"]
        assert skipped == 2
        # missing meta: kept (correctness over pruning)
        os.remove(st / "b=0" / "_max_ts.json")
        keep, skipped = retained_state_batches(str(st), 3, 2500 - 120)
        assert [os.path.basename(k) for k in keep] == ["b=0", "b=2"]
        assert skipped == 1
        # a replay of batch 1 must not see state >= its own id
        keep, _ = retained_state_batches(str(st), 1, 0)
        assert [os.path.basename(k) for k in keep] == ["b=0"]

    def test_stream_prunes_state_end_to_end(self, spark, tmp_path):
        """Two waves separated by an event-time gap far beyond tau: the
        second batch must retain ZERO state batches yet still produce the
        exact batch-equivalent union (no cross-wave contacts exist)."""
        import json

        from jimmy_spark.streaming import spatial
        from jimmy_spark.streaming.spatial import retained_state_batches

        base = 1_700_000_000
        def _mk(eids, t0):
            rows = []
            for k, e in enumerate(eids):
                rows.append((e, k, pd.Timestamp(t0 + 10 * k, unit="s"),
                             1000 * k, 500 * k))
            out = pd.DataFrame(rows, columns=["entity_id", "seq", "ts",
                                              "lat_e7", "lon_e7"])
            # write parquet at us precision (ns TIMESTAMP(NANOS) columns
            # do not read under the stream's pinned timestamp schema)
            out["ts"] = out["ts"].astype("datetime64[us]")
            return out

        src = tmp_path / "pings"
        src.mkdir()
        out, st, cp = (str(tmp_path / n) for n in ("contacts", "state", "cp"))
        _mk([1, 2, 3], base).to_parquet(src / "w0.parquet")
        spatial.run_contact_stream(spark, str(src), D_CT, TAU, out, st, cp)
        # wave 2 lands 100*tau later: wave-1 state is expired
        _mk([4, 5, 6], base + 100 * TAU).to_parquet(src / "w1.parquet")
        spatial.run_contact_stream(spark, str(src), D_CT, TAU, out, st, cp)

        # the second batch's cutoff excludes the first batch's state
        with open(f"{st}/b=0/_max_ts.json") as f:
            max0 = json.load(f)["max_ep"]
        keep, skipped = retained_state_batches(st, 1, base + 100 * TAU - TAU)
        assert keep == [] and skipped == 1 and max0 < base + 100 * TAU - TAU

        got = self._set(spark.read.parquet(f"{out}/b=*"))
        both = spark.createDataFrame(
            pd.concat([_mk([1, 2, 3], base), _mk([4, 5, 6], base + 100 * TAU)])
        )
        exp = self._set(stjoin.contact_join(both, d=D_CT, tau=TAU))
        assert got == exp and len(exp) > 0


class TestContactStreamSkew:
    """r6 (VERDICT r5 stretch #8): one entity owning 90% of the pings
    must not make per-batch work grow with stream lifetime — the
    tau-bounded state prune keeps each batch's old-side reads
    O(tau / batch-span), and per-batch emitted contact mass stays flat
    when every wave carries the same (skewed) structure."""

    N_WAVES = 5
    WAVE_GAP = 1_000  # seconds between waves >> TAU: no cross-wave pairs

    @staticmethod
    def _wave(w: int) -> pd.DataFrame:
        base = 1_700_000_000 + w * TestContactStreamSkew.WAVE_GAP
        rows = []
        # hot entity 0: 90 pings at one spot (90% of the wave)
        for i in range(90):
            rows.append((0, w * 1000 + i, base + i, 10_000, 10_000))
        # 10 cold entities: one ping each, in range of the hot spot
        for e in range(1, 11):
            rows.append((e, w * 1000 + e, base + e, 12_000, 12_000))
        pdf = pd.DataFrame(
            rows, columns=["entity_id", "seq", "ts", "lat_e7", "lon_e7"]
        )
        # microsecond precision: Spark reads TIMESTAMP(MICROS), not NANOS
        pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s").astype("datetime64[us]")
        return pdf

    def test_skewed_stream_state_bounded_and_work_flat(self, spark, tmp_path):
        from jimmy_spark.streaming import spatial

        src = tmp_path / "pings"
        src.mkdir()
        out, st, cp = (str(tmp_path / n) for n in ("contacts", "state", "cp"))
        waves = [self._wave(w) for w in range(self.N_WAVES)]
        for w, pdf in enumerate(waves):
            pdf.to_parquet(src / f"w{w}.parquet")
            spatial.run_contact_stream(
                spark, str(src), D_CT, TAU, out, st, cp,
                max_files_per_trigger=1,
            )

        # exactness under skew: union of deltas == batch join over all
        all_pdf = pd.concat(waves, ignore_index=True)
        got = TestContactStream._set(spark.read.parquet(f"{out}/b=*"))
        exp = TestContactStream._set(
            stjoin.contact_join(spark.createDataFrame(all_pdf), d=D_CT, tau=TAU)
        )
        assert got == exp and len(got) > 100
        assert spark.read.parquet(f"{out}/b=*").count() == len(exp)

        # per-batch work is FLAT: waves are identical up to time shift,
        # and the tau prune guarantees no cross-wave pairs, so every
        # batch dir after the first carries exactly the same contact
        # count — per-batch cost tracks the wave, not the accumulated
        # stream
        import os

        ids = sorted(
            int(e.split("=", 1)[1])
            for e in os.listdir(out) if e.startswith("b=")
        )
        assert len(ids) == self.N_WAVES
        per_batch = [
            spark.read.parquet(f"{out}/b={i}").count() for i in ids
        ]
        assert len(set(per_batch)) == 1, per_batch

        # tau-bounded state: for a next batch arriving at the last
        # wave's event-time frontier, every state dir but the newest is
        # expired — the retained old side is O(tau / batch-span),
        # independent of the 5-wave lifetime
        last_lo = int(waves[-1]["ts"].astype("int64").min() // 10**6)
        # a batch still inside the last wave's tau window retains ONLY
        # the newest state dir...
        keep, skipped = spatial.retained_state_batches(
            st, batch_id=ids[-1] + 1, cutoff_ep=last_lo
        )
        assert len(keep) == 1 and skipped == self.N_WAVES - 1
        # ...and one arriving a full wave-gap later retains nothing:
        # the old side read per batch is O(tau / batch-span), not
        # O(stream lifetime), hot entity or not
        keep, skipped = spatial.retained_state_batches(
            st, batch_id=ids[-1] + 1,
            cutoff_ep=last_lo + self.WAVE_GAP - TAU,
        )
        assert keep == [] and skipped == self.N_WAVES
