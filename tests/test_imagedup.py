"""Image near-duplicate fusion lanes (operators/imagedup.py).

Oracles, independent of the band-join plan AND of each other:
(1) pure-numpy brute-force popcount scan over aHashes computed by the
    same per-row kernel the operator consumes (per-row ops, so batch
    boundaries cannot change values);
(2) the DuckDB SQL twin (duckdb_ahash_sql) — a second engine applying
    the identical deterministic emission rule (some equal band in an
    uncapped bucket + bit_count verify).

The content lane runs END-TO-END (bytes → decode → aHash → band join)
over the datagen ``dup_every`` fixture: planted pixel-level near-dups
whose identity columns (id, phash, caption) are unrelated — exactly the
duplicates exact-hash dedup and the precomputed-phash lane cannot see.

Reference semantics anchor: jimmy's Resource.md5 exact-equality dedup
(/root/reference/src/jimmy/intermediate_format.py:120-128), generalized
to Hamming near-duplicates over decoded content.
"""

import tempfile

import duckdb
import numpy as np
import pandas as pd
import pytest

from jimmy_spark.datagen.images import write_images
from jimmy_spark.operators import imagedup, multimodal
from jimmy_spark.operators.dedup import hamming_pairs
from jimmy_spark.operators.distjoin import distance_join_grid

N_IMG = 240
DUP_EVERY = 4
SEED = 11


@pytest.fixture(scope="module")
def dup_images_dir():
    d = tempfile.mkdtemp(prefix="jimmy_dup_imgs_")
    path = f"{d}/images.parquet"
    write_images(path, N_IMG, SEED, dup_every=DUP_EVERY)
    return path


@pytest.fixture(scope="module")
def feats(spark, dup_images_dir):
    imgs = spark.read.parquet(dup_images_dir)
    out = (
        multimodal.image_features(imgs)
        .filter("ok")
        .select("image_id", "ahash")
        .cache()
    )
    assert out.count() == N_IMG
    return out


@pytest.fixture(scope="module")
def feats_pdf(feats):
    return feats.toPandas().sort_values("image_id").reset_index(drop=True)


def _popcount64(x: int) -> int:
    return bin(x & 0xFFFFFFFFFFFFFFFF).count("1")


def _brute_pairs(pdf: pd.DataFrame, threshold: int) -> set:
    """All (a, b, hamming) with a < b and distance <= threshold. With
    bands > threshold and no capped buckets this IS the operator's
    contract (pigeonhole: some band matches exactly)."""
    ids = pdf["image_id"].to_numpy()
    hs = pdf["ahash"].to_numpy().astype(np.int64).view(np.uint64)
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            ham = _popcount64(int(hs[i]) ^ int(hs[j]))
            if ham <= threshold:
                a, b = sorted((ids[i], ids[j]))
                out.add((a, b, ham))
    return out


class TestAhashNearDup:
    def test_end_to_end_matches_brute_force(self, spark, dup_images_dir, feats_pdf):
        imgs = spark.read.parquet(dup_images_dir)
        got = {
            (r.a, r.b, r.hamming)
            for r in imagedup.ahash_near_dup(imgs, threshold=6).collect()
        }
        want = _brute_pairs(feats_pdf, 6)
        assert got == want
        assert len(want) >= N_IMG // DUP_EVERY - 1  # planted pairs exist

    @pytest.mark.parametrize("threshold,bands", [(0, 8), (3, 4), (6, 8), (15, 16)])
    def test_matches_duckdb_twin(self, feats, feats_pdf, threshold, bands):
        got = sorted(
            (r.a, r.b, r.hamming)
            for r in hamming_pairs(
                feats,
                max_hamming=threshold,
                id_col="image_id",
                sig_col="ahash",
                nbands=bands,
            ).collect()
        )
        con = duckdb.connect()
        con.register("feats", feats_pdf)
        want = [
            tuple(t)
            for t in con.execute(
                imagedup.duckdb_ahash_sql(threshold, bands=bands)
            ).fetchall()
        ]
        con.close()
        assert got == want

    def test_planted_content_dups_recovered(self, spark, dup_images_dir):
        imgs = spark.read.parquet(dup_images_dir)
        pairs = {
            (r.a, r.b): r.hamming
            for r in imagedup.ahash_near_dup(imgs, threshold=6).collect()
        }
        for gi in range(1, N_IMG, DUP_EVERY):
            a, b = f"img_{gi - 1:012d}", f"img_{gi:012d}"
            assert (a, b) in pairs, f"planted near-dup {a},{b} missing"
            assert pairs[(a, b)] <= 3  # datagen's measured plant gap

    def test_hot_bucket_cap_twin_parity(self, spark):
        # 5 identical hashes: every one of their buckets holds 5 > cap 2,
        # so the cluster is (deterministically) skipped; the crafted pair
        # differs only inside band 0, its bands 1..7 buckets hold 2 <= cap.
        h0 = 0x1111111111111111
        rows = [(f"c{i}", 0) for i in range(5)]
        rows += [("p0", h0), ("p1", h0 ^ 0b11)]
        df = spark.createDataFrame(rows, "image_id string, ahash long")
        got = sorted(
            (r.a, r.b, r.hamming)
            for r in hamming_pairs(
                df, max_hamming=6, id_col="image_id", sig_col="ahash",
                nbands=8, max_bucket=2,
            ).collect()
        )
        assert got == [("p0", "p1", 2)]
        con = duckdb.connect()
        con.register(
            "feats",
            pd.DataFrame(rows, columns=["image_id", "ahash"]).astype(
                {"ahash": np.int64}
            ),
        )
        want = [
            tuple(t)
            for t in con.execute(
                imagedup.duckdb_ahash_sql(6, max_bucket=2)
            ).fetchall()
        ]
        con.close()
        assert got == want

    def test_guards(self, spark, dup_images_dir):
        imgs = spark.read.parquet(dup_images_dir)
        with pytest.raises(ValueError):
            imagedup.ahash_near_dup(imgs, threshold=8, nbands=8).collect()

    def test_partitioning_invariance(self, spark, dup_images_dir):
        imgs = spark.read.parquet(dup_images_dir)
        base = sorted(
            (r.a, r.b, r.hamming)
            for r in imagedup.ahash_near_dup(imgs, threshold=6).collect()
        )
        re7 = sorted(
            (r.a, r.b, r.hamming)
            for r in imagedup.ahash_near_dup(
                imgs.repartition(7), threshold=6
            ).collect()
        )
        assert base == re7


def _mk_scene_points(feats_pdf, seed=5, d=20_000):
    """Deterministic positions: dense window so spatial pairs exist;
    planted content dups at gi % 8 == 1 snapped next to their base so
    some content pairs are also scene pairs; one exact-boundary pair."""
    rng = np.random.default_rng(seed)
    n = len(feats_pdf)
    lat = rng.integers(-150_000, 150_000, size=n).astype(object)
    lon = rng.integers(-150_000, 150_000, size=n).astype(object)
    for gi in range(1, n, 8):
        lat[gi] = lat[gi - 1] + 3_000
        lon[gi] = lon[gi - 1] - 2_000
    # exact-boundary spatial pair with identical hashes (hamming 0)
    ids = list(feats_pdf["image_id"])
    hs = list(feats_pdf["ahash"])
    ids += ["zz_edge_a", "zz_edge_b"]
    hs += [42, 42]
    lat = np.append(lat, [900_000, 900_000])
    lon = np.append(lon, [900_000, 900_000 + d])
    return pd.DataFrame(
        {
            "image_id": ids,
            "ahash": np.array(hs, dtype=np.int64),
            "lat_e7": lat.astype(np.int64),
            "lon_e7": lon.astype(np.int64),
        }
    )


class TestSceneDupPairs:
    D = 20_000
    T = 6

    def _brute(self, pdf):
        ids = pdf["image_id"].to_numpy()
        hs = pdf["ahash"].to_numpy().astype(np.int64).view(np.uint64)
        lat = pdf["lat_e7"].to_numpy().astype(object)
        lon = pdf["lon_e7"].to_numpy().astype(object)
        out = set()
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                d2 = (lat[i] - lat[j]) ** 2 + (lon[i] - lon[j]) ** 2
                if d2 > self.D * self.D:
                    continue
                ham = _popcount64(int(hs[i]) ^ int(hs[j]))
                if ham <= self.T:
                    a, b = sorted((ids[i], ids[j]))
                    out.add((a, b, int(d2), ham))
        return out

    def test_matches_brute_force(self, spark, feats_pdf):
        pdf = _mk_scene_points(feats_pdf, d=self.D)
        df = spark.createDataFrame(pdf)
        got = {
            (r.a_id, r.b_id, r.dist2, r.hamming)
            for r in imagedup.scene_dup_pairs(df, d=self.D, threshold=self.T).collect()
        }
        want = self._brute(pdf)
        assert got == want
        assert ("zz_edge_a", "zz_edge_b", self.D * self.D, 0) in got  # inclusive
        assert len(want) > 0

    def test_carry_cols_regression(self, spark, feats_pdf):
        # carrying columns must not change the join's pair set
        pdf = _mk_scene_points(feats_pdf, d=self.D)
        df = spark.createDataFrame(pdf)
        plain = {
            (r.a_id, r.b_id, r.dist2)
            for r in distance_join_grid(df, d=self.D).collect()
        }
        carried = {
            (r.a_id, r.b_id, r.dist2)
            for r in distance_join_grid(df, d=self.D, carry_cols=("ahash",)).collect()
        }
        assert plain == carried

    def test_carried_hash_values(self, spark, feats_pdf):
        pdf = _mk_scene_points(feats_pdf, d=self.D)
        df = spark.createDataFrame(pdf)
        byid = dict(zip(pdf["image_id"], pdf["ahash"].astype(int)))
        rows = distance_join_grid(df, d=self.D, carry_cols=("ahash",)).collect()
        assert rows
        for r in rows:
            assert r.a_ahash == byid[r.a_id] and r.b_ahash == byid[r.b_id]

    def test_plan_no_cartesian(self, spark, feats_pdf):
        pdf = _mk_scene_points(feats_pdf, d=self.D)
        df = spark.createDataFrame(pdf)
        plan = (
            imagedup.scene_dup_pairs(df, d=self.D, threshold=self.T)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestSceneDupIncremental:
    """scene_dup_pairs_incremental(new, old) == scene(all) - scene(old),
    exactly — the hamming gate is per-pair, so the grid join's delta
    identity carries over; carried hashes must stay aligned to their ids
    through the (least, greatest) normalization (new-old pairs surface
    with the new point on either side)."""

    # the fixture scatters points globally (no skew), so pair mass needs a
    # wide radius; deltas stay within the grid kernel's 3x3 neighborhood
    # bound, so dist2 stays in int64. T=40 keeps the gate live (real aHash
    # pairs span it) while leaving enough surviving pairs to assert on.
    D = 400_000_000
    T = 40

    @staticmethod
    def _with_geo(spark, dup_images_dir, feats):
        from jimmy_spark.operators import cells

        imgs = spark.read.parquet(dup_images_dir)
        pts = cells.with_georef(imgs.select("image_id", "phash")).select(
            "image_id", "lat_e7", "lon_e7"
        )
        return pts.join(feats, "image_id")

    def test_exact_delta_and_carry_alignment(self, spark, dup_images_dir, feats):
        pts = self._with_geo(spark, dup_images_dir, feats)
        # interleaved split (even/odd last digit): cross-wave pairs then
        # surface with the new point on BOTH sides of the a<b order
        old = pts.filter("cast(substring(image_id, -1, 1) as int) % 2 = 0")
        new = pts.subtract(old)

        def key(df):
            return {(r.a_id, r.b_id, r.dist2, r.hamming) for r in df.collect()}

        inc = key(
            imagedup.scene_dup_pairs_incremental(new, old, d=self.D, threshold=self.T)
        )
        all_p = key(imagedup.scene_dup_pairs(pts, d=self.D, threshold=self.T))
        old_p = key(imagedup.scene_dup_pairs(old, d=self.D, threshold=self.T))
        assert inc == all_p - old_p
        assert inc and old_p  # both waves carry real pair mass
        # cross-wave pairs present in both id orders (old<new and new<old),
        # so the swap-aligned carry is actually exercised
        old_ids = {r.image_id for r in old.select("image_id").collect()}
        cross = {(a, b) for a, b, *_ in inc if (a in old_ids) != (b in old_ids)}
        assert any(a in old_ids for a, b in cross)
        assert any(b in old_ids for a, b in cross)


class TestSceneKeepBest:
    """scene_dedup_keep_best vs the independent DuckDB twin (brute-force
    pairs + recursive-CTE components + row_number argmax — disjoint
    formulations of the grid join, star-contraction CC, and struct-max),
    plus the policy invariants the downstream curation filter relies on."""

    D = 400_000_000
    T = 40
    NUM_ID_SPARK = "CAST(substring(image_id, 5, 12) AS BIGINT)"

    @pytest.fixture(scope="class")
    def qpts(self, spark, dup_images_dir):
        from jimmy_spark.operators import cells

        imgs = spark.read.parquet(dup_images_dir)
        feats = (
            multimodal.image_features(imgs)
            .filter("ok")
            .select("image_id", "ahash", "sharp_e3", "clip_e3")
        )
        pts = (
            cells.with_georef(imgs.select("image_id", "phash"))
            .select("image_id", "lat_e7", "lon_e7")
            .join(feats, "image_id")
            .cache()
        )
        assert pts.count() == N_IMG
        return pts

    def test_matches_duckdb_twin(self, spark, qpts):
        from pyspark.sql import functions as F

        got = {
            (r.image_id, r.cluster_id, r.keep)
            for r in imagedup.scene_dedup_keep_best(
                qpts, d=self.D, threshold=self.T,
                num_id=F.expr(self.NUM_ID_SPARK),
            ).collect()
        }
        con = duckdb.connect()
        con.register("pts", qpts.toPandas())
        exp = {
            (r[0], int(r[1]), bool(r[2]))
            for r in con.sql(
                imagedup.duckdb_keep_best_sql(
                    "SELECT * FROM pts", d=self.D, threshold=self.T,
                    num_id_sql=self.NUM_ID_SPARK,
                )
            ).fetchall()
        }
        assert got == exp
        # the policy is live on this fixture: real multi-member clusters
        # exist, and within them the quality argmax actually discards rows
        n_clusters = len({c for _, c, _ in got})
        assert n_clusters < N_IMG
        assert sum(1 for _, _, k in got if not k) == N_IMG - n_clusters

    def test_policy_invariants(self, spark, qpts):
        from pyspark.sql import functions as F

        out = imagedup.scene_dedup_keep_best(
            qpts, d=self.D, threshold=self.T,
            num_id=F.expr(self.NUM_ID_SPARK),
        )
        rows = out.collect()
        # total: every input row labeled exactly once
        assert len(rows) == N_IMG
        assert len({r.image_id for r in rows}) == N_IMG
        # exactly one keep per cluster
        by_cluster = {}
        for r in rows:
            by_cluster.setdefault(r.cluster_id, []).append(r.keep)
        assert all(sum(ks) == 1 for ks in by_cluster.values())
        # kept rows are quality-maximal in their cluster: re-derive the
        # key order in pandas and compare the winner ids
        pdf = qpts.toPandas()
        pdf["_nid"] = pdf["image_id"].str.slice(4, 16).astype("int64")
        labels = {r.image_id: r.cluster_id for r in rows}
        pdf["cluster_id"] = pdf["image_id"].map(labels)
        best = (
            pdf.sort_values(
                ["cluster_id", "sharp_e3", "clip_e3", "_nid"],
                ascending=[True, False, True, True],
            )
            .groupby("cluster_id")
            .head(1)["image_id"]
        )
        assert {r.image_id for r in rows if r.keep} == set(best)
