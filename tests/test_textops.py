"""Text / dedup / similarity operators vs DuckDB oracles + NumPy refs."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from jimmy_spark.operators import dedup, multimodal, similarity, text

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("documents", "embeddings"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _cmp(got_df, exp_df, sort_cols):
    g = got_df.toPandas().sort_values(sort_cols).reset_index(drop=True)
    x = exp_df.df().sort_values(sort_cols).reset_index(drop=True)
    g = g[sorted(g.columns)]
    x = x[sorted(x.columns)]
    pd.testing.assert_frame_equal(g, x, check_dtype=False)


class TestText:
    def test_token_count(self, docs, con):
        _cmp(
            text.token_count(docs),
            con.sql(text.duckdb_text_sql()["token_count"]),
            ["doc_id"],
        )

    def test_quality_score(self, docs, con):
        _cmp(
            text.quality_score(docs),
            con.sql(text.duckdb_text_sql()["quality_score"]),
            ["doc_id"],
        )

    def test_lang_id(self, docs, con):
        _cmp(
            text.lang_id(docs), con.sql(text.duckdb_text_sql()["lang_id"]), ["doc_id"]
        )

    def test_fingerprint(self, docs, con):
        _cmp(
            text.fingerprint(docs),
            con.sql(text.duckdb_text_sql()["fingerprint"]),
            ["doc_id"],
        )

    def test_gopher_signals_on_crafted_docs(self, spark):
        """Gopher/C4 quality signals behave as specified on documents
        built to trip each rule: bullet lists, repeated lines, ellipsis
        endings, non-alphabetic tokens, degenerate word lengths."""
        from pyspark.sql import functions as F

        rows = [
            # clean prose: passes the gate
            (1, "The cat sat on the mat today.\nIt was a fine day indeed."),
            # bullet list + duplicate lines
            (2, "- one thing\n- one thing\n- one thing\n- two thing"),
            # ellipsis endings + numbers only (alpha fails)
            (3, "123 456 789...\n987 654 321..."),
            # single repeated char words (mean word len 1)
            (4, "a a a a a a a a"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {
            r.doc_id: r
            for r in df.select(
                "doc_id", *text.gopher_cols(F.col("text"))
            ).collect()
        }
        assert out[1].gopher_ok
        assert out[1].term_punct_line_milli == 1000
        assert out[2].bullet_line_milli == 1000
        assert out[2].dup_line_milli == 500  # 4 lines, 2 distinct
        assert not out[2].gopher_ok  # dup gate
        assert out[3].ellipsis_line_milli == 1000
        assert out[3].alpha_word_milli == 0
        assert not out[3].gopher_ok
        assert out[4].mean_word_len_milli == 1000
        assert not out[4].gopher_ok  # word-length gate


class TestDedup:
    def test_ngram_jaccard(self, docs, con):
        got = dedup.ngram_jaccard_pairs(docs, tau_pct=30)
        exp = con.sql(dedup.duckdb_dedup_sql(tau_pct=30)["ngram_dedup"])
        _cmp(got, exp, ["doc_a", "doc_b"])

    def test_minhash_lsh(self, docs, con):
        got = dedup.minhash_lsh_pairs(docs, tau_pct=30)
        exp = con.sql(dedup.duckdb_dedup_sql(tau_pct=30)["minhash_dedup"])
        _cmp(got, exp, ["doc_a", "doc_b"])

    def test_ngram_short_and_empty_docs(self, spark):
        """Docs with <2 tokens (incl. empty/whitespace text) must produce
        empty bigram sets — not crash — and match the oracle exactly."""
        rows = [
            (1, ""),
            (2, "one"),
            (3, "   "),
            (4, "one two three"),
            (5, "one two three"),
            (6, "solo"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = dedup.ngram_jaccard_pairs(df, tau_pct=30)
        c = duckdb.connect()
        c.register("documents", df.toPandas())
        exp = c.sql(dedup.duckdb_dedup_sql(tau_pct=30)["ngram_dedup"])
        _cmp(got, exp, ["doc_a", "doc_b"])
        assert got.count() == 1  # only the (4, 5) identical pair

    def test_hot_shingle_df_cap(self, spark):
        """Skew fixture: every doc shares one stop bigram. With max_df below
        the corpus size the hot shingle is dropped from the join AND the
        set sizes on both engines; near-identical docs still pair up."""
        stop = "the end"
        rows = [(i, f"unique{i} word{i} {stop}") for i in range(1, 21)]
        rows += [(100, f"same same2 same3 {stop}"), (101, f"same same2 same3 {stop}")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = dedup.ngram_jaccard_pairs(df, tau_pct=60, max_df=5)
        c = duckdb.connect()
        c.register("documents", df.toPandas())
        exp = c.sql(dedup.duckdb_dedup_sql(tau_pct=60, max_df=5)["ngram_dedup"])
        _cmp(got, exp, ["doc_a", "doc_b"])
        pairs = {(r.doc_a, r.doc_b) for r in got.collect()}
        assert (100, 101) in pairs
        # the stop-bigram alone must not pair unrelated docs
        assert all(p == (100, 101) for p in pairs)

    def test_minhash_band_rows_narrow_vs_grouped(self, docs):
        """The narrow per-row band formulation (transform+aggregate fold,
        zero shuffle) must be bit-identical to the explode->groupBy
        signature path it replaced, including NULL-text row dropping."""
        from pyspark.sql import functions as F

        null_docs = docs.select("doc_id", "text").unionByName(
            docs.sparkSession.createDataFrame(
                [(999_999, None)], "doc_id long, text string"
            )
        )
        new = dedup.minhash_band_rows(null_docs, "text", "doc_id")
        sigs = dedup.minhash_signatures(null_docs, "text", "doc_id")
        rpb = dedup.MINHASH_K // dedup.MINHASH_BANDS
        old = sigs.select(
            "id",
            F.explode(
                F.array(*[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.concat_ws(
                            "_",
                            *[F.col(f"sig_{bi * rpb + j}") for j in range(rpb)],
                        ).alias("sig"),
                    )
                    for bi in range(dedup.MINHASH_BANDS)
                ])
            ).alias("bs"),
        ).select("id", "bs.band", "bs.sig")
        assert set(map(tuple, new.collect())) == set(map(tuple, old.collect()))
        # and the narrow plan really is narrow: no Exchange before Generate
        plan = new._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_minhash_hot_bucket_cap(self, spark):
        """Band buckets above max_bucket are skipped identically on both
        engines; pairs that also share a small bucket survive."""
        rows = [(i, "boiler plate text common to all docs") for i in range(1, 31)]
        rows += [(100, "rare pair of docs alpha beta"), (101, "rare pair of docs alpha beta")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = dedup.minhash_lsh_pairs(df, tau_pct=60, max_bucket=10)
        c = duckdb.connect()
        c.register("documents", df.toPandas())
        exp = c.sql(dedup.duckdb_dedup_sql(tau_pct=60, max_bucket=10)["minhash_dedup"])
        _cmp(got, exp, ["doc_a", "doc_b"])
        pairs = {(r.doc_a, r.doc_b) for r in got.collect()}
        assert (100, 101) in pairs
        # the 30 boilerplate clones live only in >10-sized buckets: skipped
        assert all(p == (100, 101) for p in pairs)

    def test_minhash_pairs_emitted_exactly_once(self, spark):
        """r5 first-uncapped-band rule: identical docs collide in ALL 4
        band buckets, so the naive band self-join emits each pair 4x —
        without a pair-stream distinct (removed in r5), only the
        exactly-once emission rule keeps the output duplicate-free."""
        rows = [(i, "same doc body alpha beta gamma") for i in range(1, 9)]
        rows += [(50, "unrelated words entirely disjoint tokens here")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = dedup.minhash_lsh_pairs(df, tau_pct=60).collect()
        pairs = [(r.doc_a, r.doc_b) for r in got]
        assert len(pairs) == len(set(pairs)) == 8 * 7 // 2
        assert all(a < b for a, b in pairs)

    def test_simhash_pairs_emitted_exactly_once(self, spark):
        """Same exactly-once invariant for the simhash band join: clones
        share all 4 band buckets (hamming 0) yet appear once per pair."""
        rows = [(i, "same doc body alpha beta gamma") for i in range(1, 9)]
        rows += [(50, "unrelated words entirely disjoint tokens here")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = dedup.simhash_pairs(df, max_hamming=3).collect()
        pairs = [(r.doc_a, r.doc_b) for r in got]
        assert len(pairs) == len(set(pairs)) == 8 * 7 // 2
        assert all(r.hamming == 0 for r in got if r.doc_a < 9 and r.doc_b < 9)

    def test_hamming_pairs_generalized_bands_vs_brute_force(self, spark):
        """hamming_pairs at an 8x8-bit split (radius up to 7) over raw
        64-bit signatures — planted near-dups at assorted distances plus
        random background — must equal the exact brute-force pair set,
        exactly once (the image-phash near-dup configuration)."""
        import numpy as np

        rng = np.random.default_rng(5)
        sigs = list(rng.integers(-(2**63), 2**63, size=120, dtype=np.int64))
        # planted: flips of 1..7 bits off sig[0] (IN at h<=6 iff <=6),
        # and an exact clone
        base = int(sigs[0])
        for k in range(1, 8):
            flipped = base
            for b in range(k):
                flipped ^= 1 << (b * 9)
            sigs.append(np.int64(flipped))
        sigs.append(np.int64(base))
        df = spark.createDataFrame(
            [(i, int(s)) for i, s in enumerate(sigs)], "id long, sig long"
        )
        got = [(r.a, r.b, r.hamming) for r in
               dedup.hamming_pairs(df, max_hamming=6, nbands=8).collect()]
        assert len(got) == len(set(got))
        exp = set()
        vals = [int(s) for s in sigs]
        for i in range(len(vals)):
            for j in range(i + 1, len(vals)):
                h = bin((vals[i] ^ vals[j]) & ((1 << 64) - 1)).count("1")
                if h <= 6:
                    exp.add((i, j, h))
        assert set(got) == exp
        assert len(exp) >= 7  # planted structure actually exercised

    def test_hamming_pairs_rejects_bad_band_split(self):
        with pytest.raises(ValueError):
            dedup.hamming_pairs(None, max_hamming=6, nbands=4)

    def test_shuffle_partitions_fallback_on_non_numeric_conf(self):
        """Managed platforms set spark.sql.shuffle.partitions='auto'
        (OSS Spark refuses the value at set-time, so a stub stands in):
        the exactly-once probes must fall back to defaultParallelism
        instead of crashing at plan-build time."""
        from jimmy_spark.session import shuffle_partitions_of

        class _Conf:
            def get(self, k):
                return "auto"

        class _SC:
            defaultParallelism = 12

        class _Spark:
            conf = _Conf()
            sparkContext = _SC()

        assert shuffle_partitions_of(_Spark()) == 12

    def test_minhash_capped_first_band_does_not_suppress_pair(
        self, spark, monkeypatch
    ):
        """The exactly-once rule must treat an earlier-band collision as
        'already emitted' ONLY if that bucket was uncapped (the ~_c{j}
        term): a pair whose band-0 bucket is capped but whose band-1
        bucket is small must be emitted exactly once at band 1, not
        dropped. Band sigs are md5-derived and cannot be steered via
        text, so the band-rows stage is stubbed; the verify stage still
        runs for real (identical texts pass any tau)."""
        n_fill = 11  # band-0 bucket size 13 > max_bucket=10
        band_rows = []
        for i in [1, 2, *range(3, 3 + n_fill)]:
            band_rows.append((i, 0, "X"))  # shared, capped
            band_rows.append((i, 1, "Y" if i in (1, 2) else f"f{i}"))
            band_rows.append((i, 2, f"b2_{i}"))
            band_rows.append((i, 3, f"b3_{i}"))
        stub = spark.createDataFrame(band_rows, "id long, band int, sig string")
        monkeypatch.setattr(dedup, "minhash_band_rows", lambda *a, **k: stub)
        docs = spark.createDataFrame(
            [(i, "alpha beta gamma") for i in [1, 2, *range(3, 3 + n_fill)]],
            "doc_id long, text string",
        )
        got = dedup.minhash_lsh_pairs(docs, tau_pct=60, max_bucket=10).collect()
        assert [(r.doc_a, r.doc_b) for r in got] == [(1, 2)]

    def test_simhash_capped_first_band_does_not_suppress_pair(
        self, spark, monkeypatch
    ):
        """Same ~_c{j} coverage for simhash_pairs, with crafted 64-bit
        sigs (bands ARE bit fields, so the signature stage is stubbed
        with exact band values): docs 1 and 2 share every band but only
        band 1's bucket is small — the pair must appear exactly once."""
        def sig_of(b0, b1, b2, b3):
            return b0 | (b1 << 16) | (b2 << 32) | (b3 << 48)

        rows = [(1, sig_of(1, 2, 3, 4)), (2, sig_of(1, 2, 3, 4))]
        rows += [
            (i, sig_of(1, 0x100 + i, 0x200 + i, 0x300 + i))
            for i in range(3, 14)  # 13 docs share band 0 -> capped at 10
        ]
        stub = spark.createDataFrame(rows, "doc_id long, simhash long")
        monkeypatch.setattr(dedup, "simhash64", lambda *a, **k: stub)
        docs = spark.createDataFrame(
            [(i, "t") for i in range(1, 14)], "doc_id long, text string"
        )
        got = dedup.simhash_pairs(docs, max_hamming=3, max_bucket=10).collect()
        assert [(r.doc_a, r.doc_b, r.hamming) for r in got] == [(1, 2, 0)]

    def test_connected_components_known_graph(self, spark):
        """Chain 1-2-3, pair 10-11, singleton 99: labels converge to the
        min id of each component in O(diameter) rounds."""
        ids = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 99)],
                                    "doc_id long")
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
        )
        got = {r.doc_id: r.cluster_id
               for r in dedup.connected_components(ids, pairs).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}

    def test_connected_components_long_chain(self, spark):
        """A 300-node path component (diameter 299): the large-star/
        small-star default converges in O(log^2 n) rounds where plain
        hash-min label propagation needs 299 and raises at its 50-round
        guard — the realistic chained-boilerplate dedup graph that used
        to abort the whole job."""
        n = 300
        ids = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
        )
        got = {r.doc_id: r.cluster_id
               for r in dedup.connected_components(ids, pairs).collect()}
        assert got == {i: 0 for i in range(n)}
        with pytest.raises(RuntimeError, match="did not converge"):
            dedup.connected_components_hashmin(ids, pairs).collect()

    def test_connected_components_vs_union_find(self, spark):
        """Differential check on a seeded random graph (plus an isolated
        star and a two-chain merge): star-contraction labels == a pure
        Python union-find over the identical edge list."""
        rng = np.random.default_rng(7)
        n = 120
        edges = {(int(a), int(b)) for a, b in rng.integers(0, n, (90, 2)) if a != b}
        edges |= {(200, 201), (201, 202), (202, 203), (50, 203)}
        parent = list(range(250))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        node_ids = sorted({x for e in edges for x in e} | {249})
        want = {}
        roots = {}
        for i in node_ids:
            r = find(i)
            roots.setdefault(r, min(j for j in node_ids if find(j) == r))
            want[i] = roots[r]
        ids = spark.createDataFrame([(i,) for i in node_ids], "doc_id long")
        pairs = spark.createDataFrame(sorted(edges), "doc_a long, doc_b long")
        got = {r.doc_id: r.cluster_id
               for r in dedup.connected_components(ids, pairs).collect()}
        assert got == want
        # and the hashmin twin agrees wherever it converges
        got2 = {r.doc_id: r.cluster_id
                for r in dedup.connected_components_hashmin(ids, pairs).collect()}
        assert got2 == want

    def test_minhash_candidates_nonempty(self, docs):
        # word-salad docs share vocabulary; LSH must find something at low tau
        assert dedup.minhash_lsh_pairs(docs, tau_pct=20).count() > 0

    def test_simhash_matches_numpy(self, docs):
        got = {r.doc_id: r.simhash for r in dedup.simhash64(docs).collect()}
        pdf = docs.select("doc_id", "text").toPandas()
        import hashlib

        for _, row in pdf.head(25).iterrows():
            toks = sorted(set(row["text"].strip().lower().split()))
            hs = np.array(
                [int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big") for t in toks],
                dtype=np.uint64,
            )
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(int)
            votes = (2 * bits - 1).sum(axis=0)
            val = np.uint64(0)
            for b in np.nonzero(votes > 0)[0]:
                val |= np.uint64(1) << np.uint64(b)
            assert got[row["doc_id"]] == np.int64(val.view(np.int64))

    def test_simhash_near_dup_property(self, spark):
        """Nearly-identical docs get hamming-close simhashes."""
        rows = [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
            (2, "alpha beta gamma delta epsilon zeta eta theta iota kappax"),
            (3, "completely different words entirely unrelated content here now"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        h = {r.doc_id: np.uint64(np.int64(r.simhash).view(np.uint64)) for r in dedup.simhash64(df).collect()}
        ham = lambda a, b: bin(int(a ^ b)).count("1")
        assert ham(h[1], h[2]) < ham(h[1], h[3])


class TestSimilarity:
    QIDS = [1, 2, 3, 4, 5]

    def test_bruteforce_matches_oracle(self, emb, con):
        got = similarity.ann_topk_bruteforce(emb, self.QIDS, k=10)
        exp = con.sql(similarity.duckdb_ann_sql(self.QIDS, k=10))
        _cmp(got, exp, ["query_id", "rank"])

    def test_lsh_recall(self, emb):
        exact = similarity.ann_topk_bruteforce(emb, self.QIDS, k=10).collect()
        approx = similarity.ann_topk_lsh(emb, self.QIDS, k=10).collect()
        e = {(r.query_id, r.vec_id) for r in exact}
        a = {(r.query_id, r.vec_id) for r in approx}
        recall = len(e & a) / len(e)
        assert recall >= 0.5, recall  # 4-bit x 8-table expected ~0.7 on random vectors

    def test_near_dup_bucketed_equals_exact_on_planted_dups(self, emb):
        """The registered scenario: rescaled-copy dups at cos 1.0 must be
        found by the LSH-bucketed path with recall exactly 1 (collinear
        vectors share every table's bucket), matching the all-pairs exact
        baseline bit for bit."""
        aug = similarity.with_rescaled_dups(emb)
        got = similarity.embedding_near_dup_pairs(aug, tau_micro=990_000)
        exp = similarity.embedding_near_dup_pairs_exact(aug, tau_micro=990_000)
        g = {(r.vec_a, r.vec_b, r.cos_r) for r in got.collect()}
        x = {(r.vec_a, r.vec_b, r.cos_r) for r in exp.collect()}
        assert g == x and len(x) == emb.count()
        assert all(c == 1.0 for _, _, c in g)

    def test_near_dup_bucketed_is_subset_of_exact(self, emb):
        """At sub-near-dup thresholds the bucketed path is a (possibly
        proper) subset of the exact pair set — never a false positive."""
        got = {
            (r.vec_a, r.vec_b, r.cos_r)
            for r in similarity.embedding_near_dup_pairs(emb, tau_micro=400_000).collect()
        }
        exp = {
            (r.vec_a, r.vec_b, r.cos_r)
            for r in similarity.embedding_near_dup_pairs_exact(emb, tau_micro=400_000).collect()
        }
        assert got <= exp
        assert all(r[0] < r[1] for r in got)

    def test_near_dup_plan_has_no_cross_join(self, emb):
        plan = (
            similarity.embedding_near_dup_pairs(emb, tau_micro=990_000)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


class TestMultimodal:
    def test_image_features(self, spark, t1_dir):
        imgs = spark.read.parquet(f"{t1_dir}/images.parquet")
        out = multimodal.image_features(imgs).cache()
        assert out.count() == imgs.count()
        assert out.filter("ok").count() == imgs.count()
        row = out.first()
        assert 0 <= row.mean_r <= 255 and row.thumb_crc != 0
        # quality ints are present and bounded on every decoded row
        import pyspark.sql.functions as SF

        bad = out.filter(
            "ok AND (sharp_e3 < 0 OR clip_e3 < 0 OR clip_e3 > 1000)"
        ).count()
        assert bad == 0
        assert out.agg(SF.max("sharp_e3")).first()[0] > 0

    def test_quality_ints_hand_computed(self):
        import numpy as np

        from jimmy_spark.operators.multimodal import _quality_ints

        # 3x3 grayscale, center luma 10, rest 0 -> one interior Laplacian
        # value L = 4*10 = 40; m = 1; var = 0 (single sample) -> sharp 0
        a = np.zeros((3, 3, 3), dtype=np.uint8)
        a[1, 1] = 10
        sharp, clip = _quality_ints(a)
        assert sharp == 0  # m*s2 - s1^2 == 1*1600 - 1600
        assert clip == (1000 * 8) // 9  # 8 of 9 pixels carry a 0 channel
        # 3x4: two interior pixels, lumas 10 and 0 under the same kernel
        # L = [4*10 - 0..., 4*0 - 10] = [40, -10]; m=2, s1=30, s2=1700
        # var*1000 = 1000*(2*1700 - 900) // 4 = 625000
        b = np.full((3, 4, 3), 100, dtype=np.uint8)
        b[1, 1] = 110  # luma 110 vs 100 background
        # interior lumas: (1,1)=110 -> L=4*110-400=40; (1,2)=100 -> L=400-10-300=... compute directly
        lum = np.full((3, 4), 100, dtype=np.int64)
        lum[1, 1] = 110
        lap = (4 * lum[1:-1, 1:-1] - lum[:-2, 1:-1] - lum[2:, 1:-1]
               - lum[1:-1, :-2] - lum[1:-1, 2:])
        m, s1, s2 = lap.size, int(lap.sum()), int((lap * lap).sum())
        sharp_b, clip_b = _quality_ints(b)
        assert sharp_b == (1000 * (m * s2 - s1 * s1)) // (m * m)
        assert clip_b == 0

    def test_quality_blur_ordering_and_constants(self):
        import numpy as np

        from jimmy_spark.operators.multimodal import _quality_ints

        # constant image: zero sharpness; clip only at the extremes
        for v, want_clip in ((128, 0), (255, 1000), (0, 1000)):
            s, c = _quality_ints(np.full((16, 16, 3), v, dtype=np.uint8))
            assert s == 0 and c == want_clip
        # checkerboard is sharper than its 3x3 box blur
        yy, xx = np.mgrid[0:32, 0:32]
        checker = ((yy + xx) % 2 * 200 + 20).astype(np.uint8)
        img = np.stack([checker] * 3, axis=2)
        blurred = sum(
            np.roll(np.roll(checker.astype(np.int64), dy, 0), dx, 1)
            for dy in (-1, 0, 1) for dx in (-1, 0, 1)
        ) // 9
        img_b = np.stack([blurred.astype(np.uint8)] * 3, axis=2)
        assert _quality_ints(img)[0] > _quality_ints(img_b)[0] > 0

    def test_audio_features(self, spark):
        from jimmy_spark.datagen import ensure_media

        d = str(ensure_media())
        aud = spark.read.parquet(f"{d}/audios.parquet")
        out = multimodal.audio_features(aud).cache()
        assert out.count() == aud.count() and out.filter("ok").count() == aud.count()
        row = out.first()
        assert row.duration_ms > 0 and 0 < row.peak <= 32768
        # duration consistency with the stored metadata
        meta = {r.media_id: (r.sample_rate, r.n_samples) for r in aud.select(
            "media_id", "sample_rate", "n_samples").collect()}
        for r in out.limit(20).collect():
            sr, ns = meta[r.media_id]
            assert (r.sample_rate, r.n_samples) == (sr, ns)
            assert r.duration_ms == ns * 1000 // sr

    def test_video_frame_sample(self, spark):
        from jimmy_spark.datagen import ensure_media

        d = str(ensure_media())
        vid = spark.read.parquet(f"{d}/videos.parquet")
        out = multimodal.video_frame_sample(vid, every_n=3).cache()
        assert out.filter("NOT ok").count() == 0
        # one row per sampled frame: ceil(n_frames / 3) per video
        import math

        exp = sum(
            math.ceil(r.n_frames / 3) for r in vid.select("n_frames").collect()
        )
        assert out.count() == exp
        assert out.filter("frame_idx % 3 != 0").count() == 0

    def test_media_error_isolation(self, spark):
        from jimmy_spark.codecs import qwav

        good = qwav.encode(np.zeros(100, dtype=np.int16), 8000)
        df = spark.createDataFrame(
            [("good", good), ("bad", b"QWAV garbage")],
            "media_id string, bytes binary",
        )
        rows = {r.media_id: r for r in multimodal.audio_features(df).collect()}
        assert rows["good"].ok and not rows["bad"].ok and rows["bad"].error


class TestFuzzy:
    def test_fuzzy_pairs_match_pure_python_oracle(self, spark, docs):
        """Exact difflib parity: the Spark blocked theta-join must equal a
        local recomputation with the same blocking keys + scorer
        (jimmy get_best_match semantics, common.py:373-400)."""
        from difflib import SequenceMatcher

        from jimmy_spark.operators import fuzzy

        got = {
            (r.doc_a, r.doc_b, r.ratio_milli)
            for r in fuzzy.fuzzy_pairs(docs, threshold=0.5).collect()
        }
        pdf = docs.select("doc_id", "lang", "text").toPandas()
        pdf["bucket"] = pdf["text"].str.strip().str.split(r"\s+").map(len) // 16
        exp = set()
        for _, g in pdf.groupby("lang"):
            rows = list(g.itertuples())
            for i in range(len(rows)):
                for j in range(len(rows)):
                    a, b = rows[i], rows[j]
                    if a.doc_id >= b.doc_id or abs(a.bucket - b.bucket) > 1:
                        continue
                    r = int(SequenceMatcher(None, a.text, b.text).ratio() * 1000)
                    if r >= 500:
                        exp.add((a.doc_id, b.doc_id, r))
        assert got == exp and len(exp) > 0

    def test_fuzzy_no_missed_pairs_vs_all_pairs(self, docs):
        """Recall check on a fixture subset: EVERY same-lang pair above
        threshold (reference all-pairs semantics, common.py:373-400) must
        be found by the overlapping-bucket blocked join."""
        from difflib import SequenceMatcher

        from jimmy_spark.operators import fuzzy

        sub = docs.orderBy("doc_id").limit(150)
        got = {
            (r.doc_a, r.doc_b)
            for r in fuzzy.fuzzy_pairs(sub, threshold=0.5).collect()
        }
        pdf = sub.select("doc_id", "lang", "text").toPandas()
        missed = []
        rows = list(pdf.itertuples())
        for i in range(len(rows)):
            for j in range(i + 1, len(rows)):
                a, b = rows[i], rows[j]
                if a.lang != b.lang:
                    continue
                lo, hi = min(a.doc_id, b.doc_id), max(a.doc_id, b.doc_id)
                if (lo, hi) in got:
                    continue
                if int(SequenceMatcher(None, a.text, b.text).ratio() * 1000) >= 500:
                    missed.append((lo, hi))
        assert missed == []

    def test_fuzzy_adjacent_bucket_pair_found(self, spark):
        """Regression for the hard bucket boundary: two near-identical docs
        whose token counts straddle a 16-token boundary must be scored."""
        from jimmy_spark.operators import fuzzy

        t15 = " ".join(f"w{i}" for i in range(15))
        t16 = " ".join(f"w{i}" for i in range(16))  # bucket 1, neighbor of 0
        df = spark.createDataFrame(
            [(1, "en", t15), (2, "en", t16)], "doc_id long, lang string, text string"
        )
        pairs = fuzzy.fuzzy_pairs(df, threshold=0.5).collect()
        assert {(r.doc_a, r.doc_b) for r in pairs} == {(1, 2)}


class TestIVF:
    QIDS = [1, 2, 3, 4, 5]

    def test_ivf_recall_and_determinism(self, emb):
        from jimmy_spark.operators import ivf, similarity

        exact = similarity.ann_topk_bruteforce(emb, self.QIDS, k=10).collect()
        a = ivf.ann_topk_ivf(emb, self.QIDS, k=10, nprobe=6).collect()
        b = ivf.ann_topk_ivf(emb, self.QIDS, k=10, nprobe=6).collect()
        ta = {(r.query_id, r.rank, r.vec_id) for r in a}
        tb = {(r.query_id, r.rank, r.vec_id) for r in b}
        assert ta == tb  # deterministic (seeded init, stable ties)
        e = {(r.query_id, r.vec_id) for r in exact}
        got = {(r.query_id, r.vec_id) for r in a}
        recall = len(e & got) / len(e)
        # nprobe=6 of 16 lists on weakly-clustered random vectors
        assert recall >= 0.35, recall

    def test_ivf_full_probe_is_exact(self, emb):
        """Probing every list degenerates to exact search."""
        from jimmy_spark.operators import ivf, similarity

        exact = similarity.ann_topk_bruteforce(emb, self.QIDS, k=10).collect()
        full = ivf.ann_topk_ivf(emb, self.QIDS, k=10, n_centroids=8, nprobe=8).collect()
        assert {(r.query_id, r.rank, r.vec_id) for r in full} == {
            (r.query_id, r.rank, r.vec_id) for r in exact
        }


class TestKMVSketch:
    def test_estimate_accuracy_and_exact_small(self, spark):
        """KMV bound: relative error ~ 1/sqrt(k-2) (~6% at k=256; assert a
        generous 20%); under k distincts the sketch IS the exact count."""
        from pyspark.sql import functions as F

        from jimmy_spark.operators import sketch

        # 10k distinct synthetic values
        vals = spark.range(10_000).select(
            F.concat(F.lit("tok"), F.col("id")).alias("v")
        )
        est = sketch.kmv_distinct(vals, "v").first()["kmv_est"]
        assert abs(est - 10_000) / 10_000 < 0.20, est

        small = spark.range(37).select(
            F.concat(F.lit("s"), F.col("id")).alias("v")
        )
        assert sketch.kmv_distinct(small, "v").first()["kmv_est"] == 37

    def test_mergeability(self, spark):
        """The k smallest of a union == merge of per-part k smallest —
        sketching halves separately and merging equals sketching all."""
        from pyspark.sql import functions as F

        from jimmy_spark.operators import sketch

        all_v = spark.range(5_000).select(
            F.concat(F.lit("m"), F.col("id")).alias("v")
        )
        h1 = all_v.filter(F.col("v") < "m25")   # lexicographic split
        h2 = all_v.filter(F.col("v") >= "m25")
        merged = h1.unionByName(h2)
        a = sketch.kmv_distinct(all_v, "v").first()
        b = sketch.kmv_distinct(merged, "v").first()
        assert a["kth_hash"] == b["kth_hash"] and a["kmv_est"] == b["kmv_est"]

    def test_nulls_ignored_and_oracle_parity(self, spark):
        """NULL inputs must not consume a limit slot (Spark orderBy is
        NULLS FIRST, DuckDB's is NULLS LAST — unfiltered they disagree on
        which k hashes survive): sketch(vals + NULLs) == sketch(vals),
        and the DuckDB oracle twin reproduces the same row exactly."""
        import duckdb
        from pyspark.sql import functions as F

        from jimmy_spark.operators import sketch

        vals = spark.range(500).select(
            F.concat(F.lit("n"), F.col("id")).alias("v")
        )
        with_nulls = vals.unionByName(
            spark.range(40).select(F.lit(None).cast("string").alias("v"))
        )
        a = sketch.kmv_distinct(vals, "v").first()
        b = sketch.kmv_distinct(with_nulls, "v").first()
        assert (a["kth_hash"], a["kmv_est"]) == (b["kth_hash"], b["kmv_est"])

        pdf = with_nulls.toPandas()  # noqa: F841 — registered below
        got = duckdb.sql(
            sketch.duckdb_kmv_sql("SELECT v FROM pdf")
        ).fetchone()
        assert got == (a["kth_hash"], a["kmv_est"])
