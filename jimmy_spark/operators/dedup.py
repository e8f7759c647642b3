"""Deduplication operators for the training-data pipeline.

Jimmy's dedup semantics are content-hash equality
(Resource.__eq__ on md5, /root/reference/src/jimmy/intermediate_format.py:
123-131; order-preserving distinct via dict.fromkeys, writer.py:273,285).
Scaled up, a 10^12-row corpus needs the standard near-dup ladder:

- ``exact_dedup``          — hash groupBy (md5 / phash)
- ``ngram_jaccard_pairs``  — word-bigram shingle Jaccard >= tau, computed
  with *integer cross-multiplication* (no float threshold) so the DuckDB
  oracle is bit-exact
- ``minhash_lsh_pairs``    — 16 minhashes (md5-derived 28-bit token ids ×
  deterministic odd multipliers mod 2^61-1) in 4 bands of 4; band-equality
  candidates are then *verified* with exact Jaccard, so the final pair set
  is deterministic and SQL-checkable end to end
- ``simhash64``            — 64-bit simhash over token md5 hashes (bit-level
  ops; no SQL oracle — verified against a NumPy reference in tests)

Scale notes: the token self-joins explode on high-document-frequency
tokens; at 10^12 scale the shuffle key is the token/shingle hash. Both
standard mitigations are implemented and mirrored in the oracles:
``ngram_jaccard_pairs`` removes shingles with df > max_df (stop-shingle
rule) and ``minhash_lsh_pairs`` skips band buckets > max_bucket. minhash
bands keep candidate pairs ~linear in corpus size vs the quadratic
all-pairs join — that is the point of the ladder.
"""

from __future__ import annotations

from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from jimmy_spark.datagen.core import splitmix64
from jimmy_spark.session import shuffle_partitions_of

MINHASH_K = 16
MINHASH_BANDS = 4
MINHASH_P = (1 << 61) - 1
# Deterministic odd multipliers/offsets (< 2^32 so A*token28 < 2^60).
_H = splitmix64(np.arange(2 * MINHASH_K, dtype=np.uint64) ^ np.uint64(0xD3D0B))
MINHASH_A = [int(x | np.uint64(1)) & 0xFFFFFFFF for x in _H[:MINHASH_K]]
MINHASH_B = [int(x) & 0xFFFFFFFF for x in _H[MINHASH_K:]]


def exact_dedup(df: DataFrame, key_col: str, id_col: str = "doc_id") -> DataFrame:
    """Keep min id per content key; report duplicate counts."""
    return df.groupBy(key_col).agg(
        F.min(id_col).alias("keep_id"), F.count("*").alias("dup_cnt")
    )


# --- shared tokenization (identical in the SQL oracles) -------------------


def _tokens(text_col: str):
    return F.array_distinct(F.split(F.lower(F.trim(F.col(text_col))), r"\s+"))


def _bigrams(text_col: str):
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    # guard <2 tokens: sequence(0, -1) would yield [0, -1] (descending) and
    # element_at(toks, 0) throws; the oracle's generate_series(1, len-1)
    # is empty there, so emit an empty bigram list to match
    idx = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(0), F.size(toks) - 2)
    ).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(
            idx,
            lambda i: F.concat_ws(" ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)),
        )
    )


DEFAULT_MAX_DF = 1000


def ngram_jaccard_pairs(
    df: DataFrame,
    tau_pct: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int = DEFAULT_MAX_DF,
) -> DataFrame:
    """Pairs (a < b) with word-bigram Jaccard >= tau_pct/100 over the
    *df-capped* shingle sets: shingles appearing in more than ``max_df``
    documents are stop-shingles and removed from every document's set
    (both from the self-join AND from the set sizes, so the Jaccard stays
    self-consistent). Without the cap one hot bigram ("of the" at 10^12
    docs) makes a single join key quadratic; with it the worst key fans
    out at most max_df^2. The DuckDB oracle applies the identical rule.

    Threshold test is ``100*common >= tau_pct*(na+nb-common)`` — integers
    only. Output carries (common, union_cnt) for auditability.
    """
    from pyspark.sql import Window

    sh_all = df.select(
        F.col(id_col).alias("id"), F.explode(_bigrams(text_col)).alias("s")
    )
    # document frequency per shingle via a single shuffle on s (the same
    # key the self-join below shuffles on); rows from stop-shingles die
    # before ever fanning out
    sh = sh_all.withColumn(
        "_df", F.count("*").over(Window.partitionBy("s"))
    ).filter(F.col("_df") <= max_df).drop("_df")
    sizes = sh.groupBy("id").agg(F.count("*").alias("nsh"))
    # merge-hint: both self-join sides consume the df-window's
    # hashpartitioning(s) and share one materialized shuffle stage
    # instead of re-exploding the corpus behind a BroadcastExchange.
    # (minhash/simhash moved to exactly-once broadcast probes in r5;
    # here the pair multiplicity IS the intersection count the groupBy
    # below aggregates, so the shared-shuffle SMJ remains the right
    # shape — there is nothing to deduplicate away.)
    a = sh.hint("merge").alias("a")
    b = sh.hint("merge").alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("id").alias("doc_a"), F.col("nsh").alias("na"))
    sb = sizes.select(F.col("id").alias("doc_b"), F.col("nsh").alias("nb"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("union_cnt", F.col("na") + F.col("nb") - F.col("common"))
        .filter(F.lit(100) * F.col("common") >= F.lit(tau_pct) * F.col("union_cnt"))
        .select("doc_a", "doc_b", "common", "union_cnt")
    )


# --- minhash + LSH --------------------------------------------------------


def _token28(col):
    return F.conv(F.substring(F.md5(col), 1, 7), 16, 10).cast("long")


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sig_0..sig_{K-1}) — min over tokens of (A_i*tok28+B_i) % P."""
    tok = df.select(
        F.col(id_col).alias("id"), F.explode(_tokens(text_col)).alias("t")
    ).withColumn("t28", _token28(F.col("t")))
    aggs = [
        F.min((F.lit(MINHASH_A[i]) * F.col("t28") + F.lit(MINHASH_B[i])) % F.lit(MINHASH_P)).alias(f"sig_{i}")
        for i in range(MINHASH_K)
    ]
    return tok.groupBy("id").agg(*aggs)


def minhash_band_rows(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, band, sig) LSH band rows via a NARROW per-row plan — zero
    shuffle. ``minhash_signatures`` explodes (doc, token) rows and
    groupBys them back, which shuffles the entire tokenized corpus just
    to compute per-doc mins; at 10^12 docs that shuffle is the largest
    in the dedup ladder and it carries no information that doesn't
    already live on the row. Here the whole signature+banding stage is
    ONE expression per row, so Catalyst evaluates the md5 token hashes
    exactly once (no projection-collapse re-inlining):

    - ``transform(tokens, md5->28bit)`` — token hash array, one md5/token
    - ``aggregate(t28s, [P]*16, least fold via zip_with)`` — all 16
      min-hashes in a single pass over the array
    - ``transform(sequence(0,3), slice+array_join)`` — the 4 band structs

    Values are bit-identical to ``minhash_signatures`` (same integer
    arithmetic, min over the same distinct token set; init=P dominates
    every residue). Docs with NULL text vanish in both formulations
    (explode(null) drops the row / aggregate(null) -> null bands ->
    explode(null) drops the row)."""
    rows_per_band = MINHASH_K // MINHASH_BANDS
    arr_a = F.array(*[F.lit(a).cast("long") for a in MINHASH_A])
    arr_b = F.array(*[F.lit(b).cast("long") for b in MINHASH_B])
    t28s = F.transform(_tokens(text_col), _token28)
    sig_arr = F.aggregate(
        t28s,
        F.array(*[F.lit(MINHASH_P).cast("long")] * MINHASH_K),
        lambda acc, x: F.zip_with(
            acc,
            F.sequence(F.lit(1), F.lit(MINHASH_K)),
            lambda cur, i: F.least(
                cur,
                (F.element_at(arr_a, i.cast("int")) * x
                 + F.element_at(arr_b, i.cast("int"))) % F.lit(MINHASH_P),
            ),
        ),
    )
    bands_arr = F.transform(
        F.sequence(F.lit(0), F.lit(MINHASH_BANDS - 1)),
        lambda bi: F.struct(
            bi.cast("int").alias("band"),
            F.array_join(
                F.transform(
                    F.slice(sig_arr, bi.cast("int") * rows_per_band + 1, rows_per_band),
                    lambda s: s.cast("string"),
                ),
                "_",
            ).alias("sig"),
        ),
    )
    # NULL text: the outer transform runs over a CONSTANT sequence(0,3),
    # so a null sig_arr alone would still emit 4 rows (with null sigs) —
    # gate the generator itself so explode(null) drops the row, matching
    # the explode->groupBy formulation.
    gated = F.when(F.col(text_col).isNotNull(), bands_arr)
    return (
        df.select(F.col(id_col).alias("id"), F.explode(gated).alias("bs"))
        .select("id", "bs.band", "bs.sig")
    )


DEFAULT_MAX_BUCKET = 10_000


def minhash_lsh_pairs(
    df: DataFrame,
    tau_pct: int = 60,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """LSH candidates (band equality on 4 bands of 4 sigs) verified with
    exact token-set Jaccard >= tau_pct/100. Deterministic output.

    Band buckets larger than ``max_bucket`` are skipped before the
    self-join (standard LSH hot-bucket control: one boilerplate signature
    shared by 10^6 docs would otherwise fan out 10^12 candidate rows).
    A pair living ONLY in skipped buckets is not emitted; the DuckDB
    oracle applies the identical deterministic rule, so parity holds.
    Band rows come from ``minhash_band_rows`` — a narrow per-row plan,
    so the first shuffle in the whole operator is the bucket-count
    window on (band, sig), not a tokenized-corpus groupBy.

    EXACTLY-ONCE candidate emission (no ``distinct``): near-identical
    docs collide on MANY bands, so the naive band self-join emits each
    pair once per shared bucket and needs a ``distinct()`` — a shuffle
    of the raw pair stream, which on a dup-heavy corpus is the largest
    exchange in the operator (measured 31M pre-distinct rows for 7.8M
    pairs at sf0.1). Instead each band row carries ALL of its doc's
    band sigs + capped bits as FLAT columns (MINHASH_BANDS is a small
    compile-time constant, so the no-earlier-collision predicate unrolls
    into plain codegen-able comparisons — no arrays, no higher-order
    functions, which an earlier attempt showed cost more per joined row
    than the distinct they replace), and a joined pair survives only at
    the FIRST band where the two docs collide in an uncapped bucket.
    Any earlier collision is provably the same bucket on both sides
    (equal sigs => same bucket => same capped bit), so the predicate is
    decidable row-locally and the raw pair stream never shuffles. The
    pair set is identical to the join+distinct formulation.

    Above the broadcast threshold the self-join falls back to SMJ keyed
    on (band, sig) — the round-robin probe spreading then no longer
    applies (a giant near-dup cluster's pairs, concentrated on band 0 by
    the first-band rule, land on the task owning that bucket). That
    fallback is still bounded BY THE SAME CAP that bounds the oracle:
    an uncapped bucket has <= max_bucket rows, so no task emits more
    than ~max_bucket^2/2 pairs per bucket (~5e7 at the default cap) —
    heavy but fixed, independent of corpus size, and no worse than the
    old join+distinct plan whose per-bucket emission was identical.
    (In that regime the round-robin exchange is an accepted overhead:
    one extra narrow O(docs) shuffle under the SMJ's keyed exchanges —
    whether the frame will broadcast is not knowable at plan time.)"""
    bands = minhash_band_rows(df, text_col, id_col)
    from pyspark.sql import Window

    annotated = bands.withColumn(
        "capped",
        F.count("*").over(Window.partitionBy("band", "sig")) > max_bucket,
    )
    # flat per-doc layout: one row per doc with s0..s3 / c0..c3 (band is
    # unique per doc, so max(when(band=i, ...)) picks the single value);
    # re-explode only the UNCAPPED bands for the join. All frames here
    # are O(docs) narrow rows — the O(candidate-multiplicity) distinct
    # shuffle this replaces was the expensive part.
    perdoc = annotated.groupBy("id").agg(
        *[
            F.max(F.when(F.col("band") == i, F.col("sig"))).alias(f"_s{i}")
            for i in range(MINHASH_BANDS)
        ],
        *[
            F.max(F.when(F.col("band") == i, F.col("capped"))).alias(f"_c{i}")
            for i in range(MINHASH_BANDS)
        ],
    )
    sig_by_band = F.coalesce(
        *[
            F.when(F.col("band") == i, F.col(f"_s{i}"))
            for i in range(MINHASH_BANDS)
        ]
    )
    capped_by_band = F.coalesce(
        *[
            F.when(F.col("band") == i, F.col(f"_c{i}"))
            for i in range(MINHASH_BANDS)
        ]
    )
    # ROUND-ROBIN repartition of the probe side: the per-doc frame is
    # tiny (O(docs) rows), so AQE coalesces its shuffle to one partition
    # — and because every join downstream of here is a broadcast join,
    # that one task would emit all 31M candidate pairs AND run the whole
    # exact-verify chain serially (measured: >400s at sf0.1). A probe row
    # in a bucket of size k emits only its own <k matches, so row-level
    # round-robin spreads the emission work evenly EVEN under one giant
    # near-dup cluster (where first-band-wins concentrates every pair on
    # band 0 — keyed repartitioning by (band, sig) would put all of them
    # on one task). Explicit numPartitions pins the fan-out against AQE.
    shuf = shuffle_partitions_of(df.sparkSession)
    rows = (
        perdoc.withColumn(
            "band",
            F.explode(F.sequence(F.lit(0), F.lit(MINHASH_BANDS - 1))),
        )
        .withColumn("sig", sig_by_band)
        .filter(~capped_by_band)
        .repartition(shuf)
    )
    a, b = rows.alias("a"), rows.alias("b")
    # a pair already emitted at an earlier band j < band collided in an
    # uncapped bucket there; kill it here (unrolled, codegen-able)
    earlier_clash = reduce(
        lambda acc, j: acc
        | (
            (F.col("a.band") > j)
            & (F.col(f"a._s{j}") == F.col(f"b._s{j}"))
            & ~F.col(f"a._c{j}")
        ),
        range(MINHASH_BANDS - 1),
        F.lit(False),
    )
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(~earlier_clash)
        .select(F.col("a.id").alias("doc_a"), F.col("b.id").alias("doc_b"))
    )
    # exact verification on candidates only — but first the standard SIZE
    # prefilter: Jaccard >= tau implies 100*min(na,nb) >= tau*max(na,nb)
    # (common <= min, union >= max), so impossible pairs die on a join of
    # two ints BEFORE the full token arrays ever ride a shuffle. The
    # filter is a provable consequence of the final predicate — it never
    # changes the result set, it only keeps arrays off doomed pairs.
    sizes = df.select(
        F.col(id_col).alias("id"), F.size(_tokens(text_col)).alias("n")
    )
    na = sizes.select(F.col("id").alias("doc_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col("id").alias("doc_b"), F.col("n").alias("nb"))
    cand = (
        cand.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(
            F.lit(100) * F.least("na", "nb") >= F.lit(tau_pct) * F.greatest("na", "nb")
        )
    )
    tok = df.select(F.col(id_col).alias("id"), _tokens(text_col).alias("ts"))
    ta = tok.select(F.col("id").alias("doc_a"), F.col("ts").alias("ts_a"))
    tb = tok.select(F.col("id").alias("doc_b"), F.col("ts").alias("ts_b"))
    j = (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("common", F.size(F.array_intersect("ts_a", "ts_b")))
        .withColumn("union_cnt", F.col("na") + F.col("nb") - F.col("common"))
        .filter(F.lit(100) * F.col("common") >= F.lit(tau_pct) * F.col("union_cnt"))
    )
    return j.select("doc_a", "doc_b", "common", "union_cnt")


def simhash_col(text_col: str = "text"):
    """64-bit simhash as a COLUMN expression (composable into a wider
    projection without a self-join — one scan, one Arrow crossing),
    vectorized across the whole batch: md5 runs once per UNIQUE token in
    the batch (np.unique inverse mapping — corpora share vocabulary, so
    this collapses the hash work), bit extraction is one (tokens x 64)
    matrix, and the per-doc majority vote is a segment sum
    (np.add.reduceat). No per-row Python loop. Semantics identical to the
    bit-level DuckDB oracle (md5[:8] big-endian, majority vote,
    signed-int64 wrap)."""

    @F.pandas_udf("long")
    def sh(tokens: pd.Series) -> pd.Series:
        import hashlib

        n = len(tokens)
        out = np.zeros(n, dtype=np.int64)
        lists = [t if t is not None else [] for t in tokens]
        counts = np.array([len(t) for t in lists], dtype=np.int64)
        nz = np.nonzero(counts)[0]
        if len(nz) == 0:
            return pd.Series(out)
        flat = np.array(
            [tok for i in nz for tok in lists[i]], dtype=object
        )
        uniq, inv = np.unique(flat, return_inverse=True)
        h_uniq = np.array(
            [
                int.from_bytes(hashlib.md5(t.encode()).digest()[:8], "big")
                for t in uniq
            ],
            dtype=np.uint64,
        )
        hs = h_uniq[inv]
        bits = (
            (hs[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
        ).astype(np.int64)
        offsets = np.zeros(len(nz), dtype=np.int64)
        np.cumsum(counts[nz][:-1], out=offsets[1:])
        ones = np.add.reduceat(bits, offsets, axis=0)  # (docs, 64)
        votes = 2 * ones - counts[nz][:, None]
        vals = (
            (votes > 0).astype(np.uint64) << np.arange(64, dtype=np.uint64)
        ).sum(axis=1, dtype=np.uint64)
        out[nz] = vals.view(np.int64)
        return pd.Series(out)

    return sh(_tokens(text_col)).alias("simhash")


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, simhash) frame view of ``simhash_col``."""
    return df.select(F.col(id_col), simhash_col(text_col))


def hamming_pairs(
    sigs: DataFrame,
    max_hamming: int = 3,
    id_col: str = "id",
    sig_col: str = "sig",
    max_bucket: int = DEFAULT_MAX_BUCKET,
    nbands: int | None = None,
) -> DataFrame:
    """Near-dup pairs (a < b, hamming) over ANY 64-bit signature column —
    text simhash (``simhash_pairs``) or image perceptual hash — via band
    LSH: by pigeonhole, a pair within hamming ``nbands - 1`` of an
    ``nbands``-way split shares at least one full band, so band-equality
    candidates have recall 1 for the target radius. Verification is one
    JVM expression (bit_count(xor)); buckets above ``max_bucket`` are
    skipped exactly like minhash (rule mirrored in the oracle).

    ``nbands`` defaults to the smallest 64-divisor > max_hamming; wider
    radii mean narrower bands and denser buckets (8-bit bands spread
    over only 256 values — the max_bucket cap is what bounds a hot
    bucket's quadratic cost there).

    Scale: the only shuffle keys are (band index, band value); the
    64-bit signature rides as one long.

    EXACTLY-ONCE candidate emission (no ``distinct``), the minhash
    pattern: near-identical signatures collide on several bands, so the
    naive band self-join emits each pair once per shared bucket and
    needs a pair-stream distinct. Here every band row already carries
    the FULL 64-bit sig, so the earlier bands' values are derivable
    row-locally by the same shift+mask — only the per-band capped bits
    need carrying (equal band values => same bucket => same capped bit
    on both sides, so one side's bit decides). A joined pair survives
    only at the first band where it collides in an uncapped bucket; the
    raw pair stream never shuffles, and the hamming cut runs where the
    pair is born. The probe side is ROUND-ROBIN repartitioned: AQE
    coalesces the tiny O(rows) frame to one partition and every join
    downstream is broadcast, so one task would otherwise emit every
    candidate serially; row-level spreading also balances giant
    near-dup clusters whose pairs all land on band 0 (see
    minhash_lsh_pairs)."""
    from pyspark.sql import Window

    if nbands is None:
        nbands = next(b for b in (1, 2, 4, 8, 16, 32, 64) if b > max_hamming)
    if 64 % nbands or nbands <= max_hamming:
        raise ValueError(f"nbands {nbands} must divide 64 and exceed max_hamming")
    width = 64 // nbands
    mask = (1 << width) - 1
    sigs = sigs.select(F.col(id_col).alias("id"), F.col(sig_col).alias("sig"))

    def _bv(col, bi):
        # mask AFTER the shift: & mask keeps exactly bits
        # [width*bi, width*(bi+1)) whether the shift is arithmetic
        # (Spark, DuckDB) or logical — sign-fill bits land above the mask
        return F.shiftright(col, width * bi).bitwiseAND(F.lit(mask))

    bands = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        _bv(F.col("sig"), bi).alias("bv"),
                    )
                    for bi in range(nbands)
                ]
            )
        ).alias("bs"),
    ).select("id", "sig", "bs.band", "bs.bv")
    annotated = bands.withColumn(
        "capped",
        F.count("*").over(Window.partitionBy("band", "bv")) > max_bucket,
    )
    # back to one flat row per doc (sig + nbands capped bits), then
    # re-explode the uncapped bands; both frames are O(rows) narrow rows
    perdoc = annotated.groupBy("id").agg(
        F.first("sig").alias("sig"),
        *[
            F.max(F.when(F.col("band") == i, F.col("capped"))).alias(f"_c{i}")
            for i in range(nbands)
        ],
    )
    shuf = shuffle_partitions_of(sigs.sparkSession)
    rows = (
        perdoc.withColumn("band", F.explode(F.sequence(F.lit(0), F.lit(nbands - 1))))
        .withColumn(
            "bv",
            F.coalesce(
                *[
                    F.when(F.col("band") == i, _bv(F.col("sig"), i))
                    for i in range(nbands)
                ]
            ),
        )
        .filter(
            ~F.coalesce(
                *[
                    F.when(F.col("band") == i, F.col(f"_c{i}"))
                    for i in range(nbands)
                ]
            )
        )
        .repartition(shuf)
    )
    a, b = rows.alias("a"), rows.alias("b")
    earlier_clash = reduce(
        lambda acc, j: acc
        | (
            (F.col("a.band") > j)
            & (_bv(F.col("a.sig"), j) == _bv(F.col("b.sig"), j))
            & ~F.col(f"a._c{j}")
        ),
        range(nbands - 1),
        F.lit(False),
    )
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .filter(~earlier_clash)
        .select(
            F.col("a.id").alias("a"),
            F.col("b.id").alias("b"),
            F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs.select("a", "b", F.col("hamming").cast("long").alias("hamming"))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> DataFrame:
    """Near-dup pairs (a < b) with simhash hamming distance <= max_hamming
    — ``hamming_pairs`` over the text simhash at the classic 4x16-bit
    split (recall 1 for hamming <= 3). Completes the dedup ladder:
    exact -> ngram -> minhash -> simhash pairs -> clustering."""
    sigs = simhash64(df, text_col, id_col).select(
        F.col(id_col).alias("id"), F.col("simhash").alias("sig")
    )
    out = hamming_pairs(
        sigs, max_hamming=max_hamming, max_bucket=max_bucket, nbands=4
    )
    return out.select(
        F.col("a").alias("doc_a"), F.col("b").alias("doc_b"), "hamming"
    )


# --- duplicate clustering (connected components) ---------------------------


def connected_components(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 100,
) -> DataFrame:
    """(id, cluster_id) where cluster_id = min doc id reachable through the
    near-dup pair graph — the step that turns pair streams (minhash/ngram/
    simhash/embedding) into dedup groups.

    Alternating large-star/small-star (the public CC-in-MapReduce
    algorithm, Kiveris et al. 2014): each round contracts every node's
    larger neighbors onto its local minimum (large-star), then hangs all
    smaller neighbors plus the node itself off that minimum (small-star).
    The edge set converges to per-component stars centered at the
    component minimum in O(log^2 n) rounds REGARDLESS of graph diameter —
    a 10^9-node chain of boilerplate near-dups finishes in ~30 rounds
    where plain label propagation needs 10^9. Skewed components are fine:
    a hot node's edges shrink monotonically toward the star.

    Each round is two groupBy-min + join stages on (node) — the same
    shuffle key both phases — with lineage truncated per round
    (localCheckpoint) so the plan does not grow with iterations.
    Convergence is detected EXACTLY (anti-join edge-set equality over a
    full round), not via a hashed fingerprint.

    ``connected_components_hashmin`` below is the older
    O(diameter)-rounds label propagation, kept for differential testing:
    both must produce identical labels wherever hashmin converges.
    """
    e = (
        pairs.select(
            F.col(a_col).cast("long").alias("x"), F.col(b_col).cast("long").alias("y")
        )
        .filter(F.col("x") != F.col("y"))
        .select(F.greatest("x", "y").alias("hi"), F.least("x", "y").alias("lo"))
        .distinct()
        .localCheckpoint()
    )
    converged = e.isEmpty()  # edgeless graph: all singletons, nothing to do
    for _ in range(max_iter):
        if converged:
            break
        prev = e
        prev_cnt = prev.count()
        # large-star: for every node, connect each LARGER neighbor to the
        # min of (self + neighborhood). Edges (v>u) become (v, m(u)) with
        # m(u) <= u < v, so no self-loops and the component stays connected.
        sym = e.select(F.col("hi").alias("node"), F.col("lo").alias("nbr")).unionByName(
            e.select(F.col("lo").alias("node"), F.col("hi").alias("nbr"))
        )
        lmins = (
            sym.groupBy("node")
            .agg(F.min("nbr").alias("mn"))
            .select("node", F.least("mn", F.col("node")).alias("m"))
        )
        e = (
            sym.join(lmins, "node")
            .filter(F.col("nbr") > F.col("node"))
            .select(F.col("nbr").alias("hi"), F.col("m").alias("lo"))
            .distinct()
            .localCheckpoint()
        )
        # small-star: direct edges larger->smaller; hang every smaller
        # neighbor AND the node itself off the minimum neighbor.
        d = e.select(F.col("hi").alias("node"), F.col("lo").alias("nbr"))
        smins = d.groupBy("node").agg(F.min("nbr").alias("m"))
        e = (
            d.join(smins, "node")
            .select(F.col("nbr").alias("a"), F.col("m").alias("b"))
            .unionByName(smins.select(F.col("node").alias("a"), F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .select(F.greatest("a", "b").alias("hi"), F.least("a", "b").alias("lo"))
            .distinct()
            .localCheckpoint()
        )
        # exact fixpoint test: both sets are distinct, so equal counts +
        # empty anti-join  <=>  identical edge sets over the full round
        converged = e.count() == prev_cnt and e.join(
            prev, ["hi", "lo"], "left_anti"
        ).isEmpty()
    if not converged:
        # returning a non-fixpoint edge set would ship WRONG dedup groups;
        # unreachable in practice (rounds needed ~ O(log^2 n))
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
        )
    # at the fixpoint every component is a star (hi -> component min = lo);
    # min() is a no-op safety net, singletons label themselves
    stars = e.groupBy("hi").agg(F.min("lo").alias("_cluster"))
    out = (
        ids.select(F.col(id_col).alias("id"))
        .join(stars, F.col("id") == F.col("hi"), "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("_cluster", F.col("id").cast("long")).alias("cluster_id"),
        )
    )
    return out


def connected_components_hashmin(
    ids: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """Iterative hash-min label propagation: each round every node takes the
    min of its own label and its neighbors' labels; converges in
    O(graph diameter) rounds — which is why ``connected_components`` above
    (diameter-independent) is the default. Labels only decrease, so
    sum(label) is a strictly decreasing convergence metric — no row-level
    diff join needed. Lineage is truncated per round (localCheckpoint) so
    the plan does not grow with iterations. Raises past max_iter rounds
    (a >50-diameter chain component); kept as the differential twin.
    """
    labels = ids.select(
        F.col(id_col).alias("id"), F.col(id_col).cast("long").alias("label")
    ).localCheckpoint()
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .persist()
    )
    prev_sum = labels.agg(F.sum("label")).first()[0]
    converged = False
    for _ in range(max_iter):
        nbr = (
            edges.join(labels, edges.src == labels.id)
            .groupBy("dst")
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(nbr, labels.id == nbr.dst, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nbr_label", F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("label")).first()[0]
        if cur_sum == prev_sum:
            converged = True
            break
        prev_sum = cur_sum
    edges.unpersist()
    if not converged:
        # returning partial labels would silently ship WRONG dedup groups
        # (and break the recursive-CTE oracle); a >max_iter-diameter
        # component needs the large-star/small-star default instead
        raise RuntimeError(
            f"connected_components_hashmin did not converge in {max_iter} "
            "rounds (component diameter exceeds max_iter); use "
            "connected_components (large-star/small-star)"
        )
    return labels.select(F.col("id").alias(id_col), F.col("label").alias("cluster_id"))


def duckdb_components_sql(pairs_sql: str, table: str = "documents") -> str:
    """Recursive-CTE oracle: min reachable id per node over the same pair
    graph (edges both directions; singletons keep their own id)."""
    return f"""
WITH RECURSIVE
pairs AS ({pairs_sql}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
reach(id, r) AS (
  SELECT doc_id, doc_id FROM {table}
  UNION
  SELECT e.dst, reach.r FROM reach JOIN edges e ON e.src = reach.id
)
SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
"""


# --- DuckDB oracles -------------------------------------------------------


def duckdb_dedup_sql(
    table: str = "documents",
    tau_pct: int = 60,
    max_df: int = DEFAULT_MAX_DF,
    max_bucket: int = DEFAULT_MAX_BUCKET,
) -> dict[str, str]:
    toks = "list_distinct(string_split_regex(lower(trim(text)), '\\s+'))"
    raw = "string_split_regex(lower(trim(text)), '\\s+')"
    bigr = (
        f"list_distinct(list_transform(generate_series(1, len({raw}) - 1), "
        f"i -> {raw}[i] || ' ' || {raw}[i + 1]))"
    )
    t28 = "('0x' || substring(md5(t), 1, 7))::BIGINT"
    sig_exprs = ", ".join(
        f"min(({MINHASH_A[i]} * {t28} + {MINHASH_B[i]}) % {MINHASH_P}) AS sig_{i}"
        for i in range(MINHASH_K)
    )
    rows_per_band = MINHASH_K // MINHASH_BANDS
    band_selects = " UNION ALL ".join(
        f"SELECT id, {bi} AS band, "
        + " || '_' || ".join(
            f"sig_{bi * rows_per_band + j}::VARCHAR" for j in range(rows_per_band)
        )
        + " AS sig FROM sigs"
        for bi in range(MINHASH_BANDS)
    )
    return {
        "ngram_dedup": f"""
WITH sh_all AS (SELECT doc_id AS id, unnest({bigr}) AS s FROM {table}),
sh AS (
  SELECT id, s FROM (
    SELECT id, s, count(*) OVER (PARTITION BY s) AS df FROM sh_all
  ) WHERE df <= {max_df}
),
sizes AS (SELECT id, count(*) AS nsh FROM sh GROUP BY id),
common AS (
  SELECT a.id AS doc_a, b.id AS doc_b, count(*) AS common
  FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id
  GROUP BY a.id, b.id
)
SELECT doc_a, doc_b, common, (na + nb - common) AS union_cnt
FROM common
JOIN (SELECT id AS doc_a, nsh AS na FROM sizes) USING (doc_a)
JOIN (SELECT id AS doc_b, nsh AS nb FROM sizes) USING (doc_b)
WHERE 100 * common >= {tau_pct} * (na + nb - common)
""",
        "minhash_dedup": f"""
WITH tok AS (
  SELECT doc_id AS id, unnest({toks}) AS t FROM {table}
),
sigs AS (SELECT id, {sig_exprs} FROM tok GROUP BY id),
bands_all AS ({band_selects}),
bands AS (
  SELECT id, band, sig FROM (
    SELECT id, band, sig, count(*) OVER (PARTITION BY band, sig) AS bs
    FROM bands_all
  ) WHERE bs <= {max_bucket}
),
cand0 AS (
  SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.sig = b.sig AND a.id < b.id
),
sizes AS (SELECT doc_id AS id, len({toks}) AS n FROM {table}),
-- size prefilter mirrored from the Spark side; implied by the final
-- Jaccard predicate, so the result set is unchanged
cand AS (
  SELECT c.doc_a, c.doc_b, sa.n AS na, sb.n AS nb
  FROM cand0 c JOIN sizes sa ON sa.id = c.doc_a JOIN sizes sb ON sb.id = c.doc_b
  WHERE 100 * least(sa.n, sb.n) >= {tau_pct} * greatest(sa.n, sb.n)
),
tsets AS (SELECT doc_id AS id, {toks} AS ts FROM {table})
SELECT c.doc_a, c.doc_b,
       len(list_intersect(ta.ts, tb.ts)) AS common,
       (c.na + c.nb - len(list_intersect(ta.ts, tb.ts))) AS union_cnt
FROM cand c
JOIN tsets ta ON ta.id = c.doc_a
JOIN tsets tb ON tb.id = c.doc_b
WHERE 100 * len(list_intersect(ta.ts, tb.ts))
      >= {tau_pct} * (c.na + c.nb - len(list_intersect(ta.ts, tb.ts)))
""",
    }
