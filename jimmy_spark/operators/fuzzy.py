"""Fuzzy similarity join (difflib ratio) — jimmy's theta-join, scaled.

Reference: ``get_best_match`` (/root/reference/src/jimmy/common.py:373-400)
scores difflib.SequenceMatcher.ratio() against EVERY candidate title —
an O(n^2) similarity join. The Spark-native shape is *blocking key +
within-block pair generation + vectorized scorer*:

- block on cheap equality keys (here: lang + token-count bucket) so the
  quadratic blow-up is bounded per block,
- generate candidate pairs with a self-join on the block key,
- score with difflib inside an Arrow-batched pandas UDF (the scorer is
  pure Python by definition — it IS the reference semantic),
- keep pairs with ratio >= threshold.

At 10^12 scale the same shape holds with better blocking (minhash bands,
dedup.py) feeding the exact scorer; this operator keeps difflib parity for
jimmy-semantics verification (tests cross-check a pure-Python oracle).
"""

from __future__ import annotations

from difflib import SequenceMatcher

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ratio(a: str, b: str) -> float:
    return SequenceMatcher(None, a, b).ratio()


def fuzzy_pairs(
    df: DataFrame,
    threshold: float = 0.6,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
    bucket_tokens: int = 16,
) -> DataFrame:
    """Pairs (a < b) in the same block with difflib ratio >= threshold.
    Output: (doc_a, doc_b, ratio_milli int) — integer score for stable
    comparison.

    Recall contract vs the reference's all-pairs scoring: token-count
    buckets OVERLAP — each doc joins on {bucket, bucket+1} so any two docs
    within ``bucket_tokens`` tokens of each other are always scored (the
    old hard boundary silently skipped neighbors straddling it). Pairs
    differing by more than 2*bucket_tokens tokens can still be missed, but
    difflib ratio >= t requires len_min/len_max >= t/(2-t) (ratio =
    2M/(la+lb), M <= min), so with t >= 0.5 any missed pair would need
    token counts within ~3x of each other AND >32 apart — only plausible
    for very long docs, where the blocked join is the designed trade.
    The within-block pure-Python oracle in tests asserts zero missed
    pairs on the fixtures."""
    toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("t"),
        *[F.col(c) for c in block_cols],
        F.floor(toks / bucket_tokens).cast("long").alias("_bucket"),
    )
    # overlap: each side fans out to its own bucket and the next one; a
    # pair in buckets (p, p+1) meets at key p+1, (p, p) meets at BOTH p
    # and p+1 — hence the distinct on ids before scoring
    spread = base.withColumn(
        "_bkey", F.explode(F.array(F.col("_bucket"), F.col("_bucket") + 1))
    )
    a = spread.alias("a")
    b = spread.alias("b")
    cond = (F.col("a.id") < F.col("b.id")) & (
        F.col("a._bkey") == F.col("b._bkey")
    )
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    pairs = (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.col("a.t").alias("ta"),
            F.col("b.t").alias("tb"),
        )
        .distinct()
    )

    @F.pandas_udf("long")
    def score(ta: pd.Series, tb: pd.Series) -> pd.Series:
        out = np.empty(len(ta), dtype=np.int64)
        for i in range(len(ta)):
            out[i] = int(SequenceMatcher(None, ta[i], tb[i]).ratio() * 1000)
        return pd.Series(out)

    thr = int(threshold * 1000)
    return (
        pairs.withColumn("ratio_milli", score(F.col("ta"), F.col("tb")))
        .filter(F.col("ratio_milli") >= thr)
        .select("doc_a", "doc_b", "ratio_milli")
    )


def fuzzy_lev_pairs(
    df: DataFrame,
    max_dist: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    block_cols: tuple[str, ...] = ("lang",),
    prefix_len: int = 24,
) -> DataFrame:
    """Edit-distance fuzzy theta-join — the ORACLE-EXACT sibling of
    ``fuzzy_pairs``: both Spark and DuckDB ship a built-in classic
    levenshtein, so unlike the difflib scorer this join is checkable
    end-to-end by the driver's hash gate. Same blocked shape (equality
    block keys bound the quadratic), scored on a fixed-length title
    prefix entirely JVM-side, with the provable length prefilter
    ``|len_a - len_b| <= max_dist`` applied on two ints before the
    string-pair comparison (levenshtein cannot beat the length gap).

    Coarse block keys (a handful of languages) would leave the self-join
    with a handful of shuffle partitions — most of the cluster idle — so
    the join is SALTED: the a-side carries ``id % n_salt`` and the b-side
    replicates across all salts, spreading the identical pair volume over
    ``blocks x n_salt`` keys. The salt is internal; the result set is
    unchanged (and the oracle needs no mirror). Pair VOLUME within a block
    is still quadratic — at corpus scale the same verify runs behind a
    minhash/band blocker (dedup.py) exactly like the difflib twin.
    """
    n_salt = 16
    snip = F.substring(F.trim(F.col(text_col)), 1, prefix_len)
    base = df.select(
        F.col(id_col).alias("id"),
        *[F.col(c) for c in block_cols],
        snip.alias("s"),
        F.length(snip).alias("ln"),
    )
    # the probe side must be REPARTITIONED on the salt: a small input
    # arrives in one or two file splits, and a broadcast join would run
    # the whole quadratic scoring inside those splits no matter how many
    # join keys exist — the exchange is what spreads the compute
    a = (
        base.withColumn("salt", F.pmod(F.col("id"), F.lit(n_salt)))
        .repartition(n_salt * 4, "salt", F.col("id"))
        .alias("a")
    )
    b = base.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).alias("b")
    cond = (F.col("a.id") < F.col("b.id")) & (F.col("a.salt") == F.col("b.salt"))
    for c in block_cols:
        cond = cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    cond = cond & (F.abs(F.col("a.ln") - F.col("b.ln")) <= max_dist)
    return (
        a.join(b, cond)
        # thresholded levenshtein (banded O(n*d) with early exit, -1 when
        # the distance provably exceeds the bound) — most pairs in a block
        # are far apart, so the scorer bails out long before filling the
        # full O(n^2) matrix; -1 fails the <= max_dist filter, so the
        # result set is identical to the unbounded form
        .withColumn("dist", F.levenshtein(F.col("a.s"), F.col("b.s"), max_dist))
        .filter((F.col("dist") >= 0) & (F.col("dist") <= max_dist))
        .select(
            F.col("a.id").alias("doc_a"),
            F.col("b.id").alias("doc_b"),
            F.col("dist").cast("long").alias("dist"),
        )
    )
