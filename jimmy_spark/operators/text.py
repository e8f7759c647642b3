"""Text-analysis operators for the training-data pipeline.

Caption/document analogues of jimmy's densest layer — the per-record string
kernels of SURVEY §2.7 (safe_path, tag normalization, markdown header ids,
inline-tag extraction ...) re-expressed as JVM-side column expressions.
Everything here is built-ins only (split/regexp/md5/size/filter) — no
Python in the hot path, and each op has an exact DuckDB oracle.

Ops:
- token_count      — whitespace tokenization + a regex word-ish count
- quality_score    — length / punctuation / uppercase / stopword ratios
- lang_id          — stopword-hit heuristic over a fixed 3-language table
- fingerprint      — md5 content fingerprint (jimmy md5_hash,
                     /root/reference/src/jimmy/common.py:346-350) plus a
                     16-shingle minhash-style signature (see dedup.py)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Fixed stopword tables (deterministic; shared verbatim with the SQL oracle).
STOPWORDS = {
    "en": ("the", "a", "and", "of", "to", "is", "in", "it"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "mit"),
    "fr": ("le", "la", "et", "est", "un", "une", "des", "dans"),
}
PUNCT_CLASS = "[.,;:!?]"


def tokens_col(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    t = F.col(text_col)
    return df.select(
        id_col,
        F.size(tokens_col(t)).alias("n_tokens"),
        F.length(t).alias("n_chars_exact"),
        F.size(F.filter(tokens_col(t), lambda w: F.length(w) >= 4)).alias(
            "n_long_tokens"
        ),
    )


def _stopword_hits(t: Column, words: tuple[str, ...]) -> Column:
    toks = F.split(F.lower(F.trim(t)), r"\s+")
    return F.size(F.filter(toks, lambda w: w.isin(*words)))


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Integer sub-metrics (exact) + a derived milli-score (integer math so
    the oracle is bit-exact — no float ratios)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = F.size(tokens_col(t))
    punct = n_chars - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    upper = n_chars - F.length(F.regexp_replace(t, "[A-Z]", ""))
    stop = _stopword_hits(t, STOPWORDS["en"])
    # score_milli: integer floor-division only (DuckDB ::BIGINT on a double
    # ROUNDS while Spark cast TRUNCATES — avoid the trap entirely).
    score = (
        F.floor(F.lit(1000) * stop / F.greatest(n_tokens, F.lit(1)))
        - F.floor(F.lit(50) * punct / F.greatest(n_chars, F.lit(1)))
    ).cast("long")
    return df.select(
        id_col,
        n_chars.alias("n_chars_exact"),
        n_tokens.alias("n_tokens"),
        punct.alias("n_punct"),
        upper.alias("n_upper"),
        stop.alias("n_stop_en"),
        score.alias("score_milli"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic stopword-hit argmax with fixed precedence en>de>fr."""
    t = F.col(text_col)
    en = _stopword_hits(t, STOPWORDS["en"])
    de = _stopword_hits(t, STOPWORDS["de"])
    fr = _stopword_hits(t, STOPWORDS["fr"])
    pred = (
        F.when((en >= de) & (en >= fr) & (en > 0), "en")
        .when((de >= fr) & (de > 0), "de")
        .when(fr > 0, "fr")
        .otherwise("unknown")
    )
    return df.select(id_col, en.alias("hits_en"), de.alias("hits_de"),
                     fr.alias("hits_fr"), pred.alias("lang_pred"))


def fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """md5 content fingerprint + 60-bit integer prefix (join-friendly).

    ``keep`` carries extra source columns through the projection so callers
    that need them alongside the fingerprint (e.g. the dedup job's prep
    stage keeping ``text`` for the pair stage) never have to join them back
    on — the fingerprint is a pure per-row function of the text."""
    t = F.col(text_col)
    h = F.md5(t)
    return df.select(
        id_col,
        *keep,
        h.alias("md5"),
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long").alias("fp60"),
    )


def duckdb_text_sql(table: str = "documents") -> dict[str, str]:
    """Exact oracles, same expression semantics."""
    en = "', '".join(STOPWORDS["en"])
    de = "', '".join(STOPWORDS["de"])
    fr = "', '".join(STOPWORDS["fr"])
    toks = "string_split_regex(trim(text), '\\s+')"
    ltoks = "string_split_regex(lower(trim(text)), '\\s+')"
    hits = lambda ws: f"len(list_filter({ltoks}, w -> w IN ('{ws}')))"
    return {
        "token_count": (
            f"SELECT doc_id, len({toks}) AS n_tokens, length(text) AS n_chars_exact, "
            f"len(list_filter({toks}, w -> length(w) >= 4)) AS n_long_tokens "
            f"FROM {table}"
        ),
        "quality_score": f"""
SELECT doc_id, n_chars_exact, n_tokens, n_punct, n_upper, n_stop_en,
       (((1000 * n_stop_en) // greatest(n_tokens, 1))
        - ((50 * n_punct) // greatest(n_chars_exact, 1)))::BIGINT AS score_milli
FROM (
  SELECT doc_id, length(text) AS n_chars_exact, len({toks}) AS n_tokens,
         length(text) - length(regexp_replace(text, '{PUNCT_CLASS}', '', 'g')) AS n_punct,
         length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')) AS n_upper,
         {hits(en)} AS n_stop_en
  FROM {table}
)""",
        "lang_id": f"""
SELECT doc_id, hits_en, hits_de, hits_fr,
       CASE WHEN hits_en >= hits_de AND hits_en >= hits_fr AND hits_en > 0 THEN 'en'
            WHEN hits_de >= hits_fr AND hits_de > 0 THEN 'de'
            WHEN hits_fr > 0 THEN 'fr' ELSE 'unknown' END AS lang_pred
FROM (SELECT doc_id, {hits(en)} AS hits_en, {hits(de)} AS hits_de,
             {hits(fr)} AS hits_fr FROM {table})""",
        "fingerprint": (
            f"SELECT doc_id, md5(text) AS md5, "
            f"('0x' || substring(md5(text), 1, 15))::BIGINT AS fp60 FROM {table}"
        ),
    }


def gopher_cols(t: Column) -> list[Column]:
    """Gopher/C4-style document-quality signals (public heuristics: Rae
    et al. 2021 §A1.1, the C4 cleaning rules) as pure JVM expressions —
    integer milli-ratios throughout so the DuckDB oracle is bit-exact:

    - line shape: fraction of lines that are bullets / end in an
      ellipsis / end in terminal punctuation; duplicate-line fraction
      (the cheap intra-doc repetition signal);
    - word shape: mean word length, fraction of words containing an
      alphabetic character;
    - ``gopher_ok``: the conjunctive keep-gate over loose thresholds.
    """
    lines = F.split(t, "\n")
    n_lines = F.size(lines)
    toks = tokens_col(t)
    n_tokens = F.size(toks)
    one = F.greatest(n_lines, F.lit(1))
    onet = F.greatest(n_tokens, F.lit(1))

    def frac_lines(pred) -> Column:
        return F.floor(
            F.lit(1000) * F.size(F.filter(lines, pred)) / one
        ).cast("long")

    bullet = frac_lines(lambda line: line.rlike(r"^\s*[-*•]\s"))
    ellipsis = frac_lines(lambda line: line.rlike(r"(\.\.\.|…)\s*$"))
    term = frac_lines(lambda line: line.rlike('[.!?"]\\s*$'))
    dup = (
        F.lit(1000)
        - F.floor(F.lit(1000) * F.size(F.array_distinct(lines)) / one)
    ).cast("long")
    alpha = F.floor(
        F.lit(1000)
        * F.size(F.filter(toks, lambda w: w.rlike("[A-Za-z]")))
        / onet
    ).cast("long")
    mean_wl = F.floor(
        F.lit(1000)
        * F.aggregate(
            toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        )
        / onet
    ).cast("long")
    gopher_ok = (
        n_tokens.between(5, 100_000)
        & mean_wl.between(2000, 12_000)
        & (dup < 300)
        & (alpha > 600)
    )
    return [
        n_lines.alias("n_lines"),
        bullet.alias("bullet_line_milli"),
        ellipsis.alias("ellipsis_line_milli"),
        term.alias("term_punct_line_milli"),
        dup.alias("dup_line_milli"),
        alpha.alias("alpha_word_milli"),
        mean_wl.alias("mean_word_len_milli"),
        gopher_ok.alias("gopher_ok"),
    ]


def duckdb_gopher_sql(table: str = "documents") -> str:
    """Oracle twin of gopher_cols: same splits, same integer milli
    arithmetic (`//` mirrors Spark's floor(x/y) on non-negative ints)."""
    lines = "string_split(text, chr(10))"
    toks = "string_split_regex(trim(text), '\\s+')"

    def frac(pred: str) -> str:
        return (
            f"((1000 * len(list_filter({lines}, l -> {pred})))"
            f" // greatest(len({lines}), 1))::BIGINT"
        )

    bullet = frac("regexp_matches(l, '^\\s*[-*•]\\s')")
    ellipsis = frac("regexp_matches(l, '(\\.\\.\\.|…)\\s*$')")
    term = frac('regexp_matches(l, \'[.!?"]\\s*$\')')
    return f"""
SELECT doc_id,
  len({lines}) AS n_lines,
  {bullet} AS bullet_line_milli,
  {ellipsis} AS ellipsis_line_milli,
  {term} AS term_punct_line_milli,
  (1000 - ((1000 * len(list_distinct({lines})))
           // greatest(len({lines}), 1)))::BIGINT AS dup_line_milli,
  ((1000 * len(list_filter({toks}, w -> regexp_matches(w, '[A-Za-z]'))))
   // greatest(len({toks}), 1))::BIGINT AS alpha_word_milli,
  ((1000 * list_sum(list_transform({toks}, w -> length(w)))::BIGINT)
   // greatest(len({toks}), 1))::BIGINT AS mean_word_len_milli,
  (len({toks}) BETWEEN 5 AND 100000
   AND ((1000 * list_sum(list_transform({toks}, w -> length(w)))::BIGINT)
        // greatest(len({toks}), 1)) BETWEEN 2000 AND 12000
   AND (1000 - ((1000 * len(list_distinct({lines})))
                // greatest(len({lines}), 1))) < 300
   AND ((1000 * len(list_filter({toks}, w -> regexp_matches(w, '[A-Za-z]'))))
        // greatest(len({toks}), 1)) > 600) AS gopher_ok
FROM {table}
"""


def text_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    extra: list[Column] | None = None,
) -> DataFrame:
    """Every per-doc text-analysis kernel in ONE wide projection — token
    counts, quality sub-metrics, lang-id and fingerprint share a single
    scan + whole-stage-codegen span (no reason to read the corpus four
    times at 100 TB when all the kernels are narrow column expressions)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = F.size(tokens_col(t))
    punct = n_chars - F.length(F.regexp_replace(t, PUNCT_CLASS, ""))
    upper = n_chars - F.length(F.regexp_replace(t, "[A-Z]", ""))
    en = _stopword_hits(t, STOPWORDS["en"])
    de = _stopword_hits(t, STOPWORDS["de"])
    fr = _stopword_hits(t, STOPWORDS["fr"])
    score = (
        F.floor(F.lit(1000) * en / F.greatest(n_tokens, F.lit(1)))
        - F.floor(F.lit(50) * punct / F.greatest(n_chars, F.lit(1)))
    ).cast("long")
    lang_pred = (
        F.when((en >= de) & (en >= fr) & (en > 0), "en")
        .when((de >= fr) & (de > 0), "de")
        .when(fr > 0, "fr")
        .otherwise("unknown")
    )
    h = F.md5(t)
    return df.select(
        id_col,
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_exact"),
        F.size(F.filter(tokens_col(t), lambda w: F.length(w) >= 4)).alias(
            "n_long_tokens"
        ),
        punct.alias("n_punct"),
        upper.alias("n_upper"),
        en.alias("n_stop_en"),
        score.alias("score_milli"),
        en.alias("hits_en"),
        de.alias("hits_de"),
        fr.alias("hits_fr"),
        lang_pred.alias("lang_pred"),
        h.alias("md5"),
        F.conv(F.substring(h, 1, 15), 16, 10).cast("long").alias("fp60"),
        *(extra or []),
    )


def duckdb_text_stats_sql(table: str = "documents") -> str:
    """Oracle for ``text_stats``: the four per-kernel oracles joined on the
    id with explicit column lists (n_tokens/n_chars_exact appear in two
    sub-oracles; hits_en == n_stop_en by construction)."""
    q = duckdb_text_sql(table)
    return f"""
SELECT a.doc_id, a.n_tokens, a.n_chars_exact, a.n_long_tokens,
       b.n_punct, b.n_upper, b.n_stop_en, b.score_milli,
       c.hits_en, c.hits_de, c.hits_fr, c.lang_pred,
       d.md5, d.fp60
FROM ({q["token_count"]}) a
JOIN ({q["quality_score"]}) b USING (doc_id)
JOIN ({q["lang_id"]}) c USING (doc_id)
JOIN ({q["fingerprint"]}) d USING (doc_id)
"""
