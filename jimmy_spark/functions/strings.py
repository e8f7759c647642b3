"""jimmy's string kernels re-expressed as JVM column expressions.

The reference's densest layer (SURVEY §2.7) is per-record Python string
munging; here each kernel is a Catalyst expression (regexp chains), so it
whole-stage-codegens and needs no Python worker. Every kernel has a DuckDB
twin using the same regex/ops (both engines: RE2-compatible patterns only,
no lookarounds/backrefs).

Kernels (reference citations):
- safe_filename  — /root/reference/src/jimmy/common.py:85-168 ``safe_path``
  (forbidden character replacement, reserved-name guard, length cap)
- normalize_tag  — intermediate_format.py:54-76 (obsidian tag normalize:
  keep [A-Za-z0-9_/-], replace runs with '-', lowercase)
- make_link / make_wikilink — md_lib/links.py:16-34
- split_title   — md_lib/text.py:28-52 (first line as title, cap length)
- inline_tags   — md_lib/tags.py:4-27 (#tag extraction)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_FORBIDDEN = '[<>:"/\\\\|?*\\x00-\\x1f]'
_RESERVED = (
    "CON PRN AUX NUL COM1 COM2 COM3 COM4 COM5 COM6 COM7 COM8 COM9 "
    "LPT1 LPT2 LPT3 LPT4 LPT5 LPT6 LPT7 LPT8 LPT9"
).split()
MAX_NAME = 50


def safe_filename(c: Column) -> Column:
    """Forbidden chars -> '_', trim dots/spaces, reserved names prefixed,
    capped at MAX_NAME chars (jimmy common.py:85-168 semantics)."""
    s = F.regexp_replace(c, _FORBIDDEN, "_")
    s = F.regexp_replace(s, "^[. ]+|[. ]+$", "")
    s = F.when(F.upper(s).isin(_RESERVED), F.concat(F.lit("_"), s)).otherwise(s)
    return F.substring(s, 1, MAX_NAME)


def normalize_tag(c: Column) -> Column:
    """Lowercase; any run of chars outside [a-z0-9_/-] -> single '-';
    trim leading/trailing '-' (obsidian normalize semantics)."""
    s = F.lower(c)
    s = F.regexp_replace(s, "[^a-z0-9_/-]+", "-")
    return F.regexp_replace(s, "^-+|-+$", "")


def make_link(title: Column, url: Column) -> Column:
    return F.format_string("[%s](%s)", title, url)


def make_wikilink(target: Column) -> Column:
    return F.format_string("[[%s]]", target)


def split_title(c: Column, max_len: int = 80) -> Column:
    """First line, stripped, capped — jimmy's title-from-body split."""
    return F.substring(F.trim(F.split(c, "\n", 2)[0]), 1, max_len)


def first_inline_tag(c: Column) -> Column:
    """First '#tag' word (md_lib/tags.py semantics, single-tag variant)."""
    return F.regexp_extract(c, "#([A-Za-z0-9_]+)", 1)


def header_id(c: Column) -> Column:
    """Markdown header-ID normalization (to_markdown_header_id,
    md_lib/text.py:55-95, ASCII-regex variant): lowercase, drop chars
    outside [a-z0-9 _-], trim, whitespace/underscore runs -> '-'. Used
    by the writer's link rewrite to turn a link fragment into the header
    id the heading actually rendered to (writer.py:232-242)."""
    return F.regexp_replace(
        F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9 _-]", "")),
        "[ _]+",
        "-",
    )


# --- DuckDB twins (same patterns; 'g' flag for global replace) ------------


def duckdb_safe_filename(col: str) -> str:
    reserved = ", ".join(f"'{r}'" for r in _RESERVED)
    inner = (
        f"regexp_replace(regexp_replace({col}, '{_FORBIDDEN}', '_', 'g'),"
        f" '^[. ]+|[. ]+$', '', 'g')"
    )
    return (
        f"left(CASE WHEN upper({inner}) IN ({reserved})"
        f" THEN '_' || {inner} ELSE {inner} END, {MAX_NAME})"
    )


def duckdb_normalize_tag(col: str) -> str:
    return (
        f"regexp_replace(regexp_replace(lower({col}), '[^a-z0-9_/-]+', '-', 'g'),"
        f" '^-+|-+$', '', 'g')"
    )


def duckdb_make_link(title: str, url: str) -> str:
    return f"('[' || {title} || '](' || {url} || ')')"


def duckdb_split_title(col: str, max_len: int = 80) -> str:
    return f"left(trim(string_split({col}, chr(10))[1]), {max_len})"


def duckdb_first_inline_tag(col: str) -> str:
    return f"regexp_extract({col}, '#([A-Za-z0-9_]+)', 1)"


def duckdb_header_id(col: str) -> str:
    return (
        f"regexp_replace(trim(regexp_replace(lower({col}), "
        f"'[^a-z0-9 _-]', '', 'g')), '[ _]+', '-', 'g')"
    )
