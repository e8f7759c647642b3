"""YAML-frontmatter parsing on READ — the reference's input-side twin of
the serializer.

Reference: converter.py:275-294 (the DefaultConverter markdown family
runs ``frontmatter.parse`` on every .md file: known keys — title, author,
created, updated, latitude, longitude, altitude — become note fields,
``tags`` extends the tag list, everything else lands in
``custom_metadata``) and obsidian.py:59-74 (frontmatter tags merged with
inline ``#tag``s). jimmy serializes frontmatter on write
(intermediate_format.py:214-287); until round 5 this repo only had the
write side.

Two lanes, same discipline as functions/strings.py:

- Column kernels (``fm_meta`` / ``fm_body`` / ``fm_value`` /
  ``fm_tags``) as pure regexp expressions with DuckDB twins — the
  whole-stage-codegen path used by the gate query (q_caption_kernels
  round-trips its own serialized documents through them).
- ``parse_frontmatter`` — a pure-Python mini-YAML reader (scalars,
  quoted strings, ints, inline ``[a, b]`` and block ``- item`` lists;
  the subset note exports actually use) for the executor-side markdown
  source (sources/markdown.py), plus ``get_inline_tags`` anchored on the
  reference doctests (md_lib/tags.py:4-27).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (?s): the meta block spans lines; lazy group 1 stops at the FIRST
# closing fence, so a '---' inside the body stays in the body
_FM_RE = r"(?s)^---\n(.*?)\n---\n(.*)$"


def fm_meta(c: Column) -> Column:
    """The raw frontmatter block ('' when the text has none)."""
    return F.regexp_extract(c, _FM_RE, 1)


def fm_body(c: Column) -> Column:
    """Text minus the frontmatter block (identity when none)."""
    return F.when(c.rlike(_FM_RE), F.regexp_extract(c, _FM_RE, 2)).otherwise(c)


def fm_value(c: Column, key: str) -> Column:
    """Scalar value of ``key:`` within the frontmatter block ('' when
    absent). ``key`` is a trusted literal (caller-supplied name, not
    data)."""
    return F.regexp_extract(fm_meta(c), f"(?m)^{key}: (.*)$", 1)


def fm_tags(c: Column) -> Column:
    """Inline-list tags ``tags: [a, b]`` as an array ('' -> empty)."""
    raw = F.regexp_extract(fm_meta(c), r"(?m)^tags: \[(.*)\]$", 1)
    return F.when(raw == "", F.array().cast("array<string>")).otherwise(
        F.split(raw, ", ")
    )


def duckdb_fm_meta(expr: str) -> str:
    return f"regexp_extract({expr}, '^---\\n(.*?)\\n---\\n(.*)$', 1, 's')"


def duckdb_fm_body(expr: str) -> str:
    return (
        f"CASE WHEN regexp_matches({expr}, '^---\\n(.*?)\\n---\\n', 's') "
        f"THEN regexp_extract({expr}, '^---\\n(.*?)\\n---\\n(.*)$', 2, 's') "
        f"ELSE {expr} END"
    )


def duckdb_fm_value(expr: str, key: str) -> str:
    return f"regexp_extract({duckdb_fm_meta(expr)}, '(?m)^{key}: (.*)$', 1)"


def duckdb_fm_tags(expr: str) -> str:
    raw = (
        f"regexp_extract({duckdb_fm_meta(expr)}, "
        f"'(?m)^tags: \\[(.*)\\]$', 1)"
    )
    return (
        f"CASE WHEN {raw} = '' THEN []::VARCHAR[] "
        f"ELSE str_split({raw}, ', ') END"
    )


# --------------------------------------------------------------------------
# executor-side mini-YAML (sources/markdown.py)


def _scalar(v: str):
    v = v.strip()
    if len(v) >= 2 and v[0] == v[-1] and v[0] in "'\"":
        return v[1:-1]
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    # int, then float, then raw string — never raise ('--5' lstrips to
    # digits but is not an int; the contract is unparseable-stays-string)
    try:
        return int(v)
    except ValueError:
        pass
    try:
        return float(v)
    except ValueError:
        return v


def parse_frontmatter(text: str) -> tuple[dict, str]:
    """(metadata, body) — the ``frontmatter.parse`` surface the reference
    calls (converter.py:275). No frontmatter -> ({}, text). Supports the
    YAML subset real note exports carry: ``key: scalar``, quoted strings,
    ints/floats/bools, inline ``[a, b]`` lists and block ``- item``
    lists. Anything unparseable stays a raw string value."""
    if not text.startswith("---\n"):
        return {}, text
    end = text.find("\n---\n", 3)
    if end == -1:
        # frontmatter closed at EOF without trailing newline
        if text.endswith("\n---"):
            end, body = len(text) - 4, ""
        else:
            return {}, text
    else:
        body = text[end + 5 :]
    meta: dict = {}
    key = None
    for line in text[4:end].split("\n"):
        if line.startswith(("- ", "  - ")) and key is not None:
            item = line.split("- ", 1)[1]
            if not isinstance(meta[key], list):
                meta[key] = []
            meta[key].append(_scalar(item))
            continue
        if ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip()
        val = val.strip()
        if not val:
            meta[key] = []  # block list follows (or an empty value)
        elif val.startswith("[") and val.endswith("]"):
            inner = val[1:-1].strip()
            meta[key] = (
                [_scalar(x) for x in inner.split(",")] if inner else []
            )
        else:
            meta[key] = _scalar(val)
    return meta, body


def get_inline_tags(text: str, start_characters: list[str]) -> list[str]:
    """Inline-tag extraction, reference semantics (md_lib/tags.py:4-27):
    a word starting with a marker, longer than the marker, and not made
    of markers only ('###' is a heading, not a tag). Returns a sorted
    list (the reference returns an unordered set's list; sorting makes
    the distributed output deterministic)."""
    tags = set()
    for word in text.split():
        if (
            any(word.startswith(ch) for ch in start_characters)
            and len(word) > 1
            and any(ch not in start_characters for ch in word)
        ):
            tags.add(word[1:])
    return sorted(tags)
