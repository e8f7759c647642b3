"""Markdown link parsing — the reference's ``get_markdown_links`` kernel.

Reference: /root/reference/src/jimmy/md_lib/links.py:234-310
(``get_markdown_links``) drives every converter's link-rewrite loop via a
markdown-AST walk (python-markdown + a Treeprocessor): links inside
fenced code blocks and inline code spans are NOT links, ``<bracketed>``
URLs lose their brackets, ``url#fragment`` splits, ``(url "title")``
carries a title, ``![alt](src)`` is an image, and ``[[wiki|text]]`` /
``![[embed]]`` wikilinks are parsed with bracket-nesting exclusions
(links.py:131-146). This module reimplements those semantics from first
principles (the markdown package is not available here, and a
char-scanner is the honest shape for an Arrow kernel anyway):

- ``get_markdown_links(text)``: pure-Python scanner, anchored verbatim on
  the reference doctests (links.py:244-310) in tests/test_mdlinks.py.
  Used executor-side (mapInPandas) where full link structure is needed.
- ``mask_code_col(col)`` / ``mask_code_sql(expr)``: the JVM/DuckDB twin
  of the scanner's first stage — blanking fenced blocks and inline code
  so downstream regexp link extraction (plans/convert.py resolve_links,
  queries.q_linkres) shares the AST walk's "code is not a link" rule
  while staying entirely inside whole-stage codegen. The two builders
  emit the same regexes so the driver's hash gate checks the pair.
"""

from __future__ import annotations

import dataclasses
import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclasses.dataclass
class MarkdownLink:
    """Parsed link — same field surface as the reference's MarkdownLink
    (links.py:38-66) so parity tests read one-to-one."""

    text: str = ""
    url: str = ""
    title: str = ""
    fragment: str = ""
    is_image: bool = False
    is_wikilink: bool = False
    is_embedded: bool = False


# --------------------------------------------------------------------------
# stage 1: code masking (fences + inline spans are never links)

_FENCE_RE = re.compile(r"```.*?```", re.DOTALL)
_INLINE_RE = re.compile(r"`[^`]*`")
# Java regex equivalents (Spark) — same patterns, (?s) inline flag
_FENCE_J = r"(?s)```.*?```"
_INLINE_J = r"`[^`]*`"


def _blank(m: re.Match) -> str:
    # keep offsets stable: replace code with same-length spaces so link
    # spans found later index the ORIGINAL text (inline code inside link
    # TEXT must survive, e.g. "[foo `bar` baz](url)")
    return " " * len(m.group(0))


def mask_code(text: str) -> str:
    """Same-length masking of fenced blocks and inline code spans."""
    return _INLINE_RE.sub(_blank, _FENCE_RE.sub(_blank, text))


def mask_code_col(col: Column) -> Column:
    """JVM twin: blank code regions of a string column (fences first so a
    backtick inside a fence can't start a phantom inline span)."""
    return F.regexp_replace(
        F.regexp_replace(col, _FENCE_J, " "), _INLINE_J, " "
    )


def mask_code_sql(expr: str) -> str:
    """DuckDB twin of mask_code_col over SQL expression ``expr``."""
    return (
        f"regexp_replace(regexp_replace({expr}, '```.*?```', ' ', 'gs'), "
        f"'`[^`]*`', ' ', 'g')"
    )


# --------------------------------------------------------------------------
# stage 2: scanning (pure Python; executor-side via mapInPandas when the
# full link structure is needed)

_WIKILINK_RE = re.compile(r"(!)?\[\[(.+?)(?:\|(.+?))?\]\]")


def _split_fragment(url: str) -> tuple[str, str]:
    """links.py:149-166 split_url_fragment: first '#' splits."""
    parts = url.split("#", 1)
    return (parts[0], parts[1]) if len(parts) == 2 else (url, "")


def _parse_target(inner: str) -> tuple[str, str, str]:
    """The '(...)' payload -> (url, title, fragment). Title is a trailing
    quoted string after whitespace; <bracketed> URLs lose their brackets;
    fragment splits on the first '#'."""
    inner = inner.strip()
    title = ""
    m = re.match(r'^(.*?)\s+"(.*)"$', inner, re.DOTALL)
    if m:
        inner, title = m.group(1), m.group(2)
    if inner.startswith("<") and inner.endswith(">"):
        inner = inner[1:-1]
    url, fragment = _split_fragment(inner)
    return url, title, fragment


def _match_span(text: str, start: int, open_ch: str, close_ch: str) -> int:
    """Return the index just past the balanced ``close_ch`` matching the
    ``open_ch`` at ``start``, honoring backslash escapes; -1 if
    unbalanced. Nesting-aware (python-markdown accepts nested brackets in
    link text and parens in URLs: '![abc](image (1).png)')."""
    depth = 0
    i = start
    while i < len(text):
        c = text[i]
        if c == "\\":
            i += 2
            continue
        if c == open_ch:
            depth += 1
        elif c == close_ch:
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    return -1


def get_markdown_links(text: str) -> list[MarkdownLink]:
    r"""Standard Markdown links + wikilinks, reference semantics
    (get_markdown_links, links.py:234-310; doctest anchors in
    tests/test_mdlinks.py). Returns images first, then links in document
    order — the reference's ``md_images + md_links``.

    >>> get_markdown_links('```\n[link](:/custom)\n```')
    []
    >>> get_markdown_links('[link](url#fragment)')
    [MarkdownLink(text='link', url='url', title='', fragment='fragment', is_image=False, is_wikilink=False, is_embedded=False)]
    """
    masked = mask_code(text)
    images: list[MarkdownLink] = []
    links: list[tuple[int, MarkdownLink]] = []  # (position, link) — the
    # reference's Treeprocessor walks <a> nodes in document order, with
    # wikilinks already inlined, so standard links and wikilinks
    # interleave by position

    # wikilinks first; blank their spans so the standard scanner never
    # sees the inner '[...]' content
    def _wiki(m: re.Match) -> str:
        emb, url, desc = m.group(1), m.group(2), m.group(3)
        # bracket-nesting exclusions (links.py:131-146): [[[link]]] etc.
        if (
            url.startswith("[")
            or (not desc and url.endswith("]"))
            or (desc and desc.endswith("]"))
        ):
            return m.group(0)
        url, fragment = _split_fragment(url)
        links.append(
            (
                m.start(),
                MarkdownLink(
                    text=(desc if desc and desc.strip() else ""),
                    url=url,
                    fragment=fragment,
                    is_wikilink=True,
                    is_embedded=bool(emb),
                ),
            )
        )
        return " " * len(m.group(0))

    masked = _WIKILINK_RE.sub(_wiki, masked)

    i = 0
    n = len(masked)
    while i < n:
        c = masked[i]
        if c == "\\":
            i += 2
            continue
        if c != "[":
            i += 1
            continue
        is_image = i > 0 and masked[i - 1] == "!" and (
            i < 2 or masked[i - 2] != "\\"
        )
        close = _match_span(masked, i, "[", "]")
        if close == -1 or close >= n or masked[close] != "(":
            i += 1
            continue
        pend = _match_span(masked, close, "(", ")")
        if pend == -1:
            i += 1
            continue
        # capture from the ORIGINAL text: escapes and inline code inside
        # the link text are preserved verbatim (the reference's unescape
        # restores '\'+char, links.py:170-177)
        ltext = text[i + 1 : close - 1]
        url, title, fragment = _parse_target(text[close + 1 : pend - 1])
        link = MarkdownLink(
            text=ltext, url=url, title=title, fragment=fragment,
            is_image=is_image,
        )
        if is_image:
            images.append(link)
        else:
            links.append((i, link))
        i = pend
    return images + [lk for _, lk in sorted(links, key=lambda p: p[0])]


# --------------------------------------------------------------------------
# ref-extraction twins used by the distributed rewrite paths

NOTE_REF_RE = r"note://([A-Za-z0-9_\-]+)"
# full ref token incl. the optional '#fragment' (the reference's NoteLink
# carries original_text + fragment; writer.py:232-266 rewrites the whole
# token and header-id-normalizes the fragment)
NOTE_TOKEN_RE = r"note://[A-Za-z0-9_\-]+(?:#[A-Za-z0-9_\-]+)?"


def note_ref_tokens_col(body: Column) -> Column:
    """Array of FULL ``note://id[#fragment]`` tokens outside code
    regions — the unit the link rewrite replaces."""
    return F.array_distinct(
        F.regexp_extract_all(mask_code_col(body), F.lit(NOTE_TOKEN_RE), 0)
    )


def note_refs_col(body: Column) -> Column:
    """Array of note:// ids referenced OUTSIDE code regions — the
    fence-aware replacement for a bare regexp over the body."""
    return F.array_distinct(
        F.regexp_extract_all(mask_code_col(body), F.lit(NOTE_REF_RE), 1)
    )


LINKS_SCHEMA = (
    "text string, url string, title string, fragment string, "
    "is_image boolean, is_wikilink boolean, is_embedded boolean"
)

WEB_SCHEMES = ("http", "https", "ftp", "ftps")  # common.py web_schemes
MARKDOWN_LINK_SUFFIXES = (".md", ".mdown", ".markdown", "")  # common.py:61-62


def render(lk: MarkdownLink) -> str:
    """The reference's MarkdownLink.__str__ (links.py:86-92 via
    make_link/make_wikilink:16-34) — the ORIGINAL-text reconstruction the
    writer's str.replace keys on. Same miss modes as the reference by
    construction (e.g. a source-bracketed URL reconstructs unbracketed)."""
    frag = f"#{lk.fragment}" if lk.fragment else ""
    if lk.is_wikilink:
        text = lk.text if lk.text.strip() else ""
        text = f"|{text}" if text else ""
        return f"{'!' * lk.is_embedded}[[{lk.url}{frag}{text}]]"
    title = f' "{lk.title}"' if lk.title else ""
    return f"{'!' * lk.is_image}[{lk.text}]({lk.url}{frag}{title})"


def _note_link_rows(body: str) -> list[tuple[str, str, str, str]]:
    """(original_text, target_id, text, fragment) for each INTERNAL note
    link — the obsidian-family classification (obsidian.py:15-42):
    web/mail links are kept, a markdown-suffix-or-suffixless url is a
    note link whose id is the unquoted stem, anything else is a resource
    (not rewritten here)."""
    import posixpath
    from urllib.parse import unquote

    out = []
    for lk in get_markdown_links(body or ""):
        if not lk.url:
            continue  # fragment-only internal heading link: kept
        if any(lk.url.startswith(f"{s}://") for s in WEB_SCHEMES):
            continue
        if lk.url.startswith("mailto:"):
            continue
        base = posixpath.basename(unquote(lk.url).rstrip("/"))
        stem, dot, ext = base.rpartition(".")
        suffix = f".{ext}" if dot else ""
        if suffix not in MARKDOWN_LINK_SUFFIXES:
            continue  # resource (non-markdown file)
        # the reference classifies by SUFFIX alone (obsidian.py:24-35):
        # an embedded/transcluded note (``![[Note]]``) or even an image
        # link whose target is a markdown file is a note link and gets
        # rewritten to a standard link through the id map
        target = stem if dot else base
        out.append((render(lk), target, lk.text, lk.fragment, lk.title))
    return out


NOTE_LINKS_SCHEMA = (
    "orig string, target_id string, text string, frag string, title string"
)


def _resource_link_rows(body: str) -> list[tuple[str, str, str, str, bool]]:
    """(original_text, url, fname, text, is_image) for each RESOURCE
    link — the complement of the note-link branch (obsidian.py:36-41):
    a non-web, non-mail link whose url carries a non-markdown suffix
    (``![x](img.png)``, ``![[scan.pdf]]``, ``[doc](file.pdf)``).
    ``fname`` is the unquoted basename — the rglob match key
    (common.py:506-522 find_file_recursively)."""
    import posixpath
    from urllib.parse import unquote

    out = []
    for lk in get_markdown_links(body or ""):
        if not lk.url:
            continue
        if any(lk.url.startswith(f"{s}://") for s in WEB_SCHEMES):
            continue
        if lk.url.startswith("mailto:"):
            continue
        unq = unquote(lk.url)
        base = posixpath.basename(unq.rstrip("/"))
        stem, dot, ext = base.rpartition(".")
        suffix = f".{ext}" if dot else ""
        if suffix in MARKDOWN_LINK_SUFFIXES:
            continue  # internal note link, not a resource
        is_image = lk.is_image or lk.is_embedded
        out.append((render(lk), unq, base, lk.text, is_image))
    return out


RESOURCE_LINKS_SCHEMA = (
    "orig string, url string, fname string, text string, is_image boolean"
)


def resource_links_col(body: Column) -> Column:
    """Arrow-batched resource-link extraction for the markdown lifecycle:
    array of (orig, url, fname, text, is_image) structs."""

    @F.pandas_udf(f"array<struct<{RESOURCE_LINKS_SCHEMA}>>")
    def _extract(bodies: pd.Series) -> pd.Series:
        return pd.Series([_resource_link_rows(b) for b in bodies])

    return _extract(body)


def note_links_col(body: Column) -> Column:
    """Arrow-batched internal-note-link extraction for the markdown
    lifecycle: array of (orig, target_id, text, frag) structs."""

    @F.pandas_udf(f"array<struct<{NOTE_LINKS_SCHEMA}>>")
    def _extract(bodies: pd.Series) -> pd.Series:
        return pd.Series([_note_link_rows(b) for b in bodies])

    return _extract(body)


def links_col(body: Column) -> Column:
    """Full-structure link extraction as an Arrow-batched UDF: array of
    MarkdownLink structs per body, reference field order (images first).
    The scanner is pure Python by necessity (bracket matching with
    escapes is not a regular language); one Arrow crossing, no shuffle —
    compose into a projection like any other kernel."""

    @F.pandas_udf(f"array<struct<{LINKS_SCHEMA}>>")
    def _extract(bodies: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [dataclasses.astuple(lk) for lk in get_markdown_links(b or "")]
                for b in bodies
            ]
        )

    return _extract(body)


def note_refs_sql(expr: str) -> str:
    """DuckDB twin of note_refs_col (list of ids, duplicates kept — wrap
    in a dedup at the call site if needed)."""
    return (
        f"regexp_extract_all({mask_code_sql(expr)}, "
        f"'note://([A-Za-z0-9_-]+)', 1)"
    )
