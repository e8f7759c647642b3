"""Ordered markup-rewrite pipeline: wiki-style text -> Markdown.

The reference's densest layer is its per-format markup grammars
(SURVEY §2.7: zim/tiddlywiki/roam/ENEX rewrite engines) plus a 20+-pass
ordered HTML filter pipeline (md_lib/convert.py:80-95). This module
re-expresses that *shape* — a fixed-order list of pure string rewrite
rules composed inside one vectorized UDF — with a representative zim-style
wiki grammar (public zim syntax), written from scratch as regex rules.

Rules run in declaration order (order matters: verbatim spans are
extracted first so later rules don't rewrite inside them), mirroring the
reference's rule-pipeline discipline. Each rule documents its semantics
with doctests (the reference's test style, SURVEY §5).
"""

from __future__ import annotations

import re
from collections.abc import Callable

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_VERBATIM = re.compile(r"''(.+?)''")
_HEADING = re.compile(r"^(={2,6}) (.+?) \1\s*$", re.M)
_CHECK_OPEN = re.compile(r"^\[ \] ", re.M)
_CHECK_DONE = re.compile(r"^\[\*\] ", re.M)
_ITALIC = re.compile(r"//(.+?)//")
_LINK_LABELED = re.compile(r"\[\[([^\]|]+)\|([^\]]+)\]\]")
_LINK_BARE = re.compile(r"\[\[([^\]|]+)\]\]")
_IMAGE = re.compile(r"\{\{([^}]+)\}\}")


def _rule_headings(s: str) -> str:
    """zim headings: more '=' means higher level (====== is h1).

    >>> _rule_headings("====== Top ======")
    '# Top'
    >>> _rule_headings("=== Sub ===")
    '#### Sub'
    """
    return _HEADING.sub(lambda m: "#" * (7 - len(m.group(1))) + " " + m.group(2), s)


def _rule_checklists(s: str) -> str:
    """
    >>> _rule_checklists("[ ] todo\\n[*] done")
    '- [ ] todo\\n- [x] done'
    """
    return _CHECK_DONE.sub("- [x] ", _CHECK_OPEN.sub("- [ ] ", s))


def _rule_italic(s: str) -> str:
    """
    >>> _rule_italic("a //b// c")
    'a *b* c'
    """
    return _ITALIC.sub(r"*\1*", s)


def _rule_links(s: str) -> str:
    """
    >>> _rule_links("see [[page|the page]] and [[other]]")
    'see [the page](page) and [other](other)'
    """
    s = _LINK_LABELED.sub(r"[\2](\1)", s)
    return _LINK_BARE.sub(r"[\1](\1)", s)


def _rule_images(s: str) -> str:
    """
    >>> _rule_images("pic {{img.png}}")
    'pic ![](img.png)'
    """
    return _IMAGE.sub(r"![](\1)", s)


# fixed order; verbatim spans shielded around the whole pipeline
RULES: list[tuple[str, Callable[[str], str]]] = [
    ("headings", _rule_headings),
    ("checklists", _rule_checklists),
    ("links", _rule_links),
    ("images", _rule_images),
    ("italic", _rule_italic),
]


def wiki_to_md(s: str) -> str:
    """Full ordered pipeline with verbatim shielding.

    >>> print(wiki_to_md("=== T ===\\n[ ] do //it// ''//not this//''"))
    #### T
    - [ ] do *it* `//not this//`
    """
    if s is None:
        return None
    spans: list[str] = []

    def shield(m: re.Match) -> str:
        spans.append(m.group(1))
        return f"\x00{len(spans) - 1}\x00"

    s = _VERBATIM.sub(shield, s)
    for _, rule in RULES:
        s = rule(s)
    return re.sub(
        r"\x00(\d+)\x00", lambda m: "`" + spans[int(m.group(1))] + "`", s
    )


def wiki_to_md_udf() -> Column:
    @F.pandas_udf("string")
    def conv(texts: pd.Series) -> pd.Series:
        return texts.map(wiki_to_md)

    return conv


# ---------------------------------------------------------------------------
# TiddlyWiki wikitext grammar (public classic-wikitext syntax, written from
# scratch; the reference's analogue is its tiddlywiki table/list rewriter,
# /root/reference/src/jimmy/md_lib/tiddlywiki.py:177-295). Note the link
# order difference vs zim: tiddly is [[label|target]], zim [[target|label]].

_TID_CODE = re.compile(r"\{\{\{(.+?)\}\}\}")
_TID_HEADING = re.compile(r"^(!{1,6})\s*(.+?)\s*$", re.M)
_TID_OL = re.compile(r"^(#+) ", re.M)
_TID_UL = re.compile(r"^(\*+) ", re.M)
_TID_BOLD = re.compile(r"''(.+?)''")
_TID_ITALIC = re.compile(r"//(.+?)//")
_TID_UNDER = re.compile(r"__(.+?)__")
_TID_LINK_LABELED = re.compile(r"\[\[([^\]|]+)\|([^\]]+)\]\]")
_TID_LINK_BARE = re.compile(r"\[\[([^\]|]+)\]\]")
_TID_TABLE_BLOCK = re.compile(r"(?:^\|[^\n]*\|h?(?:\n|$))+", re.M)


def _rule_tid_headings(s: str) -> str:
    """
    >>> _rule_tid_headings("!! Sub")
    '## Sub'
    """
    return _TID_HEADING.sub(lambda m: "#" * len(m.group(1)) + " " + m.group(2), s)


def _rule_tid_lists(s: str) -> str:
    """Nested '#'/'*' list markers -> indented md markers.

    >>> _rule_tid_lists("# one\\n## one.a\\n* b\\n** b.a")
    '1. one\\n  1. one.a\\n- b\\n  - b.a'
    """
    s = _TID_OL.sub(lambda m: "  " * (len(m.group(1)) - 1) + "1. ", s)
    return _TID_UL.sub(lambda m: "  " * (len(m.group(1)) - 1) + "- ", s)


def _rule_tid_emphasis(s: str) -> str:
    """
    >>> _rule_tid_emphasis("''b'' //i// __u__")
    '**b** *i* <u>u</u>'
    """
    s = _TID_BOLD.sub(r"**\1**", s)
    s = _TID_ITALIC.sub(r"*\1*", s)
    return _TID_UNDER.sub(r"<u>\1</u>", s)


def _rule_tid_links(s: str) -> str:
    """tiddly [[label|target]] (label first — opposite of zim).

    >>> _rule_tid_links("[[the page|page]] and [[other]]")
    '[the page](page) and [other](other)'
    """
    s = _TID_LINK_LABELED.sub(r"[\1](\2)", s)
    return _TID_LINK_BARE.sub(r"[\1](\1)", s)


def _rule_tid_tables(s: str) -> str:
    """Wikitext table block -> md table. A row ending in '|h' is the
    header; without one the first row becomes the header.

    >>> print(_rule_tid_tables("|a|b|h\\n|1|2|"))
    | a | b |
    | --- | --- |
    | 1 | 2 |
    """

    def conv(m: re.Match) -> str:
        block = m.group(0)
        trailing = "\n" if block.endswith("\n") else ""
        header: list[str] | None = None
        rows: list[list[str]] = []
        for ln in block.rstrip("\n").split("\n"):
            if ln.endswith("|h"):
                header = [c.strip() for c in ln[1:-2].split("|")]
            else:
                rows.append([c.strip() for c in ln.strip("|").split("|")])
        if header is None and rows:
            header, rows = rows[0], rows[1:]
        out = ["| " + " | ".join(header) + " |"]
        out.append("| " + " | ".join("---" for _ in header) + " |")
        for r in rows:
            out.append("| " + " | ".join(r) + " |")
        return "\n".join(out) + trailing

    return _TID_TABLE_BLOCK.sub(conv, s)


TIDDLY_RULES: list[tuple[str, Callable[[str], str]]] = [
    ("tables", _rule_tid_tables),
    ("lists", _rule_tid_lists),
    ("headings", _rule_tid_headings),
    ("links", _rule_tid_links),
    ("emphasis", _rule_tid_emphasis),
]


def tiddly_to_md(s: str) -> str:
    """Ordered tiddlywiki pipeline with {{{code}}} shielding.

    >>> print(tiddly_to_md("!! T\\n|a|b|h\\n|''1''|2|\\nsee {{{//raw//}}}"))
    ## T
    | a | b |
    | --- | --- |
    | **1** | 2 |
    see `//raw//`
    """
    if s is None:
        return None
    spans: list[str] = []

    def shield(m: re.Match) -> str:
        spans.append(m.group(1))
        return f"\x00{len(spans) - 1}\x00"

    s = _TID_CODE.sub(shield, s)
    for _, rule in TIDDLY_RULES:
        s = rule(s)
    return re.sub(
        r"\x00(\d+)\x00", lambda m: "`" + spans[int(m.group(1))] + "`", s
    )


def tiddly_to_md_udf() -> Column:
    @F.pandas_udf("string")
    def conv(texts: pd.Series) -> pd.Series:
        return texts.map(tiddly_to_md)

    return conv
