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
