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


def _sanitize(s: str) -> str:
    """Strip NUL bytes up front: NUL is never legal text content and is
    the shield-placeholder sentinel — raw NULs in input could otherwise
    crash or inject into the unshield substitution ("\x005\x00" would
    dereference span 5)."""
    return s.replace("\x00", "")


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
    s = _sanitize(s)
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
            # trim exactly ONE pipe per edge: strip('|') would eat empty
            # edge cells ('||a|' must yield ['', 'a'], not ['a'])
            if ln.endswith("|h"):
                header = [c.strip() for c in ln[1:-2].split("|")]
            else:
                rows.append([c.strip() for c in ln[1:-1].split("|")])
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
    s = _sanitize(s)
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


# ---------------------------------------------------------------------------
# Roam Research grammar (public Roam markdown dialect; reference analogue:
# /root/reference/src/jimmy/md_lib/roam_research.py:109-164). Roam is
# md-ish already — the rewrites are its proprietary extensions.

_ROAM_HIGHLIGHT = re.compile(r"\^\^(.+?)\^\^")
_ROAM_EMBED = re.compile(r"\{\{\[\[embed\]\]: ?\(\(([^)]+)\)\)\}\}")
_ROAM_WIDGET = re.compile(
    r"\{\{\[\[([A-Za-z-]+)\]\](?:: ?([^{}]*(?:\{[^{}]*\}[^{}]*)*))?\}\}"
)
_ROAM_BLOCKREF = re.compile(r"\(\(([^)]+)\)\)")
_ROAM_TODO = re.compile(r"^(\s*)- \{\{\[\[TODO\]\]\}\}", re.M)
_ROAM_DONE = re.compile(r"^(\s*)- \{\{\[\[DONE\]\]\}\}", re.M)
_ROAM_ATTR = re.compile(r"^([A-Za-z][\w -]*)::", re.M)


def _rule_roam_todos(s: str) -> str:
    """Line-start (optionally indented) TODO/DONE bullet markers only —
    a mid-line mention of the literal marker is content, not a task.

    >>> _rule_roam_todos("- {{[[TODO]]}} buy milk")
    '- [ ] buy milk'
    >>> _rule_roam_todos("quote: - {{[[TODO]]}} not a task")
    'quote: - {{[[TODO]]}} not a task'
    """
    s = _ROAM_TODO.sub(r"\1- [ ]", s)
    return _ROAM_DONE.sub(r"\1- [x]", s)


def _rule_roam_embeds(s: str) -> str:
    """
    >>> _rule_roam_embeds("{{[[embed]]: ((abc123))}}")
    '![[abc123]]'
    """
    return _ROAM_EMBED.sub(r"![[\1]]", s)


def _rule_roam_widgets(s: str) -> str:
    """Non-embed {{[[widget]]}} tokens (query/table/kanban...) have no md
    equivalent — rendered as inline code, preserving the payload (one
    brace-nesting level supported).

    >>> _rule_roam_widgets("{{[[query]]: {and: [[x]]}}}")
    '`query: {and: [[x]]}`'
    """
    return _ROAM_WIDGET.sub(
        lambda m: "`" + m.group(1) + (": " + m.group(2) if m.group(2) else "") + "`",
        s,
    )


def _rule_roam_blockrefs(s: str) -> str:
    """
    >>> _rule_roam_blockrefs("see ((xK9-abc)) here")
    'see [[xK9-abc]] here'
    """
    return _ROAM_BLOCKREF.sub(r"[[\1]]", s)


def _rule_roam_highlight(s: str) -> str:
    """
    >>> _rule_roam_highlight("a ^^hot^^ b")
    'a ==hot== b'
    """
    return _ROAM_HIGHLIGHT.sub(r"==\1==", s)


def _rule_roam_attrs(s: str) -> str:
    """Attribute lines 'Key:: value' -> bold key (public Roam attrs).

    >>> _rule_roam_attrs("Status:: open")
    '**Status**: open'
    """
    return _ROAM_ATTR.sub(lambda m: "**" + m.group(1) + "**:", s)


ROAM_RULES: list[tuple[str, Callable[[str], str]]] = [
    ("todos", _rule_roam_todos),
    ("embeds", _rule_roam_embeds),
    ("widgets", _rule_roam_widgets),
    ("blockrefs", _rule_roam_blockrefs),
    ("highlight", _rule_roam_highlight),
    ("attrs", _rule_roam_attrs),
]


def roam_to_md(s: str) -> str:
    """
    >>> roam_to_md("- {{[[TODO]]}} read ((ref1)) ^^now^^")
    '- [ ] read [[ref1]] ==now=='
    """
    if s is None:
        return None
    s = _sanitize(s)
    for _, rule in ROAM_RULES:
        s = rule(s)
    return s


# ---------------------------------------------------------------------------
# Zettelkasten BBCode grammar (public BBCode tags; reference analogue:
# /root/reference/src/jimmy/formats/zettelkasten.py:113-184).

_BB_SIMPLE = [
    (re.compile(r"\[b\](.*?)\[/b\]", re.S), r"**\1**"),
    (re.compile(r"\[i\](.*?)\[/i\]", re.S), r"*\1*"),
    (re.compile(r"\[s\](.*?)\[/s\]", re.S), r"~~\1~~"),
    (re.compile(r"\[u\](.*?)\[/u\]", re.S), r"<u>\1</u>"),
    (re.compile(r"\[code\](.*?)\[/code\]", re.S), r"`\1`"),
    (re.compile(r"\[q\](.*?)\[/q\]", re.S), r"> \1"),
]
_BB_URL_ARG = re.compile(r"\[url=([^\]]+)\](.*?)\[/url\]", re.S)
_BB_URL = re.compile(r"\[url\](.*?)\[/url\]", re.S)
_BB_IMG = re.compile(r"\[img\](.*?)\[/img\]", re.S)
_BB_H = re.compile(r"^\[h([1-6])\](.*?)\[/h\1\]\s*$", re.M)
_BB_LIST_ITEM = re.compile(r"^\[\*\] ?", re.M)
_BB_LIST_WRAP = re.compile(r"\[/?list\]\n?")


def _rule_bb_headings(s: str) -> str:
    """
    >>> _rule_bb_headings("[h2]Title[/h2]")
    '## Title'
    """
    return _BB_H.sub(lambda m: "#" * int(m.group(1)) + " " + m.group(2), s)


def _rule_bb_lists(s: str) -> str:
    """
    >>> _rule_bb_lists("[list]\\n[*] a\\n[*] b\\n[/list]")
    '- a\\n- b\\n'
    """
    return _BB_LIST_WRAP.sub("", _BB_LIST_ITEM.sub("- ", s))


def _rule_bb_links(s: str) -> str:
    """
    >>> _rule_bb_links("[url=http://x]lbl[/url] [url]http://y[/url]")
    '[lbl](http://x) <http://y>'
    """
    s = _BB_URL_ARG.sub(r"[\2](\1)", s)
    return _BB_URL.sub(r"<\1>", s)


def _rule_bb_img(s: str) -> str:
    """
    >>> _rule_bb_img("[img]pic.png[/img]")
    '![](pic.png)'
    """
    return _BB_IMG.sub(r"![](\1)", s)


def _rule_bb_inline(s: str) -> str:
    """
    >>> _rule_bb_inline("[b]x[/b] [i]y[/i] [code]z[/code]")
    '**x** *y* `z`'
    """
    for rx, repl in _BB_SIMPLE:
        s = rx.sub(repl, s)
    return s


BBCODE_RULES: list[tuple[str, Callable[[str], str]]] = [
    ("headings", _rule_bb_headings),
    ("lists", _rule_bb_lists),
    ("links", _rule_bb_links),
    ("img", _rule_bb_img),
    ("inline", _rule_bb_inline),
]


def bbcode_to_md(s: str) -> str:
    """
    >>> bbcode_to_md("[h1]T[/h1]\\n[list]\\n[*] [b]a[/b]\\n[/list]")
    '# T\\n- **a**\\n'
    """
    if s is None:
        return None
    s = _sanitize(s)
    for _, rule in BBCODE_RULES:
        s = rule(s)
    return s


# ---------------------------------------------------------------------------
# Ordered HTML -> Markdown filter pipeline (the reference's 20-pass shape:
# /root/reference/src/jimmy/md_lib/convert.py:80-95 runs a fixed-order list
# of HTML filters before pandoc; here the ordered passes do the whole
# conversion for the common tag subset, written from scratch).

_H_COMMENT = re.compile(r"<!--.*?-->", re.S)
_H_PRE = re.compile(r"<pre>\s*(?:<code>)?(.*?)(?:</code>)?\s*</pre>", re.S)
_H_BR = re.compile(r"<br\s*/?>")
_H_HR = re.compile(r"<hr\s*/?>")
_H_HEAD = re.compile(r"<h([1-6])>(.*?)</h\1>", re.S)
_H_BOLD = re.compile(r"<(b|strong)>(.*?)</\1>", re.S)
_H_ITAL = re.compile(r"<(i|em)>(.*?)</\1>", re.S)
_H_CODE = re.compile(r"<code>(.*?)</code>", re.S)
_H_LINK = re.compile(r'<a\s+href="([^"]*)"[^>]*>(.*?)</a>', re.S)
_H_IMG = re.compile(r'<img\s+src="([^"]*)"(?:\s+alt="([^"]*)")?[^>]*/?>')
_H_LI = re.compile(r"<li>\s*(.*?)\s*</li>", re.S)
_H_ROW = re.compile(r"<tr>(.*?)</tr>", re.S)
_H_CELL = re.compile(r"<t[dh]>\s*(.*?)\s*</t[dh]>", re.S)
_H_PARA = re.compile(r"</?p>")
_H_TAG = re.compile(r"</?[A-Za-z][^>]*>")
_H_BLANKS = re.compile(r"\n{3,}")

HTML_RULES: list[tuple[str, Callable[[str], str]]] = [
    ("comments", lambda s: _H_COMMENT.sub("", s)),
    ("breaks", lambda s: _H_HR.sub("\n---\n", _H_BR.sub("\n", s))),
    ("headings", lambda s: _H_HEAD.sub(
        lambda m: "\n" + "#" * int(m.group(1)) + " " + m.group(2).strip() + "\n", s)),
    ("bold", lambda s: _H_BOLD.sub(r"**\2**", s)),
    ("italic", lambda s: _H_ITAL.sub(r"*\2*", s)),
    ("code", lambda s: _H_CODE.sub(r"`\1`", s)),
    ("links", lambda s: _H_LINK.sub(r"[\2](\1)", s)),
    ("images", lambda s: _H_IMG.sub(
        lambda m: f"![{m.group(2) or ''}]({m.group(1)})", s)),
    ("rows", lambda s: _H_ROW.sub(
        lambda m: "| " + " | ".join(_H_CELL.findall(m.group(1))) + " |\n", s)),
    ("items", lambda s: _H_LI.sub(r"- \1\n", s)),
    ("paragraphs", lambda s: _H_PARA.sub("\n", s)),
    ("strip", lambda s: _H_TAG.sub("", s)),
]


def html_to_md(s: str) -> str:
    """Fixed-order HTML filter pipeline with <pre> shielding and entity
    unescape last (the reference's ordered-filter discipline).

    >>> html_to_md('<h2>T</h2><p><b>a</b> &amp; <a href="u">l</a></p>')
    '## T\\n\\n**a** & [l](u)'
    >>> html_to_md('<ul><li>x</li><li><i>y</i></li></ul>')
    '- x\\n- *y*'
    >>> html_to_md('<pre><code>a <b>raw</b></code></pre>')
    '```\\na <b>raw</b>\\n```'
    """
    if s is None:
        return None
    s = _sanitize(s)
    import html as _html

    spans: list[str] = []

    def shield(m: re.Match) -> str:
        spans.append(m.group(1))
        return f"\x00{len(spans) - 1}\x00"

    s = _H_PRE.sub(shield, s)
    for _, rule in HTML_RULES:
        s = rule(s)
    s = _html.unescape(s)
    s = _H_BLANKS.sub("\n\n", s).strip()
    return re.sub(
        r"\x00(\d+)\x00",
        lambda m: "```\n" + spans[int(m.group(1))] + "\n```",
        s,
    )


def html_to_md_udf() -> Column:
    @F.pandas_udf("string")
    def conv(texts: pd.Series) -> pd.Series:
        return texts.map(html_to_md)

    return conv


# ---------------------------------------------------------------------------
# ENML (Evernote markup) -> Markdown: a STREAMING stack-based state machine
# over stdlib HTMLParser — the same SAX shape as the reference's 440-line
# ENEX converter (/root/reference/src/jimmy/md_lib/evernote.py:52-491),
# written from scratch for the common ENML tag subset. Formatting state
# lives on an explicit stack (nested lists, bold/italic wrapping, table
# rows), mirroring the reference's formatting-stack discipline.

from html.parser import HTMLParser  # noqa: E402 — optional dep pattern


class _EnmlHandler(HTMLParser):
    _WRAP = {"b": "**", "strong": "**", "i": "*", "em": "*", "code": "`"}

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.out: list[str] = []
        self.list_stack: list[str] = []  # "ul" / "ol"
        self.cells: list[str] | None = None  # inside <tr>
        self.in_cell = False
        self.row_count = 0

    # -- helpers ------------------------------------------------------
    def _emit(self, s: str) -> None:
        if self.cells is not None:
            # inside a row: text belongs to the open cell; text BETWEEN
            # cells (pretty-printing whitespace) is dropped, so empty
            # cells survive and indentation never mints phantom columns
            if self.in_cell:
                self.cells[-1] += s
        else:
            self.out.append(s)

    def _newline(self) -> None:
        # no-op mid-row: a block boundary inside a table cell must not
        # write to self.out (it would be emitted BEFORE the row line)
        if self.cells is not None:
            return
        if self.out and not self.out[-1].endswith("\n"):
            self.out.append("\n")

    # -- SAX events ---------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        a = dict(attrs)
        if tag in self._WRAP:
            self._emit(self._WRAP[tag])
        elif tag in ("h1", "h2", "h3", "h4", "h5", "h6"):
            self._newline()
            self._emit("#" * int(tag[1]) + " ")
        elif tag in ("ul", "ol"):
            self.list_stack.append(tag)
        elif tag == "li":
            self._newline()
            depth = max(len(self.list_stack) - 1, 0)
            marker = "1." if (self.list_stack and self.list_stack[-1] == "ol") else "-"
            self._emit("  " * depth + marker + " ")
        elif tag == "en-todo":
            self._newline()
            self._emit("- [x] " if a.get("checked") == "true" else "- [ ] ")
        elif tag == "en-media":
            self._emit(f"![]({a.get('hash', '')})")
        elif tag == "a":
            self._emit("[")
            self._href = a.get("href", "")
        elif tag == "table":
            self.row_count = 0
        elif tag == "tr":
            if self.out and not self.out[-1].endswith("\n"):
                self.out.append("\n")
            self.cells = []
            self.in_cell = False
        elif tag in ("td", "th"):
            if self.cells is not None:
                self.cells.append("")
                self.in_cell = True
        elif tag == "br":
            # a line break inside a md table cell becomes a space (md rows
            # are single-line); elsewhere it is a newline
            if self.cells is not None:
                self._emit(" ")
            else:
                self._newline()

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.handle_starttag(tag, attrs)

    def handle_endtag(self, tag: str) -> None:
        if tag in self._WRAP:
            self._emit(self._WRAP[tag])
        elif tag in ("ul", "ol"):
            if self.list_stack:
                self.list_stack.pop()
        elif tag in ("h1", "h2", "h3", "h4", "h5", "h6", "div", "p"):
            self._newline()
        elif tag == "a":
            self._emit(f"]({getattr(self, '_href', '')})")
        elif tag in ("td", "th"):
            self.in_cell = False
        elif tag == "tr" and self.cells is not None:
            cells, self.cells = self.cells, None
            self.in_cell = False
            if cells:  # a row with no td/th emits nothing
                self.out.append(
                    "| " + " | ".join(c.strip() for c in cells) + " |\n"
                )
                if self.row_count == 0:
                    self.out.append(
                        "| " + " | ".join("---" for _ in cells) + " |\n"
                    )
                self.row_count += 1

    def handle_data(self, data: str) -> None:
        self._emit(data)

    def result(self) -> str:
        return "".join(self.out).strip()


def enml_to_md(s: str) -> str:
    """Streaming ENML -> Markdown.

    >>> enml_to_md('<en-note><h2>T</h2><div><b>x</b> and <i>y</i></div></en-note>')
    '## T\\n**x** and *y*'
    >>> enml_to_md('<en-note><en-todo checked="true"/>done<en-todo/>open</en-note>')
    '- [x] done\\n- [ ] open'
    >>> print(enml_to_md('<en-note><ul><li>a</li><ol><li>b</li></ol></ul></en-note>'))
    - a
      1. b
    >>> print(enml_to_md('<en-note><table><tr><td>a</td><td>b</td></tr><tr><td>1</td><td>2</td></tr></table></en-note>'))
    | a | b |
    | --- | --- |
    | 1 | 2 |
    """
    if s is None:
        return None
    s = _sanitize(s)
    h = _EnmlHandler()
    h.feed(s)
    h.close()
    return h.result()


# ---------------------------------------------------------------------------
# ColorNote checklists (reference: md_lib/colornote.py:10-29) and CherryTree
# bullet normalization (formats/cherrytree.py:16,36-75) — the two remaining
# small grammars from SURVEY §2.7's table, public syntaxes, from scratch.

_CN_DONE = re.compile(r"^\[V\] ?", re.M)
_CN_OPEN = re.compile(r"^\[ \] ?", re.M)


def colornote_to_md(s: str) -> str:
    """ColorNote checklist lines: '[V]' = checked, '[ ]' = open.

    >>> colornote_to_md("[V] milk\\n[ ] bread")
    '- [x] milk\\n- [ ] bread'
    """
    if s is None:
        return None
    s = _sanitize(s)
    return _CN_OPEN.sub("- [ ] ", _CN_DONE.sub("- [x] ", s))


# CherryTree export bullet glyphs per nesting level -> md markers
_CT_BULLETS = "•◦▪▫►▻"
_CT_BULLET = re.compile(
    r"^(\s*)([" + _CT_BULLETS + r"]) ", re.M
)


def cherrytree_to_md(s: str) -> str:
    """CherryTree bullet glyphs (one glyph per nesting depth) -> indented
    md dashes; depth comes from the glyph, not the leading whitespace.

    >>> cherrytree_to_md("• top\\n◦ second\\n▪ third")
    '- top\\n  - second\\n    - third'
    """
    if s is None:
        return None
    s = _sanitize(s)
    return _CT_BULLET.sub(
        lambda m: "  " * _CT_BULLETS.index(m.group(2)) + "- ", s
    )


def colornote_to_md_udf() -> Column:
    @F.pandas_udf("string")
    def conv(texts: pd.Series) -> pd.Series:
        return texts.map(colornote_to_md)

    return conv


def cherrytree_to_md_udf() -> Column:
    @F.pandas_udf("string")
    def conv(texts: pd.Series) -> pd.Series:
        return texts.map(cherrytree_to_md)

    return conv


def enml_to_md_udf() -> Column:
    @F.pandas_udf("string")
    def conv(texts: pd.Series) -> pd.Series:
        return texts.map(enml_to_md)

    return conv


def roam_to_md_udf() -> Column:
    @F.pandas_udf("string")
    def conv(texts: pd.Series) -> pd.Series:
        return texts.map(roam_to_md)

    return conv


def bbcode_to_md_udf() -> Column:
    @F.pandas_udf("string")
    def conv(texts: pd.Series) -> pd.Series:
        return texts.map(bbcode_to_md)

    return conv
