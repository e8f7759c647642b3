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
_CODEBLOCK = re.compile(r"^'''\n(.*?)\n'''$", re.M | re.S)
_HEADING = re.compile(r"^(={2,6}) (.+?) ={2,6}\s*$", re.M)
# the four zim checkbox states (reference checklist_re, zim.py:16):
# ' ' open, '>'/'<' moved (render open), '*'/'x' done; indentation kept
_CHECKLIST = re.compile(r"^( *)\[([ <>*x])\] ", re.M)
_TABLIST = re.compile(r"^(\t+)(?=\* )", re.M)
_ITALIC = re.compile(r"(?<!:)//(.+?)//")
_HIGHLIGHT = re.compile(r"__(.+?)__")
_SUPER = re.compile(r"\^\{(.+?)\}")
_SUB = re.compile(r"_\{(.+?)\}")
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
    >>> _rule_checklists("[ ] u\\n    [>] np\\n[x] d")
    '- [ ] u\\n    - [ ] np\\n- [x] d'
    """
    return _CHECKLIST.sub(
        lambda m: m.group(1)
        + ("- [x] " if m.group(2) in "*x" else "- [ ] "),
        s,
    )


def _rule_lists(s: str) -> str:
    """Tab-indented zim bullets -> 4-space md indents.

    >>> _rule_lists("* a\\n\\t* b")
    '* a\\n    * b'
    """
    return _TABLIST.sub(lambda m: "    " * len(m.group(1)), s)


def _rule_italic(s: str) -> str:
    """``//`` emphasis; a ``//`` right after ``:`` never OPENS a span, so
    bare URLs (http://...) survive untouched.

    >>> _rule_italic("a //b// c")
    'a *b* c'
    >>> _rule_italic("see http://x.de/a and http://y.de/.")
    'see http://x.de/a and http://y.de/.'
    """
    return _ITALIC.sub(r"*\1*", s)


def _rule_highlight(s: str) -> str:
    """zim __highlight__ -> ==highlight== (zim.py doctest semantics).

    >>> _rule_highlight("**__hot__**")
    '**==hot==**'
    """
    return _HIGHLIGHT.sub(r"==\1==", s)


def _rule_scripts(s: str) -> str:
    """
    >>> _rule_scripts("super^{script}, sub_{script}")
    'super^script^, sub~script~'
    """
    return _SUB.sub(r"~\1~", _SUPER.sub(r"^\1^", s))


def _clean_target(t: str) -> str:
    t = t.split("?", 1)[0]
    return t[2:] if t.startswith("./") else t


def _rule_links(s: str) -> str:
    """zim links are [[target|label]]; bare targets keep the raw text as
    the label but the url drops a leading './' (zim.py doctests).

    >>> _rule_links("see [[page|the page]] and [[other]]")
    'see [the page](page) and [other](other)'
    >>> _rule_links("[[./0.mp3]]")
    '[./0.mp3](0.mp3)'
    """
    s = _LINK_LABELED.sub(r"[\2](\1)", s)
    return _LINK_BARE.sub(lambda m: f"[{m.group(1)}]({_clean_target(m.group(1))})", s)


def _rule_images(s: str) -> str:
    """{{target}} -> ![basename](clean target); './' and '?width=...'
    stripped (zim.py doctest semantics).

    >>> _rule_images("pic {{./img.png?width=600}}")
    'pic ![img.png](img.png)'
    """

    def conv(m: re.Match) -> str:
        tgt = _clean_target(m.group(1))
        return f"![{tgt.rsplit('/', 1)[-1]}]({tgt})"

    return _IMAGE.sub(conv, s)


def _sanitize(s: str) -> str:
    """Strip NUL bytes up front: NUL is never legal text content and is
    the shield-placeholder sentinel — raw NULs in input could otherwise
    crash or inject into the unshield substitution ("\x005\x00" would
    dereference span 5)."""
    return s.replace("\x00", "")


# fixed order; verbatim/code spans shielded around the whole pipeline
RULES: list[tuple[str, Callable[[str], str]]] = [
    ("headings", _rule_headings),
    ("checklists", _rule_checklists),
    ("lists", _rule_lists),
    ("links", _rule_links),
    ("images", _rule_images),
    ("italic", _rule_italic),
    ("highlight", _rule_highlight),
    ("scripts", _rule_scripts),
]


def wiki_to_md(s: str) -> str:
    """Full ordered pipeline with verbatim + code-block shielding.

    >>> print(wiki_to_md("=== T ===\\n[ ] do //it// ''//not this//''"))
    #### T
    - [ ] do *it* `//not this//`
    >>> wiki_to_md("'''\\nsome code\\nblock\\n'''")
    '```\\nsome code\\nblock\\n```'
    """
    if s is None:
        return None
    s = _sanitize(s)
    spans: list[tuple[str, str]] = []  # (kind, payload)

    def shield(kind: str):
        def sub(m: re.Match) -> str:
            spans.append((kind, m.group(1)))
            return f"\x00{len(spans) - 1}\x00"

        return sub

    s = _CODEBLOCK.sub(shield("block"), s)
    s = _VERBATIM.sub(shield("inline"), s)
    for _, rule in RULES:
        s = rule(s)

    def unshield(m: re.Match) -> str:
        kind, payload = spans[int(m.group(1))]
        if kind == "block":
            return f"```\n{payload}\n```"
        return f"`{payload}`"

    return re.sub(r"\x00(\d+)\x00", unshield, s)


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
_TID_LIST = re.compile(r"^([*#>]+) ", re.M)
_TID_BOLD = re.compile(r"''(.+?)''")
_TID_ITALIC = re.compile(r"(?<!:)//(.+?)//")
_TID_UNDER = re.compile(r"__(.+?)__")
_TID_HR = re.compile(r"^----+\s*$", re.M)
# dashes must have a real non-dash neighbor on both sides so hr lines
# ('---' alone on a line, including ones this rule just emitted) survive
_TID_MDASH = re.compile(r"(?<=[^-\n])---(?=[^-\n])|^---(?=[^-\n])", re.M)
_TID_NDASH = re.compile(r"(?<=[^-\n])--(?=[^-\n])|^--(?=[^-\n])", re.M)
_TID_QUOTE = re.compile(r"^<<<\n(.*?)\n<<<([^\n]*)$", re.M | re.S)
_TID_IMG = re.compile(
    r"\[img(?:\s+[^\[\]]*)?\[(?:([^\]|]*)\|)?([^\]]+)\]\]"
)
_TID_EXT = re.compile(r"\[ext\[(?:([^\]|]*)\|)?([^\]]+)\]\]")
_TID_LINK_LABELED = re.compile(r"\[\[([^\]|]+)\|([^\]]+)\]\]")
_TID_LINK_BARE = re.compile(r"\[\[([^\]|]+)\]\]")
_TID_TABLE_BLOCK = re.compile(r"(?:^\|[^\n]*\|h?(?:\n|$))+", re.M)
_SCHEME = re.compile(r"^(?:[a-z][a-z0-9+.-]*:|#)")


def _rule_tid_headings(s: str) -> str:
    """'!' count = level (tiddlywiki.py doctests).

    >>> _rule_tid_headings("!! Sub")
    '## Sub'
    """
    return _TID_HEADING.sub(lambda m: "#" * len(m.group(1)) + " " + m.group(2), s)


def _rule_tid_lists(s: str) -> str:
    """Nested '*'/'#'/'>' run-length markers -> 4-space-indented md; the
    marker type comes from the LAST character (mixed runs like '*#' nest
    an ordered item under a bullet — tiddlywiki.py doctests).

    >>> _rule_tid_lists("# one\\n## one.a\\n* b\\n** b.a")
    '1. one\\n    1. one.a\\n* b\\n    * b.a'
    >>> _rule_tid_lists("* Do\\n*# Eat\\n**> A quote")
    '* Do\\n    1. Eat\\n        > A quote'
    """

    def conv(m: re.Match) -> str:
        run = m.group(1)
        marker = {"#": "1.", "*": "*", ">": ">"}[run[-1]]
        return "    " * (len(run) - 1) + marker + " "

    return _TID_LIST.sub(conv, s)


def _rule_tid_rules_and_dashes(s: str) -> str:
    """'----' lines -> md hr; standalone '---'/'--' -> em/en dashes.
    Runs on raw wikitext BEFORE tables (md separator rows contain '---').

    >>> _rule_tid_rules_and_dashes("----\\n---")
    '---\\n---'
    >>> _rule_tid_rules_and_dashes("* -- n-dash\\n* --- m-dash")
    '* – n-dash\\n* — m-dash'
    """
    s = _TID_HR.sub("---", s)
    s = _TID_MDASH.sub("—", s)
    return _TID_NDASH.sub("–", s)


def _rule_tid_quotes(s: str) -> str:
    """<<< block quotes; a trailing citation on the closing fence becomes
    an italic quote line (tiddlywiki.py doctests).

    >>> _rule_tid_quotes("<<<\\nQuoted\\nlines\\n<<<")
    '\\n> Quoted\\n> lines'
    >>> _rule_tid_quotes("<<<\\nBicycle for the mind\\n<<< S. Jobs")
    '\\n> Bicycle for the mind\\n> *S. Jobs*'
    """

    def conv(m: re.Match) -> str:
        body = "\n".join("> " + ln for ln in m.group(1).split("\n"))
        cite = m.group(2).strip()
        if cite:
            body += f"\n> *{cite}*"
        return "\n" + body

    return _TID_QUOTE.sub(conv, s)


def _rule_tid_emphasis(s: str) -> str:
    """'' bold, // italic (never opening right after ':', so URLs
    survive), __ underline -> ++ (tiddlywiki.py doctest semantics).

    >>> _rule_tid_emphasis("''b'' //i// __u__")
    '**b** *i* ++u++'
    >>> _rule_tid_emphasis("from http://h/MyApp to http://h/.")
    'from http://h/MyApp to http://h/.'
    """
    s = _TID_BOLD.sub(r"**\1**", s)
    s = _TID_ITALIC.sub(r"*\1*", s)
    return _TID_UNDER.sub(r"++\1++", s)


def _wrap_url(url: str) -> str:
    return f"<{url}>" if (" " in url or "\\" in url) else url


def _rule_tid_images(s: str) -> str:
    """[img[...]] with optional tooltip and ignored attributes.

    >>> _rule_tid_images("[img[Jack.jpg]] [img[tip|b.jpg]]")
    '![Jack.jpg](Jack.jpg) ![tip](b.jpg)'
    >>> _rule_tid_images("[img width=32 class='x' [Jack.jpg]]")
    '![Jack.jpg](Jack.jpg)'
    """
    return _TID_IMG.sub(
        lambda m: f"![{m.group(1) or m.group(2)}]({m.group(2)})", s
    )


def _rule_tid_links(s: str) -> str:
    """tiddly [[label|target]] (label first — opposite of zim). Targets
    without a URL scheme are internal tiddler titles and get the
    ``tiddlywiki://`` prefix (tiddlywiki.py doctest semantics);
    [ext[...|path]] is always an external path, <>-wrapped when it
    contains spaces or backslashes.

    >>> _rule_tid_links("[[the page|page]] and [[other]]")
    '[the page](tiddlywiki://page) and [other](tiddlywiki://other)'
    >>> _rule_tid_links("[[TW5|https://tiddlywiki.com/]]")
    '[TW5](https://tiddlywiki.com/)'
    >>> _rule_tid_links("[ext[Open|../README Space.md]]")
    '[Open](<../README Space.md>)'
    """
    s = _TID_EXT.sub(
        lambda m: f"[{m.group(1) or m.group(2)}]({_wrap_url(m.group(2))})", s
    )

    def link(label: str, target: str) -> str:
        if _SCHEME.match(target):
            return f"[{label}]({target})"
        return f"[{label}](tiddlywiki://{target})"

    s = _TID_LINK_LABELED.sub(lambda m: link(m.group(1), m.group(2)), s)
    return _TID_LINK_BARE.sub(lambda m: link(m.group(1), m.group(1)), s)


def _rule_tid_tables(s: str) -> str:
    """Wikitext table block -> md table. A row ending in '|h' is the
    header; so is a first row whose cells all start with '!'
    (tiddlywiki.py doctest); otherwise the first row becomes the header.

    >>> print(_rule_tid_tables("|a|b|h\\n|1|2|"))
    | a | b |
    | --- | --- |
    | 1 | 2 |
    >>> print(_rule_tid_tables("|!Cell1 |!Cell2 |\\n|Cell3 |Cell4 |\\n"))
    | Cell1 | Cell2 |
    | --- | --- |
    | Cell3 | Cell4 |
    <BLANKLINE>
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
            if rows[0] and all(c.startswith("!") for c in rows[0]):
                header = [c[1:].strip() for c in rows[0]]
            else:
                header = rows[0]
            rows = rows[1:]
        out = ["| " + " | ".join(header) + " |"]
        out.append("| " + " | ".join("---" for _ in header) + " |")
        for r in rows:
            out.append("| " + " | ".join(r) + " |")
        return "\n".join(out) + trailing

    return _TID_TABLE_BLOCK.sub(conv, s)


TIDDLY_RULES: list[tuple[str, Callable[[str], str]]] = [
    # dashes run on RAW text (md table separators contain '---')
    ("dashes", _rule_tid_rules_and_dashes),
    ("quotes", _rule_tid_quotes),
    ("tables", _rule_tid_tables),
    ("lists", _rule_tid_lists),
    ("headings", _rule_tid_headings),
    ("images", _rule_tid_images),
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
_H_ROW = re.compile(r"<tr[^>]*>(.*?)</tr>", re.S)
_H_CELL = re.compile(r"<t[dh][^>]*>\s*(.*?)\s*</t[dh]>", re.S)
_H_PARA = re.compile(r"</?p>")
_H_TAG = re.compile(r"</?[A-Za-z][^>]*>")
_H_BLANKS = re.compile(r"\n{3,}")
# checklist divs (reference html_filter.py:48-63 div_checklists): a
# class="checklist" container whose items are checked/unchecked divs
_H_CHECKLIST = re.compile(
    r'<div\s+class="checklist">\s*'
    r'((?:<div\s+class="(?:un)?checked">.*?</div>\s*)+)'
    r"</div>",
    re.S,
)
_H_CHECKITEM = re.compile(
    r'<div\s+class="(un)?checked">\s*(.*?)\s*</div>', re.S
)
# adjacent same-tag formatting runs (html_filter.py:142
# merge_consecutive_formatting, the immediate-sibling case)
_H_MERGE = re.compile(r"</(b|strong|i|em|u|s|code)><\1>")
# empty inline markup (html_filter.py:428 remove_empty_markup)
_H_EMPTY = re.compile(r"<(b|strong|i|em|u|s|mark|code)>(\s*)</\1>")
# underline / strikethrough / highlight tags and their styled-span forms
# (html_filter.py:676 underline, :470 strikethrough, :66 highlighting)
_H_UNDER = re.compile(
    r"<(?:u|ins)>(.*?)</(?:u|ins)>"
    r'|<span style="[^"]*underline[^"]*">(.*?)</span>',
    re.S,
)
_H_STRIKE = re.compile(
    r"<(?:s|del|strike)>(.*?)</(?:s|del|strike)>"
    r'|<span style="[^"]*line-through[^"]*">(.*?)</span>',
    re.S,
)
_H_MARK = re.compile(r"<mark[^>]*>(.*?)</mark>", re.S)
# iframes -> links (html_filter.py:72 iframes_to_links)
_H_IFRAME = re.compile(r'<iframe\s+src="([^"]*)"[^>]*>(.*?)</iframe>', re.S)
_H_IFRAME_EMPTY = re.compile(r"<iframe(?:\s+[^>]*)?></iframe>")
# headings whose ENTIRE content is bold: drop the redundant bold
# (html_filter.py:397 remove_bold_header)
_H_BOLD_HEAD = re.compile(
    r"<h([1-6])>\s*<(b|strong)>(.*?)</\2>\s*</h\1>", re.S
)
# immediately-repeated identical links (html_filter.py:413
# remove_duplicated_links)
_H_DUP_LINK = re.compile(
    r'(<a\s+href="([^"]*)"[^>]*>(.*?)</a>)\s*<a\s+href="\2"[^>]*>\3</a>', re.S
)
# whitespace inside inline formatting (html_filter.py:711
# unwrap_inline_whitespace + :216 multiline_markup): md emphasis may
# neither touch spaces nor span lines — move edge whitespace OUT of the
# tag and collapse interior runs (incl. newlines) to single spaces
_H_INLINE_WS = re.compile(r"<(b|strong|i|em)>(\s*)(.*?)(\s*)</\1>", re.S)


def _pass_inline_whitespace(s: str) -> str:
    def conv(m: re.Match) -> str:
        tag = m.group(1)
        inner = re.sub(r"\s+", " ", m.group(3))
        lead = " " if m.group(2) else ""
        trail = " " if m.group(4) else ""
        return f"{lead}<{tag}>{inner}</{tag}>{trail}"

    return _H_INLINE_WS.sub(conv, s)
_H_TABLE = re.compile(r"<table[^>]*>(.*?)</table>", re.S)
_H_TBL_UNWRAP = re.compile(r"</?(?:div|span|pre|thead|tbody)[^>]*>")
_H_TBL_HEAD = re.compile(r"<(/?)h[1-6]>")
_H_TBL_BREAK = re.compile(r"<br\s*/?>|</?p>|\n")


def _pass_checklists(s: str) -> str:
    """<div class="checklist"> containers -> md task lists."""

    def conv(m: re.Match) -> str:
        items = [
            ("- [ ] " if unchecked else "- [x] ") + text
            for unchecked, text in _H_CHECKITEM.findall(m.group(1))
        ]
        return "\n" + "\n".join(items) + "\n"

    return _H_CHECKLIST.sub(conv, s)


def _pass_merge_formatting(s: str) -> str:
    """Merge immediately-adjacent same-tag formatting (</b><b> -> gone)
    so exporters that split every word into its own <b> don't produce
    ``**a****b**``; loops to a fixpoint like the reference's soup pass."""
    prev = None
    while prev != s:
        prev = s
        s = _H_MERGE.sub("", s)
    return s


def _pass_tables(s: str) -> str:
    """Streamlined md tables (reference html_filter.py:568
    streamline_tables): inside each <table>, wrapper tags (div/span/pre/
    thead/tbody) are unwrapped, headings demoted to <strong>, line breaks
    inside cells become spaces (md rows are single-line), and the first
    row is promoted to the header row."""

    def conv(m: re.Match) -> str:
        inner = _H_TBL_UNWRAP.sub("", m.group(1))
        inner = _H_TBL_HEAD.sub(lambda h: f"<{h.group(1)}strong>", inner)
        inner = _H_TBL_BREAK.sub(" ", inner)
        lines = []
        for ri, row in enumerate(_H_ROW.findall(inner)):
            cells = [" ".join(c.split()) for c in _H_CELL.findall(row)]
            lines.append("| " + " | ".join(cells) + " |")
            if ri == 0:
                lines.append("| " + " | ".join("---" for _ in cells) + " |")
        return "\n" + "\n".join(lines) + "\n"

    return _H_TABLE.sub(conv, s)


def _pass_iframes(s: str) -> str:
    """iframe -> plain link; body text wins over the src as the label,
    src-less iframes vanish (reference iframes_to_links doctests)."""

    def conv(m: re.Match) -> str:
        src, body = m.group(1), m.group(2)
        label = body.strip() if body and body.strip() not in ("", "&nbsp;") else src
        return f'<a href="{src}">{label}</a>'

    return _H_IFRAME_EMPTY.sub("", _H_IFRAME.sub(conv, s))


# ---------------------------------------------------------------------------
# App-specific HTML passes (the reference runs per-app filter lists before
# the generic ones: html_filter.py:101 link_internal_headings, :197
# merge_single_element_lists, :231-383 nimbus, :386 notion, :490-562
# synology, :749-787 upnote). Re-expressed as ordered regex/string passes
# over the same documented behaviors — no soup, no pandoc.

# nimbus highlights: class="nn-marker" spans (old editor) and
# data-highlight/-block-background/-comment-color/-palette-bg-rgb
# attributes (new editor) wrap their content in <mark>; transparent/white
# backgrounds are not highlights (html_filter.py:231-246)
_H_NIMBUS_MARK_SPAN = re.compile(
    r'<span\s+class="nn-marker"[^>]*>(.*?)</span>', re.S
)
_H_NIMBUS_MARK_ATTR = re.compile(
    r"<(span|div|td)\s+[^>]*data-(?:highlight|block-background|comment-color"
    r'|palette-bg-rgb)="([^"]*)"[^>]*>(.*?)</\1>',
    re.S,
)


def _pass_nimbus_marks(s: str) -> str:
    s = _H_NIMBUS_MARK_SPAN.sub(r"<mark>\1</mark>", s)

    def conv(m: re.Match) -> str:
        if m.group(2) in ("transparent", "white"):
            return m.group(0)
        return f"<mark>{m.group(3)}</mark>"

    return _H_NIMBUS_MARK_ATTR.sub(conv, s)


# nimbus note links: "mention" spans become nimbusnote:// links
# (html_filter.py:248-266); the name attribute wins over the span text
_H_NIMBUS_MENTION = re.compile(
    r'<span\s+class="mention-link"([^>]*)>(.*?)</span>', re.S
)
_H_MENTION_NAME = re.compile(r'data-mention-name="([^"]*)"')


def _pass_nimbus_note_links(s: str) -> str:
    def conv(m: re.Match) -> str:
        name_m = _H_MENTION_NAME.search(m.group(1))
        name = name_m.group(1) if name_m and name_m.group(1) else m.group(2)
        if not name:
            return ""
        from urllib.parse import quote

        return f'<a href="nimbusnote://{quote(name)}">{m.group(2)}</a>'

    return _H_NIMBUS_MENTION.sub(conv, s)


# nimbus lists: every list arrives as a flat <ul> whose items carry the
# type (outline-list-item / list-item-number / -bullet / -checkbox) and
# the nesting (indent-X / level-X) in their class attr
# (html_filter.py:268-345) -> emit the nested md list directly
_H_NIMBUS_UL = re.compile(r"<ul[^>]*>(.*?)</ul>", re.S)
_H_NIMBUS_LI = re.compile(r"<li\b([^>]*)>(.*?)</li>", re.S)
_H_CLASS_ATTR = re.compile(r'class="([^"]*)"')


def _pass_nimbus_lists(s: str) -> str:
    def conv(m: re.Match) -> str:
        body = m.group(1)
        if "outline-list-item" not in body and "list-item-" not in body:
            return m.group(0)
        lines = []
        for attrs, text in _H_NIMBUS_LI.findall(body):
            cls_m = _H_CLASS_ATTR.search(attrs)
            classes = cls_m.group(1).split() if cls_m else []
            level = 0
            for c in classes:
                if c.startswith(("indent-", "level-")):
                    level = int(c.split("-", 1)[1])
            if "list-item-number" in classes:
                marker = "1."
            elif "list-item-checkbox" in classes:
                checked = 'data-checked="true"' in attrs or "nn-checked" in classes
                marker = "- [x]" if checked else "- [ ]"
            else:  # outline-list-item / list-item-bullet / unknown
                marker = "-"
            lines.append("    " * level + f"{marker} {text.strip()}")
        return "\n" + "\n".join(lines) + "\n"

    return _H_NIMBUS_UL.sub(conv, s)


# nimbus tables ship a spreadsheet chrome: a tfoot, a first row of column
# letters (A, B, ...) and two leading columns (row numbers / empty) that
# must all be stripped — with the reference's sanity checks, so an "old
# editor" table passes through untouched (html_filter.py:347-376)
_H_TFOOT = re.compile(r"<tfoot[^>]*>.*?</tfoot>", re.S)
_H_ROW_FULL = re.compile(r"<tr[^>]*>.*?</tr>", re.S)
_H_TD_FULL = re.compile(r"<td[^>]*>.*?</td>", re.S)


def _pass_nimbus_tables(s: str) -> str:
    def conv(m: re.Match) -> str:
        inner = _H_TFOOT.sub("", m.group(1))
        rows = _H_ROW_FULL.findall(inner)
        if not rows:
            return f"<table>{inner}</table>"
        for ri, row in enumerate(rows):
            for ci, cell in enumerate(_H_TD_FULL.findall(row)):
                text = _H_TAG.sub("", cell).strip()
                if ri == 0 and text and not text.isalpha():
                    return m.group(0)  # old table (first row): skip
                if ci in (0, 1) and text and not text.isdigit():
                    return m.group(0)  # old table (first columns): skip
        kept = []
        for row in rows[1:]:
            cells = _H_TD_FULL.findall(row)
            kept.append("<tr>" + "".join(cells[2:]) + "</tr>")
        return "<table>" + "".join(kept) + "</table>"

    return _H_TABLE.sub(conv, s)


# notion checklists: <ul class="to-do-list"> items carry their state in a
# checkbox div (class "checkbox-on"/"checkbox-off", html_filter.py:386-397)
# -> rewritten to the div-checklist form the generic pass converts
_H_NOTION_UL = re.compile(
    r'<ul\s+[^>]*class="[^"]*to-do-list[^"]*"[^>]*>(.*?)</ul>', re.S
)
_H_NOTION_LI = re.compile(
    r'<li[^>]*>\s*<div\s+class="checkbox(?:\s+checkbox-(on|off))?"[^>]*>'
    r"\s*</div>(.*?)</li>",
    re.S,
)


def _pass_notion_todo_lists(s: str) -> str:
    def conv(m: re.Match) -> str:
        items = [
            '<div class="{}">{}</div>'.format(
                "checked" if state == "on" else "unchecked", text.strip()
            )
            for state, text in _H_NOTION_LI.findall(m.group(1))
        ]
        return '<div class="checklist">' + "".join(items) + "</div>"

    return _H_NOTION_UL.sub(conv, s)


# upnote: shine-highlight spans are highlights (html_filter.py:766-770);
# checklist state lives in li[data-checked] with the text wrapped in
# div/pre/span that must be unwrapped (:772-787, reference doctest:
# '<ul><li data-checked="false"><div>Budget?</div></li></ul>' ->
# checklist li with an unchecked input)
_H_UPNOTE_HL = re.compile(
    r'<(\w+)\s+class="shine-highlight[^"]*"[^>]*>(.*?)</\1>', re.S
)
_H_UPNOTE_UL = re.compile(r"<ul[^>]*>(.*?)</ul>", re.S)
_H_UPNOTE_LI = re.compile(r'<li\s+[^>]*data-checked="(true|false)"[^>]*>(.*?)</li>', re.S)
_H_UNWRAP_DPS = re.compile(r"</?(?:div|pre|span)[^>]*>")


def _pass_upnote_checklists(s: str) -> str:
    s = _H_UPNOTE_HL.sub(r"<mark>\2</mark>", s)

    def conv(m: re.Match) -> str:
        items = _H_UPNOTE_LI.findall(m.group(1))
        if not items:
            return m.group(0)
        divs = [
            '<div class="{}">{}</div>'.format(
                "checked" if state == "true" else "unchecked",
                _H_UNWRAP_DPS.sub("", text).strip(),
            )
            for state, text in items
        ]
        return '<div class="checklist">' + "".join(divs) + "</div>"

    return _H_UPNOTE_UL.sub(conv, s)


# synology note station: checklists are flat divs — the level is the
# "padding-left" style (multiples of 30px), the state the input's
# -checked class (html_filter.py:490-551) -> nested md task list; image
# srcs hide in the "ref" attribute behind a transparent-gif placeholder
# (:554-562)
_H_SYNO_ITEM = re.compile(
    r'<div\s+style="[^"]*padding-left:\s*(\d+)px[^"]*"[^>]*>\s*'
    r'<input\s+class="syno-notestation-editor-checkbox(-checked)?"[^>]*/?>'
    r"(.*?)</div>",
    re.S,
)
_H_SYNO_IMG = re.compile(r"<img\b[^>]*syno-notestation-image-object[^>]*>")
_H_REF_ATTR = re.compile(r'ref="([^"]*)"')
_H_SRC_ATTR = re.compile(r'src="([^"]*)"')


def _pass_synology(s: str) -> str:
    def item(m: re.Match) -> str:
        level = int(m.group(1)) // 30
        box = "- [x]" if m.group(2) else "- [ ]"
        return "\n" + "    " * level + f"{box} {m.group(3).strip()}"

    s = _H_SYNO_ITEM.sub(item, s)

    def img(m: re.Match) -> str:
        src = _H_SRC_ATTR.search(m.group(0))
        ref = _H_REF_ATTR.search(m.group(0))
        if (
            ref is not None
            and src is not None
            and src.group(1) == "webman/3rdparty/NoteStation/images/transparent.gif"
        ):
            return f'<img src="{ref.group(1)}">'
        return m.group(0)

    return _H_SYNO_IMG.sub(img, s)


# single-item lists merge into the preceding list of the same kind
# (notion/odt exports split lists item by item, html_filter.py:197-210);
# fixpoint loop so an item-per-list chain collapses to one list
_H_SINGLE_LIST = re.compile(
    r"</(ul|ol)>\s*<\1[^>]*>\s*(<li\b(?:(?!</?li\b).)*?</li>)\s*</\1>", re.S
)


def _pass_merge_single_lists(s: str) -> str:
    prev = None
    while prev != s:
        prev = s
        s = _H_SINGLE_LIST.sub(r"\2</\1>", s)
    return s


# internal links point at element ids; only heading targets survive in
# markdown, rewritten to the pandoc-style header id (html_filter.py:101-120
# + md_lib/text.py to_markdown_header_id); heading attrs are then stripped
# so the generic heading pass picks them up
_H_HEAD_WITH_ID = re.compile(
    r'<h([1-6])\b[^>]*\bid="([^"]*)"[^>]*>(.*?)</h\1>', re.S
)
_H_HEAD_ATTRS = re.compile(r"<h([1-6])\b[^>]*>")


def _md_header_id(text: str) -> str:
    t = _H_TAG.sub("", text)
    t = re.sub(r"[^a-z0-9 _-]", "", t.lower()).strip()
    return re.sub(r"[ _]+", "-", t)


def _pass_link_internal_headings(s: str) -> str:
    targets = {
        hid: _md_header_id(text)
        for _, hid, text in _H_HEAD_WITH_ID.findall(s)
    }

    def conv(m: re.Match) -> str:
        return f'href="#{targets[m.group(1)]}"' if m.group(1) in targets else m.group(0)

    s = re.sub(r'href="#([^"]*)"', conv, s)
    return _H_HEAD_ATTRS.sub(r"<h\1>", s)


HTML_RULES: list[tuple[str, Callable[[str], str]]] = [
    ("comments", lambda s: _H_COMMENT.sub("", s)),
    # app-specific passes run first, like the reference's per-app filter
    # lists (md_lib/convert.py assembles app filters ahead of the generics)
    ("nimbus_marks", _pass_nimbus_marks),
    ("nimbus_note_links", _pass_nimbus_note_links),
    ("nimbus_lists", _pass_nimbus_lists),
    ("nimbus_tables", _pass_nimbus_tables),
    ("notion_todo_lists", _pass_notion_todo_lists),
    ("upnote_checklists", _pass_upnote_checklists),
    ("synology", _pass_synology),
    ("merge_single_lists", _pass_merge_single_lists),
    ("link_internal_headings", _pass_link_internal_headings),
    ("checklists", _pass_checklists),
    ("merge_formatting", _pass_merge_formatting),
    ("empty_markup", lambda s: _H_EMPTY.sub(r"\2", s)),
    ("iframes", _pass_iframes),
    ("underline", lambda s: _H_UNDER.sub(
        lambda m: f"++{m.group(1) or m.group(2)}++", s)),
    ("strikethrough", lambda s: _H_STRIKE.sub(
        lambda m: f"~~{m.group(1) or m.group(2)}~~", s)),
    ("highlight", lambda s: _H_MARK.sub(r"==\1==", s)),
    ("bold_headers", lambda s: _H_BOLD_HEAD.sub(r"<h\1>\3</h\1>", s)),
    ("dup_links", lambda s: _H_DUP_LINK.sub(r"\1", s)),
    ("inline_whitespace", _pass_inline_whitespace),
    ("tables", _pass_tables),
    ("breaks", lambda s: _H_HR.sub("\n---\n", _H_BR.sub("\n", s))),
    ("headings", lambda s: _H_HEAD.sub(
        lambda m: "\n" + "#" * int(m.group(1)) + " " + m.group(2).strip() + "\n", s)),
    ("bold", lambda s: _H_BOLD.sub(r"**\2**", s)),
    ("italic", lambda s: _H_ITAL.sub(r"*\2*", s)),
    ("code", lambda s: _H_CODE.sub(r"`\1`", s)),
    ("links", lambda s: _H_LINK.sub(r"[\2](\1)", s)),
    ("images", lambda s: _H_IMG.sub(
        lambda m: f"![{m.group(2) or ''}]({m.group(1)})", s)),
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
    >>> print(html_to_md('<table><tr><td>a</td><td>b</td></tr>'
    ...                  '<tr><td>1<br/>x</td><td>2</td></tr></table>'))
    | a | b |
    | --- | --- |
    | 1 x | 2 |
    >>> html_to_md('<b>bo</b><b>ld</b><div class="checklist">'
    ...            '<div class="checked">x</div>'
    ...            '<div class="unchecked">y</div></div>')
    '**bold**\\n- [x] x\\n- [ ] y'
    >>> html_to_md('<u>a</u> <s>b</s> <mark>c</mark> <b> </b>')
    '++a++ ~~b~~ ==c=='
    >>> html_to_md('<iframe src="https://kicker.de"></iframe>')
    '[https://kicker.de](https://kicker.de)'
    >>> html_to_md('<iframe src="https://k.de">link</iframe> <iframe></iframe>')
    '[link](https://k.de)'
    >>> html_to_md('<span style="text-decoration: line-through">x</span>')
    '~~x~~'
    >>> html_to_md('<h2><b>All Bold</b></h2>')
    '## All Bold'
    >>> html_to_md('<a href="u">x</a> <a href="u">x</a> <a href="u">y</a>')
    '[x](u) [y](u)'
    >>> html_to_md('a<b> bold\\ntext </b>z')
    'a **bold text** z'
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

    def __init__(self, password: bytes | None = None, pbkdf2_iters: int = 1000) -> None:
        super().__init__(convert_charrefs=True)
        self.out: list[str] = []
        self.list_stack: list[str] = []  # "ul" / "ol"
        self.cells: list[str] | None = None  # inside <tr>
        self.in_cell = False
        self.row_count = 0
        self.password = password
        self.pbkdf2_iters = pbkdf2_iters
        self._crypt_buf: list[str] | None = None  # inside <en-crypt>

    def _decrypt_encrypt_block(self, b64_payload: str) -> str | None:
        """Evernote ENC0 inline block (md_lib/evernote.py:19-49 layout):
        'ENC0' || salt || hmac_salt || iv || ct || hmac-sha256, keys via
        PBKDF2-HMAC-SHA256 (reference: 50000 rounds; configurable here —
        the committed fixtures use 1000, same shape). Returns the
        decrypted ENML fragment, or None when there is no password, the
        HMAC fails, or the blob is malformed."""
        if self.password is None:
            return None
        import base64
        import hashlib
        import hmac as hm

        from jimmy_spark.datagen.aes import aes128_cbc_decrypt

        try:
            blob = base64.b64decode(b64_payload, validate=False)
            if len(blob) < 84 or blob[:4] != b"ENC0":
                return None
            salt, h_salt, iv = blob[4:20], blob[20:36], blob[36:52]
            ct, msg, ref = blob[52:-32], blob[:-32], blob[-32:]
            h_key = hashlib.pbkdf2_hmac(
                "sha256", self.password, h_salt, self.pbkdf2_iters, 16
            )
            if not hm.compare_digest(
                hm.new(h_key, msg, hashlib.sha256).digest(), ref
            ):
                return None
            key = hashlib.pbkdf2_hmac(
                "sha256", self.password, salt, self.pbkdf2_iters, 16
            )
            return aes128_cbc_decrypt(key, iv, ct).decode("utf-8")
        except Exception:  # noqa: BLE001 — per-block error isolation
            return None

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
        elif tag == "en-crypt":
            self._crypt_buf = []
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
        if tag == "en-crypt":  # self-closing: close the (empty) buffer
            self.handle_endtag(tag)

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
        elif tag == "en-crypt":
            payload, self._crypt_buf = "".join(self._crypt_buf or []), None
            plain = self._decrypt_encrypt_block(payload.strip())
            if plain is None:
                self._emit("[encrypted]")
            else:
                # recursive re-parse of the decrypted fragment (the
                # reference's recursive shape, md_lib/evernote.py:441-474)
                # through a FRESH handler so its state can't corrupt ours
                sub = _EnmlHandler(self.password, self.pbkdf2_iters)
                sub.feed(plain)
                sub.close()
                self._emit(sub.result())
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
        if self._crypt_buf is not None:
            self._crypt_buf.append(data)
            return
        self._emit(data)

    def result(self) -> str:
        return "".join(self.out).strip()


def enml_to_md(
    s: str, password: bytes | None = None, pbkdf2_iters: int = 1000
) -> str:
    """Streaming ENML -> Markdown. ``password`` unlocks inline
    ``<en-crypt>`` blocks (ENC0 layout, PBKDF2 + HMAC verify + pure-Python
    AES-CBC, datagen/aes.py), whose decrypted ENML is re-parsed
    recursively; without a password (or on HMAC failure) the block renders
    as the deterministic ``[encrypted]`` placeholder, never garbage.

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
    h = _EnmlHandler(password, pbkdf2_iters)
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
