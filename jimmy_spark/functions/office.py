"""Office/markup document converters — OOXML (.docx), ODF (.odt) and
AsciiDoc (.adoc) to markdown — pure stdlib, executor-friendly.

The reference hands these formats to a pandoc SUBPROCESS per note
(/root/reference/src/jimmy/converter.py:311-318 dispatches docx/odt to
md_lib/convert.py:99-107's ``pypandoc.convert_*``; converter.py:252-264
dispatches asciidoc with ``--shift-heading-level-by=1``). The binary is
not available in this sandbox, and a per-note subprocess is the wrong
shape inside a Spark executor anyway (process spawn per row). These
converters parse the ACTUAL container formats — zip + WordprocessingML /
OpenDocument XML — with ``zipfile`` + ``xml.etree`` and emit the markdown
pandoc produces for the covered constructs:

- ATX headings from ``Heading<n>`` paragraph styles / ``text:h``
  outline levels / ``=``-runs (shifted by one level, matching the
  reference's ``--shift-heading-level-by=1`` standalone-document call)
- ``**bold**`` / ``*italic*`` from run properties / text-property styles
  / ``*``-``_`` constrained formatting
- ``- `` bullet lists from ``numPr`` / ``text:list`` / ``*`` markers
- ``[text](url)`` from ``w:hyperlink``+rels / ``text:a`` / ``link:``
  and bare-URL macros
- pipe tables from ``w:tbl`` / ``table:table``
- fenced code blocks from ``[source,lang]`` + ``----`` listing blocks

They are *subset* converters: the covered grammar is exactly the
doctest-anchored set above, not all of pandoc — documented divergence,
same policy as the other sandbox-forced stubs (STUB_NOTICES.md).
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET

# ---------------------------------------------------------------------------
# shared block assembly

def _join_blocks(blocks: list[tuple[str, str]]) -> str:
    """Merge consecutive list items into one block, join blocks with a
    blank line (pandoc's markdown writer shape)."""
    out: list[str] = []
    kinds: list[str] = []
    for kind, text in blocks:
        if kind == "li" and kinds and kinds[-1] == "li":
            out[-1] += "\n" + text
        else:
            out.append(text)
            kinds.append(kind)
    return "\n\n".join(out)


def _pipe_table(rows: list[list[str]]) -> str:
    """First row is the header (pandoc's pipe-table writer)."""
    if not rows:
        return ""
    lines = ["| " + " | ".join(rows[0]) + " |",
             "| " + " | ".join("---" for _ in rows[0]) + " |"]
    lines += ["| " + " | ".join(r) + " |" for r in rows[1:]]
    return "\n".join(lines)


# ---------------------------------------------------------------------------
# OOXML (.docx)

_W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"
_RNS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKG = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _docx_rels(zf: zipfile.ZipFile) -> dict[str, str]:
    try:
        data = zf.read("word/_rels/document.xml.rels")
    except KeyError:
        return {}
    root = ET.fromstring(data)
    return {
        rel.get("Id"): rel.get("Target")
        for rel in root.iter(_PKG + "Relationship")
    }


def _docx_inline(p: ET.Element, rels: dict[str, str]) -> str:
    parts: list[str] = []
    for child in p:
        if child.tag == _W + "r":
            t = "".join(n.text or "" for n in child.iter(_W + "t"))
            rpr = child.find(_W + "rPr")
            if t and rpr is not None:
                if rpr.find(_W + "b") is not None:
                    t = f"**{t}**"
                elif rpr.find(_W + "i") is not None:
                    t = f"*{t}*"
            parts.append(t)
        elif child.tag == _W + "hyperlink":
            inner = "".join(n.text or "" for n in child.iter(_W + "t"))
            target = rels.get(child.get(_RNS + "id"), "")
            parts.append(f"[{inner}]({target})")
    return "".join(parts)


def _docx_para(p: ET.Element, rels: dict[str, str]) -> tuple[str, str]:
    text = _docx_inline(p, rels)
    ppr = p.find(_W + "pPr")
    if ppr is not None:
        style = ppr.find(_W + "pStyle")
        if style is not None:
            m = re.fullmatch(r"Heading([1-9])", style.get(_W + "val") or "")
            if m:
                return "h", "#" * int(m.group(1)) + " " + text
        if ppr.find(_W + "numPr") is not None:
            return "li", "- " + text
    return "p", text


def _docx_table(tbl: ET.Element, rels: dict[str, str]) -> str:
    rows = [
        [
            " ".join(
                _docx_inline(p, rels) for p in tc.findall(_W + "p")
            ).strip()
            for tc in tr.findall(_W + "tc")
        ]
        for tr in tbl.findall(_W + "tr")
    ]
    return _pipe_table(rows)


def docx_to_md(blob: bytes) -> str:
    """WordprocessingML -> markdown (pandoc-for-docx subset,
    converter.py:311-318)."""
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        rels = _docx_rels(zf)
        root = ET.fromstring(zf.read("word/document.xml"))
    body = root.find(_W + "body")
    blocks: list[tuple[str, str]] = []
    for el in body if body is not None else []:
        if el.tag == _W + "p":
            kind, text = _docx_para(el, rels)
            if text.strip():
                blocks.append((kind, text))
        elif el.tag == _W + "tbl":
            blocks.append(("tbl", _docx_table(el, rels)))
    return _join_blocks(blocks)


# ---------------------------------------------------------------------------
# ODF (.odt)

_OFF = "{urn:oasis:names:tc:opendocument:xmlns:office:1.0}"
_TXT = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"
_TBL = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"
_STY = "{urn:oasis:names:tc:opendocument:xmlns:style:1.0}"
_FO = "{urn:oasis:names:tc:opendocument:xmlns:xsl-fo-compatible:1.0}"
_XLINK = "{http://www.w3.org/1999/xlink}"


def _odt_styles(root: ET.Element) -> dict[str, str]:
    """Map automatic-style name -> 'bold' | 'italic'."""
    out: dict[str, str] = {}
    auto = root.find(_OFF + "automatic-styles")
    for st in auto.iter(_STY + "style") if auto is not None else []:
        props = st.find(_STY + "text-properties")
        if props is None:
            continue
        name = st.get(_STY + "name")
        if props.get(_FO + "font-weight") == "bold":
            out[name] = "bold"
        elif props.get(_FO + "font-style") == "italic":
            out[name] = "italic"
    return out


def _odt_inline(el: ET.Element, styles: dict[str, str]) -> str:
    parts: list[str] = [el.text or ""]
    for child in el:
        if child.tag == _TXT + "span":
            inner = _odt_inline(child, styles)
            kind = styles.get(child.get(_TXT + "style-name"), "")
            if inner and kind == "bold":
                inner = f"**{inner}**"
            elif inner and kind == "italic":
                inner = f"*{inner}*"
            parts.append(inner)
        elif child.tag == _TXT + "a":
            inner = _odt_inline(child, styles)
            parts.append(f"[{inner}]({child.get(_XLINK + 'href', '')})")
        elif child.tag == _TXT + "tab":
            parts.append("\t")
        elif child.tag == _TXT + "s":
            parts.append(" " * int(child.get(_TXT + "c", "1")))
        else:
            parts.append(_odt_inline(child, styles))
        parts.append(child.tail or "")
    return "".join(parts)


def _odt_table(tbl: ET.Element, styles: dict[str, str]) -> str:
    rows = [
        [
            " ".join(
                _odt_inline(p, styles) for p in tc.findall(_TXT + "p")
            ).strip()
            for tc in tr.findall(_TBL + "table-cell")
        ]
        for tr in tbl.findall(_TBL + "table-row")
    ]
    return _pipe_table(rows)


def odt_to_md(blob: bytes) -> str:
    """OpenDocument text -> markdown (pandoc-for-odt subset,
    converter.py:311-318)."""
    with zipfile.ZipFile(io.BytesIO(blob)) as zf:
        root = ET.fromstring(zf.read("content.xml"))
    styles = _odt_styles(root)
    body = root.find(_OFF + "body")
    text_el = body.find(_OFF + "text") if body is not None else None
    blocks: list[tuple[str, str]] = []
    for el in text_el if text_el is not None else []:
        if el.tag == _TXT + "h":
            lvl = int(el.get(_TXT + "outline-level", "1"))
            blocks.append(("h", "#" * lvl + " " + _odt_inline(el, styles)))
        elif el.tag == _TXT + "p":
            t = _odt_inline(el, styles)
            if t.strip():
                blocks.append(("p", t))
        elif el.tag == _TXT + "list":
            for item in el.findall(_TXT + "list-item"):
                for p in item.findall(_TXT + "p"):
                    blocks.append(("li", "- " + _odt_inline(p, styles)))
        elif el.tag == _TBL + "table":
            blocks.append(("tbl", _odt_table(el, styles)))
    return _join_blocks(blocks)


# ---------------------------------------------------------------------------
# MediaWiki markup + OPML outlines (the reference's xml root-tag dispatch,
# converter.py:320-340, hands both to pandoc; same subset policy as above —
# note the reference feeds the whole XML export text to pandoc's mediawiki
# reader, while this converter extracts each <revision><text> payload and
# converts the markup itself)


def _mw_inline(s: str) -> str:
    s = re.sub(r"\[(https?://[^\s\]]+)\s+([^\]]*)\]", r"[\2](\1)", s)
    s = re.sub(r"\[\[([^\]|]+)\|([^\]]*)\]\]", r"[\2](\1)", s)
    s = re.sub(r"\[\[([^\]]+)\]\]", r"[\1](\1)", s)
    s = re.sub(r"'''(.+?)'''", r"**\1**", s)
    s = re.sub(r"''((?:[^'\n]|'[^'])+?)''", r"*\1*", s)
    return s


def mediawiki_to_md(text: str) -> str:
    """MediaWiki markup -> markdown subset.

    >>> mediawiki_to_md("== Title ==")
    '## Title'
    >>> mediawiki_to_md("* a\\n** b\\n# first")
    '- a\\n  - b\\n1. first'
    >>> mediawiki_to_md("'''bold''' ''ital'' [https://e.x/1 doc] [[Page|p]]")
    '**bold** *ital* [doc](https://e.x/1) [p](Page)'
    >>> mediawiki_to_md("it's 'quoted' text")  # lone quotes untouched
    "it's 'quoted' text"
    """
    out: list[str] = []
    for line in text.split("\n"):
        m = re.match(r"^(=+)\s*(.*?)\s*=+\s*$", line)
        if m:
            out.append("#" * len(m.group(1)) + " " + _mw_inline(m.group(2)))
            continue
        m = re.match(r"^(\*+)\s*(.*)$", line)
        if m:
            out.append(
                "  " * (len(m.group(1)) - 1) + "- " + _mw_inline(m.group(2))
            )
            continue
        m = re.match(r"^(#+)\s*(.*)$", line)
        if m:
            out.append(
                "  " * (len(m.group(1)) - 1) + "1. " + _mw_inline(m.group(2))
            )
            continue
        out.append(_mw_inline(line))
    return "\n".join(out)


def opml_to_md(root: ET.Element) -> str:
    """OPML outline tree -> nested markdown list (root = parsed <opml>)."""
    lines: list[str] = []

    def walk(el: ET.Element, depth: int) -> None:
        for o in el.findall("outline"):
            lines.append("  " * depth + "- " + (o.get("text") or ""))
            walk(o, depth + 1)

    body = root.find("body")
    if body is not None:
        walk(body, 0)
    return "\n".join(lines)


def xml_export_to_md(text: str) -> str:
    """Root-tag dispatch for ``.xml`` notes (converter.py:320-340):
    mediawiki exports convert their page markup, OPML becomes a nested
    list, anything else falls back to the raw text (the reference's
    untyped-xml branch)."""
    try:
        root = ET.fromstring(text)
    except ET.ParseError:
        return text
    root_tag = root.tag.rpartition("}")[-1]
    if root_tag == "mediawiki":
        pages = [
            mediawiki_to_md(t.text or "")
            for t in root.iter()
            if t.tag.rpartition("}")[-1] == "text"
        ]
        return "\n\n".join(pages)
    if root_tag == "opml":
        return opml_to_md(root)
    return text


# ---------------------------------------------------------------------------
# AsciiDoc (.adoc)

def _adoc_inline(s: str) -> str:
    # link: macro, then bare-URL macro (https://u[text]), then constrained
    # *bold* / _italic_ — the order matters: URL targets may not be
    # reprocessed as emphasis
    s = re.sub(r"link:([^\s\[]+)\[([^\]]*)\]", r"[\2](\1)", s)
    s = re.sub(r"(?<!\()(https?://[^\s\[]+)\[([^\]]*)\]", r"[\2](\1)", s)
    s = re.sub(r"\*(\S(?:[^*\n]*\S)?)\*", r"**\1**", s)
    s = re.sub(r"(?<![A-Za-z0-9])_([^_\n]+)_(?![A-Za-z0-9])", r"*\1*", s)
    return s


def adoc_to_md(text: str) -> str:
    r"""AsciiDoc -> markdown subset (pandoc-for-asciidoc,
    converter.py:252-264). ``=``-runs map 1:1 to ``#``-runs: the reference
    converts standalone documents with ``--shift-heading-level-by=1``, so
    the level-0 document title ``=`` lands at ``#`` (h1) and ``==`` at
    ``##`` — exactly ``'#' * len(run)``.

    >>> adoc_to_md("= Title\n\n== Section")
    '# Title\n\n## Section'
    >>> adoc_to_md("* one\n** nested")
    '- one\n  - nested'
    >>> adoc_to_md("see link:https://e.x/1[docs] and *hot* _takes_")
    'see [docs](https://e.x/1) and **hot** *takes*'
    >>> adoc_to_md("https://e.x/2[page]")
    '[page](https://e.x/2)'
    >>> adoc_to_md("[source,python]\n----\nx = [1](2)\n----")
    '```python\nx = [1](2)\n```'
    >>> adoc_to_md("----\nliteral *stays*\n----")
    '```\nliteral *stays*\n```'
    >>> adoc_to_md("image::pic.png[alt text]")
    '![alt text](pic.png)'
    """
    out: list[str] = []
    lines = text.split("\n")
    i = 0
    in_code = False
    while i < len(lines):
        line = lines[i]
        if in_code:
            if line.rstrip() == "----":
                out.append("```")
                in_code = False
            else:
                out.append(line)
            i += 1
            continue
        m = re.match(r"^\[source(?:,([A-Za-z0-9_+-]+))?\]\s*$", line)
        if m and i + 1 < len(lines) and lines[i + 1].rstrip() == "----":
            out.append("```" + (m.group(1) or ""))
            in_code = True
            i += 2
            continue
        if line.rstrip() == "----":
            out.append("```")
            in_code = True
            i += 1
            continue
        m = re.match(r"^(=+)\s+(.*)$", line)
        if m:
            out.append("#" * len(m.group(1)) + " " + _adoc_inline(m.group(2)))
            i += 1
            continue
        m = re.match(r"^(\*+)\s+(.*)$", line)
        if m:
            depth = len(m.group(1))
            out.append("  " * (depth - 1) + "- " + _adoc_inline(m.group(2)))
            i += 1
            continue
        m = re.match(r"^image::([^\[]+)\[([^\]]*)\]\s*$", line)
        if m:
            out.append(f"![{m.group(2)}]({m.group(1)})")
            i += 1
            continue
        out.append(_adoc_inline(line))
        i += 1
    return "\n".join(out)
