"""Minimal PDF text extraction -> markdown, pure stdlib.

The reference converts PDFs with the ``pdf_oxide`` native library
(/root/reference/src/jimmy/converter.py:296-306:
``document.to_markdown_all(detect_headings=True, ...)``), which is not
available in this sandbox. This module implements the same *shape* for
the covered subset: decode the page content streams (raw or
``/FlateDecode`` via ``zlib``), evaluate the text-showing operators
(``Tj`` with literal and UTF-16BE hex strings), and detect headings from
the selected font size — one markdown paragraph per ``BT``..``ET`` text
block, ``#``-prefixed when the block's font size is >= 16pt (the
``detect_headings=True`` analogue).

Subset converter, same policy as functions/office.py: real container
parsing (xref-addressed objects, stream filters, string escapes), with
the covered grammar pinned by tests — not a general PDF renderer.
"""

from __future__ import annotations

import re
import zlib

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream\r?\n(.*?)endstream", re.S)
_BT_RE = re.compile(rb"BT(.*?)ET", re.S)
_TF_RE = re.compile(rb"/\w+\s+(\d+(?:\.\d+)?)\s+Tf")
# literal (...) with escaped parens/backslash, or hex <...>
_SHOW_RE = re.compile(rb"(?:\(((?:\\.|[^\\()])*)\)|<([0-9A-Fa-f\s]+)>)\s*Tj")

_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _literal_bytes(raw: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i : i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1 : i + 2]
            if nxt.isdigit():  # octal escape, up to 3 digits
                j = i + 1
                while j < min(i + 4, len(raw)) and raw[j : j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1 : j], 8))
                i = j
                continue
            out += _ESCAPES.get(nxt, nxt)
            i += 2
            continue
        out += c
        i += 1
    return bytes(out)


def _decode_string(lit: bytes | None, hexs: bytes | None) -> str:
    if hexs is not None:
        data = bytes.fromhex(hexs.decode("ascii").replace("\n", "").replace(" ", ""))
    else:
        data = _literal_bytes(lit or b"")
    if data[:2] == b"\xfe\xff":  # UTF-16BE BOM (PDF text-string encoding)
        return data[2:].decode("utf-16-be")
    return data.decode("latin-1")


def pdf_to_md(blob: bytes, heading_min_pt: float = 16.0) -> str:
    """Extract the text of every page content stream as markdown."""
    blocks: list[str] = []
    for dict_part, stream in _STREAM_RE.findall(blob):
        if b"/FlateDecode" in dict_part:
            try:
                stream = zlib.decompress(stream.strip(b"\r\n"))
            except zlib.error:
                continue
        if b"BT" not in stream:
            continue
        for bt in _BT_RE.findall(stream):
            sizes = _TF_RE.findall(bt)
            size = float(sizes[-1]) if sizes else 0.0
            text = "".join(
                _decode_string(lit or None, hexs or None)
                for lit, hexs in _SHOW_RE.findall(bt)
            )
            if not text.strip():
                continue
            blocks.append(("# " + text) if size >= heading_min_pt else text)
    return "\n\n".join(blocks)
