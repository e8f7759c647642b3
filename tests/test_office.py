"""DefaultConverter folder-walk family (converter.py:239-382): the stdlib
docx/odt/adoc converters (functions/office.py), the folder source's
per-extension dispatch + skip/error lanes (sources/folder.py), and the
full conversion lifecycle over the mixed office fixture tree."""

from __future__ import annotations

import hashlib
from pathlib import Path

import pytest

from jimmy_spark.functions.office import adoc_to_md, docx_to_md, odt_to_md
from jimmy_spark.sources.folder import _convert_file


def test_doctests():
    import doctest

    from jimmy_spark.functions import office

    results = doctest.testmod(office)
    assert results.failed == 0 and results.attempted >= 7


@pytest.fixture(scope="module")
def office_dir():
    from jimmy_spark.datagen import ensure_exports

    return f"{ensure_exports('t2')}/office"


# ---------------------------------------------------------------------------
# converter units


def _mini_docx(document_xml: str, rels_xml: str | None = None) -> bytes:
    from jimmy_spark.datagen.exports import (
        _DOCX_CT,
        _DOCX_ROOT_RELS,
        _office_zip,
    )

    entries = [
        ("[Content_Types].xml", _DOCX_CT),
        ("_rels/.rels", _DOCX_ROOT_RELS),
        ("word/document.xml", document_xml.encode("utf-8")),
    ]
    if rels_xml is not None:
        entries.append(
            ("word/_rels/document.xml.rels", rels_xml.encode("utf-8"))
        )
    return _office_zip(entries)


_W_NS = (
    'xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main" '
    'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/'
    'relationships"'
)


def test_docx_heading_levels_and_precedence():
    doc = f"""<w:document {_W_NS}><w:body>
<w:p><w:pPr><w:pStyle w:val="Heading2"/></w:pPr><w:r><w:t>sub</w:t></w:r></w:p>
<w:p><w:r><w:rPr><w:b/><w:i/></w:rPr><w:t>both</w:t></w:r></w:p>
<w:p><w:r><w:t></w:t></w:r></w:p>
</w:body></w:document>"""
    # bold wins over italic when a run carries both (single-wrap, the
    # pandoc strong>emph nesting is out of subset); empty paragraph dropped
    assert docx_to_md(_mini_docx(doc)) == "## sub\n\n**both**"


def test_docx_hyperlink_unknown_rel_is_empty_target():
    doc = f"""<w:document {_W_NS}><w:body>
<w:p><w:hyperlink r:id="rId9"><w:r><w:t>go</w:t></w:r></w:hyperlink></w:p>
</w:body></w:document>"""
    assert docx_to_md(_mini_docx(doc)) == "[go]()"


def test_docx_list_items_merge_into_one_block():
    doc = f"""<w:document {_W_NS}><w:body>
<w:p><w:pPr><w:numPr><w:numId w:val="1"/></w:numPr></w:pPr><w:r><w:t>a</w:t></w:r></w:p>
<w:p><w:pPr><w:numPr><w:numId w:val="1"/></w:numPr></w:pPr><w:r><w:t>b</w:t></w:r></w:p>
<w:p><w:r><w:t>tail</w:t></w:r></w:p>
</w:body></w:document>"""
    assert docx_to_md(_mini_docx(doc)) == "- a\n- b\n\ntail"


_ODT_NS = (
    'xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" '
    'xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" '
    'xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" '
    'xmlns:style="urn:oasis:names:tc:opendocument:xmlns:style:1.0" '
    'xmlns:fo="urn:oasis:names:tc:opendocument:xmlns:xsl-fo-compatible:1.0" '
    'xmlns:xlink="http://www.w3.org/1999/xlink"'
)


def _mini_odt(content_xml: str) -> bytes:
    from jimmy_spark.datagen.exports import _ODT_MANIFEST, _office_zip

    return _office_zip([
        ("mimetype", b"application/vnd.oasis.opendocument.text"),
        ("META-INF/manifest.xml", _ODT_MANIFEST),
        ("content.xml", content_xml.encode("utf-8")),
    ])


def test_odt_whitespace_elements_and_heading_level():
    content = f"""<office:document-content {_ODT_NS}>
<office:automatic-styles/>
<office:body><office:text>
<text:h text:outline-level="3">deep</text:h>
<text:p>a<text:tab/>b<text:s text:c="3"/>c</text:p>
</office:text></office:body></office:document-content>"""
    assert odt_to_md(_mini_odt(content)) == "### deep\n\na\tb   c"


def test_odt_unstyled_span_passes_through():
    content = f"""<office:document-content {_ODT_NS}>
<office:automatic-styles>
<style:style style:name="TB" style:family="text">
<style:text-properties fo:font-weight="bold"/></style:style>
</office:automatic-styles>
<office:body><office:text>
<text:p>x <text:span text:style-name="TB">b</text:span> y
<text:span text:style-name="NOPE">plain</text:span></text:p>
</office:text></office:body></office:document-content>"""
    assert odt_to_md(_mini_odt(content)) == "x **b** y\nplain"


def test_adoc_code_block_protects_markers():
    src = "== h\n\n----\n= not a heading\n* not a list\n----\n\n* real"
    assert (
        adoc_to_md(src)
        == "## h\n\n```\n= not a heading\n* not a list\n```\n\n- real"
    )


# ---------------------------------------------------------------------------
# dispatch lanes (pure, no spark)


def test_dispatch_skips_images_and_extensionless():
    assert _convert_file("diagram.png", b"\x89PNG") is None
    assert _convert_file("Makefile", b"all:") is None


def test_dispatch_fountain_wraps_and_txt_passthrough():
    rec = _convert_file("s.fountain", b"INT. LAB - NIGHT")
    assert rec["body"] == "```fountain\nINT. LAB - NIGHT\n```\n"
    rec = _convert_file("n.txt", "plain #t1 body".encode())
    assert rec["body"] == "plain #t1 body" and rec["tags"] == ["t1"]


def test_dispatch_md_frontmatter_and_unknown_ext_raw():
    md = b"---\ntitle: T\ntags: [a, b]\ncreated: 5\n---\nbody #c"
    rec = _convert_file("x.md", md)
    assert rec["title"] == "T" and rec["ts"] == 5
    assert rec["tags"] == ["a", "b", "c"]
    rec = _convert_file("w.wiki", b"'''raw'''")
    assert rec["body"] == "'''raw'''"  # last-resort raw lane


def test_dispatch_mht_routes_to_mime_scan():
    from jimmy_spark.datagen.exports import _mht_bytes

    rec = _convert_file("note-x.mht", _mht_bytes("x"))
    assert rec["title"] == "msg x"
    assert rec["body"] == "**doc x** ready"


def test_pdf_text_extraction_evaluates_real_operators():
    """The extractor must inflate the FlateDecode stream and decode the
    UTF-16BE Tj strings — and detect the 18pt line as a heading
    (pdf_oxide detect_headings analogue, converter.py:296-306)."""
    from jimmy_spark.datagen.exports import _pdf_bytes
    from jimmy_spark.functions.pdftext import pdf_to_md

    cap = "tabs\tand “unicode” stay \\intact"
    md = pdf_to_md(_pdf_bytes("img_9", cap, -42))
    assert md == f"# note img_9\n\n{cap}\n\nphash -42"


def test_pdf_literal_string_escapes():
    from jimmy_spark.functions.pdftext import pdf_to_md

    blob = (b"1 0 obj << /Length 44 >>\nstream\n"
            b"BT /F1 12 Tf (a\\(b\\)c \\\\ \\101) Tj ET\n"
            b"endstream endobj\n")
    assert pdf_to_md(blob) == "a(b)c \\ A"


def test_xml_root_tag_dispatch():
    from jimmy_spark.datagen.exports import _mediawiki_xml, _opml_xml
    from jimmy_spark.functions.office import xml_export_to_md

    cap = "Cap #t [asset](https://e.x/1) 'q'\ttab"
    got = xml_export_to_md(_mediawiki_xml("img_7", cap, "png", 16, 16, 5))
    assert got == (
        "## note img_7\n\n**16x16** *png*\n\n"
        f"- {cap}\n- phash 5\n\n[origin](https://ex.example/img_7)"
    )
    got = xml_export_to_md(_opml_xml("img_7", cap, 16, 16, 5))
    assert got == f"- {cap}\n  - phash 5\n- size 16x16"
    # untyped roots and non-XML fall back to the raw text
    assert xml_export_to_md("<channel><item/></channel>") == (
        "<channel><item/></channel>"
    )
    assert xml_export_to_md("not xml <") == "not xml <"


# ---------------------------------------------------------------------------
# distributed scan + lifecycle


def test_folder_scan_lanes_and_error_isolation(spark, office_dir):
    from jimmy_spark.sources.folder import read_folder

    rows = read_folder(spark, office_dir).collect()
    by_ok = [r for r in rows if r.ok], [r for r in rows if not r.ok]
    assert len(by_ok[0]) == 2000  # png + extensionless never surface
    assert [(r.name, r.ext, r.error) for r in by_ok[1]] == [
        ("broken-zip", "docx", "BadZipFile")
    ]
    exts = {r.ext for r in by_ok[0]}
    assert exts == {
        "docx", "odt", "adoc", "fountain", "txt", "mht", "pdf", "xml",
    }
    # fence-awareness: fountain bodies hold the caption's [asset](...)
    # link inside the code fence, so their link count must be 0
    assert all(r.n_links == 0 for r in by_ok[0] if r.ext == "fountain")
    assert all(r.n_links == 2 for r in by_ok[0] if r.ext == "docx")


def test_folder_conversion_byte_stable(spark, office_dir, tmp_path):
    from jimmy_spark.plans import convert

    out1, out2 = tmp_path / "r1", tmp_path / "r2"
    s1 = convert.run_conversion(spark, "folder", office_dir, str(out1))
    s2 = convert.run_conversion(spark, "folder", office_dir, str(out2))
    assert s1 == s2
    assert s1["parsed"] == 2001 and s1["errors"] == 1
    assert s1["written"] == s1["filtered"] == 2000 and s1["lossless"]

    def digest(d: Path) -> dict[str, str]:
        return {
            str(p.relative_to(d)): hashlib.md5(p.read_bytes()).hexdigest()
            for p in sorted(d.rglob("*")) if p.is_file()
        }

    d1 = digest(out1)
    assert d1 and d1 == digest(out2)
