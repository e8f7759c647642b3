"""Deterministic export-format twins of a dataset's images table.

The reference's biggest scan families are JSON exports
(/root/reference/src/jimmy/formats/simplenote.py:11-17, telegram.py:12-53),
XML document exports (wordpress.py:18-103, diaro.py:25-50) and SQLite
databases (anki.py:121-153, qownnotes.py:5). These writers materialize the
same t2 rows in those container formats so the source scans can be
oracle-checked against the parquet ground truth (the archive-source
pattern, datasets.ensure_archives).

Derivations are simple and SQL-expressible on purpose — the DuckDB oracle
recomputes them from images.parquet (or reads the JSONL directly), so a
scan bug cannot hide behind a lossy fixture.
"""

from __future__ import annotations

import json
import sqlite3
from pathlib import Path
from xml.sax.saxutils import escape

import pandas as pd


def _rows(images_parquet: str) -> pd.DataFrame:
    pdf = pd.read_parquet(
        images_parquet, columns=["image_id", "w", "h", "fmt", "caption", "phash"]
    )
    return pdf.sort_values("image_id").reset_index(drop=True)


def write_sqlite_notes(images_parquet: str, db_path: str) -> None:
    """Anki-ish ``notes`` table (id, guid, mid, mtime, tags, flds) —
    the column shape of anki.py:121-153's ``select ... from notes``.
    id is the 1-based rank by image_id (row_number() in the oracle)."""
    p = Path(db_path)
    if p.exists():
        p.unlink()
    pdf = _rows(images_parquet)
    con = sqlite3.connect(db_path)
    try:
        con.execute(
            "CREATE TABLE notes (id INTEGER PRIMARY KEY, guid TEXT, "
            "mid INTEGER, mtime INTEGER, tags TEXT, flds TEXT)"
        )
        con.executemany(
            "INSERT INTO notes VALUES (?, ?, ?, ?, ?, ?)",
            (
                (
                    i + 1,
                    r.image_id,
                    int(r.phash),
                    int(r.w) * int(r.h),
                    r.fmt,
                    r.caption,
                )
                for i, r in enumerate(pdf.itertuples())
            ),
        )
        con.commit()
    finally:
        con.close()


def write_jsonl_notes(images_parquet: str, out_dir: str, shards: int = 4) -> None:
    """Simplenote-style JSONL export: one object per line with a nested
    tag array — shard files so the scan parallelizes."""
    d = Path(out_dir)
    d.mkdir(parents=True, exist_ok=True)
    pdf = _rows(images_parquet)
    for si in range(shards):
        part = pdf.iloc[si::shards]
        with open(d / f"notes{si}.jsonl", "w") as f:
            for r in part.itertuples():
                f.write(
                    json.dumps(
                        {
                            "id": r.image_id,
                            "content": r.caption,
                            "tags": [r.fmt, f"w{int(r.w)}"],
                            "lastModified": int(r.phash) % 1_000_000_007,
                        },
                        sort_keys=True,
                    )
                    + "\n"
                )


ENC_PASSWORD = b"jimmy-spark"
# the reference uses 50000 PBKDF2 rounds (md_lib/evernote.py:35,43); the
# fixture uses 1000 so the per-row KDF in the registry query stays cheap —
# the derivation SHAPE (PBKDF2-HMAC-SHA256 -> 16-byte key, HMAC verify
# before decrypt) is identical
PBKDF2_ITERS = 1000


def write_encrypted_notes(images_parquet: str, out_path: str) -> None:
    """Foreign-ciphertext fixtures in the reference's two export shapes,
    encrypted with the from-scratch FIPS-197 encryptor (datagen/aes.py):

    - ColorNote (formats/colornote.py:37-54): key = md5(pw+salt),
      iv = md5(key+pw+salt), AES-128-CBC, PKCS7. Columns cn_salt/cn_ct.
    - Evernote ENC0 (md_lib/evernote.py:19-49): blob =
      'ENC0' || salt || hmac_salt || iv || ct || hmac-sha256, keys via
      PBKDF2-HMAC-SHA256; HMAC must verify before decrypting. Column
      en_blob.

    Salts/ivs are deterministic md5 digests of the record id, so the
    fixture is byte-stable across regenerations.
    """
    import hashlib
    import hmac as hm

    from jimmy_spark.datagen.aes import aes128_cbc_encrypt

    pw = ENC_PASSWORD
    pdf = _rows(images_parquet)
    out = {"image_id": [], "cn_salt": [], "cn_ct": [], "en_blob": []}
    for r in pdf.itertuples():
        rid = r.image_id.encode()
        plain = r.caption.encode()
        # colornote shape
        salt = hashlib.md5(rid + b"/cn-salt").digest()
        key = hashlib.md5(pw + salt).digest()
        iv = hashlib.md5(key + pw + salt).digest()
        cn_ct = aes128_cbc_encrypt(key, iv, plain)
        # evernote ENC0 shape
        e_salt = hashlib.md5(rid + b"/en-salt").digest()
        h_salt = hashlib.md5(rid + b"/en-hsalt").digest()
        e_iv = hashlib.md5(rid + b"/en-iv").digest()
        e_key = hashlib.pbkdf2_hmac("sha256", pw, e_salt, PBKDF2_ITERS, 16)
        ct = aes128_cbc_encrypt(e_key, e_iv, plain)
        msg = b"ENC0" + e_salt + h_salt + e_iv + ct
        h_key = hashlib.pbkdf2_hmac("sha256", pw, h_salt, PBKDF2_ITERS, 16)
        blob = msg + hm.new(h_key, msg, hashlib.sha256).digest()
        out["image_id"].append(r.image_id)
        out["cn_salt"].append(salt)
        out["cn_ct"].append(cn_ct)
        out["en_blob"].append(blob)
    pd.DataFrame(out).to_parquet(out_path, index=False)


CRDT_DECOY = "draft "


def write_crdt_notes(images_parquet: str, out_path: str) -> None:
    """CRDT op-log twin (sources/crdt.py QCRD1 format): client 0 types the
    caption character by character; client 1 concurrently types a decoy
    prefix at the document start which client 0 then deletes — so the
    converged fold must equal the caption exactly (origin-tree ordering,
    tombstones and sibling conflict all exercised). Ops are written in a
    per-doc seeded SHUFFLED order, so decoding cannot rely on log order."""
    import random

    from jimmy_spark.sources.crdt import START, encode_ops

    pdf = _rows(images_parquet)
    out = {"doc_id": [], "ops": []}
    for r in pdf.itertuples():
        ops = []
        prev = START
        for i, ch in enumerate(r.caption):
            oid = (0, i)
            ops.append(("ins", oid, prev, ch))
            prev = oid
        dprev = START
        base = len(r.caption)
        for j, ch in enumerate(CRDT_DECOY):
            oid = (1, j)
            ops.append(("ins", oid, dprev, ch))
            ops.append(("del", (0, base + j), oid))
            dprev = oid
        rng = random.Random(f"crdt/{r.image_id}")
        rng.shuffle(ops)
        out["doc_id"].append(r.image_id)
        out["ops"].append(encode_ops(ops))
    pd.DataFrame(out).to_parquet(out_path, index=False)


def write_xml_notes(images_parquet: str, out_dir: str, shards: int = 4) -> None:
    """WordPress-ish XML export: <channel><item>...</item></channel> per
    shard file; text fields are XML-escaped (the parser unescapes, so the
    round trip is lossless)."""
    d = Path(out_dir)
    d.mkdir(parents=True, exist_ok=True)
    pdf = _rows(images_parquet)
    for si in range(shards):
        part = pdf.iloc[si::shards]
        with open(d / f"export{si}.xml", "w") as f:
            f.write("<channel>\n")
            for r in part.itertuples():
                f.write(
                    "  <item>"
                    f"<post_id>{escape(r.image_id)}</post_id>"
                    f"<title>{escape(r.caption)}</title>"
                    f"<fmt>{escape(r.fmt)}</fmt>"
                    f"<width>{int(r.w)}</width>"
                    f"<height>{int(r.h)}</height>"
                    "</item>\n"
                )
            f.write("</channel>\n")


def write_eml_notes(images_parquet: str, out_dir: str, shards: int = 4) -> None:
    """RFC-5322/MIME .eml fixtures (the reference's stdlib-email scan,
    /root/reference/src/jimmy/md_lib/eml.py:15-115). The MIME tree is
    hand-assembled here — boundaries, base64 and quoted-printable transfer
    encodings written byte by byte — so the executor-side parser
    (sources/eml.py) is NOT round-tripping its own serializer.

    Per row (branch selectors are md5(image_id) hex digits, so the DuckDB
    oracle recomputes them):
    - digit0 >= '5': multipart/alternative(text/plain [quoted-printable,
      the caption] + text/html [base64, decoy]) — best-body selection must
      pick PLAIN;
    - digit0 <  '5': alternative has ONLY text/html — the scan must fall
      back to html and convert it to markdown;
    - digit1 < '4': two attachments, else one — application/octet-stream,
      base64, filename + Content-ID, payload derived from the caption so
      md5 fidelity is SQL-checkable.
    """
    import base64
    import hashlib
    import quopri
    from email.utils import formatdate

    d = Path(out_dir)
    d.mkdir(parents=True, exist_ok=True)
    pdf = _rows(images_parquet)
    for si in range(shards):
        part = pdf.iloc[si::shards]
        for r in part.itertuples():
            rid = r.image_id
            h = hashlib.md5(rid.encode()).hexdigest()
            ts = int(h[:7], 16) % 1_000_000_000
            mb, ab = f"MB-{rid}", f"AB-{rid}"
            html = f"<p><b>doc {rid}</b> ready</p>"
            b64 = lambda b: base64.encodebytes(b).decode()
            lines = [
                f"From: u-{rid}@ex.example",
                "To: inbox@ex.example",
                f"Subject: note {rid}",
                f"Date: {formatdate(ts, usegmt=True)}",
                f"Message-ID: <{rid}@ex.example>",
                "MIME-Version: 1.0",
                f'Content-Type: multipart/mixed; boundary="{mb}"',
                "",
                f"--{mb}",
                f'Content-Type: multipart/alternative; boundary="{ab}"',
                "",
            ]
            if h[0] >= "5":
                qp = quopri.encodestring(r.caption.encode("utf-8")).decode()
                lines += [
                    f"--{ab}",
                    'Content-Type: text/plain; charset="utf-8"',
                    "Content-Transfer-Encoding: quoted-printable",
                    "",
                    # no blank line after the body: the newline before the
                    # next boundary is the delimiter's, not the content's
                    qp,
                ]
            lines += [
                f"--{ab}",
                'Content-Type: text/html; charset="utf-8"',
                "Content-Transfer-Encoding: base64",
                "",
                b64(html.encode("utf-8")),
                f"--{ab}--",
            ]
            n_atts = 2 if h[1] < "4" else 1
            for k in range(n_atts):
                blob = (r.caption + f"/att{k}").encode("utf-8")
                lines += [
                    f"--{mb}",
                    "Content-Type: application/octet-stream",
                    f'Content-Disposition: attachment; filename="a{k}.bin"',
                    f"Content-ID: <cid-{rid}-{k}>",
                    "Content-Transfer-Encoding: base64",
                    "",
                    b64(blob),
                ]
            lines += [f"--{mb}--", ""]
            (d / f"msg-{rid}.eml").write_bytes("\n".join(lines).encode("utf-8"))


OFFICE_LANES = (
    "docx", "odt", "adoc", "fountain", "txt", "mht",
    "pdf", "mediawiki", "opml",
)
# mediawiki/opml land in .xml files: the reference dispatches them by
# sniffing the ROOT TAG of .xml notes (converter.py:320-340)
OFFICE_EXT = {"mediawiki": "xml", "opml": "xml"}


def _office_zip(entries: list[tuple[str, bytes]]) -> bytes:
    """Deterministic zip: fixed timestamps, fixed order, stored mimetype
    first when present (ODF convention)."""
    import io
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, data in entries:
            info = zipfile.ZipInfo(name, date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(
                info, data,
                compress_type=(
                    zipfile.ZIP_STORED if name == "mimetype"
                    else zipfile.ZIP_DEFLATED
                ),
            )
    return buf.getvalue()


_DOCX_CT = b"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
<Default Extension="xml" ContentType="application/xml"/>
<Override PartName="/word/document.xml" ContentType="application/vnd.openxmlformats-officedocument.wordprocessingml.document.main+xml"/>
</Types>"""

_DOCX_ROOT_RELS = b"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="word/document.xml"/>
</Relationships>"""


def _docx_bytes(rid: str, caption: str, fmt: str, w: int, h: int,
                phash: int) -> bytes:
    """Real WordprocessingML container: Heading1 title, bold/italic runs,
    a numPr bullet list carrying the caption verbatim, a rels-resolved
    hyperlink and a 2x2 table."""
    c = escape(caption)
    doc = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<w:document xmlns:w="http://schemas.openxmlformats.org/wordprocessingml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
<w:body>
<w:p><w:pPr><w:pStyle w:val="Heading1"/></w:pPr><w:r><w:t xml:space="preserve">note {rid}</w:t></w:r></w:p>
<w:p><w:r><w:t xml:space="preserve">size </w:t></w:r><w:r><w:rPr><w:b/></w:rPr><w:t>{w}x{h}</w:t></w:r><w:r><w:t xml:space="preserve"> fmt </w:t></w:r><w:r><w:rPr><w:i/></w:rPr><w:t>{fmt}</w:t></w:r></w:p>
<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/><w:numId w:val="1"/></w:numPr></w:pPr><w:r><w:t xml:space="preserve">{c}</w:t></w:r></w:p>
<w:p><w:pPr><w:numPr><w:ilvl w:val="0"/><w:numId w:val="1"/></w:numPr></w:pPr><w:r><w:t xml:space="preserve">phash {phash}</w:t></w:r></w:p>
<w:p><w:hyperlink r:id="rId1"><w:r><w:t>origin</w:t></w:r></w:hyperlink></w:p>
<w:tbl>
<w:tr><w:tc><w:p><w:r><w:t>w</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>h</w:t></w:r></w:p></w:tc></w:tr>
<w:tr><w:tc><w:p><w:r><w:t>{w}</w:t></w:r></w:p></w:tc><w:tc><w:p><w:r><w:t>{h}</w:t></w:r></w:p></w:tc></w:tr>
</w:tbl>
</w:body></w:document>"""
    doc_rels = f"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/hyperlink" Target="https://ex.example/{rid}" TargetMode="External"/>
</Relationships>"""
    return _office_zip([
        ("[Content_Types].xml", _DOCX_CT),
        ("_rels/.rels", _DOCX_ROOT_RELS),
        ("word/document.xml", doc.encode("utf-8")),
        ("word/_rels/document.xml.rels", doc_rels.encode("utf-8")),
    ])


_ODT_MANIFEST = b"""<?xml version="1.0" encoding="UTF-8"?>
<manifest:manifest xmlns:manifest="urn:oasis:names:tc:opendocument:xmlns:manifest:1.0" manifest:version="1.2">
<manifest:file-entry manifest:full-path="/" manifest:media-type="application/vnd.oasis.opendocument.text"/>
<manifest:file-entry manifest:full-path="content.xml" manifest:media-type="text/xml"/>
</manifest:manifest>"""


def _odt_bytes(rid: str, caption: str, fmt: str, w: int, h: int,
               phash: int) -> bytes:
    """Real OpenDocument container: text:h, automatic-style bold/italic
    spans, text:list with the caption verbatim, xlink anchor, table."""
    c = escape(caption)
    content = f"""<?xml version="1.0" encoding="UTF-8"?>
<office:document-content xmlns:office="urn:oasis:names:tc:opendocument:xmlns:office:1.0" xmlns:text="urn:oasis:names:tc:opendocument:xmlns:text:1.0" xmlns:table="urn:oasis:names:tc:opendocument:xmlns:table:1.0" xmlns:style="urn:oasis:names:tc:opendocument:xmlns:style:1.0" xmlns:fo="urn:oasis:names:tc:opendocument:xmlns:xsl-fo-compatible:1.0" xmlns:xlink="http://www.w3.org/1999/xlink" office:version="1.2">
<office:automatic-styles>
<style:style style:name="TB" style:family="text"><style:text-properties fo:font-weight="bold"/></style:style>
<style:style style:name="TI" style:family="text"><style:text-properties fo:font-style="italic"/></style:style>
</office:automatic-styles>
<office:body><office:text>
<text:h text:outline-level="1">note {rid}</text:h>
<text:p>size <text:span text:style-name="TB">{w}x{h}</text:span> fmt <text:span text:style-name="TI">{fmt}</text:span></text:p>
<text:list><text:list-item><text:p>{c}</text:p></text:list-item><text:list-item><text:p>phash {phash}</text:p></text:list-item></text:list>
<text:p><text:a xlink:href="https://ex.example/{rid}">origin</text:a></text:p>
<table:table>
<table:table-row><table:table-cell><text:p>w</text:p></table:table-cell><table:table-cell><text:p>h</text:p></table:table-cell></table:table-row>
<table:table-row><table:table-cell><text:p>{w}</text:p></table:table-cell><table:table-cell><text:p>{h}</text:p></table:table-cell></table:table-row>
</table:table>
</office:text></office:body></office:document-content>"""
    return _office_zip([
        ("mimetype", b"application/vnd.oasis.opendocument.text"),
        ("META-INF/manifest.xml", _ODT_MANIFEST),
        ("content.xml", content.encode("utf-8")),
    ])


def _adoc_text(rid: str, caption: str, fmt: str, w: int, h: int,
               phash: int) -> str:
    return (
        f"= note {rid}\n\nsize *{w}x{h}* fmt _{fmt}_\n\n"
        f"* {caption}\n* phash {phash}\n\n"
        f"link:https://ex.example/{rid}[origin]\n\n"
        f'[source,python]\n----\nprint({w}, "[x](y)")\n----'
    )


def _mht_bytes(rid: str) -> bytes:
    """Single-part MIME web archive (converter.py:265 routes mht/mhtml to
    the eml scan) — text/html body, base64 transfer encoding; the html
    fragment is the same one the eml fixtures plant, so the html->md
    conversion parity is already pinned."""
    import base64

    html = f"<p><b>doc {rid}</b> ready</p>"
    lines = [
        "From: exporter@ex.example",
        f"Subject: msg {rid}",
        f"Message-ID: <{rid}@ex.example>",
        "MIME-Version: 1.0",
        'Content-Type: text/html; charset="utf-8"',
        "Content-Transfer-Encoding: base64",
        "",
        base64.encodebytes(html.encode("utf-8")).decode(),
    ]
    return "\n".join(lines).encode("utf-8")


def _pdf_text_string(s: str) -> bytes:
    """UTF-16BE hex string with BOM (the PDF text-string encoding)."""
    data = b"\xfe\xff" + s.encode("utf-16-be")
    return b"<" + data.hex().encode("ascii") + b">"


def _pdf_bytes(rid: str, caption: str, phash: int) -> bytes:
    """Real single-page PDF: xref-addressed objects and a FlateDecode
    content stream whose Tj operators carry the title (18pt — the
    heading-detection lane) and the caption/phash lines (12pt). The
    extractor (functions/pdftext.py) must decompress and evaluate the
    text operators, not pattern-match the file."""
    import zlib

    lines = [
        (18, 720, f"note {rid}"),
        (12, 700, caption),
        (12, 680, f"phash {phash}"),
    ]
    ops = b""
    for size, y, text_ in lines:
        ops += (
            b"BT /F1 %d Tf 72 %d Td " % (size, y)
            + _pdf_text_string(text_) + b" Tj ET\n"
        )
    content = zlib.compress(ops)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        (b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
         b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>"),
        (b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(content)
         + content + b"\nendstream"),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


def _attr(s: str) -> str:
    """XML attribute-safe escape: tabs/newlines as character references so
    attribute-value normalization cannot rewrite them to spaces."""
    return escape(s, {'"': "&quot;", "\t": "&#9;", "\n": "&#10;",
                      "\r": "&#13;"})


def _mediawiki_xml(rid: str, caption: str, fmt: str, w: int, h: int,
                   phash: int) -> str:
    markup = (
        f"== note {rid} ==\n\n'''{w}x{h}''' ''{fmt}''\n\n"
        f"* {caption}\n* phash {phash}\n\n"
        f"[https://ex.example/{rid} origin]"
    )
    return (
        '<mediawiki xmlns="http://www.mediawiki.org/xml/export-0.11/">'
        f"<page><title>note {rid}</title><revision><text>"
        f"{escape(markup)}</text></revision></page></mediawiki>"
    )


def _opml_xml(rid: str, caption: str, w: int, h: int, phash: int) -> str:
    return (
        '<opml version="2.0"><head>'
        f"<title>note {rid}</title></head><body>"
        f'<outline text="{_attr(caption)}">'
        f'<outline text="phash {phash}"/></outline>'
        f'<outline text="size {w}x{h}"/></body></opml>'
    )


def write_office_notes(images_parquet: str, out_dir: str) -> None:
    """DefaultConverter folder fixtures (converter.py:239-382's recursive
    walk + per-extension dispatch): each t2 row becomes ONE file named
    ``note-<image_id>.<ext>``, the lane selected by the row's first
    md5 hex digit mod 9 (SQL-recomputable) over docx/odt/adoc/fountain/
    txt/mht/pdf/mediawiki/opml (the last two land in .xml files — the
    reference sniffs their ROOT TAG). Two fixed non-note files exercise the walk's skip and
    error lanes: an image (skipped, converter.py:244-246) and a
    corrupt docx (per-record error isolation). Container bytes are
    deterministic (fixed zip timestamps), so regeneration is stable."""
    import hashlib
    import shutil

    d = Path(out_dir)
    # lane assignment names the files, so a recipe change strands stale
    # filenames — regeneration must start from an empty tree
    if d.exists():
        shutil.rmtree(d)
    d.mkdir(parents=True, exist_ok=True)
    pdf = _rows(images_parquet)
    for r in pdf.itertuples():
        rid = r.image_id
        lane = OFFICE_LANES[
            int(hashlib.md5(rid.encode()).hexdigest()[0], 16)
            % len(OFFICE_LANES)
        ]
        path = d / f"note-{rid}.{OFFICE_EXT.get(lane, lane)}"
        w, h, ph = int(r.w), int(r.h), int(r.phash)
        if lane == "docx":
            path.write_bytes(_docx_bytes(rid, r.caption, r.fmt, w, h, ph))
        elif lane == "odt":
            path.write_bytes(_odt_bytes(rid, r.caption, r.fmt, w, h, ph))
        elif lane == "adoc":
            path.write_text(_adoc_text(rid, r.caption, r.fmt, w, h, ph))
        elif lane == "fountain":
            path.write_text(r.caption)
        elif lane == "txt":
            path.write_text(r.caption)
        elif lane == "pdf":
            path.write_bytes(_pdf_bytes(rid, r.caption, ph))
        elif lane == "mediawiki":
            path.write_text(_mediawiki_xml(rid, r.caption, r.fmt, w, h, ph))
        elif lane == "opml":
            path.write_text(_opml_xml(rid, r.caption, w, h, ph))
        else:  # mht
            path.write_bytes(_mht_bytes(rid))
    # the walk's skip + error lanes (fixed content, not per-row)
    (d / "diagram.png").write_bytes(b"\x89PNG\r\n\x1a\nnot-a-note")
    (d / "broken-zip.docx").write_bytes(b"PK\x03\x04 truncated garbage")
