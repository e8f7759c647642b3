"""Filesystem-walk source: the reference's DefaultConverter family
(/root/reference/src/jimmy/converter.py:239-382 ``convert_note`` /
``convert_file_or_folder``) as one distributed scan.

The reference recursively walks a folder and dispatches per extension:
markdown (frontmatter parse), txt (as-is), fountain (code-fence wrap),
asciidoc / docx / odt (pandoc), eml/mht/mhtml (MIME scan), xml
(root-tag dispatch with a raw-text fallback), images skipped, files
without extension ignored — then extracts inline ``#tags`` from every
converted body (converter.py:352-353).

Spark-native shape: one ``binaryFile`` scan with ``recursiveFileLookup``
(the folder tree parallelizes by total bytes, not file count — a
10^9-file vault is just another scan), then one Arrow-batched
``mapInPandas`` running the per-extension converters executor-side with
per-record error isolation. The pandoc formats go through the native
stdlib converters in functions/office.py (documented subset — the
sandbox has no pandoc binary, and a per-note subprocess is the wrong
shape on an executor anyway)."""

from __future__ import annotations

import posixpath
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

FOLDER_SCHEMA = (
    "path string, name string, ext string, ok boolean, error string, "
    "title string, body string, ts long, tags array<string>, n_links int"
)

# converter.py:244-246 "Skipping image" (common.is_image)
IMAGE_EXTS = {
    "png", "jpg", "jpeg", "gif", "bmp", "webp", "svg", "tif", "tiff", "ico",
}


def _convert_file(fname: str, data: bytes) -> dict | None:
    """One file -> one note dict (or None for the walk's skip lanes).
    Mirrors converter.py:250-349's match statement."""
    from jimmy_spark.functions.frontmatter import (
        get_inline_tags,
        parse_frontmatter,
    )
    from jimmy_spark.functions.office import adoc_to_md, docx_to_md, odt_to_md

    stem, dot, ext = fname.rpartition(".")
    ext = ext.lower() if dot else ""
    if not ext:
        return None  # converter.py:363-366: no extension -> ignored
    if ext in IMAGE_EXTS:
        return None  # converter.py:244-246: images are resources, not notes

    title = stem
    ts: int | None = None
    tags: list[str] = []
    if ext in ("eml", "mht", "mhtml"):
        # converter.py:265-268 routes mail/web archives to the MIME scan
        from jimmy_spark.sources.eml import _parse_eml

        rec = _parse_eml(data)
        body = rec["body"]
        title = rec["subject"] or stem
        ts = rec["date_ts"]
    elif ext in ("md", "markdown"):
        meta, body = parse_frontmatter(data.decode("utf-8"))
        title = str(meta.get("title", stem))
        created = meta.get("created")
        ts = int(created) if isinstance(created, int) else None
        tags = [str(t) for t in meta.get("tags", [])]
    elif ext in ("txt", "text"):
        body = data.decode("utf-8")
    elif ext == "fountain":
        # converter.py:269-273: wrap the screenplay in a fenced block
        body = f"```fountain\n{data.decode('utf-8')}\n```\n"
    elif ext in ("adoc", "asciidoc", "asciidoctor"):
        body = adoc_to_md(data.decode("utf-8"))
    elif ext == "docx":
        body = docx_to_md(data)
    elif ext == "odt":
        body = odt_to_md(data)
    elif ext == "pdf":
        # converter.py:296-306 (pdf_oxide to_markdown_all with
        # detect_headings) — the stdlib subset extractor
        from jimmy_spark.functions.pdftext import pdf_to_md

        body = pdf_to_md(data)
    elif ext == "xml":
        # converter.py:320-340: dispatch on the ROOT TAG (mediawiki/opml
        # convert, anything else falls back to the raw text)
        from jimmy_spark.functions.office import xml_export_to_md

        body = xml_export_to_md(data.decode("utf-8"))
    else:
        # the pandoc last-resort falls back to the raw text in this
        # subset; documented divergence for exotic markups
        body = data.decode("utf-8", errors="replace")

    from jimmy_spark.functions.mdlinks import get_markdown_links

    tags = sorted(set(tags) | set(get_inline_tags(body, ["#"])))
    return {
        "name": stem,
        "ext": ext,
        "ok": True,
        "error": None,
        "title": title,
        "body": body,
        "ts": ts,
        "tags": tags,
        "n_links": len(get_markdown_links(body)),
    }


def read_folder(spark: SparkSession, root_dir: str) -> DataFrame:
    """Scan a folder tree into typed note rows (FOLDER_SCHEMA)."""
    raw = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(root_dir)
        .select("path", "content")
    )

    cols = [
        "path", "name", "ext", "ok", "error", "title", "body", "ts",
        "tags", "n_links",
    ]

    def conv(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"], pdf["content"]):
                fname = posixpath.basename(path)
                try:
                    rec = _convert_file(fname, bytes(content))
                    if rec is None:
                        continue
                    rec["path"] = path
                except Exception as e:  # noqa: BLE001 — per-record isolation
                    stem, _, ext = fname.rpartition(".")
                    rec = {
                        "path": path, "name": stem, "ext": ext.lower(),
                        "ok": False, "error": type(e).__name__,
                        "title": stem, "body": None, "ts": None,
                        "tags": [], "n_links": 0,
                    }
                rows.append([rec[c] for c in cols])
            yield pd.DataFrame(rows, columns=cols)

    return raw.mapInPandas(conv, FOLDER_SCHEMA)
