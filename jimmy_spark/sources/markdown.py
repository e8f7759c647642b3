"""Markdown-folder source — the reference's DefaultConverter family
(converter.py:177-320, obsidian.py:44-86): a directory of .md files where
YAML frontmatter is parsed on READ.

Spark-native shape: ``binaryFile`` scans the folder (many small files
pack per task by bytes), one Arrow-batched ``mapInPandas`` runs the
frontmatter mini-YAML + inline-tag kernels per record with per-record
error isolation. Known keys (title, author, created/updated, latitude/
longitude/altitude) land in typed columns; ``tags`` merges frontmatter
tags with inline ``#tag``s (obsidian.py:59-74); every remaining key goes
to the open ``meta`` map — the reference's ``custom_metadata``
discipline (converter.py:278-293).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MD_SCHEMA = (
    "path string, name string, ok boolean, error string, title string, "
    "author string, created long, body string, tags array<string>, "
    "meta map<string,string>"
)

_TYPED_KEYS = (
    "title", "author", "created", "updated",
    "latitude", "longitude", "altitude",
)


def _to_epoch(v) -> int | None:
    """created/updated values: epoch ints pass through; ISO-ish strings
    parse via pandas (tz-naive treated as UTC); anything else -> None."""
    if isinstance(v, bool) or v is None:
        return None
    if isinstance(v, (int, float)):
        return int(v)
    try:
        ts = pd.Timestamp(str(v))
        if ts.tzinfo is None:
            ts = ts.tz_localize("UTC")
        return int(ts.timestamp())
    except (ValueError, OverflowError):
        return None


def parse_md_record(name: str, text: str) -> dict:
    from jimmy_spark.functions.frontmatter import (
        get_inline_tags,
        parse_frontmatter,
    )

    meta, body = parse_frontmatter(text)
    fm_tags = meta.get("tags", [])
    if not isinstance(fm_tags, list):
        fm_tags = [fm_tags]
    # frontmatter tags + inline #tags, deduped, deterministic order
    tags = sorted(
        {str(t) for t in fm_tags} | set(get_inline_tags(body, ["#"]))
    )
    # an empty 'title:'/'author:' line parses to [] (block-list sentinel);
    # treat it as absent — title falls back to the filename stem, author
    # to None — instead of str()-ing a python literal into the field
    def _absent(v):
        return v is None or v == []

    title = meta.get("title")
    if _absent(title):
        title = None
    custom = {
        k: (", ".join(str(x) for x in v) if isinstance(v, list) else str(v))
        for k, v in meta.items()
        if k not in _TYPED_KEYS and k != "tags"
    }
    return {
        "name": name,
        "ok": True,
        "error": None,
        # title from frontmatter, else the filename stem (obsidian.py:48)
        "title": str(title) if title is not None else name,
        "author": None if _absent(meta.get("author")) else str(meta["author"]),
        "created": _to_epoch(meta.get("created")),
        "body": body,
        "tags": tags,
        "meta": custom,
    }


MD_SUFFIXES = (".md", ".mdown", ".markdown")  # common.py:61 MARKDOWN_SUFFIXES


def read_markdown(spark: SparkSession, md_dir: str) -> DataFrame:
    """Scan a folder TREE of markdown files into typed rows (MD_SCHEMA).
    Recursive like the reference's convert_folder walk (obsidian.py:76-85)
    — vaults keep notes in subfolders — and accepts every reference
    markdown suffix, not just .md."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{md,mdown,markdown}")
        .option("recursiveFileLookup", "true")
        .load(md_dir)
        .select("path", "content")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.split()[0] for f in MD_SCHEMA.split(", ")]
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                name = path.rsplit("/", 1)[-1]
                for suf in MD_SUFFIXES:
                    if name.endswith(suf):
                        name = name.removesuffix(suf)
                        break
                try:
                    rec = parse_md_record(name, bytes(blob).decode("utf-8"))
                    rec["path"] = path
                    rows.append(rec)
                except Exception as e:  # noqa: BLE001 — per-record isolation
                    rows.append(
                        {
                            "path": path, "name": name, "ok": False,
                            "error": str(e), "title": None, "author": None,
                            "created": None, "body": None, "tags": [],
                            "meta": {},
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(gen, MD_SCHEMA)
