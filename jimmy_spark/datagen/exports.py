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
