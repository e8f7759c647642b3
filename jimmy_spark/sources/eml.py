"""EML (RFC-5322/MIME) source: executor-side stdlib-``email`` parsing of
mail exports.

The reference's eml scan (/root/reference/src/jimmy/md_lib/eml.py:15-115,
dispatched for ``.eml`` by converter.py:250-349) walks the MIME tree:
multipart/alternative picks the BEST body via
``get_body(preferencelist=("plain", "html"))``, text/html bodies are
converted to markdown, other leaf parts become attachments (Content-ID /
filename preserved), and the Date header (falling back to the last
Received stamp) becomes the note timestamp.

Spark-native shape: ``binaryFile`` scans the mail directory (each message
is one small blob — Spark packs many files per task, so a 10^9-message
archive parallelizes by total bytes, not by file count), then one
Arrow-batched ``mapInPandas`` runs the stdlib parser per record with
per-record error isolation — a malformed message yields an error row,
never a failed task. Attachment BYTES never leave the executor: the scan
emits their names and md5s (the dedup/fidelity key); a real pipeline
would sink the payloads straight to object storage from the same task.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

EML_SCHEMA = (
    "msg_id string, ok boolean, error string, subject string, "
    "author string, date_ts long, body string, best_mime string, "
    "n_attachments int, att_names string, att_md5 string"
)


def _decode_payload(part) -> str:
    """Charset-tolerant text decode (eml.py:15-22's decode_payload)."""
    content = part.get_payload(decode=True)
    charset = part.get_content_charset("utf-8")
    try:
        return content.decode(charset)
    except (LookupError, UnicodeDecodeError):
        return content.decode("utf-8", errors="ignore")


def _parse_eml(raw: bytes) -> dict:
    import email
    import email.policy
    import email.utils
    import hashlib

    from jimmy_spark.functions.markup import html_to_md

    msg = email.message_from_bytes(raw, policy=email.policy.default)

    bodies: list[tuple[str, str]] = []  # (mime, markdown-ish text)
    atts: list[tuple[str, str]] = []  # (filename, md5hex)

    def handle_part(part) -> None:
        mime = part.get_content_type()
        if mime == "text/html":
            bodies.append((mime, html_to_md(_decode_payload(part))))
        elif mime in ("text/markdown", "text/plain"):
            bodies.append((mime, _decode_payload(part)))
        elif any(
            mime.startswith(t)
            for t in ("audio/", "image/", "application/", "text/")
        ):
            content = part.get_payload(decode=True) or b""
            name = part.get_filename("unnamed")
            atts.append((name, hashlib.md5(content).hexdigest()))

    def walk(m) -> None:
        if m.is_multipart():
            if m.get_content_type() == "multipart/alternative":
                best = m.get_body(preferencelist=("plain", "html"))
                if best is not None:
                    handle_part(best)
            else:
                for p in m.get_payload():
                    walk(p)
        else:
            handle_part(m)

    walk(msg)

    date_ts = None
    for stamp in (msg["Date"], (msg["Received"] or "; ").split("; ")[-1]):
        if stamp:
            try:
                date_ts = int(
                    email.utils.parsedate_to_datetime(stamp).timestamp()
                )
                break
            except ValueError:
                continue

    mid = msg["Message-ID"] or ""
    return {
        "msg_id": mid.strip("<>").split("@")[0],
        "ok": True,
        "error": None,
        "subject": None if msg["Subject"] is None else str(msg["Subject"]),
        "author": None if msg["From"] is None else str(msg["From"]),
        "date_ts": date_ts,
        "body": "\n".join(b for _, b in bodies),
        "best_mime": bodies[0][0] if bodies else None,
        "n_attachments": len(atts),
        # unit-separator joined: a comma is legal in a MIME filename and
        # would mis-pair names with md5s downstream; \x1f cannot appear
        # in either
        "att_names": "\x1f".join(n for n, _ in atts),
        "att_md5": "\x1f".join(h for _, h in atts),
    }


def read_eml(spark: SparkSession, eml_dir: str) -> DataFrame:
    """Scan a directory of .eml files into typed rows (EML_SCHEMA)."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.eml")
        .load(eml_dir)
        .select("path", "content")
    )
    return parse_eml_frame(files)


def parse_eml_frame(files: DataFrame) -> DataFrame:
    """Parse a (path, content:binary) frame — batch (binaryFile) and
    streaming (text wholetext, encoded) scans share this stage."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.split()[0] for f in EML_SCHEMA.split(", ")]
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                try:
                    rows.append(_parse_eml(bytes(blob)))
                except Exception as e:  # noqa: BLE001 — per-record isolation
                    rows.append(
                        {
                            "msg_id": path.rsplit("/", 1)[-1],
                            "ok": False,
                            "error": str(e),
                            "subject": None,
                            "author": None,
                            "date_ts": None,
                            "body": None,
                            "best_mime": None,
                            "n_attachments": 0,
                            "att_names": None,
                            "att_md5": None,
                        }
                    )
            yield pd.DataFrame(rows, columns=cols)

    return files.mapInPandas(gen, EML_SCHEMA)
