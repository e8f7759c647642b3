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
