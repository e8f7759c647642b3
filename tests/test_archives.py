"""Archive sources: executor-side zip/tar extraction == direct parquet rows."""

from __future__ import annotations

import io
import json
import tarfile
import zipfile

import pandas as pd
import pytest

from jimmy_spark.sources import archives


@pytest.fixture(scope="module")
def image_rows(spark, t1_dir):
    return (
        spark.read.parquet(f"{t1_dir}/images.parquet")
        .orderBy("image_id")
        .limit(40)
        .toPandas()
    )


def _write_zip(path, rows: pd.DataFrame) -> None:
    manifest = {
        r.image_id: {
            "w": int(r.w), "h": int(r.h),
            "caption": r.caption, "phash": int(r.phash),
        }
        for r in rows.itertuples()
    }
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("manifest.json", json.dumps(manifest))
        for r in rows.itertuples():
            zf.writestr(f"{r.image_id}.{r.fmt}", bytes(r.bytes))


def _write_tgz(path, rows: pd.DataFrame) -> None:
    manifest = {
        r.image_id: {
            "w": int(r.w), "h": int(r.h),
            "caption": r.caption, "phash": int(r.phash),
        }
        for r in rows.itertuples()
    }
    with tarfile.open(path, "w:gz") as tf:

        def add(name: str, data: bytes) -> None:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))

        add("manifest.json", json.dumps(manifest).encode())
        for r in rows.itertuples():
            add(f"{r.image_id}.{r.fmt}", bytes(r.bytes))


def test_image_archives_roundtrip(spark, image_rows, tmp_path):
    d = tmp_path / "arch"
    d.mkdir()
    _write_zip(d / "shard0.zip", image_rows.iloc[:20])
    _write_tgz(d / "shard1.tgz", image_rows.iloc[20:])

    got = (
        archives.read_image_archives(spark, str(d))
        .toPandas()
        .sort_values("image_id")
        .reset_index(drop=True)
    )
    exp = image_rows.sort_values("image_id").reset_index(drop=True)
    assert list(got["image_id"]) == list(exp["image_id"])
    for col in ("w", "h", "fmt", "caption", "phash"):
        assert list(got[col]) == list(exp[col]), col
    assert all(bytes(a) == bytes(b) for a, b in zip(got["bytes"], exp["bytes"]))


def test_member_extraction_and_error_isolation(spark, tmp_path):
    d = tmp_path / "arch2"
    d.mkdir()
    with zipfile.ZipFile(d / "good.zip", "w") as zf:
        zf.writestr("a.txt", b"alpha")
        zf.writestr("sub/b.txt", b"beta")
    (d / "broken.zip").write_bytes(b"PK\x03\x04 this is not a real zip")

    scan = spark.read.format("binaryFile").load(str(d))
    out = archives.extract_members(scan).toPandas()
    good = out[out["ok"]].sort_values("member")
    assert list(good["member"]) == ["a.txt", "sub/b.txt"]
    assert [bytes(c) for c in good["content"]] == [b"alpha", b"beta"]
    bad = out[~out["ok"]]
    assert len(bad) == 1 and "broken.zip" in bad.iloc[0]["archive"]
    assert bad.iloc[0]["error"]


def test_image_archive_corrupt_surfaces_sentinel(spark, image_rows, tmp_path):
    """A corrupt archive must not vanish silently: it becomes a sentinel
    row that the downstream decode stage error-isolates."""
    from jimmy_spark.operators import decode

    d = tmp_path / "arch4"
    d.mkdir()
    _write_zip(d / "good.zip", image_rows.iloc[:5])
    (d / "bad.zip").write_bytes(b"PK\x03\x04 truncated")
    src = archives.read_image_archives(spark, str(d))
    pdf = src.toPandas()
    assert len(pdf) == 6
    bad = pdf[pdf["image_id"].str.startswith("__corrupt_archive__")]
    assert len(bad) == 1 and bad.iloc[0]["fmt"] == "unreadable"
    out = decode.decode_stage(src).toPandas()
    assert out["ok"].sum() == 5 and (~out["ok"]).sum() == 1


def test_decode_runs_on_archive_source(spark, image_rows, tmp_path):
    """The archive source feeds the decode stage unchanged (same schema)."""
    from jimmy_spark.operators import decode

    d = tmp_path / "arch3"
    d.mkdir()
    _write_zip(d / "s.zip", image_rows.iloc[:10])
    src = archives.read_image_archives(spark, str(d))
    out = decode.decode_stage(src).toPandas()
    assert len(out) == 10 and out["ok"].all()


def test_nested_zip_of_zips(spark, tmp_path):
    """Notion's zip-of-zips shape (notion.py:20-36): inner archives explode
    recursively with joined paths; depth is bounded; a non-archive member
    at any level stays a plain row."""
    inner = io.BytesIO()
    with zipfile.ZipFile(inner, "w") as zf:
        zf.writestr("note1.md", b"hello")
        zf.writestr("note2.md", b"world")
    deep = io.BytesIO()
    with zipfile.ZipFile(deep, "w") as zf:
        zf.writestr("deepest.md", b"bottom")
    mid = io.BytesIO()
    with zipfile.ZipFile(mid, "w") as zf:
        zf.writestr("deep.zip", deep.getvalue())
        zf.writestr("readme.txt", b"top-of-mid")
    outer_path = tmp_path / "export.zip"
    with zipfile.ZipFile(outer_path, "w") as zf:
        zf.writestr("inner.zip", inner.getvalue())
        zf.writestr("mid.zip", mid.getvalue())
        zf.writestr("cover.png", b"\x89PNGfake")

    out = archives.read_archives(spark, str(tmp_path), max_depth=2).collect()
    got = {(r.archive.split("/")[-1], r.member): bytes(r.content) for r in out}
    assert got[("export.zip!inner.zip", "note1.md")] == b"hello"
    assert got[("export.zip!inner.zip", "note2.md")] == b"world"
    assert got[("export.zip!mid.zip", "readme.txt")] == b"top-of-mid"
    # depth bound: deep.zip at depth 3 stays an opaque binary member
    assert ("export.zip!mid.zip", "deep.zip") in got
    assert got[("export.zip", "cover.png")] == b"\x89PNGfake"
    # depth 3 unlocks it
    out3 = archives.read_archives(spark, str(tmp_path), max_depth=3).collect()
    got3 = {(r.archive.split("/")[-1], r.member): bytes(r.content) for r in out3}
    assert got3[("export.zip!mid.zip!deep.zip", "deepest.md")] == b"bottom"


def test_nested_corrupt_inner_is_isolated(spark, tmp_path):
    with zipfile.ZipFile(tmp_path / "outer.zip", "w") as zf:
        zf.writestr("broken.zip", b"PK\x03\x04 not really a zip")
        zf.writestr("fine.md", b"ok")
    out = archives.read_archives(spark, str(tmp_path), max_depth=2).collect()
    by_member = {r.member: r for r in out if r.member}
    assert bytes(by_member["fine.md"].content) == b"ok"
    bad = [r for r in out if not r.ok]
    assert len(bad) == 1 and bad[0].archive.endswith("outer.zip!broken.zip")
