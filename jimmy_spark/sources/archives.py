"""Archive sources: zip/tar members -> rows, extracted ON THE EXECUTORS.

The reference extracts zip/tar/tgz archives to temp folders on the driver
before converting (BaseConverter.prepare_input,
/root/reference/src/jimmy/converter.py:43-58 + common.py:473-503, and
Notion's zip-of-zips, formats/notion.py:20-36). The Spark-native shape is
a ``binaryFile`` scan of the archive files followed by a ``mapInPandas``
that opens each archive IN MEMORY inside the task and emits one row per
member — extraction parallelizes across archives, nothing touches the
driver, and a corrupt archive is error-isolated to its own rows like every
other decode stage (common.py:66-82 catch_all_exceptions analogue).

Scale notes: one task per archive file (binaryFile does not split), so
throughput scales with the number of archives — the right unit at 10^12
scale where ingest ships millions of shard archives. Member bytes stay
inside the task until the downstream decode prunes them; memory is bounded
by one archive per task (maxPartitionBytes caps how many small archives
batch into a task).
"""

from __future__ import annotations

import io
import json
import tarfile
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MEMBER_SCHEMA = (
    "archive string, member string, content binary, ok boolean, error string"
)

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, "
    "caption string, phash long"
)


def _iter_members(path: str, blob: bytes):
    """Yield (member_name, bytes) for one archive (zip or tar[.gz/.tgz]);
    deterministic member order (sorted by name, matching the reference's
    sorted-iterdir discipline, converter.py:372)."""
    if path.endswith(".zip"):
        with zipfile.ZipFile(io.BytesIO(blob)) as zf:
            for name in sorted(zf.namelist()):
                if not name.endswith("/"):
                    yield name, zf.read(name)
    elif path.endswith((".tar", ".tar.gz", ".tgz")):
        with tarfile.open(fileobj=io.BytesIO(blob)) as tf:
            members = sorted(
                (m for m in tf.getmembers() if m.isfile()), key=lambda m: m.name
            )
            for m in members:
                yield m.name, tf.extractfile(m).read()
    else:
        raise ValueError(f"unsupported archive type: {path}")


def extract_members(archives: DataFrame, max_depth: int = 1) -> DataFrame:
    """binaryFile rows (path, content) -> one row per archive member.
    A broken archive yields a single ok=false row carrying the error.

    ``max_depth`` > 1 recurses into members that are themselves archives
    (Notion's zip-of-zips export, /root/reference/src/jimmy/formats/
    notion.py:20-36): a nested member's rows carry the joined path
    ``outer.zip!inner.zip`` and the inner archive itself emits no row.
    Depth is bounded — a malicious 1000-deep bomb stops at max_depth and
    surfaces the remaining archive as an ordinary binary member."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def walk(rows: list, path: str, blob: bytes, depth: int) -> None:
            for name, data in _iter_members(path, blob):
                if depth < max_depth and name.endswith(
                    (".zip", ".tar", ".tar.gz", ".tgz")
                ):
                    try:
                        walk(rows, f"{path}!{name}", data, depth + 1)
                        continue
                    except Exception as e:  # noqa: BLE001
                        rows.append((f"{path}!{name}", None, None, False, str(e)))
                        continue
                rows.append((path, name, data, True, None))

        for pdf in batches:
            rows: list = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                try:
                    walk(rows, path, bytes(blob), 1)
                except Exception as e:  # noqa: BLE001 — per-archive isolation
                    rows.append((path, None, None, False, str(e)))
            yield pd.DataFrame(
                rows, columns=["archive", "member", "content", "ok", "error"]
            )

    return archives.select("path", "content").mapInPandas(gen, MEMBER_SCHEMA)


def read_archives(
    spark: SparkSession, path_glob: str, max_depth: int = 1
) -> DataFrame:
    """Scan archive files and explode their members to rows."""
    return extract_members(
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{zip,tar,tgz}")
        .load(path_glob),
        max_depth=max_depth,
    )


def read_image_archives(spark: SparkSession, path_glob: str) -> DataFrame:
    """Archives of images -> the engine's input-table shape (IMAGES_SCHEMA).

    Layout contract per archive: image members named ``<image_id>.<fmt>``
    plus one ``manifest.json`` mapping image_id -> {w, h, caption, phash}
    (the archive analogue of the Iceberg table's typed metadata columns).
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for path, blob in zip(pdf["path"], pdf["content"]):
                try:
                    members = dict(_iter_members(path, bytes(blob)))
                except Exception as e:  # noqa: BLE001 — per-archive isolation
                    # never drop an archive silently: surface a sentinel row
                    # (null bytes) that the downstream decode stage
                    # error-isolates like any other corrupt record
                    rows.append(
                        (f"__corrupt_archive__:{path}", None, None, None,
                         "unreadable", str(e), None)
                    )
                    continue
                manifest = json.loads(members.pop("manifest.json", b"{}"))
                for name in sorted(members):
                    image_id, _, fmt = name.rpartition(".")
                    meta = manifest.get(image_id, {})
                    rows.append(
                        (
                            image_id,
                            members[name],
                            meta.get("w"),
                            meta.get("h"),
                            fmt,
                            meta.get("caption"),
                            meta.get("phash"),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "bytes", "w", "h", "fmt", "caption", "phash"],
            )

    # same extension filter as read_archives: without it any non-underscore
    # stray file in the directory (Spark's binaryFile only hides _-prefixed
    # files like the datagen _MARKER.json) would surface as a spurious
    # __corrupt_archive__ sentinel row and break oracle parity
    scan = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.{zip,tar,tgz}")
        .load(path_glob)
    )
    return scan.select("path", "content").mapInPandas(gen, IMAGES_SCHEMA)
