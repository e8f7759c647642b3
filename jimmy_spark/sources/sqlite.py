"""SQLite source: executor-side reads of a SQLite table, partitioned by
rowid ranges.

The reference reads three formats straight out of SQLite with driver-side
cursors (`/root/reference/src/jimmy/formats/anki.py:121-153`'s
``select ... from notes``, qownnotes.py:5, affine.py:2-5). The Spark-native
shape splits the table's rowid domain into ranges on the driver (two ints
of metadata — no row data), then each task opens the database READ-ONLY
via stdlib ``sqlite3`` and scans only its range: `WHERE rowid BETWEEN ? AND ?`
is an index-range scan on SQLite's clustered rowid btree, so tasks never
touch each other's pages. Rows stream out in bounded ``fetchmany`` chunks,
keeping task memory flat no matter the table size.

Scale notes: a single big .sqlite file must live on a shared filesystem
(or ship via ``SparkContext.addFile``) for a real cluster — the path is
opened per task, not broadcast. The many-small-databases case (per-user
exports, jimmy's actual workload) composes with the archive source
instead: binaryFile-scan the .sqlite/.anki2 blobs and open each in-task
from a temp spill, one task per database — same error-isolation discipline
as sources/archives.py.
"""

from __future__ import annotations

import sqlite3
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

FETCH_CHUNK = 65_536


def read_sqlite(
    spark: SparkSession,
    db_path: str,
    table: str,
    columns: list[str],
    schema: str,
    n_partitions: int = 8,
) -> DataFrame:
    """Scan ``table`` of the SQLite db at ``db_path`` into a DataFrame with
    ``schema`` (a DDL string naming exactly ``columns``), parallelized by
    rowid range. Deterministic: rows carry their own keys; no partition-
    dependent values are produced."""
    if not set(c.isidentifier() for c in columns) <= {True} or not table.isidentifier():
        raise ValueError("table/column names must be identifiers")
    col_sql = ", ".join(columns)

    # driver-side metadata only: the rowid domain (two ints)
    con = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
    try:
        lo, hi = con.execute(f"SELECT min(rowid), max(rowid) FROM {table}").fetchone()
    finally:
        con.close()
    if lo is None:
        return spark.createDataFrame([], schema)

    n = min(n_partitions, hi - lo + 1)
    step = (hi - lo + 1 + n - 1) // n
    ranges = [(lo + i * step, min(lo + (i + 1) * step - 1, hi)) for i in range(n)]
    bounds = spark.createDataFrame(ranges, "r_lo long, r_hi long").repartition(
        n, "r_lo"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        con = sqlite3.connect(f"file:{db_path}?mode=ro", uri=True)
        try:
            for pdf in batches:
                for r_lo, r_hi in zip(pdf["r_lo"], pdf["r_hi"]):
                    cur = con.execute(
                        f"SELECT {col_sql} FROM {table} "
                        "WHERE rowid BETWEEN ? AND ?",
                        (int(r_lo), int(r_hi)),
                    )
                    while True:
                        rows = cur.fetchmany(FETCH_CHUNK)
                        if not rows:
                            break
                        yield pd.DataFrame(rows, columns=columns)
        finally:
            con.close()

    return bounds.mapInPandas(gen, schema)
