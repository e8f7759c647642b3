"""Full-registry parity sweep: every ``queries()`` entry vs its
``oracle_sql()`` twin, rows + schema + value-hash, mirroring the driver's
CORRECTNESS gate so regressions surface before a round boundary.

Protocol (the driver's, re-implemented from its published contract):
run the Spark query and the DuckDB oracle on the same sf parquet tables,
sort columns by NAME, canonicalize values (floats to 9 significant
digits, arrays/structs to JSON, binary to hex), sort rows, md5 the
whole frame. A query passes when row count, sorted column names, and
the value hash all agree.

Usage: python scripts/sweep_parity.py [--sf /root/testdata/sf0.01] [--only q1,q2]
Writes a JSON report to /tmp/sweep_parity.json and exits nonzero on any
mismatch.
"""

from __future__ import annotations

import argparse
import hashlib
import importlib.util
import json
import math
import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def _load_entry():
    spec = importlib.util.spec_from_file_location(
        "entry", "/root/repo/__spark_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def _canon_val(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return "0"
        return f"{v:.9g}"
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_val(x) for x in v) + "]"
    if isinstance(v, dict):
        return (
            "{"
            + ",".join(
                f"{k}:{_canon_val(v[k])}" for k in sorted(v)
            )
            + "}"
        )
    if isinstance(v, np.floating):
        return _canon_val(float(v))
    if isinstance(v, (np.integer, np.bool_)):
        return str(v.item()).lower() if isinstance(v, np.bool_) else str(v.item())
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def _canon_frame(pdf: pd.DataFrame) -> tuple[int, list[str], str]:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    rows = []
    for tup in pdf.itertuples(index=False, name=None):
        rows.append("\x1f".join(_canon_val(v) for v in tup))
    rows.sort()
    h = hashlib.md5("\n".join(rows).encode("utf-8")).hexdigest()
    return len(rows), cols, h


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default="")
    args = ap.parse_args()

    entry = _load_entry()
    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = [n for n in queries if not args.only or n in args.only.split(",")]

    from jimmy_spark.session import get_spark

    spark = get_spark("sweep-parity")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
        )

    report, failed = {}, []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, args.sf).toPandas()
            s_n, s_cols, s_h = _canon_frame(sdf)
            if name in oracles:
                odf = con.execute(oracles[name]).df()
                o_n, o_cols, o_h = _canon_frame(odf)
                row = {
                    "rows_match": s_n == o_n,
                    "schema_match": s_cols == o_cols,
                    "hash_match": s_h == o_h,
                    "spark_rows": s_n,
                    "oracle_rows": o_n,
                    "err": None,
                }
                ok = row["rows_match"] and row["schema_match"] and row["hash_match"]
            else:
                row = {
                    "rows_match": None,
                    "schema_match": None,
                    "hash_match": None,
                    "spark_rows": s_n,
                    "oracle_rows": None,
                    "err": "no_oracle",
                }
                ok = s_n >= 0
        except Exception as e:  # noqa: BLE001 — sweep must not die mid-list
            row = {
                "rows_match": False,
                "schema_match": False,
                "hash_match": False,
                "spark_rows": None,
                "oracle_rows": None,
                "err": f"{type(e).__name__}: {e}"[:300],
            }
            ok = False
        row["sec"] = round(time.time() - t0, 2)
        report[name] = row
        if not ok:
            failed.append(name)
        status = "ok" if ok else "FAIL"
        print(f"{name:20s} {status:4s} {row['sec']:7.2f}s "
              f"rows={row['spark_rows']}", flush=True)

    with open("/tmp/sweep_parity.json", "w") as f:
        json.dump(report, f, indent=1)
    print(f"\n{len(names) - len(failed)}/{len(names)} green; "
          f"failed: {failed or 'none'}")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
