#!/usr/bin/env python
"""The reference CLI's conversion surface as a deployable Spark job:
spark-submit --py-files jimmy_spark.zip jobs/convert_job.py ...

`jimmy cli <input> --format X [filters...]` analogue (SURVEY §3.1,
/root/reference/src/jimmy/jimmy_cli.py:58-198 + main.py:112-188): scan the
export container -> intermediate note schema -> glob filters -> two-pass
write (unique paths, then link-rewriting render) -> one stats JSON line on
stdout -> exit 1 if any input record errored (jimmy_cli.py:194-198).

Example:
    spark-submit --py-files dist/jimmy_spark.zip jobs/convert_job.py \
        --format eml --input data/t2/exports/eml --output /tmp/md_out \
        --include-like 'note %'
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--format", required=True,
        choices=("eml", "markdown", "jsonl", "sqlite", "xml", "archive", "folder"),
    )
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--include-like", default=None)
    ap.add_argument("--exclude-like", default=None)
    ap.add_argument("--include-tags-like", default=None)
    ap.add_argument("--exclude-tags-like", default=None)
    ap.add_argument("--no-frontmatter", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from jimmy_spark.plans import convert

    # getOrCreate may hand us a caller's session (in-process invocation);
    # only stop what this job itself created
    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("jimmy-spark-convert-job").getOrCreate()
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    stats = convert.run_conversion(
        spark,
        args.format,
        args.input,
        args.output,
        include_like=args.include_like,
        exclude_like=args.exclude_like,
        include_tags_like=args.include_tags_like,
        exclude_tags_like=args.exclude_tags_like,
        frontmatter=not args.no_frontmatter,
    )
    print(json.dumps(stats, sort_keys=True))
    if owns_session:
        spark.stop()
    return 1 if stats["errors"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
