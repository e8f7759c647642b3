#!/usr/bin/env python
"""Production entry point for the dedup ladder:
spark-submit --py-files jimmy_spark.zip jobs/dedup_job.py ...

documents -> per-doc prep stage (checkpointed, bucket-resumable via
StageRunner — rerunning after a crash reprocesses only uncommitted
buckets) -> minhash LSH candidate pairs with exact verify -> large-star/
small-star connected components -> cluster assignment table. Mirrors
jobs/spatial_job.py's deployment shape (north_rule: spark-submit
--py-files); the global pair join and clustering are deterministic pure
functions of the prep output, so the final overwrite is idempotent.

Example:
    spark-submit --py-files dist/jimmy_spark.zip jobs/dedup_job.py \
        --docs data/documents.parquet --out /tmp/dedup_out \
        --checkpoint /tmp/dedup_cp --run-id run1 --tau 30
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--run-id", default="run1")
    ap.add_argument("--tau", type=int, default=30)
    ap.add_argument("--buckets", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from jimmy_spark.operators import dedup, text
    from jimmy_spark.streaming.checkpoint import StageRunner

    spark = SparkSession.builder.appName("jimmy-spark-dedup-job").getOrCreate()
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
    }.items():
        spark.conf.set(k, v)

    docs = spark.read.parquet(args.docs)

    runner = StageRunner(spark, args.checkpoint, args.run_id, n_buckets=args.buckets)

    def prep(df):
        # per-row kernels (bucket-local, hence resumable): the content
        # fingerprint is a pure projection of (doc_id, text), so text rides
        # in the same select — no join, no shuffle of the corpus
        return text.fingerprint(df, keep=("text",)).select(
            "doc_id", "fp60", "text"
        )

    prepared = runner.run_stage(
        "prep", docs, prep, f"{args.out}/prep", id_col="doc_id"
    )

    # materialize the LSH+verify ladder ONCE, as a RELIABLE parquet table
    # under the job output (not localCheckpoint: executor-local blocks die
    # with the executor — on a 1000-node cluster a single lost node would
    # fail the job mid-CC). The stats count below and the CC edge
    # derivation both read the written pairs instead of re-running the
    # signature/verify pipeline per action, and the verified-pair table —
    # the dedup ladder's most expensive artifact — becomes a first-class
    # output downstream consumers can reuse.
    dedup.minhash_lsh_pairs(prepared, tau_pct=args.tau).write.mode(
        "overwrite"
    ).parquet(f"{args.out}/pairs")
    pairs = spark.read.parquet(f"{args.out}/pairs")
    clusters = dedup.connected_components(prepared.select("doc_id"), pairs)
    clusters.orderBy("doc_id").write.mode("overwrite").parquet(
        f"{args.out}/clusters"
    )

    n_pairs = pairs.count()  # parquet footer count — no recompute
    # count distinct clusters off the just-written parquet, not by
    # re-executing the ids-join plan behind `clusters`
    n_clusters = (
        spark.read.parquet(f"{args.out}/clusters")
        .select("cluster_id")
        .distinct()
        .count()
    )
    m = runner.table.read_all(spark)
    summary = m.agg(
        F.sum("rows_in").alias("rows_in"), F.sum("rows_out").alias("rows_out")
    ).first()
    print(
        json.dumps(
            {
                "run_id": args.run_id,
                "rows_in": summary["rows_in"],
                "rows_out": summary["rows_out"],
                "n_pairs": n_pairs,
                "n_clusters": n_clusters,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
