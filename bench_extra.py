#!/usr/bin/env python
"""Extra per-lane benchmarks for the optimization rounds (bench.py is
FROZEN for measurement; this file isolates individual operators with the
noop sink per the optimization guide §1.4 so before/after numbers in
OPTIMIZATION_r*.md time the computation, not the sink).

Usage: python bench_extra.py LANE [reps] [--cores N]
Lanes: features4m  — image_features over the 4M-row bench table
       fingerprints4m — image_fingerprints over the bench table
       scene_dup   — the bench scene_dup stage verbatim (count sink,
                     matching bench.py's methodology)
       curate_feats — curation feature stage over the 1M curate table
       decode4m    — decode_stage over the bench table
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("lane")
    ap.add_argument("reps", type=int, nargs="?", default=3)
    ap.add_argument("--cores", type=int, default=24)
    args = ap.parse_args()

    from jimmy_spark.datagen import ensure_dataset
    from jimmy_spark.session import get_spark

    spark = get_spark(
        f"bench-extra-{args.lane}",
        master=f"local[{args.cores}]",
        shuffle_partitions=args.cores,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(8 * 1024 * 1024)},
    )
    sc = spark.sparkContext

    def run(make):
        reps = []
        for _ in range(args.reps):
            t = time.monotonic()
            make()
            reps.append(round(time.monotonic() - t, 3))
        print(f"{args.lane}: best {min(reps)}s reps {reps}")

    if args.lane in ("features4m", "fingerprints4m", "decode4m", "scene_dup"):
        d = str(ensure_dataset("bench"))
        images = spark.read.parquet(f"{d}/images.parquet")
        images.limit(2048).count()  # warm
        if args.lane == "features4m":
            from jimmy_spark.operators import multimodal

            sc.setJobDescription("features4m noop")
            run(lambda: noop(multimodal.image_features(images)))
        elif args.lane == "fingerprints4m":
            from jimmy_spark.operators import fingerprints

            sc.setJobDescription("fingerprints4m noop")
            run(lambda: noop(fingerprints.image_fingerprints(images)))
        elif args.lane == "decode4m":
            from jimmy_spark.operators import decode

            sc.setJobDescription("decode4m noop")
            run(lambda: noop(decode.decode_stage(images)))
        else:  # scene_dup — bench.py's stage verbatim (count sink)
            from jimmy_spark.operators import cells, imagedup, multimodal

            sc.setJobDescription("scene_dup stage")

            def stage():
                feats = (
                    multimodal.image_features(images)
                    .filter("ok")
                    .select("image_id", "ahash")
                )
                pts = cells.with_georef(
                    images.select("image_id", "phash")
                ).join(feats, "image_id")
                imagedup.scene_dup_pairs(pts, d=100, threshold=6).count()

            run(stage)
    elif args.lane == "curate_feats":
        from jimmy_spark.operators import fingerprints

        d = str(ensure_dataset("curate"))
        images = spark.read.parquet(f"{d}/images.parquet")
        images.limit(2048).count()
        sc.setJobDescription("curate feature stage noop")
        run(lambda: noop(fingerprints.curation_features_full(images)))
    else:
        raise SystemExit(f"unknown lane {args.lane}")
    spark.stop()


if __name__ == "__main__":
    main()
