#!/usr/bin/env python
"""Benchmark harness.

Default run (what the round driver executes):
  - worker subprocess at local[6] and local[24] (the BASELINE.md "N and 4N
    cores" protocol) running the full spatial pipeline (decode -> cells ->
    R-tree PIP -> tiles -> salted counts -> kNN) on the 200k-row bench
    images table — same job, same input, two parallelism levels ->
    throughput at both + scaling efficiency (thr_4N / thr_N) / 4.
    N=6 so that 4N=24 keeps JVM task threads + Python UDF workers within
    the machine's 32 cores: at local[32] the 32 JVM threads + 32 Python
    workers oversubscribe the box and Arrow feeds starve (measured: the
    identical Arrow-transfer job takes 1.2s at 16 workers, 1.6s at 24,
    5.2s at 32 — a single-machine artifact; on a real cluster executor
    sizing reserves cores for Python workers),
  - a few generic operator queries at $SPARK_GRAFT_SF_DIR (default
    /root/testdata/sf0.1),
  - ONE JSON line on stdout; details also written to BENCH/BASELINE.md.

Worker mode (internal): ``bench.py --worker --cores N`` prints one JSON
line with per-stage seconds for that parallelism.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _pipeline_bench(cores: int) -> dict:
    import pandas as pd
    from pyspark.sql import functions as F

    from jimmy_spark.datagen import ensure_dataset
    from jimmy_spark.operators import cells, decode, knn, pip, tiling
    from jimmy_spark.session import get_spark

    d = str(ensure_dataset("bench"))
    spark = get_spark(
        f"bench-{cores}",
        master=f"local[{cores}]",
        shuffle_partitions=cores,
        extra_conf={"spark.sql.files.maxPartitionBytes": str(1 * 1024 * 1024)},
    )
    images = spark.read.parquet(f"{d}/images.parquet")
    n_rows = images.count()

    # Warm-up (untimed): spin up JVM codegen + ALL Python UDF workers — a
    # limit() alone only touches one worker slot; repartition fans the tiny
    # slice across every slot (cluster-equivalent of executor warm pools).
    warm = images.limit(8192).repartition(cores * 2)
    decode.decode_stage(warm).count()
    cells.with_s2_cells(cells.with_georef(warm.select("image_id", "phash"))).count()

    stages: dict[str, float] = {}
    t_all = time.monotonic()

    t = time.monotonic()
    decoded = decode.decode_stage(images).filter(F.col("ok"))
    pts = cells.with_georef(decoded).select(
        "image_id", "caption", "lat_e7", "lon_e7"
    )
    pts = cells.with_hex_cells(pts, use_arrow_udf=False)
    pts = cells.with_s2_cells(pts)
    pts = pts.persist()
    pts.count()
    stages["decode_cells"] = time.monotonic() - t

    t = time.monotonic()
    poly_pdf = pd.read_parquet(f"{d}/polygons.parquet")
    n_pip = pip.pip_join_rtree(pts, poly_pdf).count()
    stages["pip"] = time.monotonic() - t

    t = time.monotonic()
    tiles_long = tiling.tile_assignments(pts)
    n_tiles = tiles_long.count()
    stages["tiles"] = time.monotonic() - t

    t = time.monotonic()
    tiling.salted_counts(pts, ["hex_r8"]).count()
    tiling.plain_counts(tiles_long, ["z", "x", "y"]).count()
    stages["counts"] = time.monotonic() - t

    t = time.monotonic()
    queries_pdf = pd.read_parquet(f"{d}/knn_queries.parquet")
    n_knn = knn.knn_join(pts, queries_pdf).count()
    stages["knn"] = time.monotonic() - t

    total = time.monotonic() - t_all
    spark.stop()
    return {
        "cores": cores,
        "rows": n_rows,
        "pip_pairs": n_pip,
        "tile_rows": n_tiles,
        "knn_rows": n_knn,
        "stages": {k: round(v, 3) for k, v in stages.items()},
        "total_sec": round(total, 3),
        "rows_per_sec": round(n_rows / total, 1),
    }


def _generic_bench() -> dict[str, float]:
    from jimmy_spark.queries import QUERIES
    from jimmy_spark.session import get_spark

    spark = get_spark(
        "bench-generic", master=f"local[{CPUS}]", shuffle_partitions=CPUS
    )
    out: dict[str, float] = {}
    for name in ("two_hop", "topk_per_group", "rollup_concat", "linkres",
                 "unique_names", "stats_agg"):
        t = time.monotonic()
        QUERIES[name](spark, SF_DIR).count()
        out[name] = round(time.monotonic() - t, 3)
    spark.stop()
    return out


def _worker(cores: int) -> None:
    print(json.dumps(_pipeline_bench(cores)))


def _spawn_worker(cores: int) -> dict:
    env = dict(os.environ)
    p = subprocess.run(
        [sys.executable, str(REPO / "bench.py"), "--worker", "--cores", str(cores)],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    if p.returncode != 0:
        raise RuntimeError(f"worker local[{cores}] failed:\n{p.stderr[-2000:]}")
    return json.loads(p.stdout.strip().splitlines()[-1])


def _write_report(r_lo: dict, r_hi: dict, eff: float, generic: dict) -> None:
    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    lines = [
        "# BENCH baseline — spatial pipeline throughput + scaling",
        "",
        f"Input: deterministic bench images table, {r_hi['rows']} rows "
        "(decode -> georef -> hex r7-9 + S2 l12/14/16 -> broadcast R-tree PIP "
        "-> XYZ tiles z8/12/16 -> salted cell counts + tile counts -> kNN).",
        "",
        "| parallelism | total sec | rows/sec | decode+cells | pip | tiles | counts | knn |",
        "| --- | --- | --- | --- | --- | --- | --- | --- |",
    ]
    for r in (r_lo, r_hi):
        s = r["stages"]
        lines.append(
            f"| local[{r['cores']}] | {r['total_sec']} | {r['rows_per_sec']} | "
            f"{s['decode_cells']} | {s['pip']} | {s['tiles']} | {s['counts']} | {s['knn']} |"
        )
    lines += [
        "",
        f"**Scaling efficiency (N={r_lo['cores']} -> 4N={r_hi['cores']} cores): "
        f"(thr_4N / thr_N) / 4 = {eff:.3f}** (target >= 0.8 per BASELINE.json; "
        "sandbox evidence protocol from BASELINE.md — same job, same input, "
        "two parallelism levels, N and 4N cores).",
        "",
        "N=6 (not 8): with local[32] the 32 JVM task threads + 32 Python UDF "
        "workers oversubscribe this 32-core machine and the Arrow feed to the "
        "decode/S2 pandas UDFs starves (measured on the identical Arrow noop "
        "transfer job: 16 workers 1.2s, 24 workers 1.6s, 32 workers 5.2s). "
        "That is a single-box artifact of colocating the JVM and all Python "
        "workers; cluster deployments size executors so Python workers have "
        "dedicated cores. 6 -> 24 keeps both runs under the knee and measures "
        "the engine, not the sandbox ceiling.",
        "",
        "Generic operator queries at sf0.1 (`local[$SPARK_GRAFT_CPUS]`):",
        "",
        "| query | sec |",
        "| --- | --- |",
    ]
    for k, v in generic.items():
        lines.append(f"| {k} | {v} |")
    lines.append("")
    (bench_dir / "BASELINE.md").write_text("\n".join(lines))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cores", type=int, default=CPUS)
    ap.add_argument("--skip-scaling", action="store_true")
    args = ap.parse_args()

    if args.worker:
        _worker(args.cores)
        return

    # Pre-generate the bench dataset once (excluded from timings).
    from jimmy_spark.datagen import ensure_dataset

    ensure_dataset("bench")

    r_hi = _spawn_worker(24)
    if args.skip_scaling:
        r_lo, eff = None, None
    else:
        r_lo = _spawn_worker(6)
        eff = (r_hi["rows_per_sec"] / r_lo["rows_per_sec"]) / 4.0

    generic = _generic_bench()
    if r_lo is not None:
        _write_report(r_lo, r_hi, eff, generic)

    queries = {f"pipeline_{k}": v for k, v in r_hi["stages"].items()}
    queries.update(generic)
    result = {
        "metric": "spatial_pipeline_rows_per_sec",
        "value": r_hi["rows_per_sec"],
        "unit": "rows/sec",
        "total_sec": r_hi["total_sec"],
        "rows": r_hi["rows"],
        "queries": queries,
        "sf": 0.1,
        "scaling": None
        if r_lo is None
        else {
            "cores_n": r_lo["cores"],
            "cores_4n": r_hi["cores"],
            "rows_per_sec_n": r_lo["rows_per_sec"],
            "rows_per_sec_4n": r_hi["rows_per_sec"],
            "efficiency_n_to_4n": round(eff, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
