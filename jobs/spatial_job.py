#!/usr/bin/env python
"""Production entry point: spark-submit --py-files jimmy_spark.zip jobs/spatial_job.py ...

Runs the checkpointed spatial pipeline (decode -> cells -> R-tree PIP ->
tiles -> counts) over an images table, writing results + per-partition
lineage/metrics, resumable via --run-id (north_rule deployment shape).

Example:
    spark-submit --py-files dist/jimmy_spark.zip jobs/spatial_job.py \
        --images data/t1/images.parquet --polygons data/t1/polygons.parquet \
        --out /tmp/geotile_out --checkpoint /tmp/geotile_cp --run-id run1

No master/conf is hard-coded: spark-submit (or the cluster's defaults)
decides; session settings that matter (AQE, Arrow batching, UTC) are
applied on top of the provided session.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

# When shipped via --py-files the zip is already on sys.path; when run from
# a checkout, the repo root is.
sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--polygons", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--run-id", default="run1")
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument(
        "--pip-strategy",
        choices=("rtree", "cells"),
        default="rtree",
        help="rtree: broadcast R-tree fused into the narrow map (polygon "
        "set fits a task closure — the north_rule default). cells: "
        "shuffled grid-cell join (operators/pip.py pip_join_cells) for "
        "polygon sets too large to broadcast; identical output.",
    )
    ap.add_argument("--pip-grid-e7", type=int, default=250_000)
    ap.add_argument(
        "--dist-join-d",
        type=int,
        default=0,
        help="when > 0, also write all point pairs within this planar "
        "distance (e7 units) to <out>/near_pairs via the square-grid "
        "distance join (width tracks d; output-proportional candidates).",
    )
    ap.add_argument(
        "--dbscan-eps",
        type=int,
        default=0,
        help="when > 0, also write DBSCAN cluster labels (core/border/"
        "noise, min-id cluster labels) to <out>/clusters.",
    )
    ap.add_argument("--dbscan-min-pts", type=int, default=4)
    ap.add_argument(
        "--cluster-hulls",
        action="store_true",
        help="with --dbscan-eps, also write each cluster's exact convex-"
        "hull footprint (two-stage map-side partial hulls, no task holds "
        "a whole cluster — operators/hull.py) to <out>/cluster_hulls.",
    )
    ap.add_argument(
        "--content-dups",
        action="store_true",
        help="also write decoded per-image features to <out>/features and "
        "aHash CONTENT near-dup pairs (band-LSH Hamming join over the "
        "computed hash — operators/imagedup.py) to <out>/content_dups.",
    )
    ap.add_argument(
        "--scene-dup-d",
        type=int,
        default=0,
        help="when > 0, also write scene near-dup pairs (within this "
        "distance in e7 units AND within --dup-hamming bits on the "
        "decoded aHash; spatial-first blocking with the hash carried "
        "through the grid join) to <out>/scene_dups. Implies the feature "
        "decode of --content-dups.",
    )
    ap.add_argument("--dup-hamming", type=int, default=6)
    ap.add_argument(
        "--keep-best",
        action="store_true",
        help="with --scene-dup-d: also write the keep-best curation "
        "labels (image_id, cluster_id, keep) to <out>/keep_best — scene "
        "near-dup groups via large-star/small-star components, one kept "
        "shot per group by (sharpness desc, clipped-fraction asc, id "
        "asc) from the decoded quality features.",
    )
    ap.add_argument(
        "--zonal-res",
        type=int,
        default=0,
        help="when > 0, also write raster zonal statistics per polygon "
        "zone at this hex resolution to <out>/zonal (operators/raster.py "
        "zonal_stats; value = decoded-pixel checksum — swap for any "
        "per-image raster metric in a real deployment).",
    )
    ap.add_argument(
        "--render-zoom",
        type=int,
        default=-1,
        help="when >= 0, also render per-XYZ-tile heat PNGs at this zoom "
        "to <out>/tiles_png (operators/raster.py).",
    )
    ap.add_argument(
        "--s2-compact",
        action="store_true",
        help="also write the CellUnion-normalized compaction of the "
        "corpus' occupied s2_l16 cell set to <out>/s2_covering "
        "(operators/s2cover.py).",
    )
    ap.add_argument(
        "--mosaic-zoom",
        type=int,
        default=-1,
        help="when >= 0, also render per-XYZ-tile thumbnail-mosaic PNGs "
        "at this zoom to <out>/mosaic_png (operators/raster.py "
        "render_mosaic_tiles; decodes only the per-tile capped selection).",
    )
    ap.add_argument(
        "--tracks",
        default="",
        help="when set, a moving-object ping table (entity_id, seq, ts, "
        "lat_e7, lon_e7): run the trajectory family and write segment "
        "stats, stay points, the OD matrix, and Douglas-Peucker simplified "
        "pings under <out>/trajectory/ (operators/trajectory.py).",
    )
    ap.add_argument(
        "--roads",
        default="",
        help="with --tracks, a road-segment table (road_id, seg_id, ax, "
        "ay, bx, by): map-match every ping to its nearest segment and "
        "write <out>/trajectory/matched (operators/mapmatch.py).",
    )
    ap.add_argument(
        "--traj-sim-d",
        type=int,
        default=0,
        help="with --tracks, when > 0 run the trajectory similarity join "
        "at this discrete-Frechet distance (e7 units) and write "
        "(a_track, b_track, frechet2, haus2) pairs to "
        "<out>/trajectory/similar_pairs (operators/trajsim.py).",
    )
    ap.add_argument(
        "--contact-d",
        type=int,
        default=0,
        help="when > 0, run the spatio-temporal contact join at this "
        "distance (e7 units) over --contacts (falling back to --tracks) "
        "and write per-(pair, bucket) contacts to "
        "<out>/trajectory/contacts plus convoy runs to "
        "<out>/trajectory/convoys (operators/stjoin.py).",
    )
    ap.add_argument(
        "--contacts",
        default="",
        help="ping table for the contact stage when it differs from "
        "--tracks (e.g. a co-travel feed).",
    )
    ap.add_argument("--contact-tau", type=int, default=120)
    ap.add_argument("--convoy-kmin", type=int, default=5)
    ap.add_argument(
        "--region-cover",
        action="store_true",
        help="also write the mixed-level S2 covering of every polygon to "
        "<out>/region_cover and the point-in-region pairs answered "
        "THROUGH the covering (one broadcast cell join, ray-cast on the "
        "boundary fringe only) to <out>/region_pairs "
        "(operators/s2region.py).",
    )
    ap.add_argument("--region-min-level", type=int, default=11)
    ap.add_argument("--region-max-level", type=int, default=16)
    ap.add_argument(
        "--zones",
        default="",
        help="geofence zone polygon table (the PIP polygon schema): run "
        "zone-visit detection over --contacts (falling back to --tracks) "
        "and write visits (enter/exit/dwell per entity x zone) to "
        "<out>/trajectory/visits (operators/geofence.py).",
    )
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import pandas as pd
    from jimmy_spark.operators import cells, fused, pip, tiling
    from jimmy_spark.sources.images import read_images
    from jimmy_spark.streaming.checkpoint import StageRunner

    spark = SparkSession.builder.appName("jimmy-spark-spatial-job").getOrCreate()
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "2048",
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
    }.items():
        spark.conf.set(k, v)

    images = read_images(spark, args.images)
    poly_pdf = pd.read_parquet(args.polygons)

    if args.pip_strategy == "rtree":
        stage_fn = lambda df: fused.fused_spatial_stage(df, poly_pdf)  # noqa: E731
    else:
        # cells: same fused kernel minus the closure-broadcast PIP (empty
        # polygon set), PIP pairs from the shuffled grid-cell join, folded
        # back to the per-image sorted array — output identical to rtree
        polygons_df = spark.read.parquet(args.polygons)
        no_polys = poly_pdf.iloc[0:0]

        def stage_fn(df):
            base = fused.fused_spatial_stage(df, no_polys).drop("polygon_ids")
            # no ok-filter: the fused kernel PIPs every row (georef comes
            # from phash, not from the decode), so the twin must too
            pairs = pip.pip_join_cells(
                base.select("image_id", "lat_e7", "lon_e7"),
                polygons_df,
                grid_e7=args.pip_grid_e7,
            )
            agg = pairs.groupBy("image_id").agg(
                F.sort_array(F.collect_list("polygon_id")).alias("polygon_ids")
            )
            return base.join(agg, "image_id", "left").withColumn(
                "polygon_ids",
                F.coalesce(F.col("polygon_ids"), F.array().cast("array<string>")),
            )

    runner = StageRunner(spark, args.checkpoint, args.run_id, n_buckets=args.buckets)
    enriched = runner.run_stage(
        "fused_spatial",
        images,
        stage_fn,
        f"{args.out}/enriched",
    )

    counts = tiling.salted_counts(enriched.filter(F.col("ok")), ["hex_r8"])
    counts.write.mode("overwrite").parquet(f"{args.out}/cell_counts")
    tile_counts = (
        enriched.filter(F.col("ok"))
        .groupBy("tile_z12_x", "tile_z12_y")
        .agg(F.count("*").alias("cnt"))
    )
    tile_counts.write.mode("overwrite").parquet(f"{args.out}/tile_counts")

    ok_pts = enriched.filter(F.col("ok")).select("image_id", "lat_e7", "lon_e7")
    if args.dist_join_d > 0:
        from jimmy_spark.operators import distjoin

        distjoin.distance_join_grid(ok_pts, d=args.dist_join_d).write.mode(
            "overwrite"
        ).parquet(f"{args.out}/near_pairs")
    if args.dbscan_eps > 0:
        from pyspark.sql import functions as _F

        from jimmy_spark.operators import geocluster

        geocluster.dbscan(
            ok_pts,
            eps=args.dbscan_eps,
            min_pts=args.dbscan_min_pts,
            num_id=_F.substring("image_id", 5, 12).cast("long"),
        ).write.mode("overwrite").parquet(f"{args.out}/clusters")

        if args.cluster_hulls:
            from jimmy_spark.operators import hull

            labels = (
                spark.read.parquet(f"{args.out}/clusters")
                .filter(F.col("cluster_id").isNotNull())
                .select("image_id", "cluster_id")
            )
            hull.group_hulls(
                ok_pts.join(labels, "image_id"), ["cluster_id"]
            ).write.mode("overwrite").parquet(f"{args.out}/cluster_hulls")

    if args.content_dups or args.scene_dup_d > 0:
        from jimmy_spark.operators import imagedup, multimodal

        # decode ONCE, persist, feed every dup lane from the parquet
        multimodal.image_features(images).write.mode("overwrite").parquet(
            f"{args.out}/features"
        )
        feats_ok = spark.read.parquet(f"{args.out}/features").filter("ok")
        if args.content_dups:
            imagedup.ahash_near_dup(
                images, threshold=args.dup_hamming, feats=feats_ok
            ).write.mode("overwrite").parquet(f"{args.out}/content_dups")
        if args.scene_dup_d > 0:
            scene_pts = ok_pts.join(
                feats_ok.select("image_id", "ahash"), "image_id"
            )
            imagedup.scene_dup_pairs(
                scene_pts, d=args.scene_dup_d, threshold=args.dup_hamming
            ).write.mode("overwrite").parquet(f"{args.out}/scene_dups")
            if args.keep_best:
                qpts = ok_pts.join(
                    feats_ok.select(
                        "image_id", "ahash", "sharp_e3", "clip_e3"
                    ),
                    "image_id",
                )
                imagedup.scene_dedup_keep_best(
                    qpts,
                    d=args.scene_dup_d,
                    threshold=args.dup_hamming,
                    num_id=F.substring("image_id", 5, 12).cast("long"),
                ).write.mode("overwrite").parquet(f"{args.out}/keep_best")

    if args.zonal_res > 0:
        from jimmy_spark.operators import raster

        raster.zonal_stats(
            enriched.filter(F.col("ok")).select(
                "lat_e7", "lon_e7", "px_checksum"
            ),
            poly_pdf,
            res=args.zonal_res,
            value_col="px_checksum",
        ).write.mode("overwrite").parquet(f"{args.out}/zonal")

    if args.render_zoom >= 0:
        from jimmy_spark.operators import raster

        raster.render_heat_tiles(ok_pts, zoom=args.render_zoom).write.mode(
            "overwrite"
        ).parquet(f"{args.out}/tiles_png")

    if args.s2_compact:
        from jimmy_spark.operators import s2cover

        s2cover.s2_compact(
            enriched.filter(F.col("ok")), cell_col="s2_l16"
        ).write.mode("overwrite").parquet(f"{args.out}/s2_covering")

    if args.region_cover:
        from jimmy_spark.operators import s2region

        region_polys = spark.read.parquet(args.polygons)
        s2region.s2_region_cover(
            region_polys, args.region_min_level, args.region_max_level
        ).write.mode("overwrite").parquet(f"{args.out}/region_cover")
        s2region.region_select(
            ok_pts, region_polys,
            args.region_min_level, args.region_max_level,
        ).write.mode("overwrite").parquet(f"{args.out}/region_pairs")

    if args.mosaic_zoom >= 0:
        from jimmy_spark.operators import raster

        mos_in = cells.with_georef(
            images.select("image_id", "bytes", "fmt", "phash")
        ).select("image_id", "bytes", "fmt", "lat_e7", "lon_e7")
        raster.render_mosaic_tiles(mos_in, zoom=args.mosaic_zoom).write.mode(
            "overwrite"
        ).parquet(f"{args.out}/mosaic_png")

    if args.tracks:
        from jimmy_spark.operators import trajectory as tj

        if args.roads:
            from jimmy_spark.operators import mapmatch

            mapmatch.map_match(
                spark.read.parquet(args.tracks),
                spark.read.parquet(args.roads),
            ).write.mode("overwrite").parquet(f"{args.out}/trajectory/matched")
        from jimmy_spark.operators import quantiles as qtiles

        segged = tj.segment_tracks(spark.read.parquet(args.tracks))
        stats = tj.segment_stats(segged)
        stats.write.mode("overwrite").parquet(f"{args.out}/trajectory/segments")
        stays = tj.stay_points(segged)
        stays.write.mode("overwrite").parquet(f"{args.out}/trajectory/stays")
        # per-cell dwell-time percentiles: the exact-quantile operator
        # over (centroid hex r7, stay duration) — where do people linger,
        # and for how long, by region
        dwell = stays.select(
            cells.hex_cell_expr(F.col("c_lat"), F.col("c_lon"), 7).alias(
                "cell"
            ),
            (
                F.col("t_end").cast("timestamp_ltz").cast("long")
                - F.col("t_start").cast("timestamp_ltz").cast("long")
            ).alias("dwell_s"),
        )
        qtiles.group_quantiles(
            dwell, ["cell"], "dwell_s", qs=(0.5, 0.9)
        ).write.mode("overwrite").parquet(
            f"{args.out}/trajectory/dwell_quantiles"
        )
        tj.od_matrix(stats).write.mode("overwrite").parquet(
            f"{args.out}/trajectory/od"
        )
        tj.simplify_tracks(segged).write.mode("overwrite").parquet(
            f"{args.out}/trajectory/simplified"
        )
        tj.resample_tracks(segged).write.mode("overwrite").parquet(
            f"{args.out}/trajectory/resampled"
        )
        tj.segment_hulls(segged).write.mode("overwrite").parquet(
            f"{args.out}/trajectory/hulls"
        )
        if args.traj_sim_d > 0:
            from jimmy_spark.operators import trajsim

            trajsim.frechet_join(segged, args.traj_sim_d).write.mode(
                "overwrite"
            ).parquet(f"{args.out}/trajectory/similar_pairs")

    if args.contact_d > 0 and (args.contacts or args.tracks):
        from jimmy_spark.operators import stjoin

        pings = spark.read.parquet(args.contacts or args.tracks)
        buckets = stjoin.contact_buckets(
            stjoin.contact_join(pings, d=args.contact_d, tau=args.contact_tau)
        )
        buckets.write.mode("overwrite").parquet(
            f"{args.out}/trajectory/contacts"
        )
        stjoin.convoys(
            spark.read.parquet(f"{args.out}/trajectory/contacts"),
            k_min=args.convoy_kmin,
        ).write.mode("overwrite").parquet(f"{args.out}/trajectory/convoys")

    if args.zones and (args.contacts or args.tracks):
        from jimmy_spark.operators import geofence

        geofence.zone_visits(
            spark.read.parquet(args.contacts or args.tracks),
            pd.read_parquet(args.zones),
        ).write.mode("overwrite").parquet(f"{args.out}/trajectory/visits")

    m = runner.table.read_all(spark)
    summary = m.agg(
        F.sum("rows_in").alias("rows_in"),
        F.sum("rows_out").alias("rows_out"),
        F.sum("rows_err").alias("rows_err"),
    ).first()
    print(
        json.dumps(
            {
                "run_id": args.run_id,
                "rows_in": summary["rows_in"],
                "rows_out": summary["rows_out"],
                "rows_err": summary["rows_err"],
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
