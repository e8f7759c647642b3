"""Physical-plan shape assertions — the 100-TB design contract.

These lock in the properties that make the engine scale: column pruning
(the binary column never leaves the decode stage), predicate pushdown to
the parquet scan, shuffle-free broadcast R-tree PIP, whole-stage codegen
for the expression paths, and the two-shuffle shape of salted aggregation.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from jimmy_spark.operators import cells, pip, tiling


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def images(spark, t1_dir):
    return spark.read.parquet(f"{t1_dir}/images.parquet")


def test_georef_scan_prunes_bytes(images):
    """georef/cells only need phash — the image bytes must not be read."""
    df = cells.with_georef(images.select("image_id", "phash"))
    plan = _plan(df)
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "bytes" not in read_schema
    assert "phash" in read_schema


def test_filter_pushdown_reaches_scan(images):
    df = images.filter(F.col("fmt") == "png").select("image_id", "fmt")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(fmt), EqualTo(fmt,png)]" in plan


def test_pip_rtree_has_no_shuffle(images, t1_dir):
    pts = cells.with_georef(images.select("image_id", "phash"))
    poly_pdf = pd.read_parquet(f"{t1_dir}/polygons.parquet")
    plan = _plan(pip.pip_join_rtree(pts, poly_pdf))
    assert "Exchange" not in plan  # narrow map: scan -> project -> mapInPandas
    assert "MapInPandas" in plan


def test_hex_expr_whole_stage_codegen(images):
    pts = cells.with_georef(images.select("image_id", "phash"))
    df = cells.with_hex_cells(pts, use_arrow_udf=False)
    plan = _plan(df)
    # Spark marks codegen'd stages with "*(n)" in executedPlan.toString()
    assert "*(1)" in plan or "WholeStageCodegen" in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_salted_counts_two_stage(images):
    pts = cells.with_georef(images.select("image_id", "phash"))
    pts = cells.with_hex_cells(pts, (8,), use_arrow_udf=False)
    plan = _plan(tiling.salted_counts(pts, ["hex_r8"]))
    # two-stage: partial per (key, salt), final per key — i.e. two
    # HashAggregate pairs around exchanges
    assert plan.count("HashAggregate") >= 4
    assert "_salt" in plan


def test_tile_assignment_no_python(images):
    pts = cells.with_georef(images.select("image_id", "phash"))
    plan = _plan(tiling.tile_assignments(pts))
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_broadcast_pip_uses_broadcast_join(spark, images, t1_dir):
    pts = cells.with_georef(images.select("image_id", "phash"))
    polys = spark.read.parquet(f"{t1_dir}/polygons.parquet")
    plan = _plan(pip.pip_join_broadcast(pts, polys))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_cell_pip_is_shuffled_join_no_broadcast(spark, images, t1_dir):
    """The huge-polygon-set PIP path must not depend on a broadcast: with
    auto-broadcast off (simulating a polygon side too big to broadcast),
    the plan is a shuffled equality join on the grid keys — the shape that
    survives millions of polygons."""
    pts = cells.with_georef(images.select("image_id", "phash"))
    polys = spark.read.parquet(f"{t1_dir}/polygons.parquet")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(pip.pip_join_cells(pts, polys))
        assert "BroadcastExchange" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert "hashpartitioning(gx" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_link_semi_is_semi_join(spark):
    """Existence join must be a semi join (probe side never duplicated)."""
    from jimmy_spark.queries import q_link_semi

    plan = _plan(q_link_semi(spark, "/root/testdata/sf0.001"))
    assert "LeftSemi" in plan


def test_metadata_map_is_narrow(spark):
    """Map build + filter + explode is one narrow stage — no Exchange.
    (The open-map lane rides q_binary_kernels since the round-5 registry
    consolidation; the plan property is unchanged.)"""
    from jimmy_spark.queries import q_binary_kernels

    plan = _plan(q_binary_kernels(spark, "/root/testdata/sf0.001"))
    assert "Exchange" not in plan
    assert "Generate explode" in plan or "Generate" in plan


def test_date_kernels_stay_jvm_side(spark):
    """Date/time kernels compile to codegen'd expressions, no Python."""
    from jimmy_spark.queries import q_date_kernels

    plan = _plan(q_date_kernels(spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "Exchange" not in plan


def test_near_dup_vectors_not_in_candidate_shuffle(spark):
    """emb_near_dup's candidate exchanges must carry only pair ids and
    bucket keys — the embedding arrays are re-joined after the pair
    stream exists (r5: the distinct is gone; the invariant now guards
    the round-robin probe exchange and the verify joins)."""
    from jimmy_spark.queries import q_emb_near_dup

    plan = _plan(q_emb_near_dup(spark, "/root/testdata/sf0.001"))
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "vec_a" in line or "vec_b" in line or "bkt" in line
            assert " v#" not in line and "va#" not in line and "vb#" not in line


def test_json_scan_prunes_to_pinned_schema(spark):
    """json_scan reads under a PINNED schema and must prune the JSON parse
    to exactly the projected fields — schema inference (a second full
    scan) and full-record parsing are the 100-TB anti-patterns."""
    from jimmy_spark.queries import q_json_scan

    plan = _plan(q_json_scan(spark, "/root/testdata/sf0.001"))
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    for col in ("id", "content", "tags", "lastModified"):
        assert col in read_schema
    assert "EvalPython" not in plan  # projection is pure JVM


def test_xml_scan_projection_jvm_side(spark):
    from jimmy_spark.queries import q_xml_scan

    plan = _plan(q_xml_scan(spark, "/root/testdata/sf0.001"))
    assert "EvalPython" not in plan and "MapInPandas" not in plan
    assert "Exchange" not in plan  # straight scan -> project, no shuffle


def test_sqlite_scan_is_partitioned_map(spark):
    """The SQLite source must be bounds -> mapInPandas with no driver-side
    row collection and no shuffle beyond the bounds repartition."""
    from jimmy_spark.queries import q_sqlite_scan

    plan = _plan(q_sqlite_scan(spark, "/root/testdata/sf0.001"))
    assert "MapInPandas" in plan


def test_decrypt_colornote_lane_pure_jvm(spark):
    """The ColorNote decrypt lane (key/iv KDF + CBC decrypt) must compile
    to JVM expressions; only the Evernote KDF/HMAC lane may use Python."""
    from jimmy_spark.datagen import ensure_exports
    from jimmy_spark.datagen.exports import ENC_PASSWORD

    exp = str(ensure_exports("t2"))
    enc = spark.read.parquet(f"{exp}/enc.parquet")
    pw = F.lit(ENC_PASSWORD)
    key = F.unhex(F.md5(F.concat(pw, F.col("cn_salt"))))
    iv = F.unhex(F.md5(F.concat(key, pw, F.col("cn_salt"))))
    lane = enc.select(
        F.aes_decrypt(
            F.concat(iv, F.col("cn_ct")), key, F.lit("CBC"), F.lit("PKCS")
        ).cast("string").alias("p")
    )
    plan = _plan(lane)
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    """Bucketing evidence for the 100-TB co-located join story: two tables
    bucketed+sorted on the join key sort-merge-join with ZERO Exchange,
    while the identical unbucketed join must shuffle both sides. (With
    broadcast disabled so the plan shows the shuffle behavior a
    fact-to-fact join has at scale.)"""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    left = docs.select("doc_id", "lang")
    right = docs.select("doc_id", "n_chars")
    left.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id") \
        .saveAsTable("bkt_left")
    right.write.mode("overwrite").bucketBy(8, "doc_id").sortBy("doc_id") \
        .saveAsTable("bkt_right")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bucketed = spark.table("bkt_left").join(spark.table("bkt_right"), "doc_id")
        plain = left.join(right, "doc_id")
        assert "Exchange" not in _plan(bucketed)
        assert "Exchange" in _plan(plain)
        # and the bucketed join still computes the same result
        assert bucketed.count() == plain.count() == docs.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_partition_pruning_reaches_scan(spark, tmp_path):
    """Hive-style partition layout + a partition-key filter must prune at
    the SCAN (PartitionFilters), not post-read — at 100 TB this is the
    difference between reading one language's shard and the whole lake."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = str(tmp_path / "by_lang")
    docs.write.partitionBy("lang").mode("overwrite").parquet(out)
    df = spark.read.parquet(out).filter(F.col("lang") == "en").select("doc_id")
    plan = _plan(df)
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "lang" in seg and "en" in seg
    # the pruned read returns exactly the en partition
    assert df.count() == docs.filter("lang = 'en'").count()


def test_seq_pack_windows_are_sharded(spark):
    """The packing prefix-sum must never run in a single partition per
    language (the round-3 scale-killer): every Window node's partition
    spec has to include the shard column, and the per-shard base join
    must be a broadcast."""
    from jimmy_spark.queries import q_corpus_prep, q_seq_pack

    for q in (q_seq_pack, q_corpus_prep):
        plan = _plan(q(spark, "/root/testdata/sf0.001"))
        windows = [
            ln for ln in plan.splitlines() if ln.lstrip().startswith(("Window ", "+- Window", ":- Window"))
            or "Window [" in ln
        ]
        # the running-sum window(s); dedup winners (corpus_prep) partition
        # by md5(text), which is naturally high-cardinality
        pack_windows = [ln for ln in windows if "n_toks" in ln]
        assert pack_windows, plan
        for ln in pack_windows:
            assert "shard" in ln, ln
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_ordered_rank_and_topk_avoid_whole_group_sorts(spark):
    """unique_names / topk_per_group (low-cardinality grouping keys) must
    never sort a whole group in one reducer: every full-data Window's
    partition spec carries the bucket/shard column; only the tiny
    per-bucket counts frame (under an Aggregate) windows on the group
    alone, and the finalists window runs over <= k*shards rows."""
    from jimmy_spark.queries import q_topk_per_group, q_unique_names

    plan = _plan(q_unique_names(spark, "/root/testdata/sf0.001"))
    win_lines = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert any("_bkt" in ln for ln in win_lines), plan
    # the only windows WITHOUT the bucket key are the two-level prefix
    # sums over aggregated frames: the within-super prefix (sums the
    # per-bucket counts _n, partitioned by group+_sup) and the per-super
    # base (sums the super totals _sn over the TINY per-super frame)
    for ln in win_lines:
        spec = ln.split("windowspecdefinition")[-1]
        if "_bkt" not in spec:
            assert "_n" in ln or "_sn" in ln or "_base" in ln, ln
            if "_sup" not in spec:
                # group-only window: must be the per-super totals sum
                assert "_sn" in ln, ln
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan

    plan2 = _plan(q_topk_per_group(spark, "/root/testdata/sf0.001"))
    win2 = [ln for ln in plan2.splitlines() if "Window [" in ln]
    assert any("_shard" in ln for ln in win2), plan2


def test_two_stage_ranks_under_extreme_skew(spark):
    """Skew fixture (round-4 verdict stretch #7): ONE group holds 90% of
    all rows — the regime where the naive window funnels ~the whole table
    through a single reducer task. Asserts (a) the two-stage output still
    equals the naive window exactly, and (b) the sort-unit distribution:
    the largest (group, bucket) / (group, shard) cell — the most any one
    task sorts in the two-stage plans — is bounded by the bucket/shard
    knob, while the naive partition spec puts 90% of rows in one cell."""
    n = 20_000
    hot = int(n * 0.9)
    df = spark.range(n).select(
        F.when(F.col("id") < hot, F.lit("hot")
               ).otherwise(F.concat(F.lit("g"), (F.col("id") % 64).cast("string"))
               ).alias("grp"),
        F.col("id").alias("k"),
        (F.col("id") * 37 % 1000).alias("value"),
    )

    bucket_width = 512
    from jimmy_spark.operators import ranks

    got = {
        r.k: r.rn
        for r in ranks.ordered_rank(
            df, ["grp"], "k", "rn", bucket_width=bucket_width, super_width=4
        ).collect()
    }
    from pyspark.sql import Window as W

    w = W.partitionBy("grp").orderBy("k")
    exp = {
        r.k: r.rn for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == exp

    # sort-unit bound: naive = one 18k-row cell; two-stage <= bucket_width
    naive_max = (
        df.groupBy("grp").count().agg(F.max("count")).first()[0]
    )
    staged_max = (
        df.withColumn("_bkt", F.expr(f"k div {bucket_width}"))
        .groupBy("grp", "_bkt").count().agg(F.max("count")).first()[0]
    )
    assert naive_max == hot
    assert staged_max <= bucket_width

    # top_k_per_group under the same skew: equality + shard-cell bound
    k_top = 7
    got_tk = sorted(
        (r.grp, r.rk, r.k)
        for r in ranks.top_k_per_group(
            df, ["grp"], [F.desc("value"), F.col("k")], k=k_top,
            shard_key="k", n_shards=16,
        ).collect()
    )
    w2 = W.partitionBy("grp").orderBy(F.desc("value"), "k")
    exp_tk = sorted(
        (r.grp, r.rk, r.k)
        for r in df.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= k_top).collect()
    )
    assert got_tk == exp_tk
    shard_max = (
        df.withColumn("_shard", F.pmod(F.xxhash64("k"), F.lit(16)))
        .groupBy("grp", "_shard").count().agg(F.max("count")).first()[0]
    )
    # the hot group's 18k rows spread across 16 shards (~1.1k each): no
    # shard cell carries more than ~2x the even share
    assert shard_max <= 2 * hot / 16


def test_two_stage_ranks_equal_naive_windows(spark):
    """The two-stage formulations are byte-identical to the naive global
    windows they replace (differential, not oracle-only)."""
    from pyspark.sql import Window as W

    from jimmy_spark.operators import ranks

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    got = {
        r.doc_id: r.rn
        for r in ranks.ordered_rank(
            docs, ["lang", "source"], "doc_id", "rn", bucket_width=64
        ).collect()
    }
    w = W.partitionBy("lang", "source").orderBy("doc_id")
    exp = {
        r.doc_id: r.rn
        for r in docs.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert got == exp

    # multi-super path: super_width small enough that every group spans
    # several supers, exercising both prefix levels
    got_ml = {
        r.doc_id: r.rn
        for r in ranks.ordered_rank(
            docs, ["lang", "source"], "doc_id", "rn",
            bucket_width=16, super_width=3,
        ).collect()
    }
    assert got_ml == exp

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got2 = sorted(
        (r.event_type, r.rk, r.event_id)
        for r in ranks.top_k_per_group(
            ev, ["event_type"], [F.desc("value"), F.col("event_id")], k=5,
            shard_key="event_id", n_shards=7,
        ).collect()
    )
    w2 = W.partitionBy("event_type").orderBy(F.desc("value"), "event_id")
    exp2 = sorted(
        (r.event_type, r.rk, r.event_id)
        for r in ev.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= 5).collect()
    )
    assert got2 == exp2


def test_map_match_plan_jvm_only_single_cell_join(spark):
    """Map matching (operators/mapmatch.py): no Python stage anywhere
    (candidate generation, distance, argmin are all JVM expressions) and
    exactly one equality join on the grid cell — the blocking contract."""
    from jimmy_spark.datagen import ensure_roads, ensure_tracks
    from jimmy_spark.operators import mapmatch

    pings = spark.read.parquet(f"{ensure_tracks('t2')}/tracks.parquet")
    segs = spark.read.parquet(f"{ensure_roads('t2')}/roads.parquet")
    plan = _plan(mapmatch.map_match(pings, segs))
    assert "Python" not in plan and "ArrowEval" not in plan
    # one cell join + the final per-ping left join back to the ping set
    n_joins = plan.count("Join")
    assert n_joins == 2, plan[:500]
    # the argmin is an aggregate (map-side combinable), not a window sort
    assert "Window" not in plan
    assert "partial_min" in plan or "partial_count" in plan


def test_gi_star_reuses_neighbor_shuffle(spark):
    """Gi* + Moran's I (operators/hotspot.py): the Moran cross-sums read
    the SAME neighbor aggregation as the per-cell branch — the plan must
    reuse that exchange, not recompute the disk explode twice; and the
    whole operator is JVM-only."""
    import pandas as pd

    from jimmy_spark.operators import hotspot

    pdf = pd.DataFrame({"cell": list(range(100, 200)), "cnt": [2] * 100}).astype(
        "int64"
    )
    df = hotspot.gi_star(spark.createDataFrame(pdf).repartition(4), "cell")
    plan = _plan(df)
    assert "Python" not in plan
    df.collect()  # AQE only stamps exchange reuse into the FINAL plan
    final = _plan(df)
    assert "ReusedExchange" in final, final[:800]


def test_heat_pyramid_materializes_finest_frame_once(spark, images):
    """render_heat_pyramid: every zoom branch must read the persisted
    finest pixel-count frame (InMemoryTableScan), never re-run the
    point scan per level."""
    from jimmy_spark.operators import cells as _cells
    from jimmy_spark.operators import raster

    pts = _cells.with_georef(images.select("image_id", "phash"))
    df = raster.render_heat_pyramid(pts, z_max=5, z_min=3)
    plan = _plan(df)
    # one cached read per zoom branch; the parquet scan lines visible in
    # the plan text are the InMemoryRelation's stored BUILD plan (printed
    # once per reference), not independent executions — persist()
    # guarantees the build runs once. ">=" not "==": other cached frames
    # from earlier tests in the session can be plan-matched into the
    # build subtree, nesting additional InMemoryTableScan nodes.
    assert plan.count("InMemoryTableScan") >= 3


def test_group_quantiles_scans_bounded_and_windows_over_aggregates(spark, t1_dir):
    """The quantile operator's scale contract: requesting MORE quantiles
    must not add source scans (all qs ride one explode over the located
    frame — a per-q union would re-plan the counts subtree per q), the
    scan count stays at the documented three column-pruned passes, and
    every Window in the plan sits above an Aggregate (cumulative sums
    over counts frames), never over raw rows."""
    from jimmy_spark.operators import quantiles as qt

    images = spark.read.parquet(f"{t1_dir}/images.parquet")
    src = images.select("fmt", "phash")

    def n_scans(plan: str) -> int:
        return plan.count("Scan parquet")

    p2 = _plan(qt.group_quantiles(src, ["fmt"], "phash", qs=(0.5, 0.9)))
    p4 = _plan(
        qt.group_quantiles(src, ["fmt"], "phash", qs=(0.1, 0.5, 0.9, 1.0))
    )
    assert n_scans(p2) == n_scans(p4) == 3
    # bytes never read — the scans prune to the key/value columns
    for part in p2.split("ReadSchema:")[1:]:
        assert "bytes" not in part.splitlines()[0]
    # the cumulative locate/resolve windows exist, their COUNT does not
    # grow with |qs| (they run over counts frames the explode multiplies,
    # not per-q re-plans), and every window partitions on the bucket keys
    # (no global single-reducer window over raw rows)
    assert 0 < p2.count("Window ") == p4.count("Window ")
    for plan in (p2, p4):
        specs = plan.split("windowspecdefinition(")[1:]
        assert specs
        for c in specs:
            assert c.split(",")[0].startswith("fmt")
