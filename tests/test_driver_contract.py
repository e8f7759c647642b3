"""Simulates the round driver's correctness gate: every ``queries()`` entry
vs its ``oracle_sql()`` (DuckDB, sf0.01 views + engine tables by path),
order-insensitive exact value equality after sorting by all columns."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.fixture(scope="module")
def contract():
    import __spark_entry__ as e

    return e.queries(), e.oracle_sql()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
    return out.sort_values(cols, kind="stable").reset_index(drop=True)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "image_id", "hex_r8", "s2_l12", "tile_x", "tile_y", "polygon_id", "caption",
    }


def test_every_query_has_runnable_oracle_or_is_documented(contract):
    queries, oracles = contract
    from jimmy_spark.queries import ROWS_ONLY

    no_oracle = set(queries) - set(oracles)
    assert no_oracle == set(ROWS_ONLY)


@pytest.mark.parametrize(
    "name",
    [
        "georef", "hex_cells", "tiles", "pip", "knn", "cell_counts",
        "tile_counts", "overlay", "dedup_exact", "archive_scan", "sqlite_scan",
        "json_scan", "xml_scan", "decrypt_kernels", "crdt_fold", "stats_agg",
        "select_glob",
        "linkres", "unique_names", "two_hop", "rollup_concat", "topk_per_group",
        "cube_counts",
        "link_semi", "tree_span", "binary_kernels", "metadata_map",
        "asof_join", "range_join",
        "token_count", "quality_score", "lang_id", "fingerprint",
        "ngram_dedup", "minhash_dedup", "dup_clusters", "ann_topk",
        "emb_near_dup", "vocab_topk", "split_assign", "seq_pack", "pii_scrub",
        "corpus_prep",
        "caption_kernels",
        "select_tags", "ordered_rollup", "session_windows", "windowed_counts",
        "stream_windowed_counts", "simhash_pairs",
        "date_kernels", "string_kernels2",
        "frontmatter", "simhash", "fuzzy_lev", "path_kernels",
        "encoding_kernels",
        # golden-parquet oracles (scripts/make_goldens.py)
        "s2_cells", "decode_stats", "image_features", "ann_lsh", "ann_ivf",
        "markup_rewrite", "audio_features", "video_frames",
    ],
)
def test_query_matches_oracle(spark, con, contract, name):
    queries, oracles = contract
    got = queries[name](spark, SF_DIR).toPandas()
    exp = con.sql(oracles[name]).df()
    assert list(sorted(got.columns)) == list(sorted(exp.columns)), (
        got.columns, exp.columns,
    )
    g, x = _normalize(got), _normalize(exp)
    assert len(g) == len(x), f"{name}: rows {len(g)} vs {len(x)}"
    pd.testing.assert_frame_equal(g, x, check_dtype=False, check_exact=True)


@pytest.mark.parametrize("name", ["fuzzy_pairs"])
def test_rows_only_queries_run(spark, contract, name):
    queries, _ = contract
    df = queries[name](spark, SF_DIR)
    assert df.count() > 0
