"""S2 decode + cell-set compaction tests (functions/s2.py decode path,
operators/s2cover.py): exact roundtrips, minimality, pure-Python and
DuckDB twins, crafted complete-block collapses, partitioning invariance."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from jimmy_spark.functions import s2
from jimmy_spark.operators import s2cover


def py_compact(leaves: set[int], level: int, min_level: int) -> set[tuple[int, int]]:
    """Set-based reference compaction."""
    cur = set(leaves)
    out: set[tuple[int, int]] = set()
    for lvl in range(level, min_level, -1):
        new_lsb = 1 << (2 * (30 - (lvl - 1)))
        groups: dict[int, list[int]] = {}
        for c in cur:
            p = (c & ~(new_lsb - 1)) | new_lsb
            groups.setdefault(p, []).append(c)
        nxt = set()
        for p, ch in groups.items():
            if len(ch) == 4:
                nxt.add(p)
            else:
                out.update((c, lvl) for c in ch)
        cur = nxt
    out.update((c, min_level) for c in cur)
    return out


def py_leaves(cell: int, level: int) -> set[int]:
    lsb = cell & -cell
    b_t = 1 << (2 * (30 - level))
    return {cell - lsb + (2 * k + 1) * b_t for k in range(lsb // b_t)}


@pytest.fixture(scope="module")
def leaf_cells():
    """l16 cells of a synthetic corpus: scattered noise + a dense blob
    that saturates whole l14/l13 blocks so compaction has real work."""
    rng = np.random.default_rng(31)
    lat = rng.integers(-800_000_000, 800_000_000, 4000)
    lon = rng.integers(-1_790_000_000, 1_790_000_000, 4000)
    sparse = s2.encode(lat, lon, 16)
    # dense blocks: ALL l16 descendants of one l12 and one l14 cell, so
    # the result carries at least levels {12, 14, 16}
    a12 = s2.encode(np.asarray([450_000_000]), np.asarray([100_000_000]), 12)
    a14 = s2.encode(np.asarray([-200_000_000]), np.asarray([700_000_000]), 14)
    dense = [
        c
        for a in (int(a12[0]), int(a14[0]))
        for c in py_leaves(a, 16)
    ]
    return np.concatenate([sparse, np.asarray(dense, dtype=np.int64)])


class TestS2Decode:
    def test_center_roundtrip_all_levels(self):
        rng = np.random.default_rng(2)
        lat = rng.integers(-800_000_000, 800_000_000, 3000)
        lon = rng.integers(-1_790_000_000, 1_790_000_000, 3000)
        for lvl in (12, 13, 14, 15, 16):
            c = s2.encode(lat, lon, lvl)
            clat, clon = s2.center_latlon_e7(c)
            assert (s2.encode(clat, clon, lvl) == c).all(), lvl

    def test_leaf_ij_roundtrip_exact(self):
        rng = np.random.default_rng(3)
        lat = rng.integers(-800_000_000, 800_000_000, 2000)
        lon = rng.integers(-1_790_000_000, 1_790_000_000, 2000)
        x, y, z = s2.xyz_from_latlon_e7(lat, lon)
        face, u, v = s2.face_uv_from_xyz(x, y, z)
        i = s2.ij_from_st(s2.st_from_uv(u))
        j = s2.ij_from_st(s2.st_from_uv(v))
        leaf = s2.cell_id_from_face_ij(face, i, j)
        f2, i2, j2 = s2.face_ij_from_cell_id(leaf)
        assert (f2 == face).all() and (i2 == i).all() and (j2 == j).all()

    def test_children_partition_parent(self):
        rng = np.random.default_rng(4)
        c = s2.encode(
            rng.integers(-8e8, 8e8, 200), rng.integers(-1.79e9, 1.79e9, 200), 14
        )
        ch = s2.children(c)
        assert (s2.level_of(ch.reshape(-1)) == 15).all()
        assert (s2.parent(ch.reshape(-1), 14).reshape(-1, 4) == c[:, None]).all()
        # leaves of the 4 children partition the parent's leaves
        for k in range(20):
            got = set().union(*(py_leaves(int(x), 16) for x in ch[k]))
            assert got == py_leaves(int(c[k]), 16)


class TestS2Compact:
    def _spark_compact(self, spark, leaves, reparts=7):
        df = spark.createDataFrame(
            pd.DataFrame({"cell": leaves.astype(np.int64)})
        ).repartition(reparts)
        return s2cover.s2_compact(df).toPandas()

    def test_matches_python_twin(self, spark, leaf_cells):
        got = self._spark_compact(spark, leaf_cells)
        exp = py_compact(set(int(c) for c in leaf_cells), 16, 12)
        assert set(zip((int(c) for c in got["cell"]), (int(v) for v in got["lvl"]))) == exp
        # real compaction happened: mixed levels present
        assert got["lvl"].nunique() >= 3
        assert len(got) < len(set(leaf_cells.tolist()))

    def test_roundtrip_uncompact(self, spark, leaf_cells):
        df = spark.createDataFrame(pd.DataFrame({"cell": leaf_cells.astype(np.int64)}))
        compacted = s2cover.s2_compact(df)
        back = s2cover.s2_uncompact(compacted, level=16).toPandas()
        assert set(int(c) for c in back["cell"]) == set(int(c) for c in leaf_cells)
        assert len(back) == len(set(leaf_cells.tolist()))  # exactly once

    def test_minimality_no_complete_sibling_group(self, spark, leaf_cells):
        got = self._spark_compact(spark, leaf_cells)
        cells = list(zip(got["cell"], got["lvl"]))
        by_parent: dict[int, int] = {}
        for c, lvl in cells:
            if lvl > 12:
                new_lsb = 1 << (2 * (30 - (int(lvl) - 1)))
                p = (int(c) & ~(new_lsb - 1)) | new_lsb
                by_parent[p] = by_parent.get(p, 0) + 1
        assert all(v < 4 for v in by_parent.values())
        # no ancestor-descendant pairs: leaf sets are pairwise disjoint
        seen: set[int] = set()
        for c, lvl in cells:
            ls = py_leaves(int(c), 16)
            assert not (ls & seen)
            seen.update(ls)

    def test_duckdb_twin(self, spark, leaf_cells):
        got = self._spark_compact(spark, leaf_cells)
        con = duckdb.connect()
        con.register(
            "cells_in", pd.DataFrame({"cell": leaf_cells.astype(np.int64)})
        )
        odf = con.sql(
            s2cover.duckdb_compact_sql("SELECT cell FROM cells_in")
        ).df()
        assert set(zip((int(c) for c in got["cell"]), (int(v) for v in got["lvl"]))) == set(
            zip((int(c) for c in odf["cell"]), (int(v) for v in odf["lvl"]))
        )

    def test_crafted_full_block_collapses(self, spark):
        # all 256 l16 descendants of one l12 cell -> exactly that l12 cell
        a = int(s2.encode(np.asarray([300_000_000]), np.asarray([300_000_000]), 12)[0])
        leaves = np.asarray(sorted(py_leaves(a, 16)), dtype=np.int64)
        got = self._spark_compact(spark, leaves)
        assert len(got) == 1
        assert int(got["cell"].iloc[0]) == a and int(got["lvl"].iloc[0]) == 12

    def test_partitioning_invariance(self, spark, leaf_cells):
        a = self._spark_compact(spark, leaf_cells, reparts=1)
        b = self._spark_compact(spark, leaf_cells, reparts=29)
        key = ["cell", "lvl"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True),
        )

    def test_plan_pure_jvm(self, spark, leaf_cells):
        df = spark.createDataFrame(pd.DataFrame({"cell": leaf_cells.astype(np.int64)}))
        plan = (
            s2cover.s2_compact(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "Python" not in plan and "ArrowEval" not in plan
