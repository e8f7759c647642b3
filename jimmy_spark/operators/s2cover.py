"""S2 cell-set compaction: minimal mixed-level covering of a leaf set.

The hierarchical-index operation the hex grid can't offer (its res 7-9
lattices are independent; S2 is a true quadtree): given the set of
level-L cells a corpus occupies, replace every complete 4-sibling group
by its parent, recursively, producing the canonical minimal cell set
covering exactly the same leaves — the standard S2 ``CellUnion
Normalize`` semantics, here as a distributed Spark operator. At 10^12
images the occupied-l16 set reaches billions of cells; dense regions
(cities) collapse to l12 blocks, an ~up-to-256x representation cut that
makes the covering broadcastable/joinable downstream.

Shape: one groupBy(parent) + one join per level step (16->15->...->
min_level), every step pure JVM bit arithmetic (the S2 lsb laddering)
on a frame that only shrinks; no Python anywhere. The inverse
(``s2_uncompact``) restores the uniform-level set via a codegen'd
sequence explode over the lsb range identity — the exact-roundtrip
contract ``uncompact(compact(S)) == S`` is what the tests pin, along
with minimality (no complete sibling group survives) and the DuckDB
iterative-CTE twin.

No reference analogue (marph91/jimmy has no spatial surface); engine
addition under the BASELINE.json geospatial axes, alongside
functions/s2.py's encode/decode pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_LEVEL = 30


def _parent_expr(col: str, level: int) -> str:
    """SQL fragment: parent id at ``level`` (standard lsb arithmetic;
    works for any input cell at a level deeper than ``level``)."""
    new_lsb = 1 << (2 * (MAX_LEVEL - level))
    return f"(({col} & ~{new_lsb - 1}L) | {new_lsb}L)"


def s2_compact(
    cells: DataFrame, cell_col: str = "cell", level: int = 16, min_level: int = 12
) -> DataFrame:
    """Distinct level-``level`` cells -> minimal mixed-level set
    (levels ``min_level``..``level``) covering the same leaves.

    Output: (cell long, lvl int). Input rows need not be distinct.
    """
    cur = cells.select(F.col(cell_col).alias("cell")).distinct()
    out: DataFrame | None = None
    for lvl in range(level, min_level, -1):
        p = F.expr(_parent_expr("cell", lvl - 1))
        with_parent = cur.select("cell", p.alias("_p"))
        grp = with_parent.groupBy("_p").agg(F.count(F.lit(1)).alias("_c"))
        # complete 4-sibling groups promote to the parent; the rest are
        # final at this level
        kept = (
            with_parent.join(grp, "_p")
            .filter(F.col("_c") < 4)
            .select("cell", F.lit(lvl).cast("int").alias("lvl"))
        )
        out = kept if out is None else out.unionByName(kept)
        cur = grp.filter(F.col("_c") == 4).select(F.col("_p").alias("cell"))
    final = cur.select("cell", F.lit(min_level).cast("int").alias("lvl"))
    return (out.unionByName(final)) if out is not None else final


def s2_uncompact(cells: DataFrame, level: int = 16, cell_col: str = "cell") -> DataFrame:
    """Mixed-level cell set -> the uniform level-``level`` leaf set.

    Level-T descendants of a cell with lsb ``b`` are
    ``cell - b + (2k + 1) * b_T`` for k in [0, b / b_T) with
    ``b_T = 1 << (2 * (30 - T))`` — one codegen'd sequence explode, no
    Python. Cells already at ``level`` pass through (k = 0 only).
    """
    b_t = 1 << (2 * (MAX_LEVEL - level))
    lsb = f"({cell_col} & -{cell_col})"
    n = f"({lsb} div {b_t}L)"  # 4^(level - lvl) descendants
    return cells.select(
        F.col(cell_col).alias("_c"),
        F.explode(F.expr(f"sequence(0L, {n} - 1L)")).alias("_k"),
    ).select(
        F.expr(f"_c - (_c & -_c) + (2 * _k + 1) * {b_t}L").alias("cell")
    )


def duckdb_compact_sql(
    cells_sql: str, cell_col: str = "cell", level: int = 16, min_level: int = 12
) -> str:
    """DuckDB twin of ``s2_compact``: the same per-level promote/keep
    ladder as explicit CTE stages (fixed depth — level - min_level
    rounds), same lsb arithmetic."""
    parts = [f"l{level} AS (SELECT DISTINCT {cell_col} AS cell FROM ({cells_sql}))"]
    keeps = []
    for lvl in range(level, min_level, -1):
        new_lsb = 1 << (2 * (MAX_LEVEL - (lvl - 1)))
        pexpr = f"((cell & ~{new_lsb - 1}) | {new_lsb})"
        parts.append(
            f"g{lvl} AS (SELECT {pexpr} AS p, COUNT(*) AS c FROM l{lvl} GROUP BY p)"
        )
        parts.append(
            f"k{lvl} AS (SELECT cell, {lvl} AS lvl FROM l{lvl} "
            f"JOIN g{lvl} ON {pexpr} = g{lvl}.p WHERE g{lvl}.c < 4)"
        )
        parts.append(
            f"l{lvl - 1} AS (SELECT p AS cell FROM g{lvl} WHERE c = 4)"
        )
        keeps.append(f"SELECT cell, lvl FROM k{lvl}")
    keeps.append(f"SELECT cell, {min_level} AS lvl FROM l{min_level}")
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(keeps)
