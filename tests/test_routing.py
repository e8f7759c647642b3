"""Distributed shortest-path routing (operators/routing.py).

Layers: hand-built graph with known distances (unequal-weight diamond +
an unreachable island), pure-Python Dijkstra differential on a bbox
subgraph of the REAL road network (heapq — a different algorithm class
from the engine's Bellman-Ford label relaxation), structural parent
verification via the exact invariant dist[n] == dist[parent[n]] +
w(parent, n), node pack/unpack round trip, partitioning invariance, and
the isochrone fold onto the hex raster."""

from __future__ import annotations

import heapq

import pandas as pd
import pytest

from pyspark.sql import functions as F

from jimmy_spark.operators import routing


@pytest.fixture(scope="module")
def roads_path():
    from jimmy_spark.datagen import ensure_roads

    return f"{ensure_roads('t2')}/roads.parquet"


def _seg(road, seg, ax, ay, bx, by):
    return (road, seg, ax, ay, bx, by)


SEG_COLS = ["road_id", "seg_id", "ax", "ay", "bx", "by"]


def _dijkstra(edges_pdf: pd.DataFrame, sources: list[int]) -> dict[int, int]:
    adj: dict[int, list[tuple[int, int]]] = {}
    for r in edges_pdf.itertuples():
        adj.setdefault(int(r.src), []).append((int(r.dst), int(r.w)))
    dist: dict[int, int] = {}
    pq = [(0, int(s)) for s in sources]
    heapq.heapify(pq)
    while pq:
        d, n = heapq.heappop(pq)
        if n in dist:
            continue
        dist[n] = d
        for m, w in adj.get(n, []):
            if m not in dist:
                heapq.heappush(pq, (d + w, m))
    return dist


class TestHandGraph:
    def test_diamond_and_island(self, spark):
        # diamond A(0,0) -> B(0,300)/C(400,0) -> D(400,300): the short arm
        # is A-C-D (400 + 300) vs A-B-D (300 + 400) — equal total; add a
        # shortcut A-E-D that wins (50 + floor(sqrt(350^2+300^2))=461 -> no,
        # make E on the straight line: A-E(200,150)-D: 250 + 250 = 500)
        segs = spark.createDataFrame(
            [
                _seg(0, 0, 0, 0, 0, 300),      # A-B  w=300
                _seg(0, 1, 0, 300, 400, 300),  # B-D  w=400
                _seg(1, 0, 0, 0, 400, 0),      # A-C  w=400
                _seg(1, 1, 400, 0, 400, 300),  # C-D  w=300
                _seg(2, 0, 0, 0, 200, 150),    # A-E  w=250
                _seg(2, 1, 200, 150, 400, 300),  # E-D  w=250
                _seg(9, 0, 9000, 9000, 9000, 9300),  # island F-G
            ],
            SEG_COLS,
        )
        edges = routing.road_graph(segs)
        src = int(
            spark.range(1).select(
                routing.pack_node(F.lit(0), F.lit(0))
            ).first()[0]
        )
        got = {
            int(r.node): (int(r.dist), int(r.parent))
            for r in routing.sssp(edges, [src]).collect()
        }

        def node(lat, lon):
            return (lat + 1_000_000_000) * 2**31 + (lon + 1_000_000_000)

        assert got[node(0, 0)] == (0, node(0, 0))
        assert got[node(300, 0)][0] == 300   # B (lat=300, lon=0)
        assert got[node(0, 400)][0] == 400   # C
        assert got[node(150, 200)][0] == 250  # E
        assert got[node(300, 400)][0] == 500  # D via E
        assert got[node(300, 400)][1] == node(150, 200)  # parent = E
        # island unreachable: absent entirely
        assert node(9000, 9000) not in got and node(9300, 9000) not in got

    def test_pack_unpack_roundtrip(self, spark):
        df = spark.createDataFrame(
            [(-800_000_000, 799_999_999), (0, 0), (123, -456)],
            "lat long, lon long",
        )
        n = routing.pack_node(F.col("lat"), F.col("lon"))
        lat2, lon2 = routing.unpack_node(n)
        bad = df.select(
            (F.col("lat") != lat2).alias("a"), (F.col("lon") != lon2).alias("b")
        ).filter("a or b")
        assert bad.count() == 0


class TestRealNetwork:
    WELD = 6_000_000  # under the 8e6 segment step, over crossing offsets

    @pytest.fixture(scope="class")
    def subgraph(self, spark, roads_path):
        # bbox subgraph keeps the frontier loop's hop depth test-sized;
        # welding merges crossing-line endpoints into junctions (the raw
        # polylines never share bit-exact coordinates)
        segs = spark.read.parquet(roads_path).filter(
            "abs(ax) < 80000000 and abs(ay) < 80000000 "
            "and abs(bx) < 80000000 and abs(by) < 80000000"
        )
        edges = routing.road_graph(segs, weld_tol=self.WELD)
        edges.cache().count()
        yield edges
        edges.unpersist()

    def test_welding_creates_junctions(self, spark, roads_path):
        segs = spark.read.parquet(roads_path).filter(
            "abs(ax) < 80000000 and abs(ay) < 80000000 "
            "and abs(bx) < 80000000 and abs(by) < 80000000"
        )
        raw = routing.road_graph(segs)
        welded = routing.road_graph(segs, weld_tol=self.WELD)
        # raw chains: every node has degree <= 2; welded junctions exist
        deg = welded.groupBy("src").count()
        assert deg.filter("count > 2").count() > 0
        assert raw.groupBy("src").count().filter("count > 2").count() == 0

    def test_matches_dijkstra(self, spark, subgraph):
        epdf = subgraph.toPandas()
        assert len(epdf) > 100, "bbox subgraph must be a real network"
        src = int(epdf.sort_values(["src", "dst"]).iloc[0]["src"])
        want = _dijkstra(epdf, [src])
        got = {
            int(r.node): int(r.dist)
            for r in routing.sssp(subgraph, [src]).collect()
        }
        assert got == want
        # a single un-welded chain in the bbox has <= ~21 nodes; crossing
        # a junction is what pushes the reachable set past it
        assert len(got) > 25

    def test_parents_are_structurally_valid(self, spark, subgraph):
        epdf = subgraph.toPandas()
        src = int(epdf.sort_values(["src", "dst"]).iloc[0]["src"])
        rows = routing.sssp(subgraph, [src]).collect()
        wmap = {(int(r.src), int(r.dst)): int(r.w) for r in epdf.itertuples()}
        dmap = {int(r.node): int(r.dist) for r in rows}
        for r in rows:
            n, d, p = int(r.node), int(r.dist), int(r.parent)
            if n == src:
                assert d == 0 and p == src
                continue
            # exact invariant: parent is adjacent and lies on a shortest path
            assert (p, n) in wmap, f"parent of {n} not adjacent"
            assert dmap[p] + wmap[(p, n)] == d

    def test_multi_source_is_min_over_sources(self, spark, subgraph):
        epdf = subgraph.toPandas()
        srcs = sorted(epdf["src"].unique())
        s1, s2 = int(srcs[0]), int(srcs[len(srcs) // 2])
        want = _dijkstra(epdf, [s1, s2])
        got = {
            int(r.node): int(r.dist)
            for r in routing.sssp(subgraph, [s1, s2]).collect()
        }
        assert got == want

    def test_partitioning_invariance(self, spark, subgraph):
        epdf = subgraph.toPandas()
        src = int(epdf.sort_values(["src", "dst"]).iloc[0]["src"])
        a = {
            (int(r.node), int(r.dist))
            for r in routing.sssp(subgraph.repartition(16), [src]).collect()
        }
        b = {
            (int(r.node), int(r.dist))
            for r in routing.sssp(subgraph.coalesce(1), [src]).collect()
        }
        assert a == b


class TestIsochrones:
    def test_isochrone_cells_match_python_fold(self, spark, subgraph_cls):
        edges, src = subgraph_cls
        dist = routing.sssp(edges, [src])
        dist.cache().count()
        band_w = 50_000_000
        got = {
            (int(r.cell), int(r.min_dist), int(r.band))
            for r in routing.isochrone_cells(
                dist, band_width=band_w, res=8,
                weld_tol=TestRealNetwork.WELD,
            ).collect()
        }
        # python fold: cell from the SAME jvm expression (recompute via a
        # tiny spark projection), min per cell, band arithmetic in python
        from pyspark.sql import functions as F

        lat, lon = routing.node_coords(F.col("node"), TestRealNetwork.WELD)
        from jimmy_spark.operators.cells import hex_cell_expr

        node_cells = {
            int(r.node): int(r.cell)
            for r in dist.select(
                "node", hex_cell_expr(lat, lon, 8).alias("cell")
            ).collect()
        }
        per_cell: dict[int, int] = {}
        for r in dist.collect():
            c = node_cells[int(r.node)]
            per_cell[c] = min(per_cell.get(c, 1 << 62), int(r.dist))
        want = {(c, d, d // band_w) for c, d in per_cell.items()}
        assert got == want and len(got) > 3
        dist.unpersist()

    def test_source_cell_is_band_zero(self, spark, subgraph_cls):
        edges, src = subgraph_cls
        dist = routing.sssp(edges, [src])
        iso = routing.isochrone_cells(
            dist, band_width=50_000_000, res=8, weld_tol=TestRealNetwork.WELD
        ).toPandas()
        assert (iso["band"] == 0).any()
        assert (iso["min_dist"] == 0).sum() == 1  # exactly the source cell


@pytest.fixture(scope="module")
def subgraph_cls(spark, roads_path):
    segs = spark.read.parquet(roads_path).filter(
        "abs(ax) < 80000000 and abs(ay) < 80000000 "
        "and abs(bx) < 80000000 and abs(by) < 80000000"
    )
    edges = routing.road_graph(segs, weld_tol=TestRealNetwork.WELD)
    edges.cache()
    src = int(edges.orderBy("src", "dst").first()["src"])
    yield edges, src
    edges.unpersist()


def test_frontier_work_tracks_frontier_not_reached(spark):
    """r6 (VERDICT #2): on a long chain graph the shortest-path wave
    advances one node per round, so the relaxed frontier must stay O(1)
    per round — the r5 all-reached relaxation would have reported a
    frontier equal to the whole reached set (round k relaxing k nodes,
    Theta(N^2) total). Distances must be unchanged by the scheduling."""
    from jimmy_spark.operators import routing

    n = 40
    rows = [(i, i + 1, 10) for i in range(n)]
    rows += [(b, a, w) for a, b, w in rows]
    edges = spark.createDataFrame(rows, "src long, dst long, w long")
    stats: list = []
    dist = routing.sssp(edges, [0], round_stats=stats)
    got = {r["node"]: r["dist"] for r in dist.collect()}
    assert got == {i: 10 * i for i in range(n + 1)}
    # one convergence round at the end; every relaxing round touches at
    # most 2 nodes (the wave head and its predecessor's re-flag), never
    # the accumulated reached set
    assert len(stats) >= n
    assert max(s["frontier"] for s in stats) <= 2
    assert sum(s["frontier"] for s in stats) <= 2 * (n + 2)
