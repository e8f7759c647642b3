"""DBSCAN over the geo plane (operators/geocluster.py).

Two independent oracles: a pure-Python union-find DBSCAN (same
deterministic min-label/min-border rules) and the DuckDB recursive-CTE
twin ``duckdb_dbscan_sql`` — neither shares code with the Spark path.
"""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from jimmy_spark.operators import geocluster


def _py_dbscan(lat, lon, eps, min_pts):
    """{idx: (role, cluster_id|None)} with min-id cluster labels and
    min-cluster border attachment. Exact integer math."""
    n = len(lat)
    lat = [int(x) for x in lat]
    lon = [int(x) for x in lon]
    nbrs = [[] for _ in range(n)]
    for i in range(n):
        for j in range(i + 1, n):
            if (lat[i] - lat[j]) ** 2 + (lon[i] - lon[j]) ** 2 <= eps * eps:
                nbrs[i].append(j)
                nbrs[j].append(i)
    core = [len(nbrs[i]) + 1 >= min_pts for i in range(n)]

    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        if not core[i]:
            continue
        for j in nbrs[i]:
            if core[j]:
                a, b = find(i), find(j)
                if a != b:
                    parent[max(a, b)] = min(a, b)
    comp_min = {}
    for i in range(n):
        if core[i]:
            r = find(i)
            comp_min[r] = min(comp_min.get(r, i), i)
    out = {}
    for i in range(n):
        if core[i]:
            out[i] = ("core", comp_min[find(i)])
        else:
            cands = [comp_min[find(j)] for j in nbrs[i] if core[j]]
            out[i] = ("border", min(cands)) if cands else ("noise", None)
    return out


def _mk(spark, n=250, seed=3):
    """Three planted dense blobs + uniform background noise."""
    rng = np.random.default_rng(seed)
    lat = rng.integers(0, 1_000_000, size=n)
    lon = rng.integers(0, 1_000_000, size=n)
    centers = [(100_000, 100_000), (500_000, 480_000), (800_000, 820_000)]
    per = n // 5
    for b, (cy, cx) in enumerate(centers):
        s = b * per
        lat[s : s + per] = cy + rng.integers(-4_000, 4_000, size=per)
        lon[s : s + per] = cx + rng.integers(-4_000, 4_000, size=per)
    df = spark.createDataFrame(
        [(f"img_{i:012d}", int(lat[i]), int(lon[i])) for i in range(n)],
        "image_id string, lat_e7 long, lon_e7 long",
    )
    return df, lat, lon


def NUM_ID():
    return F.substring("image_id", 5, 12).cast("long")


EPS, MIN_PTS = 3_000, 4


def _collect(df):
    return {
        r.image_id: (r.role, r.cluster_id)
        for r in df.collect()
    }


@pytest.fixture(scope="module")
def fixture(spark):
    df, lat, lon = _mk(spark)
    got = _collect(
        geocluster.dbscan(df, eps=EPS, min_pts=MIN_PTS, num_id=NUM_ID())
    )
    return df, lat, lon, got


def test_dbscan_matches_python_oracle(fixture):
    df, lat, lon, got = fixture
    exp = _py_dbscan(lat, lon, EPS, MIN_PTS)
    assert len(got) == len(exp)
    for i, (role, cl) in exp.items():
        pid = f"img_{i:012d}"
        assert got[pid] == (role, cl), (pid, got[pid], (role, cl))


def test_dbscan_finds_planted_blobs(fixture):
    df, lat, lon, got = fixture
    roles = [got[f"img_{i:012d}"][0] for i in range(len(lat))]
    # each planted blob yields a (mostly-core) cluster
    clusters = {c for r, c in got.values() if c is not None}
    assert len(clusters) >= 3
    assert roles.count("core") > 100
    assert roles.count("noise") > 10


def test_dbscan_matches_duckdb_recursive_cte(spark):
    df, lat, lon = _mk(spark, n=120, seed=9)
    got = _collect(
        geocluster.dbscan(df, eps=EPS, min_pts=MIN_PTS, num_id=NUM_ID())
    )
    con = duckdb.connect()
    con.register("pts_view", df.toPandas())
    sql = geocluster.duckdb_dbscan_sql(
        "SELECT * FROM pts_view",
        eps=EPS,
        min_pts=MIN_PTS,
        num_id_sql="CAST(substring(image_id, 5, 12) AS BIGINT)",
    )
    exp = {
        r[0]: (r[1], None if r[2] is None else int(r[2]))
        for r in con.execute(sql).fetchall()
    }
    assert got == exp


def test_dbscan_partitioning_invariance(spark):
    df, lat, lon = _mk(spark, n=150, seed=17)
    a = _collect(geocluster.dbscan(df.repartition(1), eps=EPS, min_pts=MIN_PTS, num_id=NUM_ID()))
    b = _collect(geocluster.dbscan(df.repartition(13), eps=EPS, min_pts=MIN_PTS, num_id=NUM_ID()))
    assert a == b


def test_cluster_stats_matches_numpy(fixture):
    """Per-cluster profile == numpy over the python-oracle clusters."""
    df, lat, lon, got = fixture
    labels = geocluster.dbscan(df, eps=EPS, min_pts=MIN_PTS, num_id=NUM_ID())
    stats = {
        r.cluster_id: r
        for r in geocluster.cluster_stats(df, labels).collect()
    }
    exp = _py_dbscan(lat, lon, EPS, MIN_PTS)
    by_cluster = {}
    for i, (role, cl) in exp.items():
        if cl is not None:
            by_cluster.setdefault(cl, []).append((i, role))
    assert set(stats) == set(by_cluster)
    for cl, members in by_cluster.items():
        idx = [i for i, _ in members]
        r = stats[cl]
        assert r.n_members == len(idx)
        assert r.n_core == sum(1 for _, role in members if role == "core")
        assert (r.lat_min, r.lat_max) == (min(lat[i] for i in idx), max(lat[i] for i in idx))
        assert (r.lon_min, r.lon_max) == (min(lon[i] for i in idx), max(lon[i] for i in idx))
        la = np.array([lat[i] for i in idx], dtype=float)
        lo = np.array([lon[i] for i in idx], dtype=float)
        assert abs(r.lat_centroid - la.mean()) < 1e-6 * max(1.0, abs(la.mean()))
        rms = float(np.sqrt(la.var() + lo.var()))
        assert abs(r.rms_radius - rms) < 1e-6 * max(1.0, rms)


def test_dbscan_min_pts_one_all_core(spark):
    """min_pts=1: every point is core (self counts); isolated points form
    singleton clusters labeled by their own id."""
    df = spark.createDataFrame(
        [("img_000000000005", 0, 0), ("img_000000000009", 10_000_000, 10_000_000)],
        "image_id string, lat_e7 long, lon_e7 long",
    )
    got = _collect(geocluster.dbscan(df, eps=100, min_pts=1, num_id=NUM_ID()))
    assert got == {
        "img_000000000005": ("core", 5),
        "img_000000000009": ("core", 9),
    }
